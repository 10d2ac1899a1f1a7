"""The batched extraction path must emit EXACTLY the per-file path's
triples, file by file (same reference semantics, different batching)."""

from octofludb_spark.extract.batched import BATCHED_RECIPES
from octofludb_spark.extract.recipes import RECIPES
from octofludb_spark.functions.uri import make_tag_uri
from octofludb_spark.sources.synth import source_pandas


def _sets(df, cols=("s", "p", "o", "dt")):
    return set(map(tuple, df[list(cols)].values))


def test_batched_equals_per_file():
    pdf = source_pandas(120).reset_index(drop=True)
    per_file = {
        i: _sets(RECIPES[row.lang](row.content, taguri=None))
        for i, row in pdf.iterrows()
    }
    batched: dict = {}
    for lang, grp in pdf.groupby("lang", sort=False):
        items = list(zip(grp.index.to_numpy(), grp["content"]))
        out = BATCHED_RECIPES[lang](items, taguri=None)
        for src, sub in out.groupby("src"):
            batched.setdefault(src, set()).update(_sets(sub))
    for i in range(len(pdf)):
        assert per_file.get(i, set()) == batched.get(i, set()), (
            i, pdf.loc[i, "lang"])


def test_batched_with_tag_parity():
    pdf = source_pandas(24).reset_index(drop=True)
    taguri = make_tag_uri("roundtrip")
    for lang, grp in pdf.groupby("lang", sort=False):
        items = list(zip(grp.index.to_numpy(), grp["content"]))
        out = BATCHED_RECIPES[lang](items, taguri=taguri)
        want = set()
        for i, c in items:
            want |= _sets(RECIPES[lang](c, taguri=taguri))
        assert _sets(out) == want, lang
