"""Irregular recipes: forced strain ids in FASTA (unpublished data),
forced segment keys in tables (reference recipes.py:510-573)."""

from octofludb_spark.extract.recipes import (
    irregular_fasta_triples,
    irregular_segment_table_triples,
)

FID = "https://flu-crew.org/id/"
FT = "https://flu-crew.org/term/"
TAG = "https://flu-crew.org/tag/"


def _trips(df):
    return {(r.s, r.p, r.o) for r in df.itertuples(index=False)}


def test_irregular_fasta():
    # idiosyncratic id 'pig1' is forced to be a strain
    seq = "GATACAGATACAGATACAGATACAGATACA"
    out = _trips(irregular_fasta_triples(f">pig1|H1N1\n{seq}\n"))
    import hashlib

    md5 = hashlib.md5(seq.encode()).hexdigest()
    assert (FID + "pig1", FT + "strain_id", "pig1") in out
    assert (FID + "pig1", FT + "subtype", "H1N1") in out
    assert (FID + "pig1", FT + "has_segment", FID + md5) in out
    assert (FID + md5, FT + "tag", TAG + "unpublished") in out
    assert (FID + md5, FT + "dnaseq", seq) in out


def test_irregular_segment_table():
    content = "myseg\tclade\nweird-id-7\talpha\n"
    out = _trips(irregular_segment_table_triples(content))
    seg = FID + "weird_id_7"  # make_uri collapses '-' to '_'
    # attribute attaches to the forced segment; the segment itself
    # asserts no typename predicate (typename None)
    assert (seg, FT + "clade", "alpha") in out
    assert not any(p == FT + "myseg" for _, p, _ in out)
    assert not any(p == FT + "none" for _, p, _ in out)
