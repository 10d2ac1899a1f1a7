"""Code dependency knowledge graph (scale/code.py code_kg_* family):
triple extraction over the north rule's literal source-repo input,
import-alias entity linking, and the module import graph — semantics
pinned with python replays and plan-shape guards."""

import hashlib

import pytest
from pyspark.sql import functions as F

pytestmark = [pytest.mark.spark, pytest.mark.core]


def _replay_content(d: int) -> str:
    lines = [f"// module mod{d}"]
    for j in range(1 + d % 3):
        k = (d + 31 * j + 7) % 997
        s = (d + j) % 3
        lines.append({0: f'#include "mod{k}.h"',
                      1: f'#include <mod{k}.h>',
                      2: f'import mod{k}'}[s])
    for i in range(1 + d % 2):
        lines.append(f"int fn_{d}_{i}(int x) {{ return x + {(d + i) % 89}; }}")
    return "\n".join(lines) + "\n"


def _docs(spark, n=24):
    return spark.range(0, n).select(F.col("id").alias("doc_id"))


def test_synth_code_repo_replay(spark):
    from octofludb_spark.scale.code import synth_code_repo

    rows = {r.doc_id: r for r in synth_code_repo(_docs(spark)).collect()}
    for d in (0, 1, 2, 5, 11, 23):
        r = rows[d]
        assert r.repo == f"org/proj-{d % 7}"
        assert r.path == f"src/mod{d}.c"
        assert r.content == _replay_content(d)


def test_code_kg_triples_ground_truth(spark):
    from octofludb_spark.scale.code import code_kg_triples, synth_code_repo

    tr = code_kg_triples(synth_code_repo(_docs(spark))).collect()
    got = {(r.subject, r.predicate, r.object_lex) for r in tr}
    assert len(got) == len(tr)  # no duplicate triples
    for d in (0, 1, 2, 7):
        file = f"org/proj-{d % 7}/src/mod{d}.c"
        assert (f"org/proj-{d % 7}", "urn:code:contains", file) in got
        assert (file, "urn:code:module", f"mod{d}") in got
        assert (file, "urn:code:lang", "c") in got
        sha = hashlib.sha256(_replay_content(d).encode()).hexdigest()
        assert (file, "urn:code:sha256", sha) in got
        for i in range(1 + d % 2):
            assert (file, "urn:code:defines", f"fn_{d}_{i}") in got
        for j in range(1 + d % 3):
            k = (d + 31 * j + 7) % 997
            raw = f"mod{k}" if (d + j) % 3 == 2 else f"mod{k}.h"
            assert (file, "urn:code:imports", raw) in got
    # exactly the planted families, nothing else
    n = 24
    n_imp = sum(1 + d % 3 for d in range(n))
    n_def = sum(1 + d % 2 for d in range(n))
    assert len(got) == 4 * n + n_imp + n_def


def test_canonicalization_unifies_alias_forms(spark):
    from octofludb_spark.ops.canonicalize import canonicalize
    from octofludb_spark.scale.code import (
        code_kg_triples, module_alias_map, synth_code_repo)

    tr = code_kg_triples(synth_code_repo(_docs(spark)))
    m = {r.node: r.canonical for r in module_alias_map(tr).collect()}
    assert m and all(k.endswith(".h") and k == v + ".h"
                     for k, v in m.items())
    can = canonicalize(tr, module_alias_map(tr))
    imp = can.where(F.col("predicate") == "urn:code:imports")
    aliased = imp.where(F.col("object_lex").endswith(".h")).count()
    assert aliased == 0  # every include-form alias resolved
    # non-import triples untouched
    assert (can.where(F.col("predicate") != "urn:code:imports").count()
            == tr.where(F.col("predicate") != "urn:code:imports").count())


def test_import_module_edges_replay(spark):
    from octofludb_spark.ops.canonicalize import canonicalize
    from octofludb_spark.scale.code import (
        code_kg_triples, import_module_edges, module_alias_map,
        synth_code_repo)

    tr = code_kg_triples(synth_code_repo(_docs(spark)))
    edges = import_module_edges(canonicalize(tr, module_alias_map(tr)))
    got = {(r.src, r.dst) for r in edges.collect()}
    expect = set()
    for d in range(24):
        for j in range(1 + d % 3):
            k = (d + 31 * j + 7) % 997
            if k != d:
                expect.add((f"mod{d}", f"mod{k}"))
    assert got == expect


def test_extraction_plan_is_map_side(spark):
    from octofludb_spark.scale.code import code_kg_triples, synth_code_repo

    plan = code_kg_triples(synth_code_repo(_docs(spark)))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # union of projections: zero shuffles


def test_transe_negatives_semantics(spark):
    from octofludb_spark.ops.canonicalize import canonicalize
    from octofludb_spark.ops.graph_analytics import transe_negatives
    from octofludb_spark.scale.code import (
        code_kg_triples, module_alias_map, synth_code_repo)

    tr = code_kg_triples(synth_code_repo(_docs(spark, 40)))
    can = canonicalize(tr, module_alias_map(tr))
    neg = transe_negatives(can, n_buckets=8, seed=0)
    rows = neg.collect()
    pos = {(r.subject, r.predicate, r.object_lex)
           for r in can.where(F.col("object_dtype") == "uri").collect()}
    ents = {h for h, _, _ in pos} | {t for _, _, t in pos}
    assert rows and len(rows) <= len(pos)  # filtered convention
    for r in rows:
        assert (r.h, r.r, r.t) in pos
        assert r.neg in ents  # drawn from the entity vocabulary
        assert r.neg != (r.h if r.side == "head" else r.t)
    # every emitted positive appears at most once
    assert len({(r.h, r.r, r.t) for r in rows}) == len(rows)


def test_transe_negatives_seed_varies_samples(spark):
    from octofludb_spark.ops.canonicalize import canonicalize
    from octofludb_spark.ops.graph_analytics import transe_negatives
    from octofludb_spark.scale.code import (
        code_kg_triples, module_alias_map, synth_code_repo)

    tr = code_kg_triples(synth_code_repo(_docs(spark, 40)))
    can = canonicalize(tr, module_alias_map(tr))
    a = {tuple(r) for r in transe_negatives(can, seed=0).collect()}
    b = {tuple(r) for r in transe_negatives(can, seed=1).collect()}
    assert a != b  # seed genuinely re-draws


def test_code_kg_triples_fuzz_vs_python_re(spark):
    """Differential fuzz: on ARBITRARY content (not just the synth
    grammar — markers inside strings, tabs, unicode, unterminated
    syntax), Spark's extraction battery must agree with an
    independent python-re replay of the published patterns."""
    import random
    import re

    rng = random.Random(42)
    frags = [
        '#include "alpha.h"', "#include <beta.h>", "import gamma",
        "import delta_2", "int f(", "int long_name_9(int x) {",
        '"#include <fake.h>"', "// import commented", "\timport tabbed",
        "importnospace", "#include <no_close.h", "int 9bad(",
        "print('import strlit')", "#include \"x.y.z.h\"", "int _u(",
        "/* int hidden( */", "import UPPER", "int CAPS_OK(", "",
        "unicode é中 import mixed", "int a(int b(",
    ]
    docs = []
    for i in range(200):
        n = rng.randint(0, 8)
        body = "\n".join(rng.choice(frags) for _ in range(n))
        docs.append((i, "r", f"f{i}.c", "c", body))
    df = spark.createDataFrame(
        docs, ["doc_id", "repo", "path", "lang", "content"])

    from octofludb_spark.scale.code import (
        DEFINE_PATTERN, IMPORT_PATTERNS, code_kg_triples)

    tr = code_kg_triples(df.select("repo", "path", "lang", "content"))
    got_imp = sorted(
        (r.subject, r.object_lex) for r in
        tr.where(F.col("predicate") == "urn:code:imports").collect())
    got_def = sorted(
        (r.subject, r.object_lex) for r in
        tr.where(F.col("predicate") == "urn:code:defines").collect())

    want_imp, want_def = [], []
    for i, repo, path, lang, body in docs:
        subj = f"{repo}/{path}"
        for pat in IMPORT_PATTERNS:
            want_imp += [(subj, m) for m in re.findall(pat, body)]
        want_def += [(subj, m) for m in re.findall(DEFINE_PATTERN, body)]
    assert got_imp == sorted(want_imp)
    assert got_def == sorted(want_def)


def test_kg_snapshot_diff_change_lattice(spark):
    """Every change class lands in the delta exactly as planted:
    deletes remove the whole file, edits swap only the sha triple,
    renames move every triple to the new IRI, untouched docs are
    absent."""
    from octofludb_spark.scale.code import (
        code_kg_triples, kg_snapshot_diff, synth_code_repo)

    docs = _docs(spark, 100)
    old = code_kg_triples(synth_code_repo(docs, rev=0))
    new = code_kg_triples(synth_code_repo(docs, rev=1))
    diff = kg_snapshot_diff(old, new).collect()
    by = {}
    for r in diff:
        by.setdefault(r.status, set()).add(
            (r.subject, r.predicate, r.object_lex))
    added, removed = by.get("added", set()), by.get("removed", set())

    for d in range(100):
        file = f"org/proj-{d % 7}/src/mod{d}.c"
        deleted, edited, renamed = d % 11 == 5, d % 7 == 3, d % 13 == 6
        old_rows = {(s, p, o) for (s, p, o) in
                    (list(removed) + list(added))
                    if s == file or o == file}
        if deleted:
            # all of the file's triples are in 'removed', none added
            assert any((s, p, o) in removed for (s, p, o) in old_rows)
            assert not any(f"mod{d}_v1" in o or f"mod{d}_v1" in s
                           for (s, p, o) in added)
        elif renamed:
            nf = f"org/proj-{d % 7}/src/mod{d}_v1.c"
            assert (f"org/proj-{d % 7}", "urn:code:contains", nf) in added
            assert (f"org/proj-{d % 7}", "urn:code:contains", file) \
                in removed
            assert (nf, "urn:code:module", f"mod{d}_v1") in added
        elif edited:
            shas_rm = {o for (s, p, o) in removed
                       if s == file and p == "urn:code:sha256"}
            shas_ad = {o for (s, p, o) in added
                       if s == file and p == "urn:code:sha256"}
            assert len(shas_rm) == 1 and len(shas_ad) == 1
            # ONLY the sha changed for an edited (non-renamed) file
            others = {(s, p) for (s, p, o) in removed | added
                      if s == file and p != "urn:code:sha256"}
            assert not others
        else:
            assert not old_rows  # untouched docs never appear


def test_code_repo_report_replay(spark):
    from octofludb_spark.ops.canonicalize import canonicalize
    from octofludb_spark.scale.code import (
        code_kg_triples, code_repo_report, module_alias_map,
        synth_code_repo)

    n = 60
    tr = code_kg_triples(synth_code_repo(_docs(spark, n)))
    rep = {r.repo: r for r in
           code_repo_report(canonicalize(tr, module_alias_map(tr)))
           .collect()}
    for repo_i in range(7):
        ds = [d for d in range(n) if d % 7 == repo_i]
        r = rep[f"org/proj-{repo_i}"]
        assert r.n_files == len(ds)
        assert r.n_defines == sum(1 + d % 2 for d in ds)
        assert r.n_imports == sum(1 + d % 3 for d in ds)
        mods = {(d + 31 * j + 7) % 997
                for d in ds for j in range(1 + d % 3)}
        assert r.n_modules == len(mods)


def test_call_graph_resolution_and_dangling(spark):
    """Calls face: extraction finds exactly the generator's call
    statements (never a function's own definition line), resolution
    lands on the defining file iff that doc exists, dangling callees
    keep NULL callee_file — no silent drops."""
    from octofludb_spark.scale.code import (call_graph, code_kg_triples,
                                            synth_code_repo)

    docs = _docs(spark, n=24)
    files = synth_code_repo(docs, calls=True)
    tri = code_kg_triples(files, calls=True)
    got = {(r.caller_file, r.callee): (r.callee_file, r.n_calls)
           for r in call_graph(tri).collect()}
    expected = {}
    for d in range(24):
        caller = f"org/proj-{d % 7}/src/mod{d}.c"
        for i in range(1 + d % 2):
            t = (d * 13 + i * 5 + 3) % 997
            cf = (f"org/proj-{t % 7}/src/mod{t}.c" if t < 24 else None)
            expected[(caller, f"fn_{t}_0")] = (cf, 1)
    assert got == expected
    assert any(v[0] is None for v in got.values())      # dangling face
    assert any(v[0] is not None for v in got.values())  # resolved face


def test_call_graph_collision_resolves_to_min_file(spark):
    from octofludb_spark.scale.code import CODE_NS, call_graph

    rows = [("fA", CODE_NS + "calls", "dup", "string"),
            ("fZ", CODE_NS + "defines", "dup", "string"),
            ("fB", CODE_NS + "defines", "dup", "string")]
    tri = spark.createDataFrame(
        rows, "subject string, predicate string, object_lex string, "
              "object_dtype string")
    out = call_graph(tri).collect()
    assert [(r.caller_file, r.callee, r.callee_file, r.n_calls)
            for r in out] == [("fA", "dup", "fB", 1)]


def test_calls_face_leaves_default_corpus_unchanged(spark):
    from octofludb_spark.scale.code import synth_code_repo

    docs = _docs(spark, n=12)
    a = sorted(map(tuple, synth_code_repo(docs).collect()))
    b = sorted(map(tuple, synth_code_repo(docs, calls=False).collect()))
    assert a == b
    # calls face only rewrites function bodies; imports/defines stay
    c = {r.doc_id: r.content
         for r in synth_code_repo(docs, calls=True).collect()}
    for d in (3, 7):
        assert f"int fn_{d}_0(" in c[d]
        assert f"return fn_{(d * 13 + 3) % 997}_0(x + {d % 89})" in c[d]
