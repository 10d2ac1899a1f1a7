"""Incremental KG updates: merge-on-read equality deletes on the
store, incremental entity linking (ops/incremental.py), and the
equivalence contract of build.incremental_update — after any sequence
of incremental batches the canonical view equals a full build_graph
over the concatenated corpus.

Reference parity: GraphDB re-infers owl:sameAs on every upload
(octofludb-config.ttl:29), so octofludb users see new alias links
merge entities immediately; the batch engine gets the same semantics
at O(batch + affected) cost.
"""

import pytest

from pyspark.sql import functions as F

TK = ["subject", "predicate", "object_lex", "object_dtype"]
SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, dt) for (s, p, o, dt) in rows],
        "subject string, predicate string, object_lex string, "
        "object_dtype string",
    )


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def _rowset(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def store(tmp_path):
    from octofludb_spark.sources.store import TripleStore

    return TripleStore(str(tmp_path / "store"), n_buckets=4)


# ---------------------------------------------------------------- MOR deletes


def test_mor_delete_hides_rows_without_rewrite(spark, store):
    store.write(_triples(spark, [("s1", "p", "a", ""),
                                 ("s2", "p", "b", "")]),
                "triples", bucket_by_subject=True)
    snap_before = store.manifest()["tables"]["triples"]
    store.delete_rows_mor(spark, _triples(spark, [("s1", "p", "a", "")]))
    assert store.manifest()["tables"]["triples"] == snap_before
    got = {r.subject for r in store.read(spark).select("subject").collect()}
    assert got == {"s2"}


def test_mor_delete_then_reappend_row_survives(spark, store):
    """Iceberg sequence-number semantics: a delete applies only to
    data committed before it — re-adding the row later must win."""
    row = [("s1", "p", "a", "")]
    store.write(_triples(spark, row), "triples", bucket_by_subject=True)
    store.delete_rows_mor(spark, _triples(spark, row))
    assert store.read(spark).count() == 0
    store.merge_rows(spark, _triples(spark, row), "triples")
    got = _rowset(store.read(spark).select(*TK))
    assert got == {("s1", "p", "a", "")}


def test_mor_delete_folds_on_compact(spark, store):
    store.write(_triples(spark, [("s1", "p", "a", ""),
                                 ("s2", "p", "b", "")]),
                "triples", bucket_by_subject=True)
    store.delete_rows_mor(spark, _triples(spark, [("s1", "p", "a", "")]))
    store.compact(spark, "triples")
    assert not store.manifest().get("deletes", {}).get("triples")
    got = {r.subject for r in store.read(spark).select("subject").collect()}
    assert got == {"s2"}


def test_mor_delete_breaks_append_lineage(spark, store):
    store.write(_triples(spark, [("s1", "p", "a", "")]), "triples",
                bucket_by_subject=True)
    v1 = store.manifest()["seq"]
    store.delete_rows_mor(spark, _triples(spark, [("s1", "p", "a", "")]))
    with pytest.raises(ValueError, match="rewritten"):
        store.read_changes(spark, "triples", since=v1)
    diff = store.read_changes(spark, "triples", since=v1,
                              allow_rewrite_diff=True)
    assert diff is None or diff.count() == 0


def test_mor_delete_segment_survives_vacuum(spark, store):
    import os

    store.write(_triples(spark, [("s1", "p", "a", "")]), "triples",
                bucket_by_subject=True)
    store.delete_rows_mor(spark, _triples(spark, [("s1", "p", "a", "")]))
    seg = store.manifest()["deletes"]["triples"][0]["path"]
    store.vacuum()
    assert os.path.exists(seg)
    assert store.read(spark).count() == 0


def test_append_rows_is_plain_append(spark, store):
    lm = spark.createDataFrame([("r", "p", "c", "sha", 3)],
                               "src_repo string, src_path string, "
                               "src_commit string, content_sha256 string, "
                               "n_triples long")
    store.append_rows(lm, "lineage_metrics")
    store.append_rows(lm, "lineage_metrics")
    # no presence check: run-keyed facts append verbatim
    assert store.read(spark, "lineage_metrics").count() == 2


# ------------------------------------------------------- incremental linking


def test_incremental_link_merges_two_old_components(spark):
    from octofludb_spark.ops.incremental import incremental_link

    old = spark.createDataFrame([("b", "a"), ("c", "a"), ("e", "d")],
                                "node string, canonical string")
    new_map, sub_map = incremental_link(old, _edges(spark, [("c", "e")]))
    want = {("b", "a"), ("c", "a"), ("d", "a"), ("e", "a")}
    assert _rowset(new_map) == want
    assert _rowset(sub_map) == want


def test_incremental_link_new_node_demotes_representative(spark):
    from octofludb_spark.ops.incremental import incremental_link

    old = spark.createDataFrame([("y", "x")], "node string, canonical string")
    new_map, sub_map = incremental_link(old, _edges(spark, [("a", "y")]))
    want = {("x", "a"), ("y", "a")}
    assert _rowset(new_map) == want
    assert _rowset(sub_map) == want


def test_incremental_link_untouched_components_passthrough(spark):
    from octofludb_spark.ops.incremental import incremental_link

    old = spark.createDataFrame([("b", "a"), ("q", "p")],
                                "node string, canonical string")
    new_map, sub_map = incremental_link(old, _edges(spark, [("b", "z")]))
    assert _rowset(sub_map) == {("b", "a"), ("z", "a")}
    assert _rowset(new_map) == {("b", "a"), ("z", "a"), ("q", "p")}


def test_incremental_link_touch_via_canonical_column(spark):
    """A new edge can land on a REPRESENTATIVE; its whole component
    must still re-link."""
    from octofludb_spark.ops.incremental import incremental_link

    old = spark.createDataFrame([("m", "k")], "node string, canonical string")
    new_map, sub_map = incremental_link(old, _edges(spark, [("k", "a")]))
    want = {("k", "a"), ("m", "a")}
    assert _rowset(new_map) == want
    assert _rowset(sub_map) == want


def test_incremental_link_matches_full_cc(spark):
    """Random-ish alias graph, random batch split: incremental result
    equals a from-scratch CC over the union."""
    from octofludb_spark.ops.canonicalize import canonical_map
    from octofludb_spark.ops.cc import connected_components
    from octofludb_spark.ops.incremental import incremental_link

    import random

    rnd = random.Random(7)
    edges = [(f"n{rnd.randrange(60)}", f"n{rnd.randrange(60)}")
             for _ in range(80)]
    edges = [e for e in edges if e[0] != e[1]]
    cut = len(edges) // 2
    old_map = canonical_map(
        connected_components(_edges(spark, edges[:cut])))
    new_map, _ = incremental_link(old_map, _edges(spark, edges[cut:]))
    full = canonical_map(connected_components(_edges(spark, edges)))
    assert _rowset(new_map) == _rowset(full)


# ------------------------------------------------ canonical-view repair


def _build_store(spark, store, rows):
    """Mini build: write triples, link, canonicalize — the state
    incremental updates start from."""
    from octofludb_spark.ops.canonicalize import canonical_map, canonicalize
    from octofludb_spark.ops.cc import connected_components, sameas_edges

    t = _triples(spark, rows)
    store.write(t, "triples", stage="extract", bucket_by_subject=True)
    comps = connected_components(sameas_edges(t))
    store.write(canonical_map(comps), "canonical_map", stage="link")
    mapping = store.read(spark, "canonical_map")
    store.write(canonicalize(t, mapping.select("node", "canonical")),
                "triples_canonical", stage="canon", bucket_by_subject=True)


def _full_canonical(spark, rows):
    from octofludb_spark.ops.canonicalize import canonical_map, canonicalize
    from octofludb_spark.ops.cc import connected_components, sameas_edges

    t = _triples(spark, rows)
    mapping = canonical_map(connected_components(sameas_edges(t)))
    return _rowset(canonicalize(t, mapping).select(*TK))


def test_merge_with_sameas_merges_components(spark, store):
    """Post-build upload carrying a NEW alias link: the canonical view
    must converge to what a full rebuild over old+new would produce
    (GraphDB sameAs-on-upload parity)."""
    old_rows = [
        ("u:b", SAMEAS, "u:a", "uri"),
        ("u:a", "p:name", "alpha", ""),
        ("u:d", "p:name", "delta", ""),
    ]
    new_rows = [
        ("u:d", SAMEAS, "u:a", "uri"),
        ("u:d", "p:extra", "x", ""),
    ]
    _build_store(spark, store, old_rows)
    store.merge_triples(spark, _triples(spark, new_rows))
    got = _rowset(store.read(spark, "triples_canonical").select(*TK))
    assert got == _full_canonical(spark, old_rows + new_rows)
    # the map merged the components under the lexicographic min
    m = _rowset(store.read(spark, "canonical_map"))
    assert ("u:d", "u:a") in m and ("u:b", "u:a") in m


def test_merge_with_demoting_alias(spark, store):
    """New alias smaller than the old representative: every triple of
    the old component rewrites to the NEW representative."""
    old_rows = [
        ("u:m", SAMEAS, "u:k", "uri"),
        ("u:k", "p:name", "kappa", ""),
        ("u:other", "p:ref", "u:k", "uri"),
    ]
    new_rows = [("u:a", SAMEAS, "u:k", "uri")]
    _build_store(spark, store, old_rows)
    store.merge_triples(spark, _triples(spark, new_rows))
    got = _rowset(store.read(spark, "triples_canonical").select(*TK))
    assert got == _full_canonical(spark, old_rows + new_rows)
    assert ("u:a", "p:name", "kappa", "") in got
    assert ("u:other", "p:ref", "u:a", "uri") in got
    assert not any(s == "u:k" or o == "u:k" for (s, _, o, _) in got)


def test_merge_without_edges_keeps_plain_path(spark, store):
    old_rows = [("u:b", SAMEAS, "u:a", "uri"), ("u:a", "p:n", "1", "")]
    _build_store(spark, store, old_rows)
    seq_before = store.manifest()["seq"]
    store.merge_triples(spark, _triples(spark, [("u:b", "p:n", "2", "")]))
    got = _rowset(store.read(spark, "triples_canonical").select(*TK))
    # the new triple is rewritten through the EXISTING map; no deletes
    assert ("u:a", "p:n", "2", "") in got
    assert not store.manifest().get("deletes", {})
    assert store.manifest()["seq"] > seq_before


# ------------------------------------------- end-to-end incremental build


def _canon_set(spark, store):
    return _rowset(store.read(spark, "triples_canonical").select(*TK))


@pytest.fixture(scope="module")
def split_corpora(spark):
    from octofludb_spark.sources.synth import source_table

    full = source_table(spark, 90, partitions=4).persist()
    part_a = full.where(F.xxhash64("path") % 3 != 0).persist()
    part_b = full.where(F.xxhash64("path") % 3 == 0).persist()
    yield full, part_a, part_b
    for df in (full, part_a, part_b):
        df.unpersist()


def test_incremental_update_equals_full_build(spark, tmp_path, split_corpora):
    from octofludb_spark.build import build_graph, incremental_update

    full, part_a, part_b = split_corpora
    s_full = build_graph(spark, full, str(tmp_path / "full"),
                         run_ts="2026-01-01T00:00:00")
    s_incr = build_graph(spark, part_a, str(tmp_path / "incr"),
                         run_ts="2026-01-01T00:00:00")
    incremental_update(spark, part_b, str(tmp_path / "incr"),
                       run_ts="2026-01-01T00:00:00", batch_id="b1")
    assert _canon_set(spark, s_incr) == _canon_set(spark, s_full)
    # the updated map matches the full build's map
    assert _rowset(s_incr.read(spark, "canonical_map")) == \
        _rowset(s_full.read(spark, "canonical_map"))
    # raw triple view converges too (idempotent union semantics)
    assert _rowset(s_incr.read(spark, "triples").select(*TK)) == \
        _rowset(s_full.read(spark, "triples").select(*TK))


def test_incremental_update_is_idempotent(spark, tmp_path, split_corpora):
    from octofludb_spark.build import build_graph, incremental_update

    _, part_a, part_b = split_corpora
    root = str(tmp_path / "st")
    build_graph(spark, part_a, root, run_ts="2026-01-01T00:00:00")
    s = incremental_update(spark, part_b, root,
                           run_ts="2026-01-01T00:00:00", batch_id="b1")
    before = _canon_set(spark, s)
    lineage_before = s.read(spark, "lineage_metrics").count()
    # same batch_id: every step is stage-marked done -> full no-op
    incremental_update(spark, part_b, root,
                       run_ts="2026-01-01T00:00:00", batch_id="b1")
    assert _canon_set(spark, s) == before
    assert s.read(spark, "lineage_metrics").count() == lineage_before
    # a NEW batch_id over the same data: presence checks + map
    # convergence make it a semantic no-op (lineage rows do append)
    incremental_update(spark, part_b, root,
                       run_ts="2026-01-01T00:00:00", batch_id="b2")
    assert _canon_set(spark, s) == before


def test_cli_build_incremental(spark, tmp_path, split_corpora):
    """`build --incremental` folds a parquet batch into the store."""
    from octofludb_spark import cli
    from octofludb_spark.build import build_graph
    from octofludb_spark.sources.store import TripleStore

    full, part_a, part_b = split_corpora
    root = str(tmp_path / "cli_store")
    build_graph(spark, part_a, root, run_ts="2026-01-01T00:00:00")
    bpath = str(tmp_path / "batch_b.parquet")
    part_b.write.parquet(bpath)
    assert cli.main(["build", root, "--source", bpath,
                     "--incremental", "--batch-id", "b1"]) == 0
    s_full = build_graph(spark, full, str(tmp_path / "cli_full"),
                         run_ts="2026-01-01T00:00:00")
    got = _canon_set(spark, TripleStore(root))
    assert got == _canon_set(spark, s_full)


def test_incremental_update_into_unbuilt_store_falls_back(spark, tmp_path,
                                                          split_corpora):
    from octofludb_spark.build import build_graph, incremental_update

    full, part_a, part_b = split_corpora
    s = incremental_update(spark, part_a, str(tmp_path / "fresh"),
                           run_ts="2026-01-01T00:00:00")
    incremental_update(spark, part_b, str(tmp_path / "fresh"),
                       run_ts="2026-01-01T00:00:00", batch_id="b1")
    s_full = build_graph(spark, full, str(tmp_path / "full2"),
                         run_ts="2026-01-01T00:00:00")
    assert _canon_set(spark, s) == _canon_set(spark, s_full)
