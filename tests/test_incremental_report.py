"""Incremental materialized-report maintenance
(plans/incremental_reports.py) + the store CDC changelog scan.

Contract: after any sequence of incremental KG batches,
`masterlist_rows` (materialized + refreshed at O(changes)) equals a
full masterlist recompute over the store's current canonical view —
the same equivalence discipline as build.incremental_update.
"""

import pytest
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import NCOUNTRY, NT

TK = ["subject", "predicate", "object_lex", "object_dtype"]


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, NT + p if "://" not in p else p, o, dt)
         for (s, p, o, dt) in rows],
        "subject string, predicate string, object_lex string, "
        "object_dtype string",
    )


def _rowset(df):
    return {tuple(r) for r in df.collect()}


# ------------------------------------------------------------ CDC changelog


def test_changelog_scan_inserts_and_deletes(spark, tmp_path):
    from octofludb_spark.sources.store import TripleStore

    store = TripleStore(str(tmp_path / "s"), n_buckets=4)
    store.write(_triples(spark, [("s1", "p", "a", ""),
                                 ("s2", "p", "b", "")]),
                "triples", bucket_by_subject=True)
    base = store.manifest()["seq"]
    store.append_rows(_triples(spark, [("s3", "p", "c", "")]), "triples")
    store.delete_rows_mor(spark, _triples(spark, [("s1", "p", "a", "")]))
    log = store.read_changelog(spark, "triples", since=base)
    got = {(r.subject, r._change_type) for r in log.collect()}
    assert got == {("s3", "insert"), ("s1", "delete")}
    # read_changes (append-only scan) refuses the same range: the
    # delete broke append lineage — the changelog is the CDC answer
    with pytest.raises(ValueError):
        store.read_changes(spark, "triples", since=base)
    # a rewrite (compact) has no row-level changelog
    store.compact(spark, "triples")
    with pytest.raises(ValueError):
        store.read_changelog(spark, "triples", since=base)


# ------------------------------------------------- toy-graph slice semantics


def _strain(sid, name, barcode, gid, genbank):
    return [
        (sid, "strain_name", name, ""),
        (sid, "host", "swine", ""),
        (sid, "country", NCOUNTRY + "USA", "uri"),
        (sid, "date", "2020-01-05", "xsd:date"),
        (sid, "barcode", barcode, ""),
        (sid, "has_segment", gid, "uri"),
        (gid, "segment_name", "HA", ""),
        (gid, "genbank_id", genbank, ""),
        (NCOUNTRY + "USA", "code", "USA", ""),
    ]


def test_affected_barcodes_walks_segments_and_changes(spark):
    from octofludb_spark.plans.incremental_reports import affected_barcodes

    trip = _triples(spark, _strain("s1", "A/swine/Iowa/A01", "A0101",
                                   "g1", "GB1")
                    + _strain("s2", "A/swine/Ohio/A02", "A0202",
                              "g2", "GB2"))
    # a change touching only segment g1 must reach s1's barcode
    ch = _triples(spark, [("g1", "clade", "1A.1", "")]).withColumn(
        "_change_type", F.lit("insert"))
    got = {r.barcode for r in affected_barcodes(ch, trip).collect()}
    assert got == {"A0101"}
    # a deleted barcode triple names its value directly
    ch2 = _triples(spark, [("s2", "barcode", "A0202", "")]).withColumn(
        "_change_type", F.lit("delete"))
    got2 = {r.barcode for r in affected_barcodes(ch2, trip).collect()}
    assert got2 == {"A0202"}


def test_slice_includes_path_entities(spark):
    """The recompute slice must carry the country node so the
    sid -> country -> code qualification path still binds."""
    from octofludb_spark.plans.incremental_reports import masterlist_slice

    trip = _triples(spark, _strain("s1", "A/swine/Iowa/A01", "A0101",
                                   "g1", "GB1")
                    + _strain("s2", "A/swine/Ohio/A02", "A0202",
                              "g2", "GB2"))
    bcs = spark.createDataFrame([("A0101",)], "barcode string")
    rows = masterlist_slice(trip, bcs).collect()
    assert [r.Barcode for r in rows] == ["A0101"]
    assert rows[0].H_Genbank == "GB1"


# ------------------------------------------- lifecycle equivalence contract


def test_materialize_refresh_lifecycle(spark, tmp_path):
    from octofludb_spark.build import build_graph, incremental_update
    from octofludb_spark.plans.incremental_reports import (
        MASTERLIST_TABLE,
        masterlist_materialize,
        masterlist_refresh,
    )
    from octofludb_spark.plans.reports import masterlist_report
    from octofludb_spark.plans.views import GraphViews
    from octofludb_spark.sources.synth import source_table

    full = source_table(spark, 90, partitions=4)
    part_a = full.where(F.xxhash64("path") % 3 != 0)
    part_b = full.where(F.xxhash64("path") % 3 == 0)
    root = str(tmp_path / "store")
    store = build_graph(spark, part_a, root, run_ts="2026-01-01T00:00:00")

    n0 = masterlist_materialize(spark, store)
    assert n0 > 0
    assert store.read(spark, MASTERLIST_TABLE).count() == n0

    # fold batch B in, then refresh incrementally
    incremental_update(spark, part_b, root,
                       run_ts="2026-01-01T00:00:00", batch_id="b1")
    res = masterlist_refresh(spark, store)
    assert res["mode"] == "incremental"
    assert res["affected_barcodes"] > 0

    want = _rowset(masterlist_report(
        GraphViews(store.read(spark, "triples_canonical"))))
    got = _rowset(store.read(spark, MASTERLIST_TABLE))
    assert got == want
    assert len(got) > n0  # batch B added report rows

    # immediate second refresh is a no-op
    res2 = masterlist_refresh(spark, store)
    assert res2["mode"] == "noop"

    # a snapshot rewrite (delete_where) breaks the changelog — refresh
    # falls back to an honest full rematerialize and still converges
    store.delete_where(
        spark, (F.col("predicate") == NT + "barcode")
        & (F.col("object_lex").startswith("A0")), "triples")
    res3 = masterlist_refresh(spark, store)
    assert res3["mode"] == "full"
    want3 = _rowset(masterlist_report(
        GraphViews(store.read(spark, "triples_canonical"))))
    assert _rowset(store.read(spark, MASTERLIST_TABLE)) == want3


def test_affected_barcodes_reverse_hop_shared_attribute(spark):
    """A change whose SUBJECT is a shared attribute node (the country
    node on the sid -> country -> code path) must reach every strain
    referencing it — the reverse object->subject hop."""
    from octofludb_spark.plans.incremental_reports import affected_barcodes

    trip = _triples(spark, _strain("s1", "A/swine/Iowa/A01", "A0101",
                                   "g1", "GB1")
                    + _strain("s2", "A/swine/Ohio/A02", "A0202",
                              "g2", "GB2"))
    # the country code triple changes: subject is the SHARED country
    # node — both strains reference it, so both barcodes are affected
    ch = _triples(spark, [(NCOUNTRY + "USA", "code", "US", "")]) \
        .withColumn("_change_type", F.lit("insert"))
    got = {r.barcode for r in affected_barcodes(ch, trip).collect()}
    assert got == {"A0101", "A0202"}
    # two-hop reverse: gid -> feature -> serotype; the feature node's
    # serotype change must climb feature -> gid -> sid -> barcode
    trip2 = _triples(
        spark,
        _strain("s3", "A/swine/Utah/A03", "A0303", "g3", "GB3")
        + [("g3", "feature", "f3", "uri"),
           ("f3", "serotype", "H1", "")])
    ch2 = _triples(spark, [("f3", "serotype", "H3", "")]) \
        .withColumn("_change_type", F.lit("insert"))
    got2 = {r.barcode for r in affected_barcodes(ch2, trip2).collect()}
    assert got2 == {"A0303"}


def test_refresh_converges_after_shared_node_change(spark, tmp_path):
    """End-to-end: mutate a shared attribute node's value triple and
    refresh — the materialized report must equal a full recompute
    (the stale-row failure the forward-only walk had)."""
    from octofludb_spark.plans.incremental_reports import (
        MASTERLIST_TABLE,
        masterlist_materialize,
        masterlist_refresh,
    )
    from octofludb_spark.plans.reports import masterlist_report
    from octofludb_spark.plans.views import GraphViews
    from octofludb_spark.sources.store import TripleStore

    trip = _triples(spark, _strain("s1", "A/swine/Iowa/A01", "A0101",
                                   "g1", "GB1")
                    + _strain("s2", "A/swine/Ohio/A02", "A0202",
                              "g2", "GB2"))
    store = TripleStore(str(tmp_path / "s"), n_buckets=4)
    store.write(trip, "triples_canonical", bucket_by_subject=True)
    masterlist_materialize(spark, store)
    # the shared country node gains a region triple (subject = the
    # attribute node itself, no strain subject anywhere in the change)
    store.append_rows(
        _triples(spark, [(NCOUNTRY + "USA", "region", "North America",
                          "")]),
        "triples_canonical")
    res = masterlist_refresh(spark, store)
    assert res["mode"] == "incremental"
    assert res["affected_barcodes"] == 2  # BOTH strains re-sliced
    want = _rowset(masterlist_report(
        GraphViews(store.read(spark, "triples_canonical"))))
    assert _rowset(store.read(spark, MASTERLIST_TABLE)) == want
