"""Incrementally-maintained sketch tables
(plans/incremental_sketches.py): after any changelog, the refreshed
CMS equals a full recompute exactly; HLL registers MAX-merge on
insert-only changelogs and honestly recompute when deletes appear."""

import pytest

from octofludb_spark.plans.incremental_sketches import (
    CMS_TABLE,
    HLL_TABLE,
    cms_counter_table,
    hll_register_table,
    sketch_materialize,
    sketch_refresh,
)
from octofludb_spark.sources.store import TripleStore

pytestmark = pytest.mark.spark


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object_lex string, "
              "object_dtype string")


def _rows(spark, n0, n1, pred="p"):
    return _triples(spark, [
        (f"s{i}", pred, f"val-{i % 17}", "") for i in range(n0, n1)])


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_insert_only_refresh_equals_full(spark, tmp_path):
    store = TripleStore(str(tmp_path / "s"), n_buckets=4)
    store.write(_rows(spark, 0, 40), "triples", bucket_by_subject=True)
    res = sketch_materialize(spark, store, table="triples")
    assert res["mode"] == "full"

    store.append_rows(_rows(spark, 40, 70, pred="q"), "triples")
    res = sketch_refresh(spark, store, table="triples")
    assert res["mode"] == "incremental"

    cur = store.read(spark, "triples")
    assert _rowset(store.read(spark, HLL_TABLE)) == \
        _rowset(hll_register_table(cur))
    assert _rowset(store.read(spark, CMS_TABLE)) == \
        _rowset(cms_counter_table(cur))

    # nothing new -> noop, tables unchanged
    res = sketch_refresh(spark, store, table="triples")
    assert res["mode"] == "noop"


def test_delete_refresh_cms_exact_hll_recomputes(spark, tmp_path):
    store = TripleStore(str(tmp_path / "s"), n_buckets=4)
    store.write(_rows(spark, 0, 50), "triples", bucket_by_subject=True)
    sketch_materialize(spark, store, table="triples")

    # delete a slice (merge-on-read), append a bit more
    store.delete_rows_mor(spark, _rows(spark, 0, 10))
    store.append_rows(_rows(spark, 50, 60, pred="r"), "triples")
    res = sketch_refresh(spark, store, table="triples")
    assert res["mode"] == "cms-incremental+hll-recompute"
    assert res["n_deletes"] == 10

    cur = store.read(spark, "triples")
    assert cur.count() == 50  # 40 survivors + 10 appended
    # CMS was maintained by pure counter subtraction, yet equals the
    # from-scratch sketch of the live table — the linear-sketch claim
    assert _rowset(store.read(spark, CMS_TABLE)) == \
        _rowset(cms_counter_table(cur))
    assert _rowset(store.read(spark, HLL_TABLE)) == \
        _rowset(hll_register_table(cur))


def test_rewrite_falls_back_to_full(spark, tmp_path):
    store = TripleStore(str(tmp_path / "s"), n_buckets=4)
    store.write(_rows(spark, 0, 30), "triples", bucket_by_subject=True)
    sketch_materialize(spark, store, table="triples")
    store.append_rows(_rows(spark, 30, 35), "triples")
    store.compact(spark, "triples")  # rewrite: changelog lineage gone
    res = sketch_refresh(spark, store, table="triples")
    assert res["mode"] == "full"
    cur = store.read(spark, "triples")
    assert _rowset(store.read(spark, HLL_TABLE)) == \
        _rowset(hll_register_table(cur))


def test_stream_ingest_maintains_sketches(spark, tmp_path):
    """Streaming micro-batches keep the sketch tables equal to a full
    recompute over the final canonical view (stream face of the
    incremental == full contract)."""
    from octofludb_spark.sources.synth import source_pandas
    from octofludb_spark.streaming.pipeline import (
        stream_ingest_with_sketches, stream_source)

    src_dir = str(tmp_path / "in")
    pdf = source_pandas(12)
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        src_dir, mode="append")
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        src_dir, mode="append")

    store_root = str(tmp_path / "store")
    log = []
    q = stream_ingest_with_sketches(
        stream_source(spark, src_dir, max_files=1),
        store_root, str(tmp_path / "ckpt"),
        run_ts="2026-01-01T00:00:00", refresh_log=log).start()
    q.awaitTermination(240)

    assert log, "no micro-batches processed"
    # first batch full-materializes; later insert batches go
    # incremental (order of file pickup may merge them into one)
    assert log[0]["mode"] == "full"
    assert all(r["mode"] in ("full", "incremental", "noop")
               for r in log)

    from octofludb_spark.plans.incremental_sketches import (
        CMS_TABLE, HLL_TABLE, cms_counter_table, hll_register_table)
    from octofludb_spark.sources.store import TripleStore

    store = TripleStore(store_root)
    cur = store.read(spark, "triples_canonical")
    assert {tuple(r) for r in store.read(spark, HLL_TABLE).collect()} \
        == {tuple(r) for r in hll_register_table(cur).collect()}
    assert {tuple(r) for r in store.read(spark, CMS_TABLE).collect()} \
        == {tuple(r) for r in cms_counter_table(cur).collect()}
