"""Streaming materialized-report maintenance: a file-arrival stream
of source batches keeps `masterlist_rows` current via the store
changelog, and the result equals a one-shot batch build + materialize
over the same corpus (stream == batch, report edition)."""

import pytest

from octofludb_spark.build import build_graph
from octofludb_spark.plans.incremental_reports import (
    MASTERLIST_TABLE,
    masterlist_materialize,
)
from octofludb_spark.sources.store import TripleStore
from octofludb_spark.sources.synth import source_pandas
from octofludb_spark.streaming.pipeline import (
    stream_ingest_with_report,
    stream_source,
)

pytestmark = pytest.mark.spark


def _rows(spark, root):
    df = TripleStore(root).read(spark, MASTERLIST_TABLE)
    assert df is not None
    cols = sorted(c for c in df.columns if c != "part_bucket")
    return sorted(
        tuple("" if v is None else str(v) for v in r)
        for r in df.select(*cols).collect()
    )


def test_stream_report_matches_batch_and_replays(spark, tmp_path):
    pdf = source_pandas(40)
    sdf = spark.createDataFrame(pdf)

    # stream side: two file drops, one micro-batch each
    src_dir = str(tmp_path / "incoming")
    sdf.repartition(2).write.parquet(src_dir)
    stream_root = str(tmp_path / "stream_store")
    log: list = []
    q = stream_ingest_with_report(
        stream_source(spark, src_dir, max_files=1),
        stream_root,
        str(tmp_path / "ckpt"),
        run_ts="2026-01-01T00:00:00",
        refresh_log=log,
    ).start()
    q.awaitTermination()  # availableNow: terminates when drained

    # batch side: one-shot build + materialize over the same corpus
    batch_root = str(tmp_path / "batch_store")
    store = build_graph(spark, sdf, batch_root,
                        run_ts="2026-01-01T00:00:00")
    masterlist_materialize(spark, store, table="triples_canonical")

    before = _rows(spark, stream_root)
    assert before == _rows(spark, batch_root)

    # the first batch full-builds; the second must take the
    # incremental refresh path (noop only if it touched no masterlist
    # entity) — a silent per-batch recompute is a bug
    assert len(log) == 2
    assert log[0]["mode"] == "full"
    assert log[1]["mode"] in ("incremental", "noop")

    # same files, fresh checkpoint => the whole stream replays; the
    # batch-id stage markers + base-seq noop keep the report unchanged
    q2 = stream_ingest_with_report(
        stream_source(spark, src_dir, max_files=1),
        stream_root,
        str(tmp_path / "ckpt2"),
        run_ts="2026-01-01T00:00:00",
        refresh_log=log,
    ).start()
    q2.awaitTermination()
    assert _rows(spark, stream_root) == before
