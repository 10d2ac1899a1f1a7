"""Batch gaps-and-islands sessionization (streaming/pipeline.py
sessionize_batch): event-time 30-min-gap semantics on hand-built
data, and the one-shuffle plan shape (the window's user_id exchange
is reused by the aggregation)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from octofludb_spark.streaming.pipeline import sessionize_batch

pytestmark = pytest.mark.spark


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
         for (u, m) in rows],
        "user_id long, ts timestamp_ntz",
    )


def test_gap_semantics(spark):
    # user 1: 0,10,20 | gap 40 | 60,65   user 2: single event
    rows = [(1, 0), (1, 10), (1, 20), (1, 60), (1, 65), (2, 5)]
    out = sessionize_batch(_ev(spark, rows), gap_s=30 * 60).collect()
    got = {(r.user_id, r.sess_idx): (r.n_events,
                                     r.session_start.minute,
                                     r.session_end.minute)
           for r in out}
    assert got == {
        (1, 1): (3, 0, 20),
        (1, 2): (2, 0, 5),   # 60 and 65 minutes -> :00 and :05
        (2, 1): (1, 5, 5),
    }


def test_exact_gap_is_same_session(spark):
    # a gap of exactly 30 min does NOT split (strict > threshold)
    out = sessionize_batch(_ev(spark, [(1, 0), (1, 30)]),
                           gap_s=30 * 60).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_single_shuffle_plan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = sessionize_batch(ev)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(user_id" in plan
