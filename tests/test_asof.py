"""As-of join (ops/asof.py): pinned semantics (inclusive <=, latest
prior wins, unmatched -> NULLs) and the single-shuffle plan shape.
Cross-engine differential vs DuckDB's native ASOF LEFT JOIN runs in
the driver gate `event_asof_join`."""

import datetime as dt

import pytest

from octofludb_spark.ops.asof import asof_join

pytestmark = pytest.mark.spark


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10), 9.0), (101, 1, _ts(30), 8.0),
         (102, 1, _ts(5), 7.0), (103, 2, _ts(50), 6.0)],
        "event_id long, user_id long, ts timestamp_ntz, value double")
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), 2.0), (3, _ts(0), 9.9)],
        "user_id long, ts timestamp_ntz, sv double")
    out = asof_join(left, right)
    got = {r.event_id: (r.sv_r, r.ts_r) for r in out.collect()}
    assert got == {
        100: (1.0, _ts(10)),   # inclusive: equal ts matches
        101: (2.0, _ts(20)),   # latest prior wins
        102: (None, None),     # before any right row
        103: (None, None),     # user with no right rows at all
    }
    # left row count preserved (left-join semantics)
    assert out.count() == 4


def test_asof_single_shuffle(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(1), 1.0)],
        "event_id long, user_id long, ts timestamp_ntz, value double")
    right = spark.createDataFrame(
        [(1, _ts(0), 2.0)], "user_id long, ts timestamp_ntz, sv double")
    plan = asof_join(left, right)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan  # union-and-carry, never a pair join


def test_range_join_banding_complete(spark):
    """Bucket-banded range join equals the naive BETWEEN join on a
    corpus engineered to straddle bucket boundaries, and each pair
    appears exactly once."""
    from octofludb_spark.ops.asof import range_join_window

    rows = []
    eid = 0
    for u in (1, 2):
        for m in (0, 4, 5, 6, 9, 11, 29, 30, 31, 59):
            rows.append((eid, u, _ts(m)))
            eid += 1
    ev = spark.createDataFrame(rows,
                               "event_id long, user_id long, ts timestamp_ntz")
    probes = ev
    got = {(r.probe_id, r.event_id) for r in
           range_join_window(probes, ev, window_s=300).collect()}
    rows_py = {r[0]: (r[1], r[2]) for r in rows}
    want = {
        (a, b)
        for a, (ua, ta) in rows_py.items()
        for b, (ub, tb) in rows_py.items()
        if a != b and ua == ub and abs((ta - tb).total_seconds()) <= 300
    }
    assert got == want
    out = range_join_window(probes, ev, window_s=300)
    assert out.count() == out.distinct().count()  # no double-joins


def test_asof_and_range_empty_sides(spark):
    """Empty right side -> all-NULL carries (left rows preserved);
    empty probe side -> empty range join.  Schema stays stable."""
    from octofludb_spark.ops.asof import asof_join, range_join_window

    left = spark.createDataFrame(
        [(1, 1, _ts(1), 1.0)],
        "event_id long, user_id long, ts timestamp_ntz, value double")
    right = spark.createDataFrame(
        [], "user_id long, ts timestamp_ntz, sv double")
    out = asof_join(left, right).collect()
    assert len(out) == 1 and out[0].sv_r is None and out[0].ts_r is None

    ev = spark.createDataFrame(
        [(1, 1, _ts(1))], "event_id long, user_id long, ts timestamp_ntz")
    empty = ev.where("event_id < 0")
    rj = range_join_window(empty, ev, window_s=60)
    assert rj.columns == ["probe_id", "event_id"] and rj.count() == 0


def test_asof_null_field_stays_null(spark):
    """The matched right row rides as ONE struct: a NULL field of the
    matched row must stay NULL — never inherit the previous right
    row's non-NULL value (the frankenstein-row failure of carrying
    each column independently)."""
    left = spark.createDataFrame(
        [(100, 1, _ts(25), 0.0)],
        "event_id long, user_id long, ts timestamp_ntz, value double")
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0, "a"), (1, _ts(20), None, "b")],
        "user_id long, ts timestamp_ntz, sv double, tag string")
    out = asof_join(left, right).collect()
    assert len(out) == 1
    r = out[0]
    # matched row is ts(20) whose sv is NULL: sv_r must be NULL, not
    # the ts(10) row's 1.0
    assert r.ts_r == _ts(20) and r.tag_r == "b" and r.sv_r is None


def test_asof_multi_value_columns_consistent(spark):
    """All suffixed columns come from the SAME matched right row."""
    left = spark.createDataFrame(
        [(1, 1, _ts(15), 0.0), (2, 1, _ts(35), 0.0)],
        "event_id long, user_id long, ts timestamp_ntz, value double")
    right = spark.createDataFrame(
        [(1, _ts(10), 10.0, "x"), (1, _ts(30), 30.0, "y")],
        "user_id long, ts timestamp_ntz, sv double, tag string")
    got = {r.event_id: (r.sv_r, r.tag_r, r.ts_r)
           for r in asof_join(left, right).collect()}
    assert got == {1: (10.0, "x", _ts(10)), 2: (30.0, "y", _ts(30))}
