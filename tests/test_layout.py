"""Z-order layout ops (ops/layout.py)."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _grid(spark, n=32):
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        F.floor(F.col("id") / n).cast("long").alias("y"))


def test_zorder_key_matches_python_morton(spark):
    from octofludb_spark.ops.layout import zorder_key

    rows = zorder_key(_grid(spark), ["x", "y"], bits=5).collect()

    def morton(x, y, bits=5):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    # span == 2^bits - 1 here, so bucket == value: exact Morton
    assert all(r.zkey == morton(r.x, r.y) for r in rows)


def test_zorder_cluster_tightens_both_envelopes(spark):
    from octofludb_spark.ops.layout import (layout_stats, zorder_cluster,
                                            zorder_key)

    df = _grid(spark, 64)
    n_files = 16

    def mean_span(stats, c):
        rows = stats.collect()
        return sum(r[f"{c}_max"] - r[f"{c}_min"] for r in rows) / len(rows)

    # baseline: range-partition by x ONLY -> y envelopes stay full-width
    by_x = df.repartitionByRange(n_files, "x")
    clustered = zorder_cluster(df, ["x", "y"], bits=6, n_files=n_files)
    sx = layout_stats(by_x, ["x", "y"])
    sz = layout_stats(clustered, ["x", "y"])
    assert mean_span(sx, "y") > 0.9 * 63          # one-dim sort: no y pruning
    assert mean_span(sz, "y") < 0.6 * 63          # z-order: both pruned
    assert mean_span(sz, "x") < 0.6 * 63


def test_zorder_guards(spark):
    from octofludb_spark.ops.layout import zorder_key

    df = _grid(spark)
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)       # 64 interleaved bits
    # constant column degenerates to bucket 0, key still works
    out = zorder_key(df.withColumn("x", F.lit(7)), ["x", "y"], bits=5)
    assert out.where(F.col("zkey") < 0).count() == 0


def test_zorder_wide_range_no_bigint_overflow(spark):
    # ADVICE r4: span > (2^63-1)/255 used to pass the old 2^62 guard
    # yet overflow (x - lo) * n — ANSI abort or silently wrong zkey.
    # Full-width 64-bit range must now bucket exactly via DECIMAL.
    from octofludb_spark.ops.layout import zorder_key

    vals = [-(2 ** 62), -1, 0, 1, 2 ** 62]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    rows = {r.x: r.zkey for r in zorder_key(df, ["x"], bits=8).collect()}
    span = 2 ** 63
    lo = -(2 ** 62)
    for v in vals:
        assert rows[v] == (v - lo) * 255 // span, v
    # fast path unchanged: narrow range still pure BIGINT arithmetic
    small = spark.createDataFrame([(v,) for v in range(9)], "x long")
    got = {r.x: r.zkey for r in zorder_key(small, ["x"], bits=3).collect()}
    assert got == {v: v * 7 // 8 for v in range(9)}


def test_zorder_key_is_mapside_after_stats(spark):
    from octofludb_spark.ops.layout import zorder_key

    plan = (zorder_key(_grid(spark), ["x", "y"], bits=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan
