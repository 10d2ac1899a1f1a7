"""Salt-vs-AQE decision telemetry (ops/skew.py execute_jvm /
aqe_skew_telemetry / auto_salted_join strategy tag).  The bench's
run_skew row depends on these contracts; the mapper-granularity
caveat (AQE can only split a skewed partition along upstream map
tasks) is pinned here so the measurement harness can't silently
regress into a config where AQE can't act."""

import pytest
from pyspark.sql import functions as F

from octofludb_spark.ops.skew import (
    aqe_skew_telemetry,
    auto_salted_join,
    execute_jvm,
    salt_decision,
)

pytestmark = [pytest.mark.spark, pytest.mark.core]


def _hub_big(spark, n=40000, parts=8):
    # 90% of rows on one key, spread over `parts` mappers
    return (spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit("HUB"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 13)
                            .cast("string"))).alias("k"),
        (F.col("id") * 2).alias("v"))
        .repartition(parts))


def test_execute_jvm_runs_own_qe_and_finalizes(spark):
    df = _hub_big(spark).groupBy("k").count()
    n = execute_jvm(df)
    tele = aqe_skew_telemetry(df)
    assert n == 14  # HUB + 13 spread keys
    assert tele["final_plan"] is True
    assert tele["exchanges"] >= 1


def test_auto_salted_join_strategy_tag(spark):
    big = _hub_big(spark)
    dim = spark.createDataFrame(
        [("HUB", "t0")] + [(f"k{i}", f"t{i}") for i in range(13)],
        "k string, tag string")
    j, dec = auto_salted_join(big, dim, "k")
    assert dec["strategy"] == "salted" and dec["nsalt"] > 1
    assert j.count() == 40000  # salting never changes the result
    uni = big.filter(F.col("k") != "HUB")
    _, dec2 = auto_salted_join(uni, dim, "k")
    assert dec2["strategy"] == "plain" and dec2["nsalt"] == 1


def test_aqe_skew_split_fires_with_enough_mappers(spark):
    # the bench row's load-bearing assumption: with the map side
    # spread and thresholds scaled to data size, AQE's skew split
    # actually fires on a 90%-hub sort-merge join
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "16k")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        big = _hub_big(spark, n=200000, parts=16)
        dim = spark.createDataFrame(
            [("HUB", "t0")] + [(f"k{i}", f"t{i}") for i in range(13)],
            "k string, tag string")
        j = big.join(dim, on="k")
        execute_jvm(j)
        tele = aqe_skew_telemetry(j)
        assert tele["aqe_skew_joins"] >= 1, tele
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_salt_decision_probe_numbers(spark):
    d = salt_decision(_hub_big(spark, n=10000), "k")
    assert d["is_hub"] and d["top_share_ppm"] == 900000
    assert d["nsalt"] == 28  # 0.9 * 32 target spread
