"""Event-stream analytics: ordered funnels and retention cohorts —
the two classic event-table questions a pipeline answers once events
exist (the reference's event analog is its per-strain date timeline;
these are the same min-timestamp-per-stage plans generalized).

Both operators are pure timestamp/integer plans: no floats, no RNG,
deterministic on any engine at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, stages: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Strictly-ordered funnel: for each user, stage k's timestamp is
    the EARLIEST event of stage k's type that falls strictly after
    the user's stage k-1 timestamp (stage 0 is the user's earliest
    stage-0 event).  Returns one row per user who entered the funnel:
    (user, t_<stage>... , funnel_stage) where funnel_stage counts
    completed stages.

    Scale shape: one filtered min-aggregate per stage (map-side
    partial), each joined back on the user key — stage tables shrink
    monotonically, and every join is user-keyed equi (broadcastable
    once the funnel narrows).  No windows, no per-user sort: the
    whole funnel is k aggregates over progressively smaller inputs,
    which is the plan that survives 10^12 events (a per-user
    sort-based window would shuffle the full event log once per
    stage)."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias(f"t_{stages[0]}"))
    )
    out = cur
    prev_ts = f"t_{stages[0]}"
    for st in stages[1:]:
        nxt = (
            events.where(F.col(type_col) == st)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("_ts"))
            .join(out.select("user", prev_ts), "user")
            .where(F.col("_ts") > F.col(prev_ts))
            .groupBy("user")
            .agg(F.min("_ts").alias(f"t_{st}"))
        )
        out = out.join(nxt, "user", "left")
        prev_ts = f"t_{st}"
    stage_expr = sum(
        (F.when(F.col(f"t_{st}").isNotNull(), 1).otherwise(0)
         for st in stages),
        F.lit(0),
    )
    return out.withColumn("funnel_stage", stage_expr.cast("long"))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention triangle: users are cohorted by the Monday of
    their first event's week; for each (cohort_week, week_offset) the
    count of cohort users active in that week.  Output:
    (cohort_week DATE, week_offset BIGINT, n_users BIGINT).

    Scale shape: one min-per-user aggregate (cohort assignment), one
    distinct on (user, week) — both map-side-partial — then a
    user-keyed equi join and a cohort-sized aggregate.  Offsets are
    exact integer day-difference DIV 7 (both engines truncate
    non-negative quotients identically)."""
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    first = (
        events.groupBy(F.col(user_col).alias("user"))
        .agg(wk(F.min(ts_col)).alias("cohort_week"))
    )
    active = (
        events.select(F.col(user_col).alias("user"),
                      wk(F.col(ts_col)).alias("week"))
        .distinct()
    )
    return (
        active.join(first, "user")
        .select(
            "cohort_week",
            F.expr("datediff(week, cohort_week) DIV 7").cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


def daily_anomalies(events: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", sigma: int = 2) -> DataFrame:
    """Per-user daily-volume anomaly detection with EXACT integer
    sigma tests: a user's day is anomalous when its event count x
    deviates from the user's own mean by more than ``sigma`` standard
    deviations.  The test is evaluated without ever forming mean or
    variance as floats:

        (x - s/n)^2 > sigma^2 * (n*ssq - s^2) / n^2
        <=>  (n*x - s)^2 > sigma^2 * (n*ssq - s^2)

    — both sides BIGINT, so the flag is bit-identical on any engine
    (a float mean/stddev would tie-break differently at equality).

    Scale shape: one (user, day) count aggregate, one user-sized
    stats aggregate, one user-keyed equi join back — all map-side
    partial.  Output: (user, day, n_events, direction, is_anomaly)
    where direction is sign(n*x - s)."""
    d = F.to_date(ts_col).alias("day")
    daily = events.groupBy(F.col(user_col).alias("user"), d).agg(
        F.count("*").alias("n_events"))
    stats = daily.groupBy("user").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ssq"),
    )
    dev = F.col("n_days") * F.col("n_events") - F.col("s")
    var_n2 = (F.col("n_days") * F.col("ssq")
              - F.col("s") * F.col("s"))
    return (
        daily.join(stats, "user")
        .select(
            "user",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.signum(dev.cast("double")).cast("long").alias("direction"),
            F.when(dev * dev > F.lit(sigma * sigma) * var_n2, 1)
            .otherwise(0).cast("long").alias("is_anomaly"),
        )
    )


def cooccurrence_lift(events: DataFrame, user_col: str = "user_id",
                      item_col: str = "event_type") -> DataFrame:
    """Market-basket co-occurrence with exact integer lift: for each
    unordered item pair (a < b), the number of users exhibiting both,
    each alone, and lift = P(ab) / (P(a) P(b)) in ppm —
    n_ab * n_users * 10^6 DIV (n_a * n_b) — pure BIGINT, so the
    association table is bit-identical cross-engine (float lift would
    tie-break differently at cutoff boundaries).

    Scale shape: one (user, item) distinct (map-side partial), one
    per-item count, a user-keyed self-join bounded by items-per-user
    (small fan-out: users hold few distinct items), one pair
    aggregate.  Output: (item_a, item_b, n_ab, n_a, n_b, n_users,
    lift_ppm)."""
    ui = (events.select(F.col(user_col).alias("u"),
                        F.col(item_col).alias("i"))
          .distinct().persist())
    try:
        n_users = ui.select("u").distinct().count()
        per = ui.groupBy("i").agg(F.count("*").alias("n_i"))
        a = ui.select("u", F.col("i").alias("item_a"))
        b = ui.select("u", F.col("i").alias("item_b"))
        pairs = (
            a.join(b, "u")
            .where(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count("*").alias("n_ab"))
        )
        return (
            pairs.join(per.withColumnRenamed("i", "item_a")
                       .withColumnRenamed("n_i", "n_a"), "item_a")
            .join(per.withColumnRenamed("i", "item_b")
                  .withColumnRenamed("n_i", "n_b"), "item_b")
            .select(
                "item_a", "item_b",
                F.col("n_ab").cast("long").alias("n_ab"),
                F.col("n_a").cast("long").alias("n_a"),
                F.col("n_b").cast("long").alias("n_b"),
                F.lit(n_users).cast("long").alias("n_users"),
                F.expr(f"n_ab * {n_users} * 1000000 DIV (n_a * n_b)")
                .cast("long").alias("lift_ppm"),
            )
        )
    finally:
        ui.unpersist()
