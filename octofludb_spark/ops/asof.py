"""As-of (nearest-prior) join — an operator Spark's DataFrame API
lacks natively, built scale-first.

The naive formulation (join on key + ts range, window over the pair
space) explodes: every left row matches ALL prior right rows before
the per-pair rank prunes them.  The scalable shape is the classic
union-and-carry:

  1. tag both sides and UNION them (map-side, no join),
  2. one shuffle: window partitioned by the key, ordered by
     (ts, side) with the right side sorting FIRST at equal ts
     (inclusive `right.ts <= left.ts` semantics),
  3. carry the matched right ROW forward as ONE struct with a single
     last(ignorenulls=True) over rows unbounded-preceding..current —
     carrying each value column independently would mix fields from
     different right rows whenever the matched row has a NULL in one
     column (the previous row's non-NULL value would leak in),
  4. expand the struct's fields and keep the left rows.

Cost: ONE exchange on the key, zero pair blowup — each row is touched
once.  This is the plan an MPP engine's native ASOF JOIN lowers to,
which is also how it is oracle-checked: DuckDB's built-in ASOF LEFT
JOIN must produce identical rows.

Determinism: duplicate right rows on (key, ts) would make the carried
value order-dependent, so callers must dedup the right side to one
row per (key, ts) first (the driver gate aggregates with max()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts: str = "ts", suffix: str = "_r") -> DataFrame:
    """Left as-of join: every left row gains the right row with the
    greatest ``right.ts <= left.ts`` for the same ``on`` key (or NULLs
    if none).  Right value columns are suffixed; the matched right
    timestamp is ``ts + suffix``."""
    vals = [c for c in right.columns if c not in (on, ts)]
    # the whole right row rides as one struct: last(ignorenulls) then
    # skips left rows (struct NULL) but carries matched right rows
    # INTACT — a NULL field of the matched row stays NULL instead of
    # inheriting the previous row's value
    r_struct = F.struct(
        F.col(ts).alias(ts + suffix),
        *[F.col(c).alias(c + suffix) for c in vals],
    )
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(
            [f"`{ts + suffix}`:{right.schema[ts].dataType.simpleString()}"]
            + [f"`{c + suffix}`:{right.schema[c].dataType.simpleString()}"
               for c in vals]) + ">"
    )
    l_tag = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        null_struct.alias("_r"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, ts)],
    )
    u = l_tag.unionByName(r_tag)

    from pyspark.sql import Window

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in left.columns],
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return (
        carried.where(F.col("_side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_r.`{c + suffix}`").alias(c + suffix) for c in vals],
            F.col(f"_r.`{ts + suffix}`").alias(ts + suffix),
        )
    )


def range_join_window(probes: DataFrame, events: DataFrame,
                      window_s: int = 300, on: str = "user_id",
                      ts: str = "ts") -> DataFrame:
    """Range (interval) self-join at scale: for every probe row, all
    `events` rows of the same key within ±window_s seconds —
    (probe_id, event_id) pairs.

    The naive plan is a per-key cross join filtered by BETWEEN (the
    pair space explodes on active keys).  Scale shape: bin timestamps
    into window-sized buckets; a probe explodes into its bucket ±1,
    events keep their single bucket, the equi-join on (key, bucket)
    bounds candidates to ~3 buckets per probe, and the exact interval
    filter runs on candidates only.  Any pair within the window is
    within one bucket of each other, so banding is COMPLETE (no
    recall loss), and each pair joins at most once (only the probe
    side explodes).  Bucketing uses an epoch that only needs to be
    self-consistent; the final filter is interval arithmetic —
    timezone-free and TIMESTAMP_NTZ-safe."""
    w_us = F.lit(int(window_s) * 1_000_000)
    bucket = lambda col: F.floor(
        F.unix_micros(col.cast("timestamp")) / w_us)
    p = probes.select(
        F.col("event_id").alias("probe_id"),
        F.col(on).alias("_k"),
        F.col(ts).alias("_ta"),
        F.explode(F.array(
            bucket(F.col(ts)) - 1, bucket(F.col(ts)),
            bucket(F.col(ts)) + 1)).alias("_b"),
    )
    e = events.select(
        F.col("event_id"),
        F.col(on).alias("_k"),
        F.col(ts).alias("_tb"),
        bucket(F.col(ts)).alias("_b"),
    )
    iv = F.expr(f"INTERVAL {int(window_s)} SECOND")
    return (
        p.join(e, ["_k", "_b"])
        .where((F.col("_tb") >= F.col("_ta") - iv)
               & (F.col("_tb") <= F.col("_ta") + iv)
               & (F.col("event_id") != F.col("probe_id")))
        .select("probe_id", "event_id")
    )
