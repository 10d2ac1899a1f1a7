"""Key-skew diagnostics — the measurement half of the north_rule's
explicit skew handling: before deciding to salt a join key
(ops/canonicalize.salted_join) or rely on AQE's skew-join split, a
pipeline needs per-key concentration numbers for the actual data.

Everything emitted is exact integer arithmetic (BIGINT counts, ppm
shares via integer division, sum-of-squares concentration), so the
report is bit-identical cross-engine and can be regression-gated —
a drifting skew profile is a data-quality signal in itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a key holding >10% of its group's rows is a hub; the salt hint
# targets ~32-way spread of the heaviest key
HUB_PPM = 100_000
TARGET_SPREAD = 32


def skew_report(df: DataFrame, group: str, key: str) -> DataFrame:
    """Per-``group`` concentration profile of ``key``:

      * n_rows / n_keys — volume and cardinality
      * max_key_rows    — the heaviest key's row count
      * top_share_ppm   — max_key_rows * 10^6 DIV n_rows
      * hhi_q           — sum over keys of cnt^2 (Herfindahl-style
        concentration; equals n_rows^2 when one key holds everything,
        ~n_rows^2 / n_keys when uniform)
      * is_hub          — top_share_ppm > 100_000 (a >10% key)
      * salt_hint       — suggested nsalt for salted_join: enough
        salts to spread the heaviest key ~32 ways over the group;
        1 whenever the group is not hub-skewed (a uniform small
        group needs no salting even though max*32 DIV n_rows > 1)

    Scale shape: one (group, key) count aggregate (map-side partial —
    the same shuffle any downstream join would pay anyway) and one
    group-sized fold.  No sorts, no windows, no floats."""
    counts = df.groupBy(F.col(group).alias("grp"),
                        F.col(key).alias("k")).agg(
        F.count("*").alias("cnt"))
    rep = counts.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("hhi_q"),
    )
    top = F.expr("max_key_rows * 1000000 DIV n_rows")
    return rep.select(
        "grp", "n_rows", "n_keys", "max_key_rows", "hhi_q",
        top.cast("long").alias("top_share_ppm"),
        (top > HUB_PPM).cast("long").alias("is_hub"),
        F.when(
            top > HUB_PPM,
            F.greatest(
                F.lit(1),
                F.expr(f"max_key_rows * {TARGET_SPREAD} DIV n_rows")),
        ).otherwise(F.lit(1)).cast("long").alias("salt_hint"),
    )
