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
    return _skew_rollup(counts)


def _skew_rollup(counts: DataFrame) -> DataFrame:
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


def salt_decision(df: DataFrame, key: str,
                  hub_ppm: int = HUB_PPM,
                  target_spread: int = TARGET_SPREAD) -> dict:
    """Whole-relation probe of ``key``'s concentration -> the salting
    decision a join on that key should take:

      {n_rows, n_keys, max_key_rows, top_share_ppm, is_hub, nsalt}

    nsalt follows skew_report's salt_hint formula (spread the heaviest
    key ~target_spread ways); 1 when no key crosses hub_ppm.

    Cost at scale: ONE count aggregate on the join key — map-side
    partial, so only (key, count) pairs cross the wire, a vanishing
    fraction of the shuffle the join itself would pay — then a 1-row
    collect.  Exact integer arithmetic, so the same corpus always
    yields the same decision (no sampling nondeterminism)."""
    row = (
        df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("cnt"))
        .agg(F.sum("cnt").cast("long").alias("n_rows"),
             F.count("*").cast("long").alias("n_keys"),
             F.max("cnt").cast("long").alias("max_key_rows"))
        .collect()[0]
    )
    if not row.n_rows:
        return {"n_rows": 0, "n_keys": 0, "max_key_rows": 0,
                "top_share_ppm": 0, "is_hub": False, "nsalt": 1}
    top = row.max_key_rows * 1_000_000 // row.n_rows
    is_hub = top > hub_ppm
    nsalt = (max(1, row.max_key_rows * target_spread // row.n_rows)
             if is_hub else 1)
    return {"n_rows": row.n_rows, "n_keys": row.n_keys,
            "max_key_rows": row.max_key_rows, "top_share_ppm": top,
            "is_hub": is_hub, "nsalt": nsalt}


def auto_salted_join(big: DataFrame, dim: DataFrame, key: str,
                     how: str = "inner",
                     hub_ppm: int = HUB_PPM,
                     target_spread: int = TARGET_SPREAD
                     ) -> tuple[DataFrame, dict]:
    """The measurement and treatment halves wired together: probe the
    big side's key concentration (salt_decision) and return the join
    planned accordingly — a plain equi-join when no hub key exists,
    canonicalize.salted_join at the probe's nsalt when one does.
    Output equality with the plain join holds either way (salting
    changes the shuffle layout, never the result — property the
    auto_salted_join gate hash-checks against a plain DuckDB join).

    Returns (joined, decision) so callers can log/assert which path
    fired."""
    from octofludb_spark.ops.canonicalize import salted_join

    d = salt_decision(big, key, hub_ppm=hub_ppm,
                      target_spread=target_spread)
    if d["nsalt"] <= 1:
        d["strategy"] = "plain"
        return big.join(dim, on=key, how=how), d
    d["strategy"] = "salted"
    return salted_join(big, dim, key, nsalt=d["nsalt"], how=how), d


def execute_jvm(df: DataFrame) -> int:
    """Execute ``df``'s OWN query execution entirely JVM-side and
    return the row count.  Two reasons this exists: (a) ``df.count()``
    / ``df.agg(...)`` run a DIFFERENT query execution (and an
    aggregate stacked on a join suppresses AQE's skew-split — the
    optimizer declines to break the join's output partitioning), so
    plan telemetry read off ``df`` after them describes a plan that
    never ran; (b) no rows cross to the driver.  After this call
    ``df``'s adaptive plan is final and aqe_skew_telemetry reads what
    actually happened."""
    return df._jdf.queryExecution().executedPlan().execute().count()


def aqe_skew_telemetry(df: DataFrame) -> dict:
    """Post-execution AQE introspection for the salt-vs-AQE decision
    record: call AFTER executing ``df``'s own query execution
    (execute_jvm — NOT ``df.count()``, which runs a separate one) and
    get what the adaptive planner actually did —

      * aqe_skew_joins — count of ``skew=true`` join markers in the
        final adaptive plan (AQE's skew-split fired that many times)
      * exchanges      — shuffle exchange count in the executed plan
      * final_plan     — whether AQE reached its final re-planned form

    This is the "what did AQE do alone" half of the telemetry the
    bench's skew row records next to auto_salted_join's probe decision
    (bench.py run_skew), so the explicit salt hint's value is measured
    rather than assumed."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {"aqe_skew_joins": plan.count("skew=true"),
            "exchanges": plan.count("Exchange"),
            "final_plan": "isFinalPlan=true" in plan}
