"""Storage-layout operators — how a 100 TB table is physically
arranged so scans can prune.

Z-order (Morton) clustering: interleave the bits of per-column
buckets so rows close in EVERY clustered dimension land in the same
file, giving min/max (parquet row-group / Iceberg manifest) pruning
on ALL of the clustered columns at once — the standard lakehouse
answer when one sort column is not enough.

Everything is deterministic integer arithmetic (bucket = affine
integer map of the value range, interleave = div/mod bit algebra), so
the key is bit-identical on any engine — the DuckDB gate replays it —
and the clustered write is repartitionByRange + sortWithinPartitions
on the key (Spark's sampled total sort; one exchange, the
``cdx_shards`` shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8):
    """Append a ``zkey`` column: the Morton interleave of each
    clustered column's ``bits``-bit bucket.  Buckets are affine
    integer maps of the column's [min, max] (one tiny agg collected
    driver-side — 2 numbers per column), so the whole key is pure
    map-side BIGINT arithmetic afterwards: at 100 TB the clustering
    pass is scan + one range exchange, nothing else.

    Column i's bucket bit b lands at interleaved position
    b * n_cols + i — dimensions take turns, the Morton layout.
    Requires integer-typed columns (the caller buckets floats or
    hashes strings first).  Ranges wide enough that the BIGINT
    product (x - lo) * (2^bits - 1) would overflow are routed through
    an exact DECIMAL(38,0) bucket expression instead — any 64-bit
    column range is safe."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must stay under 63")
    stats = df.agg(*[f(c) for c in cols
                     for f in (F.min, F.max)]).first()
    n = (1 << bits) - 1
    parts = []
    for i, c in enumerate(cols):
        lo, hi = stats[2 * i], stats[2 * i + 1]
        if lo is None:
            raise ValueError(f"column {c!r} is all-null")
        span = int(hi) - int(lo)
        if span < 0:
            raise ValueError(f"column {c!r} range unusable: {lo}..{hi}")
        if span == 0:
            bucket = F.lit(0).cast("long")
        elif span <= (2 ** 63 - 1) // n:
            # floor((x - lo) * n / span) in exact BIGINT (div); the
            # bound keeps (x - lo) * n inside 64 bits for every x in
            # [lo, hi] — bits-dependent, so bits=8 caps span at ~2^55
            bucket = F.expr(
                f"(({c} - {int(lo)}L) * {n}L) div {span}L")
        else:
            # wider ranges would overflow the BIGINT product (ANSI
            # mode: job-killing runtime error; ANSI off: silent wrap
            # and a WRONG clustering) — widen through DECIMAL(38,0),
            # exact for any 64-bit range at any bits setting
            bucket = F.expr(
                f"CAST(((CAST({c} AS DECIMAL(38, 0)) - {int(lo)})"
                f" * {n}) div {span} AS BIGINT)")
        # interleave: bucket bit b -> zkey bit b * len(cols) + i
        for b in range(bits):
            parts.append(
                (F.shiftright(bucket, b) % 2)
                * F.lit(1 << (b * len(cols) + i)).cast("long"))
    zkey = parts[0]
    for p in parts[1:]:
        zkey = zkey + p
    return df.withColumn("zkey", zkey.cast("long"))


def zorder_cluster(df: DataFrame, cols: list[str], bits: int = 8,
                   n_files: int = 16) -> DataFrame:
    """The clustered layout: rows range-partitioned AND sorted by the
    Morton key — what a `OPTIMIZE ... ZORDER BY` writes.  One sampled
    range exchange; the sort rides it (sortWithinPartitions).  Write
    the result per-partition to get files whose min/max envelopes are
    tight in every clustered dimension."""
    keyed = zorder_key(df, cols, bits=bits)
    return (keyed.repartitionByRange(n_files, "zkey")
            .sortWithinPartitions("zkey"))


def layout_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-partition min/max envelope of each column + row count —
    the pruning-effectiveness diagnostic (how much of each dimension's
    range a file spans; narrower = more scans skip it).  One
    mapInPandas-free pass: spark_partition_id + one keyed agg."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").agg(*aggs))
