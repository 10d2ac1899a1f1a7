"""Logical-plan lineage truncation — the iterative/multi-action-op
discipline shared by the graph ops, the LSH pair miners and the CC
callers.

persist() bounds *execution* but every downstream reference still
re-embeds the full upstream LOGICAL plan, so Catalyst re-analyzes it
once per action.  For operators whose upstream is a giant expression
tree (the 24-hyperplane LSH folds, the 128-perm MinHash projections,
a deep extract->canonicalize chain), the re-analysis is multi-second
DRIVER time per action at any data size — and at 100 TB the plans are
the same, so it is pure fixed waste there too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Scale-adaptive floor on map-side parallelism (guide §2.5's
    input-skew fix: "one huge unsplittable file — repartition
    immediately after the read").

    A parquet table written as one row group scans as ONE task no
    matter how many cores the session has, so every map-heavy
    operator downstream (recognizer batteries, PNG decode, k-gram
    hashing, hyperplane folds) runs single-threaded while the rest of
    the box idles — measured: the whole image-dhash chain on 32 cores
    was one 2.4 s task.  Repartitioning costs one round-robin
    exchange of the raw rows (bytes move once) and buys scan-stage
    parallelism == cores.

    Scale-adaptive, not local-tuned: the floor is
    ``sparkContext.defaultParallelism`` (total cores on any cluster),
    and inputs that already scan with at least that many partitions —
    every real 100 TB table — pass through untouched.

    Only safe for order-insensitive consumers (per-row pure maps +
    keyed aggregations with deterministic tie-breaks — the engine's
    standing cross-engine discipline); do NOT wrap operators that
    read meaning into partition ids or within-partition order."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts < target:
        return df.repartition(target)
    return df


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and CUT its logical-plan lineage.

    Uses reliable ``checkpoint()`` (+persist: the checkpoint re-reads
    files per scan) when the caller configured a checkpoint dir —
    that's the explicit durability request; note files outlive the op
    unless ``spark.cleaner.referenceTracking.cleanCheckpoints`` is on
    (the engine's own get_spark enables it).  Otherwise eager
    ``localCheckpoint()`` — executor-local, right for local mode and
    for clusters that can afford recompute-on-loss."""
    try:
        has_dir = (df.sparkSession.sparkContext._jsc.sc()
                   .getCheckpointDir().isDefined())
    except Exception:
        has_dir = False
    if not has_dir:
        return df.localCheckpoint()
    # reliable checkpoint computes the plan TWICE unless the
    # pre-checkpoint partitions are cached (the checkpoint write is a
    # second job over the same lineage — Spark's documented RDD
    # semantics): persist first so the write job reads the cache, then
    # drop the scratch cache and persist the checkpointed (file-backed)
    # result so later scans don't re-read the files every time
    df = df.persist()
    out = df.checkpoint()  # eager: materializes via the cache
    df.unpersist()
    return out.persist()
