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
