"""Incrementally-maintained sketch tables over the triple store —
the sketch family (scale/sketches.py) wired into the store's
changelog the same way the materialized masterlist is
(incremental_reports.py): per-predicate HyperLogLog registers
(distinct-object monitor — the hub/degree question asked cheaply) and
a count-min counter table over object values (hot-value monitor),
refreshed at O(changes) from `read_changelog`.

Delete semantics are where the two sketches genuinely differ, and the
module keeps that honest instead of papering over it:

  * CMS counters are a linear sketch — counts ADD on insert and
    SUBTRACT on delete, so the refreshed counter table is exactly the
    full recompute for ANY changelog.
  * HLL registers are monotone (MAX) — inserts merge, deletes cannot
    be unwound.  A changelog containing deletes downgrades the HLL
    half to a full recompute (logged, mode='recompute'), which is
    what production HLL systems do too.

Both refresh paths capture the manifest seq BEFORE reading the
changelog (the masterlist_refresh discipline), so a concurrent commit
is re-scanned next time, never silently skipped.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octofludb_spark.scale.sketches import CMS_D, CMS_W, HLL_M, RHO_MAX

log = logging.getLogger(__name__)

HLL_TABLE = "sketch_hll_regs"
CMS_TABLE = "sketch_cms"


def _base_seq_path(store, table: str) -> str:
    return os.path.join(store.root, "metadata", f"{table}.base_seq")


def _read_base_seq(store, table: str) -> int | None:
    p = _base_seq_path(store, table)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def _write_base_seq(store, seq: int, table: str) -> None:
    p = _base_seq_path(store, table)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(seq))
    os.replace(tmp, p)


def hll_register_table(triples: DataFrame) -> DataFrame:
    """Per-predicate HLL registers over object_lex:
    (predicate, idx, m_r).  MAX-mergeable; ~256 rows per predicate."""
    h = F.conv(F.substring(F.md5("object_lex"), 1, 12), 16, 10) \
        .cast("long")
    parts = triples.select(
        "predicate",
        (h % HLL_M).alias("idx"),
        F.expr(f"CAST(conv(substring(md5(object_lex), 1, 12), 16, 10) "
               f"AS BIGINT) DIV {HLL_M}").alias("suffix"),
    ).select(
        "predicate", "idx",
        F.when(F.col("suffix") == 0, F.lit(RHO_MAX))
        .otherwise(F.lit(RHO_MAX) - F.length(F.bin("suffix")))
        .alias("rho"),
    )
    return parts.groupBy("predicate", "idx").agg(F.max("rho").alias("m_r"))


def cms_counter_table(triples: DataFrame) -> DataFrame:
    """Count-min counters over object_lex occurrences:
    (row_id, bucket, cnt) — d*w rows total, SUM/SUBTRACT-mergeable."""
    rows = triples.select(
        F.col("object_lex").alias("v"),
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)]))
        .alias("row_id"),
    )
    bkt = F.conv(
        F.substring(F.md5(F.concat(F.col("row_id").cast("string"),
                                   F.lit("|"), F.col("v"))), 1, 4),
        16, 10,
    ).cast("int") % CMS_W
    return (rows.select("row_id", bkt.alias("bucket"))
            .groupBy("row_id", "bucket").agg(F.count("*").alias("cnt")))


def sketch_materialize(spark: SparkSession, store,
                       table: str = "triples_canonical") -> dict:
    """Full compute of both sketch tables; records the base seq."""
    seq = store.manifest().get("seq", 0)
    trip = store.read(spark, table)
    if trip is None:
        raise ValueError(f"no such table {table!r}")
    hll = hll_register_table(trip).persist()
    cms = cms_counter_table(trip).persist()
    n_hll, n_cms = hll.count(), cms.count()
    store.write(hll, HLL_TABLE)
    store.write(cms, CMS_TABLE)
    hll.unpersist(), cms.unpersist()
    _write_base_seq(store, seq, HLL_TABLE)
    _write_base_seq(store, seq, CMS_TABLE)
    return {"mode": "full", "hll_rows": n_hll, "cms_rows": n_cms}


def sketch_refresh(spark: SparkSession, store,
                   table: str = "triples_canonical") -> dict:
    """O(changes) refresh of both sketch tables from the store
    changelog.  CMS: counters add/subtract exactly for any changelog.
    HLL: register MAX-merge for insert-only changelogs; any delete
    downgrades the HLL half to a full recompute (logged)."""
    base = _read_base_seq(store, HLL_TABLE)
    if base is None:
        return sketch_materialize(spark, store, table)
    seq = store.manifest().get("seq", 0)
    try:
        changes = store.read_changelog(spark, table, since=base)
    except ValueError:
        log.warning("sketch_refresh: table rewritten — full recompute")
        return sketch_materialize(spark, store, table)
    if changes is None:
        return {"mode": "noop", "hll_rows": 0, "cms_rows": 0}

    changes = changes.persist()
    n_del = changes.where(F.col("_change_type") == "delete").count()
    ins = changes.where(F.col("_change_type") == "insert")

    # ---- CMS: exact under deletes (linear sketch) --------------------
    delta = (
        cms_counter_table(ins)
        .unionByName(
            cms_counter_table(
                changes.where(F.col("_change_type") == "delete"))
            .withColumn("cnt", -F.col("cnt")))
        .groupBy("row_id", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    old_cms = store.read(spark, CMS_TABLE)
    new_cms = (
        old_cms.unionByName(delta)
        .groupBy("row_id", "bucket").agg(F.sum("cnt").alias("cnt"))
        .where(F.col("cnt") != 0)
        .persist()
    )
    n_cms = new_cms.count()
    store.write(new_cms, CMS_TABLE)
    new_cms.unpersist()
    _write_base_seq(store, seq, CMS_TABLE)

    # ---- HLL: MAX-merge, or recompute when deletes exist -------------
    if n_del:
        log.warning("sketch_refresh: %d deletes — HLL registers are "
                    "monotone, recomputing that half", n_del)
        trip = store.read(spark, table)
        new_hll = hll_register_table(trip).persist()
        mode = "cms-incremental+hll-recompute"
    else:
        old_hll = store.read(spark, HLL_TABLE)
        new_hll = (
            old_hll.unionByName(hll_register_table(ins))
            .groupBy("predicate", "idx").agg(F.max("m_r").alias("m_r"))
            .persist()
        )
        mode = "incremental"
    n_hll = new_hll.count()
    store.write(new_hll, HLL_TABLE)
    new_hll.unpersist()
    changes.unpersist()
    _write_base_seq(store, seq, HLL_TABLE)
    return {"mode": mode, "hll_rows": n_hll, "cms_rows": n_cms,
            "n_deletes": n_del}
