"""Incremental materialized-report maintenance.

The reference recomputes every report from scratch per query
(`octofludb report masterlist` re-runs masterlist.rq + mk_masterlist
over the whole GraphDB store, ui.py:1276-1334).  At 100 TB a per-batch
full recompute is the dominant cost of keeping a report current, so
this module keeps the A8 masterlist materialized in the store and
folds KG changes in at O(changes + affected entities):

  1. `read_changelog` gives the triples inserted or deleted since the
     report's base snapshot — O(changes), never a table scan (store.py
     CDC scan: new data segments + new equality-delete files; the
     merge-on-read deletes a component-merge batch writes are PART of
     the changelog, not a lineage break).
  2. The changed rows name the touched entities; one semi-join walk
     (gid -> sid through has_segment, sid -> barcode) turns those into
     the set of AFFECTED BARCODES — the report's grouping key.
  3. Every strain carrying an affected barcode (shared-barcode safety)
     and its segments are re-read with subject semi-joins, and the
     report is recomputed ONLY over that slice.
  4. The materialized table is patched merge-on-read: an O(affected)
     equality-delete segment keyed by Barcode (Iceberg v2 delete file
     whose equality id is the report key), then an O(affected) append
     of the recomputed rows.  The big table is never rewritten.

If the triple table was REWRITTEN since the base snapshot (a delete /
compact breaks append lineage), refresh falls back to a full
rematerialize and says so — never a silently-wrong incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import NT
from octofludb_spark.plans.reports import masterlist_report
from octofludb_spark.plans.views import GraphViews

MASTERLIST_TABLE = "masterlist_rows"
_META_PRED = "octofludb-spark:materialized-base-seq"


def _base_seq_path(store) -> str:
    import os

    return os.path.join(store.root, "metadata",
                        f"{MASTERLIST_TABLE}.base_seq")


def _read_base_seq(store) -> int | None:
    import os

    p = _base_seq_path(store)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def _write_base_seq(store, seq: int) -> None:
    p = _base_seq_path(store)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(seq))
    import os

    os.replace(tmp, p)


def masterlist_materialize(spark: SparkSession, store,
                           table: str = "triples_canonical") -> int:
    """Full compute of the 33-col masterlist over `table`, written as
    the materialized `masterlist_rows` table; records the triple
    snapshot seq it reflects.  Returns the row count."""
    # capture the seq BEFORE reading: a triple commit landing while
    # the report computes is then re-scanned by the next refresh (a
    # harmless re-process) instead of silently excluded forever
    seq = store.manifest().get("seq", 0)
    trip = store.read(spark, table)
    if trip is None:
        raise ValueError(f"no such table {table!r}")
    report = masterlist_report(GraphViews(trip)).persist()
    n = report.count()
    store.write(report, MASTERLIST_TABLE)
    report.unpersist()
    _write_base_seq(store, seq)
    return n


def affected_barcodes(changes: DataFrame, trip: DataFrame) -> DataFrame:
    """One column `barcode`: the report keys whose groups the changed
    triples can influence.  Entity walk: changed subjects/uri-objects
    -> strains (directly, or gid -> sid through has_segment) ->
    barcode values; plus barcode values appearing in the changes
    themselves.  Every join keeps the O(changes) side on the right of
    a semi-join, so the full triple table is scanned once per
    predicate view and never shuffled by the big side."""
    hs = trip.where(F.col("predicate") == NT + "has_segment")
    bc = trip.where(F.col("predicate") == NT + "barcode")

    # REVERSE hops expand from changed SUBJECTS only: a changed
    # subject is a node whose OWN attribute set changed — if it is a
    # SHARED attribute node (a country/state/feature node on the
    # sid->country->code or gid->feature->serotype paths that
    # masterlist_slice preserves), every strain referencing it goes
    # stale.  Changed uri-OBJECTS are deliberately NOT reverse-hopped:
    # the triple linking s to o changed, but o's own attributes did
    # not, so strains OTHER than s that reference o are unaffected —
    # hopping from objects would fan a single (sid, country, USA)
    # insert out to every strain in the corpus.  Walked to the same
    # 2-hop depth the forward slice expands; each hop is an
    # O(changes)-keyed semi-join.
    subj_changed = changes.select(F.col("subject").alias("node")).distinct()
    uri_edges = trip.where(F.col("object_dtype") == "uri")
    rev = subj_changed
    for _ in range(2):
        referrers = (
            uri_edges.join(rev, uri_edges["object_lex"] == rev["node"],
                           "left_semi")
            .select(F.col("subject").alias("node"))
        )
        # pin the O(changes) frontier each round: without it, round
        # r's plan re-embeds every earlier round's big-table semi-join,
        # so the triple table is rescanned O(r^2) times at evaluation
        rev = rev.unionByName(referrers).distinct().localCheckpoint()
    touched = (
        rev.unionByName(
            changes.where(F.col("object_dtype") == "uri")
            .select(F.col("object_lex").alias("node")))
        .distinct()
    )
    sid_direct = touched.select(F.col("node").alias("sid"))
    sid_via_gid = (
        hs.join(touched, hs["object_lex"] == touched["node"], "left_semi")
        .select(F.col("subject").alias("sid"))
    )
    sids = sid_direct.unionByName(sid_via_gid).distinct()
    from_graph = (
        bc.join(sids, bc["subject"] == sids["sid"], "left_semi")
        .select(F.col("object_lex").alias("barcode"))
    )
    from_changes = (
        changes.where(F.col("predicate") == NT + "barcode")
        .select(F.col("object_lex").alias("barcode"))
    )
    return from_graph.unionByName(from_changes).distinct()


def masterlist_slice(trip: DataFrame, barcodes: DataFrame,
                     materialize: bool = True) -> DataFrame:
    """Recompute masterlist rows ONLY for the given barcodes: every
    strain carrying one of them (shared-barcode safety), plus those
    strains' segments, semi-joined out of the triple table; the report
    plan then runs over the O(affected) slice.

    The slice is MATERIALIZED (localCheckpoint) before the report plan
    consumes it: the 33-col masterlist derives ~20 predicate views
    from its input, and a lazy slice would replay the full-table
    semi-join chain once per view — ~20 full scans of the triple
    table.  Checkpointing pins the O(affected) rows once, so the
    report's views scan the tiny slice and the big table is read
    exactly once per refresh."""
    bc = trip.where(F.col("predicate") == NT + "barcode")
    sids = (
        bc.join(barcodes, bc["object_lex"] == barcodes["barcode"],
                "left_semi")
        .select(F.col("subject").alias("ent"))
    )
    hs = trip.where(F.col("predicate") == NT + "has_segment")
    gids = (
        hs.join(sids, hs["subject"] == sids["ent"], "left_semi")
        .select(F.col("object_lex").alias("ent"))
    )
    ents = sids.unionByName(gids).distinct().localCheckpoint()
    # follow uri-valued attributes two hops out so path patterns
    # (sid -> country -> code, sid -> state -> abbr, gid -> feature ->
    # serotype) still bind inside the slice — each hop is one more
    # O(affected) semi-join.  Each round's frontier is pinned
    # (localCheckpoint) so the big table is scanned once per hop, not
    # once per hop per downstream re-evaluation.
    uris = trip.where(F.col("object_dtype") == "uri")
    for _ in range(2):
        nxt = (
            uris.join(ents, uris["subject"] == ents["ent"], "left_semi")
            .select(F.col("object_lex").alias("ent"))
        )
        ents = ents.unionByName(nxt).distinct().localCheckpoint()
    sub = trip.join(ents, trip["subject"] == ents["ent"], "left_semi")
    if materialize:
        # re-width first: the lazy slice inherits the BIG table's scan
        # partitioning (one per bucket dir), and a checkpoint pins it —
        # every one of the report's ~20 view scans would then schedule
        # a task per (mostly empty) bucket.  One O(affected) shuffle
        # down to cluster width makes the pinned slice proportionate.
        sub = sub.repartition(
            sub.sparkSession.sparkContext.defaultParallelism)
        sub = sub.localCheckpoint()
    return masterlist_report(GraphViews(sub))


def masterlist_refresh(spark: SparkSession, store,
                       table: str = "triples_canonical") -> dict:
    """Fold triple changes since the materialized base snapshot into
    `masterlist_rows`.  Returns {"mode", "affected_barcodes",
    "rows_appended"}.  mode is 'noop' (no changes), 'incremental'
    (delete-segment + append patch) or 'full' (append lineage broken
    since base — honest rematerialize)."""
    base = _read_base_seq(store)
    if base is None:
        n = masterlist_materialize(spark, store, table=table)
        return {"mode": "full", "affected_barcodes": None,
                "rows_appended": n}
    # capture the seq the changelog read resolves against BEFORE the
    # read: a triple commit landing after this point is either already
    # inside the changelog window (processed now, harmlessly
    # re-scanned next refresh) or re-scanned next refresh — never
    # silently excluded.  The refresh's own masterlist_rows commits
    # below don't touch the triples table, so writing this seq after
    # them is safe.
    next_base = store.manifest().get("seq", 0)
    try:
        changes = store.read_changelog(spark, table, since=base)
    except ValueError:
        n = masterlist_materialize(spark, store, table=table)
        return {"mode": "full", "affected_barcodes": None,
                "rows_appended": n}
    if changes is None:
        return {"mode": "noop", "affected_barcodes": 0,
                "rows_appended": 0}
    trip = store.read(spark, table)
    # localCheckpoint (not just persist): the iterative entity walk
    # builds a deep logical plan; the barcode set is tiny (report
    # keys), so truncating its lineage here keeps the downstream slice
    # plan flat instead of replicating the walk into every semi-join
    barcodes = affected_barcodes(changes, trip).localCheckpoint()
    n_bc = barcodes.count()
    if n_bc == 0:
        _write_base_seq(store, next_base)
        barcodes.unpersist()
        return {"mode": "incremental", "affected_barcodes": 0,
                "rows_appended": 0}
    patch = masterlist_slice(trip, barcodes).persist()
    n_rows = patch.count()
    # merge-on-read, ONE commit: Barcode-keyed equality delete + the
    # recomputed rows land in a single manifest swap (Iceberg v2
    # single-transaction semantics; the delete's sequence number
    # precedes the append's, so it cannot eat the new rows, and a
    # concurrent reader never sees the keys deleted-but-unreplaced)
    store.patch_rows_mor(
        spark, barcodes.select(F.col("barcode").alias("Barcode")),
        patch, table=MASTERLIST_TABLE)
    patch.unpersist()
    barcodes.unpersist()
    _write_base_seq(store, next_base)
    return {"mode": "incremental", "affected_barcodes": n_bc,
            "rows_appended": n_rows}
