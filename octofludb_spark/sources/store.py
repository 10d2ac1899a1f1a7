"""Manifest-swap parquet triple store — Iceberg-shaped semantics
without the Iceberg runtime (this sandbox has no Iceberg jar or
network; SURVEY.md §7.0).

Guarantees, matching what the pipeline needs from Iceberg:
  * atomic commit: data lands in an unreferenced snapshot directory
    first; the commit is a single atomic ``os.replace`` of
    ``manifest.json`` pointing at it.
  * snapshot isolation + resume: a killed job leaves the previous
    manifest intact; restart re-reads the last committed snapshot and
    re-runs only uncommitted stages (checkpoint-resumable stages,
    north_rule).
  * idempotent merge: append = union + dropDuplicates into a NEW
    snapshot (reference semantics: uploading the same data twice adds
    nothing, README.md:96).
  * merge-on-read equality deletes: ``delete_rows_mor`` writes an
    O(deletes) delete segment instead of rewriting the snapshot
    (Iceberg v2 equality-delete files); ``read`` anti-joins the live
    delete rows, ``compact`` folds them back into a clean snapshot.
  * layout for pruning: data is hash-bucketed by subject
    (``part_bucket = pmod(xxhash64(subject), n_buckets)``) and written
    partitionBy(part_bucket), so point lookups and co-located
    self-joins prune/skip shuffles.

Swapping this for a real Iceberg catalog is a config change: the
writer/reader interface takes DataFrames and table names only.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"
TRIPLE_KEY = ["subject", "predicate", "object_lex", "object_dtype"]


class StoreCommitConflict(RuntimeError):
    """Another writer committed since this mutation read the manifest.

    The Iceberg optimistic-concurrency contract: a commit is only
    valid against the snapshot it was computed from; on conflict the
    caller re-reads and re-applies (or fails loudly) — it must never
    silently clobber the other writer's commit (lost update)."""


class TripleStore:
    def __init__(self, root: str, n_buckets: int | None = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # The bucket count is part of the on-disk layout, so the
        # committed manifest is authoritative once it exists: a reader
        # opening an existing store MUST prune with the writer's bucket
        # count or point lookups silently miss ~half the subjects.
        committed = self.manifest().get("n_buckets")
        self.n_buckets = int(committed or n_buckets or 32)

    # ---- manifest protocol ------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"tables": {}, "committed_stages": [], "seq": 0}
        with open(p) as f:
            return json.load(f)

    def _commit(self, m: dict) -> None:
        # Optimistic CAS (Iceberg catalog commit): `m` still carries
        # the seq it was READ at; if the on-disk manifest has moved
        # past it, a concurrent writer won the race — raise instead of
        # silently clobbering its tables/segments lists.  Checked
        # BEFORE the versioned metadata file is written so a losing
        # commit leaves no trace in the log.  (A real catalog runs
        # this compare-and-swap transactionally; the remaining
        # microsecond window here is the POSIX approximation for the
        # single-driver-per-store deployments this sandbox runs.)
        base = m.get("seq", 0)
        current = self.manifest().get("seq", 0)
        if current != base:
            raise StoreCommitConflict(
                f"manifest moved from seq {base} to {current} during "
                "this mutation; re-read and re-apply")
        m["seq"] = m.get("seq", 0) + 1
        m["n_buckets"] = self.n_buckets
        m["committed_at"] = time.time()
        # Iceberg metadata-log protocol: the full manifest is first
        # written as an immutable versioned file (metadata/vN.json),
        # THEN the current-pointer swaps atomically.  The retained log
        # is what makes time travel (read as_of=seq) and incremental
        # reads (read_changes since=seq) possible; expire_snapshots
        # trims it.
        meta_dir = os.path.join(self.root, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        with open(os.path.join(meta_dir, f"v{m['seq']:08d}.json"), "w") as f:
            json.dump(m, f, indent=1)
        tmp = self._manifest_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic swap

    def _manifest_at(self, seq: int) -> dict:
        """The manifest as of commit `seq` (time travel).  Raises if
        that version has been expired or never existed."""
        p = os.path.join(self.root, "metadata", f"v{seq:08d}.json")
        if not os.path.exists(p):
            raise ValueError(
                f"no manifest version {seq} (expired or never committed)")
        with open(p) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """Commit log, oldest first: one row per retained manifest
        version with seq / committed_at / committed_stages / tables
        (Iceberg's snapshot-history metadata table)."""
        meta_dir = os.path.join(self.root, "metadata")
        if not os.path.isdir(meta_dir):
            return []
        out = []
        for name in sorted(os.listdir(meta_dir)):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            with open(os.path.join(meta_dir, name)) as f:
                m = json.load(f)
            out.append({
                "seq": m.get("seq"),
                "committed_at": m.get("committed_at"),
                "committed_stages": list(m.get("committed_stages", [])),
                "tables": sorted(m.get("tables", {})),
            })
        return out

    def init(self) -> dict:
        """Commit an empty manifest if none exists (the reference's
        `octofludb init` creates an empty repo, ui.py:120-160) so
        later build/merge/upload commits append to a seq-1 log."""
        if not os.path.exists(self._manifest_path()):
            self._commit(self.manifest())
        return self.manifest()

    def stage_done(self, stage: str) -> bool:
        return stage in self.manifest().get("committed_stages", [])

    # ---- tables -----------------------------------------------------------

    def _snap_dir(self, table: str) -> str:
        snap = f"snap-{uuid.uuid4().hex}"
        return os.path.join(self.root, "data", table, snap)

    def write(self, df: DataFrame, table: str, stage: str | None = None,
              bucket_by_subject: bool = False,
              files_per_bucket: int | None = None) -> str:
        """Write df as a NEW snapshot of `table`, then commit.

        files_per_bucket splits each bucket partition across ~that many
        shuffle keys (compaction's file-count control): each
        (bucket, slot) combo hashes wholly into one task, so a bucket
        directory receives at most files_per_bucket files.  The slot is
        salted over the WHOLE triple, not just the subject, so a hub
        entity's triples (north_star: H1N1-style hot subjects) spread
        across all slots instead of re-concentrating in one task."""
        path = self._snap_dir(table)
        writer = df
        if "object_dtype" in df.columns:
            # Store invariant: dtype is NEVER NULL on disk ('' = plain
            # literal, the emit convention).  A NULL would compare
            # unequal to '' in the merge presence join and re-append on
            # every merge.
            writer = writer.withColumn(
                "object_dtype", F.coalesce("object_dtype", F.lit("")))
        if bucket_by_subject and "subject" in df.columns:
            writer = writer.withColumn(
                "part_bucket",
                F.pmod(F.xxhash64("subject"), F.lit(self.n_buckets)),
            )
            if files_per_bucket and files_per_bucket > 1:
                writer = (
                    writer.withColumn(
                        "file_slot",
                        F.pmod(F.xxhash64(*[c for c in df.columns
                                            if c != "part_bucket"]),
                               F.lit(files_per_bucket)),
                    )
                    .repartition("part_bucket", "file_slot")
                    .drop("file_slot")
                )
            else:
                writer = writer.repartition("part_bucket")
            # Sort each task's rows by (predicate, subject) before the
            # parquet write: predicate runs give every row group a
            # tight min/max predicate stat, so the dominant access
            # pattern (GraphViews predicate scans, PushedFilters
            # EqualTo(predicate)) SKIPS the row groups of every other
            # predicate instead of decoding them.  Map-side only — no
            # extra shuffle.
            writer = writer.sortWithinPartitions(
                "part_bucket", "predicate", "subject") \
                if "predicate" in df.columns else writer
            writer.write.mode("overwrite").partitionBy("part_bucket").parquet(path)
        else:
            writer.write.mode("overwrite").parquet(path)
        m = self.manifest()
        m["tables"][table] = path
        # a full snapshot supersedes every appended segment and every
        # pending equality delete
        m.get("segments", {}).pop(table, None)
        m.get("deletes", {}).pop(table, None)
        if stage and stage not in m.setdefault("committed_stages", []):
            m["committed_stages"].append(stage)
        self._commit(m)
        return path

    def merge_triples(self, spark: SparkSession, df: DataFrame,
                      table: str = "triples", stage: str | None = None) -> str:
        """Idempotent merge, Iceberg-append style: only the rows NOT
        already present are written, as a NEW data segment listed in
        the manifest — the existing store is never rewritten, so a
        merge costs O(batch), not O(store).  The existence check
        prunes the scan to the batch's subject buckets and runs as a
        broadcast semi-join (one map-side pass, no shuffle of the
        store).  A merge into the live ``triples`` table also keeps
        ``triples_canonical`` in sync: the batch is rewritten through
        the precomputed alias map and appended there — post-build
        merges (enrichment rounds, ``merge``/``fetch tag`` CLI) stay
        visible to queries, which read the canonical view (the
        reference has one graph).  ``compact`` folds accreted
        segments back into one snapshot."""
        # Normalize NULL dtype to '' (the emit convention) BEFORE the
        # presence joins: SQL null never equals null, so a NULL-dtype
        # triple would elude the semi/anti-join and re-append on every
        # merge — silent duplication under an idempotent contract.
        incoming = (
            df.select(*TRIPLE_KEY)
            .withColumn("object_dtype", F.coalesce("object_dtype", F.lit("")))
            .dropDuplicates(TRIPLE_KEY)
        )
        out = self.merge_rows(spark, incoming, table, stage=stage)
        if table == "triples":
            # Keep the canonical view in sync — including INCREMENTAL
            # entity linking when the batch carries new owl:sameAs
            # edges into a built store (GraphDB re-infers sameAs on
            # every upload, octofludb-config.ttl:29; before this the
            # new links were appended but never merged components).
            # Upload-only stores (no build yet) mirror verbatim; a
            # later build_graph links globally.
            from octofludb_spark.ops.incremental import sync_canonical

            sync_canonical(spark, self, incoming)
        return out

    def merge_rows(self, spark: SparkSession, df: DataFrame, table: str,
                   stage: str | None = None) -> str:
        """Idempotent presence-checked append of triple rows into any
        triple-shaped table — ``merge_triples`` minus the canonical
        mirroring (the incremental build syncs the canonical view
        itself, with the UPDATED alias map)."""
        incoming = (
            df.select(*TRIPLE_KEY)
            .withColumn("object_dtype", F.coalesce("object_dtype", F.lit("")))
            .dropDuplicates(TRIPLE_KEY)
        )
        current = self.read(spark, table)
        if current is None:
            return self.write(incoming, table, stage=stage,
                              bucket_by_subject=True)
        return self._append_segment(spark, incoming, current, table,
                                    stage=stage)

    def _append_segment(self, spark: SparkSession, incoming: DataFrame,
                        current: DataFrame, table: str,
                        stage: str | None = None) -> str:
        """Write ``incoming``'s not-yet-present rows as an appended
        data segment and commit it to the manifest's segment list."""
        # Pin the O(batch) incoming rows once: callers hand in plans
        # that are expensive to re-evaluate (canonicalize + rewritten
        # unions over merge-on-read reads), and this method otherwise
        # evaluates `incoming` three times — the bucket collect, the
        # presence semi-join's broadcast side, and the anti-join.
        incoming = incoming.persist()
        try:
            return self._append_segment_pinned(spark, incoming, current,
                                               table, stage=stage)
        finally:
            incoming.unpersist()

    def _append_segment_pinned(self, spark: SparkSession,
                               incoming: DataFrame, current: DataFrame,
                               table: str, stage: str | None = None) -> str:
        bucketed = "part_bucket" in current.columns
        if bucketed:
            inc_b = incoming.withColumn(
                "part_bucket",
                F.pmod(F.xxhash64("subject"), F.lit(self.n_buckets)),
            )
            buckets = [int(r.part_bucket) for r in
                       inc_b.select("part_bucket").distinct().collect()]
            pruned = current.where(F.col("part_bucket").isin(buckets))
        else:
            inc_b = incoming
            pruned = current
        # Null-safe equi-joins (<=> is still a hash-join key for
        # Catalyst): a NULL in any key column — e.g. a raw write() of
        # NULL-dtype triples — must not elude the presence check, or
        # every merge re-appends those rows forever.
        def _nsafe(left, right):
            return [left[k].eqNullSafe(right[k]) for k in TRIPLE_KEY]

        inc_a = incoming.alias("inc")
        cur_a = pruned.alias("cur")
        existing = (cur_a.join(F.broadcast(inc_a), _nsafe(cur_a, inc_a),
                               "left_semi").select(*TRIPLE_KEY))
        ex_a = existing.alias("ex")
        incb_a = inc_b.alias("incb")
        new_rows = incb_a.join(F.broadcast(ex_a), _nsafe(incb_a, ex_a),
                               "left_anti").persist()
        seg_path = None
        if new_rows.count():
            seg_path = self._snap_dir(table)
            if bucketed:
                (new_rows.repartition("part_bucket")
                 .sortWithinPartitions("part_bucket", "predicate",
                                       "subject")
                 .write.mode("overwrite").partitionBy("part_bucket")
                 .parquet(seg_path))
            else:
                new_rows.write.mode("overwrite").parquet(seg_path)
        new_rows.unpersist()
        m = self.manifest()
        if seg_path:
            m.setdefault("segments", {}).setdefault(table, []).append(seg_path)
        if stage and stage not in m.setdefault("committed_stages", []):
            m["committed_stages"].append(stage)
        self._commit(m)
        return seg_path or m["tables"].get(table, "")

    def delete_where(self, spark: SparkSession, condition,
                     table: str = "triples", stage: str | None = None) -> str:
        """Iceberg-style DELETE WHERE via snapshot rewrite (the
        reference's delete-*.rq ops, SURVEY.md §2.9).  A delete from
        the live ``triples`` table mirrors onto ``triples_canonical``
        (every shipped delete condition is predicate/object-shaped, so
        the same Column applies to both tables)."""
        current = self.read(spark, table)
        if current is None:
            raise ValueError(f"no such table {table}")
        out = self.write(current.where(~condition), table, stage=stage,
                         bucket_by_subject=True)
        if table == "triples":
            cur_c = self.read(spark, "triples_canonical")
            if cur_c is not None:
                self.write(cur_c.where(~condition), "triples_canonical",
                           bucket_by_subject=True)
        return out

    def delete_rows(self, spark: SparkSession, rows: DataFrame,
                    table: str = "triples", stage: str | None = None) -> str:
        """SPARQL-UPDATE-style row deletion: remove every triple whose
        (subject, predicate, object_lex) matches a row (all dtypes of
        a matching lexical are the pattern's solutions, so the 3-key
        is exact DELETE WHERE semantics).  A delete from the live
        ``triples`` table mirrors onto ``triples_canonical`` through
        the alias map, same policy as delete_where."""
        key3 = ["subject", "predicate", "object_lex"]
        dels = rows.select(*key3).dropDuplicates()
        current = self.read(spark, table)
        if current is None:
            raise ValueError(f"no such table {table}")
        # recover dtypes for the matched rows BEFORE the rewrite — the
        # canonical mirror rewrites uri objects through the alias map,
        # which needs the real object_dtype
        matched = (current.join(F.broadcast(dels), key3, "left_semi")
                   .select(*TRIPLE_KEY).dropDuplicates())
        remaining = current.join(F.broadcast(dels), key3, "left_anti")
        out = self.write(remaining, table, stage=stage,
                         bucket_by_subject=True)
        if table == "triples":
            cur_c = self.read(spark, "triples_canonical")
            if cur_c is not None:
                from octofludb_spark.ops.canonicalize import (BROADCAST_LIMIT,
                                                              canonicalize)

                mapping = self.read(spark, "canonical_map")
                cdels = dels if mapping is None else canonicalize(
                    matched,
                    mapping.select("node", "canonical"),
                    use_broadcast=mapping.count() <= BROADCAST_LIMIT,
                ).select(*key3).dropDuplicates()
                self.write(
                    cur_c.join(F.broadcast(cdels), key3, "left_anti"),
                    "triples_canonical", bucket_by_subject=True)
        return out

    def delete_rows_mor(self, spark: SparkSession, rows: DataFrame,
                        table: str = "triples",
                        stage: str | None = None) -> str | None:
        """Merge-on-read equality delete (Iceberg v2 delete files):
        write the doomed rows as an O(deletes) delete segment and list
        it in the manifest — the data snapshot is NOT rewritten.
        ``read`` anti-joins live delete rows; ``compact`` folds them
        into a clean snapshot.  This is the 100 TB path for the
        incremental component-merge rewrite, where a batch touches a
        few thousand canonical triples of a petabyte store.

        Low-level: no canonical-view mirroring (callers updating the
        live ``triples`` table should use delete_rows / delete_where,
        which keep both views in sync).

        Equality key = the delete rows' own columns (Iceberg equality
        delete files carry their equality_ids): triple-shaped rows key
        on TRIPLE_KEY as before; a non-triple materialized table (e.g.
        a report keyed by Barcode) deletes by whatever key columns the
        caller passes."""
        key = [c for c in TRIPLE_KEY if c in rows.columns] \
            or list(rows.columns)
        dels = rows.select(*key).dropDuplicates()
        if "object_dtype" in dels.columns:
            dels = dels.withColumn(
                "object_dtype", F.coalesce("object_dtype", F.lit("")))
        if dels.isEmpty():
            if stage:
                m = self.manifest()
                if stage not in m.setdefault("committed_stages", []):
                    m["committed_stages"].append(stage)
                    self._commit(m)
            return None
        seg = self._snap_dir(table)
        dels.write.mode("overwrite").parquet(seg)
        m = self.manifest()
        # Iceberg sequence-number semantics: the delete applies only to
        # data committed BEFORE it (the current primary + the first
        # n_segs segments).  A row re-appended later must NOT be eaten
        # by an older delete.
        m.setdefault("deletes", {}).setdefault(table, []).append({
            "path": seg,
            "n_segs": len(m.get("segments", {}).get(table, [])),
        })
        if stage and stage not in m.setdefault("committed_stages", []):
            m["committed_stages"].append(stage)
        self._commit(m)
        return seg

    def patch_rows_mor(self, spark: SparkSession, delete_keys: DataFrame,
                       new_rows: DataFrame, table: str,
                       stage: str | None = None) -> tuple[str | None, str]:
        """Single-commit merge-on-read patch: an equality-delete
        segment for ``delete_keys`` plus a data segment of
        ``new_rows``, committed as ONE manifest swap — the Iceberg
        single-transaction DELETE+APPEND an incremental report refresh
        wants.  Two commits (delete then append) leave a window where
        a reader sees the keys deleted but not yet replaced, and cost
        two metadata versions per refresh; one commit is atomic and
        halves the version-log churn.  Sequence semantics match the
        two-call form: the delete's ``n_segs`` is recorded BEFORE the
        new segment is listed, so the delete applies only to
        pre-existing data and cannot eat the rows it replaces."""
        key = [c for c in TRIPLE_KEY if c in delete_keys.columns] \
            or list(delete_keys.columns)
        dels = delete_keys.select(*key).dropDuplicates()
        if "object_dtype" in dels.columns:
            dels = dels.withColumn(
                "object_dtype", F.coalesce("object_dtype", F.lit("")))
        del_seg: str | None = self._snap_dir(table)
        dels.write.mode("overwrite").parquet(del_seg)
        primary = self.manifest()["tables"].get(table)
        if (primary and "subject" in new_rows.columns
                and "part_bucket" not in new_rows.columns):
            pcols = new_rows.sparkSession.read.parquet(primary).columns
            if "part_bucket" in pcols:
                new_rows = new_rows.withColumn(
                    "part_bucket",
                    F.pmod(F.xxhash64("subject"), F.lit(self.n_buckets)))
        data_seg = self._snap_dir(table)
        new_rows.write.mode("overwrite").parquet(data_seg)
        m = self.manifest()
        m.setdefault("deletes", {}).setdefault(table, []).append({
            "path": del_seg,
            "n_segs": len(m.get("segments", {}).get(table, [])),
        })
        if table not in m["tables"] and not m.get(
                "segments", {}).get(table):
            m["tables"][table] = data_seg
        else:
            m.setdefault("segments", {}).setdefault(table, []).append(
                data_seg)
        if stage and stage not in m.setdefault("committed_stages", []):
            m["committed_stages"].append(stage)
        self._commit(m)
        return del_seg, data_seg

    def append_rows(self, df: DataFrame, table: str,
                    stage: str | None = None) -> str:
        """Append rows as a new data segment with NO presence check —
        for run-keyed tables (lineage/metrics rows are per-batch facts,
        not set members; appending the same batch twice is a caller
        bug, not a merge).  O(batch): the existing table is not read.

        Writer consistency: appending to a subject-bucketed table
        stamps the same pmod(xxhash64(subject)) bucket column the
        primary snapshot carries, so readers can union and
        bucket-prune uniformly (only the primary's parquet FOOTER is
        touched — the data is not read)."""
        primary = self.manifest()["tables"].get(table)
        if (primary and "subject" in df.columns
                and "part_bucket" not in df.columns):
            pcols = df.sparkSession.read.parquet(primary).columns
            if "part_bucket" in pcols:
                df = df.withColumn(
                    "part_bucket",
                    F.pmod(F.xxhash64("subject"), F.lit(self.n_buckets)))
        seg = self._snap_dir(table)
        df.write.mode("overwrite").parquet(seg)
        m = self.manifest()
        if table not in m["tables"] and not m.get(
                "segments", {}).get(table):
            m["tables"][table] = seg
        else:
            m.setdefault("segments", {}).setdefault(table, []).append(seg)
        if stage and stage not in m.setdefault("committed_stages", []):
            m["committed_stages"].append(stage)
        self._commit(m)
        return seg

    def read(self, spark: SparkSession, table: str = "triples",
             as_of: int | None = None) -> DataFrame | None:
        """Current snapshot = the primary snapshot plus any appended
        merge segments (all listed in the manifest).  ``as_of=seq``
        time-travels: the read resolves against the manifest committed
        at that seq instead (snapshot dirs are immutable and retained
        until expire_snapshots, so the old view is still complete)."""
        m = self.manifest() if as_of is None else self._manifest_at(as_of)
        path = m["tables"].get(table)
        segs = [p for p in m.get("segments", {}).get(table, [])
                if os.path.exists(p)]
        dels = [d for d in m.get("deletes", {}).get(table, [])
                if os.path.exists(d["path"])]
        if path is None or not os.path.exists(path):
            if not segs:
                return None
            path, segs = segs[0], segs[1:]
            dels = [{**d, "n_segs": d["n_segs"] - 1} for d in dels]

        def _apply_delete(df: DataFrame, dpath: str) -> DataFrame:
            # merge-on-read: subtract the equality-delete rows.  The
            # delete set is O(changes) until compaction, so it
            # broadcasts; the big side never shuffles.  The delete
            # file's own columns are its equality ids (Iceberg v2).
            ddf = spark.read.parquet(dpath)
            key = [c for c in ddf.columns if c in df.columns]
            if not key:
                raise ValueError(
                    f"delete segment {dpath} shares no columns with "
                    f"table data")
            d_a, t_a = ddf.alias("d"), df.alias("t")
            return t_a.join(F.broadcast(d_a),
                           [t_a[k].eqNullSafe(d_a[k]) for k in key],
                           "left_anti")

        # Fold data segments and delete segments in commit order
        # (per-root reads: partition discovery is per-snapshot).  Each
        # delete applies only to data committed before it, so a row
        # re-appended after a delete of it survives.
        df = spark.read.parquet(path)
        idx = 0
        for d in dels:
            upto = min(max(d["n_segs"], 0), len(segs))
            for p in segs[idx:upto]:
                df = df.unionByName(spark.read.parquet(p))
            idx = max(idx, upto)
            df = _apply_delete(df, d["path"])
        for p in segs[idx:]:
            df = df.unionByName(spark.read.parquet(p))
        return df

    def read_subject(self, spark: SparkSession, subject: str,
                     table: str = "triples") -> DataFrame | None:
        """Point lookup with PARTITION PRUNING: the subject's bucket is
        computed driver-side with the same pmod(xxhash64(.)) the writer
        used, and the part_bucket filter prunes the scan to 1/n_buckets
        of the store — at 100 TB a subject lookup reads one partition
        directory, not the table.  (`.explain` shows the pruned
        PartitionFilters; tested structurally.)"""
        df = self.read(spark, table)
        if df is None or "part_bucket" not in df.columns:
            return None if df is None else df.where(F.col("subject") == subject)
        bucket = (
            spark.range(1)
            .select(F.pmod(F.xxhash64(F.lit(subject)),
                           F.lit(self.n_buckets)).alias("b"))
            .first()["b"]
        )
        return df.where((F.col("part_bucket") == int(bucket))
                        & (F.col("subject") == subject))

    def compact(self, spark: SparkSession, table: str = "triples",
                target_files: int = 1) -> str:
        """Small-file compaction via snapshot rewrite: streaming merges
        and incremental enrich rounds accrete many small parquet files
        per bucket; rewrite the current snapshot with ~target_files
        files per bucket partition (default 1 = maximal compaction; a
        100 TB store raises it so each bucket stays splittable).  The
        manifest swap keeps readers on the old snapshot until the new
        one commits."""
        current = self.read(spark, table)
        if current is None:
            raise ValueError(f"no such table {table}")
        if "part_bucket" in current.columns:
            out = current.drop("part_bucket")
            bucketed = "subject" in out.columns
        else:
            out = current
            bucketed = False
        if bucketed:
            return self.write(out, table, bucket_by_subject=True,
                              files_per_bucket=target_files)
        return self.write(out.coalesce(target_files), table)

    def read_changes(self, spark: SparkSession, table: str = "triples",
                     since: int = 0,
                     allow_rewrite_diff: bool = False) -> DataFrame | None:
        """Incremental read: the rows added to `table` AFTER manifest
        seq `since` (Iceberg's incremental append scan).  When every
        commit in (since, now] was an append segment, this reads ONLY
        the new segment files — O(changes), the path a downstream
        incremental consumer (enrich round, streaming sink, export)
        wants at 100 TB.  A snapshot REWRITE in the range (delete /
        compact / full write) breaks append lineage, exactly like
        Iceberg's overwrite snapshots: by default that raises, because
        silently returning a full-table diff would hide an O(store)
        anti-join behind an "incremental" name; pass
        allow_rewrite_diff=True to compute it explicitly."""
        cur = self.manifest()
        old = self._manifest_at(since) if since else {
            "tables": {}, "segments": {}}
        cur_primary = cur["tables"].get(table)
        old_primary = old["tables"].get(table)
        old_segs = list(old.get("segments", {}).get(table, []))
        cur_segs = list(cur.get("segments", {}).get(table, []))
        old_dels = list(old.get("deletes", {}).get(table, []))
        cur_dels = list(cur.get("deletes", {}).get(table, []))
        if old_primary is None and not old_segs:
            # table did not exist at `since` — everything is new
            return self.read(spark, table)
        if (cur_primary == old_primary
                and cur_segs[:len(old_segs)] == old_segs
                and cur_dels == old_dels):
            new_paths = [p for p in cur_segs[len(old_segs):]
                         if os.path.exists(p)]
            if not new_paths:
                return None
            df = spark.read.parquet(new_paths[0])
            for p in new_paths[1:]:
                df = df.unionByName(spark.read.parquet(p))
            return df
        if not allow_rewrite_diff:
            raise ValueError(
                f"table {table!r} was rewritten since seq {since} "
                "(delete/compact/overwrite) — append lineage is broken; "
                "pass allow_rewrite_diff=True for an anti-join diff")
        cur_df = self.read(spark, table)
        if cur_df is None:
            return None
        old_df = self.read(spark, table, as_of=since) if since else None
        if old_df is None:
            return cur_df
        key = [c for c in TRIPLE_KEY if c in cur_df.columns] or \
            [c for c in cur_df.columns if c != "part_bucket"]
        return cur_df.join(old_df.select(*key), key, "left_anti")

    def read_changelog(self, spark: SparkSession, table: str = "triples",
                       since: int = 0) -> DataFrame | None:
        """CDC scan (Iceberg changelog): every row INSERTED or DELETED
        in `table` after manifest seq `since`, with a `_change_type`
        column ('insert' | 'delete').  O(changes): reads only the new
        data segments and the new equality-delete files — never the
        table.  Unlike read_changes, merge-on-read deletes do NOT
        break lineage (the delete files ARE the changelog); a snapshot
        REWRITE still raises, because a rewritten table has no
        row-level changelog to read."""
        cur = self.manifest()
        old = self._manifest_at(since) if since else {
            "tables": {}, "segments": {}}
        cur_primary = cur["tables"].get(table)
        old_primary = old["tables"].get(table)
        old_segs = list(old.get("segments", {}).get(table, []))
        cur_segs = list(cur.get("segments", {}).get(table, []))
        old_dels = [d["path"] for d in old.get("deletes", {})
                    .get(table, [])]
        cur_dels = [d["path"] for d in cur.get("deletes", {})
                    .get(table, [])]
        if old_primary is None and not old_segs:
            df = self.read(spark, table)
            return None if df is None else df.withColumn(
                "_change_type", F.lit("insert"))
        if (cur_primary != old_primary
                or cur_segs[:len(old_segs)] != old_segs
                or cur_dels[:len(old_dels)] != old_dels):
            raise ValueError(
                f"table {table!r} was rewritten since seq {since} "
                "(compact/overwrite) — no row-level changelog exists")
        frames = []
        for p in cur_segs[len(old_segs):]:
            if os.path.exists(p):
                frames.append(spark.read.parquet(p).withColumn(
                    "_change_type", F.lit("insert")))
        for p in cur_dels[len(old_dels):]:
            if os.path.exists(p):
                frames.append(spark.read.parquet(p).withColumn(
                    "_change_type", F.lit("delete")))
        if not frames:
            return None
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Expire all but the newest `keep_last` manifest versions and
        delete data dirs no retained version references (Iceberg's
        expire_snapshots maintenance).  Returns the expired seqs.
        Time travel / read_changes to an expired seq then raises."""
        meta_dir = os.path.join(self.root, "metadata")
        if not os.path.isdir(meta_dir):
            return []
        versions = sorted(
            n for n in os.listdir(meta_dir)
            if n.startswith("v") and n.endswith(".json"))
        expired = versions[:-keep_last] if keep_last > 0 else versions
        out = []
        for name in expired:
            os.remove(os.path.join(meta_dir, name))
            out.append(int(name[1:-5]))
        self.vacuum()
        return out

    def _live_paths(self) -> set:
        """Every data path referenced by the CURRENT manifest or any
        retained metadata version (they back time travel)."""
        live = set()
        manifests = [self.manifest()]
        meta_dir = os.path.join(self.root, "metadata")
        if os.path.isdir(meta_dir):
            for name in os.listdir(meta_dir):
                if name.startswith("v") and name.endswith(".json"):
                    with open(os.path.join(meta_dir, name)) as f:
                        manifests.append(json.load(f))
        for m in manifests:
            live.update(m.get("tables", {}).values())
            for segs in m.get("segments", {}).values():
                live.update(segs)
            for dels in m.get("deletes", {}).values():
                live.update(d["path"] for d in dels)
        return live

    def vacuum(self) -> None:
        """Remove snapshot dirs not referenced by the current manifest
        or any retained metadata version (primary snapshots AND
        appended merge segments are live; retained versions keep their
        dirs alive for time travel until expire_snapshots)."""
        live = self._live_paths()
        data = os.path.join(self.root, "data")
        if not os.path.isdir(data):
            return
        for table in os.listdir(data):
            tdir = os.path.join(data, table)
            for snap in os.listdir(tdir):
                p = os.path.join(tdir, snap)
                if p not in live:
                    shutil.rmtree(p, ignore_errors=True)
