"""Structured Streaming surface.

The reference is a batch CLI whose only streaming-like notion is the
incremental month-by-month pull with skip-if-exists resume
(reference: octofludb/entrez.py:78-122, ui.py:745-766).  Our engine
generalizes that in two ways:

1. streaming INGESTION: new source-record files land in a directory;
   readStream -> per-micro-batch extraction -> idempotent merge into
   the manifest-swap triple store (foreachBatch + dedup = the same
   "uploading twice adds nothing" semantics as the reference's
   GraphDB upserts, README.md:96).  Checkpointing makes the stream
   resume exactly where it stopped — the streaming analog of the
   reference's .gb_YYYY-MM.ttl skip logic.

2. streaming ANALYTICS over an event stream: watermarked tumbling
   windows, and a custom stateful sessionization operator via
   applyInPandasWithState.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SOURCE_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("content_sha256", T.StringType()),
])


def stream_source(spark: SparkSession, directory: str,
                  max_files: int = 16) -> DataFrame:
    """File-arrival stream of source records (parquet drops)."""
    return (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(directory)
    )


def stream_extract_to_store(stream: DataFrame, store_root: str,
                            checkpoint_dir: str,
                            run_ts: Optional[str] = None):
    """Streaming extraction: each micro-batch runs the batch extraction
    plan and merges idempotently into the triple store.  foreachBatch +
    dropDuplicates-on-merge gives effectively-once triple semantics
    even under micro-batch replay after failure."""
    from octofludb_spark.extract.pipeline import run_extraction
    from octofludb_spark.sources.store import TripleStore

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        triples, _ = run_extraction(batch_df, run_ts=run_ts)
        TripleStore(store_root).merge_triples(
            spark, triples, stage=f"stream-batch-{batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_ingest_with_report(stream: DataFrame, store_root: str,
                              checkpoint_dir: str,
                              run_ts: Optional[str] = None,
                              refresh_log: Optional[list] = None):
    """Streaming ingestion that keeps the materialized masterlist
    CURRENT: each micro-batch runs the full incremental KG update
    (extract + link + canonicalize at O(batch + affected),
    build.py incremental_update) and then folds the resulting triple
    changes into the materialized report via the store changelog
    (plans/incremental_reports.py) — O(changes + affected barcodes),
    never a per-batch report recompute.

    The first batch full-builds store + report; every later batch is
    incremental end-to-end.  Both halves are idempotent under
    micro-batch replay (batch-id stage markers; base-seq noop), so the
    stream keeps exactly-once REPORT semantics across failures too.

    foreachBatch runs on the driver, so `refresh_log` (if given) is
    appended one `masterlist_refresh` result dict per micro-batch —
    callers can assert the incremental path was really exercised."""
    from octofludb_spark.build import incremental_update
    from octofludb_spark.plans.incremental_reports import masterlist_refresh

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        store = incremental_update(
            spark, batch_df, store_root,
            run_ts=run_ts, batch_id=f"stream-{batch_id}")
        res = masterlist_refresh(spark, store, table="triples_canonical")
        if refresh_log is not None:
            refresh_log.append(res)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the
    watermark is dropped; state is bounded)."""
    # watermarks require TIMESTAMP (not NTZ)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "avg_value")
    )


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])

SESSION_GAP_S = 30 * 60


def _sessionize_fn(key, pdf_iter, state: GroupState):
    """Custom stateful operator: gap-based sessionization.  Emits a
    session row when the state times out (no events for the gap)."""
    import datetime as dt

    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id],
            "session_start": [dt.datetime.utcfromtimestamp(start_us / 1e6)],
            "session_end": [dt.datetime.utcfromtimestamp(last_us / 1e6)],
            "n_events": [n],
        })
        return
    start_us = last_us = None
    n = 0
    if state.exists:
        start_us, last_us, n = state.get
    for pdf in pdf_iter:
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        for v in ts_us:
            if start_us is None:
                start_us = v
            last_us = v if last_us is None else max(last_us, v)
            n += 1
    if start_us is not None:
        state.update((start_us, last_us, n))
        state.setTimeoutDuration(SESSION_GAP_S * 1000)
    yield pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"),
         "session_start": pd.Series(dtype="datetime64[us]"),
         "session_end": pd.Series(dtype="datetime64[us]"),
         "n_events": pd.Series(dtype="int64")}
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based user sessions via applyInPandasWithState (streaming
    input required)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame,
                     gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Event-time gap sessionization over a BATCH events table — the
    exact-semantics twin of the streaming applyInPandasWithState
    operator above, expressed as gaps-and-islands window functions:
    lag -> gap flag -> running sum = session index -> hash agg.

    Scale shape: ONE shuffle total.  The window and the aggregation
    both cluster on user_id, and HashPartitioning(user_id) satisfies
    the agg's ClusteredDistribution(user_id, sess_idx), so Catalyst
    reuses the window's exchange for the groupBy — all JVM window
    evaluation, no Python.  Session boundaries at tied timestamps are
    order-independent (a tied row's gap is 0)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # interval arithmetic: works for TIMESTAMP and TIMESTAMP_NTZ alike
    # and is timezone-independent (no epoch conversion)
    gap = F.col("ts") - F.lag("ts").over(w)
    flag = F.when(
        gap.isNull() | (gap > F.expr(f"INTERVAL {int(gap_s)} SECOND")), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        events.withColumn("new_sess", flag)
        .withColumn("sess_idx", F.sum("new_sess").over(run))
        .drop("new_sess")
    )
    return (
        sess.groupBy("user_id", "sess_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def stream_dedup_documents(spark: SparkSession, directory: str,
                           out_dir: str, checkpoint_dir: str,
                           max_files: int = 16):
    """Streaming EXACT deduplication for a training-data ingest: as
    document files arrive, keep only the first document per content
    digest — across micro-batches and across restarts.

    Scale shape: ``dropDuplicates`` on the digest uses Spark's
    streaming state store (one entry per distinct digest, partitioned
    by digest hash) — the same single-shuffle key layout as the batch
    ``exact_dedup``, with the state checkpointed so a killed stream
    resumes without re-admitting duplicates.  Output is append-only
    parquet of the surviving documents."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(directory)
    )
    deduped = (
        stream.withColumn("digest", F.md5("text"))
        .dropDuplicates(["digest"])
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


# --------------------------------------------------------------------------
# streaming NEAR-duplicate candidates: MinHash LSH buckets as state
# --------------------------------------------------------------------------

_BAND_SCHEMA = "doc_id long, band int, key string"
_NEARDUP_STATE = T.StructType([
    T.StructField("doc_ids", T.ArrayType(T.LongType())),
])
_PAIR_SCHEMA = T.StructType([
    T.StructField("doc_x", T.LongType()),
    T.StructField("doc_y", T.LongType()),
])


def _band_rows_fn(n_perm: int, band_size: int, n: int):
    """mapInPandas closure emitting per-doc LSH band keys,
    bit-identical to the batch path (scale/dedup.py): shingle = n
    consecutive words joined by single spaces (distinct per doc),
    permutation i's value = min md5(f"{i}|{shingle}") as lowercase
    hex, band key = md5 of the band's values joined by '|'."""
    import hashlib

    def fn(pdf_iter):
        for pdf in pdf_iter:
            out = {"doc_id": [], "band": [], "key": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.split(" ")
                sh = {" ".join(words[i:i + n])
                      for i in range(len(words) - n + 1)} \
                    if len(words) >= n else set()
                if not sh:
                    continue
                sig = [
                    min(hashlib.md5(f"{i}|{s}".encode()).hexdigest()
                        for s in sh)
                    for i in range(n_perm)
                ]
                for b in range(n_perm // band_size):
                    key = hashlib.md5(
                        "|".join(sig[b * band_size:(b + 1) * band_size])
                        .encode()).hexdigest()
                    out["doc_id"].append(int(doc_id))
                    out["band"].append(b)
                    out["key"].append(key)
            yield pd.DataFrame(out)

    return fn


def _neardup_fn_factory(ttl_ms: int | None):
    """Build the stateful bucket operator, optionally with a
    processing-time TTL: at production scale an append-only bucket
    membership grows without bound, so state expires ttl_ms after a
    bucket's last arrival (the dedup horizon) and the bucket restarts
    cold — exactly FAISS/stream-dedup practice."""

    def fn(key, pdf_iter, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"doc_x": pd.Series([], dtype="int64"),
                                "doc_y": pd.Series([], dtype="int64")})
            return
        seen: list[int] = list(state.get[0]) if state.exists else []
        member = set(seen)
        out_x: list[int] = []
        out_y: list[int] = []
        arrived: list[int] = []
        for pdf in pdf_iter:
            arrived.extend(int(d) for d in pdf["doc_id"].tolist())
        for d in sorted(set(arrived)):
            if d in member:
                continue  # re-delivery of a known doc pairs with nothing
            for s in seen:
                lo, hi = (s, d) if s < d else (d, s)
                out_x.append(lo)
                out_y.append(hi)
            seen.append(d)
            member.add(d)
        state.update((seen,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"doc_x": pd.Series(out_x, dtype="int64"),
                            "doc_y": pd.Series(out_y, dtype="int64")})

    return fn


# default (no TTL) variant — the stream==batch parity tests use this
_neardup_fn = _neardup_fn_factory(None)


def stream_neardup_documents(spark: SparkSession, directory: str,
                             out_dir: str, checkpoint_dir: str,
                             n_perm: int = 8, band_size: int = 2,
                             n: int = 3, max_files: int = 16,
                             state_ttl_minutes: int | None = None):
    """Streaming NEAR-duplicate candidate detection for a training-data
    ingest: as document files arrive, any pair agreeing on a MinHash
    LSH band surfaces as a candidate pair — across micro-batches and
    across restarts (the bucket membership lives in the streaming
    state store, checkpointed).

    Scale shape: state is one entry per occupied (band, bucket) with
    that bucket's member ids — the same key layout as the batch bucket
    self-join (scale/dedup.py minhash_lsh_pairs), partitioned by
    bucket hash; per-doc work is bounded by bucket occupancy.  A pair
    may surface once per agreeing band; a downstream distinct (or the
    idempotent store merge) collapses repeats.  ``state_ttl_minutes``
    bounds state growth at production scale: a bucket's membership
    expires that long after its last arrival (the dedup horizon) via
    GroupStateTimeout.ProcessingTimeTimeout.  Signatures are
    bit-identical to the batch path, so the stream's distinct pairs
    equal the batch candidate pairs (tests/test_streaming.py)."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(directory)
    )
    bands = stream.mapInPandas(
        _band_rows_fn(n_perm, band_size, n), _BAND_SCHEMA)
    ttl_ms = state_ttl_minutes * 60_000 if state_ttl_minutes else None
    pairs = (
        bands.groupBy("band", "key")
        .applyInPandasWithState(
            _neardup_fn_factory(ttl_ms),
            outputStructType=_PAIR_SCHEMA,
            stateStructType=_NEARDUP_STATE,
            outputMode="append",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                         if ttl_ms else GroupStateTimeout.NoTimeout),
        )
    )
    return (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def click_attribution(views: DataFrame, clicks: DataFrame,
                      horizon_min: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: every click within
    ``horizon_min`` minutes strictly after a view by the same user —
    the attribution primitive (and the one §2.7 shape the suite
    lacked: two watermarked streams joined on key + time range).

    In streaming mode BOTH sides carry watermarks and the range
    condition bounds the join state (a view's state expires once the
    click watermark passes view_ts + horizon); in batch mode the same
    plan is a plain user-keyed equi join with an interval filter —
    one function, both engines of execution, equivalence tested in
    tests/test_streaming.py.

    Output: (user_id, view_ts, click_ts, lag_s — integer seconds)."""
    v = (views.select(F.col("user_id"),
                      F.col("ts").cast("timestamp").alias("view_ts"))
         .withWatermark("view_ts", watermark))
    c = (clicks.select(F.col("user_id").alias("c_user"),
                       F.col("ts").cast("timestamp").alias("click_ts"))
         .withWatermark("click_ts", watermark))
    return (
        v.join(
            c,
            F.expr(f"""user_id = c_user
                AND click_ts > view_ts
                AND click_ts <= view_ts + interval {horizon_min} minutes"""),
        )
        .select(
            "user_id", "view_ts", "click_ts",
            (F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts"))
            .cast("long").alias("lag_s"),
        )
    )


def stream_ingest_with_sketches(stream: DataFrame, store_root: str,
                                checkpoint_dir: str,
                                run_ts: Optional[str] = None,
                                refresh_log: Optional[list] = None):
    """Streaming ingestion that keeps the store's SKETCH tables
    current (plans/incremental_sketches.py) the same way
    stream_ingest_with_report keeps the masterlist current: each
    micro-batch runs the incremental KG update, then folds the triple
    changes into the HLL register / CMS counter tables at O(changes)
    — MAX-merge and counter-add for insert batches, the honest
    recompute downgrade when a batch deletes.

    Idempotent under micro-batch replay like the report path
    (batch-id stage markers on the KG side; the sketch base-seq noop
    on the sketch side)."""
    from octofludb_spark.build import incremental_update
    from octofludb_spark.plans.incremental_sketches import sketch_refresh

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        store = incremental_update(
            spark, batch_df, store_root,
            run_ts=run_ts, batch_id=f"stream-{batch_id}")
        res = sketch_refresh(spark, store, table="triples_canonical")
        if refresh_log is not None:
            refresh_log.append(res)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


# --------------------------------------------------------------------------
# streaming crawl ingestion: WARC archives -> clean text, as they land
# --------------------------------------------------------------------------

def stream_crawl_to_text(spark: SparkSession, directory: str,
                         out_dir: str, checkpoint_dir: str,
                         compressed: bool = False, max_files: int = 16):
    """Streaming face of the crawl-to-text pipeline: WARC archive
    files (media_id, payload) land in a directory; each micro-batch
    walks the containers, splits HTTP, extracts clean text, appends
    to parquet.  The whole chain is STATELESS (map-side record
    explode + JVM projections), so the streaming plan is the batch
    plan per micro-batch — equivalence is test-pinned, and the
    checkpoint makes a killed ingest resume at the last committed
    file without re-emitting pages (north_rule resumability on the
    crawl path).

    At 100 TB this is the continuous-ingest deployment: Common Crawl
    segment files arrive, text flows out, no state store grows."""
    import pyspark.sql.types as T

    from octofludb_spark.scale.web import warc_html_pipeline

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(directory)
    )
    pages = warc_html_pipeline(stream, compressed=compressed)
    return (
        pages.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_crawl_tolerant(spark: SparkSession, directory: str,
                          out_dir: str, checkpoint_dir: str,
                          max_files: int = 16):
    """Adversarial-tolerant streaming face of the crawl ingest: the
    strict stream_crawl_to_text dies on the first malformed archive a
    real crawl WILL eventually deliver; this one parses every
    micro-batch with the skip-and-count walkers (scale/web.py
    walk_warc_tolerant family) and writes TWO outputs per batch via
    foreachBatch — clean pages to ``out_dir`` and the per-archive
    reject telemetry (warc_malformed_stats) to ``out_dir``+"_rejects"
    — so a poisoned record costs its record AND leaves an audit row,
    never an exception and never silent loss.  The batch is persisted
    across the two writes; gzip membership is auto-sniffed per
    payload.  foreachBatch keeps the checkpoint exactly-once at the
    batch level (both writes re-run together on recovery)."""
    import pyspark.sql.types as T

    from octofludb_spark.scale.web import (warc_html_pipeline,
                                           warc_malformed_stats)

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(directory)
    )

    def sink(batch, _bid):
        batch = batch.persist()
        try:
            (warc_html_pipeline(batch, tolerant=True)
             .write.mode("append").parquet(out_dir))
            (warc_malformed_stats(batch)
             .write.mode("append").parquet(out_dir + "_rejects"))
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_validation(spark: SparkSession, directory: str,
                      out_dir: str, checkpoint_dir: str,
                      max_files: int = 16):
    """Streaming KG quality monitor: triple files land in a
    directory; each micro-batch runs the ROW-LOCAL SHACL shapes
    (datatype / pattern / nodeKind — plans/validation.py
    DEFAULT_SHAPES minus the graph-global ones) and appends the
    violation rows to parquet.  Row-local shapes are per-triple
    filters, so the chain is STATELESS and stream == batch exactly;
    the class/cardinality shapes need the whole graph and stay in the
    batch `validate` path (honest split, mirroring the HLL-delete
    stance: what cannot be maintained per-batch is not pretended).

    This is the continuous-ingest deployment's early-warning face: a
    malformed date or out-of-range segment number is flagged within
    one micro-batch of landing, long before the nightly full
    validation."""
    import pyspark.sql.types as T

    from octofludb_spark.plans.validation import (DEFAULT_SHAPES,
                                                  shacl_validate)

    schema = T.StructType([
        T.StructField("subject", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("object_lex", T.StringType()),
        T.StructField("object_dtype", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(directory)
    )
    local = [s for s in DEFAULT_SHAPES
             if s["kind"] in ("datatype", "pattern", "nodeKind")]
    # entailed=stream: row-local shapes only filter on predicate /
    # object columns, so entailment is the identity for them — passing
    # the stream itself keeps the plan stateless (no schema collect)
    report = shacl_validate(stream, shapes=local, entailed=stream)
    return (
        report.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stream_code_kg(spark: SparkSession, directory: str,
                   out_dir: str, checkpoint_dir: str,
                   max_files: int = 16):
    """Streaming face of code-KG construction: source-repo parquet
    files (repo, path, lang, content) land in a directory; each
    micro-batch runs the full triple extraction (scale/code.py
    code_kg_triples — containment / module / lang / sha256 / defines
    / imports) and appends (subject, predicate, object_lex,
    object_dtype) to the landing triple store.  The extraction chain
    is STATELESS (regexp projections + explode + union), so the
    streaming plan is the batch plan per micro-batch — equivalence is
    test-pinned — and the checkpoint resumes a killed ingest at the
    last committed file without re-emitting triples (the north_rule's
    resumability criterion on its literal 10^12-file input: files
    arrive continuously, triples flow out, no state store grows).
    Alias canonicalization and graph analytics stay in the batch path
    (they are graph-global, the honest split stream_validation also
    makes)."""
    import pyspark.sql.types as T

    from octofludb_spark.scale.code import code_kg_triples

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(directory)
    )
    triples = code_kg_triples(stream)
    return (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
