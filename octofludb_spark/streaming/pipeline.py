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
