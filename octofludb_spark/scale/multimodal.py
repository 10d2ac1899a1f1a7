"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas UDFs over mapInPandas.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container,
so the decode step is STUBBED: ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (md5-derived dimensions) exercises the real
Spark-side plumbing — schema, partitioning, UDF signature and batch
shape are production-real; only the pixel math is fake.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def to_media_table(docs: DataFrame) -> DataFrame:
    """Documents -> opaque binary payloads + typed metadata (the
    ingest shape for any multimodal corpus)."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Stub: real decode needs PIL (absent).  fake=True derives
    deterministic dimensions from the payload digest."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL, not available in this container"
        )
    h = hashlib.md5(payload).hexdigest()
    return 64 + int(h[:2], 16), 64 + int(h[2:4], 16)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas — the real scale path for decode/resize/frame-sample;
    batch shape: one pandas frame of payload bytes per Arrow batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, frames = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                w, h = decode_image(bytes(payload), fake=fake)
                widths.append(w)
                heights.append(h)
                frames.append(1 if mtype == "image" else 1 + (w % 16))
            out = pdf[["media_id", "media_type", "n_bytes", "sha256"]].copy()
            out["width"] = pd.array(widths, dtype="int32")
            out["height"] = pd.array(heights, dtype="int32")
            out["n_frames"] = pd.array(frames, dtype="int32")
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)
