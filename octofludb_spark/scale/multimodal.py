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

RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_sha256", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def _fake_resize(payload: bytes, width: int, height: int,
                 fake: bool) -> bytes:
    """Stub: real resize needs PIL (absent).  fake=True produces a
    deterministic digest-derived payload so downstream plumbing
    (binary column, recomputed metadata) is exercised for real."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL, not available in this container"
        )
    seed = hashlib.md5(payload + f"|{width}x{height}".encode()).digest()
    return seed * 4  # 64 deterministic bytes standing in for pixels


def resize_images(media: DataFrame, width: int = 224, height: int = 224,
                  fake: bool = True) -> DataFrame:
    """Resize every image payload (Arrow-batched mapInPandas).  Only
    image rows pass through — the filter is JVM-side so non-image
    payload bytes never cross into python.  Metadata (n_bytes, sha256)
    is recomputed from the new payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _fake_resize(bytes(p), width, height, fake)
                for p in pdf["payload"]
            ]
            out = pdf[["media_id"]].copy()
            out["payload"] = payloads
            out["width"] = pd.array([width] * len(pdf), dtype="int32")
            out["height"] = pd.array([height] * len(pdf), dtype="int32")
            out["n_bytes"] = pd.array([len(p) for p in payloads],
                                      dtype="int64")
            out["sha256"] = [hashlib.sha256(p).hexdigest() for p in payloads]
            yield out

    return media.where(F.col("media_type") == "image").mapInPandas(
        run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 4,
                  fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads: one OUTPUT row per sampled
    frame (the one-to-many explode shape that matters at scale —
    memory is bounded per Arrow batch, never per video).  The decode
    is the same stub as decode_image; frame identity is a
    deterministic digest of (payload, frame_idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sha256": [],
                   "n_bytes": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                w, _h = decode_image(payload, fake=fake)
                n_frames = 1 + (w % 16)  # same derivation as features
                for idx in range(0, n_frames, stride):
                    fp = hashlib.md5(
                        payload + idx.to_bytes(4, "big")).hexdigest()
                    out["media_id"].append(int(media_id))
                    out["frame_idx"].append(idx)
                    out["frame_sha256"].append(fp)
                    out["n_bytes"].append(len(payload))
            yield pd.DataFrame({
                "media_id": pd.array(out["media_id"], dtype="int64"),
                "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                "frame_sha256": out["frame_sha256"] or
                    pd.Series(dtype=object),
                "n_bytes": pd.array(out["n_bytes"], dtype="int64"),
            })

    return media.where(F.col("media_type") == "video").mapInPandas(
        run, FRAME_SCHEMA)
