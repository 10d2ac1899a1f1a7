"""Similarity search over embeddings(vec_id, embedding: array<float>).

Baseline: brute-force cosine — JVM-side zip_with/aggregate dot
products over a self-join; O(n²) but shuffle-free on the score side
(the join is the cost).  Scale path: LSH bucketing by random
hyperplane signs (derived deterministically from md5 so an external
oracle can reproduce it), which cuts the pair space to per-bucket
joins — the IVF/LSH pattern for 10^9-vector corpora.

Float discipline: dot products are computed in DOUBLE in strict
index order (fold left), so any engine reproducing the same order gets
bit-identical sums; emitted scores are rounded to 5 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """All pairs with cosine >= threshold: (vec_x, vec_y, cos)."""
    a = emb.select(F.col("vec_id").alias("vec_x"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_y"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_x") < F.col("vec_y"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        pairs.select("vec_x", "vec_y", F.round(cos, 5).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def topk_brute(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force top-k neighbors for each query vector:
    (query_id, vec_id, cos, rank).  Deterministic tiebreak on vec_id."""
    from pyspark.sql import Window

    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("eq"))
    c = emb.select("vec_id", F.col("embedding").alias("ec"))
    scored = q.join(c, F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id",
        F.round(_dot(F.col("eq"), F.col("ec"))
                / (_norm(F.col("eq")) * _norm(F.col("ec"))), 5).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 — no
    RNG state, reproducible anywhere."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{plane}|{i}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_bucket(emb: DataFrame, n_planes: int = 6, dim: int = 64) -> DataFrame:
    """(vec_id, bucket): sign pattern across n random hyperplanes."""
    sig = None
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bit = (_dot(F.col("embedding"), plane) > 0).cast("int")
        sig = bit.cast("string") if sig is None else F.concat(sig, bit.cast("string"))
    return emb.select("vec_id", sig.alias("bucket"))


def topk_lsh(emb: DataFrame, k: int = 5, n_planes: int = 4,
             dim: int = 64) -> DataFrame:
    """Approximate top-k: candidates restricted to the same LSH bucket
    (plus score+rank as in brute force).  Recall < 1 by construction —
    this is the scale path for corpora where n² is impossible."""
    from pyspark.sql import Window

    b = lsh_bucket(emb, n_planes=n_planes, dim=dim)
    e = emb.join(b, "vec_id")
    a = e.select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("eq"), "bucket")
    c = e.select("vec_id", F.col("embedding").alias("ec"), "bucket")
    scored = a.join(c, "bucket").where(F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id",
        F.round(_dot(F.col("eq"), F.col("ec"))
                / (_norm(F.col("eq")) * _norm(F.col("ec"))), 5).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
