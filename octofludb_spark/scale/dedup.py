"""Deduplication operators for a large-scale training-data pipeline,
over a ``documents(doc_id, text, ...)`` table.

Every operator is expressed with built-in Spark SQL functions (JVM,
whole-stage codegen) — no Python in the hot path.  Hash functions are
md5-based so an external engine (the DuckDB oracle) reproduces results
bit-for-bit; at production scale xxhash64 is a drop-in swap.

Scale notes:
  * exact dedup — one hash-agg shuffle on the digest.
  * n-gram Jaccard — shingle explode (map-side), self-join on shingle
    (the classic candidate-pair generation); shingle frequency skew is
    bounded by a document-frequency cap.
  * MinHash+LSH — signatures via groupBy(doc) min-agg (one shuffle),
    banding turns the O(n²) pair space into per-bucket joins.
  * SimHash — 16-bit md5-parity fingerprint, pure projection + one agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PERM = 8          # minhash permutations
BAND_SIZE = 2       # rows per LSH band -> 4 bands
MAX_SHINGLE_DF = 200  # candidate-pair cap: drop shingles in more docs


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content digest: (digest, n_docs,
    canonical_doc_id = min)."""
    return (
        docs.select(F.md5(F.col("text")).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document (word = single-space
    token), via a JVM-side transform over the word array."""
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    idx = F.when(
        F.size("w") >= n, F.sequence(F.lit(0), F.size("w") - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = words.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at("w", (i + k + 1).cast("int"))
                           for k in range(n)]
                ),
            )
        ).alias("shingle"),
    )
    return sh.distinct()


def jaccard_pairs(docs: DataFrame, threshold: float = 0.2,
                  n: int = 3) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard >= threshold:
    (doc_x, doc_y, jaccard)."""
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_x"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_y"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_x") < F.col("doc_y"))
        .groupBy("doc_x", "doc_y")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_x")
                   .withColumnRenamed("n_sh", "n_x"), "doc_x")
        .join(sizes.withColumnRenamed("doc_id", "doc_y")
              .withColumnRenamed("n_sh", "n_y"), "doc_y")
        .withColumn(
            "jaccard",
            F.round(F.col("inter")
                    / (F.col("n_x") + F.col("n_y") - F.col("inter")), 5),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_x", "doc_y", "jaccard")
    )
    return out


def minhash_signatures(docs: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, sig: array<string>) — per-permutation minima of
    md5(perm || '|' || shingle).  Hex-string min == numeric min for
    equal-length lowercase hex."""
    sh = shingles(docs)
    perms = sh.select(
        "doc_id", "shingle",
        F.explode(F.array(*[F.lit(i) for i in range(n_perm)])).alias("perm"),
    ).withColumn(
        "h", F.md5(F.concat_ws("|", F.col("perm"), F.col("shingle")))
    )
    mins = perms.groupBy("doc_id", "perm").agg(F.min("h").alias("mh"))
    return (
        mins.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("perm", "mh")))
             .alias("m"))
        .select(
            "doc_id",
            F.array(*[F.element_at("m", i) for i in range(n_perm)]).alias("sig"),
        )
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.2) -> DataFrame:
    """MinHash banding -> candidate pairs -> exact-Jaccard verify.
    Identical output columns to jaccard_pairs but the pair space is
    pruned by LSH buckets instead of the full shingle join."""
    sig = minhash_signatures(docs)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(
                    "|", *[F.element_at("sig", b * BAND_SIZE + r + 1)
                           for r in range(BAND_SIZE)]
                )).alias("key"),
            )
            for b in range(N_PERM // BAND_SIZE)
        ])).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    cand = (
        bands.alias("x").join(bands.alias("y"), ["band", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_x"),
                F.col("y.doc_id").alias("doc_y"))
        .distinct()
    )
    exact = jaccard_pairs(docs, threshold=0.0)
    return (
        cand.join(exact, ["doc_x", "doc_y"])
        .where(F.col("jaccard") >= threshold)
        .select("doc_x", "doc_y", "jaccard")
    )


_HEX = "0123456789abcdef"


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """16-bit SimHash: bit j is the sign of sum over distinct words of
    (parity of md5 hex digit j) ? +1 : -1.  (doc_id, simhash)."""
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    ).withColumn("h", F.md5("w"))
    bit_cols = [
        F.sum(
            F.when(
                (F.instr(F.lit(_HEX), F.substring("h", j + 1, 1)) - 1) % 2 == 1,
                1,
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = words.groupBy("doc_id").agg(*bit_cols)
    fingerprint = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, 2 ** j).otherwise(0)
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select("doc_id", fingerprint.cast("long").alias("simhash"))


def simhash_dup_candidates(docs: DataFrame) -> DataFrame:
    """Documents sharing a SimHash fingerprint (Hamming-0 buckets)."""
    s = simhash(docs)
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
        .where(F.col("n_docs") > 1)
    )
