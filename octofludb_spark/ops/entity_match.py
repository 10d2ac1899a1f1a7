"""Blocked fuzzy entity matching — the generic entity-resolution
step behind the KG's sameAs linking: candidate pairs from a cheap
blocking key, exact edit-distance scoring on candidates only.

The reference resolves strain-name variants by recognizer munging
(classifiers tag 'A/Swine/...' and 'A/swine/...' into one token form,
reference octofludb/classifiers.py); this operator is the SCALABLE
generalization: any name table, any blocking expression, Levenshtein
(JVM built-in, identical integers in DuckDB) over pairs that share a
block — never the n^2 cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# skew guard: a degenerate blocking key (e.g. every name in one
# block) would regrow the n^2 join — blocks past the cap are dropped
# and counted, never silently exploded
MAX_BLOCK_SIZE = 1000


def fuzzy_match_pairs(names: DataFrame, block: Column,
                      name_col: str = "name",
                      max_dist: int = 8,
                      max_block: int = MAX_BLOCK_SIZE) -> DataFrame:
    """Candidate pairs of distinct ``name_col`` values sharing a
    blocking key, scored by case-folded Levenshtein and kept at
    ``dist <= max_dist``.  Output: (name_a, name_b, block, dist) with
    name_a < name_b.

    Scale shape: one distinct on (block, name), a block-sized
    self-join (the blocking key bounds the fan-out; oversized blocks
    are dropped via one counted anti-join — the same logged-cap
    discipline as the shingle DF cap), and a map-side Levenshtein on
    candidates only."""
    import logging

    log = logging.getLogger(__name__)
    base = (
        names.select(block.alias("block"), F.col(name_col).alias("name"))
        .where(F.col("block").isNotNull() & (F.col("block") != ""))
        .distinct()
    )
    big = (
        base.groupBy("block").agg(F.count("*").alias("bn"))
        .where(F.col("bn") > max_block)
        .select("block")
        .persist()
    )
    n_big = big.count()
    if n_big:
        log.warning("fuzzy_match_pairs: dropping %d blocks larger than %d",
                    n_big, max_block)
        base = base.join(big, "block", "left_anti")
    else:
        big.unpersist()
    a = base.select("block", F.col("name").alias("name_a"))
    b = base.select("block", F.col("name").alias("name_b"))
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist",
            F.levenshtein(F.lower("name_a"), F.lower("name_b"))
            .cast("long"),
        )
        .where(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "block", "dist")
    )


def fuzzy_entity_clusters(names: DataFrame, block: Column,
                          name_col: str = "name",
                          max_dist: int = 8,
                          max_block: int = MAX_BLOCK_SIZE) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy candidate pairs ->
    connected components -> one canonical representative per entity
    cluster (the lexicographic MIN name — deterministic at any
    partitioning), mirroring how the KG pipeline resolves sameAs
    aliases to canonical IRIs (ops/cc.py + canonicalize).

    Returns (name, canonical_name, n_names, is_canonical) for every
    name in a multi-name cluster; singletons are absent (they are
    already canonical).

    Scale shape: the pair graph is candidate-pair-sized (blocking
    bounds it), so the CC step (two-level: driver union-find under
    threshold, large/small-star above) never touches the full name
    table; the relabel + cluster sizes is one window over cluster
    members only."""
    from pyspark.sql import Window

    from octofludb_spark.ops.cc import connected_components

    pairs = fuzzy_match_pairs(names, block, name_col=name_col,
                              max_dist=max_dist, max_block=max_block)
    edges = pairs.select(F.col("name_a").alias("src"),
                         F.col("name_b").alias("dst"))
    comp = connected_components(edges)
    w = Window.partitionBy("canonical_name")
    return (
        comp.select(F.col("node").alias("name"),
                    F.col("component").alias("canonical_name"))
        .withColumn("n_names", F.count("*").over(w).cast("long"))
        .withColumn(
            "is_canonical",
            F.when(F.col("name") == F.col("canonical_name"), 1)
            .otherwise(0).cast("long"),
        )
    )
