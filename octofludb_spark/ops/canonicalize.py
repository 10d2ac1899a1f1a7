"""Canonical-IRI rewriting: map every subject / URI-object through the
connected-component dictionary (SURVEY.md §1.5), replacing GraphDB's
sameAs expansion with an explicit, broadcastable join.

The dictionary is tiny relative to the triple store (only aliased ids
appear), so the join is a broadcast hash join — no shuffle of the big
side and hub-entity skew cannot bite.  If the dictionary outgrows the
broadcast threshold the helper falls back to a salted repartition
join: the BIG side keeps its natural partitioning, the dictionary is
exploded SALT ways so no single reducer owns a hub key (north_rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import DT_URI

BROADCAST_LIMIT = 5_000_000  # dictionary rows safely broadcastable


def canonical_map(components: DataFrame) -> DataFrame:
    """(node, canonical) — identity rows omitted."""
    return (
        components.where(F.col("node") != F.col("component"))
        .select(F.col("node"), F.col("component").alias("canonical"))
    )


def canonicalize(triples: DataFrame, mapping: DataFrame,
                 use_broadcast: bool = True,
                 scalable_collide: bool = False,
                 auto_salt: bool = False) -> DataFrame:
    """Rewrite subject and URI-typed objects to canonical IRIs.

    Scale design: only TOUCHED triples (those whose subject or URI
    object appears in the alias dictionary) are rewritten and
    deduplicated — the untouched majority of the store is passed
    through with NO shuffle at all.  A rewritten triple may collide
    with an untouched one, so the touched set (small) is also
    anti-joined against the untouched side on the triple key; with the
    dictionary broadcast both joins keep the big side map-side.

    With ``use_broadcast=False`` (the dictionary outgrew
    BROADCAST_LIMIT) the two dictionary joins run as SALTED
    repartition joins: canonical IRIs are hub keys by construction —
    every alias of H1N1 maps to the same canonical node — so a plain
    shuffled join would send one reducer the whole hub.  salted_join
    spreads each key over nsalt reducers (output equality with the
    broadcast path is property-tested).

    ``auto_salt=True`` (only meaningful with ``use_broadcast=False``)
    sizes each salted join from a skew probe of the actual data
    instead of the fixed default: ops/skew.salt_decision measures the
    subject / uri-object key concentration and its nsalt hint drives
    the join — the measurement half of the north_rule's skew handling
    wired into the treatment half.  A non-hub profile degrades to the
    plain repartition join (nsalt=1 would only add a constant salt
    column)."""
    cols = ["subject", "predicate", "object_lex", "object_dtype"]
    s_map = (mapping.withColumnRenamed("node", "subject")
             .withColumnRenamed("canonical", "_s_canon"))
    o_map = (mapping.withColumnRenamed("node", "object_lex")
             .withColumnRenamed("canonical", "_o_canon"))
    if use_broadcast:
        joined = (
            triples.join(F.broadcast(s_map), on="subject", how="left")
            .join(F.broadcast(o_map), on="object_lex", how="left")
        )
    else:
        if auto_salt:
            from octofludb_spark.ops.skew import salt_decision
            ns_s = salt_decision(triples, "subject")["nsalt"]
            ns_o = salt_decision(triples, "object_lex")["nsalt"]
            joined = triples.join(s_map, on="subject", how="left") \
                if ns_s <= 1 else salted_join(triples, s_map, "subject",
                                              nsalt=ns_s, how="left")
            joined = joined.join(o_map, on="object_lex", how="left") \
                if ns_o <= 1 else salted_join(joined, o_map, "object_lex",
                                              nsalt=ns_o, how="left")
        else:
            joined = salted_join(
                salted_join(triples, s_map, "subject", how="left"),
                o_map, "object_lex", how="left",
            )
    joined = joined.withColumn(
        "_o_canon",
        F.when(F.col("object_dtype") == DT_URI, F.col("_o_canon")),
    )
    if scalable_collide and use_broadcast:
        # when the TOUCHED subset is known-small (sparse aliasing):
        # find collisions with a broadcast SEMI join (untouched never
        # shuffles), then subtract them from the touched side.  With
        # dense aliasing the broadcast outgrows its win — hence opt-in.
        untouched = joined.where(
            F.col("_s_canon").isNull() & F.col("_o_canon").isNull()
        ).select(*cols)
        touched = (
            joined.where(F.col("_s_canon").isNotNull()
                         | F.col("_o_canon").isNotNull())
            .select(
                F.coalesce("_s_canon", "subject").alias("subject"),
                "predicate",
                F.coalesce("_o_canon", "object_lex").alias("object_lex"),
                "object_dtype",
            )
            .dropDuplicates(cols)
        )
        collide = untouched.join(F.broadcast(touched), on=cols, how="left_semi")
        touched = touched.join(F.broadcast(collide), on=cols, how="left_anti")
        return untouched.unionByName(touched)
    # exact set semantics at any alias density: rewrite in ONE pass
    # (coalesce leaves unmapped ids as-is) and dedup once — the single
    # wide shuffle doubles as the store's bucket-partitioning pass.
    # (A two-branch untouched/touched union would scan and join the
    # store twice for the same result.)
    return joined.select(
        F.coalesce("_s_canon", "subject").alias("subject"),
        "predicate",
        F.coalesce("_o_canon", "object_lex").alias("object_lex"),
        "object_dtype",
    ).dropDuplicates(cols)


def salted_join(big: DataFrame, dim: DataFrame, key: str, nsalt: int = 16,
                how: str = "inner") -> DataFrame:
    """Skew-proof equi-join helper for hub keys (e.g. subtype nodes):
    salt the big side, explode-replicate the dim side (north_rule).
    Every big row carries exactly one salt and the dim side is
    replicated to all salts, so the result equals the plain join for
    ``inner`` and ``left`` alike — but one hub key's rows now land on
    nsalt reducers instead of one."""
    # per-row salt: hash of the whole row spreads one hub key over
    # nsalt reducers deterministically
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(nsalt))
    )
    dim_s = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(nsalt)])))
    return big_s.join(dim_s, on=[key, "_salt"], how=how).drop("_salt")
