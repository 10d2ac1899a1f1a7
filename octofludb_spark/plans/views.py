"""Predicate views over the triple store: the SPARQL basic-graph-
pattern layer (SURVEY.md §2.3 J9-J12) as DataFrame building blocks.

A SPARQL pattern ``?s f:p ?o`` is a filter+project on the triple
relation — Catalyst pushes the predicate filter into the parquet scan
(PushedFilters) and prunes to two columns.  Multi-pattern WHERE blocks
become self-equi-joins on subject; OPTIONAL is a left join; UNION is
unionByName; FILTER NOT EXISTS / MINUS are left_anti joins.

The subPropertyOf lattice (reference: octofludb/data/schema.ttl:18-62,
111-112, executed by GraphDB's owl-horst ruleset) is materialized as a
static closure: querying a super-property expands to a predicate IN
filter — still one scan, still pushed down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import NT

# static subproperty closure (super -> all subs, reflexive)
SUBPROP: dict[str, list[str]] = {
    "date": ["date", "collection_date"],
    "motif": ["motif", "h3_motif", "cb_motif", "sa_motif", "sb_motif",
              "ca1_motif", "ca2_motif"],
    "name": ["name", "label"],
    "ha": ["ha"] + [f"h{i}" for i in range(1, 19)],
    "na": ["na"] + [f"n{i}" for i in range(1, 12)],
    "internalGene": ["internalGene", "pb2", "pb1", "pa", "np", "m", "ns1"],
    "seqid": ["seqid", "genbank_id", "epi_id"],
    "has_part": ["has_part", "has_segment"],
}


class GraphViews:
    """Thin query surface over a triple DataFrame."""

    def __init__(self, triples: DataFrame):
        self.triples = triples

    def pred(self, name: str, s: str = "s", o: str = "o",
             expand: bool = True) -> DataFrame:
        """View of one predicate (or its subproperty closure):
        (s, o) pairs."""
        names = SUBPROP.get(name, [name]) if expand else [name]
        iris = [NT + n for n in names]
        cond = (
            F.col("predicate").isin(iris)
            if len(iris) > 1
            else (F.col("predicate") == iris[0])
        )
        return self.triples.where(cond).select(
            F.col("subject").alias(s), F.col("object_lex").alias(o)
        )

    def pred_typed(self, name: str, s: str = "s", o: str = "o",
                   dt: str = "dt") -> DataFrame:
        names = SUBPROP.get(name, [name])
        iris = [NT + n for n in names]
        return self.triples.where(F.col("predicate").isin(iris)).select(
            F.col("subject").alias(s),
            F.col("object_lex").alias(o),
            F.col("object_dtype").alias(dt),
        )

    def value(self, name: str, value: str, s: str = "s") -> DataFrame:
        """Pattern ``?s f:name "value"`` -> subjects."""
        return (
            self.triples.where(
                (F.col("predicate") == NT + name)
                & (F.col("object_lex") == value)
            ).select(F.col("subject").alias(s))
        ).distinct()

    def path2(self, p1: str, p2: str, s: str = "s", o: str = "o") -> DataFrame:
        """Property path ``f:p1/f:p2`` (e.g. country/code,
        masterlist.rq:29): a 2-hop join through the intermediate node."""
        a = self.pred(p1, s=s, o="_mid")
        b = self.pred(p2, s="_mid", o=o)
        return a.join(b, on="_mid").drop("_mid")


    def entity_attrs(self, preds: list[str], s: str = "s",
                     expand: bool = True) -> DataFrame:
        """One-shuffle wide entity view: all requested predicates of
        each subject as array columns (groupBy + pivot).  Replaces a
        chain of per-predicate self-joins — the workhorse for
        report-shaped queries at scale."""
        iri_to_name: dict[str, str] = {}
        for p in preds:
            names = SUBPROP.get(p, [p]) if expand else [p]
            for n in names:
                iri_to_name[NT + n] = p
        base = self.triples.where(
            F.col("predicate").isin(list(iri_to_name))
        ).select(
            F.col("subject").alias(s),
            F.col("predicate").alias("_p"),
            F.col("object_lex").alias("_o"),
        )
        pivoted = (
            base.groupBy(s)
            .pivot("_p", values=list(iri_to_name))
            .agg(F.collect_set("_o"))
        )
        out = pivoted
        # merge subproperty columns into their super-property array
        for p in preds:
            iris = [i for i, name in iri_to_name.items() if name == p]
            cols = [F.coalesce(F.col(f"`{i}`"), F.array()) for i in iris]
            merged = cols[0] if len(cols) == 1 else F.array_distinct(
                F.concat(*cols))
            out = out.withColumn(p, F.coalesce(merged, F.array()))
        return out.select(s, *preds)


def group_concat(col: str, alias: str, sep: str = "+"):
    """GROUP_CONCAT(DISTINCT x; separator=sep) with deterministic
    ordering (A1): sort_array before join."""
    return F.concat_ws(sep, F.sort_array(F.collect_set(col))).alias(alias)
