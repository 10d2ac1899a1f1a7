"""Graph maintenance ops: the reference's DELETE .rq files and tag
management (SURVEY.md §2.9), as snapshot rewrites on the triple store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import NQUERY, NT, make_uri_series
from octofludb_spark.sources.store import TripleStore

_PRED = {
    # delete-subtypes.rq / delete-constellations.rq /
    # delete-us_clades.rq / delete-gl_clades.rq
    "subtypes": NT + "subtype",
    "constellations": NT + "constellation",
    "us_clades": NT + "clade",
    "gl_clades": NT + "gl_clade",
}


def delete_predicate(spark: SparkSession, store: TripleStore, kind: str,
                     table: str = "triples") -> None:
    """DELETE WHERE { ?s f:<pred> ?o } — partition-pruned snapshot
    rewrite (Iceberg DELETE WHERE analog)."""
    store.delete_where(spark, F.col("predicate") == _PRED[kind], table=table)


def delete_motifs(spark: SparkSession, store: TripleStore,
                  table: str = "triples") -> None:
    """delete-motifs.rq: remove every *_motif triple."""
    motifs = [NT + m for m in (
        "motif", "h3_motif", "sa_motif", "sb_motif", "ca1_motif",
        "ca2_motif", "cb_motif")]
    store.delete_where(spark, F.col("predicate").isin(motifs), table=table)


def clear_query_tags(spark: SparkSession, store: TripleStore,
                     table: str = "triples") -> None:
    """clear-query-tags.rq."""
    store.delete_where(spark, F.col("predicate") == NT + "query_tag",
                       table=table)


def query_tag_triples(spark: SparkSession, values: list[str],
                      tag: str = "default") -> DataFrame:
    """fetch_tag_cmd (ui.py:1099-1130): attach f:query_tag literals to
    a query-tag node so the get-tagged-*.rq UNION queries can match."""
    import pandas as pd

    taguri = NQUERY + tag
    pdf = pd.DataFrame({
        "subject": [taguri] * len(values),
        "predicate": [NT + "query_tag"] * len(values),
        "object_lex": values,
        "object_dtype": [""] * len(values),
    })
    return spark.createDataFrame(pdf)
