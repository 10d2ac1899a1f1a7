"""Enrichment rounds: classify -> constellations -> subtypes over a
built store (the reference pull-DAG steps 4-5, ui.py:209-290)."""

import pytest
from pyspark.sql import functions as F

from octofludb_spark.build import build_graph
from octofludb_spark.functions.uri import NT
from octofludb_spark.plans.enrich import (
    enrich_classifications,
    enrich_constellations,
    enrich_subtypes,
)
from octofludb_spark.sources.store import TripleStore
from octofludb_spark.sources.synth import source_table

pytestmark = pytest.mark.spark


def test_enrichment_rounds(spark, tmp_path):
    root = str(tmp_path / "s")
    store = build_graph(spark, source_table(spark, 120, partitions=4),
                        root, run_ts="t")

    def count_pred(name):
        return store.read(spark, "triples").where(
            F.col("predicate") == NT + name).count()

    before_clades = count_pred("clade")
    n_classified = enrich_classifications(spark, store)
    assert n_classified > 0
    assert count_pred("clade") > before_clades
    # classification rows attach to the seqid entity (forced segment)
    assert count_pred("segment_subtype") > 0

    n_const = enrich_constellations(spark, store)  # total triples merged
    assert n_const > 0
    assert count_pred("constellation") > 0

    before_subtypes = count_pred("subtype")
    n_sub = enrich_subtypes(spark, store)
    assert n_sub > 0
    assert count_pred("subtype") > before_subtypes

    # enrichment is idempotent: re-running adds nothing new
    total = store.read(spark, "triples").count()
    enrich_constellations(spark, store)
    assert store.read(spark, "triples").count() == total


def test_df_table_triples_partition_invariant(spark):
    """Column inference must see the WHOLE derived table (reference
    prep_table reads the full file): the emitted triple set may not
    depend on how the table is partitioned."""
    from octofludb_spark.plans.enrich import df_table_triples

    # 70% strain-like + 30% junk: per-batch inference could type the
    # column differently batch-to-batch if junk concentrates
    rows = [(f"A/swine/Iowa/A0{1000000 + i:07d}/2020", "H1N1")
            for i in range(90)] + [(f"not a strain {i}", "H3N2")
                                   for i in range(10)]
    for nparts in (1, 7):
        df = spark.createDataFrame(rows, ["strain_name", "subtype"]) \
            .repartition(nparts)
        got = {(r.subject, r.predicate, r.object_lex)
               for r in df_table_triples(df).collect()}
        if nparts == 1:
            base = got
    assert got == base and len(base) > 0


def test_enrich_constellation_table_is_irregular(spark):
    """prep_table with NO segment_key selects IrregularSegmentTable
    (ui.py:251,856-868): the first column is a match-anything forced
    identifier, so a constellation attaches even to a strain name
    p_strain cannot parse."""
    from octofludb_spark.functions.uri import make_uri
    from octofludb_spark.plans.enrich import df_table_triples

    df = spark.createDataFrame(
        [("weird-unparseable-name", "TTTTTT")],
        ["strain_name", "constellation"])
    got = {(r.subject, r.predicate, r.object_lex)
           for r in df_table_triples(df, segment_key=True).collect()}
    uri = make_uri("weird-unparseable-name")
    assert (uri, NT + "constellation", "TTTTTT") in got
