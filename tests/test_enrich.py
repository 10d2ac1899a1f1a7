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
