"""masterlist_query_fast (one-shuffle entity-pivot plan) must be
row-identical to masterlist_query (the literal SPARQL translation)."""

import pytest

from octofludb_spark.build import build_graph
from octofludb_spark.plans.reports import masterlist_query, masterlist_query_fast
from octofludb_spark.plans.views import GraphViews
from octofludb_spark.sources.synth import source_table

pytestmark = [pytest.mark.spark, pytest.mark.core]


def test_masterlist_fast_equivalence(spark, tmp_path):
    store = build_graph(spark, source_table(spark, 150, partitions=4),
                        str(tmp_path / "s"), run_ts="t")
    v = GraphViews(store.read(spark, "triples"))
    slow = {tuple(r) for r in masterlist_query(v).collect()}
    cols = masterlist_query(v).columns
    fast_df = masterlist_query_fast(v).select(*cols)
    fast = {tuple(r) for r in fast_df.collect()}
    assert slow, "fixture produced no masterlist rows"
    assert fast == slow
