"""End-to-end graph build: extract -> dedup -> link -> canonicalize ->
materialize, with each stage committed to the manifest-swap store so a
killed job resumes from the last committed snapshot (north_rule).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from octofludb_spark.extract.pipeline import (
    dedup_triples,
    extract_triples,
    lineage_metrics,
)
from octofludb_spark.ops.canonicalize import canonical_map, canonicalize
from octofludb_spark.ops.cc import connected_components, sameas_edges
from octofludb_spark.sources.store import TripleStore

STAGES = ("extract", "link", "canon")


def build_graph(
    spark: SparkSession,
    source: DataFrame,
    store_root: str,
    tag: Optional[str] = None,
    run_ts: Optional[str] = None,
    n_buckets: int = 32,
) -> TripleStore:
    store = TripleStore(store_root, n_buckets=n_buckets)

    if not store.stage_done("extract"):
        raw = extract_triples(source, tag=tag, run_ts=run_ts)
        # cache the raw extraction once; both dedup and metrics read it
        raw.persist()
        try:
            store.write(lineage_metrics(raw), "lineage_metrics")
            # static schema/geography triples incl. the locatedIn
            # transitive closure (ui.py:396-402 analog)
            from octofludb_spark.plans.static_graph import static_graph

            triples = dedup_triples(raw).unionByName(static_graph(spark))
            store.write(triples, "triples", stage="extract",
                        bucket_by_subject=True)
        finally:
            raw.unpersist()

    if not store.stage_done("link"):
        triples = store.read(spark, "triples")
        comps = connected_components(sameas_edges(triples))
        store.write(canonical_map(comps), "canonical_map", stage="link")

    if not store.stage_done("canon"):
        triples = store.read(spark, "triples")
        mapping = store.read(spark, "canonical_map")
        # parquet row count is metadata-only — one cheap read decides
        # broadcast vs salted-repartition dictionary joins
        from octofludb_spark.ops.canonicalize import BROADCAST_LIMIT

        canon = canonicalize(
            triples, mapping.select("node", "canonical"),
            use_broadcast=mapping.count() <= BROADCAST_LIMIT,
        )
        store.write(canon, "triples_canonical", stage="canon",
                    bucket_by_subject=True)

    return store
