"""spark-submit entry point for the KG build (north_rule packaging).

The pipeline must be runnable as a packaged job, not only from a
checkout:

    python tools/make_pyfiles.py
    spark-submit --master local[8] \
        --py-files dist/octofludb_spark.zip \
        tools/submit_job.py --docs 2000 --store /tmp/kg_store

This file deliberately lives OUTSIDE the package directory, so every
`octofludb_spark.*` import below resolves from the --py-files zip on
both the driver and the executors — the same mechanism a real cluster
uses.  It prints one JSON summary line (triples, canonical triples,
sha invariant, stage commits) so CI can assert on the output.

Resumability: re-running with the same --store is a no-op for every
stage already committed (manifest-swap snapshots, sources/store.py) —
pass --reset to clear and rebuild.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--store", default="/tmp/kg_submit_store")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--reset", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName("octofludb-spark-kg-build")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    # All package imports AFTER getOrCreate, resolved from --py-files.
    from octofludb_spark.build import build_graph
    from octofludb_spark.sources.synth import source_table

    if args.reset:
        shutil.rmtree(args.store, ignore_errors=True)

    t0 = time.time()
    source = source_table(spark, args.docs, partitions=args.partitions)
    store = build_graph(spark, source, args.store, tag="submit-smoke")
    triples = store.read(spark, "triples").count()
    canon = store.read(spark, "triples_canonical").count()
    lineage = store.read(spark, "lineage_metrics")
    sha_bad = int(
        lineage.agg(F.sum("sha_violations").alias("v")).first()["v"] or 0
    )
    print(json.dumps({
        "job": "kg_build",
        "docs": args.docs,
        "triples": triples,
        "canonical_triples": canon,
        "sha_mismatch_rows": sha_bad,
        "stages_committed": [s for s in ("extract", "link", "canon")
                             if store.stage_done(s)],
        "sec": round(time.time() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
