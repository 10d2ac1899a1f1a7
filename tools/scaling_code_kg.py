"""Two-parallelism scaling measurement for the code-KG pipeline
(extract -> canonicalize -> import graph -> PageRank), the BENCH/
BASELINE.md protocol applied to the code-dependency family:

    python tools/scaling_code_kg.py [n_lo] [n_hi] [n_docs] [reps]

Runs the SAME deterministic corpus (spark.range -> synth_code_repo)
at local[n_lo] and local[n_hi], interleaved best-of-reps, and prints
triples/s at both plus efficiency = (t_lo / t_hi) / (n_hi / n_lo).
Triple counts are asserted identical across core counts and reps —
the determinism discipline every scaling row in BENCH/BASELINE.md
carries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_once(cores: int, n_docs: int):
    """Spawn a FRESH python+JVM per measurement: reusing one driver
    JVM across SparkContexts lets JIT warmth leak into later reps and
    fabricates efficiency numbers (measured: a warmed local[1] rep
    out-ran a cold local[4] one)."""
    import json
    import subprocess

    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--once",
         str(cores), str(n_docs)],
        capture_output=True, text=True, check=True)
    return tuple(json.loads(p.stdout.strip().splitlines()[-1]))


def _measure(cores: int, n_docs: int):
    """One full pipeline run, every stage MATERIALIZED to parquet —
    a bare count() lets Catalyst prune unprojected work (sha256 never
    evaluated), so only a write measures the real extraction cost,
    and writing is what the production pipeline does anyway
    (north_rule: materialize stage).  Stages timed separately:
    construction = extract + link/canonicalize; analytics (PageRank)
    reported on its own."""
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix=f"codekg_scale_{cores}_")
    parts = 32  # FIXED layout across core counts (scaling_pair protocol)
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(parts))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .appName(f"codekg-scale-{cores}")
             .getOrCreate())
    try:
        from octofludb_spark.ops.canonicalize import canonicalize
        from octofludb_spark.ops.graph_analytics import pagerank
        from octofludb_spark.scale import code as C

        # warm-up: the whole pipeline (incl. a parquet write) on a
        # tiny corpus, so JIT compilation is not billed to the timed
        # run — cold-JIT is a serial constant that poisons the ratio
        warm = (spark.range(0, 2000, 1, parts)
                .select(F.col("id").alias("doc_id")))
        wtr = C.code_kg_triples(C.synth_code_repo(warm))
        wtr.write.parquet(f"{work}/warm")
        wcan = canonicalize(wtr, C.module_alias_map(wtr))
        pagerank(C.import_module_edges(wcan), iters=3).count()

        docs = (spark.range(0, n_docs, 1, parts)
                .select(F.col("id").alias("doc_id")))
        t0 = time.time()
        C.code_kg_triples(C.synth_code_repo(docs)) \
            .write.parquet(f"{work}/triples")
        t1 = time.time()
        tr = spark.read.parquet(f"{work}/triples")
        n_triples = tr.count()
        t1b = time.time()
        canonicalize(tr, C.module_alias_map(tr)) \
            .write.parquet(f"{work}/canonical")
        t2 = time.time()
        can = spark.read.parquet(f"{work}/canonical")
        n_canon = can.count()
        t2b = time.time()
        n_rank = pagerank(C.import_module_edges(can), iters=3).count()
        t3 = time.time()
        return (n_triples, n_canon, n_rank,
                t1 - t0,                      # extract+materialize
                (t1 - t0) + (t2 - t1b),      # construction e2e
                t3 - t2b)                     # analytics (PageRank)
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--once":
        import json
        print(json.dumps(list(_measure(int(sys.argv[2]),
                                       int(sys.argv[3])))))
        return
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    best = {n_lo: None, n_hi: None}
    counts = set()
    for r in range(reps):
        for cores in (n_lo, n_hi):  # interleaved: same thermal regime
            nt, nc, nr, t_ex, t_con, t_rank = run_once(cores, n_docs)
            counts.add((nt, nc, nr))
            cur = best[cores]
            # per-stage independent bests: each stage's quiet repeat
            # (box noise hits stages independently across reps)
            best[cores] = ((t_ex, t_con, t_rank) if cur is None else
                           tuple(min(a, b) for a, b in
                                 zip(cur, (t_ex, t_con, t_rank))))
            print(f"rep {r} local[{cores}]: triples={nt} canon={nc} "
                  f"ranked={nr} extract={t_ex:.2f}s "
                  f"construct={t_con:.2f}s rank={t_rank:.2f}s",
                  flush=True)
    assert len(counts) == 1, f"nondeterministic counts: {counts}"
    (lo_ex, lo_con, lo_rk), (hi_ex, hi_con, hi_rk) = \
        best[n_lo], best[n_hi]
    ratio = n_hi / n_lo
    nt = next(iter(counts))[0]
    print(f"\nn_docs={n_docs} triples={nt} "
          f"(canonical={next(iter(counts))[1]})")
    print(f"local[{n_lo}]: extract {nt / lo_ex:,.0f} t/s, "
          f"construct {nt / lo_con:,.0f} t/s, rank {lo_rk:.2f}s")
    print(f"local[{n_hi}]: extract {nt / hi_ex:,.0f} t/s, "
          f"construct {nt / hi_con:,.0f} t/s, rank {hi_rk:.2f}s")
    print(f"eff_extract = {(lo_ex / hi_ex) / ratio:.3f}   "
          f"eff_construct = {(lo_con / hi_con) / ratio:.3f}   "
          f"eff_rank = {(lo_rk / hi_rk) / ratio:.3f}")


if __name__ == "__main__":
    main()
