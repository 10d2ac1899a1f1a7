#!/usr/bin/env python3
"""Extra benchmarks and plan capture for the optimization rounds.

NOT the frozen bench.py: this file exists so optimization work can be
measured per guide §1 (noop sink isolation, labeled jobs, formatted
plans) without touching the driver's frozen timing methodology.

Modes (positional arg):
  noop  [names...]  — time each query with the noop sink (computes
                      every column, no optimizer pruning as count()
                      would allow), best of N, one JSON line.
  plans [names...]  — write .explain("formatted") for each query to
                      plans/r06/<name>_<label>.txt (label via
                      PLAN_LABEL env, default 'after').
  count [names...]  — time with .count() (the frozen bench's action),
                      for apples-to-apples comparison with bench.py.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_OP_RUNS (default 2),
PLAN_LABEL.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from octofludb_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="octofludb-bench-extra", cores=cpus,
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "noop"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_OP_RUNS", "2"))

    from octofludb_spark.plans.driver_queries import QUERIES

    if names is None:
        import bench

        names = list(bench.BENCH_QUERIES)

    spark = _spark()
    sc = spark.sparkContext

    if mode == "plans":
        label = os.environ.get("PLAN_LABEL", "after")
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{label}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name}_{label}.txt "
                  f"(Exchange={txt.count('Exchange')})", flush=True)
        return

    act = _noop if mode == "noop" else (lambda df: df.count())
    out: dict[str, float] = {}
    for name in names:  # warm pass
        sc.setJobDescription(f"warm:{name}")
        act(QUERIES[name](spark, sf_dir))
    for _ in range(runs):
        for name in names:
            sc.setJobDescription(f"timed:{name}")
            t0 = time.time()
            act(QUERIES[name](spark, sf_dir))
            dt = time.time() - t0
            if name not in out or dt < out[name]:
                out[name] = dt
    sc.setJobDescription(None)
    print(json.dumps({"mode": mode, "sf_dir": sf_dir,
                      "queries": {k: round(v, 3) for k, v in out.items()},
                      "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
