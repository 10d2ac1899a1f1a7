"""Two-cluster-size scaling evidence (sandbox protocol, BASELINE.md):
run the identical KG-build job at local[8] and local[32] on the same
input via bench.py subprocesses; report both throughputs and the
scaling efficiency (T_8/T_32)/4 into BENCH/BASELINE.md."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_bench(cpus, sf_dir)
        print(f"local[{cpus}] done in {time.time()-t0:.0f}s", file=sys.stderr)
    tps8 = results[8]["kg_triples_per_sec_e2e"]
    tps32 = results[32]["kg_triples_per_sec_e2e"]
    eff = (tps32 / tps8) / 4
    ex8 = results[8]["kg_triples_per_sec_extract"]
    ex32 = results[32]["kg_triples_per_sec_extract"]
    eff_ex = (ex32 / ex8) / 4

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (N vs 4N parallelism)

Protocol (BASELINE.md): the identical KG-build job (deterministic
synthetic corpus, {results[8]['kg_docs']} docs -> extract -> dedup ->
sameAs CC -> canonicalize) at local[8] and local[32] on the same
machine; efficiency = (throughput_32 / throughput_8) / 4.

| parallelism | extract+dedup triples/s | e2e triples/s | extract s | link+canon s |
|---|---|---|---|---|
| local[8]  (N)  | {ex8:,.0f} | {tps8:,.0f} | {results[8]['queries']['kg_extract_dedup']} | {results[8]['queries']['kg_link_canonicalize']} |
| local[32] (4N) | {ex32:,.0f} | {tps32:,.0f} | {results[32]['queries']['kg_extract_dedup']} | {results[32]['queries']['kg_link_canonicalize']} |

**Scaling efficiency (e2e): {eff:.2f}**  (extract-only: {eff_ex:.2f}; target >= 0.8)

Caveats: local-mode fixed overheads (JVM startup amortized out, but
per-job scheduling, the CC driver loop's fixed ~6 collect barriers,
and the final single-threaded manifest write) depress small-N vs 4N
comparability relative to a real 4x-executor scale-out, where input
partitions (cpus*4) scale with the cluster.

## Operator suite (local[32], sf={results[32]['sf']})

| query | sec |
|---|---|
""")
        for k, v in results[32]["queries"].items():
            f.write(f"| {k} | {v} |\n")
        f.write("\nRaw JSON:\n\n```json\n")
        f.write(json.dumps(results[8]) + "\n")
        f.write(json.dumps(results[32]) + "\n```\n")
    print(f"wrote {path}; efficiency={eff:.2f}")


if __name__ == "__main__":
    main()
