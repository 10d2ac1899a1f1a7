#!/usr/bin/env python3
"""Whole-registry physical-plan audit: build every gate's DataFrame at
a small sf and scan its executedPlan for scale anti-patterns —
CartesianProduct / BroadcastNestedLoopJoin on anything that could be a
data-scale relation.  Writes one JSON line per gate to
PLAN_AUDIT.json and exits non-zero if an unexpected pattern appears.

Allow-list: gates whose plans INTENTIONALLY contain a bounded
cartesian between two dimension tables (documented in PLANS.md).
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

# Gates whose nested-loop/cartesian operators are INTENTIONAL and
# bounded — each justified here and in PLANS.md:
ALLOWED_CARTESIAN = {
    # L x (K+1) weight matrix: classes x vocab, two bounded dims
    "text_naive_bayes",
    # LABELED exact O(n^2) baselines (the brute faces the LSH/IVF
    # scale variants are verified against; inequality-condition
    # self-joins are BNLJ by definition)
    "cosine_pairs",
    "ann_topk_brute",
    "ann_hard_negatives",
    # vectors x broadcast(centroid/codebook) condition joins: the
    # build side is the BOUNDED quantizer dimension (<= MAX_CLUSTERS
    # / 2^8 codewords) — per-row O(k) map-side work, the data side
    # never shuffles; this IS the IVF assignment shape at scale
    "ann_topk_ivf_ids",
    "ann_topk_pq_ids",
}

PATTERNS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def main(sf_dir: str) -> int:
    from octofludb_spark.plans.driver_queries import QUERIES
    from octofludb_spark.session import get_spark

    spark = get_spark(cores=8)
    bad = []
    rows = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # build failure IS a finding
            rows.append({"gate": name, "error": str(ex)[:200]})
            bad.append(name)
            print(f"ERROR {name}: {str(ex)[:120]}", flush=True)
            continue
        hits = {p: plan.count(p) for p in PATTERNS if p in plan}
        n_exchange = plan.count("Exchange")
        n_smj = plan.count("SortMergeJoin")
        rows.append({"gate": name, "anti_patterns": hits,
                     "exchanges": n_exchange, "sort_merge_joins": n_smj})
        if hits and name not in ALLOWED_CARTESIAN:
            bad.append(name)
            print(f"FLAG {name}: {hits}", flush=True)
        else:
            print(f"ok   {name} (exch={n_exchange} smj={n_smj})",
                  flush=True)
    with open("/root/repo/PLAN_AUDIT.json", "w") as fh:
        json.dump({"sf_dir": sf_dir, "n_gates": len(rows),
                   "flagged": bad, "gates": rows}, fh, indent=1)
    print(f"\n{len(rows)} gates audited, {len(bad)} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(main(sf))
