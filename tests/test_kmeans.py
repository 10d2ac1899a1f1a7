"""Distributed Lloyd k-means (scale/simsearch.kmeans_lloyd).

The exact fixed-point discipline is the point: integer micro-unit
distances and truncating-division updates make every round's
assignment bit-identical at any parallelism, which is what lets the
whole trajectory be value-hashed cross-engine (gates
embedding_kmeans / embedding_kmeans_assign).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from octofludb_spark.scale import simsearch as S

pytestmark = pytest.mark.spark


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _replay(vecs, k, iters):
    """Pure-python Lloyd replay with identical integer conventions."""
    import numpy as np

    q = {i: [int(np.floor(np.float64(np.float32(x)) * 1_000_000 + 0.5))
             for x in v] for i, v in enumerate(vecs)}
    seeds = sorted(q, key=lambda v: (
        hashlib.md5(f"km:{v}".encode()).hexdigest(), v))[:k]
    cents = {i: q[v][:] for i, v in enumerate(seeds)}

    def tdiv(a, b):
        r = abs(a) // b
        return -r if a < 0 else r

    traj, assign = [], {}
    for it in range(1, iters + 1):
        assign = {
            v: min((sum((a - b) * (a - b) for a, b in zip(qv, c)), cid)
                   for cid, c in cents.items())
            for v, qv in q.items()
        }
        stats = {}
        for v, (d, cid) in assign.items():
            n, td = stats.get(cid, (0, 0))
            stats[cid] = (n + 1, td + d)
        traj += [(it, cid, *stats[cid]) for cid in sorted(stats)]
        acc = {}
        for v, (d, cid) in assign.items():
            s = acc.setdefault(cid, [0] * (len(q[v]) + 1))
            s[-1] += 1
            for i, x in enumerate(q[v]):
                s[i] += x
        cents = {cid: [tdiv(s[i], s[-1]) for i in range(len(s) - 1)]
                 for cid, s in acc.items()}
    return traj, {v: cid for v, (d, cid) in assign.items()}


def test_kmeans_matches_python_replay(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = np.round(rng.uniform(-0.5, 0.5, size=(60, 6)), 4)
    out = S.kmeans_lloyd(_emb(spark, vecs), k=4, iters=3)
    traj = [tuple(r) for r in out["trajectory"].orderBy("iter", "cid").collect()]
    exp_traj, exp_assign = _replay(vecs, k=4, iters=3)
    assert traj == exp_traj
    got_assign = {r.vec_id: r.cid
                  for r in out["assign"].collect()}
    assert got_assign == exp_assign


def test_kmeans_partition_invariance(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = np.round(rng.uniform(-1, 1, size=(40, 5)), 4)
    emb = _emb(spark, vecs)
    t1 = [tuple(r) for r in
          S.kmeans_lloyd(emb.coalesce(1), k=3, iters=2)["trajectory"]
          .orderBy("iter", "cid").collect()]
    t2 = [tuple(r) for r in
          S.kmeans_lloyd(emb.repartition(7), k=3, iters=2)["trajectory"]
          .orderBy("iter", "cid").collect()]
    assert t1 == t2


def test_kmeans_tight_clusters_recovered(spark):
    # Two well-separated blobs: after 2 rounds every member sits with
    # its blob-mates and centroids equal the exact integer means.
    blob_a = [[0.1, 0.1], [0.11, 0.09], [0.09, 0.1]]
    blob_b = [[-0.9, -0.9], [-0.91, -0.89], [-0.89, -0.9]]
    out = S.kmeans_lloyd(_emb(spark, blob_a + blob_b), k=2, iters=2)
    rows = out["assign"].collect()
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r.cid, set()).add(r.vec_id)
    assert sorted(map(sorted, by_cid.values())) == [[0, 1, 2], [3, 4, 5]]
    cents = {(r.cid, r.pos): r.centroid_micro
             for r in out["centroids"].collect()}
    cid_a = next(r.cid for r in rows if r.vec_id == 0)
    assert cents[(cid_a, 0)] == (100000 + 110000 + 90000) // 3


def test_kmeans_tie_breaks_to_smallest_cid(spark):
    # A point exactly between two seed centroids must take the lower cid.
    vecs = [[0.0], [2.0], [1.0]]
    out = S.kmeans_lloyd(_emb(spark, vecs), k=2, iters=1)
    assign = {r.vec_id: r.cid for r in out["assign"].collect()}
    h0 = hashlib.md5(b"km:0").hexdigest()
    h1 = hashlib.md5(b"km:1").hexdigest()
    # seeds are vec 0 and vec 1 (ordered by md5); the midpoint vec 2 is
    # equidistant -> cid 0 regardless of which seed got cid 0.
    assert assign[2] == 0
    lo = 0 if h0 < h1 else 1
    assert assign[lo] == 0


def test_kmeans_empty_cluster_drops(spark):
    # k equal to n with a duplicated point: the duplicate pair collapses
    # onto one seed, leaving one centroid empty -> it must vanish from
    # later rounds (GROUP BY semantics, mirrored by the SQL oracle).
    vecs = [[0.0], [0.0], [5.0]]
    out = S.kmeans_lloyd(_emb(spark, vecs), k=3, iters=2)
    last = [r for r in out["trajectory"].collect() if r.iter == 2]
    assert sum(r.n_vecs for r in last) == 3
    assert len(last) == 2  # one of the three seeds lost its members


def test_kmeans_k_guard(spark):
    with pytest.raises(ValueError):
        S.kmeans_lloyd(_emb(spark, [[0.0]]), k=S.KMEANS_MAX_K + 1)


def test_kmeans_assign_plan_is_map_side(spark):
    import numpy as np

    vecs = np.round(np.random.RandomState(3).uniform(-1, 1, (20, 4)), 3)
    out = S.kmeans_lloyd(_emb(spark, vecs), k=2, iters=2)
    plan = out["assign"]._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # final assignment is a projection
    assert "Join" not in plan
