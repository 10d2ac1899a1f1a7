"""Sketch aggregations (scale/sketches.py) + modularity + salted
join: estimator guarantees checked against exact Python recomputation
on the real test corpus."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _py_tokens(rows):
    for grp, text in rows:
        for w in (text or "").split(" "):
            if w:
                yield grp, w


def test_kmv_matches_python_estimator(spark):
    """The Spark KMV estimate equals a from-first-principles Python
    KMV over the same corpus, and lands within 25% of exact for
    groups past the k threshold."""
    from octofludb_spark.scale import sketches as SK

    docs = _docs(spark)
    rows = [(r.lang, r.text) for r in docs.select("lang", "text").collect()]
    by_grp: dict = {}
    for grp, w in _py_tokens(rows):
        h = int(hashlib.md5(w.encode()).hexdigest()[:12], 16)
        by_grp.setdefault(grp, set()).add((h, w))
    got = {r.grp: r for r in SK.kmv_distinct(docs, key="lang").collect()}
    assert set(got) == set(by_grp)
    for grp, hs in by_grp.items():
        exact = len({w for _, w in hs})
        hashes = sorted({h for h, _ in hs})
        k = SK.K_KMV
        if len(hashes) < k:
            want = len(hashes)
        else:
            want = (k - 1) * SK.HASH_SPAN // hashes[k - 1]
        r = got[grp]
        assert r.n_exact == exact
        assert r.kmv_est == want
        if len(hashes) >= k:
            assert abs(r.kmv_est - exact) / exact < 0.25


def test_hll_registers_and_estimate(spark):
    """HLL registers rebuilt in Python match hll_s exactly; the
    estimate is within the ~6.5% expected rel-error band (3 sigma at
    m=256) of the true distinct count."""
    from octofludb_spark.scale import sketches as SK

    docs = _docs(spark)
    rows = [(r.lang, r.text) for r in docs.select("lang", "text").collect()]
    regs: dict = {}
    exact: dict = {}
    for grp, w in _py_tokens(rows):
        exact.setdefault(grp, set()).add(w)
        h = int(hashlib.md5(w.encode()).hexdigest()[:12], 16)
        idx, suf = h % SK.HLL_M, h // SK.HLL_M
        rho = SK.RHO_MAX if suf == 0 else SK.RHO_MAX - suf.bit_length()
        key = (grp, idx)
        regs[key] = max(regs.get(key, 0), rho)
    got = {r.grp: r for r in SK.hll_distinct(docs, key="lang").collect()}
    for grp in exact:
        s = sum(1 << (SK.RHO_MAX - m) for (g, _), m in regs.items()
                if g == grp)
        n_hit = sum(1 for (g, _) in regs if g == grp)
        s += (SK.HLL_M - n_hit) * (1 << SK.RHO_MAX)
        r = got[grp]
        assert r.hll_s == s
        assert r.hll_v0 == SK.HLL_M - n_hit
        n = len(exact[grp])
        assert r.n_exact == n
        assert abs(r.hll_est - n) / n < 3 * 1.04 / math.sqrt(SK.HLL_M)


def test_cms_one_sided_guarantee(spark):
    """CMS estimates never undercount, the top token is exact-or-over
    by at most the sketch error bound, and the probe set is the
    deterministic exact top-30."""
    from octofludb_spark.scale import sketches as SK

    docs = _docs(spark)
    out = SK.heavy_hitters_cms(docs, key="lang").collect()
    assert len(out) == 30
    total = sum(
        1 for _ in _py_tokens(
            (r.lang, r.text) for r in docs.select("lang", "text").collect())
    )
    for r in out:
        assert r.cms_est >= r.n_exact
        # classic CMS bound: overshoot < 2 * N / w with prob 1-2^-d
        assert r.cms_est - r.n_exact < 2 * total / SK.CMS_W


def test_modularity_pinned_two_cliques(spark):
    """Two triangles joined by one bridge, communities = the
    triangles: m=7, each community has e_c=3, d_c=7 -> q_num =
    4*7*3 - 49 = 35, Q = 70/196 ~ 0.357 (textbook value)."""
    from octofludb_spark.ops.graph_analytics import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long")
    comm = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "node long, community long")
    rows = {r.community: r for r in modularity(edges, comm).collect()}
    assert set(rows) == {1, 4}
    for c in (1, 4):
        assert rows[c].n_nodes == 3
        assert rows[c].intra_edges == 3
        assert rows[c].degree_sum == 7
        assert rows[c].m == 7
        assert rows[c].q_num == 4 * 7 * 3 - 49
    q = sum(r.q_num for r in rows.values()) / (4 * 7 * 7)
    assert abs(q - 5 / 14) < 1e-12


def test_modularity_singleton_partition_is_negative_free(spark):
    """All nodes in one community: Q = e/m - (2m/2m)^2 = 1 - 1 = 0."""
    from octofludb_spark.ops.graph_analytics import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long")
    comm = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "node long, community long")
    rows = modularity(edges, comm).collect()
    assert len(rows) == 1
    assert sum(r.q_num for r in rows) == 0


def test_salted_join_equals_plain_join(spark):
    """salted_join output == plain join output on a skewed key set,
    and the physical plan fans the dim side out via explode (the salt
    replication) with no nested-loop join."""
    from octofludb_spark.ops.canonicalize import salted_join

    # one hub key (0) carrying 90% of the big side
    big = spark.createDataFrame(
        [(0 if i % 10 else i % 7 + 1, i) for i in range(1000)],
        "k long, v long")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "k long, name string")
    plain = big.join(dim, "k").groupBy("k", "name").agg(
        F.sum("v").alias("s"), F.count("*").alias("n"))
    salted = salted_join(big, dim, "k", nsalt=8).groupBy("k", "name").agg(
        F.sum("v").alias("s"), F.count("*").alias("n"))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    assert "NestedLoop" not in plan


def test_dd_sketch_error_bound_and_merge(spark):
    """DDSketch guarantee: every estimate is within alpha relative
    error of its exact order statistic, and bucket counters SUM-merge
    (sketch of union == merged half sketches)."""
    from octofludb_spark.scale import sketches as SK

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").cache()
    out = SK.dd_quantiles(docs, key="lang").collect()
    assert out
    for r in out:
        # midpoint of bucket b covers (gamma^(b-1), gamma^b]; its
        # relative error vs any x in the bucket is <= alpha -- allow
        # 2*alpha for the discrete exact-order-statistic comparison
        assert abs(r.dd_est - r.exact_q) <= 2 * SK.DD_ALPHA * r.exact_q + 1

    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    whole = SK.dd_sketch(docs).withColumnRenamed("cnt", "w_cnt")
    merged = (SK.dd_sketch(a).unionByName(SK.dd_sketch(b))
              .groupBy("grp", "bucket").agg(F.sum("cnt").alias("m_cnt")))
    diff = (whole.join(merged, ["grp", "bucket"], "full")
            .where(F.coalesce("w_cnt", F.lit(-1))
                   != F.coalesce("m_cnt", F.lit(-2))))
    assert diff.count() == 0
    docs.unpersist()
