"""Round-6 optimization pins: each test locks an operator-internal
change to the behavior it must preserve (results identical, execution
shape improved).

Covered:
  * ops/lineage.spread_input — scale-adaptive map-parallelism floor
    (no-op at/above defaultParallelism, value-preserving below it).
  * scale/simsearch._bucket_bits — the nested-literal hyperplane form
    must equal the per-plane fold it replaced, bit for bit.
  * scale/bpe.bpe_train — the merge trajectory is independent of the
    persist/materialization schedule (the last-round materialization
    removal cannot change results by construction; this pins it).
  * scale/sketches.heavy_hitters_cms — plans as a distributed
    TakeOrderedAndProject with NO unpartitioned Window (the r5-verdict
    one-reducer sort), same deterministic top-K.
  * ops/cc.connected_components — unchanged results with the new
    edge-input caching, and no cached edge relation left behind.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = [pytest.mark.spark]


@pytest.fixture(scope="module")
def spark():
    from octofludb_spark.session import get_spark

    s = get_spark(app="test-r6-opt", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_spread_input_floors_low_parallelism(spark):
    from octofludb_spark.ops.lineage import spread_input

    df = spark.range(0, 1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread_input(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # value-preserving (round-robin repartition moves rows, never
    # changes them)
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_spread_input_noop_at_or_above_floor(spark):
    from octofludb_spark.ops.lineage import spread_input

    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 100).repartition(target + 2)
    out = spread_input(df)
    # already parallel enough: pass through UNTOUCHED (same plan)
    assert out is df


def test_bucket_bits_equals_per_plane_fold(spark):
    """The nested-literal transform must reproduce the old per-plane
    zip_with+aggregate folds exactly (same doubles, same left-to-right
    accumulation) — the property every LSH oracle hash rides on."""
    from octofludb_spark.scale.simsearch import (_bucket_bits, _dot,
                                                 _hyperplane, _norm)

    emb = spark.range(0, 64).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.conv(F.substring(F.md5(F.concat_ws(
                ":", F.col("id"), i)), 1, 6), 16, 10).cast("double")
                / F.lit(16777215.0) * 2.0 - 1.0),
        ).alias("embedding"),
    )
    n_planes, dim = 6, 16
    new = _bucket_bits(emb, n_planes, dim).select("vec_id", "norm", "bits")
    # the pre-round-6 expression form, verbatim
    bits = [
        (_dot(F.col("embedding"),
              F.array(*[F.lit(v) for v in _hyperplane(dim, p)])) > 0)
        .cast("int")
        for p in range(n_planes)
    ]
    old = emb.select(
        "vec_id",
        _norm(F.col("embedding")).alias("norm"),
        F.array(*bits).alias("bits"),
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_bpe_trajectory_independent_of_persist_schedule(spark):
    from octofludb_spark.scale.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, "low lower lowest newer new wider wide " * (1 + i % 3))
         for i in range(40)],
        "doc_id long, text string",
    )
    a = bpe_train(docs, n_merges=6, persist_every=1)
    b = bpe_train(docs, n_merges=6, persist_every=4)
    c = bpe_train(docs, n_merges=6, persist_every=6)  # last-round hit
    assert a == b == c
    assert len(a) == 6


def test_heavy_hitters_plan_has_no_unpartitioned_window(spark):
    from octofludb_spark.scale import sketches as SK

    docs = spark.createDataFrame(
        [(i, "en", " ".join(f"w{(i + j) % 7}" for j in range(i % 11 + 1)))
         for i in range(60)],
        "doc_id long, lang string, text string",
    )
    df = SK.heavy_hitters_cms(docs, key="lang", top=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan  # the one-reducer global sort is gone
    rows = {r.word: (r.n_exact, r.cms_est) for r in df.collect()}
    assert len(rows) == 5
    for word, (n_exact, cms_est) in rows.items():
        assert cms_est >= n_exact  # one-sided CMS guarantee


def test_cc_results_and_cache_hygiene(spark):
    from octofludb_spark.ops.cc import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")],
        "src string, dst string",
    )
    # The leak check below is against the session-wide SQL cache
    # manager, so start from a known-empty cache: when the full suite
    # shares one session, an unrelated module's live cache would
    # otherwise fail the global isEmpty assertion (unpersisting only
    # drops a recomputable cache — it cannot change any result).
    spark.catalog.clearCache()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "clearCache left the cache manager non-empty"
    comp = {r.node: r.component
            for r in connected_components(edges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # the internal edge persist must not leak into the cache manager
    assert jcm.isEmpty(), "CC left a cached relation behind"
