"""Round-3 session-3 operators: Bloom decontamination, content-defined
chunking, inverted index, node similarity — structural and
differential properties beyond the driver hash gates."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _bench(spark):
    d = _docs(spark)
    return d.where(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 30), " ").alias("text"),
    )


def test_bloom_is_superset_of_exact(spark):
    """A Bloom filter has NO false negatives: every document the
    exact-join decontaminator flags must be flagged by the Bloom
    probe, and its hit count can only grow (false positives)."""
    from octofludb_spark.scale.dedup import (bloom_decontaminate,
                                             contaminated_docs)

    docs, bench = _docs(spark), _bench(spark)
    exact = {r.doc_id: r.n_hits
             for r in contaminated_docs(docs, bench).collect()}
    bloom = {r.doc_id: r.n_bloom_hits
             for r in bloom_decontaminate(docs, bench).collect()}
    assert exact, "vacuous fixture"
    assert set(exact) <= set(bloom)
    for doc_id, n in exact.items():
        assert bloom[doc_id] >= n


def test_bloom_positions_are_20_bit(spark):
    from octofludb_spark.scale.dedup import (_bloom_positions,
                                             BLOOM_BITS_PER_SLICE, shingles)

    pos = _bloom_positions(shingles(_docs(spark).limit(20)))
    mm = pos.agg(F.min("pos"), F.max("pos"), F.min("i"), F.max("i")).first()
    assert 0 <= mm[0] and mm[1] < BLOOM_BITS_PER_SLICE
    assert (mm[2], mm[3]) == (0, 2)


def test_cdc_chunks_reassemble_document(spark):
    """Chunk texts are a partition of the word stream: per-doc word
    counts add back up, and chunk_idx is dense from 0."""
    from octofludb_spark.scale.text import cdc_chunks

    docs = _docs(spark).limit(50)
    ch = cdc_chunks(docs)
    got = {r.doc_id: (r.n, r.mx + 1, r.k) for r in
           ch.groupBy("doc_id").agg(
               F.sum("n_words").alias("n"),
               F.max("chunk_idx").alias("mx"),
               F.count("*").alias("k")).collect()}
    want = {r.doc_id: r.n for r in docs.select(
        "doc_id",
        F.size(F.split(F.coalesce("text", F.lit("")), " ")).alias("n"),
    ).collect()}
    assert set(got) == set(want)
    for doc_id, (n, mx1, k) in got.items():
        assert n == want[doc_id]
        assert mx1 == k  # dense chunk ids


def test_cdc_resynchronizes_after_prefix_shift(spark):
    """The CDC property itself: dropping a 5-word prefix leaves the
    tail chunk digests identical (fixed-window chunking would lose
    them all)."""
    from octofludb_spark.scale.text import cdc_chunks

    docs = _docs(spark).where(
        F.size(F.split(F.coalesce("text", F.lit("")), " ")) >= 60)
    n_docs = docs.count()
    assert n_docs > 0, "vacuous fixture"
    shifted = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 6, 1_000_000), " ")
        .alias("text"))
    ch = cdc_chunks(docs.select("doc_id", "text").unionByName(shifted))
    base = ch.where(F.col("doc_id") < 1_000_000).select("doc_id", "digest")
    clone = ch.where(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("doc_id"),
        F.col("digest").alias("cd"))
    shared = (base.join(clone, (base.doc_id == clone.doc_id)
                        & (base.digest == clone.cd))
              .groupBy(base.doc_id).count().collect())
    # a doc re-syncs unless its tail has no boundary at all —
    # P = (15/16)^(n-5) ~ 3% per 60-word doc, so demand 80% not 100%
    assert len(shared) >= max(1, int(0.8 * n_docs))


def test_inverted_index_matches_naive(spark):
    from octofludb_spark.scale.text import inverted_index

    docs = _docs(spark).limit(40)
    rows = docs.select("doc_id", F.coalesce("text", F.lit(""))
                       .alias("text")).collect()
    df, cf, post = {}, {}, {}
    for r in rows:
        terms = [t for t in r.text.split(" ") if t]
        for t in terms:
            cf[t] = cf.get(t, 0) + 1
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
            post.setdefault(t, []).append(r.doc_id)
    got = inverted_index(docs, max_postings=3).collect()
    assert {r.term for r in got} == set(df)
    for r in got:
        assert r.df == df[r.term] and r.cf == cf[r.term]
        want = ",".join(str(d) for d in sorted(post[r.term])[:3])
        assert r.postings == want


def test_node_similarity_matches_naive(spark):
    from octofludb_spark.ops.graph_analytics import node_similarity

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (1, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            c = len(adj[a] & adj[b])
            if c:
                j = c * 1_000_000 // (len(adj[a]) + len(adj[b]) - c)
                want[(a, b)] = (c, len(adj[a]), len(adj[b]), j)
    got = {(r.a, r.b): (r.common, r.deg_a, r.deg_b, r.jaccard_micro)
           for r in node_similarity(e).collect()}
    assert got == want


def test_node_similarity_hub_cap_logged(spark, caplog):
    """The hub cap is applied AND logged — a star center above the
    cap contributes no pairs, and the exclusion is never silent."""
    import logging

    from octofludb_spark.ops.graph_analytics import node_similarity

    star = [(0, i) for i in range(1, 8)] + [(1, 2)]
    e = spark.createDataFrame(star, "src long, dst long")
    with caplog.at_level(logging.WARNING,
                         logger="octofludb_spark.ops.graph_analytics"):
        got = {(r.a, r.b): r.common
               for r in node_similarity(e, max_center_degree=5).collect()}
    # center 0 (degree 7) excluded: only the wedges through 1 and 2
    # remain — uncapped, center 0 alone would emit all 21 leaf pairs
    assert got == {(0, 1): 1, (0, 2): 1}
    assert any("excluding" in r.message for r in caplog.records)
    uncapped = node_similarity(e, max_center_degree=None).count()
    assert uncapped > len(got)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_ops_plan_audit(spark):
    """None of the session-3 operators may plan a nested-loop or
    cartesian join, and the Bloom probe's filter side must broadcast
    (the corpus side is never shuffled before the position match)."""
    from octofludb_spark.ops.graph_analytics import node_similarity
    from octofludb_spark.scale.dedup import bloom_decontaminate
    from octofludb_spark.scale.text import cdc_chunks, inverted_index

    docs = _docs(spark).limit(60)
    bench = _bench(spark)
    plans = {
        "bloom": _plan(bloom_decontaminate(docs, bench)),
        "cdc": _plan(cdc_chunks(docs)),
        "invidx": _plan(inverted_index(docs, max_postings=3)),
        "nodesim": _plan(node_similarity(
            spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                                  "src long, dst long"))),
    }
    for name, p in plans.items():
        assert "NestedLoop" not in p and "CartesianProduct" not in p, name
    assert "BroadcastHashJoin" in plans["bloom"]
