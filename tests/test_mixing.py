"""shard_shuffle + mix_epochs: determinism, budget accounting,
partition invariance, python replays."""

import hashlib

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.core

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------- shard_shuffle

def test_shard_shuffle_partition_invariance(spark):
    from octofludb_spark.scale.text import shard_shuffle

    docs = _docs(spark)
    a = shard_shuffle(docs, n_shards=16, seed=3).collect()
    b = shard_shuffle(docs.repartition(13), n_shards=16, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shard_shuffle_python_replay(spark):
    from octofludb_spark.scale.text import shard_shuffle

    docs = _docs(spark).limit(200)
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in
           shard_shuffle(docs, n_shards=8, seed=7).collect()}
    keyed = []
    for r in docs.select("doc_id").collect():
        k = hashlib.md5(f"7:{r[0]}".encode()).hexdigest()
        keyed.append((int(k[:6], 16) % 8, k, int(r[0])))
    want = {}
    for shard in range(8):
        members = sorted((k, i) for s, k, i in keyed if s == shard)
        for pos, (_, i) in enumerate(members, start=1):
            want[i] = (shard, pos)
    assert got == want


def test_shard_shuffle_positions_contiguous_and_seeded(spark):
    from octofludb_spark.scale.text import shard_shuffle

    docs = _docs(spark)
    out = shard_shuffle(docs, n_shards=8, seed=0)
    per = {r["shard"]: (r["n"], r["mx"]) for r in
           out.groupBy("shard").agg(F.count("*").alias("n"),
                                    F.max("pos").alias("mx")).collect()}
    assert set(per) <= set(range(8))
    for n, mx in per.values():
        assert n == mx  # ranks are 1..count, no gaps
    # a different seed must yield a genuinely different permutation
    other = shard_shuffle(docs, n_shards=8, seed=1)
    joined = (out.alias("a").join(other.alias("b"), "doc_id")
              .where((F.col("a.shard") == F.col("b.shard"))
                     & (F.col("a.pos") == F.col("b.pos"))).count())
    assert joined < out.count() * 0.05


def test_shard_shuffle_rejects_bad_args(spark):
    from octofludb_spark.scale.text import shard_shuffle

    with pytest.raises(ValueError, match="n_shards"):
        shard_shuffle(_docs(spark), n_shards=0)


# ------------------------------------------------------- mix_epochs

def _mix_replay(rows, weights):
    """Transparent python replay of the integer mixture algorithm."""
    wsum = sum(weights.values())
    total = sum(n for _, _, n in rows)
    per = {}
    for _, d, n in rows:
        per[d] = per.get(d, 0) + n
    out = {}
    for d, td in per.items():
        wd = weights.get(d, 0)
        if wd == 0 or td == 0:
            continue
        target = total * wd // wsum
        n_base, rem = target // td, target % td
        members = sorted((hashlib.md5(str(i).encode()).hexdigest(), i, n)
                         for i, dd, n in rows if dd == d)
        cum = 0
        for _, i, n in members:
            out[i] = n_base + (1 if cum < rem else 0)
            cum += n
    return out


def test_mix_epochs_python_replay(spark):
    from octofludb_spark.scale.text import mix_epochs

    weights = {"en": 5, "de": 2, "es": 1, "fr": 1, "zh": 1}
    docs = _docs(spark)
    rows = [(int(r["doc_id"]), r["lang"], int(r["n_tok"])) for r in
            docs.select(
                "doc_id", "lang",
                F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"))
            .collect()]
    want = {i: n for i, n in _mix_replay(rows, weights).items() if n > 0}
    got = {r["doc_id"]: r["n"] for r in
           mix_epochs(docs, weights)
           .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_mix_epochs_budget_within_one_doc(spark):
    from octofludb_spark.scale.text import mix_epochs

    weights = {"en": 5, "de": 2, "es": 1, "fr": 1, "zh": 1}
    docs = _docs(spark)
    toks = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_tok"))
    total = toks.agg(F.sum("n_tok")).collect()[0][0]
    realized = {r["domain"]: r["s"] for r in
                mix_epochs(docs, weights).groupBy("domain")
                .agg(F.sum("n_tok").alias("s")).collect()}
    max_doc = {r["lang"]: r["m"] for r in
               toks.groupBy("lang").agg(F.max("n_tok").alias("m"))
               .collect()}
    for d, w in weights.items():
        target = total * w // sum(weights.values())
        # realized overshoots by at most the last prefix doc, and
        # undershoots by at most the floor remainder (< one doc span)
        assert abs(realized[d] - target) <= max_doc[d], d


def test_mix_epochs_drops_zero_weight_and_validates(spark):
    from octofludb_spark.scale.text import mix_epochs

    docs = _docs(spark)
    out = mix_epochs(docs, {"en": 1})  # every other domain weight 0
    assert out.select("domain").distinct().collect() == [("en",)]
    # en gets the WHOLE corpus token budget -> multiple epochs
    assert out.groupBy("doc_id").count().agg(F.max("count")) \
              .collect()[0][0] >= 2
    with pytest.raises(ValueError):
        mix_epochs(docs, {"en": -1})
    with pytest.raises(ValueError):
        mix_epochs(docs, {})


def test_mix_epochs_epochs_are_dense(spark):
    from octofludb_spark.scale.text import mix_epochs

    weights = {"en": 5, "de": 2, "es": 1, "fr": 1, "zh": 1}
    out = mix_epochs(_docs(spark), weights)
    bad = (out.groupBy("doc_id")
           .agg(F.count("*").alias("n"), F.max("epoch").alias("mx"),
                F.min("epoch").alias("mn"))
           .where((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
           .count())
    assert bad == 0
