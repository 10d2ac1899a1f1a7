"""Unigram-LM tokenizer (scale/unigram.py): Viterbi semantics, EM
trajectory composition, determinism.  The cross-engine value-hash is
the tokenizer_unigram_train / tokenizer_unigram_encode gates (full
DuckDB recursive-CTE replay); these tests pin the pure-python DP
against hand-checked segmentations and the Spark plumbing against
its own invariants."""

import pytest
from pyspark.sql import functions as F

from octofludb_spark.scale.unigram import (
    UNK_MICRO,
    _viterbi,
    seed_vocab,
    train_words,
    unigram_encode_stats,
    unigram_train,
)

pytestmark = [pytest.mark.spark, pytest.mark.core]


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


# ------------------------------------------------------------ pure DP

def test_viterbi_prefers_higher_score():
    # "abc" with ab=-1, c=-1 vs a=-5, bc=-1: ab+c = -2 beats a+bc=-6
    s = {"ab": -1, "c": -1, "a": -5, "b": -5, "bc": -1}
    pieces, np_, sc = _viterbi("abc", s, 2)
    assert pieces == ["ab", "c"] and np_ == 2 and sc == -2


def test_viterbi_tie_breaks_fewer_pieces_then_longest_last():
    # equal total score: 1 piece beats 2
    s = {"ab": -2, "a": -1, "b": -1}
    assert _viterbi("ab", s, 2)[0] == ["ab"]
    # still equal (score AND count): longest LAST piece wins (min j)
    s2 = {"ab": -1, "c": -1, "a": -1, "bc": -1, "b": -99, "abc": -99}
    pieces, np_, _ = _viterbi("abc", s2, 3)
    assert np_ == 2 and pieces == ["a", "bc"]


def test_viterbi_unknown_single_char_fallback():
    pieces, np_, sc = _viterbi("xy", {"x": -3}, 4)
    assert pieces == ["x", "y"] and sc == -3 + UNK_MICRO


# ------------------------------------------------------- spark layers

def test_seed_vocab_counts_and_caps(spark):
    w = train_words(_docs(spark, ["aa ab aa"]))
    got = {r["word"]: r["cnt"] for r in w.collect()}
    assert got == {"aa": 2, "ab": 1}
    v = {r["piece"]: r["cnt"]
         for r in seed_vocab(w, max_piece_len=2, k_seed=10).collect()}
    # char counts carry occurrence multiplicity: 'a' twice in 'aa'
    assert v["a"] == 2 * 2 + 1 and v["b"] == 1
    assert v["aa"] == 2 and v["ab"] == 1
    # k_seed caps multis only, by (cnt DESC, piece ASC)
    v1 = seed_vocab(w, max_piece_len=2, k_seed=1).collect()
    multis = [r["piece"] for r in v1 if len(r["piece"]) >= 2]
    assert multis == ["aa"]


def test_train_keeps_all_chars_and_respects_vocab_k(spark):
    docs = _docs(spark, ["batch stream batch sort merge sort"] * 3)
    m = unigram_train(docs, vocab_k=12, max_piece_len=3,
                      k_seed=50, em_rounds=2)
    rows = m.collect()
    assert len(rows) <= 12
    chars = {r["piece"] for r in rows if len(r["piece"]) == 1}
    corpus_chars = set("batchstreamsortmerge")
    assert chars == corpus_chars  # every char retained, always
    assert all(1 <= len(r["piece"]) <= 3 for r in rows)
    assert all(r["score_micro"] <= 0 for r in rows)
    ranked = sorted(rows, key=lambda r: r["rank"])
    pairs = [(-r["cnt"], r["piece"]) for r in ranked]
    assert pairs == sorted(pairs)  # rank == (cnt DESC, piece ASC)


def test_train_parallelism_invariant(spark):
    docs = _docs(spark, ["fast key order sort table scan"] * 7)
    a = sorted(map(tuple, unigram_train(docs, vocab_k=20,
                                        em_rounds=2).collect()))
    b = sorted(map(tuple, unigram_train(docs.repartition(9), vocab_k=20,
                                        em_rounds=2).collect()))
    assert a == b


def test_encode_stats_totals_and_oov(spark):
    train = _docs(spark, ["hash join hash scan join"] * 4)
    m = unigram_train(train, vocab_k=15, max_piece_len=3,
                      k_seed=50, em_rounds=1)
    out = {r["doc_id"]: r for r in
           unigram_encode_stats(train, m, max_piece_len=3).collect()}
    r0 = out[0]
    assert r0["n_words"] == 5
    assert r0["n_tokens"] >= 5  # at least one piece per word
    assert r0["score_sum_micro"] < 0
    # OOV character: per-char UNK fallback keeps encode total
    oov = _docs(spark, ["zzz hash"])
    ro = unigram_encode_stats(oov, m, max_piece_len=3).collect()[0]
    assert ro["n_words"] == 2
    assert ro["score_sum_micro"] <= 3 * UNK_MICRO  # three unk chars


def test_encode_matches_per_word_viterbi(spark):
    # the broadcast-join plumbing must equal a direct python recount
    from octofludb_spark.scale.unigram import _scores_of

    docs = _docs(spark, ["merge sort merge", "scan sort"])
    m = unigram_train(docs, vocab_k=14, max_piece_len=3,
                      k_seed=50, em_rounds=2)
    scores = {r["piece"]: r["score_micro"] for r in m.collect()}
    got = {r["doc_id"]: (r["n_tokens"], r["score_sum_micro"])
           for r in unigram_encode_stats(docs, m,
                                         max_piece_len=3).collect()}
    for did, text in [(0, "merge sort merge"), (1, "scan sort")]:
        nt = sc = 0
        for w in text.split(" "):
            _, np_, s = _viterbi(w, scores, 3)
            nt += np_
            sc += s
        assert got[did] == (nt, sc)
