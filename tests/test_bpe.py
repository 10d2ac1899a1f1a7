"""BPE tokenizer training: differential tests against a transparent
pure-python implementation of the same algorithm (Sennrich 2016 merge
learning; left-to-right non-overlapping merge application in learned
order), plus determinism and edge cases."""

from __future__ import annotations

from collections import Counter

import pytest

import octofludb_spark.scale.bpe as B

pytestmark = pytest.mark.core


def py_bpe(texts, k):
    """Reference BPE: word-freq table, per-step weighted pair argmax
    with (count DESC, lhs, rhs) tie-break, greedy left-to-right merge."""
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: list(w) for w in wf}
    merges = []
    for step in range(k):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, l + r, c))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_train_matches_reference(spark):
    texts = ["the cat sat on the mat", "the hat of the cat",
             "that that cat", "aaaa aa a baaa", "banana bandana"]
    docs = _docs(spark, texts)
    got = B.bpe_train(docs, n_merges=10)
    want, ref_syms = py_bpe(texts, 10)
    assert [(m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in got] == want

    wt = {r.word: (r.n_tokens, list(r.tokens))
          for r in B.bpe_word_tokens(docs, got).collect()}
    assert wt == {w: (len(s), s) for w, s in ref_syms.items()}

    dc = {r.doc_id: r.n_tokens
          for r in B.bpe_doc_token_counts(docs, got).collect()}
    assert dc == {i: sum(len(ref_syms[w]) for w in t.split(" ") if w)
                  for i, t in enumerate(texts)}


def test_bpe_greedy_overlap_and_ties(spark):
    # 'aaaa' exercises the non-overlapping left-to-right rule:
    # merge (a,a) maps a,a,a,a -> aa,aa and a,a,a -> aa,a
    docs = _docs(spark, ["aaaa aaa"])
    got = B.bpe_train(docs, n_merges=2)
    assert (got[0]["left"], got[0]["right"], got[0]["pair_count"]) \
        == ("a", "a", 5)
    wt = {r.word: list(r.tokens)
          for r in B.bpe_word_tokens(docs, got).collect()}
    assert wt["aaaa"][:2] == ["aa", "aa"] or wt["aaaa"] == ["aaaa"]
    # tie-break: equal counts resolve (lhs, rhs) lexicographically
    docs = _docs(spark, ["xy zw"])
    got = B.bpe_train(docs, n_merges=1)
    assert (got[0]["left"], got[0]["right"]) == ("x", "y")


def test_bpe_exhausts_and_stops_early(spark):
    # single-char words: no adjacent pairs at all -> zero merges
    docs = _docs(spark, ["a b c a"])
    assert B.bpe_train(docs, n_merges=4) == []
    # 'ab' collapses in one merge; training then stops
    docs = _docs(spark, ["ab ab"])
    got = B.bpe_train(docs, n_merges=5)
    assert len(got) == 1 and got[0]["merged"] == "ab"


def test_bpe_determinism_across_partitioning(spark):
    texts = [f"w{i % 7} common w{i % 3} tail" for i in range(40)]
    a = B.bpe_train(_docs(spark, texts), n_merges=6)
    b = B.bpe_train(_docs(spark, texts).repartition(16), n_merges=6)
    assert a == b


def test_bpe_fuzz_against_reference(spark):
    import random
    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "alp", "bet", "aaa", "ab", "ba",
             "x", "yz", "alphabet"]
    for trial in range(4):
        texts = [" ".join(rng.choices(vocab, k=rng.randint(1, 12)))
                 for _ in range(rng.randint(3, 15))]
        k = rng.randint(1, 8)
        got = B.bpe_train(_docs(spark, texts), n_merges=k)
        want, ref_syms = py_bpe(texts, k)
        assert [(m["step"], m["left"], m["right"], m["merged"],
                 m["pair_count"]) for m in got] == want, (trial, texts)
        wt = {r.word: list(r.tokens)
              for r in B.bpe_word_tokens(_docs(spark, texts), got).collect()}
        assert wt == {w: s for w, s in ref_syms.items()}, (trial, texts)


def test_bpe_vocab_and_ids(spark):
    texts = ["the cat sat", "that hat", "aaa ab"]
    docs = _docs(spark, texts)
    merges = B.bpe_train(docs, n_merges=4)
    vocab = {r.token: r.token_id for r in B.bpe_vocab(docs, merges).collect()}

    base = sorted({c for t in texts for w in t.split(" ") for c in w})
    assert [vocab[c] for c in base] == list(range(len(base)))
    for m in merges:
        assert vocab[m["merged"]] == len(base) + m["step"]

    _, ref_syms = py_bpe(texts, 4)
    ids = B.bpe_encode_ids(docs, merges).collect()
    got = {}
    for r in ids:
        got.setdefault(r.doc_id, {})[(r.word_pos, r.tok_pos)] = r.token_id
    for d, text in enumerate(texts):
        want = {}
        for wp, w in enumerate(text.split(" ")):
            if not w:
                continue
            for tp, tok in enumerate(ref_syms[w]):
                want[(wp, tp)] = vocab[tok]
        assert got[d] == want, d
