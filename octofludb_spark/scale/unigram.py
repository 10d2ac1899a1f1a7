"""SentencePiece-style UNIGRAM-LM tokenizer training + encoding
(Kudo 2018, "Subword Regularization", public; simplified to the
deterministic Viterbi hard-EM variant) — the OTHER major subword
tokenizer family next to BPE (scale/bpe.py), Spark-first and
hash-oracled.

Scale shape (the BPE discipline): training never iterates over the
corpus.  ONE corpus pass builds the word-frequency table; seeding is
a JVM-side substring explode over that table (bounded: word length
<= W_MAX, piece length <= max_piece_len) + one keyed count agg +
one deterministic top-K; each EM round then runs on the DISTINCT
word table alone — an Arrow-batched per-distinct-word Viterbi
(dictionary-encoded, the recognizer run_unique pattern) against a
BROADCAST score dict, followed by one keyed count agg.  The only
driver state is the vocabulary itself (<= k_seed entries), same as
the BPE merge table / k-means centroids.

Determinism — every rule chosen so an external SQL engine replays the
whole trajectory bit-for-bit (the cross-engine contract):
  * integer-micro log scores: L(x) = floor(ln(x) * 1e6 + 0.5); piece
    score = L(GREATEST(cnt, 1)) - L(sum of GREATEST(cnt, 1));
  * Viterbi tie-breaks packed into ONE sortable BIGINT key per DP
    cell: ((-score_sum) * 64 + n_pieces) * 32 + j_back — maximize
    score, then fewer pieces, then longest last piece (smallest j);
    the oracle's list_min over the same packing is the same argmax;
  * seed/prune top-K order: (cnt DESC, piece ASC); single characters
    are ALWAYS retained (coverage), multi-char pieces compete for the
    remaining vocab_k - n_chars slots;
  * unknown single characters score UNK_MICRO (cannot occur on the
    training corpus — every corpus char seeds — but keeps encode
    total on arbitrary input).

No reference counterpart: flu-crew/octofludb has no tokenizer; this
is training-data-pipeline surface the engine adds (SURVEY beyond-§2).
"""

from __future__ import annotations

from typing import Iterator

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from octofludb_spark.scale.bpe import word_freq

UNK_MICRO = -20_000_000
W_MAX = 16  # words longer than this are excluded from training

VOCAB_SCHEMA = "piece string, cnt long, score_micro long, rank int"


def _lmicro(col):
    """floor(ln(x) * 1e6 + 0.5) as BIGINT — the integer-micro log
    convention every hash-green probabilistic gate uses."""
    return F.floor(F.ln(col) * 1_000_000 + F.lit(0.5)).cast("long")


def train_words(docs: DataFrame) -> DataFrame:
    """(word, cnt) eligible for unigram training: the BPE word table
    restricted to length <= W_MAX (long words are EXCLUDED, not
    truncated — same filter in the oracle)."""
    return word_freq(docs).where(F.length("word") <= W_MAX)


def seed_vocab(words: DataFrame, max_piece_len: int = 4,
               k_seed: int = 200) -> DataFrame:
    """Seed candidate pieces: every substring of length 1..
    max_piece_len of every word, weighted by word frequency and
    occurrence multiplicity (pure JVM explode — no Python).  ALL
    single characters are kept; multi-char pieces take the top
    ``k_seed`` by (cnt DESC, piece ASC)."""
    subs = words.select(
        F.col("cnt"),
        F.explode(F.expr(
            "flatten(transform(sequence(0, length(word) - 1), j -> "
            f"transform(sequence(1, least({int(max_piece_len)}, "
            "length(word) - j)), l -> substring(word, j + 1, l))))"
        )).alias("piece"))
    counts = subs.groupBy("piece").agg(
        F.sum("cnt").cast("long").alias("cnt"))
    chars = counts.where(F.length("piece") == 1)
    multis = (counts.where(F.length("piece") >= 2)
              .orderBy(F.col("cnt").desc(), F.col("piece").asc())
              .limit(int(k_seed)))
    return chars.unionByName(multis)


def _scores_of(vocab: DataFrame) -> dict[str, int]:
    """Collect the BOUNDED vocab (<= k_seed rows) as a {piece:
    score_micro} dict: score = L(max(cnt,1)) - L(total)."""
    rows = (vocab.select("piece", F.greatest("cnt", F.lit(1))
                         .alias("c")).collect())
    total = sum(r["c"] for r in rows)
    lt = _py_lmicro(total)
    return {r["piece"]: _py_lmicro(r["c"]) - lt for r in rows}


def _py_lmicro(x: int) -> int:
    return int(math.floor(math.log(x) * 1_000_000 + 0.5))


def _viterbi(word: str, scores: dict, max_len: int):
    """Viterbi segmentation with the packed-BIGINT tie-break (module
    docstring); returns (pieces, n_pieces, score_sum_micro)."""
    n = len(word)
    keys = [0] * (n + 1)
    for i in range(1, n + 1):
        best = None
        for j in range(max(0, i - max_len), i):
            s = scores.get(word[j:i])
            if s is None:
                if i - j != 1:
                    continue
                s = UNK_MICRO
            pk = keys[j]
            k = ((-(-(pk // 2048) + s)) * 64
                 + (pk // 32) % 64 + 1) * 32 + j
            if best is None or k < best:
                best = k
        keys[i] = best
    pieces, pos = [], n
    while pos > 0:
        j = keys[pos] % 32
        pieces.append(word[j:pos])
        pos = j
    pieces.reverse()
    return pieces, (keys[n] // 32) % 64, -(keys[n] // 2048)


def _estep_counts(words: DataFrame, scores: dict,
                  max_len: int) -> DataFrame:
    """One hard-EM E-step: Viterbi-segment every DISTINCT word
    (Arrow-batched; scores ride as a broadcast-sized closure dict)
    and count piece usage weighted by word frequency."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ps, cs = [], []
            for w, c in zip(pdf["word"], pdf["cnt"]):
                pieces, _, _ = _viterbi(str(w), scores, max_len)
                ps.extend(pieces)
                cs.extend([int(c)] * len(pieces))
            yield pd.DataFrame({"piece": ps,
                                "cnt": pd.array(cs, dtype="int64")})

    return (words.select("word", "cnt")
            .mapInPandas(run, "piece string, cnt long")
            .groupBy("piece").agg(F.sum("cnt").cast("long").alias("cnt")))


def unigram_train(docs: DataFrame, vocab_k: int = 40,
                  max_piece_len: int = 4, k_seed: int = 200,
                  em_rounds: int = 2) -> DataFrame:
    """Train the unigram LM vocabulary: seed -> ``em_rounds`` x
    (score -> Viterbi E-step -> prune).  Pruning keeps ALL single
    characters (cnt as counted, floor 1 only inside scoring) and the
    top (vocab_k - n_chars) multi-char pieces with cnt >= 1 by
    (cnt DESC, piece ASC).  Returns (piece, cnt, score_micro, rank)
    with rank = dense position under the same order — the exact
    table the DuckDB oracle rebuilds via the unrolled recursive-CTE
    Viterbi replay."""
    words = train_words(docs).persist()
    words.count()
    vocab = seed_vocab(words, max_piece_len, k_seed)
    chars = vocab.where(F.length("piece") == 1).select("piece")
    try:
        for _ in range(em_rounds):
            scores = _scores_of(vocab)
            counts = _estep_counts(words, scores, max_piece_len)
            new_chars = (chars.join(counts, "piece", "left")
                         .select("piece",
                                 F.coalesce("cnt", F.lit(0))
                                 .cast("long").alias("cnt")))
            n_chars = new_chars.count()  # bounded: alphabet size
            multis = (counts
                      .join(vocab.select("piece"), "piece", "left_semi")
                      .where((F.length("piece") >= 2) & (F.col("cnt") >= 1))
                      .orderBy(F.col("cnt").desc(), F.col("piece").asc())
                      .limit(max(0, int(vocab_k) - n_chars)))
            vocab = new_chars.unionByName(multis)
        scores = _scores_of(vocab)
        out = vocab.select(
            "piece", "cnt",
            F.greatest("cnt", F.lit(1)).alias("_c"))
        total = out.agg(F.sum("_c")).first()[0]
        out = out.select(
            "piece", "cnt",
            (_lmicro(F.col("_c")) - F.lit(_py_lmicro(int(total))))
            .alias("score_micro"))
        w = F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("piece").asc()))
        return out.select("piece", "cnt", "score_micro",
                          w.cast("int").alias("rank"))
    finally:
        words.unpersist()


def unigram_encode_stats(docs: DataFrame, model: DataFrame,
                         max_piece_len: int = 4) -> DataFrame:
    """Encode every document with a trained vocabulary and report the
    order-independent per-doc totals the oracle can restate:
    (doc_id, n_words, n_tokens, score_sum_micro).  Scale shape: ONE
    per-DISTINCT-word Viterbi pass (broadcast score dict) joined back
    to the exploded word stream — documents are never re-segmented
    per occurrence; words longer than W_MAX count as one UNK token at
    UNK_MICRO each (deterministic, same rule in SQL)."""
    scores = {r["piece"]: int(r["score_micro"])
              for r in model.select("piece", "score_micro").collect()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nt, sc = [], []
            for w in pdf["word"]:
                w = str(w)
                if len(w) > W_MAX:
                    nt.append(1)
                    sc.append(UNK_MICRO)
                    continue
                _, np_, s = _viterbi(w, scores, max_piece_len)
                nt.append(np_)
                sc.append(s)
            out = pdf[["word"]].copy()
            out["w_tokens"] = pd.array(nt, dtype="int64")
            out["w_score"] = pd.array(sc, dtype="int64")
            yield out

    doc_words = (docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0))
    per_word = (doc_words.select("word").distinct()
                .mapInPandas(run, "word string, w_tokens long, "
                                  "w_score long"))
    return (doc_words.join(F.broadcast(per_word), "word")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("w_tokens").cast("long").alias("n_tokens"),
                 F.sum("w_score").cast("long").alias("score_sum_micro")))
