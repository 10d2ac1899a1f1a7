"""Distributed BPE tokenizer training (Sennrich et al. 2016, public;
the subword-nmt / GPT-2 merge-table recipe) — the tokenizer-training
step of an LLM data pipeline, Spark-first.

Scale shape: training never iterates over the corpus.  One
corpus-wide aggregation builds the WORD-FREQUENCY table (vocab-sized
— ~10^6-10^8 rows at web scale, vs 10^11+ corpus tokens), and every
merge round runs on that table alone: one distributed pair-count
aggregation + one argmax row collected to the driver (a single row
per round — the only driver traffic), then a JVM fold applies the
merge.  Encoding is likewise vocab-first: the merge table is applied
once per DISTINCT word form, and documents get token counts through
a broadcast-sized join on the word, never by re-tokenizing each
occurrence.

Determinism: ties in pair frequency break (count DESC, left ASC,
right ASC); merge application is a single left-to-right
non-overlapping greedy pass per merge, applied in learned order —
both rules chosen because an external SQL engine reproduces them
bit-for-bit (ORDER BY ... LIMIT 1 and left-to-right string replace),
so the whole training trajectory is value-hash checkable.

No reference counterpart: flu-crew/octofludb has no tokenizer; this
is part of the training-data-pipeline surface the engine adds.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

MERGES_SCHEMA = T.StructType([
    T.StructField("step", T.IntegerType(), False),
    T.StructField("left", T.StringType(), False),
    T.StructField("right", T.StringType(), False),
    T.StructField("merged", T.StringType(), False),
    T.StructField("pair_count", T.LongType(), False),
])


def word_freq(docs: DataFrame) -> DataFrame:
    """(word, cnt) over single-space-tokenized text — the ONE
    corpus-wide pass BPE training needs (map-side partial agg)."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """One left-to-right non-overlapping greedy merge pass: fold the
    symbol array, replacing every adjacent (left, right) with
    left||right.  [a,a,a] with (a,a) -> [aa, a] — the same result a
    left-to-right string replace produces, which is what makes the
    trajectory SQL-oracle-able."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(docs: DataFrame, n_merges: int = 8,
              persist_every: int = 4) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    merge table as a list of dicts (step, left, right, merged,
    pair_count) — vocab metadata, inherently driver-sized (one row
    per merge; GPT-2's full table is 50k rows).

    Each round: adjacent-pair counts weighted by word frequency (one
    shuffle on the vocab-sized table), argmax by (count DESC, left,
    right) collected as ONE row, merge applied as a JVM fold.
    ``persist_every`` materializes the symbol table periodically so
    the lazy fold chain (one nested aggregate per round) never grows
    unboundedly deep."""
    wf = word_freq(docs)
    syms = wf.select(
        "cnt",
        F.split("word", "(?!$)").alias("syms"),
    )
    persisted = [syms.persist()]
    merges: list[dict] = []
    for step in range(n_merges):
        pairs = syms.select(
            "cnt",
            F.explode(F.zip_with(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            log.info("bpe_train: no adjacent pairs left after %d merges",
                     step)
            break
        l, r, c = top[0].l, top[0].r, int(top[0].c)
        merges.append({"step": step, "left": l, "right": r,
                       "merged": l + r, "pair_count": c})
        if step + 1 == n_merges:
            # the post-merge symbol table of the LAST round has no
            # consumer (the trajectory is already collected) — fold,
            # persist and count would materialize the deepest, most
            # expensive round for nothing
            break
        syms = syms.select("cnt", _apply_merge(F.col("syms"), l, r)
                           .alias("syms"))
        if (step + 1) % persist_every == 0:
            persisted.append(syms.persist())
            syms.count()  # materialize, truncating the fold lineage
            persisted.pop(0).unpersist()
    for df in persisted:
        df.unpersist()
    return merges


def merges_df(spark, merges: list[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (for gates / sinks)."""
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
         for m in merges],
        MERGES_SCHEMA,
    )


def bpe_word_tokens(docs: DataFrame, merges: list[dict]) -> DataFrame:
    """(word, n_tokens, tokens) for every DISTINCT word form: chars,
    then each learned merge applied in order (one JVM fold per merge
    — expression-tree application on the vocab-sized table; the
    corpus never re-tokenizes per occurrence)."""
    out = docs.select(F.explode(F.split("text", " ")).alias("word")) \
        .where(F.length("word") > 0).distinct() \
        .select("word", F.split("word", "(?!$)").alias("syms"))
    for m in merges:
        out = out.select(
            "word", _apply_merge(F.col("syms"), m["left"], m["right"])
            .alias("syms"))
    return out.select(
        "word",
        F.size("syms").cast("long").alias("n_tokens"),
        F.col("syms").alias("tokens"),
    )


def bpe_doc_token_counts(docs: DataFrame, merges: list[dict]) -> DataFrame:
    """(doc_id, n_tokens) after BPE encoding: every word occurrence
    joins the vocab-sized word->n_tokens table (broadcast-sized at
    any corpus scale where BPE is meaningful) and sums per doc."""
    wt = bpe_word_tokens(docs, merges).select("word", "n_tokens")
    occ = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.length("word") > 0)
    return (
        occ.join(F.broadcast(wt), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").cast("long").alias("n_tokens"))
    )


def bpe_vocab(docs: DataFrame, merges: list[dict]) -> DataFrame:
    """(token, token_id): base symbols (the corpus's distinct word
    characters, id'd in lexicographic order) followed by merged
    tokens in learned order — the GPT-2 vocabulary layout.  The
    global row_number runs over the VOCAB-sized distinct-char set
    (hundreds of rows), never the corpus."""
    from pyspark.sql import Window

    chars = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .select(F.explode(F.split("word", "(?!$)")).alias("token"))
        .distinct()
    )
    base = chars.withColumn(
        "token_id",
        (F.row_number().over(Window.orderBy("token")) - 1).cast("long"))
    n_base = base.count()
    spark = docs.sparkSession
    merged = spark.createDataFrame(
        [(m["merged"], n_base + m["step"]) for m in merges],
        "token string, token_id long")
    return base.unionByName(merged)


def bpe_encode_ids(docs: DataFrame, merges: list[dict]) -> DataFrame:
    """(doc_id, word_pos, tok_pos, token_id): every document encoded
    to vocabulary ids — the materialized form sequence packing /
    training loaders consume.  Vocab-first: merges fold over distinct
    word forms once (bpe_word_tokens), ids come from the broadcast
    vocab, and documents join on the word — the corpus itself is one
    posexplode + two broadcast joins, no per-occurrence re-encode."""
    wt = bpe_word_tokens(docs, merges).select(
        "word", F.posexplode("tokens").alias("tok_pos", "token"))
    vocab = bpe_vocab(docs, merges)
    # within a word, the same token string can repeat (tok_pos keys it)
    wt = wt.join(F.broadcast(vocab), "token").select(
        "word", "tok_pos", "token_id")
    occ = docs.select(
        "doc_id", F.posexplode(F.split("text", " "))
        .alias("word_pos", "word")).where(F.length("word") > 0)
    return (
        occ.join(F.broadcast(wt), "word")
        .select("doc_id", F.col("word_pos").cast("long"),
                F.col("tok_pos").cast("long"), "token_id")
    )
