"""Text-analysis operators over documents(doc_id, text, ...):
token counting, quality scoring, language-ID, fingerprinting.
All JVM-side expressions (whole-stage codegen); portable to the
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish token regex: word pieces, numbers, punctuation runs
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "dans"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "en", "por"],
}


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars_seen)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_seen"),
    )


def quality_scores(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality features + a composite score.  ``keep`` passes extra
    columns through (so compositions stay single-projection, no
    self-join on doc_id)."""
    words = F.split(F.trim("text"), r"\s+")
    n_words = F.size(words)
    n_punct = F.length("text") - F.length(
        F.regexp_replace("text", r"[^\w\s]", "")
    )
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(STOPWORDS["en"]))
    )
    base = docs.select(
        *keep,
        "doc_id",
        F.length("text").alias("n_chars_seen"),
        n_words.alias("n_words"),
        F.round(n_punct / F.greatest(F.length("text"), F.lit(1)), 5)
        .alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 5).alias("stop_ratio"),
        F.round(
            (F.length(F.regexp_replace("text", r"\s+", "")))
            / F.greatest(n_words, F.lit(1)),
            5,
        ).alias("mean_word_len"),
    )
    score = (
        F.when(F.col("n_words") >= 10, 0.25).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.25).otherwise(0.0)
        + F.when(F.col("stop_ratio") >= 0.05, 0.25).otherwise(0.0)
        + F.when((F.col("mean_word_len") >= 3)
                 & (F.col("mean_word_len") <= 12), 0.25).otherwise(0.0)
    )
    return base.withColumn("quality", F.round(score, 2))


def lang_id(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """Stopword-hit language heuristic: argmax of per-language hit
    counts with deterministic tie order en > de > fr > es; 'und' when
    all zero.  (doc_id, lang_pred).  ``keep`` passes extra columns
    through for single-projection compositions."""
    words = F.split(F.lower(F.trim("text")), r"\s+")

    def hit_count(sw):
        # single-arg lambda: a 2-arg lambda would make pyspark bind the
        # second parameter to the array INDEX
        return F.size(F.filter(words, lambda w: w.isin(sw)))

    hits = {lang: hit_count(sw) for lang, sw in STOPWORDS.items()}
    d = docs.select(*keep, "doc_id",
                    *[v.alias(f"h_{k}") for k, v in hits.items()])
    best = F.greatest(*[F.col(f"h_{k}") for k in STOPWORDS])
    pred = F.when(best == 0, "und")
    for k in STOPWORDS:  # dict order = tie order
        pred = pred.when(F.col(f"h_{k}") == best, k)
    return d.select(*keep, "doc_id", pred.alias("lang_pred"))


# ------------------------------------------------------------------
# hashed char-ngram language ID (the fastText shape): a BOUNDED
# weight table of hashed character n-grams, broadcast; scoring is one
# explode + broadcast join + integer sum-argmax.  The stopword
# lang_id above stays as the cheap heuristic; this is the documented
# production path — the model is top-M ngrams per language hashed
# into 16-bit buckets, so table size is fixed REGARDLESS of corpus
# size, and integer weights make scores exactly order-independent
# (portable to any engine, unlike float sums).

LANG_SEEDS = {
    "en": ("the quick brown fox jumps over the lazy dog and then it "
           "runs away with many other small things that people say "
           "every day in plain english text about the world they know"),
    "de": ("der schnelle braune fuchs springt ueber den faulen hund "
           "und dann laeuft er schnell weg mit vielen anderen kleinen "
           "dingen die die leute jeden tag ueber die welt sagen"),
    "fr": ("le rapide renard brun saute par dessus le chien paresseux "
           "et puis il s enfuit avec beaucoup d autres petites choses "
           "que les gens disent chaque jour sur le monde entier"),
    "es": ("el rapido zorro marron salta sobre el perro perezoso y "
           "luego se escapa con muchas otras cosas pequenas que la "
           "gente dice cada dia sobre el mundo que conocen"),
}

# held-out sample sentences (NOT the training seeds) for fixtures
LANG_SAMPLES = {
    "en": "this is a simple sentence that people write in english",
    "de": "dies ist ein einfacher satz den die leute schreiben koennen",
    "fr": "ceci est une phrase simple que les gens ecrivent souvent",
    "es": "esta es una frase sencilla que la gente escribe cada semana",
    "und": "12345 67890 24680 13579 00000 11111 99999 55555 33333",
}


def _char_ngrams(s: str, ns=(2, 3)) -> list[str]:
    return [s[i:i + n] for n in ns for i in range(len(s) - n + 1)]


def _hash_bucket_py(g: str) -> int:
    import hashlib

    return int(hashlib.md5(g.encode()).hexdigest()[:4], 16)


def hashed_lang_model(top_m: int = 300) -> list[tuple[int, str, int]]:
    """(bucket, lang, weight) rows: top-M char 2/3-grams per language
    from the seed texts, weight = round(1000 * log2(1 + count))
    (positive integer — association strength), md5-hashed into 2^16
    buckets with collisions summed.  Deterministic, bounded at
    |langs| * top_m rows whatever the corpus size."""
    import math
    from collections import Counter

    rows: dict[tuple[int, str], int] = {}
    for lang, seed in LANG_SEEDS.items():
        counts = Counter(_char_ngrams(seed))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_m]
        for g, c in top:
            w = int(round(1000 * math.log2(1 + c)))
            key = (_hash_bucket_py(g), lang)
            rows[key] = rows.get(key, 0) + w
    return sorted((b, l, w) for (b, l), w in rows.items())


MIN_GRAM_SCORE = 150  # 'und' floor: mean weight/gram below this is
# hash-collision noise (a true match averages >= ~300; a 16-bit
# bucket collision hits ~1% of grams at ~1000 each, so <= ~20)


def lang_id_hashed(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, score): argmax over summed hashed-ngram
    weights; 'und' when no ngram hits the table OR the mean weight
    per gram is under MIN_GRAM_SCORE (bucket collisions give
    out-of-model text a small spurious score — the confidence floor
    is integer arithmetic, exact on any engine).  Plan: map-side
    ngram explode -> md5 bucket (JVM) -> broadcast join against the
    fixed-size weight table -> one (doc, lang) integer sum -> per-doc
    argmax window over <= |langs| rows.  One real shuffle (the
    doc-keyed agg); the model never scales with the corpus."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    w_tbl = F.broadcast(spark.createDataFrame(
        hashed_lang_model(), "bucket int, lang string, weight long"))
    norm = F.concat_ws(" ", F.split(F.lower(F.trim("text")), r"\s+"))
    d = docs.select("doc_id", norm.alias("t"))

    def _gram_fn(n):
        # factory keeps the lambda SINGLE-arg: a default-arg lambda
        # has arity 2 and pyspark would bind it to the array INDEX
        return lambda i: F.col("t").substr(i, F.lit(n))

    grams = F.concat(*[
        F.when(F.length("t") >= n,
               F.transform(F.sequence(F.lit(1), F.length("t") - (n - 1)),
                           _gram_fn(n)))
        .otherwise(F.array().cast("array<string>"))
        for n in (2, 3)
    ])
    g = d.select("doc_id", F.explode(grams).alias("g"))
    scored = (
        g.select("doc_id",
                 F.conv(F.substring(F.md5("g"), 1, 4), 16, 10)
                 .cast("int").alias("bucket"))
        .join(w_tbl, "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum("weight").alias("score"))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc())
    best = (scored.withColumn("_rk", F.row_number().over(win))
            .where(F.col("_rk") == 1).drop("_rk"))
    n_grams = F.greatest(F.length("t") * 2 - 3, F.lit(0))
    return (
        d.select("doc_id", n_grams.alias("_ng"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("score").isNull()
                | (F.col("score") < MIN_GRAM_SCORE * F.col("_ng")),
                "und").otherwise(F.col("lang")).alias("lang_pred"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
        )
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the normalized word stream
    (lowercase, single-space).  (doc_id, fingerprint)."""
    norm = F.concat_ws(
        " ", F.split(F.lower(F.trim("text")), r"\s+")
    )
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def clean_corpus(docs: DataFrame, min_quality: float = 0.5,
                 langs: tuple = ("en",)) -> DataFrame:
    """End-to-end training-corpus cleaning (the composition a real
    data pipeline runs before tokenization): quality scoring ->
    quality filter -> language ID -> language filter -> exact dedup
    keeping the canonical (min doc_id) copy.

    Scale shape: everything before the dedup is ONE map-side
    projection chain (quality and language are per-row expressions;
    ``keep`` threading avoids any self-join on doc_id), so the only
    shuffle is the final hash-agg on the content digest — and the
    filters have already pruned its input.  Output:
    (doc_id, lang, quality, digest, n_dups)."""
    scored = quality_scores(docs, keep=("text",)) \
        .where(F.col("quality") >= min_quality) \
        .select("doc_id", "text", "quality")
    tagged = lang_id(scored, keep=("text", "quality")) \
        .where(F.col("lang_pred").isin(list(langs)))
    return (
        tagged.withColumn("digest", F.md5("text"))
        .groupBy("digest")
        .agg(
            F.min(F.struct("doc_id", "lang_pred", "quality")).alias("r"),
            F.count("*").alias("n_dups"),
        )
        .select(
            F.col("r.doc_id").alias("doc_id"),
            F.col("r.lang_pred").alias("lang"),
            F.col("r.quality").alias("quality"),
            "digest",
            F.col("n_dups").cast("long").alias("n_dups"),
        )
    )


def stratified_sample(docs: DataFrame, fractions: dict,
                      default: float = 0.0) -> DataFrame:
    """Deterministic per-language downsampling (training-mix
    rebalancing): a document is kept iff the first 16 bits of
    md5(doc_id) fall under its language's fraction — reproducible on
    any engine/cluster, no RNG state, map-side only (language is a
    per-row expression; the sample is a filter, never a shuffle).
    Output: (doc_id, lang, bucket16)."""
    tagged = lang_id(docs)
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                    16, 10).cast("long")
    thresh = F.lit(None).cast("double")
    expr = None
    for lang, frac in fractions.items():
        cond = F.col("lang_pred") == lang
        expr = F.when(cond, F.lit(frac)) if expr is None \
            else expr.when(cond, F.lit(frac))
    thresh = expr.otherwise(F.lit(default)) if expr is not None \
        else F.lit(default)
    return (
        tagged.withColumn("bucket16", bucket)
        .where(F.col("bucket16") < thresh * 65536)
        .select("doc_id", F.col("lang_pred").alias("lang"), "bucket16")
    )


def split_corpus(docs: DataFrame,
                 weights: tuple = (("train", 0.8), ("val", 0.1),
                                   ("test", 0.1))) -> DataFrame:
    """Deterministic train/val/test assignment: (doc_id, split).
    The first 24 bits of md5(doc_id) land in cumulative weight bands,
    so membership is stable under corpus growth (adding documents
    never moves an existing one between splits), identical on every
    engine, and RNG-free.  Map-side only."""
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
               16, 10).cast("long")
    total = float(sum(w for _, w in weights))
    expr = None
    acc = 0.0
    for name, w in weights:
        acc += w / total
        bound = int(acc * 16_777_216 + 0.5)
        cond = b < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = weights[-1][0]
    return docs.select("doc_id", expr.otherwise(F.lit(last)).alias("split"))


def top_quality_per_group(docs: DataFrame, key: str = "lang",
                          n: int = 100) -> DataFrame:
    """Curation selection: the best ``n`` documents per group by
    (quality desc, md5(doc_id) asc) — the md5 tiebreak makes the cut
    deterministic where quality ties (it always does: quality is a
    4-level rubric), without biasing toward low doc_ids.
    Output: (doc_id, grp, quality_micro, rank)."""
    from pyspark.sql import Window

    q = quality_scores(docs, keep=(key,))
    qm = F.floor(F.col("quality") * 1_000_000 + 0.5).cast("long")
    tb = F.md5(F.col("doc_id").cast("string"))
    win = Window.partitionBy(key).orderBy(qm.desc(), tb.asc())
    return (
        q.select("doc_id", F.col(key).alias("grp"),
                 qm.alias("quality_micro"),
                 F.row_number().over(win).cast("long").alias("rank"))
        .where(F.col("rank") <= n)
    )


def quality_weighted_sample(docs: DataFrame) -> DataFrame:
    """Quality-proportional downsampling: keep each document with
    probability equal to its quality score — the soft filter used
    when a hard threshold throws away too much borderline data.
    Deterministic: membership is the integer comparison
    md5-bucket * 10^6 < quality_micro * 2^24, so the sample is
    bit-identical on any engine with no RNG state.
    Output: (doc_id, quality_micro, bucket24).

    Map-side only — quality is a per-row expression and the sample is
    a filter; no shuffle anywhere."""
    q = quality_scores(docs)
    qm = F.floor(F.col("quality") * 1_000_000 + 0.5).cast("long")
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
               16, 10).cast("long")
    return (
        q.select("doc_id", qm.alias("quality_micro"),
                 b.alias("bucket24"))
        .where(F.col("bucket24") * 1_000_000
               < F.col("quality_micro") * F.lit(16_777_216))
    )


def corpus_profile(docs: DataFrame) -> DataFrame:
    """One-row corpus health profile — the numbers checked before any
    training run: doc/token counts, average length, language count,
    distinct-content count and the implied exact-dup fraction.  All
    derived values are integer arithmetic (micro-units via BIGINT
    floor division), so the row value-hash matches on any engine.

    Scale shape: ONE aggregation pass over the corpus (token counts
    are per-row expressions feeding the same agg; the two distinct
    counts are hash-agg distincts inside it).  No second scan, no
    driver-side math beyond the returned row."""
    toks = F.size(F.split("text", " "))
    return docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.expr("CAST(SUM(size(split(text, ' '))) * 1000000 "
               "DIV GREATEST(COUNT(*), 1) AS BIGINT)")
        .alias("avg_tokens_micro"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct(F.md5(F.col("text"))).cast("long")
        .alias("n_distinct"),
        F.expr("CAST((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000 "
               "DIV GREATEST(COUNT(*), 1) AS BIGINT)")
        .alias("dup_frac_micro"),
    )


def temperature_sample(docs: DataFrame, key: str = "lang",
                       alpha: float = 0.7,
                       target_frac: float = 0.5) -> DataFrame:
    """Temperature-based group rebalancing — the multilingual data-
    mixing step of LLM corpus construction: sample group g at a rate
    proportional to p_g^alpha (renormalized), so low-resource groups
    are up-weighted as alpha -> 0 while alpha = 1 preserves natural
    shares.  Expected kept fraction of the corpus is ``target_frac``
    (per-group rates are clamped at 1.0).

    Determinism: membership is an INTEGER comparison — the first 24
    bits of md5(doc_id) against a per-group fixed-point rate
    (b * 10^6 < rate_micro * 2^24), so the sample is bit-identical on
    any engine at any parallelism, with no RNG state to coordinate.

    Scale shape: one group-count agg (tiny), scalar N/Z from that
    aggregate (never a second corpus pass), a broadcast join of the
    group-count-sized rate table, and a map-side filter.
    Output: (doc_id, grp, n_g, rate_micro)."""
    stats = docs.groupBy(F.col(key).alias("grp")) \
        .agg(F.count("*").alias("n_g"))
    rows = stats.collect()  # group-count-sized: a handful of rows
    n = sum(r.n_g for r in rows)
    if n == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, grp string, n_g long, rate_micro long")
    z = sum((r.n_g / n) ** alpha for r in rows)
    rates = stats.select(
        "grp", "n_g",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(target_frac * n)
                * F.pow(F.col("n_g") / F.lit(float(n)), F.lit(alpha))
                / (F.lit(z) * F.col("n_g")),
            ) * 1_000_000 + 0.5
        ).cast("long").alias("rate_micro"),
    )
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
               16, 10).cast("long")
    return (
        docs.select("doc_id", F.col(key).alias("grp"),
                    b.alias("_b"))
        .join(F.broadcast(rates), "grp")
        .where(F.col("_b") * 1_000_000
               < F.col("rate_micro") * F.lit(16_777_216))
        .select("doc_id", "grp", F.col("n_g").cast("long").alias("n_g"),
                "rate_micro")
    )


# PII patterns (RE2-safe: no backrefs/lookaround, run on both engines)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+\d[\d-]{7,}\d"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction for a training corpus: (doc_id, n_emails, n_ips,
    n_phones, text_clean) with emails/IPv4s/phone numbers replaced by
    type tags.  Pure map-side regexp chain (JVM codegen, zero
    shuffles); the patterns avoid backreferences and lookaround so
    RE2-based engines (the DuckDB oracle; Hyperscan prefilters) run
    the SAME grammar.  Redaction order matters and is fixed:
    email -> ip -> phone (an email's host must not be half-eaten by
    the phone rule first)."""
    txt = F.col("text")
    counts = [
        F.size(F.regexp_extract_all(txt, F.lit(p), 0)).cast("long").alias(n)
        for p, n in ((PII_EMAIL, "n_emails"), (PII_IPV4, "n_ips"),
                     (PII_PHONE, "n_phones"))
    ]
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, PII_EMAIL, "<EMAIL>"),
            PII_IPV4, "<IP>"),
        PII_PHONE, "<PHONE>")
    return docs.select("doc_id", *counts, clean.alias("text_clean"))


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Intra-document repetition (the Gopher-rule quality family):
    (doc_id, top_word_frac, dup_2gram_frac).

    * top_word_frac — most-frequent-word share of all words: explode
      -> (doc_id, word) count (shuffle 1, map-side partial agg) ->
      per-doc max/sum (shuffle 2; both keyed on doc-granular keys so
      AQE coalesces tiny partitions).
    * dup_2gram_frac — 1 - distinct/total bigrams, computed ENTIRELY
      map-side from the word array (array_distinct over a transform);
      docs under 2 words score 0.0.
    """
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    exploded = words.select("doc_id", F.explode("w").alias("word"))
    wc = exploded.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    top = wc.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 5).alias("top_word_frac"))
    n2 = F.size("w") - 1
    grams = F.array_distinct(F.transform(
        F.slice("w", 1, F.greatest(n2, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at("w", (i + 2).cast("int"))),
    ))
    dup = words.select(
        "doc_id",
        F.when(n2 <= 0, F.lit(0.0)).otherwise(
            F.round(1 - F.size(grams) / n2, 5)).alias("dup_2gram_frac"),
    )
    return top.join(dup, "doc_id")


def chunk_documents(docs: DataFrame, window: int = 64,
                    stride: int = 48) -> DataFrame:
    """Fixed-window chunking with overlap — the packing precursor for
    LM training data: (doc_id, chunk_id, n_tokens, chunk_text), word
    windows of `window` tokens starting every `stride` (the final
    chunk may be short; every token is covered).

    Entirely map-side: chunk starts come from a per-row `sequence` +
    `transform` + `explode` — no shuffle, no Python, output rows ∝
    input tokens / stride.  At 100 TB this is the shape you want:
    chunking parallelism equals scan parallelism.

    The word array is materialized once per row behind a Generate
    barrier before the per-chunk lambda touches it — an expression
    captured INSIDE a higher-order-function lambda is re-evaluated
    per element (the split would run once per chunk: O(n^2/stride)
    token work on long documents)."""
    wdf = docs.select(
        "doc_id", F.explode(F.array(F.split("text", " "))).alias("w"))
    w = F.col("w")
    n = F.size(w)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - window) / F.lit(stride)).cast("int") + 1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(w, i * stride + 1, window).alias("toks"),
        ),
    )
    return (
        wdf.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.toks").cast("long").alias("n_tokens"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )


def unigram_logprob(docs: DataFrame, vocab_k: int = 50_000) -> DataFrame:
    """Corpus-LM quality signal (the unigram approximation of CCNet's
    perplexity filter): (doc_id, n_words, mean_logprob) where
    mean_logprob = mean over the doc's words of log2 P(w), P estimated
    from the corpus itself.

    Scale shape (the CCNet design): the LM is the TOP-``vocab_k``
    words by count — raw web text's space-split vocab is O(corpus)
    (URLs, misspellings), so an uncapped LM is not broadcastable; any
    out-of-vocab word scores the floor logprob log2(1/total).  One
    corpus pass builds the word counts (persisted, vocab-sized); the
    grand total is summed from those counts — NOT a second corpus
    scan — and the top-K falls out as a TakeOrderedAndProject
    (per-partition local top-K, driver merge; ties at the boundary
    broken by word asc for cross-engine determinism).  Scoring is the
    exploded words LEFT-joined broadcast against the K-bounded LM and
    one doc-keyed agg."""
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    counts = (words.groupBy("w").agg(F.count("*").alias("c"))).persist()
    try:
        total = float(counts.agg(F.sum("c")).first()[0] or 0.0)
        if total == 0.0:
            return docs.sparkSession.createDataFrame(
                [], "doc_id long, n_words long, mean_logprob double")
        # materialize the K-bounded LM on the driver (<= vocab_k rows
        # — this IS the broadcast table) so the returned plan carries
        # it as literal rows and needs exactly ONE corpus pass; the
        # counts cache then backs only the total + top-K jobs here
        lm_rows = (
            counts.orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(int(vocab_k))
            .select("w", F.log2(F.col("c") / F.lit(total)).alias("lp"))
            .collect()
        )
        lm = docs.sparkSession.createDataFrame(
            lm_rows, "w string, lp double")
        floor_lp = F.log2(F.lit(1.0) / F.lit(total))
        return (
            words.join(F.broadcast(lm), "w", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_words"),
                F.round(F.avg(F.coalesce(F.col("lp"), floor_lp)), 4)
                .alias("mean_logprob"),
            )
        )
    finally:
        counts.unpersist()


def bigram_logprob(docs: DataFrame, vocab_k: int = 50_000) -> DataFrame:
    """Bigram-LM fluency score with add-one smoothing — the next step
    up from ``unigram_logprob`` toward CCNet's KenLM filter:
    (doc_id, n_pairs, logprob_micro) where logprob_micro is the
    BIGINT sum over the doc's adjacent pairs of
    floor(ln((c12+1)/(c1+V)) * 1e6 + 0.5), with c12/c1 corpus bigram
    and context counts over a TOP-``vocab_k`` vocabulary (other
    tokens map to '<unk>') and V = |vocab| + 1.  Integer per-pair
    contributions make the summed score bit-identical on any engine
    at any parallelism.  Docs with < 2 tokens have no pairs and are
    absent.

    Scale shape: vocab mapping is a broadcast left join onto the
    exploded token stream; adjacency comes from one lead() window on
    (doc_id, pos) whose doc_id partitioning is REUSED by the final
    per-doc aggregation; the bigram/context tables are at most
    (K+1)^2 rows — broadcastable by construction."""
    from pyspark.sql import Window

    wx = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w"))
    counts = wx.groupBy("w").agg(F.count("*").alias("c"))
    lm = (counts.orderBy(F.col("c").desc(), F.col("w").asc())
          .limit(vocab_k).select("w").persist())
    n_vocab = lm.count()
    mx = (
        wx.join(F.broadcast(lm.withColumn("_in", F.lit(1))), "w", "left")
        .select(
            "doc_id", "i",
            F.when(F.col("_in").isNotNull(), F.col("w"))
            .otherwise(F.lit("<unk>")).alias("mw"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("i")
    pairs = (
        mx.withColumn("w2", F.lead("mw").over(win))
        .where(F.col("w2").isNotNull())
        .select("doc_id", F.col("mw").alias("w1"), "w2")
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = float(n_vocab + 1)
    try:
        return (
            pairs.join(F.broadcast(c12), ["w1", "w2"])
            .join(F.broadcast(c1), "w1")
            .select(
                "doc_id",
                F.floor(
                    F.log((F.col("c12") + 1.0) / (F.col("c1") + F.lit(v)))
                    * 1_000_000 + 0.5
                ).cast("long").alias("lp"),
            )
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.sum("lp").cast("long").alias("logprob_micro"))
        )
    finally:
        lm.unpersist()


def bm25_scores(docs: DataFrame, query_terms: list[str],
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 relevance of every document to a term query:
    (doc_id, n_hits, score) for docs matching >= 1 term.

    Scale shape: the term filter runs BEFORE the explode's output is
    shuffled (non-matching tokens die map-side), so the one hash-agg
    shuffle carries only |matching tokens| rows; df/N/avgdl are
    three scalar-sized aggregates (df over |terms| rows; N and avgdl
    fused in one pass over doc lengths, never the token stream).
    Per-term contributions are fixed-point BIGINTs (floor(x*1e5+0.5))
    before the final sum — integer sums are order-independent, so the
    score is bit-identical on any engine at any parallelism."""
    terms = [str(t) for t in query_terms]
    n_avg = docs.select(
        F.count("*").alias("n"),
        F.avg(F.size(F.split("text", " "))).alias("avgdl")).first()
    n_docs, avgdl = int(n_avg["n"]), float(n_avg["avgdl"] or 0.0)
    if n_docs == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, n_hits long, score double")
    words = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("w"),
    ).where(F.col("w").isin(terms))
    tf = words.groupBy("doc_id", "w").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl"))
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "w")
        .select(
            "doc_id",
            F.floor(
                F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                      / (F.col("df") + 0.5) + 1.0)
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf")
                   + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
                * 100000 + 0.5
            ).cast("long").alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"),
             (F.sum("c") / 100000.0).alias("score"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf:
    (doc_id, term, tf, tfidf_micro, rank).  ``tfidf_micro`` is the
    fixed-point BIGINT floor(tf * ln(N/df) * 1e6 + 0.5), so both the
    scores and the (tfidf desc, term asc) ranking are bit-identical
    on any engine — a float score would make rank ties
    engine-dependent.

    Scale shape: one token hash-agg (map-side partial combine), a
    vocab-sized df agg broadcast back onto it, and one window over
    doc_id for the top-k — the window input is |doc x distinct term|
    rows, already aggregated, never the raw token stream."""
    from pyspark.sql import Window

    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id", "term", F.col("tf").cast("long").alias("tf"),
            F.floor(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
                * 1_000_000 + 0.5
            ).cast("long").alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def pmi_bigrams(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs over the
    corpus — the classic collocation / phrase-mining signal:
    (w1, w2, n_xy, pmi) for pairs with n_xy >= min_count, where
    pmi = log2( (n_xy / N_pairs) / (P(w1) * P(w2)) ) and P(w) is the
    unigram distribution.

    Scale shape: bigram pairs are generated map-side (JVM transform
    over the word array), pair and unigram counts are each ONE
    hash-agg with partial combine, and the two probability joins run
    on the already-aggregated vocab-sized tables (AQE picks broadcast
    when they fit).  The totals are sums of those aggregates, not
    extra corpus scans."""
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = words.select(
        F.explode(
            F.transform(idx, lambda i: F.struct(
                F.element_at("w", i).alias("w1"),
                F.element_at("w", (i + 1).cast("int")).alias("w2"),
            ))
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = (
        words.select(F.explode("w").alias("t"))
        .groupBy("t").agg(F.count("*").alias("n"))
    )
    # both totals come from ONE doc-level length scan (no explode, no
    # vocab materialization): N_words = sum |w|, N_pairs = sum |w|-1
    sizes = docs.select(F.size(F.split("text", " ")).alias("s"))
    tot = sizes.agg(
        F.sum("s").alias("nw"),
        F.sum(F.greatest(F.col("s") - 1, F.lit(0))).alias("np")).first()
    n_words, n_pairs = int(tot["nw"] or 0), int(tot["np"] or 0)
    if n_words == 0 or n_pairs == 0:
        return docs.sparkSession.createDataFrame(
            [], "w1 string, w2 string, n_xy long, pmi double")
    pc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_xy")) \
        .where(F.col("n_xy") >= min_count)
    u1 = uni.select(F.col("t").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("n").alias("n2"))
    return (
        pc.join(u1, "w1").join(u2, "w2")
        .select(
            "w1", "w2", F.col("n_xy").cast("long").alias("n_xy"),
            # + 0.0 normalizes IEEE -0.0 (round can produce it) so
            # external engines hash identically
            (F.round(
                F.log2(
                    (F.col("n_xy") / F.lit(float(n_pairs)))
                    / ((F.col("n1") / F.lit(float(n_words)))
                       * (F.col("n2") / F.lit(float(n_words))))
                ), 4) + F.lit(0.0)).alias("pmi"),
        )
    )


# ------------------------------------------------------------------
# C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the
# Limits of Transfer Learning", public) and Gopher/MassiveText
# document-quality rules (Rae et al. 2021, public).  Both are pure
# per-row JVM expression chains — no shuffle, no UDF — so they cost
# one map pass at any corpus size and every rule is portable to the
# DuckDB oracle verbatim.

C4_MIN_LINE_WORDS = 5
C4_MIN_LINES = 3
# substrings whose presence drops a LINE (C4 drops javascript lines
# and brace-bearing boilerplate) or the whole DOC (lorem ipsum)
C4_LINE_BAD = ("javascript", "{")
C4_DOC_BAD = "lorem ipsum"


def c4_clean(docs: DataFrame,
             min_line_words: int = C4_MIN_LINE_WORDS,
             min_lines: int = C4_MIN_LINES) -> DataFrame:
    """C4 cleaning over newline-separated documents: a LINE survives
    iff it has >= ``min_line_words`` space-separated words, ends in a
    terminal punctuation mark ('.', '!', '?', '\"'), and contains no
    '{' / 'javascript'; a DOCUMENT is kept iff >= ``min_lines`` lines
    survive and it never says 'lorem ipsum'.  Output
    (doc_id, n_lines, n_kept, keep, clean_text) where clean_text is
    the surviving lines re-joined with newlines.

    Scale shape: one projection — the line rules run inside a single
    array ``filter`` over ``split(text, '\\n')``, entirely within
    whole-stage codegen.  Every sub-expression is a function of the
    lambda variable only (nothing captured), so there is no
    per-element re-evaluation blowup (see chunk_documents' pitfall
    note)."""
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), "\n")

    def line_ok(line):
        ok = (F.size(F.split(line, " ")) >= min_line_words) \
            & line.rlike('[.!?"]$')
        for bad in C4_LINE_BAD:
            ok = ok & ~F.lower(line).contains(bad)
        return ok

    kept = F.filter(lines, line_ok)
    doc_keep = (F.size(kept) >= min_lines) \
        & ~F.lower(F.coalesce(F.col("text"), F.lit(""))).contains(C4_DOC_BAD)
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.when(doc_keep, 1).otherwise(0).cast("long").alias("keep"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText document-quality rules (word-level subset —
    the driver corpus is single-line so the bullet/ellipsis line
    rules are vacuous here and omitted): keep iff
      50 <= n_words <= 100000,
      3 <= mean word length <= 10,
      symbol-to-word ratio ('#' or '...') < 0.1,
      >= 80% of words contain an alphabetic character,
      >= 2 hits from a tiny required-stopword set.
    Output (doc_id, n_words, mean_word_len, frac_alpha, symbol_ratio,
    stop_hits, keep) — all rule inputs emitted so a user can audit
    WHY a document fell.  One map-side projection, no shuffle."""
    text = F.coalesce(F.col("text"), F.lit(""))
    words = F.split(F.trim(text), " ")
    n_words = F.size(words)
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(list(GOPHER_STOPWORDS))))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#")))
    n_ell = (F.length(text)
             - F.length(F.replace(text, F.lit("...")))) / 3
    d = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(F.length(F.replace(text, F.lit(" ")))
                / F.greatest(n_words, F.lit(1)), 5).alias("mean_word_len"),
        F.round(n_alpha / F.greatest(n_words, F.lit(1)), 5)
        .alias("frac_alpha"),
        F.round((n_hash + n_ell) / F.greatest(n_words, F.lit(1)), 5)
        .alias("symbol_ratio"),
        n_stop.cast("long").alias("stop_hits"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("frac_alpha") >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return d.withColumn("keep",
                        F.when(keep, 1).otherwise(0).cast("long"))


def perplexity_buckets(docs: DataFrame, vocab_k: int = 50_000,
                       buckets: int = 3) -> DataFrame:
    """CCNet-style perplexity bucketing: per-language NTILE over the
    unigram-LM quality score — bucket 1 ('head') is the lowest-
    perplexity (highest mean logprob) third, then 'middle', 'tail'.
    Output (doc_id, lang, mean_logprob, bucket, label).

    Determinism: the window orders by (mean_logprob DESC, doc_id ASC)
    on the 4-dp-rounded score, so bucket boundaries are identical on
    any engine at any parallelism.  Scale shape: the LM scoring is
    unigram_logprob's single corpus pass + broadcast LM; the bucket
    assignment is one window over doc-count rows partitioned by
    language — the shuffle is keyed on lang, and the per-language
    sort is the unavoidable cost of exact quantiles (CCNet itself
    trains per-language percentile cutoffs the same way)."""
    from pyspark.sql import Window

    lp = unigram_logprob(docs, vocab_k=vocab_k)
    tagged = docs.select("doc_id", "lang").join(lp, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_logprob").desc(), F.col("doc_id").asc())
    labels = {1: "head", buckets: "tail"}
    b = F.ntile(buckets).over(w)
    return tagged.select(
        "doc_id", "lang", "mean_logprob",
        b.cast("long").alias("bucket"),
    ).withColumn(
        "label",
        F.when(F.col("bucket") == 1, labels[1])
        .when(F.col("bucket") == buckets, labels[buckets])
        .otherwise("middle"),
    )


# ------------------------------------------------------------------
# URL canonicalization + URL-keyed dedup — the first dedup layer of
# public web-corpus pipelines (CCNet dedups by URL before content):
# pure regex/array expressions, identical in the DuckDB oracle.

from octofludb_spark.scale.urlnorm import (  # noqa: E402  (re-export)
    URL_TRACKING_RE,
    url_canonicalize,
)


def url_normalize(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Dedup-layer URL canonicalization — delegates to the unified
    ``urlnorm.url_canonicalize(mode="dedup")`` (see that module for
    the convention).  Adds ``url_norm``; all other columns pass
    through.  One map-side projection — no shuffle, no UDF."""
    return url_canonicalize(docs, url_col, mode="dedup")


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-keyed exact dedup over normalized URLs: one hash-agg on
    url_norm; the canonical survivor is the MIN doc_id.  Output
    (doc_id, url_norm, n_dups, keep) for every input row."""
    normed = url_normalize(docs, url_col).select("doc_id", "url_norm")
    stats = normed.groupBy("url_norm").agg(
        F.min("doc_id").alias("canon"),
        F.count("*").cast("long").alias("n_dups"))
    return (
        normed.join(stats, "url_norm")
        .select("doc_id", "url_norm", "n_dups",
                (F.col("doc_id") == F.col("canon")).cast("long")
                .alias("keep"))
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — shift-invariant dedup units
# ---------------------------------------------------------------------------

def cdc_chunks(docs: DataFrame, boundary_nibble: str = "0") -> DataFrame:
    """Content-defined chunking at word granularity: a word TERMINATES
    its chunk when the last hex nibble of md5(word) equals
    ``boundary_nibble`` (P = 1/16, so the expected chunk is 16 words).
    Returns (doc_id, chunk_idx, n_words, digest) — one row per chunk,
    ``digest`` = md5 of the space-joined chunk text.

    This is the LBFS/rsync content-defined-chunking idea applied to
    training text: because boundaries depend only on LOCAL content,
    inserting or deleting a prefix re-synchronizes the chunk stream
    after the next boundary — chunk digests from two shifted
    near-copies re-align, where fixed-width windows (chunk_documents)
    never re-align.  The classic production rolling hash (Rabin/buzhash
    over bytes) is an incremental-evaluation trick for the SAME
    semantics: the boundary test here is a pure function of one word,
    so the relational form stays engine-checkable.

    Scale shape: the boundary flag and word positions are computed
    map-side (posexplode of the split array, one md5 per word);
    chunk_idx is a running sum over (doc_id, pos) — ONE shuffle on
    doc_id — and the chunk re-assembly groups on (doc_id, chunk_idx),
    a second keyed exchange.  Both keys are document-local so no
    global hotspot exists: skew is bounded by the longest document,
    exactly like chunk_documents."""
    from pyspark.sql import Window

    w = docs.select(
        "doc_id",
        F.posexplode(F.split(F.coalesce("text", F.lit("")), " "))
        .alias("pos", "word"),
    ).withColumn(
        "bnd",
        (F.substring(F.md5("word"), 32, 1) == boundary_nibble).cast("int"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    chunked = w.withColumn(
        "chunk_idx", (F.sum("bnd").over(win) - F.col("bnd")).cast("long")
    )
    return (
        chunked.groupBy("doc_id", "chunk_idx")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "word"))),
                        lambda s: s["word"],
                    ),
                    " ",
                )
            ).alias("digest"),
        )
    )


def cdc_duplicate_chunks(docs: DataFrame,
                         boundary_nibble: str = "0") -> DataFrame:
    """Cross-document duplicate CDC chunks: (digest, n_docs, n_copies,
    canonical_doc_id, n_words) for every chunk digest appearing in
    MORE THAN ONE document.  The shift-invariance of cdc_chunks makes
    this catch quote/excerpt duplication that fixed-window chunk
    digests miss whenever the copy starts mid-window.

    Scale shape: one hash-agg on digest after the chunker — the
    duplicate-chunk dictionary is the output, never the corpus."""
    ch = cdc_chunks(docs, boundary_nibble)
    return (
        ch.groupBy("digest")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.min("n_words").alias("n_words"),
        )
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Inverted index (capped postings)
# ---------------------------------------------------------------------------

def inverted_index(docs: DataFrame, max_postings: int = 20,
                   min_df: int = 1) -> DataFrame:
    """Posting-list construction: (term, df, cf, postings) where df =
    distinct documents containing the term, cf = total occurrences,
    and ``postings`` is the FIRST ``max_postings`` doc_ids ascending,
    comma-joined.  ``min_df`` drops the long hapax tail from the
    output (df/cf are still exact).

    Scale shape: term frequencies are plain map-side-combined
    hash-aggs (no lists ever materialize for them).  The posting cap
    is enforced by a rank WINDOW over (term ORDER BY doc_id) BEFORE
    any list is built, so a stopword appearing in 10^9 documents
    contributes max_postings rows to the collect — not 10^9 (the
    window itself streams with spill; a production index would shard
    postings into fixed-size segment rows the same way, this is the
    head segment).  Three aggs share the shuffle key ``term`` so AQE
    coalesces them onto one exchange footprint."""
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("term"),
    ).where(F.col("term") != "")
    cf = tok.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    pairs = tok.select("term", "doc_id").distinct()
    df = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    rk = pairs.withColumn(
        "r", F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    ).where(F.col("r") <= max_postings)
    post = rk.groupBy("term").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("doc_id"))),
                        lambda s: s["doc_id"].cast("string")),
            ",",
        ).alias("postings")
    )
    out = df.join(cf, "term").join(post, "term")
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out.select("term", "df", "cf", "postings")


def pack_sequences(docs: DataFrame, context_len: int = 2048,
                   n_ranges: int | None = None) -> DataFrame:
    """GPT-style sequence packing (concat-then-chunk): documents are
    laid end to end in doc_id order — each contributing its
    whitespace token count plus ONE separator token (the
    <|endoftext|> convention) — and the resulting token stream is cut
    into fixed ``context_len`` windows.  Output: one row per
    (window_id, doc) overlap with the doc-relative token slice —
    (window_id, doc_id, tok_start, tok_end, n_tokens) — exactly the
    manifest a training loader needs to materialize packed examples.

    Scale shape — the naive SUM() OVER (ORDER BY doc_id) is a
    single-task global sort, so the running offset is a TWO-PHASE
    distributed prefix scan instead: deterministic range buckets from
    the doc_id span (width_bucket — no sampled RangePartitioner, so
    re-evaluation can never reshuffle rows), per-bucket token totals
    (one bucket-count-sized aggregation collected to the driver),
    python prefix-sum of the bucket offsets broadcast back, and a
    per-bucket window for the local cumsum.  Every stage is bounded:
    driver traffic is n_ranges rows, window state is one bucket.
    The window explode is an in-row sequence() — one output row per
    overlap, never a corpus x windows join."""
    if context_len < 1:
        raise ValueError("context_len must be >= 1")
    spark = docs.sparkSession
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        (F.size(F.filter(F.split("text", " "),
                         lambda x: x != F.lit(""))) + 1)
        .cast("long").alias("length"),
    )
    bounds = toks.agg(F.min("doc_id").alias("lo"),
                      F.max("doc_id").alias("hi")).collect()[0]
    if bounds.lo is None:
        return spark.createDataFrame(
            [], "window_id long, doc_id long, tok_start long, "
                "tok_end long, n_tokens long")
    p = n_ranges or max(spark.sparkContext.defaultParallelism, 1)
    # width_bucket is end-exclusive on hi: stretch by 1 so hi lands
    # in bucket p, and collapse the degenerate lo == hi span
    toks = toks.withColumn(
        "pid", F.width_bucket("doc_id", F.lit(bounds.lo),
                              F.lit(bounds.hi + 1), F.lit(p)))
    per = {r.pid: r.tot for r in
           toks.groupBy("pid").agg(F.sum("length").alias("tot")).collect()}
    acc, offsets = 0, {}
    for pid in sorted(per):
        offsets[pid] = acc
        acc += per[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("pid"))
    w = Window.partitionBy("pid").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    spans = toks.select(
        "doc_id", "length",
        (off + F.sum("length").over(w)).alias("end"),
    ).select("doc_id", "length", (F.col("end") - F.col("length"))
             .alias("start"), "end")
    c = F.lit(context_len)
    win = spans.select(
        "doc_id", "length", "start",
        F.explode(F.sequence(
            F.floor(F.col("start") / c),
            F.floor((F.col("end") - 1) / c),
        )).alias("window_id"),
    )
    tok_start = F.greatest(F.lit(0), F.col("window_id") * c - F.col("start"))
    tok_end = F.least(F.col("length"),
                      (F.col("window_id") + 1) * c - F.col("start"))
    return win.select(
        F.col("window_id").cast("long"),
        "doc_id",
        tok_start.cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
        (tok_end - tok_start).cast("long").alias("n_tokens"),
    )


def shard_shuffle(items: DataFrame, n_shards: int = 64, seed: int = 0,
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle + sharding of training examples —
    the step after packing that breaks corpus order before the
    training loader reads shards sequentially.  Each item's shuffle
    key is md5(seed:id): the shard is the key's first 24 bits mod
    n_shards and the position is the rank within the shard by (key,
    id).  RNG-free and engine-independent, stable under re-runs, and
    changing ``seed`` yields an unrelated permutation.

    Scale shape: one hash projection (map-side) + ONE shard-keyed
    exchange funding the per-shard rank window — state is one shard,
    never a global sort.  Pick n_shards ~ O(corpus bytes / 1 GB) in
    production so shards stay loader-sized.  Output: (id, shard,
    pos)."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.md5(F.concat(F.lit(f"{seed}:"),
                         F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(key, 1, 6), 16, 10).cast("long")
             % F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return (items.select(id_col, shard.alias("shard"), key.alias("_k"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_k"))


def mix_epochs(docs: DataFrame, weights: dict[str, int],
               key: str = "lang") -> DataFrame:
    """Static data-mixture application with multi-epoching (the
    DoReMi/Pile-style "domain weights -> per-document repeat counts"
    step): given INTEGER domain weights, each domain d receives a
    token target of total_tokens * w_d // sum(w) and every document
    in d appears  n_base = target // domain_tokens  times, plus one
    extra epoch for the md5-ordered document prefix whose running
    token total fits in the remainder — so the realized token count
    per domain lands within one document of the target, with pure
    integer arithmetic an external engine can replay exactly.

    Output: one row per (doc_id, domain, epoch, n_tok); documents in
    zero-weight (or absent-from-``weights``) domains are dropped —
    that IS the mixture filter.

    Scale shape: one token-count projection, one domain-sized
    aggregation collected to the driver (|domains| rows), broadcast
    back as literal maps, and a per-domain cumsum window (the same
    per-language window shape as perplexity_buckets); the epoch
    explode is an in-row sequence().  Driver traffic is bounded by
    the domain count, never the corpus."""
    from pyspark.sql import Window

    if not weights or any(int(v) != v or v < 0 for v in weights.values()):
        raise ValueError("weights must be non-negative integers")
    wsum = sum(int(v) for v in weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum > 0")

    toks = docs.select(
        "doc_id", F.col(key).alias("domain"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_tok"))
    per = {r["domain"]: r["td"] for r in
           toks.groupBy("domain").agg(F.sum("n_tok").alias("td"))
           .collect()}
    total = sum(per.values())
    n_base, rem = {}, {}
    for d, td in per.items():
        wd = int(weights.get(d, 0))
        if wd == 0 or td == 0:
            continue
        target = total * wd // wsum
        n_base[d], rem[d] = target // td, target % td
    if not n_base:
        return toks.sparkSession.createDataFrame(
            [], "doc_id long, domain string, epoch long, n_tok long")

    def lit_map(m: dict) -> F.Column:
        return F.create_map(*[F.lit(x) for d in sorted(m)
                              for x in (d, m[d])])

    w = (Window.partitionBy("domain")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    t = (toks.where(F.col("domain").isin(*n_base))
         .withColumn("cum_before",
                     F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
         .withColumn("n_epochs",
                     F.element_at(lit_map(n_base), F.col("domain"))
                     + F.when(F.col("cum_before")
                              < F.element_at(lit_map(rem), F.col("domain")),
                              1).otherwise(0)))
    return (t.where(F.col("n_epochs") > 0)
            .select("doc_id", "domain",
                    F.explode(F.sequence(
                        F.lit(0).cast("long"),
                        (F.col("n_epochs") - 1).cast("long")))
                    .alias("epoch"),
                    "n_tok"))


# --------------------------------------------------------------------------
# HTML -> text extraction (WET-style boilerplate stripping)
# --------------------------------------------------------------------------

# RE2-safe grammar (no backreferences, no lookaround) so the DuckDB
# oracle and Hyperscan-style prefilters run the SAME patterns.
HTML_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
HTML_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
HTML_COMMENT_RE = r"(?s)<!--.*?-->"
HTML_TAG_RE = r"(?s)<[^>]*>"
HTML_LINK_RE = r"(?i)<a[\s>]"

# fixed decode order; '&amp;' LAST (standard single-pass entity
# decoding: '&amp;lt;' becomes '&lt;' literally, same in any engine).
HTML_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                 ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def html_extract(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """Main-content extraction from raw HTML — the first stage of
    every web-crawl training pipeline (Common Crawl WARC -> WET):
    script/style/comment blocks removed, tags stripped, the six
    core character entities decoded, whitespace collapsed.

    Output: (doc_id, text_clean, n_links, n_chars_clean).

    Scale shape: a pure map-side regexp/replace projection — zero
    shuffles, whole-stage codegen; at 100 TB this pass is IO-bound,
    exactly as it should be.  The grammar is RE2-safe: script/style
    bodies use non-greedy repetition instead of a backreference, so
    the same regexes run verbatim on RE2 engines (the DuckDB oracle).
    """
    h = F.col(html_col)
    n_links = F.size(F.regexp_extract_all(h, F.lit(HTML_LINK_RE), 0)) \
        .cast("long").alias("n_links")
    s = F.regexp_replace(h, HTML_SCRIPT_RE, " ")
    s = F.regexp_replace(s, HTML_STYLE_RE, " ")
    s = F.regexp_replace(s, HTML_COMMENT_RE, " ")
    s = F.regexp_replace(s, HTML_TAG_RE, " ")
    for ent, rep in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return docs.select(
        "doc_id", n_links, s.alias("text_clean"),
        F.length(s).cast("long").alias("n_chars_clean"),
    )


def naive_bayes_classify(docs: DataFrame, label_col: str = "lang",
                         vocab_k: int = 2000,
                         train_frac: float = 0.8) -> DataFrame:
    """Multinomial Naive Bayes text classifier, trained AND applied in
    one relational plan — the fastText/CCNet-style supervised curation
    primitive (quality/language/domain classifiers that decide what
    enters a training corpus).  Returns the HELD-OUT split scored:
    (doc_id, label, pred, score_micro) where label is the true
    ``label_col``, pred the argmax class, and score_micro the winning
    class's integer-micro log-posterior (add-one smoothing, OOV token
    '<unk>').

    Determinism: the train/test split is the first-24-bits-of-md5
    band used by ``split_corpus`` (stable under corpus growth,
    RNG-free); per-token log-likelihoods are floor(ln(x)*1e6 + 0.5)
    BIGINTs (the ``bigram_logprob`` discipline) so summed scores are
    bit-identical on any engine at any parallelism; argmax ties break
    by class name asc; the top-``vocab_k`` vocabulary boundary breaks
    ties by word asc.

    Scale shape: ONE pass over the exploded train tokens builds the
    vocab counts (top-K via TakeOrderedAndProject) and one keyed agg
    the (class, word) table; the weight matrix is a CROSS JOIN of two
    bounded dims — L classes x (K+1) vocab rows — left-joined onto the
    observed counts so classes that never saw a word still carry its
    smoothed weight.  Scoring joins the exploded test tokens against
    the BROADCAST weight matrix (the standard L-times token blowup, L
    tiny) and funds exactly one (doc_id, class) aggregation; priors
    attach by broadcast after the agg.  Nothing in the plan grows
    faster than tokens x classes.
    """
    band = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                              1, 6), 16, 10).cast("long")
    bound = int(train_frac * 16_777_216 + 0.5)
    words = docs.select(
        "doc_id", F.col(label_col).alias("label"),
        (band < F.lit(bound)).alias("is_train"),
        F.explode(F.split("text", " ")).alias("w"))

    # materialize the K-bounded vocabulary on the driver (<= vocab_k
    # rows — this IS the broadcast table, the unigram_logprob
    # discipline) so the returned plan carries it as literal rows and
    # the train tokens are scanned once here, once in the agg below
    vocab_rows = [(r[0],) for r in
                  (words.where("is_train").groupBy("w")
                   .agg(F.count("*").alias("c"))
                   .orderBy(F.col("c").desc(), F.col("w").asc())
                   .limit(int(vocab_k))
                   .select("w").collect())]
    vocab = docs.sparkSession.createDataFrame(
        vocab_rows, "w string") if vocab_rows else \
        docs.sparkSession.createDataFrame([], "w string")
    v_smooth = float(len(vocab_rows) + 1)   # '<unk>' joins the event space

    mapped = (words
              .join(F.broadcast(vocab.withColumn("_in", F.lit(1))),
                    "w", "left")
              .select("doc_id", "label", "is_train",
                      F.when(F.col("_in").isNotNull(), F.col("w"))
                      .otherwise(F.lit("<unk>")).alias("mw")))

    cw = (mapped.where("is_train").groupBy("label", "mw")
          .agg(F.count("*").alias("c_lw")))
    cl = cw.groupBy("label").agg(F.sum("c_lw").alias("c_l"))
    classes = cl.select(F.col("label").alias("cand"), "c_l")
    event_space = vocab.select("w").unionByName(
        docs.sparkSession.createDataFrame([("<unk>",)], ["w"]))
    weights = (classes.crossJoin(event_space)
               .join(F.broadcast(cw), (F.col("cand") == cw["label"])
                     & (F.col("w") == cw["mw"]), "left")
               .select(
                   "cand", F.col("w").alias("mw"),
                   F.floor(F.log((F.coalesce(F.col("c_lw"), F.lit(0))
                                  + F.lit(1.0))
                                 / (F.col("c_l") + F.lit(v_smooth)))
                           * 1_000_000 + 0.5)
                   .cast("long").alias("lp")))

    n_train = (docs.where(band < F.lit(bound))
               .groupBy(F.col(label_col).alias("cand"))
               .agg(F.count("*").alias("n_l")))
    total = n_train.agg(F.sum("n_l")).first()[0] or 0
    if total == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, label string, pred string, "
                "score_micro long")
    priors = n_train.select(
        "cand",
        F.floor(F.log(F.col("n_l") / F.lit(float(total)))
                * 1_000_000 + 0.5).cast("long").alias("prior"))

    from pyspark.sql import Window
    scored = (mapped.where(~F.col("is_train"))
              .join(F.broadcast(weights), "mw")
              .groupBy("doc_id", "label", "cand")
              .agg(F.sum("lp").alias("s"))
              .join(F.broadcast(priors), "cand")
              .select("doc_id", "label", "cand",
                      (F.col("s") + F.col("prior")).alias("score")))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand").asc())
    out = (scored.withColumn("_rn", F.row_number().over(win))
           .where(F.col("_rn") == 1)
           .select("doc_id", "label", F.col("cand").alias("pred"),
                   F.col("score").cast("long").alias("score_micro")))
    return out


def dsir_scores(docs: DataFrame, target: DataFrame,
                n_buckets: int = 65536) -> DataFrame:
    """DSIR-style importance scores for domain-targeted data selection
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): hashed unigram features, per-feature
    log-ratio between the TARGET domain sample's distribution and the
    raw corpus distribution, documents scored by the sum of their
    tokens' ratios — (doc_id, n_tokens, dsir_micro).  A positive
    score means "looks more like the target than like the corpus".

    Determinism: features hash by the md5-16-bit convention
    (bucket = first 4 hex of md5(word) mod n_buckets); ratios are
    add-one-smoothed and stored as floor(ln(pt/ps)*1e6 + 0.5) BIGINTs
    (the bigram_logprob discipline), so summed scores are
    bit-identical on any engine at any parallelism.

    Scale shape: ONE pass over the exploded corpus tokens funds both
    the per-bucket source counts and (reused) the scoring join; the
    target sample is small by contract (a domain exemplar set).  The
    ratio table is bounded by ``n_buckets`` — broadcast by
    construction — and scoring is one broadcast join + one doc-keyed
    agg.  Nothing here grows with vocabulary: hashing fixes the
    feature space, which is the entire point of DSIR at web scale."""
    def bucket(col):
        return (F.conv(F.substring(F.md5(col), 1, 4), 16, 10)
                .cast("long") % F.lit(int(n_buckets)))

    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w"))
    src = (words.groupBy(bucket(F.col("w")).alias("b"))
           .agg(F.count("*").alias("cs")))
    tgt = (target.select(F.explode(F.split("text", " ")).alias("w"))
           .groupBy(bucket(F.col("w")).alias("b"))
           .agg(F.count("*").alias("ct")))
    n_src = src.agg(F.sum("cs")).first()[0] or 0
    n_tgt = tgt.agg(F.sum("ct")).first()[0] or 0
    if n_src == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, n_tokens long, dsir_micro long")
    bsz = float(n_buckets)
    ratio = (src.join(tgt, "b", "left")
             .select("b", F.floor(
                 (F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                        / F.lit(float(n_tgt) + bsz))
                  - F.log((F.col("cs") + 1.0)
                          / F.lit(float(n_src) + bsz)))
                 * 1_000_000 + 0.5).cast("long").alias("r_micro")))
    return (words
            .select("doc_id", bucket(F.col("w")).alias("b"))
            .join(F.broadcast(ratio), "b")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum("r_micro").cast("long").alias("dsir_micro")))


def dsir_select(docs: DataFrame, target: DataFrame, n: int,
                n_buckets: int = 65536) -> DataFrame:
    """The selection face: the ``n`` highest-importance documents
    (score desc, doc_id asc) — a TakeOrderedAndProject (per-partition
    local top-N, driver merge), the right shape for a selection list;
    use NTILE-style banding instead when the keep-set itself must
    stay distributed."""
    s = dsir_scores(docs, target, n_buckets=n_buckets)
    return (s.orderBy(F.col("dsir_micro").desc(), F.col("doc_id").asc())
            .limit(int(n)))


def span_corruption(docs: DataFrame, block: int = 5,
                    seed: int = 0) -> DataFrame:
    """T5-style span corruption (the denoising pretraining objective):
    (doc_id, input, target, n_masked) where masked token spans in the
    input are replaced by ``<extra_id_k>`` sentinels and the target
    lists each sentinel followed by the tokens it hides.

    Deterministic blocked variant (RNG-free, engine-replayable): the
    token stream is cut into fixed ``block``-token blocks; block j of
    doc d draws h = md5(seed:d:j) and masks a span of length
    L = h mod 3 (0 = unmasked) starting at (h div 7) mod (len-L+1)
    inside the block.  Blocks decide independently — no sequential
    dependency, so the whole transform is per-document ARRAY algebra
    (transform/filter/flatten/array_join) inside one map-side
    projection; sentinel ordinals k are prefix counts of masked
    blocks (O(blocks^2) closed form here, an `aggregate` fold in the
    production path — documented trade for cross-engine
    replayability).  At 100 TB this op is scan-shaped."""
    d = F.col("doc_id")
    ws = F.split("text", " ")
    nb = F.ceil(F.size(ws) / F.lit(int(block))).cast("int")

    def h(j):
        return F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit(int(seed)), d, j)), 1, 12), 16, 10).cast("long")

    def toks(j):
        return F.slice(ws, j * block + 1, block)

    def blen(j):
        return F.least(F.size(ws) - j * block, F.lit(int(block)))

    def span_len(j):
        raw = F.pmod(h(j), F.lit(3))
        return F.when(raw <= blen(j), raw).otherwise(F.lit(0))

    def span_start(j):  # 0-based inside the block
        return F.pmod((h(j) / 7).cast("long"),
                      (blen(j) - span_len(j) + 1).cast("long"))

    def masked(j):
        return span_len(j) > 0

    def ordinal(j):  # masked blocks before j
        return F.size(F.filter(F.sequence(F.lit(0), j - 1),
                               lambda i: masked(i))) \
            .cast("int")

    seq = F.sequence(F.lit(0), nb - 1)
    inp_blocks = F.transform(seq, lambda j: F.when(
        masked(j),
        F.concat(
            F.slice(toks(j), F.lit(1), span_start(j)),
            F.array(F.concat(F.lit("<extra_id_"),
                             F.when(j == 0, F.lit(0)).otherwise(ordinal(j)),
                             F.lit(">"))),
            F.slice(toks(j), span_start(j) + span_len(j) + 1,
                    blen(j) - span_start(j) - span_len(j)),
        )).otherwise(toks(j)))
    tgt_blocks = F.filter(
        F.transform(seq, lambda j: F.when(
            masked(j),
            F.concat(
                F.array(F.concat(F.lit("<extra_id_"),
                                 F.when(j == 0, F.lit(0))
                                 .otherwise(ordinal(j)), F.lit(">"))),
                F.slice(toks(j), span_start(j) + 1, span_len(j)),
            ))),
        lambda b: b.isNotNull())
    n_masked = F.size(F.filter(seq, lambda j: masked(j))).cast("long")
    return docs.select(
        "doc_id",
        F.array_join(F.flatten(inp_blocks), " ").alias("input"),
        F.array_join(F.flatten(tgt_blocks), " ").alias("target"),
        n_masked.alias("n_masked"))
