"""Sketch aggregations for 100-TB corpus monitoring: KMV / HyperLogLog
distinct-count estimators and a count-min frequency sketch.

Why sketches at all: the corpus-profile / length-quantile monitors in
scale/text.py compute EXACT statistics — a full distinct or a full
sort-based percentile is fine at benchmark scale but at 10^12 rows the
shuffle for `COUNT(DISTINCT token)` per group is the bottleneck.  Each
sketch here is a *mergeable, order-independent* aggregate: partitions
build partial sketches map-side and the merge is a plain `MAX`/`SUM`/
`MIN` — one narrow shuffle of sketch-sized (not data-sized) rows.

Cross-engine determinism (the repo-wide gate discipline): every hash
is md5 (identical hex in Spark and DuckDB), every estimator interior
is INTEGER arithmetic (BIGINT shifts / integer division), and the one
unavoidable float (the HLL alpha correction) is a shared literal
applied to identical integer inputs, rounded before emission.  The
estimators are therefore bit-identical at any parallelism on any
engine — there is no RNG and no float accumulation order anywhere.

Reference anchor: the reference has no sketch surface (its profiling
is driver-side Python over full result sets, e.g. summarize.py's
in-memory Counters); these operators are the scale path for the same
questions — "how many distinct strains/tokens per group" and "what
are the hot values" — asked against a corpus that no longer fits one
process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 48-bit hash domain: 12 hex chars of md5.  Fits BIGINT exactly in
# both engines; (K_KMV-1) << 48 ~ 1.8e16 < 2^63 so the KMV integer
# division never overflows.
HASH_BITS = 48
HASH_SPAN = 1 << HASH_BITS

K_KMV = 64          # KMV: k smallest hashes kept per group
HLL_P = 8           # HyperLogLog: m = 2^p = 256 registers
HLL_M = 1 << HLL_P
# rho counts leading-zeros+1 over the (HASH_BITS - HLL_P)-bit suffix;
# suffix == 0 -> rho = W_BITS + 1, so 2^(RHO_MAX - rho) is always a
# non-negative shift.
W_BITS = HASH_BITS - HLL_P
RHO_MAX = W_BITS + 1
# alpha_m for m >= 128 (Flajolet et al. 2007, figure 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

CMS_D = 4           # count-min: d hash rows
CMS_W = 512         # ... of w counters each


def _h48(col):
    """First 48 bits of md5 as a non-negative BIGINT — the shared
    uniform hash for both estimators (DuckDB twin:
    ('0x' || substr(md5(x), 1, 12))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _words(docs: DataFrame, key: str) -> DataFrame:
    """(grp, w): the corpus token stream under the repo-wide
    space-split convention (empty tokens dropped, NULL text = no
    tokens)."""
    return (
        docs.select(
            F.col(key).alias("grp"),
            F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("w"),
        )
        .where(F.col("w") != "")
    )


def kmv_distinct(docs: DataFrame, key: str = "lang",
                 k: int = K_KMV) -> DataFrame:
    """K-minimum-values distinct estimator per group (Bar-Yossef et
    al. 2002): keep the k smallest distinct 48-bit hashes of the
    group's tokens; with fewer than k distinct values the count is
    exact, otherwise est = (k-1) * 2^48 DIV h_k (integer division —
    bit-identical across engines; the double quotient of two >2^53
    ints would not be).

    Scale shape: one map-side-partial DISTINCT on (grp, hash) — the
    only data-sized shuffle — then a rank-k window over the distinct
    hashes (per-group sort of DISTINCT values only, k rows survive)
    and a k-row-per-group aggregate.  The production refinement at
    10^12 rows is a per-partition top-k (mapInPandas heap) before the
    distinct, which this plan's semantics already allow: min-k of
    minima is min-k.

    Output: (grp, n_exact, kmv_v, kmv_est).  n_exact is the
    verification column a production run would drop (it IS the full
    distinct this sketch exists to avoid)."""
    w = _words(docs, key)
    hs = w.select("grp", _h48(F.col("w")).alias("h")).distinct()
    win = Window.partitionBy("grp").orderBy("h")
    topk = hs.withColumn("rn", F.row_number().over(win)).where(F.col("rn") <= k)
    per = topk.groupBy("grp").agg(
        F.count("*").alias("kmv_v"),
        F.max("h").alias("h_k"),
    )
    exact = w.groupBy("grp").agg(F.countDistinct("w").alias("n_exact"))
    num = (k - 1) * HASH_SPAN
    return (
        exact.join(per, "grp")
        .select(
            "grp",
            "n_exact",
            "kmv_v",
            F.when(F.col("kmv_v") < k, F.col("kmv_v"))
            .otherwise(F.expr(f"CAST({num} AS BIGINT) DIV h_k"))
            .alias("kmv_est"),
        )
    )


def hll_distinct(docs: DataFrame, key: str = "lang") -> DataFrame:
    """HyperLogLog distinct estimator per group (Flajolet et al.
    2007), m = 256 registers: register index = hash mod m, register
    value = max over the group of (leading zeros of the 40-bit hash
    suffix + 1).

    Determinism: the harmonic sum is kept as an exact BIGINT —
    sum(2^(41 - rho)) plus 2^41 per never-hit register — so the only
    float is one alpha * m^2 * 2^41 / S division of identical
    integers, rounded to 2 dp.  The small-range linear-counting
    correction (E <= 2.5m and empty registers remain) uses ln on the
    exact integer ratio, same rounding.

    Scale shape: token stream -> (grp, idx, rho) map-side ->
    MAX-by-(grp, idx) with partial aggregation (at most m rows per
    group reach the shuffle per partition) -> m-row-per-group fold.
    This is the estimator `approx_count_distinct` runs inside the
    JVM; it is spelled out here so the registers are engine-portable
    and the gate can value-hash them.

    Output: (grp, n_exact, hll_v0, hll_s, hll_est)."""
    w = _words(docs, key)
    h = w.select("grp", _h48(F.col("w")).alias("h"))
    parts = h.select(
        "grp",
        (F.col("h") % HLL_M).alias("idx"),
        F.expr(f"h DIV {HLL_M}").alias("suffix"),
    ).select(
        "grp",
        "idx",
        F.when(F.col("suffix") == 0, F.lit(RHO_MAX))
        .otherwise(F.lit(RHO_MAX) - F.length(F.bin("suffix")))
        .alias("rho"),
    )
    regs = parts.groupBy("grp", "idx").agg(F.max("rho").alias("m_r"))
    per = regs.groupBy("grp").agg(
        F.count("*").alias("n_regs"),
        F.sum(F.expr(f"CAST(shiftleft(1L, {RHO_MAX} - m_r) AS BIGINT)"))
        .alias("s_hit"),
    )
    exact = w.groupBy("grp").agg(F.countDistinct("w").alias("n_exact"))
    empty_w = 1 << RHO_MAX
    s = (F.col("s_hit")
         + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(empty_w)).cast("long")
    v0 = (F.lit(HLL_M) - F.col("n_regs")).cast("long")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(empty_w)) / s.cast("double")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v0.cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v0 > 0), lc).otherwise(raw)
    return (
        exact.join(per, "grp")
        .select(
            "grp",
            "n_exact",
            v0.alias("hll_v0"),
            s.alias("hll_s"),
            F.round(est, 2).alias("hll_est"),
        )
    )


def cms_counters(docs: DataFrame, key: str = "lang",
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Count-min sketch counter table over the token stream: for each
    of d hash rows, bucket = first 16 md5 bits of 'row|token' mod w;
    counter = number of token occurrences landing there.  Counters
    are pure sums — order-independent, mergeable map-side, and the
    whole sketch is d*w rows regardless of corpus size.

    Output: (row_id, bucket, cnt)."""
    toks = _words(docs, key).select("w")
    rows = toks.select(
        "w",
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row_id"),
    )
    bkt = F.conv(
        F.substring(
            F.md5(F.concat(F.col("row_id").cast("string"), F.lit("|"),
                           F.col("w"))), 1, 4),
        16, 10,
    ).cast("int") % w
    return (
        rows.select("row_id", bkt.alias("bucket"))
        .groupBy("row_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def heavy_hitters_cms(docs: DataFrame, key: str = "lang",
                      top: int = 30, d: int = CMS_D,
                      w: int = CMS_W) -> DataFrame:
    """Heavy hitters with their count-min estimates: the exact top-N
    tokens (count DESC, token ASC — deterministic) probed against the
    CMS built from the same stream.  cms_est >= n_exact always (the
    one-sided CMS guarantee); equality whenever no heavier token
    shares all d buckets.

    Scale shape: the exact side is one token aggregate (it is the
    gate's verification target; a production pipeline keeps only the
    sketch); the probe explodes N tokens x d rows and joins the
    d*w-row counter table — broadcast-sized by construction.

    Output: (word, n_exact, cms_est)."""
    toks = _words(docs, key)
    exact = toks.groupBy(F.col("w").alias("word")).agg(
        F.count("*").alias("n_exact"))
    # top-N via orderBy+limit: plans as a distributed
    # TakeOrderedAndProject (per-partition heaps, driver merges N
    # rows).  The former row_number() over an UNPARTITIONED window
    # moved the entire distinct-word table through one reducer — a
    # single-partition sort of the full vocabulary at corpus scale,
    # in the operator family whose whole point is avoiding that.
    # Identical deterministic tie-break (count DESC, token ASC).
    topw = exact.orderBy(F.desc("n_exact"), F.asc("word")).limit(top)
    cms = cms_counters(docs, key, d=d, w=w)
    probes = topw.select(
        "word",
        "n_exact",
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row_id"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row_id").cast("string"), F.lit("|"),
                               F.col("word"))), 1, 4),
            16, 10,
        ).cast("int") % w,
    )
    return (
        probes.join(F.broadcast(cms), ["row_id", "bucket"])
        .groupBy("word", "n_exact")
        .agg(F.min("cnt").alias("cms_est"))
    )


# DDSketch (Masson et al. 2019): log-spaced buckets with relative-
# error guarantee alpha; counters are plain sums -> mergeable,
# fixed-size, order-independent.  gamma = (1+alpha)/(1-alpha).
DD_ALPHA = 0.02
DD_GAMMA = (1.0 + DD_ALPHA) / (1.0 - DD_ALPHA)


def dd_sketch(docs: DataFrame, key: str = "lang") -> DataFrame:
    """DDSketch bucket table over per-document token counts:
    bucket = ceil(ln(x) / ln(gamma)) for x >= 1 (empty docs are
    dropped — zero has no log bucket; production keeps them in a
    dedicated zero counter).  Output: (grp, bucket, cnt) — SUM-merge
    gives the union sketch.

    Scale shape: one map-side projection + one additive aggregate;
    the sketch is O(log(max_x)/alpha) rows per group regardless of
    corpus size — the mergeable path for latency/length quantile
    monitors (the exact interpolated quantile op this complements is
    text_length_quantiles)."""
    x = F.size(F.filter(F.split(F.coalesce("text", F.lit("")), " "),
                        lambda w: w != "")).cast("long")
    return (
        docs.select(F.col(key).alias("grp"), x.alias("x"))
        .where(F.col("x") >= 1)
        .select("grp",
                F.ceil(F.log(F.col("x").cast("double"))
                       / F.lit(float(__import__("math").log(DD_GAMMA))))
                .cast("long").alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dd_quantiles(docs: DataFrame, key: str = "lang",
                 qs: tuple = (50, 90, 99)) -> DataFrame:
    """Quantile estimates read off the DDSketch, next to the exact
    order statistics they approximate: for each integer percentile q,
    the first bucket whose cumulative count reaches ceil(q*n/100),
    its midpoint estimate 2*gamma^b/(gamma+1), and the exact q-th
    order statistic of the underlying counts.  The threshold walk is
    pure integer arithmetic; the one float (the midpoint) is rounded
    to 4 dp.  Output: (grp, q, dd_bucket, dd_est, exact_q)."""
    sk = dd_sketch(docs, key)
    w = Window.partitionBy("grp").orderBy("bucket")
    cum = sk.withColumn("cum", F.sum("cnt").over(w))
    n = sk.groupBy("grp").agg(F.sum("cnt").alias("n"))
    # the q fan-out is a map-side explode of a 3-element literal —
    # never a join node (keeps the suite's 0-NLJ invariant)
    qcol = F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q")
    # first bucket with cum >= ceil(q*n/100): integer threshold
    hit = (
        cum.join(F.broadcast(n), "grp")
        .select("grp", "bucket", "cum", "n", qcol)
        .where(F.col("cum") * 100 >= F.col("q") * F.col("n"))
        .groupBy("grp", "q")
        .agg(F.min("bucket").alias("dd_bucket"))
    )
    # exact order statistic: value at row ceil(q*n/100) in sorted order
    x = F.size(F.filter(F.split(F.coalesce("text", F.lit("")), " "),
                        lambda w_: w_ != "")).cast("long")
    vals = (docs.select(F.col(key).alias("grp"), x.alias("x"))
            .where(F.col("x") >= 1))
    rw = Window.partitionBy("grp").orderBy("x")
    ranked = vals.withColumn("rn", F.row_number().over(rw))
    exact = (
        ranked.join(F.broadcast(n), "grp")
        .select("grp", "x", "rn", "n", qcol)
        .where(F.col("rn") * 100 >= F.col("q") * F.col("n"))
        .groupBy("grp", "q")
        .agg(F.min("x").alias("exact_q"))
    )
    mid = (F.lit(2.0) * F.pow(F.lit(DD_GAMMA), F.col("dd_bucket"))
           / F.lit(DD_GAMMA + 1.0))
    return (
        hit.join(exact, ["grp", "q"])
        .select("grp", "q", "dd_bucket",
                F.round(mid, 4).alias("dd_est"), "exact_q")
    )
