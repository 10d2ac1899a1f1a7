"""Funnel / retention-cohort semantics (ops/events.py), blocked
fuzzy matching (ops/entity_match.py), and sketch mergeability
(scale/sketches.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, TS + dt.timedelta(hours=h), t) for u, h, t in rows],
        "user_id long, ts timestamp, event_type string")


def test_funnel_strict_ordering(spark):
    """A purchase BEFORE the first click never completes the funnel;
    stage timestamps are the earliest events after the prior stage."""
    from octofludb_spark.ops.events import funnel

    ev = _ev(spark, [
        (1, 0, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # user 2: purchase precedes click -> stage stops at click
        (2, 0, "view"), (2, 1, "purchase"), (2, 2, "click"),
        # user 3: click precedes any view -> stage stops at view
        (3, 1, "click"), (3, 2, "view"),
        # user 4: never viewed -> not in the funnel at all
        (4, 0, "click"), (4, 1, "purchase"),
        # user 5: two clicks, earliest-after-view wins
        (5, 0, "view"), (5, 4, "click"), (5, 2, "click"), (5, 5, "purchase"),
    ])
    out = {r.user: r for r in
           funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1].funnel_stage == 3
    assert out[2].funnel_stage == 2  # purchase at h1 < click at h2
    assert out[3].funnel_stage == 1
    assert out[5].funnel_stage == 3
    assert out[5].t_click == TS + dt.timedelta(hours=2)


def test_retention_cohort_triangle(spark):
    """Users cohorted by first-event Monday; offsets count weeks."""
    from octofludb_spark.ops.events import retention_cohorts

    # 2024-01-01 is a Monday
    ev = _ev(spark, [
        (1, 0, "view"), (1, 24 * 7, "view"), (1, 24 * 15, "view"),
        (2, 0, "view"),
        (3, 24 * 7, "view"), (3, 24 * 14, "view"),
    ])
    rows = {(str(r.cohort_week), r.week_offset): r.n_users
            for r in retention_cohorts(ev).collect()}
    assert rows[("2024-01-01", 0)] == 2   # users 1, 2 week 0
    assert rows[("2024-01-01", 1)] == 1   # user 1 week 1
    assert rows[("2024-01-01", 2)] == 1   # user 1 week 2
    assert rows[("2024-01-08", 0)] == 1   # user 3 cohorted a week later
    assert rows[("2024-01-08", 1)] == 1


def test_fuzzy_match_blocks_and_cap(spark):
    """Same-block variants match within the distance budget; the
    oversized-block guard drops (and logs) degenerate keys instead of
    exploding."""
    from octofludb_spark.ops.entity_match import fuzzy_match_pairs

    names = spark.createDataFrame(
        [("A/swine/Ohio/X1/2019",), ("A/Swine/Ohio/X1/2019 (H1N1)",),
         ("A/swine/Iowa/X2/2020",), ("A/turkey/Missouri/X3/2016",)],
        "name string")
    out = fuzzy_match_pairs(
        names, F.upper(F.element_at(F.split("name", "/"), 4)),
        max_dist=8).collect()
    assert len(out) == 1
    assert out[0].block == "X1"
    assert out[0].dist == 7  # ' (H1N1)'
    # degenerate block: every name shares it -> dropped by the cap
    capped = fuzzy_match_pairs(
        names, F.lit("ALL"), max_dist=8, max_block=2).collect()
    assert capped == []


def test_sketches_merge_property(spark):
    """HLL registers and CMS counters are mergeable: sketch(A union B)
    == merge(sketch(A), sketch(B)) — MAX for registers, SUM for
    counters.  This is the property that makes them shuffle-light at
    10^12 rows."""
    from octofludb_spark.scale import sketches as SK

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200).cache()
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)

    whole = SK.hll_distinct(docs, key="lang").select(
        "grp", "hll_s", "hll_v0")
    # merge = MAX per (grp, idx) over the halves' registers
    def regs(d):
        w = SK._words(d, "lang")
        h = w.select("grp", SK._h48(F.col("w")).alias("h"))
        return h.select(
            "grp", (F.col("h") % SK.HLL_M).alias("idx"),
            F.when(F.expr(f"h DIV {SK.HLL_M}") == 0, F.lit(SK.RHO_MAX))
            .otherwise(F.lit(SK.RHO_MAX)
                       - F.length(F.bin(F.expr(f"h DIV {SK.HLL_M}"))))
            .alias("rho"),
        ).groupBy("grp", "idx").agg(F.max("rho").alias("m_r"))

    merged = (
        regs(a).unionByName(regs(b))
        .groupBy("grp", "idx").agg(F.max("m_r").alias("m_r"))
        .groupBy("grp")
        .agg(F.count("*").alias("n_regs"),
             F.sum(F.expr(f"CAST(shiftleft(1L, {SK.RHO_MAX} - m_r) "
                          "AS BIGINT)")).alias("s_hit"))
        .select(
            "grp",
            (F.col("s_hit") + (F.lit(SK.HLL_M) - F.col("n_regs"))
             * F.lit(1 << SK.RHO_MAX)).cast("long").alias("hll_s"),
            (F.lit(SK.HLL_M) - F.col("n_regs")).cast("long")
            .alias("hll_v0"),
        )
    )
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))

    # CMS: counters add
    whole_cms = SK.cms_counters(docs).withColumnRenamed("cnt", "w_cnt")
    merged_cms = (
        SK.cms_counters(a).unionByName(SK.cms_counters(b))
        .groupBy("row_id", "bucket").agg(F.sum("cnt").alias("m_cnt"))
    )
    diff = (
        whole_cms.join(merged_cms, ["row_id", "bucket"], "full")
        .where(F.coalesce("w_cnt", F.lit(-1))
               != F.coalesce("m_cnt", F.lit(-2)))
    )
    assert diff.count() == 0
    docs.unpersist()


def test_daily_anomalies_exact_boundary(spark):
    """The integer sigma test: a pinned series where one day is just
    over and another exactly AT the 2-sigma boundary — equality must
    NOT flag (strict >), which float stddev cannot guarantee."""
    import datetime as dt

    from octofludb_spark.ops.events import daily_anomalies

    # counts per day: [1, 1, 1, 1, 8] -> n=5, s=12, ssq=68
    # dev for x=8: 5*8-12=28; 4*(5*68-144)=784; 28^2=784 -> EQUAL, not
    # anomalous.  With x=9: s=13, ssq=85, dev=32, 1024 > 4*(425-169)=1024?
    # equal again at this algebra; use x=10: s=14, ssq=104, dev=36,
    # 1296 > 4*(520-196)=1296 -> equal AGAIN (2-sigma with one spike
    # and 4 flat days is exactly the boundary: dev^2 == 4*var*n^2
    # identically).  Add a 6th flat day to break the identity:
    # [1,1,1,1,1,10]: n=6, s=15, ssq=105, dev=45, 2025 > 4*(630-225)
    # = 1620 -> anomalous.
    rows = []
    day0 = dt.datetime(2024, 5, 6)
    for d, cnt in enumerate([1, 1, 1, 1, 8]):
        for i in range(cnt):
            rows.append((1, day0 + dt.timedelta(days=d, minutes=i), "view"))
    for d, cnt in enumerate([1, 1, 1, 1, 1, 10]):
        for i in range(cnt):
            rows.append((2, day0 + dt.timedelta(days=d, minutes=i), "view"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {(r.user, r.day): r for r in daily_anomalies(ev).collect()}
    # user 1: the 4-flat-one-spike shape sits EXACTLY on the boundary
    # (dev^2 == sigma^2 * n * var algebraically) -> strict > says no
    assert out[(1, "2024-05-10")].is_anomaly == 0
    assert out[(1, "2024-05-10")].direction == 1
    # user 2: past the boundary -> flagged, and flat days are not
    assert out[(2, "2024-05-11")].is_anomaly == 1
    assert sum(r.is_anomaly for r in out.values()) == 1


def test_fuzzy_entity_clusters_transitive(spark):
    """A chain a~b, b~c in one block resolves to ONE cluster with the
    lexicographic-min canonical name, even when a and c exceed the
    pair distance budget (transitivity via CC, like sameAs chains)."""
    from pyspark.sql import functions as F2

    from octofludb_spark.ops.entity_match import fuzzy_entity_clusters

    names = spark.createDataFrame(
        [("x/B1/aaaaaaaa",), ("x/B1/aaaaabbbbb",), ("x/B1/bbbbbbbbbb",),
         ("x/B2/other",)], "name string")
    out = {r.name: r for r in fuzzy_entity_clusters(
        names, F2.upper(F2.element_at(F2.split("name", "/"), 2)),
        max_dist=5).collect()}
    assert set(out) == {"x/B1/aaaaaaaa", "x/B1/aaaaabbbbb",
                        "x/B1/bbbbbbbbbb"}
    for r in out.values():
        assert r.canonical_name == "x/B1/aaaaaaaa"
        assert r.n_names == 3
    assert out["x/B1/aaaaaaaa"].is_canonical == 1
    assert out["x/B1/bbbbbbbbbb"].is_canonical == 0


def test_skew_report_pinned(spark):
    """Concentration math on a pinned skewed table: 90 rows on one
    hub key + 10 spread, so top_share_ppm = 900000, hhi = 8110,
    is_hub, and salt_hint = 90*32 DIV 100 = 28."""
    from octofludb_spark.ops.skew import skew_report

    rows = [("g", "hub")] * 90 + [("g", f"k{i}") for i in range(10)] \
        + [("u", f"k{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "p string, o string")
    out = {r.grp: r for r in skew_report(df, "p", "o").collect()}
    g = out["g"]
    assert (g.n_rows, g.n_keys, g.max_key_rows) == (100, 11, 90)
    assert g.hhi_q == 90 * 90 + 10
    assert g.top_share_ppm == 900000
    assert g.is_hub == 1
    assert g.salt_hint == 28
    u = out["u"]
    assert u.is_hub == 0
    # uniform group: no salting, even though max*32 DIV n_rows = 3
    assert u.salt_hint == 1
    assert u.hhi_q == 10


def test_cooccurrence_lift_pinned(spark):
    """Exact lift math: 4 users, a on {1,2,3}, b on {2,3,4}, c on
    {1}: pair (a,b) has n_ab=2, n_a=3, n_b=3, lift = 2*4/(3*3) =
    888888 ppm (floor)."""
    import datetime as dt

    from octofludb_spark.ops.events import cooccurrence_lift

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in (1, 2, 3):
        rows.append((u, t0, "a"))
    for u in (2, 3, 4):
        rows.append((u, t0, "b"))
    rows.append((1, t0, "c"))
    rows.append((1, t0, "a"))  # duplicate event: distinct-per-user
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {(r.item_a, r.item_b): r for r in
           cooccurrence_lift(ev).collect()}
    ab = out[("a", "b")]
    assert (ab.n_ab, ab.n_a, ab.n_b, ab.n_users) == (2, 3, 3, 4)
    assert ab.lift_ppm == 2 * 4 * 1_000_000 // 9
    ac = out[("a", "c")]
    assert (ac.n_ab, ac.n_a, ac.n_b) == (1, 3, 1)
    assert ac.lift_ppm == 1 * 4 * 1_000_000 // 3
    assert ("b", "c") not in out  # no shared user
