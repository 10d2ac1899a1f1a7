"""Round-4 session-3 operators: html_extract, group_linear_fit,
group_moments, jl_project, soft_dedup_weights.

Each test replays the operator's math in plain python on tiny inputs
(the same trust model as the DuckDB gates, but independent of SQL),
plus shape/edge cases the gates can't reach: empty groups, degenerate
variance, singleton clusters, html with no body text.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from octofludb_spark.scale import dedup as D
from octofludb_spark.scale import simsearch as S
from octofludb_spark.scale import stats as ST
from octofludb_spark.scale import text as TX

pytestmark = [pytest.mark.spark, pytest.mark.core]


# --------------------------------------------------------------------------
# html_extract
# --------------------------------------------------------------------------

def _docs(spark, rows, schema="doc_id long, html string"):
    return spark.createDataFrame(rows, schema)


def test_html_extract_strips_script_style_comment_tags(spark):
    html = ('<html><head><style>p{x:1}</style>'
            '<script>var s = "<b>hidden</b>";</script></head>'
            '<body><!-- no --><p>Hello   <b>world</b></p>'
            '<a href="/x">l1</a><a\nhref="/y">l2</a></body></html>')
    out = TX.html_extract(_docs(spark, [(1, html)])).collect()[0]
    assert out.text_clean == "Hello world l1 l2"
    assert out.n_links == 2
    assert out.n_chars_clean == len("Hello world l1 l2")


def test_html_extract_entity_decode_order(spark):
    # '&amp;lt;' decodes to literal '&lt;' (amp decoded LAST), and the
    # decoded '<' of '&lt;b&gt;' must NOT be re-parsed as a tag.
    html = "<p>&amp;lt; &lt;b&gt; &quot;q&quot; &#39;a&#39;&nbsp;z</p>"
    out = TX.html_extract(_docs(spark, [(1, html)])).collect()[0]
    assert out.text_clean == '&lt; <b> "q" \'a\' z'
    assert out.n_links == 0


def test_html_extract_empty_body(spark):
    out = TX.html_extract(
        _docs(spark, [(1, "<html><body></body></html>")])).collect()[0]
    assert out.text_clean == ""
    assert out.n_chars_clean == 0


def test_html_extract_unclosed_script_is_not_swallowed_to_eof(spark):
    # non-greedy block match: an unclosed <script> has no closing tag,
    # so only the TAG is stripped, not the rest of the document.
    html = "<p>keep</p><script>orphan body"
    out = TX.html_extract(_docs(spark, [(1, html)])).collect()[0]
    assert out.text_clean == "keep orphan body"


# --------------------------------------------------------------------------
# group_linear_fit / group_moments
# --------------------------------------------------------------------------

def test_linear_fit_exact_line(spark):
    # y = 3x + 7 exactly -> slope 3, intercept 7, r2 1
    rows = [("a", x, 3 * x + 7) for x in (1, 2, 5, 9, 12)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r.grp: r for r in
           ST.group_linear_fit(df, "x", "y", "grp").collect()}
    assert out["a"].slope == 3.0
    assert out["a"].intercept == 7.0
    assert out["a"].r2 == 1.0
    assert out["a"].n == 5


def test_linear_fit_matches_numpy_and_degenerate_group(spark):
    import numpy as np

    xs = [1, 2, 3, 4, 10, 17]
    ys = [2, 1, 5, 9, 11, 40]
    rows = [("a", x, y) for x, y in zip(xs, ys)]
    rows += [("flat", 4, 9), ("flat", 4, 11)]  # zero x-variance
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r.grp: r for r in
           ST.group_linear_fit(df, "x", "y", "grp").collect()}
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    assert out["a"].slope == pytest.approx(slope, abs=1e-6)
    assert out["a"].intercept == pytest.approx(intercept, abs=1e-6)
    assert out["a"].r2 == pytest.approx(r * r, abs=1e-6)
    assert out["flat"].slope is None
    assert out["flat"].intercept is None
    assert out["flat"].r2 is None


def test_moments_match_numpy(spark):
    import numpy as np

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, x long")
    out = ST.group_moments(df, "x", "grp").collect()[0]
    a = np.array(vals, dtype=float)
    var = a.var()  # population
    skew = ((a - a.mean()) ** 3).mean() / var ** 1.5
    assert out.mean == pytest.approx(a.mean(), abs=1e-6)
    assert out.variance == pytest.approx(var, abs=1e-6)
    assert out.skewness == pytest.approx(skew, abs=1e-6)
    # constant group -> NULL skewness, zero variance
    out0 = ST.group_moments(
        spark.createDataFrame([("c", 7), ("c", 7)], "grp string, x long"),
        "x", "grp").collect()[0]
    assert out0.variance == 0.0
    assert out0.skewness is None


# --------------------------------------------------------------------------
# jl_project
# --------------------------------------------------------------------------

def _py_jl(vec, out_dim):
    q = [int((x * 1_000_000 + 0.5) // 1) for x in vec]
    res = []
    for j in range(out_dim):
        s = 0
        for i, qi in enumerate(q):
            sign = 1 if hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[0] \
                in "01234567" else -1
            s += qi * sign
        res.append(s)
    return res


def test_jl_project_matches_python_replay(spark):
    vecs = [[0.25, -1.5, 0.0, 2.0], [1.0, 1.0, 1.0, 1.0]]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.out_pos): r.comp_micro
           for r in S.jl_project(emb, out_dim=6).collect()}
    for vid, v in enumerate(vecs):
        exp = _py_jl(v, 6)
        for j in range(6):
            assert got[(vid, j)] == exp[j]


def test_jl_project_zero_shuffle_plan(spark):
    emb = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<float>")
    plan = S.jl_project(emb, out_dim=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_jl_project_preserves_dot_products_statistically(spark):
    # JL guarantee sanity: projected cosine of identical vectors is 1,
    # of orthogonal-ish random vectors is near 0 relative to self-sim.
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(20, 64)).astype(float)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    rows = S.jl_project(emb, out_dim=16, in_dim=64).collect()
    proj = np.zeros((20, 16))
    for r in rows:
        proj[r.vec_id, r.out_pos] = r.comp_micro
    # normalized projections: self-similarity exactly 1, mean |cross|
    # well below 1 (distance preservation, loose statistical bound)
    pn = proj / np.linalg.norm(proj, axis=1, keepdims=True)
    sims = pn @ pn.T
    off = np.abs(sims[~np.eye(20, dtype=bool)])
    assert np.allclose(np.diag(sims), 1.0)
    assert off.mean() < 0.5


# --------------------------------------------------------------------------
# soft_dedup_weights
# --------------------------------------------------------------------------

def test_soft_dedup_weights_full_corpus_and_singletons(spark):
    base = ("spark shuffles keyed data across executors while the "
            "driver only schedules work and the join stays local")
    docs = spark.createDataFrame(
        [(0, base), (1, base + " extra"), (2, base),
         (3, "a completely different short text about nothing else")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           D.soft_dedup_weights(docs, threshold=0.2).collect()}
    assert set(out) == {0, 1, 2, 3}                  # full corpus
    assert out[3].n_dups == 1 and out[3].weight == 1.0
    assert out[3].cluster_id == 3                    # singleton
    k = out[0].n_dups
    assert k >= 2 and out[0].cluster_id == 0
    assert out[0].weight == pytest.approx(round(1.0 / k, 6))
    # cluster members agree
    assert out[2].cluster_id == 0 and out[2].n_dups == k
    # total weight of a cluster is ~1: the reweighting invariant
    members = [r for r in out.values() if r.cluster_id == 0]
    assert sum(r.weight for r in members) == pytest.approx(1.0, abs=1e-4)


def test_blocklist_suffix_semantics(spark):
    from octofludb_spark.scale import web as W

    pages = spark.createDataFrame(
        [(1, "https://a.b.spam.org/x"), (2, "https://good.org/y"),
         (3, "https://spam.org/z"), (4, "https://notspam.org/w"),
         (5, "https://deep.sub.bad.example.net/q")],
        ["id", "url"])
    bl = spark.createDataFrame(
        [("spam.org",), ("bad.example.net",)], ["domain"])
    kept = {r.id for r in W.blocklist_filter(pages, bl).collect()}
    # label-wise suffixes only: notspam.org is NOT blocked by spam.org
    assert kept == {2, 4}
    tags = {r.id: r.blocked_by for r in
            W.blocklist_filter(pages, bl, annotate=True).collect()}
    assert tags == {1: "spam.org", 2: None, 3: "spam.org",
                    4: None, 5: "bad.example.net"}


def test_blocklist_longest_match_wins(spark):
    from octofludb_spark.scale import web as W

    pages = spark.createDataFrame(
        [(1, "https://a.spam.org/x")], ["id", "url"])
    bl = spark.createDataFrame(
        [("spam.org",), ("a.spam.org",)], ["domain"])
    [r] = W.blocklist_filter(pages, bl, annotate=True).collect()
    assert r.blocked_by == "a.spam.org"


def test_blocklist_rejects_too_deep_entries(spark):
    from octofludb_spark.scale import web as W

    pages = spark.createDataFrame([(1, "https://x.org/")], ["id", "url"])
    bl = spark.createDataFrame([("a.b.c.d.spam.org",)], ["domain"])
    with pytest.raises(ValueError):
        W.blocklist_filter(pages, bl, max_labels=4)


def test_blocklist_plan_never_shuffles_pages(spark):
    from octofludb_spark.scale import web as W

    pages = spark.createDataFrame(
        [(i, f"https://h{i}.org/p") for i in range(50)], ["id", "url"])
    bl = spark.createDataFrame([("h1.org",)], ["domain"])
    plan = (W.blocklist_filter(pages, bl)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_reputation_integer_exact(spark):
    from octofludb_spark.scale import web as W

    pq = spark.createDataFrame(
        [("h1", 800000), ("h1", 600000), ("h2", 200000),
         ("h3", 1000000)], ["host", "quality_micro"])
    g = spark.createDataFrame(
        [("h3", "h2", 3), ("h1", "h2", 1), ("h2", "h1", 2)],
        ["src_host", "dst_host", "n_links"])
    out = {r.host: r for r in W.host_reputation(pq, g).collect()}
    assert out["h1"].quality_micro == 700000
    assert out["h1"].rep_micro == (700000 + 200000) // 2
    # h2's in-neighbours: h3 (3 links, q=1000000) + h1 (1 link, 700000)
    nbr = (3 * 1000000 + 1 * 700000) // 4
    assert out["h2"].rep_micro == (200000 * 50 + nbr * 50) // 100
    assert out["h3"].rep_micro == 1000000   # nobody links to h3


def test_frontier_rep_precedence_semantics(spark):
    from octofludb_spark.scale import web as W

    pages = spark.createDataFrame([
        (1, "https://h.org/doc/allowed-1"),   # allow 13 > dis 5: kept
        (2, "https://h.org/doc/x2"),          # dis 5 > 0: blocked
        (3, "https://h.org/private/p3"),      # dis 9 > allow 2: blocked
        (4, "https://h.org/ok/4"),            # tie 4 == 4: Allow wins
        (5, "https://other.org/doc/x5"),      # no rules host: kept
    ], ["id", "target_uri"])
    rules = spark.createDataFrame([
        ("h.org", "disallow", "/private/"),
        ("h.org", "disallow", "/doc/"),
        ("h.org", "allow", "/doc/allowed-"),
        ("h.org", "allow", "/p"),
        ("h.org", "disallow", "/ok/"),
        ("h.org", "allow", "/ok/"),
    ], ["host", "directive", "value"])
    kept = {r.id for r in W.crawl_frontier_rep(pages, rules).collect()}
    assert kept == {1, 4, 5}
    ann = {r.id: (r.blocked, r.disallow_len, r.allow_len)
           for r in W.crawl_frontier_rep(pages, rules,
                                         annotate=True).collect()}
    assert ann[1] == (False, 5, 13)
    assert ann[2] == (True, 5, 0)
    assert ann[3] == (True, 9, 2)
    assert ann[4] == (False, 4, 4)
    assert ann[5] == (False, 0, 0)


def test_frontier_rep_pages_never_shuffle(spark):
    from octofludb_spark.scale import web as W

    pages = spark.createDataFrame(
        [(i, f"https://h{i % 5}.org/p/{i}") for i in range(50)],
        ["id", "target_uri"])
    rules = spark.createDataFrame(
        [(f"h{i}.org", "disallow", "/p/") for i in range(5)],
        ["host", "directive", "value"])
    plan = (W.crawl_frontier_rep(pages, rules)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
