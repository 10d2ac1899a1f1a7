"""Seeded differential fuzz for the session-3 operators (funnel,
retention cohorts, fuzzy matching, modularity, sketches): each Spark
operator vs an independent naive Python oracle on randomized inputs —
the repo-wide fuzz discipline."""

import datetime as dt
import hashlib
import random

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

SEEDS = range(4)
T0 = dt.datetime(2024, 3, 4)  # a Monday


def _rand_events(rng, n_users=12, n_events=150):
    rows = []
    for i in range(n_events):
        rows.append((
            rng.randrange(n_users),
            T0 + dt.timedelta(minutes=rng.randrange(60 * 24 * 40)),
            rng.choice(["view", "click", "purchase", "error"]),
        ))
    # force timestamp collisions too
    rows += rows[: n_events // 10]
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_funnel_fuzz_vs_naive(spark, seed):
    from octofludb_spark.ops.events import funnel

    rng = random.Random(1000 + seed)
    rows = _rand_events(rng)
    stages = ["view", "click", "purchase"]

    def naive():
        out = {}
        by_user: dict = {}
        for u, ts, et in rows:
            by_user.setdefault(u, []).append((ts, et))
        for u, evs in by_user.items():
            t_prev = None
            hit = []
            for st in stages:
                cand = [ts for ts, et in evs if et == st
                        and (t_prev is None or ts > t_prev)]
                if st == stages[0]:
                    cand = [ts for ts, et in evs if et == st]
                if not cand:
                    break
                t_prev = min(cand)
                hit.append(t_prev)
            if hit:
                out[u] = hit
        return out

    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {r.user: [x for x in (r.t_view, r.t_click, r.t_purchase)
                    if x is not None]
           for r in funnel(ev, stages).collect()}
    want = naive()
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_retention_fuzz_vs_naive(spark, seed):
    from octofludb_spark.ops.events import retention_cohorts

    rng = random.Random(2000 + seed)
    rows = _rand_events(rng)

    def week(d):
        day = d.date()
        return day - dt.timedelta(days=day.weekday())

    first = {}
    active = set()
    for u, ts, _ in rows:
        w = week(ts)
        active.add((u, w))
        if u not in first or w < first[u]:
            first[u] = w
    want: dict = {}
    for u, w in active:
        key = (str(first[u]), (w - first[u]).days // 7)
        want[key] = want.get(key, 0) + 1

    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in retention_cohorts(ev).collect()}
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzzy_match_fuzz_vs_naive(spark, seed):
    from octofludb_spark.ops.entity_match import fuzzy_match_pairs

    rng = random.Random(3000 + seed)
    blocks = [f"B{i}" for i in range(8)]
    names = set()
    for _ in range(60):
        b = rng.choice(blocks)
        base = "".join(rng.choice("abcdxy/") for _ in range(rng.randrange(4, 12)))
        names.add(f"a/{base}/{b}/x")
        if rng.random() < 0.5:
            names.add(f"a/{base.upper()}/{b}/x (H1N1)")

    def lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    def block_of(n):
        parts = n.split("/")
        return parts[2].upper() if len(parts) > 2 else ""

    want = set()
    nl = sorted(names)
    for i, a in enumerate(nl):
        for b in nl[i + 1:]:
            if block_of(a) and block_of(a) == block_of(b):
                d = lev(a.lower(), b.lower())
                if d <= 8:
                    want.add((a, b, d))

    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {(r.name_a, r.name_b, r.dist) for r in fuzzy_match_pairs(
        df, F.upper(F.element_at(F.split("name", "/"), 3)),
        max_dist=8).collect()}
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_modularity_fuzz_vs_naive(spark, seed):
    from octofludb_spark.ops.graph_analytics import modularity

    rng = random.Random(4000 + seed)
    n = 30
    edges = {(a, b) for a, b in
             ((rng.randrange(n), rng.randrange(n)) for _ in range(80))
             if a != b}
    und = {(min(a, b), max(a, b)) for a, b in edges}
    comm = {v: rng.randrange(4) * 100 for v in range(n)}
    m = len(und)
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want: dict = {}
    for v, d in deg.items():
        c = comm[v]
        nn, e, ds = want.get(c, (0, 0, 0))
        want[c] = (nn + 1, e, ds + d)
    for a, b in und:
        if comm[a] == comm[b]:
            nn, e, ds = want[comm[a]]
            want[comm[a]] = (nn, e + 1, ds)

    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    cdf = spark.createDataFrame(
        [(v, c) for v, c in comm.items()], "node long, community long")
    got = {r.community: (r.n_nodes, r.intra_edges, r.degree_sum,
                         r.q_num, r.m)
           for r in modularity(edf, cdf).collect()}
    assert set(got) == set(want)
    for c, (nn, e, ds) in want.items():
        assert got[c] == (nn, e, ds, 4 * m * e - ds * ds, m)


@pytest.mark.parametrize("seed", SEEDS)
def test_sketches_fuzz_vs_naive(spark, seed):
    from octofludb_spark.scale import sketches as SK

    rng = random.Random(5000 + seed)
    vocab = [f"w{i}" for i in range(rng.randrange(40, 400))]
    docs = []
    for i in range(80):
        docs.append((i, " ".join(rng.choice(vocab)
                                 for _ in range(rng.randrange(0, 60))),
                     rng.choice(["en", "de"])))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")

    toks: dict = {}
    for _, text, lang in docs:
        for w in text.split(" "):
            if w:
                toks.setdefault(lang, []).append(w)

    kmv = {r.grp: r for r in SK.kmv_distinct(df, key="lang").collect()}
    for lang, ws in toks.items():
        hs = sorted({int(hashlib.md5(w.encode()).hexdigest()[:12], 16)
                     for w in ws})
        k = SK.K_KMV
        want = (len(hs) if len(hs) < k
                else (k - 1) * SK.HASH_SPAN // hs[k - 1])
        assert kmv[lang].kmv_est == want
        assert kmv[lang].n_exact == len(set(ws))

    cms = {r.word: r for r in
           SK.heavy_hitters_cms(df, key="lang", top=10).collect()}
    from collections import Counter

    cnt = Counter(w for ws in toks.values() for w in ws)
    top10 = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert set(cms) == {w for w, _ in top10}
    for w, n in top10:
        assert cms[w].n_exact == n
        assert cms[w].cms_est >= n


@pytest.mark.parametrize("seed", SEEDS)
def test_skew_report_fuzz_vs_naive(spark, seed):
    from collections import Counter

    from octofludb_spark.ops.skew import skew_report

    rng = random.Random(6000 + seed)
    rows = [(rng.choice("abc"),
             f"k{int(rng.paretovariate(0.7)) % 40}")
            for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, k string")
    got = {r.grp: r for r in skew_report(df, "g", "k").collect()}

    by_g: dict = {}
    for g, k in rows:
        by_g.setdefault(g, Counter())[k] += 1
    assert set(got) == set(by_g)
    for g, c in by_g.items():
        n, mx = sum(c.values()), max(c.values())
        r = got[g]
        assert (r.n_rows, r.n_keys, r.max_key_rows) == (n, len(c), mx)
        assert r.hhi_q == sum(v * v for v in c.values())
        assert r.top_share_ppm == mx * 1_000_000 // n
        assert r.is_hub == int(mx * 1_000_000 // n > 100_000)
        want_salt = max(1, mx * 32 // n) if r.is_hub else 1
        assert r.salt_hint == want_salt


@pytest.mark.parametrize("seed", SEEDS)
def test_dd_quantiles_fuzz_vs_naive(spark, seed):
    import math

    from octofludb_spark.scale import sketches as SK

    rng = random.Random(7000 + seed)
    docs = [(i, " ".join("w" for _ in range(rng.randrange(1, 300))),
             rng.choice(["en", "de"])) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {(r.grp, r.q): r for r in SK.dd_quantiles(df, key="lang").collect()}

    xs: dict = {}
    for _, text, lang in docs:
        xs.setdefault(lang, []).append(len(text.split(" ")))
    lg = math.log(SK.DD_GAMMA)
    for lang, v in xs.items():
        v.sort()
        n = len(v)
        sk = {}
        for x in v:
            b = math.ceil(math.log(x) / lg)
            sk[b] = sk.get(b, 0) + 1
        for q in (50, 90, 99):
            thr = -(-q * n // 100)  # ceil(q*n/100)
            cum = 0
            for b in sorted(sk):
                cum += sk[b]
                if cum * 100 >= q * n:
                    want_b = b
                    break
            want_exact = v[thr - 1]
            r = got[(lang, q)]
            assert r.dd_bucket == want_b
            assert r.exact_q == want_exact
            assert abs(r.dd_est - want_exact) \
                <= 2 * SK.DD_ALPHA * want_exact + 1


@pytest.mark.parametrize("seed", SEEDS)
def test_click_attribution_fuzz_vs_naive(spark, seed):
    from octofludb_spark.streaming.pipeline import click_attribution

    rng = random.Random(8000 + seed)
    rows = _rand_events(rng, n_users=6, n_events=120)
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {(r.user_id, r.view_ts, r.click_ts, r.lag_s)
           for r in click_attribution(
               ev.where("event_type='view'"),
               ev.where("event_type='click'"),
               horizon_min=120).collect()}
    want = set()
    views = [(u, ts) for u, ts, et in rows if et == "view"]
    clicks = [(u, ts) for u, ts, et in rows if et == "click"]
    for u, vt in views:
        for cu, ct in clicks:
            if cu == u and ct > vt and (ct - vt).total_seconds() <= 7200:
                want.add((u, vt, ct, int(ct.timestamp())
                          - int(vt.timestamp())))
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_cooccurrence_fuzz_vs_naive(spark, seed):
    from itertools import combinations

    from octofludb_spark.ops.events import cooccurrence_lift

    rng = random.Random(9000 + seed)
    rows = [(rng.randrange(10),
             T0 + dt.timedelta(minutes=rng.randrange(1000)),
             rng.choice("abcde")) for _ in range(300)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {(r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.n_users,
                                  r.lift_ppm)
           for r in cooccurrence_lift(ev).collect()}

    by_u: dict = {}
    for u, _, i in rows:
        by_u.setdefault(u, set()).add(i)
    n_users = len(by_u)
    per: dict = {}
    for items in by_u.values():
        for i in items:
            per[i] = per.get(i, 0) + 1
    want: dict = {}
    for items in by_u.values():
        for a, b in combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert set(got) == set(want)
    for (a, b), n_ab in want.items():
        assert got[(a, b)] == (
            n_ab, per[a], per[b], n_users,
            n_ab * n_users * 1_000_000 // (per[a] * per[b]))
