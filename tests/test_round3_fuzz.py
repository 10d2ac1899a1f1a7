"""Seeded differential fuzz for the late-round-3 operators: each
Spark operator is compared exactly against an independent naive
Python oracle on randomized inputs — the same discipline the dedup
family uses (test_scale_ops test_duplicate_spans_fuzz_vs_naive)."""

import random
import re

import pytest

pytestmark = pytest.mark.spark

SEEDS = range(4)


# ------------------------------------------------------------------
# naive oracles


def _py_url_normalize(url: str) -> str:
    nofrag = re.sub(r"#.*", "", url)
    base = re.sub(r"\?.*", "", nofrag)
    query = re.sub(r"^[^?]*\?", "", nofrag) if "?" in nofrag else ""
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", base)
    prefix = m.group(0) if m else ""
    path = base[len(prefix):]
    p2 = prefix.lower()
    p2 = re.sub(r"^([a-z][a-z0-9+.-]*://)www\.", r"\1", p2)
    p2 = re.sub(r"^(http://.*):80$", r"\1", p2)
    p2 = re.sub(r"^(https://.*):443$", r"\1", p2)
    path2 = re.sub(r"/+$", "", path)
    params = [p for p in query.split("&")
              if p != "" and not re.match(r"^(utm_[^=]*|fbclid|gclid)(=|$)", p)]
    return p2 + path2 + (("?" + "&".join(params)) if params else "")


def _py_c4(text: str, min_line_words=5, min_lines=3):
    lines = text.split("\n")
    kept = [
        l for l in lines
        if len(l.split(" ")) >= min_line_words
        and re.search(r'[.!?"]$', l)
        and "javascript" not in l.lower()
        and "{" not in l.lower()
    ]
    keep = int(len(kept) >= min_lines and "lorem ipsum" not in text.lower())
    return (len(lines), len(kept), keep, "\n".join(kept))


def _py_paragraph_dedup(texts):
    first = {}
    paras = []
    for doc_id, text in sorted(texts):
        for pos, para in enumerate(text.split("\n")):
            key = para
            rank1 = key not in first
            if rank1:
                first[key] = (doc_id, pos)
            paras.append((doc_id, pos, para, rank1))
    out = {}
    for doc_id, _ in texts:
        mine = [p for p in paras if p[0] == doc_id]
        kept = [p for p in mine if p[3]]
        out[doc_id] = (len(mine), len(kept),
                       "\n".join(p[2] for p in sorted(kept, key=lambda p: p[1])))
    return out


def _und(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((min(a, b), max(a, b)))
    return s


def _py_lpa(edges, iters=3):
    und = _und(edges)
    adj = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            # tie rule: max count, MIN label
            topc = max(counts.values())
            best = min(l for l, c in counts.items() if c == topc)
            nxt[n] = best
        labels = nxt
    return labels


def _py_kcore(edges, k=2, rounds=3):
    cur = _und(edges)
    for _ in range(rounds):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    deg = {}
    for a, b in cur:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def _py_bfs(edges, sources, max_hops=3):
    und = _und(edges)
    adj = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    dist = {s: 0 for s in sources if s in adj}
    frontier = set(dist)
    for d in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    nxt.add(m)
        for m in nxt:
            dist[m] = d
        frontier = nxt
    return dist


# ------------------------------------------------------------------
# fuzz corpora


def _rand_url(rng: random.Random) -> str:
    scheme = rng.choice(["http", "HTTP", "https", "HtTpS", "ftp",
                         "x+y.z-1", ""])
    www = rng.choice(["", "www.", "WWW.", "wWw."])
    host = rng.choice(["Example.COM", "a.b.org", "HOST", "xn--a"])
    port = rng.choice(["", ":80", ":443", ":8080"])
    segs = ["Seg%d" % rng.randint(0, 3) for _ in range(rng.randint(0, 3))]
    path = ("/" + "/".join(segs)) if segs else rng.choice(["", "/"])
    path += rng.choice(["", "/", "//"])
    params = []
    for _ in range(rng.randint(0, 4)):
        params.append(rng.choice([
            "utm_source=x", "utm_campaign", "fbclid=1", "gclid", "id=%d"
            % rng.randint(0, 9), "a=b", "empty=", "UTM_keep=1", ""]))
    query = ("?" + "&".join(params)) if params else rng.choice(["", "?"])
    frag = rng.choice(["", "#f", "#a#b"])
    pre = f"{scheme}://" if scheme else ""
    return f"{pre}{www}{host}{port}{path}{query}{frag}"


def _rand_lines_doc(rng: random.Random) -> str:
    vocab = ["alpha", "beta", "Gamma", "delta", "JavaScript", "{x}",
             "plain", "words", "here"]
    lines = []
    for _ in range(rng.randint(1, 6)):
        n = rng.randint(1, 8)
        line = " ".join(rng.choices(vocab, k=n))
        line += rng.choice(["", ".", "!", "?", '"', " "])
        lines.append(line)
    if rng.random() < 0.15:
        lines.append("lorem ipsum dolor sit amet today ok.")
    return "\n".join(lines)


def _rand_graph(rng: random.Random, n=25, m=45):
    nodes = [f"n{j}" for j in range(n)]
    return [(rng.choice(nodes), rng.choice(nodes)) for _ in range(m)]


# ------------------------------------------------------------------
# differentials


def test_url_normalize_fuzz(spark):
    from octofludb_spark.scale.text import url_normalize

    for seed in SEEDS:
        rng = random.Random(1000 + seed)
        rows = [(i, _rand_url(rng)) for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = {r.doc_id: r.url_norm for r in url_normalize(df).collect()}
        want = {i: _py_url_normalize(u) for i, u in rows}
        assert got == want, (
            f"seed {seed}: " + str([
                (i, rows[i][1], got[i], want[i])
                for i in got if got[i] != want[i]][:3]))


def test_c4_clean_fuzz(spark):
    from octofludb_spark.scale.text import c4_clean

    for seed in SEEDS:
        rng = random.Random(2000 + seed)
        rows = [(i, _rand_lines_doc(rng)) for i in range(80)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.n_lines, r.n_kept, r.keep, r.clean_text)
               for r in c4_clean(df).collect()}
        want = {i: _py_c4(t) for i, t in rows}
        assert got == want, f"seed {seed}"


def test_paragraph_dedup_fuzz(spark):
    from octofludb_spark.scale.dedup import paragraph_dedup

    for seed in SEEDS:
        rng = random.Random(3000 + seed)
        shared = ["shared one two", "cookie banner line", "footer nav"]
        rows = []
        for i in range(60):
            lines = []
            for _ in range(rng.randint(1, 5)):
                lines.append(rng.choice(shared) if rng.random() < 0.4
                             else " ".join(rng.choices(
                                 ["a", "b", "c", "d", "e"],
                                 k=rng.randint(1, 6))))
            rows.append((i, "\n".join(lines)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.n_paras, r.n_kept, r.clean_text)
               for r in paragraph_dedup(df).collect()}
        want = _py_paragraph_dedup(rows)
        assert got == want, f"seed {seed}"


def test_label_propagation_fuzz(spark):
    from octofludb_spark.ops.graph_analytics import label_propagation

    for seed in SEEDS:
        rng = random.Random(4000 + seed)
        edges = _rand_graph(rng)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.community
               for r in label_propagation(df, iters=3).collect()}
        assert got == _py_lpa(edges, iters=3), f"seed {seed}"


def test_kcore_fuzz(spark):
    from octofludb_spark.ops.graph_analytics import kcore

    for seed in SEEDS:
        rng = random.Random(5000 + seed)
        edges = _rand_graph(rng)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.degree for r in kcore(df, k=2, rounds=3).collect()}
        assert got == _py_kcore(edges, k=2, rounds=3), f"seed {seed}"


def test_bfs_fuzz(spark):
    from octofludb_spark.ops.graph_analytics import bfs_distances

    for seed in SEEDS:
        rng = random.Random(6000 + seed)
        edges = _rand_graph(rng)
        srcs = sorted({a for a, _ in edges[:4]} | {"offgraph"})
        df = spark.createDataFrame(edges, "src string, dst string")
        sdf = spark.createDataFrame([(s,) for s in srcs], "node string")
        got = {r.node: r.dist
               for r in bfs_distances(df, sdf, max_hops=3).collect()}
        assert got == _py_bfs(edges, srcs, max_hops=3), f"seed {seed}"
