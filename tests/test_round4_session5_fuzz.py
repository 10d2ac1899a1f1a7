"""Randomized differential campaigns for the session-5 operators:
each op run over seeded-random inputs and compared against an
independent pure-python replay.  Complements the fixed-case unit
tests the way the refshim campaigns back the recognizers."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _h12(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_fuzz_span_corruption(spark):
    from octofludb_spark.scale.text import span_corruption

    rng = random.Random(41)
    docs = [(i, " ".join(f"w{rng.randrange(50)}"
                         for _ in range(rng.randrange(1, 40))))
            for i in range(300)]
    texts = dict(docs)
    out = span_corruption(
        spark.createDataFrame(docs, ["doc_id", "text"]), seed=9).collect()
    assert len(out) == 300
    for r in out:
        ws = texts[r.doc_id].split(" ")
        nb = -(-len(ws) // 5)
        inp, tgt, k = [], [], 0
        for j in range(nb):
            toks = ws[j * 5:(j + 1) * 5]
            h = _h12(f"9:{r.doc_id}:{j}")
            L = h % 3
            if L > len(toks):
                L = 0
            if L:
                s = (h // 7) % (len(toks) - L + 1)
                sen = f"<extra_id_{k}>"
                inp += toks[:s] + [sen] + toks[s + L:]
                tgt += [sen] + toks[s:s + L]
                k += 1
            else:
                inp += toks
        assert (r.input, r.target, r.n_masked) == \
            (" ".join(inp), " ".join(tgt), k)


def test_fuzz_zorder_key_random_ranges(spark):
    from octofludb_spark.ops.layout import zorder_key

    rng = random.Random(7)
    for trial in range(5):
        lo1, lo2 = rng.randrange(-500, 500), rng.randrange(-500, 500)
        sp1, sp2 = rng.randrange(1, 3000), rng.randrange(1, 3000)
        rows = [(lo1 + rng.randrange(sp1 + 1),
                 lo2 + rng.randrange(sp2 + 1)) for _ in range(400)]
        # pin the actual extremes so the replay knows them
        rows += [(lo1, lo2), (lo1 + sp1, lo2 + sp2)]
        df = spark.createDataFrame(rows, ["x", "y"])
        got = {(r.x, r.y, r.zkey)
               for r in zorder_key(df, ["x", "y"], bits=7).collect()}

        def bucket(v, lo, span):
            return (v - lo) * 127 // span

        def morton(bx, by):
            z = 0
            for b in range(7):
                z |= ((bx >> b) & 1) << (2 * b)
                z |= ((by >> b) & 1) << (2 * b + 1)
            return z

        want = {(x, y, morton(bucket(x, lo1, sp1), bucket(y, lo2, sp2)))
                for x, y in rows}
        assert got == want, f"trial {trial}"


def test_fuzz_blocklist_vs_python(spark):
    from octofludb_spark.scale.web import blocklist_filter

    rng = random.Random(13)
    tlds = ["org", "net", "io"]
    hosts = []
    for i in range(250):
        labels = [f"l{rng.randrange(8)}"
                  for _ in range(rng.randrange(1, 5))]
        hosts.append(".".join(labels + [tlds[rng.randrange(3)]]))
    pages = [(i, f"https://{h}/p/{i}") for i, h in enumerate(hosts)]
    bl = sorted({".".join(h.split(".")[-k:])
                 for h in hosts[:40]
                 for k in (2, 3) if len(h.split(".")) >= k})
    bl = [d for d in bl if rng.random() < 0.5]
    got = {r[0] for r in blocklist_filter(
        spark.createDataFrame(pages, ["id", "url"]),
        spark.createDataFrame([(d,) for d in bl], ["domain"])).collect()}

    def blocked(h):
        parts = h.split(".")
        return any(".".join(parts[-k:]) in bl
                   for k in range(1, len(parts) + 1))

    want = {i for i, h in enumerate(hosts) if not blocked(h)}
    assert got == want


def test_fuzz_random_walks_many_graphs(spark):
    from octofludb_spark.ops.graph_analytics import random_walks

    rng = random.Random(29)
    for trial in range(3):
        n = rng.randrange(10, 40)
        edges = sorted({(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
                        for _ in range(n * 2)})
        adj: dict = {}
        for s, d in edges:
            adj.setdefault(s, []).append(d)
        out = random_walks(
            spark.createDataFrame(edges, ["src", "dst"]),
            walk_len=4, walks_per_node=1, seed=trial).collect()
        assert len(out) == len(adj)
        for r in out:
            cur, path = r.start, [r.start]
            for t in range(4):
                nb = sorted(adj.get(cur, []))
                if not nb:
                    break
                c = _h12(f"{trial}:{r.walk_id}:{t}") % len(nb)
                cur = nb[c]
                path.append(cur)
            assert r.path == " ".join(path), (trial, r.walk_id)


def test_fuzz_naive_bayes_vs_replay(spark):
    import math

    from octofludb_spark.scale.text import naive_bayes_classify

    rng = random.Random(5)
    vocabs = {"a": ["ape", "axe", "arc", "mix"],
              "b": ["bee", "bow", "bat", "mix"]}
    docs = []
    for i in range(200):
        lab = "a" if rng.random() < 0.5 else "b"
        docs.append((i, " ".join(rng.choice(vocabs[lab])
                                 for _ in range(rng.randrange(2, 9))),
                     lab))
    out = {r.doc_id: (r.label, r.pred, r.score_micro)
           for r in naive_bayes_classify(
               spark.createDataFrame(docs, ["doc_id", "text", "lang"]),
               vocab_k=5).collect()}

    bound = int(0.8 * 16_777_216 + 0.5)

    def band(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)

    train = [(i, t.split(), l) for i, t, l in docs if band(i) < bound]
    test = [(i, t.split(), l) for i, t, l in docs if band(i) >= bound]
    counts: dict = {}
    for _, ws, _ in train:
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    vocab = set(w for w, _ in sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    cw: dict = {}
    cl: dict = {}
    nl: dict = {}
    for _, ws, l in train:
        nl[l] = nl.get(l, 0) + 1
        for w in ws:
            mw = w if w in vocab else "<unk>"
            cw[(l, mw)] = cw.get((l, mw), 0) + 1
            cl[l] = cl.get(l, 0) + 1
    vs = len(vocab) + 1
    ntr = sum(nl.values())
    exp = {}
    for i, ws, l in test:
        best = None
        for cand in sorted(nl):
            s = math.floor(math.log(nl[cand] / ntr) * 1e6 + 0.5)
            for w in ws:
                mw = w if w in vocab else "<unk>"
                s += math.floor(math.log(
                    (cw.get((cand, mw), 0) + 1.0)
                    / (cl[cand] + vs)) * 1e6 + 0.5)
            if best is None or s > best[1]:
                best = (cand, s)
        exp[i] = (l, best[0], best[1])
    assert out == exp
