"""Differential fuzz: the SPARQL compiler vs an independent naive
solution-mapping evaluator (tests/sparql_naive.py) on random graphs
and random queries from the supported grammar.  Every seed compares
full result SETS — any compat-join, pivot-rewrite, filter-scope, or
aggregation bug shows up as a set mismatch."""

import os
import random

import pytest

from octofludb_spark.plans.sparql import compile_sparql, parse_sparql
from tests.sparql_naive import evaluate

NT = "https://flu-crew.org/term/"
PFX = f"PREFIX f: <{NT}>\n"

SUBJECTS = ["s0", "s1", "s2", "s3"]
GIDS = ["g0", "g1", "g2"]
PREDS = ["pp0", "pp1", "pp2"]
VALUES = ["a", "b", "HA", "swine"]
DATES = ["2016-03-05", "2019-11-30", "2016", "2021-01-02"]


def _graph(rng):
    rows = []
    for s in SUBJECTS:
        for g in GIDS:
            if rng.random() < 0.5:
                rows.append((s, "link", g))
        for p in PREDS:
            for _ in range(rng.randint(0, 2)):
                rows.append((s, p, rng.choice(VALUES)))
        if rng.random() < 0.8:
            rows.append((s, "dt", rng.choice(DATES)))
    for g in GIDS:
        for p in PREDS:
            if rng.random() < 0.6:
                rows.append((g, p, rng.choice(VALUES)))
    return sorted(set(rows))


def _query(rng):
    """Random query text over vars ?x ?y with optional group/aggs."""
    body = []
    used_vars = []
    # core pattern on ?x
    p0 = rng.choice(PREDS)
    body.append(f"?x f:{p0} ?v0 .")
    used_vars.append("v0")
    if rng.random() < 0.7:
        body.append("?x f:link ?y .")
        p1 = rng.choice(PREDS)
        pat = f"?y f:{p1} ?v1 ."
        if rng.random() < 0.5:
            pat = "OPTIONAL { " + pat + " }"
        body.append(pat)
        used_vars.append("v1")
    if rng.random() < 0.5:
        pat = "?x f:dt ?d ."
        if rng.random() < 0.3:
            pat = "OPTIONAL { " + pat + " }"
        body.append(pat)
        used_vars.append("d")
    if rng.random() < 0.4:
        body.append('{ ?x f:%s "HA" . } UNION { ?x f:%s "swine" . }'
                    % (rng.choice(PREDS), rng.choice(PREDS)))
    if rng.random() < 0.3:
        # partial-var UNION: branch 1 binds ?z, branch 2 leaves it
        # unbound; the later ?z pattern exercises the unbound-compat
        # join (null-tolerant residual)
        body.append('{ ?x f:link ?z . } UNION { ?x f:%s "a" . }'
                    % rng.choice(PREDS))
        body.append(f"?x f:link ?z . ?z f:{rng.choice(PREDS)} ?w .")
        used_vars.append("w")
    if rng.random() < 0.3:
        # nested OPTIONAL (get-tagged-strain.rq:49-53 shape)
        body.append(
            "OPTIONAL { ?x f:link ?n . OPTIONAL { ?n f:%s ?nv . } }"
            % rng.choice(PREDS))
        used_vars.append("nv")
    if rng.random() < 0.3:
        # property path through the link node
        body.append(f"?x f:link/f:{rng.choice(PREDS)} ?pv .")
        used_vars.append("pv")
    if rng.random() < 0.4:
        # decorated path step: inverse / alternation / closure / opt
        kind = rng.randrange(7)
        if kind == 0:
            body.append(f"?x ^f:{rng.choice(PREDS)} ?iv .")
            used_vars.append("iv")
        elif kind == 1:
            body.append(f"?x (f:{rng.choice(PREDS)}|f:dt) ?av .")
            used_vars.append("av")
        elif kind == 2:
            body.append("?x f:link+ ?tv .")
            used_vars.append("tv")
        elif kind == 3:
            body.append("?x f:link? ?zv .")
            used_vars.append("zv")
        elif kind == 4:
            body.append(f"?x ^f:link/f:{rng.choice(PREDS)} ?bv .")
            used_vars.append("bv")
        elif kind == 5:
            body.append(f"?x !(f:{rng.choice(PREDS)}|f:dt) ?ng .")
            used_vars.append("ng")
        else:
            body.append(f"?x !(f:dt|^f:{rng.choice(PREDS)}) ?nr .")
            used_vars.append("nr")
    # filters
    if rng.random() < 0.4:
        v = rng.choice(used_vars)
        kind = rng.randrange(4)
        if kind == 0:
            body.append(f'FILTER REGEX(?{v}, "[aH]") .')
        elif kind == 1:
            body.append(f'FILTER (?{v} = "{rng.choice(VALUES)}") .')
        elif kind == 2:
            body.append(f"FILTER BOUND(?{v}) .")
        elif kind == 3 and "d" in used_vars:
            body.append("FILTER (YEAR(?d) > 2015) .")
    if rng.random() < 0.3:
        kind = rng.randrange(3)
        if kind == 0 and "d" in used_vars:
            body.append(f"FILTER (YEAR(?d) * 2 - 1 > {rng.randint(4000, 4040)}) .")
        elif kind == 1:
            vals = rng.sample(VALUES + ["zz"], rng.randint(1, 3))
            neg = "NOT IN" if rng.random() < 0.5 else "IN"
            body.append("FILTER (?v0 %s (%s)) ."
                        % (neg, ", ".join(f'"{v}"' for v in vals)))
        elif "d" in used_vars:
            body.append("BIND(YEAR(?d) / 4 as ?dq) .")
            used_vars.append("dq")
    if rng.random() < 0.3:
        body.append('FILTER NOT EXISTS { ?x f:%s "b" . }' % rng.choice(PREDS))
    if rng.random() < 0.3:
        vals = rng.sample(VALUES + ["zz"], rng.randint(1, 3))
        body.append("VALUES ?v0 { %s }" %
                    " ".join(f'"{v}"' for v in vals))
    if rng.random() < 0.25:
        # OPTIONAL-heavy group join: two sibling groups share k
        # maybe-null vars (k up to 4) — exercises the null-pattern
        # equi rewrite past the old 3-tolerant-var fallback, which
        # used to plan a BroadcastNestedLoopJoin condition join
        k = rng.randint(2, 4)
        for side in ("A", "B"):
            pats = [f"?x f:{rng.choice(PREDS)} ?anchor{side} ."]
            for i in range(k):
                pats.append("OPTIONAL { ?x f:%s ?ov%d . }"
                            % (rng.choice(PREDS + ["dt"]), i))
            body.append("{ " + " ".join(pats) + " }")
        used_vars.extend(f"ov{i}" for i in range(k))
    if rng.random() < 0.3:
        # subquery: inner ?v0 shadows the outer core var (scoping
        # test — only the projected ?x / aggregate are visible)
        agg = rng.choice(["MAX", "MIN"])
        body.append("{ SELECT ?x (%s(?v0) as ?sq) WHERE "
                    "{ ?x f:%s ?v0 . } GROUP BY ?x }"
                    % (agg, rng.choice(PREDS)))
        used_vars.append("sq")
    if rng.random() < 0.3:
        kind = rng.randrange(3)
        if kind == 0:
            body.append('FILTER STRSTARTS(?v0, "%s") .'
                        % rng.choice(["a", "H", "s"]))
        elif kind == 1:
            body.append('FILTER CONTAINS(?v0, "%s") .'
                        % rng.choice(["a", "w", "A"]))
        else:
            body.append('BIND(CONCAT(?v0, "-", ?x) as ?cc) .')
            used_vars.append("cc")

    if rng.random() < 0.3:
        # numeric / hash / replace builtins
        kind = rng.randrange(5)
        if kind == 0 and "d" in used_vars:
            body.append("BIND(ABS(YEAR(?d) - 2018) as ?ab) .")
            used_vars.append("ab")
        elif kind == 1 and "d" in used_vars:
            body.append("BIND(FLOOR(YEAR(?d) / 4) as ?fl) .")
            used_vars.append("fl")
        elif kind == 2 and "d" in used_vars:
            body.append(
                f"FILTER (ROUND(YEAR(?d) / 7) >= {rng.randint(287, 289)}) .")
        elif kind == 3:
            body.append("BIND(MD5(?v0) as ?hh) .")
            used_vars.append("hh")
        else:
            body.append('BIND(REPLACE(?v0, "[aH]", "_") as ?rp) .')
            used_vars.append("rp")

    grouped = rng.random() < 0.5
    if grouped:
        aggs = ['(GROUP_CONCAT(DISTINCT ?v0; separator="+") as ?c0)']
        if "v1" in used_vars:
            aggs.append('(MIN(?v1) as ?m1)')
        if "d" in used_vars and rng.random() < 0.5:
            aggs.append('(COUNT(DISTINCT ?d) as ?nd)')
        sel = "SELECT ?x " + " ".join(aggs)
        tail = " GROUP BY ?x"
        if rng.random() < 0.5:
            hk = rng.randrange(3)
            if hk == 0:
                tail += f" HAVING (COUNT(?v0) > {rng.randint(1, 3)})"
            elif hk == 1:
                tail += " HAVING (COUNT(DISTINCT ?v0) >= 2)"
            else:
                tail += ' HAVING (MIN(?v0) != "a")'
    else:
        sel = "SELECT DISTINCT ?x " + " ".join(f"?{v}" for v in used_vars)
        tail = ""
    return PFX + sel + " WHERE {\n  " + "\n  ".join(body) + "\n}" + tail


def _norm(rows):
    return {tuple(None if v is None else str(v) for v in r) for r in rows}


@pytest.mark.parametrize(
    "seed", range(int(os.environ.get("SPARQL_FUZZ_SEEDS", "40"))))
def test_fuzz_compiler_vs_naive(spark, seed):
    rng = random.Random(seed)
    rows = _graph(rng)
    text = _query(rng)
    ast = parse_sparql(text)
    triples = [(s, NT + p, o) for (s, p, o) in rows]
    want = _norm(evaluate(ast, triples))
    df = spark.createDataFrame(
        [(s, p, o, "") for (s, p, o) in triples],
        "subject string, predicate string, object_lex string, "
        "object_dtype string")
    got = _norm(tuple(r) for r in compile_sparql(ast, df).collect())
    assert got == want, f"seed {seed}\n{text}\nonly-spark: " \
        f"{sorted(got - want)[:3]}\nonly-naive: {sorted(want - got)[:3]}"
