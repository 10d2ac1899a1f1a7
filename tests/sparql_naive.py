"""Independent naive SPARQL evaluator — the fuzz oracle for
plans/sparql.py.  Evaluates the SAME parsed AST over a list of
(s, p, o) triples with textbook solution-mapping semantics:
compatibility joins over binding dicts, left joins for OPTIONAL,
group-end filters, error-as-drop for type errors.  Deliberately
shares no code with the compiler beyond the parser."""

from __future__ import annotations

import re

from octofludb_spark.functions.uri import NT, OWL_SAMEAS
from octofludb_spark.plans.views import SUBPROP

_FULL_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}")


class EvalError(Exception):
    """SPARQL expression type error — the row is dropped."""


def _closure(p_iri):
    if p_iri.startswith(NT):
        names = SUBPROP.get(p_iri[len(NT):])
        if names:
            return {NT + n for n in names}
    if p_iri.endswith("sameAs"):
        return {OWL_SAMEAS}
    return {p_iri}


def _compatible(a: dict, b: dict) -> bool:
    return all(a[k] == b[k] for k in a.keys() & b.keys())


def _join(left: list, right: list) -> list:
    return [{**a, **b} for a in left for b in right if _compatible(a, b)]


def _left_join(left: list, right: list) -> list:
    out = []
    for a in left:
        matches = [{**a, **b} for b in right if _compatible(a, b)]
        out.extend(matches if matches else [a])
    return out


def _pstep_pairs(triples, p, cur_s, cur_o):
    """(s, o) pairs of one decorated path step — textbook version of
    the compiler's _pstep_pairs/_npstep_pairs: alternatives keep bags,
    + * ? are set-valued, zero-length binds every graph term plus the
    pattern's constant endpoints; negated sets match predicates NOT in
    the (closure-expanded) exclusion sets."""
    if p[0] == "npstep":
        _tag, fwd, rev, mod, inv = p
        base = []
        if fwd or not rev:
            ex = set()
            for i in fwd:
                ex |= _closure(i)
            base += [(ts, to) for (ts, tp, to) in triples if tp not in ex]
        if rev:
            ex = set()
            for i in rev:
                ex |= _closure(i)
            base += [(to, ts) for (ts, tp, to) in triples if tp not in ex]
    else:
        _tag, alts, mod, inv = p
        preds = set()
        for t in alts:
            preds |= _closure(t[1])
        base = [(ts, to) for (ts, tp, to) in triples if tp in preds]
    if inv:
        base = [(b, a) for (a, b) in base]
    pairs = list(base)
    if mod in ("+", "*"):
        closed = set(base)
        changed = True
        while changed:
            add = {(a, d) for (a, b) in closed for (c, d) in base
                   if b == c} - closed
            changed = bool(add)
            closed |= add
        pairs = sorted(closed)
    if mod in ("*", "?"):
        terms = {t for (ts, _, to) in triples for t in (ts, to)}
        for e in (cur_s, cur_o):
            if e[0] != "var":
                terms.add(e[1] if e[0] == "iri" else str(e[1]))
        pairs = sorted(set(pairs) | {(t, t) for t in terms})
    return pairs


def _scan(triples, s, path, o):
    """Solutions of one pattern (paths chain through fresh vars)."""
    sols = [dict()]
    cur_s = s
    for k, p in enumerate(path):
        cur_o = o if k == len(path) - 1 else ("var", f"__m{id(path)}_{k}")
        step = []
        if p[0] in ("pstep", "npstep"):
            rows = [(a, None, b) for (a, b) in
                    _pstep_pairs(triples, p, cur_s, cur_o)]
        else:
            preds = None if p[0] == "var" else _closure(p[1])
            rows = [(ts, tp, to) for (ts, tp, to) in triples
                    if preds is None or tp in preds]
        for (ts, tp, to) in rows:
            b = {}
            if cur_s[0] == "var":
                b[cur_s[1]] = ts
            elif ts != cur_s[1]:
                continue
            if p[0] == "var":
                b[p[1]] = tp
            if cur_o[0] == "var":
                b[cur_o[1]] = to
            elif to != (cur_o[1] if cur_o[0] == "iri" else str(cur_o[1])):
                continue
            if (cur_s[0] == "var" and cur_o[0] == "var"
                    and cur_s[1] == cur_o[1] and ts != to):
                continue
            step.append(b)
        sols = _join(sols, step)
        cur_s = cur_o
    # drop path intermediates
    return [{k: v for k, v in m.items() if not k.startswith("__m")}
            for m in sols]


def _eval_expr(e, b: dict):
    k = e[0]
    if k == "var":
        if e[1] not in b or b[e[1]] is None:
            raise EvalError(f"unbound ?{e[1]}")
        return b[e[1]]
    if k == "lit":
        return e[1]
    if k == "num":
        return e[1]
    if k == "bound":
        return e[1] in b and b[e[1]] is not None
    if k == "or":
        # SPARQL logical-or: error || true = true, error || false = error
        try:
            a = bool(_eval_expr(e[1], b))
        except EvalError:
            a = None
        try:
            c = bool(_eval_expr(e[2], b))
        except EvalError:
            c = None
        if a is True or c is True:
            return True
        if a is None or c is None:
            raise EvalError("or")
        return False
    if k == "and":
        try:
            a = bool(_eval_expr(e[1], b))
        except EvalError:
            a = None
        try:
            c = bool(_eval_expr(e[2], b))
        except EvalError:
            c = None
        if a is False or c is False:
            return False
        if a is None or c is None:
            raise EvalError("and")
        return True
    if k == "not":
        return not _eval_expr(e[1], b)
    if k == "arith":
        op = e[1]
        try:
            va = float(_eval_expr(e[2], b))
            vb = float(_eval_expr(e[3], b))
        except (TypeError, ValueError):
            raise EvalError("numeric cast")
        if op == "+":
            return va + vb
        if op == "-":
            return va - vb
        if op == "*":
            return va * vb
        if vb == 0:
            raise EvalError("division by zero")
        return va / vb
    if k == "regex":
        return re.search(e[2], str(_eval_expr(e[1], b))) is not None
    if k == "cmp":
        op, ea, eb = e[1], e[2], e[3]
        va, vb = _eval_expr(ea, b), _eval_expr(eb, b)
        for lit_side, other in ((ea, vb), (eb, va)):
            if lit_side[0] == "lit" and lit_side[2] == "xsd:date" \
                    and not _FULL_DATE.match(str(other)):
                raise EvalError("date type error")
        if isinstance(va, (int, float)) or isinstance(vb, (int, float)):
            try:
                va, vb = float(va), float(vb)
            except (TypeError, ValueError):
                raise EvalError("numeric cast")
        return {"=": va == vb, "!=": va != vb, "<": va < vb,
                ">": va > vb, "<=": va <= vb, ">=": va >= vb}[op]
    if k == "func":
        fn = e[1]
        v = str(_eval_expr(e[2], b))
        if fn in ("YEAR", "MONTH", "DAY"):
            if not _FULL_DATE.match(v):
                raise EvalError("partial date")
            part = {"YEAR": v[0:4], "MONTH": v[5:7], "DAY": v[8:10]}[fn]
            return int(part)
        if fn == "STR":
            return v
        if fn == "UCASE":
            return v.upper()
        if fn == "LCASE":
            return v.lower()
        if fn == "STRLEN":
            return len(v)
        if fn in ("ABS", "CEIL", "FLOOR", "ROUND"):
            import math

            try:
                x = float(v)
            except (TypeError, ValueError):
                raise EvalError("numeric cast")
            if fn == "ABS":
                return abs(x)
            if fn == "CEIL":
                return float(math.ceil(x))
            if fn == "FLOOR":
                return float(math.floor(x))
            # SPARQL ROUND: ties toward +inf (ROUND(-2.5) = -2)
            return float(math.floor(x + 0.5))
        if fn in ("MD5", "SHA1", "SHA256"):
            import hashlib

            h = {"MD5": hashlib.md5, "SHA1": hashlib.sha1,
                 "SHA256": hashlib.sha256}[fn]
            return h(v.encode()).hexdigest()
    if k == "nfunc":
        fn, exprs = e[1], e[2]
        if fn == "COALESCE":
            for a in exprs:
                try:
                    return _eval_expr(a, b)
                except EvalError:
                    continue
            raise EvalError("coalesce all unbound")
        if fn == "IF":
            return _eval_expr(exprs[1] if _eval_expr(exprs[0], b)
                              else exprs[2], b)
        args = [_eval_expr(a, b) for a in exprs]
        if fn == "CONCAT":
            return "".join(str(a) for a in args)
        if fn == "SUBSTR":
            s, start = str(args[0]), int(args[1])
            ln = int(args[2]) if len(args) > 2 else len(s)
            return s[start - 1:start - 1 + ln]
        if fn == "STRAFTER":
            s, sep = str(args[0]), str(args[1])
            i = s.find(sep)
            return s[i + len(sep):] if i >= 0 else ""
        if fn == "STRBEFORE":
            s, sep = str(args[0]), str(args[1])
            i = s.find(sep)
            return s[:i] if i >= 0 else ""
        if fn == "STRSTARTS":
            return str(args[0]).startswith(str(args[1]))
        if fn == "CONTAINS":
            return str(args[1]) in str(args[0])
        if fn == "STRENDS":
            return str(args[0]).endswith(str(args[1]))
        if fn == "REPLACE":
            # literal replacement (the compiler's contract): a lambda
            # stops re.sub from interpreting \1-style group references
            rep = str(args[2])
            return re.sub(str(args[1]), lambda _m: rep, str(args[0]))
    raise EvalError(f"unsupported {e!r}")


def _eval_group(elements, triples) -> list:
    sols: list | None = None
    pending: list = []
    filters: list = []

    def merge(new, how="inner"):
        nonlocal sols, pending
        if sols is None:
            sols = new
        else:
            sols = _join(sols, new) if how == "inner" else \
                _left_join(sols, new)
        while pending:
            sols = _left_join(sols, pending.pop(0))

    for el in elements:
        k = el[0]
        if k == "triple":
            merge(_scan(triples, el[1], el[2], el[3]))
        elif k == "optional":
            sub = _eval_group(el[1], triples)
            if sols is None:
                pending.append(sub)
            else:
                merge(sub, how="left")
        elif k == "union":
            branches = []
            for bch in el[1]:
                branches.extend(_eval_group(bch, triples))
            merge(branches)
        elif k == "values":
            vrows = [{v: val for v, val in zip(el[1], row)
                      if val is not None} for row in el[2]]
            merge(vrows)
        elif k == "bind":
            if sols is None:
                raise ValueError("BIND before any pattern")
            out = []
            for b in sols:
                try:
                    out.append({**b, el[2]: _eval_expr(el[1], b)})
                except EvalError:
                    out.append(dict(b))  # var stays unbound
            sols = out
        elif k == "subquery":
            sub_rows = _eval_select(el[1], triples)
            merge([{k2: v for k2, v in r.items() if v is not None}
                   for r in sub_rows])
        elif k in ("filter", "not_exists", "exists", "minus"):
            filters.append(el)
    if sols is None and pending:
        sols = pending.pop(0)
        while pending:
            sols = _left_join(sols, pending.pop(0))
    if sols is None:
        raise ValueError("empty group")

    for el in filters:
        k = el[0]
        if k == "filter":
            kept = []
            for b in sols:
                try:
                    if _eval_expr(el[1], b):
                        kept.append(b)
                except EvalError:
                    pass
            sols = kept
        elif k in ("not_exists", "minus"):
            sub = _eval_group(el[1], triples)
            if k == "minus":
                sols = [b for b in sols
                        if not any(_compatible(b, s) and b.keys() & s.keys()
                                   for s in sub)]
            else:
                sols = [b for b in sols
                        if not any(_compatible(b, s) for s in sub)]
        elif k == "exists":
            sub = _eval_group(el[1], triples)
            sols = [b for b in sols if any(_compatible(b, s) for s in sub)]
    return sols


def _agg_value(fn, distinct, arg, sep, members):
    """One aggregate over a group's member bindings."""
    if fn == "COUNT" and arg[0] == "star":
        return len(members)
    vals = [m[arg[1]] for m in members
            if arg[0] == "var" and m.get(arg[1]) is not None]
    if fn == "COUNT":
        return len(set(vals)) if distinct else len(vals)
    if fn == "GROUP_CONCAT":
        vs = sorted(set(vals)) if distinct else sorted(vals)
        return sep.join(str(v) for v in vs)
    if fn == "MIN":
        return min(vals) if vals else None
    if fn == "MAX":
        return max(vals) if vals else None
    raise ValueError(f"agg {fn}")


def _eval_having(expr, brow: dict, members: list) -> bool:
    """HAVING condition over one group: aggcall nodes evaluate against
    the member bindings, everything else against the group-key row."""
    def subst(e):
        if isinstance(e, tuple):
            if e[0] == "aggcall":
                v = _agg_value(e[1], e[2], e[3], e[4], members)
                if v is None:
                    return ("var", "__never_bound")
                return ("num", v) if isinstance(v, (int, float)) \
                    else ("lit", v, None)
            return tuple(subst(x) for x in e)
        if isinstance(e, list):
            return [subst(x) for x in e]
        return e
    try:
        return bool(_eval_expr(subst(expr), brow))
    except EvalError:
        return False


def _eval_select(ast: dict, triples: list) -> list:
    """SELECT -> list of {projected-name: value} rows (bag)."""
    sols = _eval_group(ast["where"], triples)
    projections = ast["projections"]
    group_by = ast["group_by"]
    havings = ast.get("having") or []
    has_agg = any(p[0] == "agg" for p in projections)
    if group_by or has_agg:
        groups: dict = {}
        for b in sols:
            groups.setdefault(tuple(b.get(k) for k in group_by),
                              []).append(b)
        out = []
        for key, members in groups.items():
            brow = {k: v for k, v in zip(group_by, key) if v is not None}
            if not all(_eval_having(h, brow, members) for h in havings):
                continue
            row = {}
            for p in projections:
                if p[0] == "var":
                    row[p[1]] = key[group_by.index(p[1])]
                else:
                    _tag, fn, distinct, arg, sep, alias = p
                    row[alias] = _agg_value(fn, distinct, arg, sep, members)
            out.append(row)
        return out
    if havings:
        raise ValueError("HAVING without grouping")
    return [{p[1]: b.get(p[1]) for p in projections} for b in sols]


def evaluate(ast: dict, triples: list) -> set:
    """-> set of projected tuples (None for unbound), matching the
    engine's deterministic GROUP_CONCAT (sorted distinct)."""
    rows = _eval_select(ast, triples)
    names = [p[5] if p[0] == "agg" else p[1] for p in ast["projections"]]
    return {tuple(r.get(n) for n in names) for r in rows}
