"""SPARQL-subset compiler: the reference's `query FILE.rq` surface
(ui.py:458-471 submits an arbitrary SPARQL file) compiled to DataFrame
plans over the triple relation.

Scope = the grammar the reference's 22 shipped .rq files use (PREFIX,
SELECT [DISTINCT] with GROUP_CONCAT/MIN/MAX/COUNT/SUM/AVG projections,
FROM onto:disable-sameAs, basic graph patterns with ';'/',' and
property paths p1/p2, OPTIONAL, UNION, BIND, FILTER with
=/!=/</>/<=/>=, ||/&&/!, REGEX, BOUND, YEAR/MONTH/DAY, FILTER
[NOT] EXISTS, MINUS, GROUP BY, ORDER BY, LIMIT) — enough that a
reference user can run their own .rq files unchanged — plus the
SPARQL 1.1 features a GraphDB user would also reach for: ASK,
DESCRIBE, CONSTRUCT, SELECT *, VALUES, OFFSET, HAVING (with
aggregate calls), subqueries ({ SELECT ... }), decorated property
paths (^ inverse, (p1|p2) alternation, + * ? closures via semi-naive
iteration) and negated property sets (!p, !(p1|^p2)).

Semantics notes (SPARQL algebra, GraphDB-compatible):
  * elements compose left-to-right: Join for patterns/UNION/BIND,
    LeftJoin for OPTIONAL; FILTERs collect and apply at group end
    (so a FILTER may reference a var bound by a LATER optional,
    e.g. monthly-context.rq:31 BOUND(?const)).
  * join compatibility: a var bound on only one side matches anything
    (SPARQL's unbound-compatible rule).  Vars that can be null
    (OPTIONAL / partial-UNION bindings) join with a null-tolerant
    residual on top of the never-null equi keys, so the plan stays a
    hash join on the required keys (scale: no nested loop as long as
    one shared var is never-null — true for every shipped query).
  * predicate scans expand through the subPropertyOf closure
    (views.SUBPROP), mirroring GraphDB's owl-horst inference over
    schema.ttl.
  * REGEX is partial-match (rlike).  YEAR/MONTH/DAY of a non-date
    lexical (partial dates, gYear) is NULL => FILTER BOUND drops it,
    exactly like the reference engine's type error.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import NT, OWL_SAMEAS
from octofludb_spark.plans.views import SUBPROP

# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      "(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>\s]*>|\w*:\w+))?  # string [^^dtype]
    | <[^<>"{}|^`\s]*>                                 # IRI (IRIREF: no ws)
    | [?$]\w+                                          # variable
    | [+-]?\d+\.\d+(?:[eE][+-]?\d+)?                   # decimal
    | [+-]?\d+(?:[eE][+-]?\d+)?                        # integer
    | [A-Za-z_][\w-]*:[\w.%-]*                         # prefixed name
    | [A-Za-z_]\w*                                     # keyword / bare name
    | \|\||&&|!=|<=|>=                                 # 2-char operators
    | [{}();,./=<>!*+?^|-]                             # punctuation (incl.
                                                       # path ops + * ? ^ |
                                                       # and arithmetic -)
    """,
    re.X,
)

_COMMENT = re.compile(r'#[^\n"]*$', re.M)


def tokenize(text: str) -> list[str]:
    # strip comments only when the '#' is outside a quoted string or an
    # IRI (<...#...> fragments are not comments): blank both spans,
    # find the comment start, cut from the original line
    out = []
    for line in text.splitlines():
        scrub = re.sub(r'"(?:[^"\\]|\\.)*"|<[^<>"{}|^`\s]*>',
                       lambda m: " " * len(m.group()), line)
        cut = scrub.find("#")
        out.append(line[:cut] if cut >= 0 else line)
    return _TOKEN.findall("\n".join(out))


# --------------------------------------------------------------------------
# parser -> AST (tuples)
# --------------------------------------------------------------------------

_KEYWORDS = {
    "SELECT", "DISTINCT", "WHERE", "OPTIONAL", "UNION", "FILTER", "MINUS",
    "BIND", "AS", "GROUP", "ORDER", "BY", "ASC", "DESC", "LIMIT", "OFFSET",
    "PREFIX", "FROM", "NOT", "EXISTS", "BOUND", "REGEX", "A",
}
_AGG_FUNCS = {"GROUP_CONCAT", "COUNT", "MIN", "MAX", "SUM", "AVG", "SAMPLE"}
_SCALAR_FUNCS = {"YEAR", "MONTH", "DAY", "STR", "UCASE", "LCASE", "STRLEN",
                 "ABS", "CEIL", "FLOOR", "ROUND", "MD5", "SHA1", "SHA256"}
_NARY_FUNCS = {"CONCAT", "IF", "COALESCE", "SUBSTR", "STRAFTER",
               "STRBEFORE", "STRSTARTS", "CONTAINS", "STRENDS", "REPLACE"}


class SparqlError(ValueError):
    pass


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # -- token helpers ---------------------------------------------------
    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def kw(self, k: int = 0) -> str:
        t = self.peek(k)
        return t.upper() if t and re.fullmatch(r"[A-Za-z_]\w*", t) else ""

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise SparqlError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.upper() != tok.upper():
            raise SparqlError(f"expected {tok!r}, got {t!r}")

    def opt(self, tok: str) -> bool:
        if self.peek() and self.peek().upper() == tok.upper():
            self.i += 1
            return True
        return False

    # -- terms -----------------------------------------------------------
    def iri(self, tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        pfx, local = tok.split(":", 1)
        if pfx not in self.prefixes:
            raise SparqlError(f"undeclared prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def term(self, tok: str):
        if tok[0] in "?$":
            return ("var", tok[1:])
        if tok.startswith('"'):
            m = re.match(r'"((?:[^"\\]|\\.)*)"(?:\^\^(.+))?\Z', tok)
            lex = m.group(1).replace('\\"', '"')
            dt = m.group(2) or ""
            if dt and not dt.startswith("<") and ":" in dt:
                pass  # keep short form (xsd:date) — store convention
            elif dt.startswith("<"):
                dt = dt[1:-1]
            return ("lit", lex, dt)
        if re.fullmatch(r"[+-]?\d+", tok):
            return ("num", int(tok))
        if re.fullmatch(r"[+-]?\d[\d.eE+-]*", tok):
            return ("num", float(tok))
        if tok.startswith("<") or ":" in tok:
            return ("iri", self.iri(tok))
        raise SparqlError(f"cannot parse term {tok!r}")

    # -- query -----------------------------------------------------------
    def parse_query(self) -> dict:
        while self.kw() == "PREFIX":
            self.next()
            pname = self.next()
            if not pname.endswith(":"):
                # tokenizer yields 'pfx:' as a prefixed-name token
                pname = pname.split(":", 1)[0] + ":"
            iri_tok = self.next()
            self.prefixes[pname[:-1]] = iri_tok[1:-1]
        if self.kw() == "ASK":
            return self._parse_ask()
        if self.kw() == "DESCRIBE":
            return self._parse_describe()
        self.expect("SELECT")
        distinct = self.opt("DISTINCT")
        projections = []
        while True:
            t = self.peek()
            if t is None:
                raise SparqlError("unterminated SELECT")
            if t[0] in "?$":
                projections.append(("var", self.next()[1:]))
            elif t == "(":
                projections.append(self.parse_agg_projection())
            elif t == "*":
                self.next()
                projections.append(("star",))
            else:
                break
        disable_sameas = False
        while self.kw() == "FROM":
            self.next()
            src = self.next()
            if "disable-sameAs" in src:
                disable_sameas = True
        self.expect("WHERE")
        where = self.parse_ggp()
        group_by: list[str] = []
        having: list = []
        order_by: list[tuple[str, bool]] = []
        limit = None
        offset = 0
        # '}' terminates a subquery's solution modifiers
        while self.peek() is not None and self.peek() != "}":
            k = self.kw()
            if k == "GROUP":
                self.next()
                self.expect("BY")
                while self.peek() and self.peek()[0] in "?$":
                    group_by.append(self.next()[1:])
            elif k == "HAVING":
                self.next()
                if self.peek() == "(":
                    while self.peek() == "(":
                        having.append(self.parse_expr_parens())
                else:
                    having.append(self.parse_unary())
            elif k == "ORDER":
                self.next()
                self.expect("BY")
                while True:
                    t = self.peek()
                    if t is None:
                        break
                    if self.kw() in ("ASC", "DESC"):
                        desc = self.kw() == "DESC"
                        self.next()
                        self.expect("(")
                        order_by.append((self.next()[1:], desc))
                        self.expect(")")
                    elif t[0] in "?$":
                        order_by.append((self.next()[1:], False))
                    else:
                        break
            elif k == "LIMIT":
                self.next()
                limit = int(self.next())
            elif k == "OFFSET":
                self.next()
                offset = int(self.next())
            else:
                raise SparqlError(f"unexpected trailing token {self.peek()!r}")
        return {
            "form": "select",
            "distinct": distinct,
            "projections": projections,
            "disable_sameas": disable_sameas,
            "where": where,
            "group_by": group_by,
            "having": having,
            "order_by": order_by,
            "limit": limit,
            "offset": offset,
        }

    def _from_clauses(self) -> bool:
        disable_sameas = False
        while self.kw() == "FROM":
            self.next()
            src = self.next()
            if "disable-sameAs" in src:
                disable_sameas = True
        return disable_sameas

    def _parse_ask(self) -> dict:
        """ASK [FROM ...] [WHERE] { patterns } -> one boolean row."""
        self.expect("ASK")
        disable_sameas = self._from_clauses()
        if self.kw() == "WHERE":
            self.next()
        where = self.parse_ggp()
        if self.peek() is not None:
            raise SparqlError(f"unexpected trailing token {self.peek()!r}")
        return {"form": "ask", "where": where,
                "disable_sameas": disable_sameas}

    def _parse_describe(self) -> dict:
        """DESCRIBE (?var | <iri>)+ [FROM ...] [WHERE { patterns }] ->
        every triple whose subject is a described resource (concise
        bounded description; the store has no blank nodes, so depth-1
        subject match IS the CBD)."""
        self.expect("DESCRIBE")
        terms = []
        while True:
            t = self.peek()
            if t is None:
                break
            if t[0] in "?$":
                terms.append(("var", self.next()[1:]))
            elif t.startswith("<") or (":" in t and self.kw() not in
                                       ("WHERE", "FROM")):
                terms.append(self.term(self.next()))
            else:
                break
        if not terms:
            raise SparqlError("DESCRIBE with no resource terms")
        disable_sameas = self._from_clauses()
        where: list = []
        if self.kw() == "WHERE":
            self.next()
            where = self.parse_ggp()
        if self.peek() is not None:
            raise SparqlError(f"unexpected trailing token {self.peek()!r}")
        for t in terms:
            if t[0] == "var" and not where:
                raise SparqlError(f"DESCRIBE ?{t[1]} needs a WHERE "
                                  "pattern to bind it")
        return {"form": "describe", "terms": terms, "where": where,
                "disable_sameas": disable_sameas}

    def _parse_agg_call(self) -> tuple:
        """FN '(' [DISTINCT] arg [; SEPARATOR = "s"] ')' — the shared
        body of aggregate projections and HAVING aggregate calls.
        Returns (fn, distinct, arg, sep)."""
        fn = self.kw()
        if fn not in _AGG_FUNCS:
            raise SparqlError(f"unsupported aggregate function {fn!r}")
        self.next()
        self.expect("(")
        distinct = self.opt("DISTINCT")
        arg_tok = self.next()
        if arg_tok == "*":  # COUNT(*)
            arg = ("star",)
        else:
            arg = self.term(arg_tok)
        sep = "+"
        if self.opt(";"):
            sepkw = self.next()  # SEPARATOR
            if sepkw.upper() != "SEPARATOR":
                raise SparqlError(f"expected SEPARATOR, got {sepkw!r}")
            self.expect("=")
            sep_tok = self.next()
            sep = self.term(sep_tok)[1]
        self.expect(")")
        return fn, distinct, arg, sep

    def parse_agg_projection(self):
        """'(' EXPR AS ?alias ')' — aggregate or scalar projection."""
        self.expect("(")
        fn, distinct, arg, sep = self._parse_agg_call()
        self.expect("AS")
        alias = self.next()
        if alias[0] not in "?$":
            raise SparqlError(f"expected ?alias, got {alias!r}")
        self.expect(")")
        return ("agg", fn, distinct, arg, sep, alias[1:])

    # -- group graph pattern --------------------------------------------
    def parse_ggp(self) -> list:
        self.expect("{")
        elements: list = []
        while True:
            t = self.peek()
            if t is None:
                raise SparqlError("unterminated group")
            if t == "}":
                self.next()
                return elements
            k = self.kw()
            if k == "OPTIONAL":
                self.next()
                elements.append(("optional", self.parse_ggp()))
            elif k == "MINUS":
                self.next()
                elements.append(("minus", self.parse_ggp()))
            elif k == "FILTER":
                self.next()
                if self.kw() == "NOT" and self.kw(1) == "EXISTS":
                    self.next()
                    self.next()
                    elements.append(("not_exists", self.parse_ggp()))
                elif self.kw() == "EXISTS":
                    self.next()
                    elements.append(("exists", self.parse_ggp()))
                elif self.peek() == "(":
                    elements.append(("filter", self.parse_expr_parens()))
                else:
                    # FILTER BuiltInCall without parens: FILTER REGEX(..),
                    # FILTER BOUND(?x)
                    elements.append(("filter", self.parse_unary()))
            elif k == "BIND":
                self.next()
                self.expect("(")
                expr = self.parse_or_expr()
                self.expect("AS")
                var = self.next()
                self.expect(")")
                elements.append(("bind", expr, var[1:]))
            elif k == "VALUES":
                self.next()
                elements.append(self.parse_values())
            elif t == "{":
                if self.kw(1) == "SELECT":
                    # SPARQL 1.1 subquery: { SELECT ... } joins its
                    # projected bindings into the enclosing group
                    self.next()
                    sub = self.parse_query()
                    self.expect("}")
                    elements.append(("subquery", sub))
                else:
                    branches = [self.parse_ggp()]
                    while self.kw() == "UNION":
                        self.next()
                        branches.append(self.parse_ggp())
                    elements.append(("union", branches))
            else:
                elements.extend(self.parse_triples_block())
            self.opt(".")
            while self.opt("."):
                pass
        return elements

    def _path_primary(self):
        """IRI (or 'a') inside a property path."""
        t = self.next()
        if t.upper() == "A":
            return ("iri",
                    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        return self.term(t)

    def parse_path_step(self) -> tuple:
        """One path step: [^] (iri | '!' negated-set |
        '(' iri ('|' iri)* ')') [+ * ?].

        A plain un-modified single IRI or variable keeps the bare term
        shape (the common fast path); anything decorated becomes
        ('pstep', [iri-terms], modifier, inverted) or, for a negated
        property set, ('npstep', fwd-iris, rev-iris, modifier,
        inverted)."""
        inv = False
        if self.peek() == "^":
            self.next()
            inv = True
        if self.peek() == "!":
            self.next()
            fwd, rev = self._parse_negated_set()
            mod = None
            if self.peek() in ("+", "*", "?"):
                mod = self.next()
            return ("npstep", fwd, rev, mod, inv)
        if self.peek() == "(":
            self.next()
            alts = [self._path_primary()]
            while self.opt("|"):
                alts.append(self._path_primary())
            self.expect(")")
        else:
            alts = [self._path_primary()]
        mod = None
        if self.peek() in ("+", "*", "?"):
            mod = self.next()
        if not inv and mod is None and len(alts) == 1:
            return alts[0]
        for t in alts:
            if t[0] != "iri":
                raise SparqlError(
                    "only IRIs may appear in decorated property paths")
        return ("pstep", alts, mod, inv)

    def _parse_negated_set(self) -> tuple[list, list]:
        """'!' PathNegatedPropertySet: a single (possibly ^-inverted)
        IRI or a parenthesized |-list.  Returns (forward-iris,
        reverse-iris)."""
        fwd: list[str] = []
        rev: list[str] = []

        def one():
            if self.opt("^"):
                rev.append(self._path_primary()[1])
            else:
                fwd.append(self._path_primary()[1])

        if self.peek() == "(":
            self.next()
            one()
            while self.opt("|"):
                one()
            self.expect(")")
        else:
            one()
        return fwd, rev

    def parse_triples_block(self) -> list:
        """subject pred-object list with ';'/',' continuation and
        property paths.  Stops before '.', '}', or a keyword."""
        out = []
        subj = self.term(self.next())
        while True:
            # verb: property path — steps chained with '/', each step
            # optionally inverted (^), alternated ((p1|p2)), and/or
            # modified (+ * ?)
            path = [self.parse_path_step()]
            while self.peek() == "/":
                self.next()
                path.append(self.parse_path_step())
            while True:
                obj = self.term(self.next())
                out.append(("triple", subj, path, obj))
                if not self.opt(","):
                    break
            if not self.opt(";"):
                return out
            # a ';' may dangle before '.' or '}' (turtle style)
            if self.peek() in (".", "}", None):
                return out

    def parse_values(self):
        """VALUES ?v { t1 t2 ... } | VALUES (?v1 ?v2) { (a b) (c d) }.
        UNDEF leaves the slot unbound."""
        single = self.peek()[0] in "?$"
        if single:
            vars_ = [self.next()[1:]]
        else:
            self.expect("(")
            vars_ = []
            while self.peek() != ")":
                vars_.append(self.next()[1:])
            self.next()
        self.expect("{")
        rows = []
        while self.peek() != "}":
            if single:
                rows.append((self._values_term(),))
            else:
                self.expect("(")
                row = []
                while self.peek() != ")":
                    row.append(self._values_term())
                self.next()
                if len(row) != len(vars_):
                    raise SparqlError("VALUES row arity mismatch")
                rows.append(tuple(row))
        self.next()
        return ("values", vars_, rows)

    def _values_term(self):
        tok = self.next()
        if tok.upper() == "UNDEF":
            return None
        t = self.term(tok)
        if t[0] == "var":
            raise SparqlError("variables are not data in VALUES")
        return str(t[1])

    # -- expressions -----------------------------------------------------
    def parse_expr_parens(self):
        self.expect("(")
        e = self.parse_or_expr()
        self.expect(")")
        return e

    def parse_or_expr(self):
        e = self.parse_and_expr()
        while self.peek() == "||":
            self.next()
            e = ("or", e, self.parse_and_expr())
        return e

    def parse_and_expr(self):
        e = self.parse_cmp_expr()
        while self.peek() == "&&":
            self.next()
            e = ("and", e, self.parse_cmp_expr())
        return e

    def parse_cmp_expr(self):
        e = self.parse_add_expr()
        t = self.peek()
        if t in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            return ("cmp", t, e, self.parse_add_expr())
        if self.kw() == "IN" or (self.kw() == "NOT" and self.kw(1) == "IN"):
            # desugar per the SPARQL spec: IN = chained '=' with ||,
            # NOT IN = chained '!=' with && — error semantics follow
            # from the existing ||/&& rules
            neg = self.kw() == "NOT"
            if neg:
                self.next()
            self.next()
            self.expect("(")
            items = [self.term(self.next())]
            while self.opt(","):
                items.append(self.term(self.next()))
            self.expect(")")
            op = "!=" if neg else "="
            out = ("cmp", op, e, items[0])
            for it in items[1:]:
                out = ("and" if neg else "or", out, ("cmp", op, e, it))
            return out
        return e

    def parse_add_expr(self):
        e = self.parse_mul_expr()
        while True:
            t = self.peek()
            if t in ("+", "-"):
                self.next()
                e = ("arith", t, e, self.parse_mul_expr())
            elif t and re.fullmatch(r"[+-]\d[\d.eE+-]*", t):
                # signed-number token glued to the previous operand
                # (?x-1 tokenizes as ?x, -1) — implicit addition, per
                # the SPARQL AdditiveExpression grammar note
                self.next()
                num = float(t) if any(c in t for c in ".eE") else int(t)
                e = ("arith", "+", e, ("num", num))
            else:
                return e

    def parse_mul_expr(self):
        e = self.parse_unary()
        while self.peek() in ("*", "/"):
            op = self.next()
            e = ("arith", op, e, self.parse_unary())
        return e

    def parse_unary(self):
        t = self.peek()
        if t == "!":
            self.next()
            return ("not", self.parse_unary())
        if t == "(":
            return self.parse_expr_parens()
        k = self.kw()
        if k == "REGEX":
            self.next()
            self.expect("(")
            arg = self.parse_or_expr()
            self.expect(",")
            pat = self.term(self.next())
            if self.opt(","):
                self.next()  # flags — ignored ('i' unused in shipped files)
            self.expect(")")
            return ("regex", arg, pat[1])
        if k == "BOUND":
            self.next()
            self.expect("(")
            var = self.next()
            self.expect(")")
            return ("bound", var[1:])
        if k in _AGG_FUNCS:
            # aggregate call inside an expression — only valid in
            # HAVING; the compiler rejects it anywhere else
            fn, distinct, arg, sep = self._parse_agg_call()
            return ("aggcall", fn, distinct, arg, sep)
        if k in _SCALAR_FUNCS or k in _NARY_FUNCS:
            self.next()
            self.expect("(")
            args = [self.parse_or_expr()]
            while self.opt(","):
                args.append(self.parse_or_expr())
            self.expect(")")
            if k in _SCALAR_FUNCS:
                return ("func", k, args[0])
            return ("nfunc", k, args)
        return self.term(self.next())


def parse_sparql(text: str, macros: dict[str, str] | None = None) -> dict:
    for k, v in (macros or {}).items():
        text = text.replace(k, str(v))
    return _Parser(tokenize(text)).parse_query()


# --------------------------------------------------------------------------
# compiler -> DataFrame
# --------------------------------------------------------------------------


class _Group:
    """Compilation state for one group graph pattern: the current
    solution DataFrame, which vars may be null, and deferred filters."""

    def __init__(self, triples: DataFrame):
        self.triples = triples
        self.df: DataFrame | None = None
        self.maybe_null: set[str] = set()
        self.filters: list = []


def _pred_condition(path_iri: str):
    """Predicate scan condition with subPropertyOf closure expansion
    (views.pred semantics)."""
    if path_iri.startswith(NT):
        local = path_iri[len(NT):]
        names = SUBPROP.get(local)
        if names:
            return F.col("predicate").isin([NT + n for n in names])
    return F.col("predicate") == path_iri


_PATH_MAX_HOPS = 25


def _transitive_pairs(pairs: DataFrame) -> DataFrame:
    """Transitive closure of a (_ps, _po) edge frame — semi-naive
    iteration (each round joins only the NEW frontier against the base
    edges, so converged vertices stop costing shuffles), localCheckpoint
    per round to truncate lineage.  Converges in diameter hops; 25 is
    far beyond any real property hierarchy and bounds adversarial
    input."""
    base = pairs.distinct().localCheckpoint()
    res, frontier = base, base
    for _ in range(_PATH_MAX_HOPS):
        nxt = (
            frontier.alias("f")
            .join(base.alias("b"), F.col("f._po") == F.col("b._ps"))
            .select(F.col("f._ps").alias("_ps"), F.col("b._po").alias("_po"))
            .distinct()
        )
        new = nxt.join(res, ["_ps", "_po"], "left_anti").localCheckpoint()
        if new.isEmpty():
            return res
        res = res.unionByName(new).localCheckpoint()
        frontier = new
    raise SparqlError(f"property-path closure exceeded {_PATH_MAX_HOPS} hops")


def _closure_set(iris) -> list[str]:
    """Expand each IRI through sameAs-normalization + the
    subPropertyOf closure; sorted distinct."""
    out: list[str] = []
    for i in iris:
        iri = OWL_SAMEAS if i.endswith("sameAs") else i
        out.extend(_closure_iris(iri))
    return sorted(set(out))


def _apply_path_decorations(pairs: DataFrame, triples: DataFrame,
                            mod, inv: bool, s, o) -> DataFrame:
    """Inverse / closure / zero-length semantics shared by decorated
    path steps.  + * ? are set-valued per the SPARQL spec (ALP and
    ZeroOrOnePath are defined duplicate-free).  Zero-length paths bind
    every term of the graph plus the pattern's own constant
    endpoints."""
    if inv:
        pairs = pairs.select(F.col("_po").alias("_ps"),
                             F.col("_ps").alias("_po"))
    if mod in ("+", "*"):
        pairs = _transitive_pairs(pairs)
    if mod in ("*", "?"):
        spark = triples.sparkSession
        zero = (
            triples.select(F.col("subject").alias("_ps"))
            .unionByName(triples.select(F.col("object_lex").alias("_ps")))
        )
        consts = [t[1] if t[0] == "iri" else str(t[1])
                  for t in (s, o) if t[0] != "var"]
        if consts:
            zero = zero.unionByName(
                spark.createDataFrame([(c,) for c in consts],
                                      "_ps string"))
        pairs = pairs.unionByName(
            zero.select("_ps", F.col("_ps").alias("_po"))).distinct()
    return pairs


def _pstep_pairs(triples: DataFrame, p, s, o) -> DataFrame:
    """(_ps, _po) pairs for one decorated path step ('pstep', alts,
    mod, inv).  Alternatives keep bag semantics (one row per matching
    triple)."""
    _tag, alts, mod, inv = p
    uniq = _closure_set(t[1] for t in alts)
    cond = (F.col("predicate") == uniq[0]) if len(uniq) == 1 \
        else F.col("predicate").isin(uniq)
    pairs = triples.where(cond).select(
        F.col("subject").alias("_ps"), F.col("object_lex").alias("_po"))
    return _apply_path_decorations(pairs, triples, mod, inv, s, o)


def _npstep_pairs(triples: DataFrame, p, s, o) -> DataFrame:
    """(_ps, _po) pairs for a negated property set ('npstep', fwd,
    rev, mod, inv): forward triples whose predicate is NOT in the
    forward exclusion set, unioned with reversed triples whose
    predicate is NOT in the reverse (^-marked) exclusion set — the
    SPARQL 1.1 NegatedPropertySet translation.  Exclusions expand
    through the same subPropertyOf closure positive scans use, so
    !f:p and f:p partition the graph consistently."""
    _tag, fwd, rev, mod, inv = p
    parts = []
    if fwd or not rev:
        ex = _closure_set(fwd)
        scan = triples.where(~F.col("predicate").isin(ex)) if ex \
            else triples
        parts.append(scan.select(F.col("subject").alias("_ps"),
                                 F.col("object_lex").alias("_po")))
    if rev:
        ex = _closure_set(rev)
        scan = triples.where(~F.col("predicate").isin(ex)) if ex \
            else triples
        parts.append(scan.select(F.col("object_lex").alias("_ps"),
                                 F.col("subject").alias("_po")))
    pairs = parts[0]
    for extra in parts[1:]:
        pairs = pairs.unionByName(extra)
    return _apply_path_decorations(pairs, triples, mod, inv, s, o)


def _scan(triples: DataFrame, subj, path: list, obj) -> tuple[DataFrame, set]:
    """One triple pattern (with an optional property path) as a
    predicate-filtered scan chain.  Returns (df, var-columns)."""
    steps = []
    cur_s = subj
    for k, p in enumerate(path):
        if p[0] == "var" and len(path) > 1:
            raise SparqlError("variable predicates in property paths "
                              "are not supported")
        cur_o = obj if k == len(path) - 1 else ("var", f"__mid{id(path)}_{k}")
        steps.append((cur_s, p, cur_o))
        cur_s = cur_o
    df = None
    for (s, p, o) in steps:
        cols = []
        if p[0] == "pstep":
            pairs = _pstep_pairs(triples, p, s, o)
        elif p[0] == "npstep":
            pairs = _npstep_pairs(triples, p, s, o)
        elif p[0] == "var":
            # ?s ?p ?o — full scan, predicate projected
            pairs = triples.select(F.col("subject").alias("_ps"),
                                   F.col("object_lex").alias("_po"),
                                   F.col("predicate").alias(p[1]))
            cols.append(F.col(p[1]))
        else:
            pred = OWL_SAMEAS if p[1].endswith("sameAs") else p[1]
            pairs = triples.where(_pred_condition(pred)).select(
                F.col("subject").alias("_ps"),
                F.col("object_lex").alias("_po"))
        if s[0] == "var" and o[0] == "var" and s[1] == o[1]:
            # ?x path ?x — one binding column, endpoints equal
            pairs = pairs.where(F.col("_ps") == F.col("_po"))
            cols.append(F.col("_ps").alias(s[1]))
        else:
            if s[0] == "var":
                cols.append(F.col("_ps").alias(s[1]))
            else:
                pairs = pairs.where(F.col("_ps") == s[1])
            if o[0] == "var":
                cols.append(F.col("_po").alias(o[1]))
            elif o[0] == "iri":
                pairs = pairs.where(F.col("_po") == o[1])
            else:  # literal / num
                pairs = pairs.where(F.col("_po") == str(o[1]))
        if not cols:
            cols = [F.lit(1).alias(f"__hit{id(steps)}")]
        step_df = pairs.select(*cols)
        if df is None:
            df = step_df
        else:
            shared = set(df.columns) & set(step_df.columns)
            df = df.join(step_df, on=list(shared))
    # drop path intermediates and marker columns
    keep = [c for c in df.columns if not c.startswith("__mid")]
    df = df.select(*keep) if keep else df
    var_cols = {c for c in df.columns if not c.startswith("__hit")}
    return df, var_cols


def _compat_out_nulls(left, left_nulls, right, right_nulls, shared,
                      how) -> set:
    out_nulls = set()
    for v in left.columns:
        if v in shared:
            if (v in left_nulls) and (v in right_nulls or how == "left"):
                out_nulls.add(v)
        elif v in left_nulls:
            out_nulls.add(v)
    for v in right.columns:
        if v not in shared and (v in right_nulls or how == "left"):
            out_nulls.add(v)
    return out_nulls


# Null-pattern rewrite cap: 3^k disjoint equi branches per compat
# join.  k=5 → ≤243 branches, all hash joins — planning-time cost
# only; beyond that the query is asked to rewrite (never NLJ).
_COMPAT_MAX_TOL = 5


def _compat_join(left: DataFrame, left_nulls: set, right: DataFrame,
                 right_nulls: set, how: str = "inner") -> tuple[DataFrame, set]:
    """SPARQL compatibility join: equi on never-null shared vars,
    null-tolerant on maybe-null shared vars, bindings merged with
    coalesce.  `how` in (inner, left, left_anti).

    Scale shape: the textbook compat condition (`L.v IS NULL OR R.v IS
    NULL OR L.v = R.v` AND-ed per var) is non-equi, so Spark plans a
    BroadcastNestedLoopJoin — quadratic on an OPTIONAL-heavy query.
    Instead the pair space is PARTITIONED by null-pattern: rows are
    classed by which tolerant vars are bound, and each (L class,
    R slice) branch joins equi on `strict keys + the vars bound on
    both sides` — a hash join whenever any key survives, which is
    every branch as long as one shared var is never-null (the usual
    anchor-var case).  Branches are disjoint by construction, so the
    union needs no dedup; `left` derives as inner ∪ (anti ×
    null-extension) and `left_anti` as per-class CHAINED anti joins —
    no row-id bookkeeping.  The rewrite runs up to
    `_COMPAT_MAX_TOL` tolerant vars (branch count 3^k, static-empty
    classes pruned); beyond that a SparqlError asks for a query
    rewrite rather than silently planning a quadratic
    BroadcastNestedLoopJoin."""
    shared = [c for c in left.columns if c in right.columns]
    if not shared:
        if how == "inner":
            return left.crossJoin(right), left_nulls | right_nulls
        if how == "left":
            # LeftJoin with no shared vars: every row pairs (or survives
            # alone if right is empty) — crossJoin covers the shipped
            # queries (right nonempty)
            return left.crossJoin(right), left_nulls | right_nulls
        raise SparqlError("NOT EXISTS/MINUS with no shared variables")
    tol = [v for v in shared
           if v in left_nulls or v in right_nulls]
    strict = [v for v in shared if v not in tol]
    out_nulls = _compat_out_nulls(left, left_nulls, right, right_nulls,
                                  shared, how)

    if len(tol) > _COMPAT_MAX_TOL:
        raise SparqlError(
            f"join shares {len(tol)} maybe-null variables "
            f"({', '.join('?' + v for v in sorted(tol))}); the "
            f"null-pattern equi rewrite is capped at {_COMPAT_MAX_TOL} "
            "(3^k branches) and the naive condition join would plan a "
            "quadratic nested-loop join — rewrite the query so fewer "
            "OPTIONAL-bound variables are shared across the join "
            "(e.g. rename per-branch variables, or anchor each "
            "OPTIONAL on a never-null variable)")
    if not tol:
        L = left.alias("L")
        R = right.alias("R")
        conds = []
        for v in shared:
            if v in tol:
                c = (L[v] == R[v])
                # isNull disjuncts only for sides that CAN be null
                if v in left_nulls:
                    c = L[v].isNull() | c
                if v in right_nulls:
                    c = R[v].isNull() | c
                conds.append(c)
            else:
                conds.append(L[v] == R[v])
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        if how == "left_anti":
            return L.join(R, cond, "left_anti"), left_nulls
        joined = L.join(R, cond, how)
        cols = []
        for v in left.columns:
            cols.append(F.coalesce(L[v], R[v]).alias(v)
                        if v in shared else L[v])
        for v in right.columns:
            if v not in shared:
                cols.append(R[v])
        return joined.select(*cols), out_nulls

    # ---- union-of-equi-joins rewrite -------------------------------
    import itertools

    # L classes: null-patterns of the tolerant vars on the left;
    # statically-empty classes (var never null on that side) skipped
    def _branches():
        bi = 0
        for lmask in itertools.product((True, False), repeat=len(tol)):
            if any(not m and v not in left_nulls
                   for v, m in zip(tol, lmask)):
                continue  # L.v can't be null: empty class
            nn_l = [v for v, m in zip(tol, lmask) if m]
            lfilt = None
            for v, m in zip(tol, lmask):
                c = F.col(v).isNotNull() if m else F.col(v).isNull()
                lfilt = c if lfilt is None else (lfilt & c)
            # R slices: null-patterns over the vars bound on the left
            rslices = []
            for rmask in itertools.product((True, False),
                                           repeat=len(nn_l)):
                if any(not m and v not in right_nulls
                       for v, m in zip(nn_l, rmask)):
                    continue  # R.v can't be null: empty slice
                eq_vars = [v for v, m in zip(nn_l, rmask) if m]
                rfilt = None
                for v, m in zip(nn_l, rmask):
                    c = F.col(v).isNotNull() if m else F.col(v).isNull()
                    rfilt = c if rfilt is None else (rfilt & c)
                rslices.append((rfilt, strict + eq_vars))
            yield bi, lfilt, rslices
            bi += 1

    def _proj(Lc, Rs):
        cols = []
        for v in left.columns:
            cols.append(F.coalesce(Lc[v], Rs[v]).alias(v)
                        if v in shared else Lc[v])
        for v in right.columns:
            if v not in shared:
                cols.append(Rs[v])
        return cols

    inner_parts = []
    anti_parts = []
    for bi, lfilt, rslices in _branches():
        Lc = (left.where(lfilt) if lfilt is not None
              else left).alias(f"CJL{bi}")
        anti = Lc
        for si, (rfilt, keys) in enumerate(rslices):
            Rs = (right.where(rfilt) if rfilt is not None
                  else right).alias(f"CJR{bi}_{si}")
            cond = None
            for v in keys:
                c = Lc[v] == Rs[v]
                cond = c if cond is None else (cond & c)
            if how in ("inner", "left"):
                j = (Lc.join(Rs, cond, "inner") if cond is not None
                     else Lc.crossJoin(Rs))
                inner_parts.append(j.select(*_proj(Lc, Rs)))
            if how in ("left", "left_anti"):
                # chained: unmatched in EVERY slice of this class
                anti = (anti.join(Rs, cond, "left_anti")
                        if cond is not None
                        else anti.join(Rs, F.lit(True), "left_anti"))
        if how in ("left", "left_anti"):
            anti_parts.append(anti.select(*left.columns))

    def _union(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    if how == "left_anti":
        return _union(anti_parts), left_nulls
    result = _union(inner_parts)
    if how == "left":
        ext_cols = list(left.columns) + [
            F.lit(None).cast(right.schema[v].dataType).alias(v)
            for v in right.columns if v not in shared]
        result = result.unionByName(
            _union(anti_parts).select(*ext_cols))
    return result, out_nulls


def _compile_expr(expr, df: DataFrame):
    kind = expr[0]
    if kind == "var":
        if expr[1] not in df.columns:
            raise SparqlError(f"filter references unbound var ?{expr[1]}")
        return F.col(expr[1])
    if kind == "lit":
        return F.lit(expr[1])
    if kind == "num":
        return F.lit(expr[1])
    if kind == "or":
        return _compile_expr(expr[1], df) | _compile_expr(expr[2], df)
    if kind == "and":
        return _compile_expr(expr[1], df) & _compile_expr(expr[2], df)
    if kind == "not":
        return ~_compile_expr(expr[1], df)
    if kind == "cmp":
        op, a, b = expr[1], expr[2], expr[3]
        ca, cb = _compile_expr(a, df), _compile_expr(b, df)
        out = {
            "=": ca == cb, "!=": ca != cb, "<": ca < cb,
            ">": ca > cb, "<=": ca <= cb, ">=": ca >= cb,
        }[op]
        # comparing against an xsd:date-typed literal: a non-date
        # lexical on the other side (partial dates, gYear) is a SPARQL
        # type error => the row drops, not a lexicographic near-miss.
        # NB: Spark's cast('2012' AS DATE) is lenient (-> 2012-01-01),
        # so the guard is on the full ISO lexical, not castability.
        for lit_side, other in ((a, cb), (b, ca)):
            if lit_side[0] == "lit" and lit_side[2] == "xsd:date":
                out = out & other.rlike(r"^\d{4}-\d{2}-\d{2}")
        return out
    if kind == "arith":
        # SPARQL numeric ops over lexical storage: operands promote to
        # double via try_cast (a non-numeric lexical -> NULL -> the row
        # drops, SPARQL's error-as-drop); x/0 is a type error per the
        # spec's integer semantics -> NULL, not Infinity
        op = expr[1]
        ca = _compile_expr(expr[2], df).try_cast("double")
        cb = _compile_expr(expr[3], df).try_cast("double")
        if op == "+":
            return ca + cb
        if op == "-":
            return ca - cb
        if op == "*":
            return ca * cb
        return F.when(cb != 0, ca / cb)
    if kind == "regex":
        return _compile_expr(expr[1], df).rlike(expr[2])
    if kind == "bound":
        if expr[1] not in df.columns:
            return F.lit(False)
        return F.col(expr[1]).isNotNull()
    if kind == "func":
        fn, arg = expr[1], _compile_expr(expr[2], df)
        if fn in ("YEAR", "MONTH", "DAY"):
            # YEAR/MONTH/DAY of a partial date (gYear/gYearMonth) is a
            # SPARQL type error => unbound.  Spark's date cast is
            # lenient ('2012' -> 2012-01-01), so gate on the full ISO
            # lexical before casting.
            d = F.when(arg.rlike(r"^\d{4}-\d{2}-\d{2}"),
                       arg.try_cast("date"))
            return {"YEAR": F.year(d), "MONTH": F.month(d),
                    "DAY": F.dayofmonth(d)}[fn]
        if fn == "STR":
            return arg.cast("string")
        if fn == "UCASE":
            return F.upper(arg)
        if fn == "LCASE":
            return F.lower(arg)
        if fn == "STRLEN":
            return F.length(arg)
        if fn in ("ABS", "CEIL", "FLOOR", "ROUND"):
            # numeric builtins promote via try_cast like 'arith': a
            # non-numeric lexical is a SPARQL type error => NULL =>
            # the row drops.  Results stay double so the lexical form
            # matches the arithmetic path ('6.0', not '6').  ROUND
            # follows the SPARQL rule (ties toward +inf: ROUND(-2.5)
            # = -2), NOT Java HALF_UP or Python banker's — floor(x +
            # 0.5) is that rule exactly, in every engine.
            v = arg.try_cast("double")
            if fn == "ABS":
                return F.abs(v)
            if fn == "CEIL":
                return F.ceil(v).cast("double")
            if fn == "FLOOR":
                return F.floor(v).cast("double")
            return F.floor(v + F.lit(0.5)).cast("double")
        if fn == "MD5":
            return F.md5(arg.cast("string"))
        if fn == "SHA1":
            return F.sha1(arg.cast("string"))
        if fn == "SHA256":
            return F.sha2(arg.cast("string"), 256)
    if kind == "nfunc":
        fn, args = expr[1], [_compile_expr(a, df) for a in expr[2]]
        if fn == "CONCAT":
            return F.concat(*[a.cast("string") for a in args])
        if fn == "IF":
            return F.when(args[0], args[1]).otherwise(args[2])
        if fn == "COALESCE":
            return F.coalesce(*args)
        if fn == "SUBSTR":
            s = args[0].cast("string")
            ln = args[2] if len(args) > 2 else F.length(s)
            return s.substr(args[1], ln)
        if fn in ("STRAFTER", "STRBEFORE"):
            s, sep = args[0].cast("string"), args[1].cast("string")
            pos = F.instr(s, sep)
            if fn == "STRAFTER":
                hit = s.substr(pos + F.length(sep), F.length(s))
            else:
                hit = s.substr(F.lit(1), pos - 1)
            return F.when(pos > 0, hit).otherwise("")
        if fn == "STRSTARTS":
            return args[0].startswith(args[1])
        if fn == "CONTAINS":
            return args[0].contains(args[1])
        if fn == "STRENDS":
            return args[0].endswith(args[1])
        if fn == "REPLACE":
            # regex replace; pattern/replacement must be literals and
            # group references ($1) are NOT supported — Java and
            # Python disagree on their syntax, so the compiler only
            # guarantees literal replacements
            pat, rep = expr[2][1], expr[2][2]
            if pat[0] != "lit" or rep[0] != "lit":
                raise SparqlError(
                    "REPLACE requires literal pattern/replacement")
            # Java regexp_replace treats '$' and '\' in the
            # replacement as group references / escapes; the compiler
            # contract is LITERAL replacement, so quote them
            # (Matcher.quoteReplacement semantics) — otherwise '$1'
            # silently substitutes a group and a trailing '$' throws a
            # raw executor-side IllegalArgumentException
            rep_quoted = rep[1].replace("\\", "\\\\").replace("$", "\\$")
            return F.regexp_replace(args[0].cast("string"), pat[1],
                                    rep_quoted)
    raise SparqlError(f"unsupported expression {expr!r}")


def _closure_iris(path_iri: str) -> list[str]:
    if path_iri.startswith(NT):
        names = SUBPROP.get(path_iri[len(NT):])
        if names:
            return [NT + n for n in names]
    return [path_iri]


_DUP_INSENSITIVE = {"MIN", "MAX"}  # + GROUP_CONCAT/COUNT when DISTINCT


def _agg_dup_insensitive(p) -> bool:
    _tag, fn, distinct, _arg, _sep, _alias = p
    return fn in _DUP_INSENSITIVE or (
        fn in ("GROUP_CONCAT", "COUNT") and distinct)


def _count_var_uses(elements: list, uses: dict) -> None:
    """var name -> occurrence count across the whole pattern tree."""
    def expr_vars(e):
        k = e[0]
        if k in ("var", "bound"):
            uses[e[1]] = uses.get(e[1], 0) + 1
        elif k in ("or", "and"):
            expr_vars(e[1])
            expr_vars(e[2])
        elif k == "not":
            expr_vars(e[1])
        elif k in ("cmp", "arith"):
            expr_vars(e[2])
            expr_vars(e[3])
        elif k == "regex":
            expr_vars(e[1])
        elif k == "func":
            expr_vars(e[2])
        elif k == "nfunc":
            for a in e[2]:
                expr_vars(a)

    for el in elements:
        if el[0] == "triple":
            for t in (el[1], *el[2], el[3]):
                if t[0] == "var":
                    uses[t[1]] = uses.get(t[1], 0) + 1
        elif el[0] in ("optional", "not_exists", "exists", "minus"):
            _count_var_uses(el[1], uses)
        elif el[0] == "union":
            for b in el[1]:
                _count_var_uses(b, uses)
        elif el[0] == "filter":
            expr_vars(el[1])
        elif el[0] == "bind":
            expr_vars(el[1])
            uses[el[2]] = uses.get(el[2], 0) + 1
        elif el[0] == "values":
            for v in el[1]:
                uses[v] = uses.get(v, 0) + 1
        elif el[0] == "subquery":
            # only its projected vars are visible to the outer group
            for p in el[1].get("projections", []):
                if p[0] == "var":
                    uses[p[1]] = uses.get(p[1], 0) + 1
                elif p[0] == "agg":
                    uses[p[5]] = uses.get(p[5], 0) + 1


def _star_pivot_rewrite(ast: dict) -> tuple[list, set]:
    """Rewrite star-shaped attribute patterns into ONE pivot scan per
    subject var (the masterlist_query_fast plan, generalized): when a
    query projects only duplicate-insensitive aggregates, every
    top-level pattern ``?x <p> ?v`` (required or single-pattern
    OPTIONAL) whose ?v is used ONLY in such aggregates collapses into
    a per-?x collect_set column of a single predicate-IN scan.  A
    15-predicate report star compiles to one shuffle instead of 15.

    Multiplicity safety: removing the row-multiplying joins is exact
    because every projected aggregate ignores duplicates, bare
    projections are group keys, and ?v appears nowhere else (no
    filters, no joins).  Returns (rewritten elements, array-var set)."""
    projections = ast["projections"]
    aggs = [p for p in projections if p[0] == "agg"]
    if not aggs or not all(_agg_dup_insensitive(p) for p in aggs):
        return ast["where"], set()
    if ast.get("having"):
        # HAVING aggregates may be duplicate-sensitive (COUNT(?v)) and
        # reference vars the use-count below doesn't attribute — skip
        return ast["where"], set()

    def star_subquery(els):
        return any(
            (el[0] == "subquery"
             and (any(p[0] == "star" for p in el[1].get("projections", []))
                  or star_subquery(el[1].get("where", []))))
            or (el[0] in ("optional", "not_exists", "exists", "minus")
                and star_subquery(el[1]))
            or (el[0] == "union" and any(star_subquery(b) for b in el[1]))
            for el in els)
    if star_subquery(ast["where"]):
        # a SELECT * subquery's visible vars aren't enumerable before
        # compilation — the use-count analysis can't be trusted
        return ast["where"], set()
    uses: dict = {}
    _count_var_uses(ast["where"], uses)
    banned = set(ast["group_by"]) | {v for v, _d in ast["order_by"]} | {
        p[1] for p in projections if p[0] == "var"}
    agg_vars = {p[3][1] for p in aggs if p[3][0] == "var"}

    def candidate(el):
        """-> (x, closure, v, required) or None."""
        required = el[0] == "triple"
        t = el if required else (
            el[1][0] if el[0] == "optional" and len(el[1]) == 1
            and el[1][0][0] == "triple" else None)
        if t is None:
            return None
        s, path, o = t[1], t[2], t[3]
        if (s[0] != "var" or o[0] != "var" or len(path) != 1
                or path[0][0] != "iri"):
            return None
        v = o[1]
        if (v == s[1] or uses.get(v, 0) != 1 or v in banned
                or v not in agg_vars):
            return None
        return (s[1], _closure_iris(path[0][1]), v, required)

    by_subject: dict = {}
    for i, el in enumerate(ast["where"]):
        c = candidate(el)
        if c:
            by_subject.setdefault(c[0], []).append((i, c))
    out = list(ast["where"])
    array_vars: set = set()
    for x, cands in by_subject.items():
        if len(cands) < 2:
            continue
        # closures must not overlap (predicate -> var must be unique)
        seen: set = set()
        ok = []
        for i, (xv, closure, v, req) in cands:
            if seen & set(closure):
                continue
            seen |= set(closure)
            ok.append((i, (xv, closure, v, req)))
        if len(ok) < 2:
            continue
        first = ok[0][0]
        specs = [c for _i, c in ok]
        out[first] = ("prebuilt", x, specs)
        for i, _c in ok[1:]:
            out[i] = None
        array_vars |= {v for (_x, _cl, v, _r) in specs}
    return [el for el in out if el is not None], array_vars


def _build_pivot(triples: DataFrame, x: str, specs: list) -> tuple[
        DataFrame, set, bool]:
    """One scan over all star predicates, grouped per subject into
    collect_set array columns; required attrs filter on nonempty."""
    all_iris = sorted({i for (_x, cl, _v, _r) in specs for i in cl})
    base = triples.where(F.col("predicate").isin(all_iris)).select(
        F.col("subject").alias(x), "predicate", "object_lex")
    agg_cols = [
        F.collect_set(
            F.when(F.col("predicate").isin(cl), F.col("object_lex"))
        ).alias(v)
        for (_x, cl, v, _r) in specs
    ]
    df = base.groupBy(x).agg(*agg_cols)
    any_required = False
    for (_x, _cl, v, req) in specs:
        if req:
            df = df.where(F.size(F.col(v)) > 0)
            any_required = True
    nulls = {v for (_x, _cl, v, req) in specs if not req}
    return df, nulls, any_required


def _compile_group(elements: list, triples: DataFrame) -> tuple[DataFrame, set]:
    g = _Group(triples)
    pending: list = []  # leading OPTIONALs, deferred until a required
    # element binds the group (see below)

    def join_in(df, nulls, how="inner"):
        if g.df is None:
            g.df, g.maybe_null = df, set(nulls)
        else:
            g.df, g.maybe_null = _compat_join(
                g.df, g.maybe_null, df, nulls, how=how)
        while g.df is not None and pending:
            sub, sub_nulls = pending.pop(0)
            g.df, g.maybe_null = _compat_join(
                g.df, g.maybe_null, sub, sub_nulls, how="left")

    for el in elements:
        kind = el[0]
        if kind == "triple":
            df, _vars = _scan(triples, el[1], el[2], el[3])
            join_in(df, set())
        elif kind == "prebuilt":
            df, nulls, any_required = _build_pivot(triples, el[1], el[2])
            if any_required:
                join_in(df, nulls)
            elif g.df is None:
                pending.append((df, set(nulls)))
            else:
                join_in(df, nulls, how="left")
        elif kind == "optional":
            sub, sub_nulls = _compile_group(el[1], triples)
            if g.df is None:
                # A leading OPTIONAL under strict SPARQL algebra is
                # LeftJoin(unit, P) = P — which makes it effectively
                # REQUIRED once later patterns join it (the classic
                # leading-OPTIONAL trap; wgs.rq:28 opens with
                # OPTIONAL barcode).  The reference's own report
                # plans treat it as a left join of the group's
                # required core, which is the author intent — defer
                # it until the group has a required binding.
                pending.append((sub, set(sub_nulls)))
            else:
                join_in(sub, sub_nulls, how="left")
        elif kind == "union":
            branches = [_compile_group(b, triples) for b in el[1]]
            all_cols: list[str] = []
            for bdf, _n in branches:
                for c in bdf.columns:
                    if c not in all_cols:
                        all_cols.append(c)
            nulls: set[str] = set()
            udf = None
            for bdf, bn in branches:
                missing = [c for c in all_cols if c not in bdf.columns]
                nulls |= bn | set(missing)
                aligned = bdf.select(
                    *[F.col(c) if c in bdf.columns
                      else F.lit(None).cast("string").alias(c)
                      for c in all_cols])
                udf = aligned if udf is None else udf.unionByName(aligned)
            join_in(udf, nulls)
        elif kind == "values":
            vars_, rows = el[1], el[2]
            spark = triples.sparkSession
            vdf = spark.createDataFrame(
                [tuple(r) for r in rows],
                ", ".join(f"`{v}` string" for v in vars_))
            nulls = {v for i, v in enumerate(vars_)
                     if any(r[i] is None for r in rows)}
            join_in(F.broadcast(vdf), nulls)
        elif kind == "subquery":
            sub_df, sub_nulls = _compile_select(el[1], triples)
            join_in(sub_df, sub_nulls)
        elif kind == "bind":
            if g.df is None:
                raise SparqlError("BIND before any pattern")
            g.df = g.df.withColumn(el[2], _compile_expr(el[1], g.df))
            g.maybe_null.add(el[2])  # e.g. MONTH() of a partial date
        elif kind in ("filter", "not_exists", "exists", "minus"):
            g.filters.append(el)
        else:
            raise SparqlError(f"unsupported element {kind!r}")

    if g.df is None and pending:
        # group of only OPTIONALs: fold them left-to-right
        g.df, g.maybe_null = pending.pop(0)
        while pending:
            sub, sub_nulls = pending.pop(0)
            g.df, g.maybe_null = _compat_join(
                g.df, g.maybe_null, sub, sub_nulls, how="left")
    if g.df is None:
        raise SparqlError("empty group pattern")

    # group-end: FILTERs apply to the completed group solution
    for el in g.filters:
        kind = el[0]
        if kind == "filter":
            g.df = g.df.where(_compile_expr(el[1], g.df))
        elif kind in ("not_exists", "minus"):
            sub, sub_nulls = _compile_group(el[1], triples)
            shared = sorted(set(g.df.columns) & set(sub.columns))
            if not shared and kind == "minus":
                continue  # MINUS with disjoint domains removes nothing
            g.df, _ = _compat_join(g.df, g.maybe_null,
                                   sub.select(*shared), sub_nulls,
                                   how="left_anti")
        elif kind == "exists":
            sub, _sub_nulls = _compile_group(el[1], triples)
            shared = sorted(set(g.df.columns) & set(sub.columns))
            if not shared:
                raise SparqlError("EXISTS with no shared variables")
            g.df = g.df.join(sub.select(*shared), on=shared,
                             how="left_semi")
    return g.df, g.maybe_null


def _agg_column(proj, df: DataFrame, array_vars: set = frozenset()):
    _tag, fn, distinct, arg, sep, alias = proj
    if arg[0] == "star":
        return F.count(F.lit(1)).alias(alias)
    if arg[0] != "var":
        raise SparqlError("aggregate over a non-variable is unsupported")
    if arg[1] in array_vars:
        # star-pivot column: the var is a per-subject collect_set array
        # (rewrite fires only for duplicate-insensitive aggregates)
        col = F.col(arg[1])
        merged = F.array_distinct(F.flatten(F.collect_list(col)))
        if fn == "GROUP_CONCAT":
            return F.concat_ws(sep, F.sort_array(merged)).alias(alias)
        if fn == "MIN":
            return F.min(F.array_min(col)).alias(alias)
        if fn == "MAX":
            return F.max(F.array_max(col)).alias(alias)
        if fn == "COUNT":
            return F.size(merged).alias(alias)
        raise SparqlError(f"unexpected pivot aggregate {fn}")
    if arg[1] not in df.columns:
        # aggregating a never-bound var (get-tagged-strain.rq projects
        # ?constellation / ?country which the WHERE never binds):
        # GROUP_CONCAT over nothing is "", other aggregates are unbound
        if fn == "GROUP_CONCAT":
            return F.lit("").alias(alias)
        if fn == "COUNT":
            return F.lit(0).alias(alias)
        return F.lit(None).cast("string").alias(alias)
    col = F.col(arg[1])
    if fn == "GROUP_CONCAT":
        # deterministic: sort_array over the collected values (A1
        # semantics, views.group_concat)
        arr = F.collect_set(col) if distinct else F.collect_list(col)
        return F.concat_ws(sep, F.sort_array(arr)).alias(alias)
    agg = {"COUNT": F.count, "MIN": F.min, "MAX": F.max, "SUM": F.sum,
           "AVG": F.avg, "SAMPLE": F.first}[fn]
    if fn == "COUNT" and distinct:
        return F.countDistinct(col).alias(alias)
    return agg(col).alias(alias)


def _compile_ask(ast: dict, triples: DataFrame) -> DataFrame:
    """ASK -> one row, column `ask` boolean.  limit(1) bounds the work
    (AQE cancels remaining partitions once a row is found); the global
    aggregate turns zero rows into `false`."""
    sol, _nulls = _compile_group(ast["where"], triples)
    return sol.limit(1).groupBy().agg(
        (F.count(F.lit(1)) > F.lit(0)).alias("ask"))


def _compile_describe(ast: dict, triples: DataFrame) -> DataFrame:
    """DESCRIBE -> the triple rows whose subject is a described
    resource: distinct described IRIs (var bindings and/or literal
    IRIs) semi-joined against the subject column — one semi join, no
    collect; AQE broadcasts the (typically tiny) described set."""
    spark = triples.sparkSession
    frames = []
    consts = [t[1] for t in ast["terms"] if t[0] != "var"]
    if consts:
        frames.append(spark.createDataFrame(
            [(c,) for c in consts], "_described string"))
    var_terms = [t[1] for t in ast["terms"] if t[0] == "var"]
    if var_terms:
        sol, _nulls = _compile_group(ast["where"], triples)
        for v in var_terms:
            if v not in sol.columns:
                raise SparqlError(f"DESCRIBE ?{v} is not bound by WHERE")
            frames.append(sol.select(F.col(v).alias("_described"))
                          .where(F.col(v).isNotNull()))
    subjects = frames[0]
    for extra in frames[1:]:
        subjects = subjects.unionByName(extra)
    return triples.join(
        subjects.distinct(),
        triples["subject"] == F.col("_described"), "left_semi")


def _rewrite_having(expr, hidden: list):
    """Replace each ('aggcall', fn, distinct, arg, sep) node in a
    HAVING expression with a var reference to a hidden aggregate
    column (appended to `hidden` as a projection tuple)."""
    if isinstance(expr, tuple):
        if expr[0] == "aggcall":
            alias = f"__hav{len(hidden)}"
            hidden.append(("agg", expr[1], expr[2], expr[3], expr[4], alias))
            return ("var", alias)
        return tuple(_rewrite_having(x, hidden) for x in expr)
    if isinstance(expr, list):
        return [_rewrite_having(x, hidden) for x in expr]
    return expr


def compile_sparql(ast: dict, triples: DataFrame) -> DataFrame:
    """Compile a parsed query (SELECT / ASK / DESCRIBE) over a
    (subject, predicate, object_lex, object_dtype) triple DataFrame.
    Star-shaped aggregate-only attribute patterns compile through a
    single pivot scan per subject var (see _star_pivot_rewrite)."""
    form = ast.get("form", "select")
    if form == "ask":
        return _compile_ask(ast, triples)
    if form == "describe":
        return _compile_describe(ast, triples)
    df, _nulls = _compile_select(ast, triples)
    return df


def _compile_select(ast: dict, triples: DataFrame) -> tuple[DataFrame, set]:
    """SELECT -> (DataFrame, maybe-null projected vars).  The null set
    feeds subquery joins (a subquery's bindings join into the
    enclosing group with the same null-tolerant compatibility rules as
    OPTIONAL output)."""
    where, array_vars = _star_pivot_rewrite(ast)
    df, inner_nulls = _compile_group(where, triples)
    projections = ast["projections"]
    if any(p[0] == "star" for p in projections):
        if len(projections) != 1:
            raise SparqlError("SELECT * cannot mix with other projections")
        if ast["group_by"]:
            raise SparqlError("SELECT * with GROUP BY is not valid SPARQL")
        projections = [("var", c) for c in df.columns
                       if not c.startswith("__")]
    group_by = ast["group_by"]
    havings = ast.get("having") or []
    has_agg = any(p[0] == "agg" for p in projections)
    nulls: set = set()
    if group_by or has_agg:
        keys = group_by or []
        hidden: list = []
        hav_exprs = [_rewrite_having(h, hidden) for h in havings]
        aggs = [_agg_column(p, df, array_vars)
                for p in projections + hidden if p[0] == "agg"]
        bare = [p[1] for p in projections if p[0] == "var"]
        for v in bare:
            if v not in keys:
                raise SparqlError(
                    f"?{v} is projected but neither grouped nor aggregated")
        grouped = df.groupBy(*keys).agg(*aggs) if aggs else \
            df.select(*keys).dropDuplicates()
        for he in hav_exprs:
            grouped = grouped.where(_compile_expr(he, grouped))
        order = [p[5] if p[0] == "agg" else p[1] for p in projections]
        df = grouped.select(*order)
        for p in projections:
            if p[0] == "var":
                if p[1] in inner_nulls:
                    nulls.add(p[1])
            elif p[1] != "COUNT" and p[3][0] == "var" \
                    and p[3][1] in inner_nulls:
                nulls.add(p[5])  # aggregate over a maybe-null var
    elif havings:
        raise SparqlError("HAVING without GROUP BY or aggregates")
    else:
        df = df.select(*[p[1] for p in projections])
        nulls = {p[1] for p in projections if p[1] in inner_nulls}
    if ast["distinct"]:
        df = df.dropDuplicates()
    for var, desc in ast["order_by"]:
        df = df.orderBy(F.col(var).desc() if desc else F.col(var))
    if ast.get("offset"):
        df = df.offset(ast["offset"])
    if ast["limit"] is not None:
        df = df.limit(ast["limit"])
    return df, nulls


def parse_sparql_update(text: str,
                        macros: dict[str, str] | None = None) -> dict:
    """Parse a DELETE { templates } WHERE { patterns } update (the
    reference's `update FILE.rq` surface, ui.py:538-552; the 7 shipped
    update files are all delete-shaped)."""
    for k, v in (macros or {}).items():
        text = text.replace(k, str(v))
    p = _Parser(tokenize(text))
    while p.kw() == "PREFIX":
        p.next()
        pname = p.next()
        if not pname.endswith(":"):
            pname = pname.split(":", 1)[0] + ":"
        iri_tok = p.next()
        p.prefixes[pname[:-1]] = iri_tok[1:-1]
    if p.kw() == "INSERT":
        raise SparqlError("INSERT updates are not supported — use the "
                          "upload/merge path for additions")
    p.expect("DELETE")
    templates = [el for el in p.parse_ggp() if el[0] == "triple"]
    if not templates:
        raise SparqlError("DELETE with no template triples")
    p.expect("WHERE")
    where = p.parse_ggp()
    return {"templates": templates, "where": where}


def compile_update_rows(ast: dict, triples: DataFrame) -> DataFrame:
    """The (subject, predicate, object_lex) rows a DELETE/WHERE update
    removes: solve WHERE, instantiate each template against every
    solution."""
    sol, _nulls = _compile_group(ast["where"], triples)
    outs = []
    for (_tag, s, path, o) in ast["templates"]:
        if len(path) != 1:
            raise SparqlError("property paths in DELETE templates are "
                              "not supported")
        p = path[0]

        def term_col(t):
            if t[0] == "var":
                if t[1] not in sol.columns:
                    raise SparqlError(
                        f"template var ?{t[1]} is not bound by WHERE")
                return F.col(t[1])
            if t[0] == "iri":
                return F.lit(t[1])
            return F.lit(str(t[1]))

        outs.append(sol.select(
            term_col(s).alias("subject"),
            term_col(p).alias("predicate"),
            term_col(o).alias("object_lex"),
        ))
    df = outs[0]
    for extra in outs[1:]:
        df = df.unionByName(extra)
    return df.dropDuplicates()


def sparql_update(spark, store, text: str,
                  macros: dict[str, str] | None = None) -> int:
    """Run a DELETE/WHERE update file against a TripleStore: solves the
    WHERE over the raw triples, instantiates the delete templates, and
    removes the rows (canonical view mirrored).  Returns rows deleted."""
    ast = parse_sparql_update(text, macros=macros)
    raw = store.read(spark, "triples")
    if raw is None:
        return 0
    rows = compile_update_rows(ast, raw).persist()
    n = rows.count()
    if n:
        store.delete_rows(spark, rows, stage=None)
    rows.unpersist()
    return n


def _where_var_kinds(elements: list) -> set:
    """Vars that bind IRIs by construction: any var appearing in a
    subject or predicate position of the WHERE pattern tree."""
    uri_vars: set = set()

    def walk(els):
        for el in els:
            if el[0] == "triple":
                if el[1][0] == "var":
                    uri_vars.add(el[1][1])
                for p in el[2]:
                    if p[0] == "var":
                        uri_vars.add(p[1])
            elif el[0] in ("optional", "not_exists", "exists", "minus"):
                walk(el[1])
            elif el[0] == "union":
                for b in el[1]:
                    walk(b)
    walk(elements)
    return uri_vars


def parse_sparql_construct(text: str,
                           macros: dict[str, str] | None = None) -> dict:
    """CONSTRUCT { templates } WHERE { patterns } (the reference's
    `construct FILE.rq` surface, ui.py:517-535)."""
    for k, v in (macros or {}).items():
        text = text.replace(k, str(v))
    p = _Parser(tokenize(text))
    while p.kw() == "PREFIX":
        p.next()
        pname = p.next()
        if not pname.endswith(":"):
            pname = pname.split(":", 1)[0] + ":"
        iri_tok = p.next()
        p.prefixes[pname[:-1]] = iri_tok[1:-1]
    p.expect("CONSTRUCT")
    templates = [el for el in p.parse_ggp() if el[0] == "triple"]
    if not templates:
        raise SparqlError("CONSTRUCT with no template triples")
    p.expect("WHERE")
    where = p.parse_ggp()
    return {"templates": templates, "where": where}


def compile_construct(ast: dict, triples: DataFrame) -> DataFrame:
    """CONSTRUCT -> a (subject, predicate, object_lex, object_dtype)
    triple DataFrame, mergeable/serializable like any extraction
    output.  Object dtype: 'uri' for IRI terms and for vars that bind
    IRIs by construction (subject/predicate position in WHERE), ''
    otherwise (the WHERE solution carries lexicals only)."""
    sol, _nulls = _compile_group(ast["where"], triples)
    uri_vars = _where_var_kinds(ast["where"])
    outs = []
    for (_tag, s, path, o) in ast["templates"]:
        if len(path) != 1:
            raise SparqlError("property paths in CONSTRUCT templates "
                              "are not supported")
        p = path[0]

        def term_col(t):
            if t[0] == "var":
                if t[1] not in sol.columns:
                    raise SparqlError(
                        f"template var ?{t[1]} is not bound by WHERE")
                return F.col(t[1])
            if t[0] == "iri":
                return F.lit(t[1])
            return F.lit(str(t[1]))

        if o[0] == "iri" or (o[0] == "var" and o[1] in uri_vars):
            dt = F.lit("uri")
        elif o[0] == "lit" and o[2]:
            dt = F.lit(o[2])
        else:
            dt = F.lit("")
        outs.append(sol.select(
            term_col(s).alias("subject"),
            term_col(p).alias("predicate"),
            term_col(o).alias("object_lex"),
            dt.alias("object_dtype"),
        ).where(F.col("subject").isNotNull()
                & F.col("object_lex").isNotNull()))
    df = outs[0]
    for extra in outs[1:]:
        df = df.unionByName(extra)
    return df.dropDuplicates()


def sparql_to_df(spark, text: str, triples_raw: DataFrame,
                 triples_canonical: DataFrame | None = None,
                 macros: dict[str, str] | None = None) -> DataFrame:
    """Parse + compile a SPARQL file.  FROM onto:disable-sameAs picks
    the raw triple table; otherwise the canonical (sameAs-resolved)
    view — the reference's default GraphDB behavior."""
    ast = parse_sparql(text, macros=macros)
    if ast["disable_sameas"] or triples_canonical is None:
        return compile_sparql(ast, triples_raw)
    return compile_sparql(ast, triples_canonical)
