"""Turtle-compatible text sink (reference S13: with_graph,
ui.py:20-39, rdflib sorted turtle).

Produces deterministic, spec-valid Turtle: prefixes bound exactly like
the reference's namespace manager (nomenclature.py:22-27), subjects
grouped with ';' / ',' continuation, typed literals as
"lex"^^xsd:type, URI objects abbreviated.  Ordering is deterministic
(lexicographic by prefixed subject, predicate, object) — the
reference's rdflib serializer uses its own internal subject order, so
the byte stream differs, but the parsed triple SET is identical
(verified in tests by a mini turtle parser round-trip against
the transcribed gisaid golden)."""

from __future__ import annotations

import pandas as pd

from octofludb_spark.functions.uri import (
    DT_PLAIN,
    DT_URI,
    NCOUNTRY,
    NI,
    NQUERY,
    NT,
    NTAG,
    NUSA,
    OWL_SAMEAS,
)

PREFIXES = [
    ("fid", NI),
    ("f", NT),
    ("usa", NUSA),
    ("world", NCOUNTRY),
    ("query", NQUERY),
    ("tag", NTAG),
    ("owl", "http://www.w3.org/2002/07/owl#"),
    ("rdfs", "http://www.w3.org/2000/01/rdf-schema#"),
    ("xsd", "http://www.w3.org/2001/XMLSchema#"),
]
# longest namespace first so usa:/world: win over world:-prefixed usa
_ORDERED = sorted(PREFIXES, key=lambda kv: len(kv[1]), reverse=True)


def _abbrev(iri: str) -> str:
    for pfx, ns in _ORDERED:
        if iri.startswith(ns):
            local = iri[len(ns):]
            if local and all(c.isalnum() or c in "_-." for c in local):
                return f"{pfx}:{local}"
    return f"<{iri}>"


def _literal(lex: str, dtype: str) -> str:
    esc = (
        lex.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )
    if dtype and dtype != DT_URI:
        short = dtype if ":" in dtype and not dtype.startswith("http") \
            else _abbrev(dtype)
        return f'"{esc}"^^{short}'
    return f'"{esc}"'


def triples_to_turtle(pdf: pd.DataFrame) -> str:
    """Serialize a (subject, predicate, object_lex, object_dtype)
    pandas frame (collected triples) to turtle text."""
    used = set()
    rows = []
    for r in pdf.itertuples(index=False):
        s = _abbrev(r.subject)
        p = "owl:sameAs" if r.predicate == OWL_SAMEAS else _abbrev(r.predicate)
        if r.object_dtype == DT_URI:
            o = _abbrev(r.object_lex)
        else:
            o = _literal(r.object_lex, r.object_dtype or "")
        for term in (s, p, o):
            if term.startswith('"'):
                if "^^" in term:  # typed literal -> its dtype prefix
                    used.add(term.rsplit("^^", 1)[1].split(":", 1)[0])
            elif ":" in term and not term.startswith("<"):
                used.add(term.split(":", 1)[0])
        rows.append((s, p, o))
    rows.sort()

    out = []
    for pfx, ns in PREFIXES:
        if pfx in used:
            out.append(f"@prefix {pfx}: <{ns}> .")
    out.append("")

    i = 0
    while i < len(rows):
        s = rows[i][0]
        group = []
        while i < len(rows) and rows[i][0] == s:
            group.append(rows[i])
            i += 1
        parts = []
        j = 0
        while j < len(group):
            p = group[j][1]
            objs = []
            while j < len(group) and group[j][1] == p:
                objs.append(group[j][2])
                j += 1
            parts.append((p, objs))
        lines = []
        for k, (p, objs) in enumerate(parts):
            obj_txt = ",\n        ".join(objs)
            prefix = f"{s} " if k == 0 else "    "
            sep = " ;" if k < len(parts) - 1 else " ."
            lines.append(f"{prefix}{p} {obj_txt}{sep}")
        out.extend(lines)
        out.append("")
    return "\n".join(out).rstrip() + "\n"


_XSD_NS = "http://www.w3.org/2001/XMLSchema#"


def turtle_to_triples(text: str):
    """Dtype-preserving turtle reader — the `upload` source path
    (reference ui.py:555-580 loads .ttl files into the db).  Handles
    the prefix/';'/','-grouped shape this sink and rdflib emit.
    Returns a list of (subject, predicate, object_lex, object_dtype)
    rows following the store conventions: DT_URI for IRI objects, ''
    for plain literals, short ``xsd:*`` tags for typed literals
    (rdflib's bare integer/double/boolean tokens included)."""
    import re

    prefixes: dict[str, str] = {}
    rows: list[tuple[str, str, str, str]] = []
    # join logical statements: accumulate until '.', honoring strings
    text = re.sub(r"#[^\n\"]*$", "", text, flags=re.M)
    token_re = re.compile(
        r'"(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>]*>|[\w:]+))?|<[^>]*>|[^\s,;]+|[,;]'
    )
    int_re = re.compile(r"[+-]?\d+\Z")
    dec_re = re.compile(r"[+-]?(\d+\.\d*|\.\d+)([eE][+-]?\d+)?\Z"
                        r"|[+-]?\d+[eE][+-]?\d+\Z")

    def expand_iri(tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            if pfx in prefixes:
                return prefixes[pfx] + local
        return tok

    def unescape(lex: str) -> str:
        return lex.replace("\\\\", "\x00").replace('\\"', '"') \
            .replace("\\n", "\n").replace("\\r", "\r") \
            .replace("\\t", "\t").replace("\x00", "\\")

    def obj_row(tok: str) -> tuple[str, str]:
        """(object_lex, object_dtype) for an object token."""
        if tok.startswith('"'):
            m = re.match(r'"((?:[^"\\]|\\.)*)"(?:\^\^(.+))?\Z', tok)
            lex = unescape(m.group(1))
            dt_tok = m.group(2)
            if not dt_tok:
                return lex, DT_PLAIN
            dt = expand_iri(dt_tok) if (
                dt_tok.startswith("<") or dt_tok.split(":", 1)[0] in prefixes
            ) else dt_tok
            if dt.startswith(_XSD_NS):
                dt = "xsd:" + dt[len(_XSD_NS):]
            return lex, dt
        if tok.startswith("<") or (
            ":" in tok and tok.split(":", 1)[0] in prefixes
        ):
            return expand_iri(tok), DT_URI
        # rdflib shorthand literals (turtle spec numeric/boolean forms)
        if tok in ("true", "false"):
            return tok, "xsd:boolean"
        if int_re.match(tok):
            return tok, "xsd:integer"
        if dec_re.match(tok):
            return tok, "xsd:double"
        return tok, DT_PLAIN

    stmt: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("@prefix"):
            m = re.match(r"@prefix\s+(\w*):\s*<([^>]*)>", line)
            if m:
                prefixes[m.group(1)] = m.group(2)
            continue
        stmt.append(line)
        if line.endswith(" .") or line == "." or line.endswith("> .") or line.rstrip().endswith("."):
            full = " ".join(stmt)
            stmt = []
            toks = token_re.findall(full.rstrip(" ."))
            if not toks:
                continue
            subj = expand_iri(toks[0])
            k = 1
            pred = None
            while k < len(toks):
                tok = toks[k]
                if tok == ";":
                    pred = None
                    k += 1
                    continue
                if tok == ",":
                    k += 1
                    continue
                if pred is None:
                    pred = (OWL_SAMEAS if tok == "owl:sameAs"
                            else expand_iri(tok))
                    k += 1
                    continue
                lex, dt = obj_row(tok)
                rows.append((subj, pred, lex, dt))
                k += 1
    return rows


def turtle_to_frame(text: str) -> pd.DataFrame:
    """turtle_to_triples as a (subject, predicate, object_lex,
    object_dtype) pandas frame, ready for TripleStore.merge_triples."""
    return pd.DataFrame(
        turtle_to_triples(text),
        columns=["subject", "predicate", "object_lex", "object_dtype"],
    )


def read_turtle(spark, paths):
    """Distributed turtle source for `upload` (reference ui.py:555-580
    loads .ttl files driver-side, file at a time; here each file
    parses in its own executor task — one wholetext row per file, the
    same reader, Arrow-batched out).  Returns a (subject, predicate,
    object_lex, object_dtype) DataFrame."""
    src = spark.read.text(list(paths), wholetext=True)

    def parse(batches):
        for pdf in batches:
            for text in pdf["value"]:
                yield turtle_to_frame(text)

    return src.mapInPandas(
        parse,
        "subject string, predicate string, object_lex string, "
        "object_dtype string",
    )


def parse_turtle(text: str) -> set[tuple[str, str, str]]:
    """Minimal turtle reader for golden-file comparison: returns the
    (subject, predicate, object-lex-or-IRI) triple SET with prefixes
    expanded (dtype dropped — byte-format-insensitive comparison)."""
    return {(s, p, o) for (s, p, o, _dt) in turtle_to_triples(text)}
