"""Per-file text parsers: content string -> rows/columns of cells.

Reproduces the observable behavior of the reference's parsers:
  - FASTA (reference: octofludb/classes.py:324-349): '>' headers split
    on '|', sequence = concatenation of following lines with ALL
    whitespace removed (the reference's sepBy1 on [\\r\\n\\t ]+).
  - TSV (classes.py:270-290): first row is the header; cells stripped.
  - id lists (ui.py:600-619): one identifier per line.

These run inside mapInPandas batches; each call handles ONE file's
content (files are the parallelism unit — the per-file python loop is
the applyInPandas idiom, not per-row UDF work).
"""

from __future__ import annotations

import re

_WS = re.compile(r"[\r\n\t ]+")
_ENTRY_SPLIT = re.compile(r"(?m)^>")


def parse_fasta(text: str, sep: str = "|") -> list[list[str]]:
    """-> list of rows: header fields + [sequence]."""
    rows: list[list[str]] = []
    chunks = _ENTRY_SPLIT.split(text)
    for chunk in chunks[1:]:  # chunk 0 is anything before the first '>'
        lines = chunk.split("\n")
        header = lines[0].rstrip("\r")
        seq = _WS.sub("", "\n".join(lines[1:]))
        rows.append(header.split(sep) + [seq])
    return rows


def parse_tsv(text: str, delimiter: str = "\t") -> dict[str, list[str | None]]:
    """-> {column_name: [cells...]}; header from the first line."""
    lines = [s.rstrip("\r\n") for s in text.split("\n")]
    while lines and lines[-1] == "":
        lines.pop()
    if not lines:
        return {}
    rows = [r.split(delimiter) for r in lines]
    header = [c.strip() for c in rows[0]]
    body = rows[1:]
    out: dict[str, list[str | None]] = {}
    for i, name in enumerate(header):
        out[name] = [
            (r[i].strip() if i < len(r) else None) for r in body
        ]
    return out


def parse_idlist(text: str) -> list[str]:
    return [line.strip() for line in text.splitlines() if line.strip()]
