"""Ingestion recipes: one function per source shape, each mapping a
file's content to a (s, p, o, dt) pandas DataFrame via explicit
column->Token assignments (no inference), mirroring the reference's
recipes (reference: octofludb/recipes.py — cited per function).

All of these execute inside mapInPandas batches.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd

from octofludb_spark.extract.emit import (
    P_FILE,
    P_NAME,
    P_TAG,
    P_TIME,
    TripleSink,
    TypedColumn,
    emit_table,
)
from octofludb_spark.extract.infer import (
    type_headless_table,
    type_ragged,
    type_table,
)
from octofludb_spark.extract.parse import (parse_fasta, parse_idlist,
                                           parse_tsv, split_readlines)
from octofludb_spark.functions import recognizers as R
from octofludb_spark.functions.uri import (
    DT_DOUBLE,
    DT_INT,
    DT_PLAIN,
    DT_URI,
    make_tag_uri,
    make_uri,
    make_uri_series,
)

_EMPTY = pd.DataFrame({"s": pd.Series(dtype=object), "p": pd.Series(dtype=object),
                       "o": pd.Series(dtype=object), "dt": pd.Series(dtype=object)})


def typed(recog: R.Recog, values, field: Optional[str] = None,
          na_str=()) -> TypedColumn:
    """Apply one recognizer to a value list -> TypedColumn."""
    s = pd.Series(list(values), dtype=object)
    if len(na_str):
        s = s.where(~s.isin(list(na_str)), None)
    res = R.run_unique(recog, s)
    clean = res["clean"].where(s.notna(), None)
    dtype = res["dtype"].where(s.notna(), None) if "dtype" in res else None
    return TypedColumn(recog=recog, dirty=s, clean=clean, field=field, dtype=dtype)


def tag_node_triples(tag: Optional[str], filename: Optional[str],
                     run_ts: Optional[str]) -> pd.DataFrame:
    """addTag (classes.py:104-123): tag node name/time/file triples.
    The reference stamps wall-clock; we take an injected run_ts for
    deterministic output."""
    if not tag:
        return _EMPTY.copy()
    taguri = make_tag_uri(tag)
    rows = [(taguri, P_NAME, tag, DT_PLAIN)]
    if run_ts:
        rows.append((taguri, P_TIME, run_ts, "xsd:dateTime"))
    if filename:
        rows.append((taguri, P_FILE, filename, DT_PLAIN))
    return pd.DataFrame(rows, columns=["s", "p", "o", "dt"])


def fasta_triples(content: str, levels=None, na_str=(), taguri=None,
                  classifiers=None) -> pd.DataFrame:
    """prep fasta (ui.py:883-929 via classes.Ragged)."""
    rows = parse_fasta(content)
    if not rows:
        return _EMPTY.copy()
    arities = {len(r) for r in rows}
    dfs = []
    if len(arities) == 1:
        cols = type_headless_table(rows, classifiers=classifiers, na_str=na_str)
        dfs.append(emit_table(cols, levels=levels, taguri=taguri))
    else:
        for cols, _ in type_ragged(rows, classifiers=classifiers, na_str=na_str):
            dfs.append(emit_table(cols, levels=levels, taguri=taguri))
    return pd.concat(dfs, ignore_index=True)


def table_triples(content: str, levels=None, na_str=(), taguri=None,
                  classifiers=None) -> pd.DataFrame:
    """prep table (classes.Table): headered TSV with column inference."""
    data = parse_tsv(content)
    if not data:
        return _EMPTY.copy()
    cols = type_table(data, classifiers=classifiers, na_str=na_str)
    return emit_table(cols, levels=levels, taguri=taguri)


def idlist_triples(content: str, taguri: Optional[str]) -> pd.DataFrame:
    """prep tag (ui.py:600-619): (make_uri(id), f:tag, taguri)."""
    if not taguri:
        return _EMPTY.copy()
    ids = parse_idlist(content)
    if not ids:
        return _EMPTY.copy()
    uris = make_uri_series(pd.Series(ids, dtype=object))
    sink = TripleSink()
    sink.add(uris, P_TAG, taguri, DT_URI)
    return sink.frame()


_BLAST_FIELDS = [
    ("pident", float, DT_DOUBLE), ("length", int, DT_INT),
    ("mismatch", int, DT_INT), ("gapopen", int, DT_INT),
    ("qstart", int, DT_INT), ("qend", int, DT_INT),
    ("sstart", int, DT_INT), ("send", int, DT_INT),
    ("evalue", float, DT_DOUBLE), ("bitscore", float, DT_DOUBLE),
]


def blast_triples(content: str, taguri=None) -> pd.DataFrame:
    """mk_blast (recipes.py:21-71): 12-field outfmt-6 rows; hit node
    keyed blast/{qseqid}-{sseqid}-{bitscore}."""
    rows = [ln.split("\t") for ln in split_readlines(content) if ln.strip()]
    rows = [r for r in rows if len(r) == 12]
    if not rows:
        return _EMPTY.copy()
    cols = list(zip(*rows))
    qseqid = pd.Series(cols[0], dtype=object)
    sseqid = pd.Series(cols[1], dtype=object)
    bit_raw = pd.Series(cols[11], dtype=object).astype(str).str.strip()
    huid = make_uri_series("blast/" + qseqid.astype(str) + "-"
                           + sseqid.astype(str) + "-" + bit_raw)
    sink = TripleSink()
    from octofludb_spark.functions.uri import NT
    sink.add(huid, NT + "qseqid", make_uri_series(qseqid), DT_URI)
    sink.add(huid, NT + "sseqid", make_uri_series(sseqid), DT_URI)
    raw = {"pident": cols[2], "length": cols[3], "mismatch": cols[4],
           "gapopen": cols[5], "qstart": cols[6], "qend": cols[7],
           "sstart": cols[8], "send": cols[9], "evalue": cols[10],
           "bitscore": cols[11]}
    for name, cast, dt in _BLAST_FIELDS:
        vals = pd.Series(
            [str(cast(v.strip())) for v in raw[name]], dtype=object
        )
        sink.add(huid, NT + name, vals, dt)
    if taguri:
        sink.add(huid, P_TAG, taguri, DT_URI)
    return sink.frame()


_IVR_STRAIN_PAT = re.compile(r"[ABCD]/[^()\[\]]+")


def ivr_triples(content: str, taguri=None) -> pd.DataFrame:
    """mk_influenza_na (recipes.py:74-110): fixed 11-column IVR layout;
    strain extracted by regex from column 7."""
    rows = [ln.split("\t") for ln in split_readlines(content) if ln.strip()]
    rows = [r for r in rows if len(r) >= 11]
    if not rows:
        return _EMPTY.copy()
    cols = list(zip(*[r[:11] for r in rows]))

    def strain_of(x):
        m = _IVR_STRAIN_PAT.search(x)
        return m.group(0) if m else None

    table = [
        typed(R.GENBANK, cols[0]),
        typed(R.UNKNOWN, [x.lower() for x in cols[1]], field="host"),
        typed(R.SEGMENT_NUMBER, cols[2]),
        typed(R.SUBTYPE, cols[3]),
        typed(R.COUNTRY, cols[4]),
        typed(R.DATE, cols[5]),
        typed(R.INTEGER, [x.lower() for x in cols[6]], field="length"),
        typed(R.STRAIN, [strain_of(x) for x in cols[7]]),
        typed(R.UNKNOWN, [x.strip() for x in cols[10]], field="genome_status"),
    ]
    return emit_table(table, taguri=taguri)


def ird_triples(content: str, taguri=None) -> pd.DataFrame:
    """mk_ird (recipes.py:113-151): 15-column IRD layout, NA='-N/A-'.
    Lines split readlines-style: the last field of a newline-terminated
    line keeps its terminator, which the strain grammar rejects —
    reference-observable on 12-field lines."""
    na = ("-N/A-",)
    rows = [ln.split("\t") for ln in split_readlines(content) if ln.strip()]
    rows = [r for r in rows if len(r) >= 12]
    if not rows:
        return _EMPTY.copy()
    cols = list(zip(*[r[:12] for r in rows]))
    table = [
        typed(R.SEGMENT_NUMBER, cols[0], na_str=na),
        typed(R.GENBANK, cols[2], field="genbank_id", na_str=na),
        typed(R.INTEGER, cols[4], field="length", na_str=na),
        typed(R.SUBTYPE, cols[5], na_str=na),
        typed(R.DATE, cols[6], na_str=na),
        typed(R.UNKNOWN, [x.replace("IRD:", "").lower() for x in cols[7]],
              field="host", na_str=na),
        typed(R.COUNTRY, cols[8]),
        typed(R.UNKNOWN, cols[10], field="flu_season", na_str=na),
        typed(R.STRAIN, cols[11], field="strain_name", na_str=na),
    ]
    return emit_table(table, taguri=taguri)


_GIS_SEGMENTS = ("PB2", "PB1", "PA", "HA", "NP", "NA", "MP", "NS")
_EPI_SUFFIX = re.compile(r" *\|.*")
_GIS_STRAIN_PAREN = re.compile(r"^\([ABCD]/[^/()\[\]]+/.+\)")
_GIS_STRAIN_PLAIN = re.compile(r"^[ABCD]/[^/()\[\]]+/.+")


def _gis_strain_clean(name: str) -> Optional[str]:
    """p_strain.parse (non-strict prefix) + clean_strain
    (domain_identifier.py:9-22), as used by mk_gis (recipes.py:166)."""
    m = _GIS_STRAIN_PAREN.match(name) or _GIS_STRAIN_PLAIN.match(name)
    if not m:
        return None
    x = m.group(0).strip().replace(" ", "_")
    x = re.sub(r"^\((.*)\)$", r"\1", x)
    x = re.sub(r"_*\(.*\)_*$", "", x)
    x = re.sub(r"_*\[.*\]_*$", "", x)
    return x


def gisaid_triples(content: str, taguri=None) -> pd.DataFrame:
    """mk_gis (recipes.py:154-234) over a TSV-shaped GISAID metadata
    sheet (the column semantics are identical to the Excel path)."""
    return gisaid_triples_columns(parse_tsv(content), taguri=taguri)


def gisaid_triples_excel(data: bytes, taguri=None) -> pd.DataFrame:
    """mk_gis over a REAL binary Excel sheet (.xls OLE2/BIFF8 or
    .xlsx), the reference's native GISAID input (`prep gis gisaid.xls`,
    classes.py:258-268) — parsed by the stdlib reader in extract/xls.py,
    no xlrd/openpyxl needed."""
    from octofludb_spark.extract.xls import excel_columns

    return gisaid_triples_columns(excel_columns(data), taguri=taguri)


def gisaid_rows(d: dict):
    """Yield one exploded record dict per row x segment x (epi, gbk)
    pair — the shared core of the per-file and batched GISAID
    recipes (mk_gis loop, reference recipes.py:161-221).  Zip
    truncation of unequal epi/genbank lists is faithful; the
    reference's inner try only skips a Segment_Id cell with no .split
    (None / missing) — an EMPTY string is processed ([''], so a bare
    INSDC genbank id still anchors the segment)."""
    n = len(d["Isolate_Id"])

    def cell(key, i):
        return d[key][i] if key in d else None

    for i in range(n):
        name = d["Isolate_Name"][i] or ""
        strain_clean = _gis_strain_clean(name)
        if strain_clean is None:
            continue  # reference skips the row on strain-parse failure
        try:
            country = (cell("Location", i) or "").split(" / ")[1]
        except IndexError:
            country = None
        lineage = cell("Lineage", i)
        base = {
            "isolate": d["Isolate_Id"][i],
            "strain": strain_clean,
            "full_strain": name if name != "" else None,
            "subtype": cell("Subtype", i),
            "lineage": lineage if lineage else None,
            "host": cell("Host", i),
            "country": country,
            "cdate": cell("Collection_Date", i),
            "sdate": cell("Submission_Date", i),
        }
        for seg in _GIS_SEGMENTS:
            seg_cell = cell(f"{seg} Segment_Id", i)
            if seg_cell is None:
                continue
            epi_ids = [_EPI_SUFFIX.sub("", x) for x in seg_cell.split(",")]
            gbk_cell = cell(f"{seg} INSDC_Upload", i)
            gbk_ids = gbk_cell.split(",") if gbk_cell is not None else [None]
            for epi_id, gbk_id in zip(epi_ids, gbk_ids):
                yield {**base, "epi": epi_id, "gbk": gbk_id,
                       "segment": seg}


GIS_EX_KEYS = ("isolate", "epi", "gbk", "strain", "full_strain",
               "segment", "subtype", "lineage", "host", "country",
               "cdate", "sdate")
# (recognizer, exploded key, field) per emitted column
GIS_COLSPEC = [
    (R.ISOLATE, "isolate", None),
    (R.EPI_SEQID, "epi", None),
    (R.GENBANK, "gbk", None),
    (R.UNKNOWN, "strain", "strain_name"),
    (R.UNKNOWN, "full_strain", "gisaid_strain_name"),
    (R.SEGMENT_NAME, "segment", None),
    (R.SUBTYPE, "subtype", "gisaid_subtype"),
    (R.STRING, "lineage", "lineage"),
    (R.HOST, "host", "host"),
    (R.COUNTRY, "country", None),
    (R.DATE, "cdate", "collection_date"),
    (R.DATE, "sdate", "submission_date"),
]


def gisaid_triples_columns(d: dict, taguri=None) -> pd.DataFrame:
    """mk_gis core over header-keyed columns (see gisaid_rows)."""
    if "Isolate_Id" not in d:
        return _EMPTY.copy()
    ex: dict[str, list] = {k: [] for k in GIS_EX_KEYS}
    for rec in gisaid_rows(d):
        for k in GIS_EX_KEYS:
            ex[k].append(rec[k])
    if not ex["isolate"]:
        return _EMPTY.copy()
    table = [typed(recog, ex[k], field=f) for recog, k, f in GIS_COLSPEC]
    return emit_table(table, taguri=taguri)


def irregular_fasta_triples(content: str, levels=None, na_str=(),
                            taguri=None) -> pd.DataFrame:
    """prep unpublished (IrregularFasta, recipes.py:522-545): the
    first header field is FORCED to be a strain id (f:strain_id); the
    remaining fields type normally; every sequence node is tagged
    tag:unpublished."""
    rows = parse_fasta(content)
    rows = [r for r in rows if len(r) >= 2]
    if not rows:
        return _EMPTY.copy()
    strain_col = typed(R.IRREGULAR_STRAIN, [r[0] for r in rows])
    rest = [r[1:] for r in rows]
    arities = {len(r) for r in rest}
    dfs = []
    if len(arities) == 1:
        cols = type_headless_table(rest, na_str=na_str) + [strain_col]
        dfs.append(emit_table(cols, levels=levels, taguri=taguri))
        seq_cols = [c for c in cols if c.group == "sequence"]
    else:
        # ragged remainder: per-signature groups, strain column sliced
        seq_cols = []
        for cols, ris in type_ragged(rest, na_str=na_str):
            sub_strain = typed(R.IRREGULAR_STRAIN,
                               [rows[i][0] for i in ris])
            group_cols = cols + [sub_strain]
            dfs.append(emit_table(group_cols, levels=levels, taguri=taguri))
            seq_cols.extend(c for c in group_cols if c.group == "sequence")
    # tag all sequence nodes as unpublished (recipes.py:535-543)
    unpub = make_tag_uri("unpublished")
    sink = TripleSink()
    for c in seq_cols:
        sink.add(c.uri(), P_TAG, unpub, DT_URI, c.clean.notna())
    dfs.append(sink.frame())
    return pd.concat(dfs, ignore_index=True).drop_duplicates(ignore_index=True)


def irregular_segment_table_triples(content: str, levels=None, na_str=(),
                                    taguri=None) -> pd.DataFrame:
    """prep table --segment-key (IrregularSegmentTable,
    recipes.py:559-573): the FIRST column is forced to be a segment
    identifier (typename None — it gets sameAs links and attributes
    but asserts no predicate of its own)."""
    data = parse_tsv(content)
    if not data:
        return _EMPTY.copy()
    names = list(data.keys())
    seg_col = typed(R.IRREGULAR_SEGMENT, data[names[0]])
    rest = {k: data[k] for k in names[1:]}
    cols = type_table(rest, na_str=na_str) + [seg_col]
    return emit_table(cols, levels=levels, taguri=taguri)


RECIPES = {
    "fasta": lambda content, taguri=None: fasta_triples(content, taguri=taguri),
    "tsv": lambda content, taguri=None: table_triples(content, taguri=taguri),
    "ids": idlist_triples,
    "blast": blast_triples,
    "ivr": ivr_triples,
    "ird": ird_triples,
    "gisaid": gisaid_triples,
    "unpublished": lambda content, taguri=None: irregular_fasta_triples(
        content, taguri=taguri),
    "segtable": lambda content, taguri=None: irregular_segment_table_triples(
        content, taguri=taguri),
}


def _register_genbank():
    from octofludb_spark.extract.genbank import genbank_triples

    RECIPES["genbank"] = genbank_triples


_register_genbank()
