"""Batched extraction: the per-file semantics of extract/recipes.py
executed table-at-a-BATCH instead of table-at-a-file.

Inside one mapInPandas Arrow batch, files of the same shape are
concatenated so every recognizer / emission op runs on thousands of
cells instead of a handful — pandas call count per batch becomes
O(columns x recognizers), not O(files x columns x recognizers).

Semantics are IDENTICAL to the per-file path (verified by a parity
test): column-level type inference stays per file (goodness is a
per-file groupby mean over the concatenated column), relate/emission
is row-local, and the has_segment table context depends only on the
column-type signature, so same-signature files share one emit_table
call.  Per-row lineage survives via a src-index column threaded
through the sink.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from octofludb_spark.extract import emit as E
from octofludb_spark.extract.infer import GOODNESS_THRESHOLD, _na_mask
from octofludb_spark.extract.parse import (parse_fasta, parse_tsv,
                                           split_readlines)
from octofludb_spark.extract.recipes import (
    _EMPTY,
    _IVR_STRAIN_PAT,
    idlist_triples,
    typed,
)
from octofludb_spark.functions import recognizers as R
from octofludb_spark.functions.recognizers import ALL_CLASSIFIERS, UNKNOWN

EMPTY_WITH_SRC = _EMPTY.assign(src=pd.Series(dtype="int64"))


def _typed_src(recog, values, field=None, na_str=()):
    return typed(recog, values, field=field, na_str=na_str)


def emit_with_src(cols, src_idx: np.ndarray, levels=None,
                  taguri=None) -> pd.DataFrame:
    """emit_table + per-row source attribution."""
    sink = E.TripleSink(src=src_idx)
    E.emit_into(sink, cols, levels=levels, taguri=taguri)
    return sink.frame(with_src=True)


# --------------------------------------------------------------------------
# fixed-column recipes, batched
# --------------------------------------------------------------------------

def gisaid_triples_batched(items: Sequence[tuple[int, str]],
                           taguri=None) -> pd.DataFrame:
    """mk_gis over MANY sheets at once — shares the explode loop and
    column spec with recipes.gisaid_triples (gisaid_rows/GIS_COLSPEC);
    only per-row source attribution is added here."""
    from octofludb_spark.extract.recipes import (GIS_COLSPEC, GIS_EX_KEYS,
                                                 gisaid_rows)

    ex: dict[str, list] = {k: [] for k in GIS_EX_KEYS}
    src: list[int] = []
    for fi, content in items:
        d = parse_tsv(content)
        if "Isolate_Id" not in d:
            continue
        for rec in gisaid_rows(d):
            for k in GIS_EX_KEYS:
                ex[k].append(rec[k])
            src.append(fi)
    if not src:
        return EMPTY_WITH_SRC.copy()
    cols = [_typed_src(recog, ex[k], field=f) for recog, k, f in GIS_COLSPEC]
    return emit_with_src(cols, np.asarray(src), taguri=taguri)


def ivr_triples_batched(items: Sequence[tuple[int, str]],
                        taguri=None) -> pd.DataFrame:
    rows: list[list[str]] = []
    src: list[int] = []
    for fi, content in items:
        for ln in split_readlines(content):
            if not ln.strip():
                continue
            r = ln.split("\t")
            if len(r) >= 11:
                rows.append(r[:11])
                src.append(fi)
    if not rows:
        return EMPTY_WITH_SRC.copy()
    cols_t = list(zip(*rows))

    def strain_of(x):
        m = _IVR_STRAIN_PAT.search(x)
        return m.group(0) if m else None

    table = [
        _typed_src(R.GENBANK, cols_t[0]),
        _typed_src(R.UNKNOWN, [x.lower() for x in cols_t[1]], field="host"),
        _typed_src(R.SEGMENT_NUMBER, cols_t[2]),
        _typed_src(R.SUBTYPE, cols_t[3]),
        _typed_src(R.COUNTRY, cols_t[4]),
        _typed_src(R.DATE, cols_t[5]),
        _typed_src(R.INTEGER, [x.lower() for x in cols_t[6]], field="length"),
        _typed_src(R.STRAIN, [strain_of(x) for x in cols_t[7]]),
        _typed_src(R.UNKNOWN, [x.strip() for x in cols_t[10]],
                   field="genome_status"),
    ]
    return emit_with_src(table, np.asarray(src), taguri=taguri)


def ird_triples_batched(items: Sequence[tuple[int, str]],
                        taguri=None) -> pd.DataFrame:
    na = ("-N/A-",)
    rows: list[list[str]] = []
    src: list[int] = []
    for fi, content in items:
        # readlines-style: the terminator stays on the last field
        # (observable in the strain cell of 12-field lines)
        for ln in split_readlines(content):
            if not ln.strip():
                continue
            r = ln.split("\t")
            if len(r) >= 12:
                rows.append(r[:12])
                src.append(fi)
    if not rows:
        return EMPTY_WITH_SRC.copy()
    cols_t = list(zip(*rows))
    table = [
        _typed_src(R.SEGMENT_NUMBER, cols_t[0], na_str=na),
        _typed_src(R.GENBANK, cols_t[2], field="genbank_id", na_str=na),
        _typed_src(R.INTEGER, cols_t[4], field="length", na_str=na),
        _typed_src(R.SUBTYPE, cols_t[5], na_str=na),
        _typed_src(R.DATE, cols_t[6], na_str=na),
        _typed_src(R.UNKNOWN, [x.replace("IRD:", "").lower() for x in cols_t[7]],
                   field="host", na_str=na),
        _typed_src(R.COUNTRY, cols_t[8]),
        _typed_src(R.UNKNOWN, cols_t[10], field="flu_season", na_str=na),
        _typed_src(R.STRAIN, cols_t[11], field="strain_name", na_str=na),
    ]
    return emit_with_src(table, np.asarray(src), taguri=taguri)


# --------------------------------------------------------------------------
# inferred-column tables (fasta / tsv), batched with PER-FILE inference
# --------------------------------------------------------------------------

def _infer_batched(col_values: pd.Series, file_idx: np.ndarray,
                   classifiers, na_str, n_files: int):
    """Per-file column inference over one concatenated column.

    Runs each recognizer ONCE on the whole column; per-file goodness =
    groupby(file) match fraction; first recognizer with goodness>0.8
    wins per file (HomoList.cast semantics, classes.py:131-138).
    Returns (chosen: list[Recog|None], results: dict[recog_name,
    result]) — chosen[f] None means the default classifier."""
    s = col_values.astype("object")
    na = _na_mask(s, na_str)
    live = s.where(~na, None)
    live_np = live.notna().to_numpy()
    chosen: list = [None] * n_files
    results: dict[str, dict] = {}
    undecided = np.ones(n_files, dtype=bool)
    n_live = np.bincount(file_idx, weights=live_np, minlength=n_files)
    n_all = np.bincount(file_idx, minlength=n_files)
    long_np = None  # len>20 mask: only sequence-mode recogs need it
    for recog in classifiers:
        if not undecided.any():
            break
        res = R.run_unique(recog, live)
        results[recog.name] = res
        match_np = res["clean"].notna().to_numpy() & live_np
        if recog.goodness_mode == "sequence":
            if long_np is None:
                long_np = (
                    live.astype("object").fillna("").astype(str)
                    .str.len() > 20
                ).to_numpy()
            ok = np.bincount(file_idx, weights=match_np & long_np,
                             minlength=n_files)
            good = np.divide(ok, np.maximum(n_all, 1))
            good[n_all == 0] = 0.0
        else:
            good = np.divide(
                np.bincount(file_idx, weights=match_np, minlength=n_files),
                np.maximum(n_live, 1),
            )
            good[n_live == 0] = 0.0
        win = undecided & (good > GOODNESS_THRESHOLD)
        for f in np.flatnonzero(win):
            chosen[f] = recog
        undecided &= ~win
    return live, chosen, results


def tabular_triples_batched(
    tables: list[tuple[int, dict[str, list]]],
    headless: bool,
    classifiers=None,
    na_str=(),
    levels=None,
    taguri=None,
) -> pd.DataFrame:
    """Batched tabularTyping + emission for files sharing the same
    column KEY (header tuple, or arity for headless).  tables:
    [(src_idx, {col: values}), ...]."""
    chain = classifiers if classifiers is not None else ALL_CLASSIFIERS
    if not tables:
        return EMPTY_WITH_SRC.copy()
    col_names = list(tables[0][1].keys())
    n_files = len(tables)
    file_of_row: list[int] = []
    src_of_row: list[int] = []
    for f, (src_idx, data) in enumerate(tables):
        n_rows = len(data[col_names[0]]) if col_names else 0
        file_of_row.extend([f] * n_rows)
        src_of_row.extend([src_idx] * n_rows)
    file_idx = np.asarray(file_of_row, dtype=np.int64)
    src_arr = np.asarray(src_of_row, dtype=np.int64)
    if len(file_idx) == 0:
        return EMPTY_WITH_SRC.copy()

    per_col = []
    for name in col_names:
        vals = pd.Series(
            [v for _, data in tables for v in data[name]], dtype=object
        )
        live, chosen, results = _infer_batched(
            vals, file_idx, chain, na_str, n_files
        )
        per_col.append((name, live, chosen, results))

    # group files by column-recog signature; one emit per signature
    sigs: dict[tuple, list[int]] = {}
    for f in range(n_files):
        sig = tuple(
            (chosen[f].name if chosen[f] is not None else "__default__")
            for _, _, chosen, _ in per_col
        )
        sigs.setdefault(sig, []).append(f)

    by_name = {c.name: c for c in chain}
    frames = []
    for sig, files in sigs.items():
        row_mask = np.isin(file_idx, files)
        cols = []
        for (name, live, chosen, results), recog_name in zip(per_col, sig):
            recog = UNKNOWN if recog_name == "__default__" \
                else by_name[recog_name]
            if recog.name in results:
                res = results[recog.name]
            else:
                res = R.run_unique(recog, live)
                results[recog.name] = res
            sub_live = live[row_mask].reset_index(drop=True)
            clean = res["clean"][row_mask].reset_index(drop=True)
            clean = clean.where(sub_live.notna(), None)
            dtype = None
            if "dtype" in res:
                dtype = res["dtype"][row_mask].reset_index(drop=True)
                dtype = dtype.where(sub_live.notna(), None)
            cols.append(E.TypedColumn(
                recog=recog, dirty=sub_live, clean=clean,
                field=None if headless else name, dtype=dtype,
            ))
        frames.append(
            emit_with_src(cols, src_arr[row_mask], levels=levels, taguri=taguri)
        )
    return pd.concat(frames, ignore_index=True) if frames else EMPTY_WITH_SRC.copy()


def fasta_triples_batched(items: list[tuple[int, str]], levels=None,
                          na_str=(), taguri=None) -> pd.DataFrame:
    """Batched prep-fasta: equal-arity files are grouped by arity and
    column-typed per file; ragged files fall back to the per-file
    path."""
    by_arity: dict[int, list[tuple[int, dict]]] = {}
    fallback_frames = []
    for src_idx, content in items:
        rows = parse_fasta(content)
        if not rows:
            continue
        arities = {len(r) for r in rows}
        if len(arities) == 1:
            k = arities.pop()
            data = {str(i): [r[i] for r in rows] for i in range(k)}
            by_arity.setdefault(k, []).append((src_idx, data))
        else:
            from octofludb_spark.extract.infer import type_ragged

            for cols, _ in type_ragged(rows, na_str=na_str):
                f = emit_with_src(
                    cols, np.full(len(cols[0].dirty), src_idx, dtype=np.int64),
                    levels=levels, taguri=taguri,
                )
                fallback_frames.append(f)
    frames = list(fallback_frames)
    for _, tables in by_arity.items():
        frames.append(
            tabular_triples_batched(tables, headless=True, na_str=na_str,
                                    levels=levels, taguri=taguri)
        )
    return pd.concat(frames, ignore_index=True) if frames else EMPTY_WITH_SRC.copy()


def table_triples_batched(items: list[tuple[int, str]], levels=None,
                          na_str=(), taguri=None) -> pd.DataFrame:
    """Batched prep-table: headered TSVs grouped by header tuple."""
    by_header: dict[tuple, list[tuple[int, dict]]] = {}
    for src_idx, content in items:
        data = parse_tsv(content)
        if not data:
            continue
        by_header.setdefault(tuple(data.keys()), []).append((src_idx, data))
    frames = [
        tabular_triples_batched(tables, headless=False, na_str=na_str,
                                levels=levels, taguri=taguri)
        for _, tables in by_header.items()
    ]
    return pd.concat(frames, ignore_index=True) if frames else EMPTY_WITH_SRC.copy()


def blast_triples_batched(items: Sequence[tuple[int, str]],
                          taguri=None) -> pd.DataFrame:
    """mk_blast batch-at-once: every file's outfmt-6 rows concatenated
    into ONE column set before any pandas/URI op runs (the per-file
    path paid make_uri_series overhead 12x per file; here it's 12x per
    BATCH).  Per-row lineage rides the sink's src array.  Semantics ==
    recipes.blast_triples (parity-tested)."""
    from octofludb_spark.extract.recipes import _BLAST_FIELDS
    from octofludb_spark.functions.uri import DT_URI, NT, make_uri_series
    from octofludb_spark.extract.emit import P_TAG

    rows: list[list[str]] = []
    srcs: list[int] = []
    for src_idx, content in items:
        for ln in split_readlines(content):
            if not ln.strip():
                continue
            r = ln.split("\t")
            if len(r) == 12:
                rows.append(r)
                srcs.append(src_idx)
    if not rows:
        return EMPTY_WITH_SRC.copy()
    cols = list(zip(*rows))
    qseqid = pd.Series(cols[0], dtype=object)
    sseqid = pd.Series(cols[1], dtype=object)
    bit_raw = pd.Series(cols[11], dtype=object).astype(str).str.strip()
    huid = make_uri_series("blast/" + qseqid.astype(str) + "-"
                           + sseqid.astype(str) + "-" + bit_raw)
    sink = E.TripleSink(src=np.asarray(srcs, dtype=np.int64))
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
    return sink.frame(with_src=True)


def genbank_triples_batched(items: Sequence[tuple[int, str]],
                            taguri=None) -> pd.DataFrame:
    """genbank JSON-lines, batch-at-once.  Record traversal stays
    per-record (nested Entrez dicts), but the frame construction and
    the dedup run ONCE per batch — deduping on (s,p,o,dt,src) is
    exactly the per-file drop_duplicates because src separates files.
    The reference's genbank path is untagged (prep_update_gb,
    ui.py:745-766), so taguri is ignored for interface parity."""
    del taguri
    import json as _json

    from octofludb_spark.extract.genbank import _ScalarSink, record_triples

    all_rows: list[tuple] = []
    for src_idx, content in items:
        sink = _ScalarSink()
        for line in content.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                rec = _json.loads(line)
            except _json.JSONDecodeError:
                continue
            if not isinstance(rec, dict):
                continue  # a malformed line must not kill the task
            record_triples(rec, sink)
        all_rows.extend(
            (s, p, o, dt, np.int64(src_idx)) for (s, p, o, dt) in sink.rows
        )
    if not all_rows:
        return EMPTY_WITH_SRC.copy()
    return pd.DataFrame(
        all_rows, columns=["s", "p", "o", "dt", "src"]
    ).drop_duplicates(ignore_index=True)


def _per_file_with_src(fn):
    def run(items: list[tuple[int, str]], taguri=None) -> pd.DataFrame:
        frames = []
        for src_idx, content in items:
            f = fn(content, taguri=taguri)
            f = f.assign(src=np.int64(src_idx))
            frames.append(f)
        return pd.concat(frames, ignore_index=True) if frames \
            else EMPTY_WITH_SRC.copy()
    return run


def _gisaid_excel_per_file(content, taguri=None):
    """Binary GISAID Excel (.xls OLE2 / .xlsx ZIP) carried in the
    string-typed corpus as base64 (a real deployment reads a binary
    column directly — see scale/multimodal.py for that plumbing)."""
    import base64

    from octofludb_spark.extract.recipes import gisaid_triples_excel

    return gisaid_triples_excel(base64.b64decode(content), taguri=taguri)


BATCHED_RECIPES = {
    "fasta": fasta_triples_batched,
    "tsv": table_triples_batched,
    "gisaid": gisaid_triples_batched,
    "gisaid_xls": _per_file_with_src(_gisaid_excel_per_file),
    "ivr": ivr_triples_batched,
    "ird": ird_triples_batched,
    "blast": blast_triples_batched,
    "ids": _per_file_with_src(idlist_triples),
}


def _late_bind():
    """Irregular recipes are registered after import to avoid cycles."""
    from octofludb_spark.extract.recipes import (
        irregular_fasta_triples,
        irregular_segment_table_triples,
    )

    BATCHED_RECIPES.setdefault(
        "unpublished",
        _per_file_with_src(
            lambda content, taguri=None: irregular_fasta_triples(
                content, taguri=taguri)),
    )
    BATCHED_RECIPES.setdefault("genbank", genbank_triples_batched)
    BATCHED_RECIPES.setdefault(
        "segtable",
        _per_file_with_src(
            lambda content, taguri=None: irregular_segment_table_triples(
                content, taguri=taguri)),
    )


_late_bind()
