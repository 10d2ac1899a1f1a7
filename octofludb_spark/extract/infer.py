"""Two-level type inference over parsed cells.

1. Column-level (reference HomoList.cast, classes.py:131-138): first
   classifier in the battery whose goodness (match fraction over
   non-NA cells) exceeds 0.8 types the whole column; else the default
   classifier (Unknown).
2. Cell-level (reference Datum.cast, classes.py:85-92): for ragged
   rows, the first classifier accepting the cell wins; empty cells are
   Missing.

Both preserve the reference's classifier ORDER (allClassifiers,
classifier_flucrew.py:532-564).  include/exclude both REMOVE entries
from the chain, faithful to updateClassifiers (classes.py:25-34).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from octofludb_spark.extract.emit import TypedColumn
from octofludb_spark.functions.recognizers import (
    ALL_CLASSIFIERS,
    Recog,
    UNKNOWN,
)

GOODNESS_THRESHOLD = 0.8


def chain(include: set[str] | None = None,
          exclude: set[str] | None = None) -> list[Recog]:
    drop = (include or set()) | (exclude or set())
    return [r for r in ALL_CLASSIFIERS if r.name not in drop]


def _na_mask(s: pd.Series, na_str: Sequence[str]) -> pd.Series:
    mask = s.isna()
    if na_str:
        mask = mask | s.isin(list(na_str))
    return mask


def _goodness(recog: Recog, live: pd.Series, res: pd.DataFrame,
              n_nonna: int) -> float:
    """Match fraction (token.py:121-131); sequence tokens require
    len>20 and divide by ALL cells (classifier_flucrew.py:433-444)."""
    clean = res["clean"]
    if recog.goodness_mode == "sequence":
        if len(live) == 0:
            return 0.0
        ok = (
            clean.notna()
            & live.notna()
            & (live.astype("object").fillna("").astype(str).str.len() > 20)
        )
        return float(ok.sum()) / len(live)
    if n_nonna == 0:
        return 0.0
    return float((clean.notna() & live.notna()).sum()) / n_nonna


def type_column(
    values: Sequence[str | None],
    field: Optional[str] = None,
    classifiers: Optional[list[Recog]] = None,
    na_str: Sequence[str] = (),
    default: Recog = UNKNOWN,
) -> TypedColumn:
    """HomoList semantics: pick the first classifier with
    goodness > 0.8, apply it to every cell.  Each recognizer runs
    exactly once; the winner's result is reused."""
    s = pd.Series(list(values), dtype=object)
    na = _na_mask(s, na_str)
    live = s.where(~na, None)
    n_nonna = int((~na).sum())
    chosen, chosen_res = default, None
    for recog in classifiers if classifiers is not None else ALL_CLASSIFIERS:
        res = recog.run(live)
        if _goodness(recog, live, res, n_nonna) > GOODNESS_THRESHOLD:
            chosen, chosen_res = recog, res
            break
    if chosen_res is None:
        chosen_res = chosen.run(live)
    return _from_result(chosen, live, chosen_res, field)


def _from_result(recog: Recog, live: pd.Series, res: pd.DataFrame,
                 field: Optional[str]) -> TypedColumn:
    clean = res["clean"].where(live.notna(), None)
    dtype = res["dtype"].where(live.notna(), None) if "dtype" in res else None
    return TypedColumn(recog=recog, dirty=live, clean=clean, field=field,
                       dtype=dtype)


def type_table(
    data: dict[str, list[str | None]],
    classifiers: Optional[list[Recog]] = None,
    na_str: Sequence[str] = (),
) -> list[TypedColumn]:
    """tabularTyping (classes.py:192-210): one HomoList per column,
    keyed by header name."""
    return [
        type_column(v, field=k, classifiers=classifiers, na_str=na_str)
        for k, v in data.items()
    ]


def type_headless_table(
    rows: list[list[str]],
    classifiers: Optional[list[Recog]] = None,
    na_str: Sequence[str] = (),
) -> list[TypedColumn]:
    """headlessTabularTyping (classes.py:213-226): positional columns,
    no field names."""
    if not rows:
        return []
    ncol = len(rows[0])
    cols = []
    for i in range(ncol):
        cols.append(
            type_column([r[i] for r in rows], field=None,
                        classifiers=classifiers, na_str=na_str)
        )
    return cols


def type_ragged(
    rows: list[list[str]],
    classifiers: Optional[list[Recog]] = None,
    na_str: Sequence[str] = (),
    default: Recog = UNKNOWN,
) -> list[tuple[list[TypedColumn], np.ndarray]]:
    """Datum-per-cell typing for ragged rows (classes.py:311-316),
    regrouped into homogeneous sub-tables for vectorized emission.

    Returns [(typed_columns, original_row_indices), ...] — one entry
    per distinct row type-signature.  Cell-level classification itself
    is vectorized: each classifier runs once over the still-unresolved
    cells of a flattened cell table (first-match-wins preserved).
    """
    if not rows:
        return []
    chain_ = classifiers if classifiers is not None else ALL_CLASSIFIERS
    # flatten cells
    row_idx: list[int] = []
    col_idx: list[int] = []
    cells: list[str | None] = []
    for ri, row in enumerate(rows):
        for ci, cell in enumerate(row):
            row_idx.append(ri)
            col_idx.append(ci)
            cells.append(cell)
    s = pd.Series(cells, dtype=object)
    na = _na_mask(s, na_str)
    live = s.where(~na, None)
    empty = live.notna() & (live == "")  # Datum: '' -> Missing (classes.py:86-87)

    n = len(s)
    assigned = np.full(n, None, dtype=object)   # recog per cell
    cleaned = np.full(n, None, dtype=object)
    dtypes = np.full(n, None, dtype=object)
    unresolved = (~empty).to_numpy(dtype=bool)
    for recog in chain_:
        if not unresolved.any():
            break
        idx = np.flatnonzero(unresolved)
        sub = live.iloc[idx]
        res = recog.run(sub)
        clean = res["clean"]
        # token truthiness: match non-None and non-empty
        hit = (clean.notna() & (sub.astype("object").fillna("") != "")).to_numpy(dtype=bool)
        if recog is UNKNOWN:
            # Unknown is the terminal default: matches any non-NA cell
            hit = sub.notna().to_numpy(dtype=bool)
        if not hit.any():
            continue
        hidx = idx[hit]
        for j, k in zip(hidx, np.flatnonzero(hit)):
            assigned[j] = recog
            cleaned[j] = clean.iloc[k]
            if "dtype" in res:
                dtypes[j] = res["dtype"].iloc[k]
        unresolved[hidx] = False
    # leftovers -> default classifier (match may be None => clean None)
    for j in np.flatnonzero(unresolved):
        assigned[j] = default
        cleaned[j] = None if live.iloc[j] is None else live.iloc[j]
    for j in np.flatnonzero(empty.to_numpy(dtype=bool)):
        assigned[j] = None  # Missing: contributes nothing
        cleaned[j] = None

    # regroup rows by signature of (arity, recog names per cell)
    per_row: dict[int, list[int]] = {}
    for k, ri in enumerate(row_idx):
        per_row.setdefault(ri, []).append(k)
    groups: dict[tuple, list[int]] = {}
    for ri, ks in per_row.items():
        sig = tuple(
            assigned[k].name if assigned[k] is not None else "__missing__"
            for k in ks
        )
        groups.setdefault(sig, []).append(ri)

    out = []
    for sig, ris in groups.items():
        ncol = len(sig)
        cols: list[TypedColumn] = []
        for ci in range(ncol):
            ks = [per_row[ri][ci] for ri in ris]
            recog = assigned[ks[0]]
            dirty = pd.Series([live.iloc[k] for k in ks], dtype=object)
            if recog is None:  # Missing column: all-None clean
                cols.append(TypedColumn(recog=UNKNOWN, dirty=dirty,
                                        clean=pd.Series([None] * len(ks), dtype=object)))
                continue
            cl = pd.Series([cleaned[k] for k in ks], dtype=object)
            dt = pd.Series([dtypes[k] for k in ks], dtype=object)
            cols.append(TypedColumn(recog=recog, dirty=dirty, clean=cl,
                                    dtype=dt if dt.notna().any() else None))
        out.append((cols, np.asarray(ris)))
    return out
