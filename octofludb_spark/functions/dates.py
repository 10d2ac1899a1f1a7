"""Vectorized date recognition.

Reproduces the reference's ordered-choice date grammar
(reference: octofludb/domain_date.py:51-197) as a cascade of anchored
regular expressions evaluated over whole pandas Series.  Alternative
ORDER IS SEMANTICS (utc -> polite -> dMy -> ymd -> mdy -> my -> ym ->
bare year, domain_date.py:186-195); each alternative must consume the
entire cell (the reference uses ``parse_strict``).

Output per cell: (clean, dtype) where clean is the canonical
``Y[-MM[-DD]]`` lexical form (reference Date.__str__, domain_date.py:47-48)
and dtype is the partial-date XSD type picked by which parts are
present (Date.as_uri, domain_date.py:24-45).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from octofludb_spark.functions.uri import (
    DT_DATE,
    DT_GYEAR,
    DT_GYEARMONTH,
)

# Month-name lexicon (reference: domain_date.py:149-174).  The
# reference maps "january" to "1 " (trailing space survives padDigit);
# we reproduce that faithfully.
MONTHS = {
    "jan": "01", "feb": "02", "mar": "03", "apr": "04", "may": "05",
    "jun": "06", "jul": "07", "aug": "08", "sep": "09", "oct": "10",
    "nov": "11", "dec": "12",
    "january": "1 ", "february": "02", "march": "03", "april": "04",
    "june": "06", "july": "07", "august": "08", "september": "09",
    "october": "10", "november": "11", "december": "12",
}

# longest-first, mirroring the reference wordset's length-bucketed
# longest-match order (parser.py:13-31)
_MONTH_ALT = "|".join(sorted(MONTHS.keys(), key=len, reverse=True))

# ATOMIC groups ((?>...), py3.11+) reproduce parsec's committed
# ordered choice: once an alternative matches, the regex engine may
# not backtrack into it ("2011/10" must fail ymd on the missing day —
# not reparse month "10" as "1"+day "0" — and fall through to ym).
_LONGYEAR = r"(?>20\d\d|1[89]\d\d)"
_ANYYEAR = r"(?>20\d\d|1\d\d\d|\d\d)"       # p_year, domain_date.py:145
_MONTH_NUM = r"(?>10|11|12|0?[1-9])"
_DAY = r"(?>3[01]|[012]?\d)"
_TIME_SFX = r"(?: \d\d:\d\d:\d\d(?:\.\d+)?)?"
_MN = rf"(?>{_MONTH_NUM}|{_MONTH_ALT})"

# Ordered alternatives of p_any_date (domain_date.py:186-195).
# Each is (name, compiled-fullmatch-regex with groups y/m/d).
_ALTERNATIVES = [
    (
        "utc",  # domain_date.py:117-126
        rf"(?P<y>{_LONGYEAR})-?(?P<m>{_MONTH_NUM})-?(?P<d>{_DAY})"
        rf"T(?:[01]\d|2[0-3]):?[0-5]\d:?[0-5]\d(?:Z|\+\d\d:\d\d)?",
    ),
    (
        "polite",  # "May 31, 2018", domain_date.py:87-98
        rf"(?P<m>{_MONTH_ALT})\s*(?P<d>{_DAY})\s*,\s*(?P<y>{_LONGYEAR})",
    ),
    (
        "dMy",  # 01-Apr-2002, domain_date.py:73-84 (year may be 2-digit)
        rf"(?P<d>{_DAY})[-/]?(?P<m>{_MONTH_ALT})[-/]?(?P<y>{_ANYYEAR}){_TIME_SFX}",
    ),
    (
        "ymd",  # domain_date.py:51-59
        rf"(?P<y>{_LONGYEAR})[-/]?(?P<m>{_MN})[-/]?(?P<d>{_DAY}){_TIME_SFX}",
    ),
    (
        "mdy",  # domain_date.py:62-70
        rf"(?P<m>{_MN})[-/]?(?P<d>{_DAY})[-/]?(?P<y>{_LONGYEAR}){_TIME_SFX}",
    ),
    (
        "my",  # domain_date.py:101-106 (separator required)
        rf"(?P<m>{_MN})[-/](?P<y>{_LONGYEAR})",
    ),
    (
        "ym",  # domain_date.py:109-114 (separator required)
        rf"(?P<y>{_LONGYEAR})[-/](?P<m>{_MN})",
    ),
    (
        "year",  # bare year incl. 2-digit expansion
        rf"(?P<y>{_ANYYEAR})",
    ),
]
# \Z (not $): '$' would also match before a trailing newline, which
# parse_strict / str.fullmatch semantics reject ('2018\n' is NOT a date)
_COMPILED = [
    (n, re.compile(rf"^(?:{rx})\Z", re.IGNORECASE)) for n, rx in _ALTERNATIVES
]


_MONTH_MAP = {k: ("0" * (2 - len(v)) + v) for k, v in MONTHS.items()}


def _norm_month_series(m: pd.Series) -> pd.Series:
    """Month-name lookup + padDigit, vectorized."""
    lowered = m.where(m.isna(), m.astype("object").fillna("").astype(str).str.lower())
    named = lowered.map(_MONTH_MAP)
    numeric = m.astype("object").fillna("").astype(str).str.zfill(2).where(m.notna())
    return named.where(named.notna(), numeric)


def _expand_year_series(y: pd.Series) -> pd.Series:
    s = y.astype("object").fillna("").astype(str)
    two = y.notna() & (s.str.len() == 2)
    lo = two & (s.str[0].isin(list("012")))
    hi = two & ~lo
    out = y.astype("object").copy()
    out[lo] = "20" + s[lo]
    out[hi] = "19" + s[hi]
    return out


_SMALL_N = 512


def _expand_year(y: str) -> str:
    # 00-29 -> 20xx, 30-99 -> 19xx (reference: domain_date.py:8-15)
    if len(y) == 2:
        return ("20" + y) if int(y[0]) <= 2 else ("19" + y)
    return y


def _parse_one(x: str):
    """Per-cell cascade (compiled regexes, early exit) — faster than
    pandas machinery below _SMALL_N rows."""
    for _, rx in _COMPILED:
        m = rx.match(x)
        if m:
            gd = m.groupdict()
            y = gd.get("y")
            mo = gd.get("m")
            d = gd.get("d")
            if y is not None:
                y = _expand_year(y)
            if mo is not None:
                lowered = mo.lower()
                mo = _MONTH_MAP.get(lowered, mo.zfill(2))
            if d is not None:
                d = d.zfill(2)
            return y, mo, d
    return None, None, None


def parse_date_parts(s: pd.Series) -> pd.DataFrame:
    """Parse a Series of strings into (y, m, d) part columns (None for
    non-dates).  Small series: per-cell compiled cascade; large
    series: one vectorized anchored-extract pass per grammar
    alternative, applied to still-unresolved cells in reference order."""
    s = s.astype("object")
    n = len(s)
    if n <= _SMALL_N:
        ys = np.full(n, None, dtype=object)
        ms = np.full(n, None, dtype=object)
        ds = np.full(n, None, dtype=object)
        for i, x in enumerate(s):
            if x is None or (isinstance(x, float) and x != x):
                continue
            # stringify non-strings exactly like the vectorized path's
            # astype(str), so classification can't depend on column
            # LENGTH crossing the _SMALL_N threshold
            y, mo, d = _parse_one(x if isinstance(x, str) else str(x))
            ys[i], ms[i], ds[i] = y, mo, d
        return pd.DataFrame({"y": ys, "m": ms, "d": ds}, index=s.index)
    parts = pd.DataFrame(
        {"y": np.full(n, None, dtype=object),
         "m": np.full(n, None, dtype=object),
         "d": np.full(n, None, dtype=object)},
        index=s.index,
    )
    # stringify ONCE (was re-cast per grammar alternative on every
    # shrinking unresolved subset); identical to the per-alternative
    # astype(str) since values never change between alternatives
    str_s = s.fillna("").astype(str)
    # every alternative requires at least two digits somewhere
    unresolved = s.notna() & str_s.str.contains(r"\d\d", regex=True)
    for _, rx in _COMPILED:
        if not unresolved.any():
            break
        sub = str_s[unresolved]
        ext = sub.str.extract(rx)
        hit = ext["y"].notna() if "y" in ext else pd.Series(False, index=sub.index)
        if not hit.any():
            continue
        hit_idx = ext.index[hit]
        parts.loc[hit_idx, "y"] = _expand_year_series(ext.loc[hit_idx, "y"])
        if "m" in ext:
            parts.loc[hit_idx, "m"] = _norm_month_series(ext.loc[hit_idx, "m"])
        if "d" in ext:
            parts.loc[hit_idx, "d"] = (
                ext.loc[hit_idx, "d"].astype("object").fillna("").astype(str)
                .str.zfill(2).where(ext.loc[hit_idx, "d"].notna())
            )
        unresolved.loc[hit_idx] = False
    return parts


def date_clean_from_parts(parts: pd.DataFrame) -> pd.Series:
    """Canonical lexical form: '-'.join of present parts (vectorized)."""
    y, m, d = parts["y"], parts["m"], parts["d"]
    out = y.astype("object").fillna("")
    out = out.where(m.isna(), out + "-" + m.fillna(""))
    out = out.where(d.isna(), out + "-" + d.fillna(""))
    return out.where(y.notna(), None)


def date_dtype_from_parts(parts: pd.DataFrame) -> pd.Series:
    """Partial-date XSD type (reference Date.as_uri, domain_date.py:24-45).
    p_any_date always yields a year, so only gYear / gYearMonth / date
    are reachable."""
    y = parts["y"].notna()
    m = parts["m"].notna()
    d = parts["d"].notna()
    out = pd.Series(np.full(len(parts), None, dtype=object), index=parts.index)
    out[y & ~m] = DT_GYEAR
    out[y & m & ~d] = DT_GYEARMONTH
    out[y & m & d] = DT_DATE
    return out


def parse_date_series(s: pd.Series) -> dict:
    """{'clean': Series, 'dtype': Series}; clean None for non-dates."""
    parts = parse_date_parts(s)
    return {
        "clean": date_clean_from_parts(parts),
        "dtype": date_dtype_from_parts(parts),
    }
