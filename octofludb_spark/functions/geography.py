"""Geography lookups: USA states, ISO-3166 countries, and the
locations->country map, with Norvig-style edits-1 spelling correction.

Reproduces reference semantics at octofludb/domain_geography.py:62-77
(state_to_code), :393-409 (country_to_code), :459-470
(location_to_country_code) and octofludb/spellcheck.py:7-51.

The raw name->code tables are public ISO-3166 facts stored as data in
``octofludb_spark/data/geography.json``.  The edits-1 variant
dictionaries are built ONCE per process (module-level lazy singletons;
inside Spark executors that means once per worker, the same
space-for-time trade as the reference's precomputed WORDSN maps,
spellcheck.py:20-25).
"""

from __future__ import annotations

import json
import re
from functools import lru_cache
from importlib import resources

import numpy as np
import pandas as pd

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"
_CLEAN_NAME = re.compile("of_|the_|and_|_of|_the|_and")


def _edits1(word: str) -> set[str]:
    """Single-edit variants (deletes/transposes/replaces/inserts),
    reference: spellcheck.py:42-51."""
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = [L + R[1:] for L, R in splits if R]
    transposes = [L + R[1] + R[0] + R[2:] for L, R in splits if len(R) > 1]
    replaces = [L + c + R[1:] for L, R in splits if R for c in _ALPHABET]
    inserts = [L + c + R for L, R in splits for c in _ALPHABET]
    return set(deletes + transposes + replaces + inserts)


def _load_data() -> dict:
    with resources.files("octofludb_spark.data").joinpath("geography.json").open() as f:
        return json.load(f)


@lru_cache(maxsize=1)
def _tables():
    data = _load_data()
    states = data["states"]                    # lowercase_name -> "XX"
    countries = data["countries"]              # lowercase_name -> "ABC"
    locations_in = data["locations_in"]        # province -> country code
    state_abbrs = set(states.values())
    country_abbrs = set(countries.values())
    # exact + edits-1 variant maps (variant -> canonical name)
    state_e1 = {e: w for w in states for e in _edits1(w)}
    country_e1 = {e: w for w in countries for e in _edits1(w)}
    return {
        "states": states,
        "state_abbrs": state_abbrs,
        "state_e1": state_e1,
        "countries": countries,
        "country_abbrs": country_abbrs,
        "country_e1": country_e1,
        "locations_in": locations_in,
    }


def _normalized(s: pd.Series) -> pd.Series:
    return (
        s.astype("object").fillna("").astype(str)
        .str.strip().str.lower().str.replace(" ", "_", regex=False)
    )


def state_to_code_series(s: pd.Series) -> pd.Series:
    """State name/abbr -> 2-letter code; None on failure.
    Reference: domain_geography.py:62-77."""
    t = _tables()
    s = s.astype("object")
    mask = s.notna()
    stripped = s.fillna("").astype(str).str.strip()
    upper = stripped.str.upper()
    by_abbr = upper.where(upper.isin(t["state_abbrs"]))
    norm = stripped.str.lower().str.replace(" ", "_", regex=False)
    corrected = norm.where(norm.isin(t["states"]), norm.map(t["state_e1"]))
    by_name = corrected.map(t["states"])
    out = by_abbr.where(by_abbr.notna(), by_name)
    return out.where(mask, None)


def country_to_code_series(s: pd.Series) -> pd.Series:
    """Country name/alias/code -> ISO3; None on failure.
    Reference: domain_geography.py:393-409 (incl. of_/the_/and_
    stripping and edits-1 correction)."""
    t = _tables()
    s = s.astype("object")
    mask = s.notna()
    stripped = s.fillna("").astype(str).str.strip()
    upper = stripped.str.upper()
    by_abbr = upper.where(upper.isin(t["country_abbrs"]))
    norm = (
        stripped.str.lower().str.strip().str.replace(" ", "_", regex=False)
        .str.replace(_CLEAN_NAME, "", regex=True)
    )
    corrected = norm.where(norm.isin(t["countries"]), norm.map(t["country_e1"]))
    by_name = corrected.map(t["countries"])
    out = by_abbr.where(by_abbr.notna(), by_name)
    return out.where(mask, None)


def location_to_country_code_series(s: pd.Series) -> pd.Series:
    """Countries, Canadian/Chinese provinces, or US states -> country
    code.  Reference: domain_geography.py:459-470."""
    t = _tables()
    out = country_to_code_series(s)
    missing = out.isna() & s.notna()
    if missing.any():
        prov = (
            s[missing].astype(str).str.strip().str.lower().map(t["locations_in"])
        )
        out.loc[missing] = prov
        still = out.isna() & s.notna()
        if still.any():
            st = state_to_code_series(s[still])
            out.loc[still] = np.where(st.notna(), "USA", None)
    return out
