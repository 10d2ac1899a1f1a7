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
    country_abbrs = {c for c in countries.values() if c is not None}
    # exact + edits-1 variant maps, precomposed straight to the CODE
    # (variant -> code) so lookup is one dict.get.  Exact names win
    # over variants (reference wordfinder checks WORDS0 before WORDSN,
    # spellcheck.py:30-36); variant collisions: last word wins, like
    # the reference's dict comprehension (spellcheck.py:21).
    def compose(names: dict) -> dict:
        variants = {}
        for w in names:
            code = names[w]
            for e in _edits1(w):
                variants[e] = code
        variants.update(names)
        return variants

    state_lookup = compose(states)
    country_lookup = compose(countries)
    return {
        "states": states,
        "state_abbrs": state_abbrs,
        "state_lookup": state_lookup,
        "countries": countries,
        "country_abbrs": country_abbrs,
        "country_lookup": country_lookup,
        "locations_in": locations_in,
    }


def _state_code(x, t) -> str | None:
    if x is None:
        return None
    x = str(x).strip()
    if x.upper() in t["state_abbrs"]:
        return x.upper()
    return t["state_lookup"].get(x.lower().replace(" ", "_"))


def state_to_code_series(s: pd.Series) -> pd.Series:
    """State name/abbr -> 2-letter code; None on failure.
    Reference: domain_geography.py:62-77."""
    t = _tables()
    return pd.Series([_state_code(x, t) for x in s], index=s.index, dtype=object)


def _country_code(x, t) -> str | None:
    if x is None:
        return None
    x = str(x).strip()
    if x.upper() in t["country_abbrs"]:
        return x.upper()
    norm = _CLEAN_NAME.sub("", x.lower().replace(" ", "_"))
    return t["country_lookup"].get(norm)


def country_to_code_series(s: pd.Series) -> pd.Series:
    """Country name/alias/code -> ISO3; None on failure.
    Reference: domain_geography.py:393-409 (incl. of_/the_/and_
    stripping and edits-1 correction)."""
    t = _tables()
    return pd.Series([_country_code(x, t) for x in s], index=s.index, dtype=object)


def location_to_country_code_series(s: pd.Series) -> pd.Series:
    """Countries, Canadian/Chinese provinces, or US states -> country
    code.  Reference: domain_geography.py:459-470."""
    t = _tables()

    def loc(x):
        code = _country_code(x, t)
        if code is None and x is not None:
            code = t["locations_in"].get(str(x).strip().lower())
            if code is None and _state_code(x, t) is not None:
                code = "USA"
        return code

    return pd.Series([loc(x) for x in s], index=s.index, dtype=object)
