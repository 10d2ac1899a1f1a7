"""The recognizer battery: every octofludb token classifier as a
vectorized pandas transform ``Series -> DataFrame(clean[, dtype])``.

``clean`` is the canonical (munged) value, None where the cell is not
a member of the type.  Classifier ORDER IS SEMANTICS — ALL_CLASSIFIERS
reproduces the reference's allClassifiers OrderedDict
(reference: octofludb/classifier_flucrew.py:532-564); first match wins
for cell-level typing, first goodness>0.8 wins for column typing.

Grammar parity notes: the reference's parsec ``parse_strict`` requires
the parser to consume the WHOLE cell, so every regex here is a
fullmatch.  Ordered choice (``^``) commits to the first succeeding
alternative — where that makes a regex alternative unreachable (e.g.
``N\\d+pdm`` after ``N\\d+`` under strict EOF, domain_flu.py:12) we
drop the dead branch rather than let regex backtracking resurrect it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import pandas as pd

from octofludb_spark.functions import dates as _dates
from octofludb_spark.functions import geography as _geo
from octofludb_spark.functions.uri import (
    DT_BOOL,
    DT_DOUBLE,
    DT_INT,
    DT_PLAIN,
)

# emission-dispatch kinds (see extract/emit.py)
K_STRAIN = "strain"            # StrainToken subclasses
K_STRAIN_ATTR = "strain_attr"  # StrainAttribute subclasses
K_SEGMENT = "segment"          # SegmentToken subclasses
K_SEGMENT_ATTR = "segment_attr"
K_DNA = "dnaseq"
K_PRO = "proseq"
K_PLAIN = "plain"              # default Token behavior


@dataclass
class Recog:
    """One vectorized classifier."""

    name: Optional[str]              # reference typename (None allowed,
                                     # e.g. IrregularSegment)
    kind: str
    run: Callable[[pd.Series], pd.DataFrame]
    group: Optional[str] = None      # strain | segment | sequence | None
    # object_of specialization key ('' = default literal-of-clean)
    object_kind: str = ""
    goodness_mode: str = "default"   # 'sequence' divides by len(all) & needs len>20

    def clean(self, s: pd.Series) -> pd.Series:
        return self.run(s)["clean"]


def run_unique(recog: "Recog", s: pd.Series) -> dict:
    """Run ``recog`` once per DISTINCT value and gather results back —
    semantically identical to ``recog.run(s)`` because every recognizer
    is a pure element-wise map, but the regex/munge work is paid per
    distinct value instead of per cell.  Real metadata columns (host,
    country, subtype, segment …) are heavily repetitive, so this is a
    dictionary-encoded execution of the same classifier — the
    cache-per-distinct-input strategy of "Accelerating Python UDFs in
    Vectorized Query Execution" (CIDR 2022, PAPERS.md) applied to the
    recognizer battery.

    Falls back to the plain run for short or high-cardinality columns
    (factorize+gather overhead would exceed the savings)."""
    n = len(s)
    if n < 128:
        return recog.run(s)
    codes, uniques = pd.factorize(s, use_na_sentinel=True)
    if len(uniques) == 0 or len(uniques) > 0.5 * n:
        # empty uniques = all-NA column: the gather below would index
        # an empty array; the plain run handles it (and is cheap)
        return recog.run(s)
    res_u = recog.run(pd.Series(uniques, dtype=object))
    safe = np.where(codes >= 0, codes, 0)
    out = {}
    for key, val in res_u.items():
        arr = val.to_numpy(dtype=object)[safe]
        out[key] = pd.Series(np.where(codes >= 0, arr, None),
                             index=s.index, dtype=object)
    return out


def _df(clean: pd.Series, dtype: pd.Series | None = None) -> dict:
    """Recognizer result: {'clean': Series[, 'dtype': Series]} — a dict
    (not a DataFrame) to avoid frame-construction overhead on the tiny
    per-file tables."""
    clean = clean.astype("object")
    clean = clean.where(clean.notna(), None)  # canonical missing = None
    out = {"clean": clean}
    if dtype is not None:
        dtype = dtype.astype("object")
        out["dtype"] = dtype.where(dtype.notna(), None)
    return out


def _fullmatch(s: pd.Series, pattern: str, case: bool = True,
               str_s: pd.Series | None = None) -> pd.Series:
    """Boolean mask of cells fully matching the pattern.  ``str_s``
    lets a caller that already stringified the series skip the
    three-pass astype/fillna/astype conversion (it is the same
    ``s.astype("object").fillna("").astype(str)`` value)."""
    if str_s is None:
        str_s = s.astype("object").fillna("").astype(str)
    return s.notna() & str_s.str.fullmatch(pattern, case=case)


def _regex_recog(pattern: str, munge: str = "", case: bool = True):
    """Build run() for a fullmatch regex; munge in {'', 'upper',
    'lower', 'upper_nounderscore'}."""
    if munge not in ("", "upper", "lower", "upper_nounderscore"):
        raise ValueError(f"unknown munge {munge!r}")

    def run(s: pd.Series) -> pd.DataFrame:
        # stringify ONCE: the match mask and the munged values share
        # the identical conversion (was computed twice per call)
        vals = s.astype("object").fillna("").astype(str)
        m = _fullmatch(s, pattern, case=case, str_s=vals)
        if munge == "upper":
            vals = vals.str.upper()
        elif munge == "lower":
            vals = vals.str.lower()
        elif munge == "upper_nounderscore":
            vals = vals.str.upper().str.replace("_", "", regex=False)
        return _df(vals.where(m, None))

    return run


def _map_recog(mapping: dict[str, str]):
    """Exact-string alternatives with normalization (segment names)."""

    def run(s: pd.Series) -> pd.DataFrame:
        vals = s.astype("object").fillna("").astype(str).map(mapping)
        return _df(vals.where(s.notna(), None))

    return run


def _wordset_recog(words: list[str], to_upper: bool = False):
    """Fixed-vocabulary match after lower+space->underscore cleaning
    (reference parser.py:6-31 wordset under parse_strict = exact
    membership).  Clean preserves the original cell text
    (runtests.py:582-585) unless to_upper."""
    vocab = {w.lower().replace(" ", "_") for w in words}

    def run(s: pd.Series) -> pd.DataFrame:
        norm = (
            s.astype("object").fillna("").astype(str)
            .str.lower().str.replace(" ", "_", regex=False)
        )
        m = s.notna() & norm.isin(vocab)
        vals = s.astype("object").fillna("").astype(str)
        if to_upper:
            vals = vals.str.upper()
        return _df(vals.where(m, None))

    return run


# --- strain tokens -------------------------------------------------------

def _strain_run(s: pd.Series) -> pd.DataFrame:
    """p_strain (reference domain_identifier.py:9-22): optionally
    parenthesized `[ABCD]/<field>/<rest>`, then clean_strain munging."""
    str_s = s.astype("object").fillna("").astype(str)
    paren = str_s.str.fullmatch(r"\([ABCD]/[^/()\[\]]+/.+\)")
    plain = str_s.str.fullmatch(r"[ABCD]/[^/()\[\]]+/.+")
    m = s.notna() & (paren | plain)
    vals = (
        str_s.str.strip()
        .str.replace(" ", "_", regex=False)
        .str.replace(r"^\((.*)\)$", r"\1", regex=True)
        .str.replace(r"_*\(.*\)_*$", "", regex=True)
        .str.replace(r"_*\[.*\]_*$", "", regex=True)
    )
    return _df(vals.where(m, None))


_SUBTYPE_CORE = r"(?:A */ *)?((?:H\d+|pdmH\d+)(?:hu|sw|av)?N\d+v?)"


def _subtype_run(s: pd.Series) -> pd.DataFrame:
    """p_subtype (domain_flu.py:24-35): 'mixed' (ci) first, else the
    HA-host-NA-variant grammar with the A/ prefix dropped."""
    str_s = s.astype("object").fillna("").astype(str)
    mixed = s.notna() & str_s.str.fullmatch("mixed", case=False)
    # \Z, not $: parse_strict consumes the whole cell, so 'H1N1\n'
    # must NOT match (same fix as functions/dates.py)
    core = str_s.str.extract(rf"^{_SUBTYPE_CORE}\Z", expand=False)
    out = core.where(s.notna(), None)
    out = out.where(~mixed, "mixed")
    return _df(out)


def _global_clade_run(s: pd.Series) -> pd.DataFrame:
    pat = (
        r"\d[ABC](?:[._-]\d+){1,4}(?:[_-]?like)?(?:[_-]?vaccine)?"
        r"|Other-[A-Za-z]*[0-9.a-zA-Z-]*"
        r"|3\.[12][09]\d0\.[0-9.a-zA-Z-]+"
        r"|humanVaccine|Outgroup"
    )
    m = _fullmatch(s, pat)
    return _df(s.astype("object").fillna("").astype(str).where(m, None))


def _country_run(s: pd.Series) -> pd.DataFrame:
    return _df(_geo.country_to_code_series(s))


def _country_or_state_run(s: pd.Series) -> pd.DataFrame:
    return _df(_geo.location_to_country_code_series(s))


def _state_run(s: pd.Series) -> pd.DataFrame:
    return _df(_geo.state_to_code_series(s))


def _date_run(s: pd.Series) -> pd.DataFrame:
    return _dates.parse_date_series(s)


_SEQ_STRIP = r"[^A-Z*]"


def _seq_run(pattern: str):
    def run(s: pd.Series) -> pd.DataFrame:
        m = _fullmatch(s, pattern, case=False)
        vals = (
            s.astype("object").fillna("").astype(str)
            .str.upper().str.replace(_SEQ_STRIP, "", regex=True)
        )
        return _df(vals.where(m, None))

    return run


def _unknown_run(s: pd.Series) -> pd.DataFrame:
    """Unknown matches anything non-NA (token.py:143-152)."""
    return _df(s.astype("object"))


def _string_run(s: pd.Series) -> pd.DataFrame:
    return _df(s.astype("object"))


def _integer_run(s: pd.Series) -> pd.DataFrame:
    m = _fullmatch(s, r"[1-9]\d*|0")
    return _df(
        s.astype("object").fillna("").astype(str).where(m, None),
        pd.Series(np.where(m, DT_INT, DT_PLAIN), index=s.index),
    )


def _double_run(s: pd.Series) -> pd.DataFrame:
    m = _fullmatch(s, r"0\.\d+|[1-9]\d*\.\d+|[1-9]\d*|0")
    return _df(
        s.astype("object").fillna("").astype(str).where(m, None),
        pd.Series(np.where(m, DT_DOUBLE, DT_PLAIN), index=s.index),
    )


def _boolean_run(s: pd.Series) -> pd.DataFrame:
    str_s = s.astype("object").fillna("").astype(str)
    m = s.notna() & str_s.str.fullmatch("0|1|yes|no|true|false|y|n|t|f", case=False)
    truthy = str_s.str.lower().isin(["1", "t", "true", "yes", "y"])
    vals = pd.Series(np.where(truthy, "true", "false"), index=s.index, dtype=object)
    return _df(
        vals.where(m, None),
        pd.Series(np.where(m, DT_BOOL, DT_PLAIN), index=s.index),
    )


_SEGMENT_NAME_MAP = {
    "PB2": "PB2", "PB1": "PB1", "PA": "PA", "NP": "NP",
    "NS": "NS", "NS1": "NS", "M": "M", "MP": "M", "M1": "M",
    "HA": "HA", "NA": "NA",
}
_INTERNAL_GENE_MAP = {
    k: v for k, v in _SEGMENT_NAME_MAP.items() if v not in ("HA", "NA")
}


def _segment_subtype_run(s: pd.Series) -> pd.DataFrame:
    """p_segment_subtype = p_segment ^ p_HA ^ p_NA (domain_flu.py:21)."""
    base = _map_recog(_SEGMENT_NAME_MAP)(s)["clean"]
    str_s = s.astype("object").fillna("").astype(str)
    hn = s.notna() & str_s.str.fullmatch(r"H\d+|pdmH\d+|N\d+")
    return _df(base.where(base.notna(), str_s.where(hn, None)))


_H1_CLADES = [
    "alpha", "beta", "delta1", "delta1a", "delta1b", "delta2", "gamma",
    "gamma2", "gamma2-beta-like", "gamma2_beta_like", "pandemic", "pdm",
    "pdmH1", "human-delta", "huVac", "predelta",
]
_H3_CLADES = [
    "2010.1", "2010.2", "Cluster_I", "Cluster_II", "Cluster_III",
    "Cluster_IV", "Cluster_IVA", "Cluster_IVB", "Cluster_IVC",
    "Cluster_IVD", "Cluster_IVE", "Cluster_IVF", "I", "II", "III", "IV",
    "IV-A", "IV-B", "IV-C", "IV-D", "IV-E", "IV-F", "huVac",
    "human-like_2010.1", "human-like_2010.2", "human-like_2016",
]
_N1_CLADES = ["Human_seasonal", "huVac", "Classical", "Pandemic", "MN99"]
_N2_CLADES = [
    "Human_N2", "2016", "Human-like", "1998", "1998A", "98A", "98A1",
    "98A_1", "98A2", "98A_2", "1998B", "98B", "98B1", "98B_1", "98B2",
    "98B_2", "2002", "2002A", "02A1", "02A2", "2002B", "02B1", "02B2",
    "TX98",
]

# --- the battery ----------------------------------------------------------

ISOLATE = Recog("isolate_id", K_STRAIN, _regex_recog(r"EPI_ISL_\d+", "upper"),
                group="strain")
GENBANK = Recog("genbank_id", K_SEGMENT, _regex_recog(r"[A-Z][A-Z]?\d{5,7}", "upper"),
                group="segment")
BARCODE = Recog("barcode", K_STRAIN, _regex_recog(r"\d+TOSU\d+|A0\d{7}", "upper"),
                group="strain")
CONSTELLATION = Recog("constellation", K_STRAIN_ATTR,
                      _regex_recog(r"[A-Z-]{6}|MIXED|mixed"))
COUNTRY = Recog("country", K_PLAIN, _country_run, object_kind="country")
COUNTRY_OR_STATE = Recog("country", K_PLAIN, _country_or_state_run,
                         object_kind="country_code")
DATE = Recog("date", K_PLAIN, _date_run, object_kind="date")
EPI_SEQID = Recog("epi_id", K_SEGMENT,
                  _regex_recog(r"EPI_?\d\d\d+", "upper_nounderscore"),
                  group="segment")
GLOBAL_CLADE = Recog("global_clade", K_STRAIN_ATTR, _global_clade_run)
SUBTYPE = Recog("subtype", K_STRAIN_ATTR, _subtype_run)
SEGMENT_NAME = Recog("segment_name", K_SEGMENT_ATTR, _map_recog(_SEGMENT_NAME_MAP))
SEGMENT_SUBTYPE = Recog("segment_subtype", K_SEGMENT_ATTR, _segment_subtype_run)
HOST = Recog("host", K_PLAIN, _regex_recog("swine|human", "lower", case=False))
INTERNAL_GENE = Recog("internal_gene", K_STRAIN_ATTR, _map_recog(_INTERNAL_GENE_MAP))
SEGMENT_NUMBER = Recog("segment_number", K_SEGMENT_ATTR, _regex_recog(r"[1-8]"),
                       object_kind="segment_number")
STRAIN = Recog("strain_name", K_STRAIN, _strain_run, group="strain")
STATE_USA = Recog("state", K_PLAIN, _state_run, object_kind="state")
INTERNAL_GENE_CLADE = Recog("internal_gene_clade", K_PLAIN,
                            _wordset_recog(["PDM", "TRIG", "LAIV"], to_upper=True))
H1_CLADE = Recog("h1_clade", K_PLAIN, _wordset_recog(_H1_CLADES))
H3_CLADE = Recog("h3_clade", K_PLAIN, _wordset_recog(_H3_CLADES))
US_CLADE = Recog("us_clade", K_PLAIN, _wordset_recog(_H1_CLADES + _H3_CLADES))
N1_CLADE = Recog("n1_clade", K_PLAIN, _wordset_recog(_N1_CLADES))
N2_CLADE = Recog("n2_clade", K_PLAIN, _wordset_recog(_N2_CLADES))
DNASEQ = Recog("dnaseq", K_DNA, _seq_run(r"[ATGC_RYSWKMBDHVN-]+"),
               group="sequence", goodness_mode="sequence")
PROSEQ = Recog("proseq", K_PRO, _seq_run(r"[ACDEFGHIKL_MNPQRSTVWX*Y-]+"),
               group="sequence", goodness_mode="sequence")
UNKNOWN = Recog("unknown", K_PLAIN, _unknown_run)

# recipe-only tokens (not part of inference)
HA_TOKEN = Recog("HA", K_STRAIN_ATTR, _regex_recog(r"H\d+|pdmH\d+"))
NA_TOKEN = Recog("NA", K_STRAIN_ATTR, _regex_recog(r"N\d+"))
STRING = Recog("string", K_PLAIN, _string_run, object_kind="string_dirty")
INTEGER = Recog("integer", K_PLAIN, _integer_run)
DOUBLE = Recog("double", K_PLAIN, _double_run)
BOOLEAN = Recog("float", K_PLAIN, _boolean_run)  # reference typename quirk
def _irregular_strain_run(s: pd.Series) -> pd.DataFrame:
    """IrregularStrain matches anything non-NA but inherits
    StrainToken.munge — spaces become underscores in the CLEAN value
    (and hence the emitted literal), classifier_flucrew.py:188-189."""
    return _df(
        s.astype("object").where(
            s.isna(), s.astype(str).str.replace(" ", "_", regex=False)
        )
    )


# recipes.py:510-556: match-anything tokens forcing a group
IRREGULAR_STRAIN = Recog("strain_id", K_STRAIN, _irregular_strain_run,
                         group="strain")
IRREGULAR_SEGMENT = Recog(None, K_SEGMENT, _unknown_run, group="segment")

# The inference chain, in exactly the reference's order
# (classifier_flucrew.py:532-564).
ALL_CLASSIFIERS: list[Recog] = [
    ISOLATE, GENBANK, BARCODE, CONSTELLATION, COUNTRY, DATE, EPI_SEQID,
    GLOBAL_CLADE, SUBTYPE, SEGMENT_NAME, SEGMENT_SUBTYPE, HOST,
    INTERNAL_GENE, SEGMENT_NUMBER, STRAIN, STATE_USA, INTERNAL_GENE_CLADE,
    H1_CLADE, H3_CLADE, US_CLADE, N1_CLADE, N2_CLADE, DNASEQ, PROSEQ,
    UNKNOWN,
]


# Fields that always attach to the strain entity
# (reference: classifier_flucrew.py:167-179).
STRAIN_FIELDS = {
    "date", "submission_date", "collection_date", "country", "state",
    "host", "global_clade", "subtype", "barcode", "strain_name",
    "gisaid_strain_name",
}

# The 8 flu genome segments in canonical order (domain_flu.py:9).
SEGMENT = ["PB2", "PB1", "PA", "HA", "NP", "NA", "M", "NS"]
