"""Per-recognizer accept/reject/munge tests, transcribed from the
reference suite (/root/reference/runtests.py — cited per class).
These are the cell-level P/R oracle for the pipeline."""

import pandas as pd
import pytest

from octofludb_spark.functions import recognizers as R

pytestmark = pytest.mark.core


def c(recog, x):
    out = recog.clean(pd.Series([x], dtype=object)).iloc[0]
    return out


# runtests.py:112-116
BARCODE = [("A01234567", "A01234567"), ("bogus", None), ("K00869", None)]
# runtests.py:119-125
CONSTELLATION = [
    ("TTPVVP", "TTPVVP"), ("T-----", "T-----"), ("XXXXXX", "XXXXXX"),
    ("MIXED", "MIXED"), ("bogus", None),
]
# runtests.py:128-145
COUNTRY = [
    ("USA", "USA"), ("united states", "USA"), ("US", "USA"),
    ("indonesia", "IDN"), ("The Democratic Republic of the Congo", "COD"),
    ("democratic republic congo", "COD"), ("unitde states", "USA"),
    ("indoesia", "IDN"), ("indonesa", "IDN"), ("bogus", None),
]
# runtests.py:148-183
COUNTRY_OR_STATE = COUNTRY + [
    ("quebec", "CAN"), ("ontario", "CAN"), ("jiangsu", "CHN"),
    ("alabama", "USA"),
]
# runtests.py:186-283
DATES = [
    ("May 17, 1986", "1986-05-17"), ("1990", "1990"), ("2011", "2011"),
    ("11", "2011"), ("90", "1990"), ("99", "1999"), ("00", "2000"),
    ("29", "2029"), ("30", "1930"),
    ("05-Jun-2011", "2011-06-05"), ("Jun-2011", "2011-06"),
    ("May17,1986", "1986-05-17"), ("1986-05-17", "1986-05-17"),
    ("19860517", "1986-05-17"), ("1986/05/17", "1986-05-17"),
    ("05/17/1986", "1986-05-17"), ("05/17/1886", "1886-05-17"),
    ("2011/05", "2011-05"), ("05/2011", "2011-05"),
    ("2011/05/31", "2011-05-31"), ("20110531", "2011-05-31"),
    ("05/31/2011", "2011-05-31"), ("05312011", "2011-05-31"),
    ("1986-05-17T22:01:30Z", "1986-05-17"),
    ("1986-05-17T22:01:30+00:00", "1986-05-17"),
    ("May 17, 19", None), ("05 17, 1999", None), ("05/17/86", None),
    ("11/05", None), ("05/11", None), ("11/05/31", None),
    ("05/31/11", None), ("20195", None), ("201905067", None),
    ("05/06/01/6", None), ("bogus", None),
]
# runtests.py:286-302
GENBANK = [
    ("AB12345678", None), ("AB1234567", "AB1234567"), ("AB123456", "AB123456"),
    ("AB12345", "AB12345"), ("AB1234", None), ("ABC1234", None),
    ("A1234567", "A1234567"), ("A123456", "A123456"), ("A12345", "A12345"),
    ("K00869", "K00869"), ("a12345", None), ("ab12345", None), ("bogus", None),
]
# runtests.py:305-315
EPI = [
    ("EPI_1234567890123", "EPI1234567890123"),
    ("EPI1234567890123", "EPI1234567890123"), ("EPI_123", "EPI123"),
    ("EPI_12", None), ("bogus", None),
]
# runtests.py:318-373
GLOBAL_CLADE = [
    ("1A.1", "1A.1"), ("1A_1_34", "1A_1_34"), ("1A_1-34", "1A_1-34"),
    ("1A_1_34_like", "1A_1_34_like"), ("1A_1_34like", "1A_1_34like"),
    ("1A_1_34-like", "1A_1_34-like"), ("1A.1.2.34.234", "1A.1.2.34.234"),
    ("1A.1.2.34.234.3", None), ("1A.2-3-like", "1A.2-3-like"),
    ("1A.3.3.2-vaccine", "1A.3.3.2-vaccine"), ("3.1990.4.b1", "3.1990.4.b1"),
    ("3.2010.1", "3.2010.1"), ("Other-Avian", "Other-Avian"),
    ("Other-Avian-c2", "Other-Avian-c2"), ("Other-Human-1B.2", "Other-Human-1B.2"),
    ("Outgroup", "Outgroup"), ("humanVaccine", "humanVaccine"), ("bogus", None),
]
# runtests.py:376-402
SUBTYPE = [
    ("H1N1", "H1N1"), ("H11N12", "H11N12"), ("H1N1v", "H1N1v"),
    ("H1huN1v", "H1huN1v"), ("H1swN1v", "H1swN1v"), ("H1avN1v", "H1avN1v"),
    ("H1huN1", "H1huN1"), ("H1swN1", "H1swN1"), ("H1avN1", "H1avN1"),
    ("H1laN1", None), ("h1n1", None), ("A / H1N1", "H1N1"), ("A/H1N1", "H1N1"),
    ("Mixed", "mixed"), ("mixed", "mixed"), ("MiXeD", "mixed"), ("bogus", None),
]
# runtests.py:405-421
HA = [("H1", "H1"), ("H10", "H10"), ("pdmH1", "pdmH1"), ("h1", None), ("bogus", None)]
NA = [("N1", "N1"), ("N10", "N10"), ("n10", None), ("bogus", None)]
# runtests.py:424-432
HOST = [
    ("Swine", "swine"), ("Human", "human"), ("HuMaN", "human"),
    ("chicken", None), ("bogus", None),
]
# runtests.py:435-453
INTERNAL_GENE = [
    ("PB2", "PB2"), ("PB1", "PB1"), ("PA", "PA"), ("NP", "NP"), ("M", "M"),
    ("MP", "M"), ("M1", "M"), ("NS1", "NS"), ("NS", "NS"), ("H1", None),
    ("HA", None), ("NA", None), ("N1", None), ("bogus", None),
]
# runtests.py:456-471
SEGMENT_NAME = [
    ("PB2", "PB2"), ("PB1", "PB1"), ("PA", "PA"), ("NP", "NP"), ("M", "M"),
    ("NS1", "NS"), ("HA", "HA"), ("NA", "NA"), ("MP", "M"), ("bogus", None),
    ("H1", None), ("N1", None),
]
# runtests.py:474-488
SEGMENT_SUBTYPE = [
    ("PB2", "PB2"), ("NS1", "NS"), ("M", "M"), ("H1", "H1"), ("H3", "H3"),
    ("HA", "HA"), ("NA", "NA"), ("N1", "N1"), ("N2", "N2"), ("bogus", None),
]
# runtests.py:491-500
SEGMENT_NUMBER = [
    ("0", None), ("1", "1"), ("8", "8"), ("9", None), ("PB1", None),
    ("H1", None), ("HA", None), ("bogus", None),
]
# runtests.py:503-535
STRAIN = [
    ("A/asdf/er", "A/asdf/er"), ("A/asdf/er  \t", "A/asdf/er"),
    ("A/asdf/2020", "A/asdf/2020"), ("B/asdf/2020", "B/asdf/2020"),
    ("C/asdf/2020", "C/asdf/2020"), ("D/asdf/2020", "D/asdf/2020"),
    ("E/asdf/2020", None),
    ("A/asdf foo bar/2020", "A/asdf_foo_bar/2020"),
    ("A/asdf/2020()", "A/asdf/2020"), ("A/asdf/2020 ()", "A/asdf/2020"),
    ("A/asdf/2020[]", "A/asdf/2020"), ("A/asdf/2020 []", "A/asdf/2020"),
    ("A/asdf/2020(H1N1)", "A/asdf/2020"), ("A/asdf/2020 (H1N1)", "A/asdf/2020"),
    ("A/asdf/2020[H1N1]", "A/asdf/2020"), ("A/asdf/2020 [H1N1]", "A/asdf/2020"),
    ("(A/Bratislava/6/97 (H3N2))", "A/Bratislava/6/97"),
    ("A/bogus", None), ("bogus", None),
]
# runtests.py:557-564
STATE = [
    ("wyoming", "WY"), ("WY", "WY"), ("District of Columbia", "DC"),
    ("North_Dakota", "ND"), ("North dakota", "ND"), ("bogus", None),
]
# runtests.py:567-577
IG_CLADE = [
    ("TRIG", "TRIG"), ("PDM", "PDM"), ("LAIV", "LAIV"), ("trig", "TRIG"),
    ("pdm", "PDM"), ("LaIv", "LAIV"), ("bogus", None),
]
# runtests.py:580-602
H1C = [("alpha", "alpha"), ("aLPHa", "aLPHa"), ("bogus", None)]
H3C = [("2010.1", "2010.1"), ("bogus", None)]
N1C = [("Classical", "Classical"), ("bogus", None)]
N2C = [("1998A", "1998A")]
# runtests.py:605-619
DNASEQ = [
    ("A", "A"), ("ATAGAGAGGGGTCCGCGCT", "ATAGAGAGGGGTCCGCGCT"),
    ("A_TR_YATTNN", "ATRYATTNN"),
]
PROSEQ = [("ATGAGAGA", "ATGAGAGA"), ("GANDALF", "GANDALF"),
          ("_PIC*K*L*E*", "PIC*K*L*E*")]
# runtests.py:622-628
UNKNOWN = [("", ""), ("1", "1"), ("a", "a"), ("yOlO123", "yOlO123")]
# runtests.py:85-109 (generic tokens)
INTEGER = [("42", "42"), ("0", "0"), ("007", None), ("-1", None), ("x", None)]
BOOLEAN = [
    ("1", "true"), ("y", "true"), ("t", "true"), ("yeS", "true"),
    ("tRuE", "true"), ("0", "false"), ("n", "false"), ("nO", "false"),
    ("faLse", "false"), ("bogus", None),
]

SUITES = [
    (R.BARCODE, BARCODE), (R.CONSTELLATION, CONSTELLATION),
    (R.COUNTRY, COUNTRY), (R.COUNTRY_OR_STATE, COUNTRY_OR_STATE),
    (R.DATE, DATES), (R.GENBANK, GENBANK), (R.EPI_SEQID, EPI),
    (R.GLOBAL_CLADE, GLOBAL_CLADE), (R.SUBTYPE, SUBTYPE),
    (R.HA_TOKEN, HA), (R.NA_TOKEN, NA), (R.HOST, HOST),
    (R.INTERNAL_GENE, INTERNAL_GENE), (R.SEGMENT_NAME, SEGMENT_NAME),
    (R.SEGMENT_SUBTYPE, SEGMENT_SUBTYPE), (R.SEGMENT_NUMBER, SEGMENT_NUMBER),
    (R.STRAIN, STRAIN), (R.STATE_USA, STATE),
    (R.INTERNAL_GENE_CLADE, IG_CLADE), (R.H1_CLADE, H1C), (R.H3_CLADE, H3C),
    (R.N1_CLADE, N1C), (R.N2_CLADE, N2C), (R.DNASEQ, DNASEQ),
    (R.PROSEQ, PROSEQ), (R.UNKNOWN, UNKNOWN), (R.INTEGER, INTEGER),
    (R.BOOLEAN, BOOLEAN),
]


@pytest.mark.parametrize(
    "recog,x,want",
    [(recog, x, want) for recog, suite in SUITES for x, want in suite],
    ids=lambda v: getattr(v, "name", repr(v))[:40],
)
def test_recognizer(recog, x, want):
    assert c(recog, x) == want


def test_vectorized_batch():
    """Whole-column evaluation matches cell-by-cell evaluation."""
    for recog, suite in SUITES:
        xs = pd.Series([x for x, _ in suite], dtype=object)
        out = recog.clean(xs)
        want = [w for _, w in suite]
        got = [None if v is None else v for v in out.tolist()]
        assert got == want, recog.name


def test_date_dtypes():
    from octofludb_spark.functions.dates import parse_date_series
    res = parse_date_series(pd.Series(["1986-05-17", "2011/05", "1990", "x"]))
    assert res["dtype"].tolist() == ["xsd:date", "xsd:gYearMonth", "xsd:gYear", None]


def test_run_unique_all_na_column():
    """An all-NA column of >=128 rows must not crash the dictionary-
    encoded path (regression: empty factorize uniques were indexed)."""
    import pandas as pd

    from octofludb_spark.functions import recognizers as R

    s = pd.Series([None] * 200, dtype=object)
    for recog in (R.GENBANK, R.DATE, R.HOST):
        res = R.run_unique(recog, s)
        assert res["clean"].isna().all()
    # and equivalence with the plain run on a mixed repetitive column
    s2 = pd.Series((["MN123456", None, "bad"] * 100), dtype=object)
    a, b = R.run_unique(R.GENBANK, s2), R.GENBANK.run(s2)
    assert a["clean"].fillna("").tolist() == b["clean"].fillna("").tolist()


def test_make_uri_series_all_na():
    import pandas as pd

    from octofludb_spark.functions.uri import make_uri_series

    out = make_uri_series(pd.Series([None] * 200, dtype=object))
    assert len(out) == 200 and out.isna().all()


def test_date_rejects_trailing_newline():
    """parse_strict consumes the whole cell: '2018\\n' is NOT a date
    (regression: '$' matched before the trailing newline).  Both the
    per-cell and the vectorized path must agree, and non-string cells
    classify identically regardless of column length."""
    import pandas as pd

    from octofludb_spark.functions.dates import parse_date_parts

    for n in (4, 600):  # straddle the _SMALL_N vectorization threshold
        vals = ["2018\n", "2018", 2018, None] * (n // 4)
        parts = parse_date_parts(pd.Series(vals, dtype=object))
        assert parts["y"][0] is None          # trailing newline rejected
        assert parts["y"][1] == "2018"
        assert parts["y"][2] == "2018"        # int cell stringified
