"""Report-layer business logic, transcribed from the reference suite:
subtype priority lattice (runtests.py:767-891), constellation assembly
(runtests.py:893-999), quarter derivation (runtests.py:777-781).

Note on test_constellations_well_mixed: the reference's OWN code
returns 'mixed' for that case (TX98 matches no clade and conflicts
with LAIV's V) — the checked-in expectation VPPVPT is stale and fails
against the reference itself (verified by executing
/root/reference/octofludb/formatting.py).  We match the code."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import NT
from octofludb_spark.plans.reports import (
    constellations,
    resolve_subtype,
    subtypes_report,
)
from octofludb_spark.plans.views import GraphViews

pytestmark = pytest.mark.spark

FID = "https://flu-crew.org/id/"


# --- subtype lattice (pure python spec) -----------------------------------

@pytest.mark.parametrize("has,nas,gis,gb,want", [
    ([], [], [], [], None),                                  # :768-775
    (["H1"], ["N1"], [], [], "H1N1"),                        # :782-784
    (["h1", "H1"], ["N1"], [], [], "H1N1"),
    (["h1 "], ["  n1 "], [], [], "H1N1"),
    (["H1", "H1"], ["N1"], [], [], "H1N1"),
    (["H1", "H2"], ["N1"], [], [], "mixed"),
    (["H1"], [], [], [], None),
    ([], ["N1"], [], [], None),
    (["H1"], [], ["H1N1"], [], "H1N1"),
    ([], ["N1"], [], ["H1N1"], "H1N1"),
    ([], ["N1"], ["H1N1"], ["H1N1"], "H1N1"),
    ([], [], ["H1N1"], [], "H1N1"),                          # :821-824
    ([], [], [], ["H1N1"], "H1N1"),
    ([], [], ["H1N1", "H1N1"], ["H1N1"], "H1N1"),
    ([], [], [" H1n1 ", " h1N1 "], [], "H1N1"),
    ([], [], ["H12avN12v"], ["H12N12pdm"], "H12N12"),
    ([], [], ["H1N1", "H3N2"], [], "mixed"),
    ([], [], [], ["H1N1", "H3N2"], "mixed"),
    ([], ["H1N1"], ["H1N1", "H3N2"], [], "mixed"),
    ([], [], ["H1N1", "H3N2"], ["H1N1"], "mixed"),
    (["H4"], ["N6"], [], ["H1N1", "H3N2"], "H4N6"),          # octoFLU wins
    (["H4"], ["N6"], ["H1N1", "H3N2"], [], "H4N6"),
    ([], [], ["H4N6"], ["H3N2"], "H3N2"),                    # genbank > gisaid
])
def test_resolve_subtype(has, nas, gis, gb, want):
    assert resolve_subtype(has, nas, gis, gb) == want


# --- constellation assembly over the graph --------------------------------

def _graph(spark, rows):
    """rows: (strain, segment, clade) -> minimal triple graph."""
    trips = []
    for strain, segment, clade in rows:
        sid = FID + strain.lower()
        gid = FID + f"{strain.lower()}-{segment.lower()}-{clade.lower()}"
        trips += [
            (sid, NT + "host", "swine", ""),
            (sid, NT + "strain_name", strain, ""),
            (sid, NT + "has_segment", gid, "uri"),
            (gid, NT + "segment_name", segment, ""),
            (gid, NT + "clade", clade, ""),
        ]
    df = spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]
    ).dropDuplicates()
    return GraphViews(df)


def _consts(spark, rows):
    out = constellations(_graph(spark, rows)).collect()
    return sorted((r.strain, r.constellation) for r in out)


def test_constellations_regular(spark):  # runtests.py:897-941
    data = [
        ("A", "PB2", "pdm"), ("A", "PB1", "pdm"), ("A", "PA", "pdm"),
        ("A", "NP", "pdm"), ("A", "M", "pdm"), ("A", "NS", "pdm"),
        ("B", "PB2", "TRIG"), ("B", "PA", "TRIG"), ("B", "NP", "TRIG"),
        ("B", "PB1", "TRIG"), ("B", "M", "TRIG"), ("B", "NS", "TRIG"),
        ("C", "PB2", "LAIV"), ("C", "PA", "LAIV"), ("C", "NP", "LAIV"),
        ("C", "M", "LAIV"), ("C", "PB1", "LAIV"), ("C", "NS", "LAIV"),
        ("D", "PB1", "humanSeasonal"), ("D", "PA", "humanSeasonal"),
        ("D", "M", "humanSeasonal"), ("D", "NP", "humanSeasonal"),
        ("D", "NS", "humanSeasonal"), ("D", "PB2", "humanSeasonal"),
        ("E", "PB1", "TRIG"), ("E", "PA", "humanSeasonal"),
        ("E", "NP", "LAIV"), ("E", "NS", "pdm"), ("E", "PB2", "pdm"),
    ]
    assert _consts(spark, data) == [
        ("A", "PPPPPP"), ("B", "TTTTTT"), ("C", "VVVVVV"),
        ("D", "HHHHHH"), ("E", "PTHV-P"),
    ]


def test_constellations_mixed(spark):  # runtests.py:943-955
    data = [
        ("A", "PB2", "pdm"), ("A", "PB1", "pdm"), ("A", "PA", "pdm"),
        ("A", "NP", "pdm"), ("A", "M", "pdm"), ("A", "NS", "pdm"),
        ("A", "NS", "TRIG"),
    ]
    assert _consts(spark, data) == [("A", "mixed")]


def test_constellations_well_mixed_matches_reference_code(spark):
    # reference CODE result (stale checked-in expectation is VPPVPT)
    data = [
        ("A", "PB2", "LAIV"), ("A", "PB2", "TX98"), ("A", "PB1", "pdm"),
        ("A", "PA", "pdm"), ("A", "NP", "LAIV"), ("A", "NP", "TX98"),
        ("A", "M", "pdm"), ("A", "NS", "TRIG"),
    ]
    assert _consts(spark, data) == [("A", "mixed")]


def test_constellations_irregular(spark):  # runtests.py:973-986
    data = [
        ("A", "PB2", "pdm"), ("A", "PB1", "chocolate"),
        ("A", "NP", "pdm"), ("A", "NS", "TRIG"),
    ]
    assert _consts(spark, data) == [("A", "PX-P-T")]


def test_constellations_flexible(spark):  # runtests.py:988-999
    data = [
        ("A", "PB2", "avian"), ("A", "PB1", "Avian"),
        ("A", "PA", "PA-avian-spillover"), ("A", "NP", "NP-avian"),
        ("A", "M", "PDM"), ("A", "NS", "Human"),
    ]
    assert _consts(spark, data) == [("A", "AAAAPX")]


# --- subtype report: Spark expression == python spec -----------------------

def test_subtypes_report_matches_spec(spark):
    """Graph with an HA H1 + NA N1 strain lacking a subtype -> H1N1."""
    sid = FID + "s1"
    ha, na = FID + "g1", FID + "g2"
    trips = [
        (sid, NT + "strain_name", "A/swine/Iowa/X/2020", ""),
        (sid, NT + "has_segment", ha, "uri"),
        (sid, NT + "has_segment", na, "uri"),
        (sid, NT + "isolate_id", "EPI_ISL_1", ""),
        (ha, NT + "segment_name", "HA", ""),
        (ha, NT + "segment_subtype", "H1", ""),
        (na, NT + "segment_name", "NA", ""),
        (na, NT + "segment_subtype", "N1", ""),
    ]
    df = spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]
    )
    out = subtypes_report(GraphViews(df)).collect()
    assert len(out) == 1
    assert out[0].strain_name == "A/swine/Iowa/X/2020"
    assert out[0].subtype == resolve_subtype(["H1"], ["N1"], [], []) == "H1N1"
    assert out[0].isolates == ["EPI_ISL_1"]


def test_subtypes_excludes_already_typed(spark):
    sid = FID + "s1"
    ha = FID + "g1"
    trips = [
        (sid, NT + "strain_name", "A/x/y", ""),
        (sid, NT + "subtype", "H3N2", ""),
        (sid, NT + "has_segment", ha, "uri"),
        (ha, NT + "segment_name", "HA", ""),
    ]
    df = spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]
    )
    assert subtypes_report(GraphViews(df)).count() == 0


def test_quarter_derivation(spark):  # runtests.py:777-781 semantics
    from octofludb_spark.plans.driver_queries import quarter_rollup

    df = spark.createDataFrame(
        [(1, 1, "O", 1.0, "2021-01-01 00:00:00", "x"),
         (2, 1, "O", 1.0, "2021-12-01 00:00:00", "x")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    out = {r.yq for r in quarter_rollup(spark, d).collect()}
    assert out == {"2021Q1", "2021Q4"}


def test_constellation_fuzz_vs_reference(spark):
    """constellation_from_rows fuzz-compared against the reference's
    own _make_constellations (formatting.py:70-125) — unknown
    segments (row skipped but the strain still reports '------'),
    '-like' clades -> X, case-insensitive substring fallback in dict
    order, per-slot conflicts -> whole string 'mixed'."""
    import contextlib
    import io
    import os
    import random
    import sys
    import warnings

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    sys.path.insert(1, "/root/reference")
    warnings.filterwarnings("ignore")
    from octofludb.formatting import _make_constellations

    from octofludb_spark.plans.reports import constellation_from_rows

    rng = random.Random(9091)
    segs = ["PB2", "PB1", "PA", "NP", "M", "MP", "NS", "HA", "weird", ""]
    clades = ["pdm", "LAIV", "TRIG", "humanSeasonal", "classicalSwine",
              "avian", "pdm-like", "xTRIGy", "PDM", "junk", "",
              "LAIV-Like", "avianlike", "sw.trig"]
    rows = []
    for i in range(400):
        for _ in range(1 + rng.randrange(6)):
            rows.append((f"s{i}", rng.choice(segs), rng.choice(clades)))
    with contextlib.redirect_stderr(io.StringIO()):
        ref = dict(_make_constellations(rows))
    df = spark.createDataFrame(rows, ["strain", "segment", "clade"])
    got = {r.strain: r.constellation
           for r in constellation_from_rows(df).collect()}
    assert got == ref


def test_masterlist_fuzz_vs_reference(spark):
    """masterlist_report_from_query fuzz-compared against the
    reference's own mk_masterlist (recipes.py:427-507) on synthetic
    query rows — '+'-joined multi-values, empty cells, the
    segment-conditional Genbank/clade columns, the H1/H3/N1/N2
    segment-subtype slots, and quarter_from_date's split-based
    parsing (single-digit months still yield a quarter).  Cells
    compare as SETS: the reference preserves first-seen order, this
    engine sorts for determinism — a documented deviation."""
    import contextlib
    import io
    import os
    import random
    import sys
    import warnings

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    sys.path.insert(1, "/root/reference")
    warnings.filterwarnings("ignore")
    from octofludb.recipes import mk_masterlist

    from octofludb_spark.plans.reports import masterlist_report_from_query

    rng = random.Random(4242)

    def plus(pool, lo=0, hi=3):
        return "+".join(rng.choice(pool)
                        for _ in range(rng.randrange(lo, hi + 1)))

    pools = dict(
        gb=["MN123456", "K00869", "", "X1"],
        segs=["HA", "NA", "PB2", "PB1", "PA", "NP", "M", "NS"],
        subs=["H1N1", "mixed", "", "H3N2"],
        dates=["2020-06-21", "2019-01-02", "2020", "", "2021-12-01",
               "2020-1-5", "junk-7", "2020-"],
        states=["IA", "TX", "MN", ""],
        strains=["A/swine/Iowa/X/2020", "A/x/2020", ""],
        clades=["alpha", "gamma", "1A.1.1", ""],
        consts=["TTTPPT", "------", "mixed", ""],
        motifs=["S145K", "", "x"],
        segsubs=["H1", "H3", "N1", "N2", "", ""],
    )
    fields = ["barcode", "genbank_id", "segment", "subtypes",
              "earliest_date", "states", "strains", "us_clades",
              "gl_clades", "consts", "segment_subtypes", "h3_motifs",
              "sa_motifs", "sb_motifs", "ca1_motifs", "ca2_motifs",
              "cb_motifs"]
    rows = []
    for i in range(200):
        for _ in range(1 + rng.randrange(4)):
            rows.append({
                "barcode": f"A0{i:07d}",
                "genbank_id": rng.choice(pools["gb"]),
                "segment": rng.choice(pools["segs"]),
                "subtypes": plus(pools["subs"], 1, 2),
                "earliest_date": rng.choice(pools["dates"]),
                "states": plus(pools["states"]),
                "strains": plus(pools["strains"]),
                "us_clades": plus(pools["clades"]),
                "gl_clades": plus(pools["clades"]),
                "consts": plus(pools["consts"]),
                "segment_subtypes": plus(pools["segsubs"], 0, 1),
                **{m: plus(pools["motifs"]) for m in
                   ("h3_motifs", "sa_motifs", "sb_motifs", "ca1_motifs",
                    "ca2_motifs", "cb_motifs")},
            })
    bindings = [{k: {"value": v} for k, v in r.items()} for r in rows]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mk_masterlist({"results": {"bindings": bindings}})
    lines = buf.getvalue().splitlines()
    hdr = lines[0].split("\t")
    ref = {}
    for ln in lines[1:]:
        d = dict(zip(hdr, ln.split("\t")))
        ref[d["Barcode"]] = {
            k: frozenset(x for x in v.split(",") if x)
            for k, v in d.items() if k != "Barcode"}
    df = spark.createDataFrame([[r[f] for f in fields] for r in rows],
                               fields)
    got = {}
    for r in masterlist_report_from_query(df).collect():
        d = r.asDict()
        got[d["Barcode"]] = {
            k: frozenset(x for x in (v or "").split(",") if x)
            for k, v in d.items() if k != "Barcode"}
    assert got == ref


def test_subtypes_report_fuzz_vs_reference(spark):
    """subtypes_report_from_query fuzz-compared against the
    reference's own mk_subtypes (recipes.py:338-387): '+'-joined
    multi-values, single-valued segment_subtypes gating the HA/NA
    slots (H\\d+/N\\d+ fullmatch), the priority lattice, and the
    per-isolate fan-out of the resolved subtype."""
    import contextlib
    import io
    import os
    import random
    import sys
    import warnings

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
    sys.path.insert(1, "/root/reference")
    warnings.filterwarnings("ignore")
    from octofludb.recipes import mk_subtypes

    from octofludb_spark.plans.reports import subtypes_report_from_query

    rng = random.Random(77)

    def plus(pool, lo=0, hi=3):
        return "+".join(rng.choice(pool)
                        for _ in range(rng.randrange(lo, hi + 1)))

    isolates = ["EPI_ISL_1", "EPI_ISL_2", "A01234567", ""]
    segsubs = ["H1", "H3", "N1", "N2", "h1", "H10", "N", "x", ""]
    subs = ["H1N1", "mixed", "", "H3N2", "swH1n2", "A(H3N2)"]
    fields = ["strain_name", "segment_name", "isolates",
              "segment_subtypes", "gisaid_subtypes", "genbank_subtypes"]
    rows = []
    for i in range(250):
        strain = f"A/x/{i}/2020"
        for _ in range(1 + rng.randrange(3)):
            rows.append({
                "strain_name": strain,
                "segment_name": rng.choice(["HA", "NA"]),
                "isolates": plus(isolates),
                "segment_subtypes": plus(segsubs, 0, 2),
                "gisaid_subtypes": plus(subs),
                "genbank_subtypes": plus(subs),
            })
    bindings = [{k: {"value": v} for k, v in r.items()} for r in rows]
    with contextlib.redirect_stderr(io.StringIO()):
        strain_entries, isolate_entries = mk_subtypes(
            {"results": {"bindings": bindings}})
    df = spark.createDataFrame([[r[f] for f in fields] for r in rows],
                               fields)
    out = subtypes_report_from_query(df).collect()
    assert {r.strain_name: r.subtype for r in out} == dict(strain_entries)
    assert {(i, r.subtype) for r in out
            for i in r.isolates} == set(isolate_entries)
