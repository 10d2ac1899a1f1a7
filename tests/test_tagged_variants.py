"""all-acc, get-h1/h3-sequences, and the tagged segment/sequence/
isolate query variants."""

import pytest

from octofludb_spark.functions.uri import NT
from octofludb_spark.plans.reports import (
    all_accessions,
    h_sequences,
    tagged_isolates,
    tagged_segments,
    tagged_sequences,
)
from octofludb_spark.plans.views import GraphViews

pytestmark = [pytest.mark.spark, pytest.mark.core]

FID = "https://flu-crew.org/id/"
Q = "https://flu-crew.org/query/"


def _graph(spark):
    sid, lid = FID + "s1", FID + "l1"
    ha, na = FID + "mn000001", FID + "epi1"
    trips = [
        # strain entity
        (sid, NT + "strain_name", "A/swine/Iowa/X/2020", ""),
        (sid, NT + "subtype", "H1N1", ""),
        (sid, NT + "host", "swine", ""),
        (sid, NT + "date", "2020-06-21", "xsd:date"),
        (sid, NT + "has_segment", ha, "uri"),
        (sid, NT + "has_segment", na, "uri"),
        # isolate entity sharing the strain name
        (lid, NT + "isolate_id", "EPI_ISL_1", ""),
        (lid, NT + "strain_name", "A/swine/Iowa/X/2020", ""),
        (lid, NT + "date", "2020-06-21", "xsd:date"),
        (lid, NT + "host", "swine", ""),
        (lid, NT + "has_segment", ha, "uri"),
        # segments
        (ha, NT + "segment_name", "HA", ""),
        (ha, NT + "genbank_id", "MN000001", ""),
        (ha, NT + "dnaseq", "GATACA", ""),
        (ha, NT + "chksum", "abc123", ""),
        (ha, NT + "clade", "alpha", ""),
        (ha, NT + "gl_clade", "1A.1.1", ""),
        (ha, NT + "definition", "Influenza A virus", ""),
        (na, NT + "segment_name", "NA", ""),
        (na, NT + "epi_id", "EPI1", ""),
        (na, NT + "dnaseq", "CATCAT", ""),
        (na, NT + "chksum", "def456", ""),
        (na, NT + "clade", "Classical", ""),
        # query tag on the strain name
        (Q + "default", NT + "query_tag", "A/swine/Iowa/X/2020", ""),
    ]
    return GraphViews(spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]))


def test_all_accessions(spark):
    got = {r.acc for r in all_accessions(_graph(spark)).collect()}
    assert got == {"MN000001"}


def test_h_sequences(spark):
    got = {(r.seqid, r.seq) for r in h_sequences(_graph(spark), "H1N").collect()}
    assert got == {("MN000001", "GATACA")}
    assert h_sequences(_graph(spark), "H3N").count() == 0


def test_tagged_segments(spark):
    rows = tagged_segments(_graph(spark)).collect()
    by_hash = {r.dna_hash: r for r in rows}
    assert by_hash["abc123"].genbank_id == "MN000001"
    assert by_hash["abc123"].segment_name == "HA"
    assert by_hash["def456"].epiflu_id == "EPI1"


def test_tagged_sequences(spark):
    rows = tagged_sequences(_graph(spark)).collect()
    segs = {(r.segment_name, r.seq): r for r in rows}
    assert ("HA", "GATACA") in segs
    r = segs[("HA", "GATACA")]
    assert r.subtypes == "H1N1" and r.haclades == "alpha"
    assert r.earliest_date == "2020-06-21"


def test_tagged_isolates(spark):
    rows = tagged_isolates(_graph(spark)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.isolate == "EPI_ISL_1"
    assert r.strains == "A/swine/Iowa/X/2020"
    assert r.subtypes == "H1N1"  # via the shared strain name
    assert r.gl_clades == "1A.1.1"


def test_tagged_max_report(spark):
    """The INTENDED get-tagged.rq (the shipped query is broken:
    ?msgid typo + undefined 'MS' segment, get-tagged.rq:76-79):
    per-isolate row with per-segment seqid columns."""
    from octofludb_spark.plans.reports import tagged_max_report

    rows = {r.isolate: r for r in tagged_max_report(_graph(spark)).collect()}
    assert set(rows) == {"EPI_ISL_1"}
    r = rows["EPI_ISL_1"]
    assert r.strain == "A/swine/Iowa/X/2020"
    assert r.HA == "MN000001"   # genbank seqid on the HA segment
    assert r.NA == ""           # isolate entity has no NA segment
    assert r.haclade == "alpha"
    assert r.gl_clade == "1A.1.1"
    assert r.host == "swine"
    assert r.date == "2020-06-21"


def _graph_with(spark, extra, base=True):
    from pyspark.sql import Row  # noqa: F401
    sid, lid = FID + "s1", FID + "l1"
    ha, na = FID + "mn000001", FID + "epi1"
    trips = []
    if base:
        trips = [
            (sid, NT + "strain_name", "A/swine/Iowa/X/2020", ""),
            (sid, NT + "subtype", "H1N1", ""),
            (sid, NT + "host", "swine", ""),
            (sid, NT + "date", "2020-06-21", "xsd:date"),
            (sid, NT + "has_segment", ha, "uri"),
            (sid, NT + "has_segment", na, "uri"),
            (lid, NT + "isolate_id", "EPI_ISL_1", ""),
            (lid, NT + "strain_name", "A/swine/Iowa/X/2020", ""),
            (lid, NT + "date", "2020-06-21", "xsd:date"),
            (lid, NT + "host", "swine", ""),
            (lid, NT + "has_segment", ha, "uri"),
            (ha, NT + "segment_name", "HA", ""),
            (ha, NT + "genbank_id", "MN000001", ""),
            (ha, NT + "dnaseq", "GATACA", ""),
            (ha, NT + "chksum", "abc123", ""),
            (ha, NT + "clade", "alpha", ""),
            (na, NT + "segment_name", "NA", ""),
            (na, NT + "epi_id", "EPI1", ""),
            (na, NT + "dnaseq", "CATCAT", ""),
            (na, NT + "chksum", "def456", ""),
            (na, NT + "clade", "Classical", ""),
        ]
    return GraphViews(spark.createDataFrame(
        trips + extra, ["subject", "predicate", "object_lex", "object_dtype"]))


def test_seqid_tag_restricts_to_matching_segment(spark):
    """get-tagged-segment/-sequence.rq bind the SAME ?gid in the
    seqid-tag branch and the query body: a genbank-accession tag
    returns ONLY that segment, never the strain's other segments."""
    v = _graph_with(spark, [
        (FID + "mn000001", NT + "gl_clade", "1A.1.1", ""),
        (Q + "t", NT + "query_tag", "MN000001", ""),
    ])
    segs = tagged_segments(v).collect()
    assert {r.dna_hash for r in segs} == {"abc123"}  # HA only, no NA row
    seqs = tagged_sequences(v).collect()
    assert {r.segment_name for r in seqs} == {"HA"}


def test_haclade_requires_gl_clade_on_same_segment(spark):
    """?haclade is nested INSIDE the gl_clade OPTIONAL
    (get-tagged-strain.rq:49-53): an HA clade without gl_clade on the
    same segment must NOT surface."""
    from octofludb_spark.plans.reports import tagged_strains

    v = _graph_with(spark, [  # base HA has clade=alpha but NO gl_clade
        (Q + "t", NT + "query_tag", "A/swine/Iowa/X/2020", ""),
    ])
    r = tagged_strains(v).collect()[0]
    assert r.haclades == "" and r.gl_clades == ""
    v2 = _graph_with(spark, [
        (FID + "mn000001", NT + "gl_clade", "1A.1.1", ""),
        (Q + "t", NT + "query_tag", "A/swine/Iowa/X/2020", ""),
    ])
    r2 = tagged_strains(v2).collect()[0]
    assert r2.haclades == "alpha" and r2.gl_clades == "1A.1.1"


def test_tagged_constellations_and_countries_constitutively_empty(spark):
    """The reference SELECTs GROUP_CONCAT(?constellation)/(?country)
    but binds ?const and never binds ?country (get-tagged-strain.rq,
    -sequence, -isolate): those cells are ALWAYS empty, even when the
    graph has constellation/country triples."""
    from octofludb_spark.plans.reports import tagged_strains

    v = _graph_with(spark, [
        (FID + "s1", NT + "constellation", "TTTTTT", ""),
        (FID + "s1", NT + "country", "https://flu-crew.org/geo/country/USA", "uri"),
        ("https://flu-crew.org/geo/country/USA", NT + "code", "USA", ""),
        (FID + "mn000001", NT + "gl_clade", "1A.1.1", ""),
        (Q + "t", NT + "query_tag", "A/swine/Iowa/X/2020", ""),
    ])
    for df in (tagged_strains(v), tagged_sequences(v), tagged_isolates(v)):
        for r in df.collect():
            assert r.constellations == "" and r.countries == ""


def test_isolate_id_tag_matches_isolate_report(spark):
    """get-tagged-isolate.rq branch 2 matches ?lid f:isolate_id ?tag —
    tagging an EPI_ISL id (the report's primary use) must return the
    isolate row; a barcode tag routes through the shared strain."""
    v = _graph_with(spark, [
        (FID + "s1", NT + "barcode", "A01234567", ""),
        (FID + "mn000001", NT + "gl_clade", "1A.1.1", ""),
        (Q + "t", NT + "query_tag", "EPI_ISL_1", ""),
    ])
    rows = tagged_isolates(v).collect()
    assert len(rows) == 1 and rows[0].isolate == "EPI_ISL_1"
    v2 = _graph_with(spark, [
        (FID + "s1", NT + "barcode", "A01234567", ""),
        (Q + "t", NT + "query_tag", "A01234567", ""),
    ])
    rows2 = tagged_isolates(v2).collect()
    assert len(rows2) == 1 and rows2[0].isolate == "EPI_ISL_1"
