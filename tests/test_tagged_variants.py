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

pytestmark = pytest.mark.spark

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
