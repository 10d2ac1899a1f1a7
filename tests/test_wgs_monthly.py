"""wgs.rq / monthly-context.rq plans + maintenance ops."""

import pytest
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import NT
from octofludb_spark.plans.reports import monthly_context, wgs_report
from octofludb_spark.plans.views import GraphViews

pytestmark = pytest.mark.spark

FID = "https://flu-crew.org/id/"
WORLD = "https://flu-crew.org/geo/country/"


def _wgs_graph(spark):
    sid = FID + "s1"
    ha, na = FID + "ha1", FID + "na1"
    trips = [
        (sid, NT + "strain_name", "A/swine/Iowa/A01234567/2020", ""),
        (sid, NT + "host", "swine", ""),
        (sid, NT + "country", WORLD + "USA", "uri"),
        (WORLD + "USA", NT + "code", "USA", ""),
        (sid, NT + "barcode", "A01234567", ""),
        (sid, NT + "date", "2020-06-21", "xsd:date"),
        (sid, NT + "subtype", "H1N1", ""),
        (sid, NT + "constellation", "PPPVVT", ""),
        (sid, NT + "has_segment", ha, "uri"),
        (sid, NT + "has_segment", na, "uri"),
        (ha, NT + "segment_name", "HA", ""),
        (ha, NT + "genbank_id", "MN000001", ""),
        (ha, NT + "clade", "alpha", ""),
        (ha, NT + "gl_clade", "1A.1.1", ""),
        (ha, NT + "dnaseq", "GATACA", ""),
        (na, NT + "segment_name", "NA", ""),
        (na, NT + "genbank_id", "MN000002", ""),
        (na, NT + "clade", "Classical", ""),
        (na, NT + "dnaseq", "CATCAT", ""),
    ]
    return GraphViews(spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]))


def test_wgs_report(spark):
    v = _wgs_graph(spark)
    out = wgs_report(v, year=2020, month=6).collect()
    assert len(out) == 1
    r = out[0]
    assert r.strain == "A/swine/Iowa/A01234567/2020"
    assert r.h_genbank == "MN000001" and r.n_genbank == "MN000002"
    assert r.day == "21" and r.country == "USA"
    assert r.ha_clade == "alpha" and r.na_clade == "Classical"
    # wrong month -> empty
    assert wgs_report(v, year=2020, month=7).count() == 0


def test_monthly_context_date_window(spark):
    v = _wgs_graph(spark)
    out = monthly_context(v, "2020-01-01", "2020-12-31").collect()
    segs = {(r.strain, r.segment, r.seq) for r in out}
    assert ("A/swine/Iowa/A01234567/2020", "HA", "GATACA") in segs
    assert ("A/swine/Iowa/A01234567/2020", "NA", "CATCAT") in segs
    # outside the window but const matches [PVT]{6} and year>2015 -> kept
    assert monthly_context(v, "2021-01-01", "2021-02-01").count() == 2


def test_maintenance_deletes(spark, tmp_path):
    from octofludb_spark.plans.maintenance import (
        clear_query_tags,
        delete_predicate,
        query_tag_triples,
    )
    from octofludb_spark.sources.store import TripleStore

    store = TripleStore(str(tmp_path / "s"))
    base = spark.createDataFrame(
        [("s1", NT + "subtype", "H1N1", ""),
         ("s1", NT + "host", "swine", "")],
        ["subject", "predicate", "object_lex", "object_dtype"],
    )
    store.merge_triples(spark, base)
    store.merge_triples(spark, query_tag_triples(spark, ["A/x/y"], "q1"))
    assert store.read(spark, "triples").count() == 3
    delete_predicate(spark, store, "subtypes")
    assert store.read(spark, "triples").count() == 2
    clear_query_tags(spark, store)
    preds = {r.predicate for r in store.read(spark, "triples").collect()}
    assert preds == {NT + "host"}


def test_wgs_day_is_unpadded_integer(spark):
    """SPARQL BIND(DAY(?date)) yields an integer: day '3', never '03'
    (wgs.rq:46)."""
    sid = FID + "s2"
    ha, na = FID + "ha2", FID + "na2"
    trips = [
        (sid, NT + "strain_name", "A/swine/Iowa/A07654321/2020", ""),
        (sid, NT + "host", "swine", ""),
        (sid, NT + "country", WORLD + "USA", "uri"),
        (WORLD + "USA", NT + "code", "USA", ""),
        (sid, NT + "date", "2020-06-03", "xsd:date"),
        (sid, NT + "has_segment", ha, "uri"),
        (sid, NT + "has_segment", na, "uri"),
        (ha, NT + "segment_name", "HA", ""),
        (ha, NT + "genbank_id", "MN000003", ""),
        (na, NT + "segment_name", "NA", ""),
        (na, NT + "genbank_id", "MN000004", ""),
    ]
    v = GraphViews(spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]))
    r = wgs_report(v, year=2020, month=6).collect()[0]
    assert r.day == "3"


def test_monthly_context_excludes_partial_dates(spark):
    """The reference FILTER compares ?date against xsd:date literals
    and applies YEAR(?date) (monthly-context.rq:28-30): both
    type-error on gYear/gYearMonth, so a '2020-06'^^gYearMonth strain
    is EXCLUDED even though it lexically falls in the window."""
    sid = FID + "s3"
    ha, na = FID + "ha3", FID + "na3"
    trips = [
        (sid, NT + "strain_name", "A/swine/Iowa/A09999999/2020", ""),
        (sid, NT + "host", "swine", ""),
        (sid, NT + "country", WORLD + "USA", "uri"),
        (WORLD + "USA", NT + "code", "USA", ""),
        (sid, NT + "barcode", "A09999999", ""),
        (sid, NT + "date", "2020-06", "xsd:gYearMonth"),
        (sid, NT + "subtype", "H1N1", ""),
        (sid, NT + "has_segment", ha, "uri"),
        (sid, NT + "has_segment", na, "uri"),
        (ha, NT + "segment_name", "HA", ""),
        (ha, NT + "clade", "alpha", ""),
        (ha, NT + "dnaseq", "GATACA", ""),
        (na, NT + "segment_name", "NA", ""),
        (na, NT + "clade", "Classical", ""),
        (na, NT + "dnaseq", "CATCAT", ""),
    ]
    v = GraphViews(spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]))
    assert monthly_context(v, "2020-01-01", "2020-12-31").count() == 0
