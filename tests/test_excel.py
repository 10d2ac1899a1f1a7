"""Real binary Excel ingestion (S3/S4): the reference's own CI test
(`prep gis gisaid.xls` diffed against .exp-gisaid.ttl,
reference test-data/Makefile:4-7) reproduced END-TO-END on the real
OLE2/BIFF8 file with the stdlib reader — plus xlsx round-trip and the
distributed gisaid_xls lang path."""

import base64
import os

import pytest

XLS = "/root/reference/test-data/gisaid.xls"
GOLDEN = "/root/reference/test-data/.exp-gisaid.ttl"

needs_fixture = pytest.mark.skipif(
    not os.path.exists(XLS), reason="reference fixture not present")


@needs_fixture
def test_gisaid_xls_full_golden_parity():
    """EXACT triple-set equality with the reference CI golden over the
    ENTIRE real gisaid.xls (224 triples, every isolate)."""
    from octofludb_spark.extract.recipes import gisaid_triples_excel
    from octofludb_spark.plans.turtle import parse_turtle

    df = gisaid_triples_excel(open(XLS, "rb").read())
    got = {(r.s, r.p, r.o) for r in df.itertuples(index=False)}
    want = set(parse_turtle(open(GOLDEN).read()))
    assert got == want
    assert len(got) == 224


@needs_fixture
def test_xls_cell_grid():
    from octofludb_spark.extract.xls import excel_columns, parse_excel

    rows = parse_excel(open(XLS, "rb").read())
    assert rows[0][0] == "Isolate_Id"
    assert len(rows) == 5  # header + 4 isolates
    cols = excel_columns(open(XLS, "rb").read())
    assert cols["Isolate_Id"] == [
        "EPI_ISL_393495", "EPI_ISL_393494", "EPI_ISL_393493",
        "EPI_ISL_218508"]
    # empty cells -> None (strOrNone parity, reference classes.py:264)
    assert cols["PB2 Segment_Id"][0] is None


def test_xlsx_roundtrip_and_recipe_parity():
    """write_xlsx -> parse_xlsx round-trips, and the gisaid recipe
    produces identical triples from xlsx bytes and TSV text."""
    from octofludb_spark.extract.recipes import (gisaid_triples,
                                                 gisaid_triples_excel)
    from octofludb_spark.extract.xls import parse_xlsx, write_xlsx

    head = ["Isolate_Id", "Isolate_Name", "Host", "Subtype", "Lineage",
            "Location", "Collection_Date", "Submission_Date",
            "HA Segment_Id", "HA INSDC_Upload"]
    row = ["EPI_ISL_1", "A/swine/Iowa/A01234567/2019", "swine", "H1N1",
           "pdm09", "North America / United States / Iowa",
           "2019-05-01", "2019-06-01", "EPI111 | x", "MN00001"]
    xlsx = write_xlsx([head, row])
    assert parse_xlsx(xlsx) == [head, row]
    tsv = "\t".join(head) + "\n" + "\t".join(row)
    a = gisaid_triples_excel(xlsx)
    b = gisaid_triples(tsv)
    assert {tuple(r) for r in a.itertuples(index=False)} == \
           {tuple(r) for r in b.itertuples(index=False)}
    assert len(a) > 0


def test_number_cells_render_like_pandas_str():
    from octofludb_spark.extract.xls import _num_to_str

    assert _num_to_str(744022.0) == "744022"
    assert _num_to_str(3.25) == "3.25"


@needs_fixture
@pytest.mark.spark
def test_gisaid_xls_lang_distributed(spark):
    """The gisaid_xls lang flows through the distributed extraction
    pipeline (base64 content in the string corpus) and yields the same
    224 triples plus lineage columns."""
    from octofludb_spark.extract.pipeline import run_extraction

    content = base64.b64encode(open(XLS, "rb").read()).decode()
    import hashlib
    src = spark.createDataFrame(
        [("r", "gisaid.xls", "c0", "gisaid_xls", content,
          hashlib.sha256(content.encode()).hexdigest())],
        "repo string, path string, commit string, lang string, "
        "content string, content_sha256 string")
    triples, metrics = run_extraction(src)
    assert triples.count() == 224
    m = metrics.collect()[0]
    assert m.sha_violations == 0


def test_num_to_str_nonfinite_does_not_raise():
    """One NaN/Inf NUMBER cell must not kill the whole sheet parse."""
    from octofludb_spark.extract.xls import _num_to_str

    assert _num_to_str(float("nan")) == "nan"
    assert _num_to_str(float("inf")) == "inf"
    assert _num_to_str(2.0) == "2"
    assert _num_to_str(2.5) == "2.5"
