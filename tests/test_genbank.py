"""GenBank record ingestion parity (reference genbank.py:37-187)."""

import json

from octofludb_spark.extract.genbank import genbank_triples

FID = "https://flu-crew.org/id/"
FT = "https://flu-crew.org/term/"
WORLD = "https://flu-crew.org/geo/country/"
USA = "https://flu-crew.org/geo/country/usa/"

RECORD = {
    "GBSeq_primary-accession": "MN123456",
    "GBSeq_organism": "Influenza A virus",
    "GBSeq_locus": "MN123456",
    "GBSeq_length": "2280",
    "GBSeq_update-date": "05-JUN-2021",
    "GBSeq_create-date": "01-APR-2020",
    "GBSeq_definition": "Influenza A virus segment 1",
    "GBSeq_sequence": "gatacagataca",
    "GBSeq_feature-table": [
        {
            "GBFeature_key": "source",
            "GBFeature_location": "1..2280",
            "GBFeature_quals": [
                {"GBQualifier_name": "strain",
                 "GBQualifier_value": "A/swine/Iowa/A01234567/2020 (H1N1)"},
                {"GBQualifier_name": "host", "GBQualifier_value": "Sus scrofa"},
                {"GBQualifier_name": "country",
                 "GBQualifier_value": "USA: Iowa"},
                {"GBQualifier_name": "collection_date",
                 "GBQualifier_value": "2020-06-21"},
                {"GBQualifier_name": "serotype", "GBQualifier_value": "H1N1"},
            ],
        },
        {
            "GBFeature_key": "CDS",
            "GBFeature_quals": [
                {"GBQualifier_name": "gene", "GBQualifier_value": "PB2"},
                {"GBQualifier_name": "translation",
                 "GBQualifier_value": "MERIKEL"},
            ],
        },
    ],
}


def _trips(content):
    df = genbank_triples(content)
    return {(r.s, r.p, r.o, r.dt) for r in df.itertuples(index=False)}


def test_genbank_record():
    got = _trips(json.dumps(RECORD))
    gid = FID + "mn123456"
    sid = FID + "a%2Fswine%2Fiowa%2Fa01234567%2F2020"
    f0 = FID + "MN123456_feat_0"
    f1 = FID + "MN123456_feat_1"
    import hashlib
    md5 = hashlib.md5(b"GATACAGATACA").hexdigest()
    pro_md5 = hashlib.md5(b"MERIKEL").hexdigest()

    assert (gid, FT + "genbank_id", "MN123456", "") in got
    assert (gid, FT + "length", "2280", "xsd:integer") in got
    assert (gid, FT + "update_date", "2021-06-05", "xsd:date") in got
    assert (gid, FT + "dnaseq", "GATACAGATACA", "") in got
    assert (gid, FT + "chksum", md5, "") in got
    # feature sub-nodes: deterministic uid, case preserved
    assert (gid, FT + "has_feature", f0, "uri") in got
    assert (f0, FT + "name", "source", "") in got
    assert (f0, FT + "location", "1..2280", "") in got
    assert (f0, FT + "serotype", "H1N1", "") in got
    # gene qual: parsed segment on the RECORD + raw gene on the feature
    assert (gid, FT + "segment_name", "PB2", "") in got
    assert (f1, FT + "gene", "PB2", "") in got
    assert (f1, FT + "proseq", "MERIKEL", "") in got
    assert (f1, FT + "chksum", pro_md5, "") in got
    # strain linking
    assert (sid, FT + "has_segment", gid, "uri") in got
    assert (sid, FT + "strain_name", "A/swine/Iowa/A01234567/2020", "") in got
    assert (sid, FT + "host", "swine", "") in got
    assert (sid, FT + "date", "2020-06-21", "xsd:date") in got
    assert (sid, FT + "country", WORLD + "USA", "uri") in got
    assert (sid, FT + "state", USA + "IA", "uri") in got
    assert (sid, FT + "barcode", "A01234567", "") in got


def test_genbank_filters_non_influenza():
    rec = dict(RECORD, GBSeq_organism="Homo sapiens")
    assert not _trips(json.dumps(rec))


def test_genbank_unknown_country_fallback():
    rec = json.loads(json.dumps(RECORD))
    rec["GBSeq_feature-table"][0]["GBFeature_quals"][2][
        "GBQualifier_value"] = "Kosovo"
    got = _trips(json.dumps(rec))
    sid = FID + "a%2Fswine%2Fiowa%2Fa01234567%2F2020"
    curi = WORLD + "kosovo"
    assert (sid, FT + "country", curi, "uri") in got
    assert (curi, FT + "name", "Kosovo", "") in got
