"""S5 (Entrez discovery/fetch) and S11 (octoFLU wrapper): the logic —
window traversal, anti-diff, batching, retries, chunking, output
parsing — exercised with injected fakes; only the IO edge is dark."""

import json

import pandas as pd
import pytest

from octofludb_spark.sources.external import (
    discover_new_accessions,
    fetch_genbank_triples,
    month_windows,
    octoflu_classifier,
    parse_octoflu_output,
)


def test_month_windows_reference_traversal():
    # entrez.py:88-122: months backwards from now to 2000, skipping
    # future months, then years 1999->1918
    w = month_windows(2001, 2, min_year=1998)
    assert w[:5] == ["2001/2", "2001/1", "2000/12", "2000/11", "2000/10"]
    # year windows after the 2000 month loop; min_year itself included
    # (entrez.py:115 `if year < min_year ... break`)
    assert w[-4:] == ["2000/2", "2000/1", "1999", "1998"]
    assert "2001/3" not in w  # no future months
    w2 = month_windows(2021, 3, nmonths=3)
    assert w2 == ["2021/3", "2021/2", "2021/1"]  # budget stops everything


def test_discover_new_accessions_anti_diff(spark):
    acc_by_window = {
        "2021/2": ["MN1", "MN2", "MN3"],
        "2021/1": ["MN3", "MN4"],
    }
    existing = spark.createDataFrame([("MN2",), ("MN4",)], "acc string")
    out = discover_new_accessions(
        spark, existing, ["2021/2", "2021/1"],
        search=lambda lo, hi: acc_by_window[lo])
    got = {(r.window, r.acc) for r in out.collect()}
    assert got == {("2021/2", "MN1"), ("2021/2", "MN3"), ("2021/1", "MN3")}


def test_fetch_batches_retry_core():
    """Batching + 15s-backoff retry (entrez.py:126-143 parity),
    tested driver-side where closure state is observable."""
    from octofludb_spark.sources.external import fetch_batches

    calls = {"n": 0, "fail": 2}
    sleeps = []

    def fetch(ids):
        calls["n"] += 1
        if calls["fail"] > 0:
            calls["fail"] -= 1
            raise ConnectionError("transient")
        return [{"acc": a} for a in ids]

    out = list(fetch_batches([f"MN{i}" for i in range(7)], fetch,
                             batch_size=3, sleep=sleeps.append))
    assert [len(b) for b in out] == [3, 3, 1]
    assert calls["n"] == 3 + 2  # 3 batches + 2 transient retries
    assert sleeps == [15.0, 15.0]
    # permanent failure surfaces after max attempts
    def always_fail(ids):
        raise ConnectionError("down")
    import pytest as _pytest
    with _pytest.raises(ConnectionError):
        list(fetch_batches(["MN1"], always_fail, attempts=3,
                           sleep=lambda s: None))


def test_fetch_genbank_triples_distributed(spark):
    def fetch(ids):
        # defined fully inline: the closure ships to executors via
        # cloudpickle and must not reference this test module
        return [{
            "GBSeq_primary-accession": acc,
            "GBSeq_locus": acc,
            "GBSeq_organism": "Influenza A virus",
            "GBSeq_length": "900",
            "GBSeq_definition":
                "Influenza A virus (A/swine/Iowa/A01/2020) segment",
            "GBSeq_sequence": "gataca",
            "GBSeq_feature-table": [{
                "GBFeature_key": "source",
                "GBFeature_quals": [
                    {"GBQualifier_name": "strain",
                     "GBQualifier_value": "A/swine/Iowa/A01/2020"},
                    {"GBQualifier_name": "host",
                     "GBQualifier_value": "Sus scrofa"},
                ],
            }],
        } for acc in ids]

    acc = spark.createDataFrame([("MN%d" % i,) for i in range(7)],
                                "acc string").repartition(2)
    out = fetch_genbank_triples(acc, fetch, batch_size=3)
    rows = out.collect()
    assert len(rows) > 0
    accs = {r.o for r in rows
            if r.p == "https://flu-crew.org/term/genbank_id"}
    assert accs == {"MN%d" % i for i in range(7)}


def test_octoflu_wrapper_chunking_and_parse():
    invocations = []

    def fake_runner(chunk_path):
        seqids = [l[1:] for l in open(chunk_path) if l.startswith(">")]
        invocations.append(len(seqids))
        return "\n".join(f"{s.strip()}\tH1\talpha\t1A.1.1\textra-col-dropped"
                         for s in seqids)

    classify = octoflu_classifier(fake_runner, chunk_size=2)
    pdf = pd.DataFrame({"seqid": [f"S{i}" for i in range(5)],
                        "seq": ["GATACA"] * 5})
    out = classify(pdf)
    assert invocations == [2, 2, 1]  # reference's chunking bound
    assert list(out.columns) == ["seqid", "segment_subtype", "clade",
                                 "gl_clade"]
    assert len(out) == 5 and set(out.segment_subtype) == {"H1"}


@pytest.mark.spark
def test_octoflu_classifier_in_enrich_slot(spark):
    """The wrapper satisfies the enrich_classifications mapInPandas
    interface (plans/enrich.py)."""
    import pyspark.sql.types as T

    def fake_runner(chunk_path):
        seqids = [l[1:].strip() for l in open(chunk_path)
                  if l.startswith(">")]
        return "\n".join(f"{s}\tN2\t2002A\t1B.2.1" for s in seqids)

    classify = octoflu_classifier(fake_runner)
    seqs = spark.createDataFrame(
        [("MN1", "GATACA"), ("MN2", "CATCAT")], "seqid string, seq string")
    schema = T.StructType([T.StructField(c, T.StringType()) for c in
                           ("seqid", "segment_subtype", "clade", "gl_clade")])
    out = seqs.mapInPandas(
        lambda it: (classify(pdf) for pdf in it if len(pdf)), schema)
    got = {(r.seqid, r.segment_subtype) for r in out.collect()}
    assert got == {("MN1", "N2"), ("MN2", "N2")}


@pytest.mark.spark
def test_enrich_motifs_round(spark, tmp_path):
    """S12: the upload_motifs round (ui.py:293-328) with an injected
    flutile-like runner — sequences pulled from the store, motif table
    re-extracted as segment-keyed triples, merged idempotently."""
    from octofludb_spark.sources.external import (H1_MOTIF_PATTERNS,
                                                  enrich_motifs)
    from octofludb_spark.sources.store import TripleStore

    NT = "https://flu-crew.org/term/"
    FID = "https://flu-crew.org/id/"
    trips = [
        (FID + "s1", NT + "host", "swine", ""),
        (FID + "s1", NT + "has_segment", FID + "mn000001", "uri"),
        (FID + "mn000001", NT + "genbank_id", "MN000001", ""),
        (FID + "mn000001", NT + "segment_subtype", "H1", ""),
        (FID + "mn000001", NT + "dnaseq", "GATACAGATACA", ""),
    ]
    store = TripleStore(str(tmp_path / "store"))
    store.merge_triples(spark, spark.createDataFrame(
        trips, ["subject", "predicate", "object_lex", "object_dtype"]))

    def fake_factory(subtype, patterns):
        names = [p.split("=")[0] for p in patterns]

        def run(fasta_path):
            seqids = [l[1:].strip() for l in open(fasta_path)
                      if l.startswith(">")]
            header = "\t".join(["seqid"] + names)
            rows = ["\t".join([s] + [f"{n[:2].upper()}{i}"
                                     for i, n in enumerate(names)])
                    for s in seqids]
            return header + "\n" + "\n".join(rows)
        return run

    n = enrich_motifs(spark, store, runner_factory=fake_factory)
    assert n > 0
    t = store.read(spark, "triples")
    from pyspark.sql import functions as F
    sa = t.where(F.col("predicate") == NT + "sa_motif").collect()
    assert len(sa) == 1 and sa[0].subject == FID + "mn000001"
    assert sa[0].object_lex == "SA0"
    # idempotent: re-running adds nothing
    before = t.count()
    enrich_motifs(spark, store, runner_factory=fake_factory)
    assert store.read(spark, "triples").count() == before
