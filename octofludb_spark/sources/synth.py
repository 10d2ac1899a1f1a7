"""Deterministic synthetic source-record corpus.

Generates the engine's single physical input — an Iceberg-shaped table
``(repo, path, commit, lang, content, content_sha256)`` (BASELINE.json
input_hint) — DISTRIBUTED: ``spark.range(n)`` plus a pandas UDF whose
output is a pure function of the row id, so any scale factor
materializes without driver memory and identically on any cluster.

Documents embed strain names / barcodes / accessions / dates /
countries drawn from the reference test corpus plus deterministic
noise, in the reference's ingestion shapes (FASTA, headered TSV,
GISAID-like sheet, id lists, BLAST outfmt-6).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOSTS = ["swine", "Human", "Swine", "human"]
STATES = ["Iowa", "Texas", "Minnesota", "North Carolina", "Ohio", "Nebraska",
          "Illinois", "Indiana", "Kansas", "Oklahoma"]
COUNTRIES = ["USA", "Canada", "China", "Indonesia", "Brazil", "Germany",
             "united states", "Jiangsu", "Ontario", "indonesa"]
SUBTYPES = ["H1N1", "H3N2", "H1N2", "H1huN1", "mixed", "A/H1N1", "H3N2v"]
SEGMENTS = ["PB2", "PB1", "PA", "HA", "NP", "NA", "MP", "NS"]
CLADES = ["alpha", "beta", "gamma", "delta1", "delta2", "pandemic",
          "Cluster_IV", "Cluster_IVA", "2010.1", "2010.2"]
GL_CLADES = ["1A.1.1", "1A.3.3.2", "1B.2.1", "3.1990.4.1", "Other-Avian",
             "Other-Human-1990", "1A.3.3.2-vaccine"]
IG_CLADES = ["pdm", "TRIG", "LAIV"]
BASES = np.array(list("ATGC"))
LANGS = ["fasta", "tsv", "gisaid", "ids", "blast", "ivr", "genbank"]


# Shared entity pools: ids are drawn from bounded deterministic pools
# so different document types mention the SAME entities — that overlap
# is what entity linking / sameAs / report joins exercise.
POOL = 20_000


def _rng(doc_id: int) -> np.random.RandomState:
    return np.random.RandomState((doc_id * 2654435761 + 42) % (2**31 - 1))


def _strain(r: np.random.RandomState) -> str:
    k = r.randint(POOL)
    host = ["swine", "Swine"][k % 2]
    state = STATES[k % len(STATES)]
    ident = f"A0{1000000 + k:07d}"
    year = 2009 + k % 13
    return f"A/{host}/{state}/{ident}/{year}"


def _seq(r: np.random.RandomState, lo=60, hi=180) -> str:
    n = r.randint(lo, hi)
    return "".join(BASES[r.randint(0, 4, n)])


def _date(r: np.random.RandomState) -> str:
    forms = ["{y}-{m:02d}-{d:02d}", "{m:02d}/{d:02d}/{y}", "{y}/{m:02d}",
             "{y}", "{d:02d}-Jun-{y}"]
    f = forms[r.randint(len(forms))]
    return f.format(y=2009 + r.randint(13), m=1 + r.randint(12), d=1 + r.randint(28))


def _gb(r: np.random.RandomState) -> str:
    return f"MN{100000 + r.randint(POOL)}"


def _epi(r: np.random.RandomState) -> str:
    return f"EPI{300000 + r.randint(POOL)}"


def _fasta_doc(r) -> str:
    out = []
    for _ in range(3 + r.randint(8)):
        strain = _strain(r)
        subtype = SUBTYPES[r.randint(len(SUBTYPES))]
        date = _date(r)
        out.append(f">{strain}|{subtype}|{date}")
        seq = _seq(r)
        # wrap sequence lines at 60
        for i in range(0, len(seq), 60):
            out.append(seq[i:i + 60])
    return "\n".join(out)


def _tsv_doc(r) -> str:
    # octoFLU-output-shaped classification table (ui.py:499)
    rows = ["seqid\tsegment_subtype\tclade\tgl_clade"]
    for _ in range(4 + r.randint(10)):
        sub = ["H1", "H3", "N1", "N2", "PB2", "PB1", "PA", "NP", "M", "NS"][
            r.randint(10)
        ]
        if sub in ("H1", "H3"):
            clade = CLADES[r.randint(len(CLADES))]
        elif sub in ("N1", "N2"):
            clade = ["Classical", "1998A", "2002A", "TX98"][r.randint(4)]
        else:
            clade = (IG_CLADES + ["humanSeasonal", "avian"])[r.randint(5)]
        rows.append(
            f"{_gb(r)}\t{sub}\t{clade}\t{GL_CLADES[r.randint(len(GL_CLADES))]}"
        )
    return "\n".join(rows)


def _gisaid_doc(r) -> str:
    head = ["Isolate_Id", "Isolate_Name", "Host", "Subtype", "Lineage",
            "Location", "Collection_Date", "Submission_Date"]
    for seg in SEGMENTS:
        head += [f"{seg} Segment_Id", f"{seg} INSDC_Upload"]
    rows = ["\t".join(head)]
    for _ in range(2 + r.randint(5)):
        cells = [
            f"EPI_ISL_{r.randint(10**5, 10**6)}",
            _strain(r) + (" (H1N1)" if r.rand() < 0.3 else ""),
            HOSTS[r.randint(len(HOSTS))],
            SUBTYPES[r.randint(3)],
            "swl" if r.rand() < 0.5 else "",
            f"North America / {COUNTRIES[r.randint(3)]} / somewhere",
            _date(r),
            _date(r),
        ]
        for _ in SEGMENTS:
            if r.rand() < 0.2:
                cells += ["", ""]
            else:
                cells += [f"{_epi(r)} | x", _gb(r)]
        rows.append("\t".join(cells))
    return "\n".join(rows)


def _ids_doc(r) -> str:
    ids = []
    for _ in range(5 + r.randint(20)):
        k = r.randint(4)
        if k == 0:
            ids.append(_gb(r))
        elif k == 1:
            ids.append(_epi(r))
        elif k == 2:
            # pool-drawn A0 barcode (A0\d{7}): overlaps the barcodes
            # embedded in strain names so id-list ingestion exercises
            # cross-document entity linking
            ids.append(f"A0{1000000 + r.randint(POOL):07d}")
        else:
            ids.append(_strain(r))
    return "\n".join(ids)


def _blast_doc(r) -> str:
    rows = []
    for _ in range(4 + r.randint(10)):
        rows.append("\t".join([
            _gb(r), _gb(r), f"{50 + 50 * r.rand():.2f}",
            str(r.randint(100, 2000)), str(r.randint(50)), str(r.randint(10)),
            str(r.randint(1, 100)), str(r.randint(100, 2000)),
            str(r.randint(1, 100)), str(r.randint(100, 2000)),
            f"{r.rand():.3g}", f"{100 * r.rand():.1f}",
        ]))
    return "\n".join(rows)


def _ivr_doc(r) -> str:
    rows = []
    for _ in range(4 + r.randint(8)):
        strain = _strain(r)
        sub = SUBTYPES[r.randint(3)]
        rows.append("\t".join([
            _gb(r), HOSTS[r.randint(len(HOSTS))], str(1 + r.randint(8)),
            sub, COUNTRIES[r.randint(3)], _date(r),
            str(r.randint(800, 2400)),
            f"Influenza A virus ({strain}({sub}))", "-", "-", "complete",
        ]))
    return "\n".join(rows)


def _genbank_doc(r) -> str:
    """JSON-lines of Entrez-shaped records (sequence + source feature)."""
    import json

    lines = []
    for _ in range(2 + r.randint(4)):
        acc = _gb(r)
        strain = _strain(r)
        gene = SEGMENTS[r.randint(len(SEGMENTS))]
        rec = {
            "GBSeq_primary-accession": acc,
            "GBSeq_locus": acc,
            "GBSeq_organism": "Influenza A virus",
            "GBSeq_length": str(800 + r.randint(1600)),
            "GBSeq_update-date": f"{1 + r.randint(28):02d}-JUN-{2015 + r.randint(7)}",
            "GBSeq_definition": f"Influenza A virus ({strain}) segment",
            "GBSeq_sequence": _seq(r).lower(),
            "GBSeq_feature-table": [
                {
                    "GBFeature_key": "source",
                    "GBFeature_location": "1..2280",
                    "GBFeature_quals": [
                        {"GBQualifier_name": "strain",
                         "GBQualifier_value": strain},
                        {"GBQualifier_name": "host",
                         "GBQualifier_value": "Sus scrofa"},
                        {"GBQualifier_name": "country",
                         "GBQualifier_value": f"USA: {STATES[r.randint(len(STATES))]}"},
                        {"GBQualifier_name": "collection_date",
                         "GBQualifier_value": _date(r)},
                        {"GBQualifier_name": "serotype",
                         "GBQualifier_value": SUBTYPES[r.randint(3)]},
                    ],
                },
                {
                    "GBFeature_key": "CDS",
                    "GBFeature_quals": [
                        {"GBQualifier_name": "gene",
                         "GBQualifier_value": gene},
                    ],
                },
            ],
        }
        lines.append(json.dumps(rec))
    return "\n".join(lines)


_MAKERS = {
    "fasta": _fasta_doc,
    "tsv": _tsv_doc,
    "gisaid": _gisaid_doc,
    "ids": _ids_doc,
    "blast": _blast_doc,
    "ivr": _ivr_doc,
    "genbank": _genbank_doc,
}
_EXT = {"fasta": "fna", "tsv": "tsv", "gisaid": "gis", "ids": "txt",
        "blast": "blast", "ivr": "ivr", "genbank": "gbjson"}


def make_doc(doc_id: int) -> tuple[str, str, str, str, str, str]:
    """Pure function doc_id -> source row."""
    r = _rng(doc_id)
    lang = LANGS[doc_id % len(LANGS)]
    content = _MAKERS[lang](r)
    repo = f"flu-crew/seqs-{2015 + doc_id % 8}"
    path = f"data/batch{doc_id:06d}.{_EXT[lang]}"
    commit = hashlib.sha1(f"commit-{doc_id}".encode()).hexdigest()
    sha = hashlib.sha256(content.encode()).hexdigest()
    return repo, path, commit, lang, content, sha


def source_table(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation of n_docs source rows."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
    ])

    def gen(batches):
        for pdf in batches:
            rows = [make_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                rows,
                columns=["repo", "path", "commit", "lang", "content",
                         "content_sha256"],
            )

    parts = partitions or max(8, n_docs // 2000)
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, schema)


def source_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side variant for tests."""
    return pd.DataFrame(
        [make_doc(i) for i in range(n_docs)],
        columns=["repo", "path", "commit", "lang", "content", "content_sha256"],
    )
