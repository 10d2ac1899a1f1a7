"""TRIPLE-level differential testing: the reference's own ingestion
pipeline (classes.Ragged / classes.Table / recipes.mk_blast /
recipes.mk_influenza_na, executed via tests/refshim) versus this
engine's recipes, compared as exact (s, p, o) string sets — on the
very documents the synthetic bench corpus is made of, plus fuzzed
variants.  This is the P/R oracle computed BY the reference, not
transcribed from it."""

from __future__ import annotations

import io
import os
import random
import sys
import warnings

import pytest

_SHIM = os.path.join(os.path.dirname(__file__), "refshim")
_REF = "/root/reference"
if not os.path.isdir(_REF):
    pytest.skip("reference checkout not present", allow_module_level=True)
sys.path.insert(0, _SHIM)
sys.path.insert(1, _REF)
warnings.filterwarnings("ignore")

from octofludb.classes import Ragged, Table  # noqa: E402
from octofludb.recipes import mk_blast, mk_influenza_na  # noqa: E402

from octofludb_spark.extract.recipes import (  # noqa: E402
    blast_triples,
    fasta_triples,
    ivr_triples,
    table_triples,
)
from octofludb_spark.sources.synth import source_pandas  # noqa: E402


def ref_triples(g):
    return {(str(s), str(p), str(o)) for s, p, o in g}


def my_triples(df):
    return {(r.s, r.p, r.o) for r in df.itertuples(index=False)}


def _compare(content, lang):
    if lang == "fasta":
        ref = ref_triples(Ragged(content, na_str=[]).connect())
        got = my_triples(fasta_triples(content))
    elif lang == "tsv":
        try:
            ref = ref_triples(Table(content, na_str=[]).connect())
        except IndexError:
            # the reference CRASHES on rows with trailing empty cells
            # (classes.py:275 rstrips the tabs away); our parser is
            # deliberately lenient there — nothing to compare
            return None
        got = my_triples(table_triples(content))
    elif lang == "blast":
        ref = ref_triples(mk_blast(io.StringIO(content), tag=None))
        got = my_triples(blast_triples(content))
    elif lang == "ivr":
        ref = ref_triples(mk_influenza_na(io.StringIO(content)))
        got = my_triples(ivr_triples(content))
    else:
        return None
    assert got == ref, (lang, sorted(got ^ ref)[:6])
    return len(ref)


def test_synth_corpus_matches_reference_pipeline():
    """Every fasta/tsv/blast/ivr document of the bench corpus emits
    EXACTLY the reference pipeline's triples."""
    pdf = source_pandas(140)
    total = 0
    compared = 0
    for row in pdf.itertuples(index=False):
        n = _compare(row.content, row.lang)
        if n is not None:
            compared += 1
            total += n
    assert compared >= 70 and total > 3000


def test_fuzzed_fasta_matches_reference_pipeline():
    """Mutated fasta documents (ragged arities, junk fields, short
    seqs, empty fields) still match the reference exactly."""
    rnd = random.Random(11)
    fields = ["A/swine/Iowa/A01234567/2020", "H1N1", "2020-06-21", "baz",
              "EPI_ISL_123", "MC123456", "", "alpha", "Texas", "swine",
              "17TOSU4242", "1A.1.1", "PB2", "2011/05", "yolo", "Georgia"]
    seqs = ["ATGG", "GATACA" * 6, "A", "ATRYATTNN", "GANDALF" * 4]
    for _ in range(60):
        n_entries = 1 + rnd.randint(0, 4)
        doc = []
        for _ in range(n_entries):
            k = rnd.randint(1, 4)
            hdr = "|".join(rnd.choice(fields) for _ in range(k))
            doc.append(">" + hdr)
            doc.append(rnd.choice(seqs))
        _compare("\n".join(doc), "fasta")


def test_fuzzed_tables_match_reference_pipeline():
    rnd = random.Random(13)
    headers = ["seqid", "clade", "strain_name", "subtype", "gl_clade",
               "segment_subtype", "isolate_id", "whatever"]
    cells = ["MN123456", "alpha", "A/swine/Iowa/X/2020", "H1N1", "1A.1.1",
             "H1", "EPI_ISL_5", "x y z", "", "Texas", "2020-06-21", "42"]
    for _ in range(40):
        ncol = 2 + rnd.randint(0, 3)
        cols = rnd.sample(headers, ncol)
        lines = ["\t".join(cols)]
        for _ in range(1 + rnd.randint(0, 5)):
            lines.append("\t".join(rnd.choice(cells) for _ in cols))
        _compare("\n".join(lines), "tsv")
