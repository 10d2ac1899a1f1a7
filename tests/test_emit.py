"""Triple-level goldens, transcribed from the reference suite
(runtests.py:537-554, 631-661, 664-757) — the P/R oracle for the
parse -> type -> relate -> emit pipeline (pandas layer)."""

import pandas as pd

from octofludb_spark.extract.emit import emit_table
from octofludb_spark.extract.infer import (
    type_column,
    type_headless_table,
    type_ragged,
)
from octofludb_spark.extract.parse import parse_fasta, parse_idlist, parse_tsv
import pytest


pytestmark = pytest.mark.core


def run_ragged(text, levels=None):
    rows = parse_fasta(text)
    arities = {len(r) for r in rows}
    dfs = []
    if len(arities) == 1:
        dfs.append(emit_table(type_headless_table(rows), levels=levels))
    else:
        for cols, _ in type_ragged(rows):
            dfs.append(emit_table(cols, levels=levels))
    out = pd.concat(dfs, ignore_index=True).drop_duplicates()
    return sorted(tuple(x) for x in out[["s", "p", "o"]].values)


def triples_of(row_cells, levels=None):
    dfs = [emit_table(cols, levels=levels) for cols, _ in type_ragged([row_cells])]
    out = pd.concat(dfs, ignore_index=True).drop_duplicates()
    return sorted(tuple(x) for x in out[["s", "p", "o"]].values)


FID = "https://flu-crew.org/id/"
FT = "https://flu-crew.org/term/"


def test_fasta_golden():  # runtests.py:664-709
    got = run_ragged(">baz\nATGG\n>foo||z\nATGGG")
    assert got == [
        (FID + "4badd1687f27faae29f9b1fe1ea37e78", FT + "chksum",
         "4badd1687f27faae29f9b1fe1ea37e78"),
        (FID + "4badd1687f27faae29f9b1fe1ea37e78", FT + "dnaseq", "ATGGG"),
        (FID + "4badd1687f27faae29f9b1fe1ea37e78", FT + "unknown", "foo"),
        (FID + "4badd1687f27faae29f9b1fe1ea37e78", FT + "unknown", "z"),
        (FID + "5b2033ab635505389b1acfa0d6eda05c", FT + "chksum",
         "5b2033ab635505389b1acfa0d6eda05c"),
        (FID + "5b2033ab635505389b1acfa0d6eda05c", FT + "dnaseq", "ATGG"),
        (FID + "5b2033ab635505389b1acfa0d6eda05c", FT + "unknown", "baz"),
    ]


def test_fasta_genbank_golden():  # runtests.py:711-757
    got = run_ragged(">MC123456\nATGGATGG\n>MC123457||z\nATGGGATGGG")
    assert got == [
        (FID + "mc123456", FT + "chksum", "c0a0ebddc678651ab0bcbbb4276af291"),
        (FID + "mc123456", FT + "dnaseq", "ATGGATGG"),
        (FID + "mc123456", FT + "genbank_id", "MC123456"),
        (FID + "mc123457", FT + "chksum", "460a05ce52afb5bf34785e743d485aff"),
        (FID + "mc123457", FT + "dnaseq", "ATGGGATGGG"),
        (FID + "mc123457", FT + "genbank_id", "MC123457"),
        (FID + "mc123457", FT + "unknown", "z"),
    ]


def test_fasta_deterministic():  # runtests.py:759-764
    assert run_ragged(">baz\nATGG\n>foo||z\nATGGG") == run_ragged(
        ">baz\nATGG\n>foo||z\nATGGG"
    )


def test_phrase_golden():  # runtests.py:640-661
    got = triples_of(["A/swine/bogus/A01234567/2021", "H1N1"])
    uri = FID + "a%2Fswine%2Fbogus%2Fa01234567%2F2021"
    assert got == [
        (uri, FT + "barcode", "A01234567"),
        (uri, FT + "strain_name", "A/swine/bogus/A01234567/2021"),
        (uri, FT + "subtype", "H1N1"),
    ]


def test_strain_barcode_add_triples():  # runtests.py:537-554
    got = triples_of(["A/asdf/A01234567/sdf"], levels=set())
    uri = FID + "a%2Fasdf%2Fa01234567%2Fsdf"
    assert got == [
        (uri, FT + "barcode", "A01234567"),
        (uri, FT + "strain_name", "A/asdf/A01234567/sdf"),
    ]


def test_strain_embedded_state():
    got = triples_of(["A/swine/Iowa/1234/2021"], levels=set())
    uri = FID + "a%2Fswine%2Fiowa%2F1234%2F2021"
    assert (uri, FT + "state", "https://flu-crew.org/geo/country/usa/IA") in got


def test_homolist_context():  # runtests.py:631-638
    assert type_column(["Georgia"]).recog.name == "country"
    assert type_column(["Georgia", "Texas"]).recog.name == "state"


def test_column_fasta_with_header_fields():
    """F1 fixture: equal-arity fasta -> column inference + full relate."""
    # sequences must be >20 chars for the dnaseq column goodness
    # (classifier_flucrew.py:433-444)
    text = (
        ">A/swine/Iowa/A01234567/2020|H3N2|2020-06-21\n"
        "GATACAGATACAGATACAGATACAGATACAGATACA\n"
        ">A/swine/Texas/A07654321/2019|H1N2|2019-07-04\n"
        "CATCATCATCATCATCATCATCATCATCATCATCAT\n"
    )
    got = run_ragged(text)
    uri = FID + "a%2Fswine%2Fiowa%2Fa01234567%2F2020"
    seq_uri_triples = [t for t in got if t[1] == FT + "has_segment"]
    assert (uri, FT + "strain_name", "A/swine/Iowa/A01234567/2020") in got
    assert (uri, FT + "subtype", "H3N2") in got
    assert (uri, FT + "date", "2020-06-21") in got
    assert (uri, FT + "barcode", "A01234567") in got
    assert (uri, FT + "state", "https://flu-crew.org/geo/country/usa/IA") in got
    # strain -> md5 sequence node
    assert len(seq_uri_triples) == 2
    # sequence content triples live on the md5 node
    import hashlib
    seq = "GATACAGATACAGATACAGATACAGATACAGATACA"
    md5 = hashlib.md5(seq.encode()).hexdigest()
    assert (uri, FT + "has_segment", FID + md5) in got
    assert (FID + md5, FT + "dnaseq", seq) in got
    assert (FID + md5, FT + "chksum", md5) in got


def test_parse_tsv_roundtrip():
    d = parse_tsv("seqid\tclade\nMN123456\talpha\nK00869\tgamma\n")
    assert d == {
        "seqid": ["MN123456", "K00869"],
        "clade": ["alpha", "gamma"],
    }


def test_tsv_table_emission():
    """Headered table: genbank column + clade column -> clade attaches
    to the segment entity."""
    d = parse_tsv("seqid\tclade\nMN123456\talpha\nMN123457\tgamma\n")
    from octofludb_spark.extract.infer import type_table
    cols = type_table(d)
    got = emit_table(cols)
    trips = sorted(tuple(x) for x in got[["s", "p", "o"]].values)
    assert (FID + "mn123456", FT + "genbank_id", "MN123456") in trips
    assert (FID + "mn123456", FT + "clade", "alpha") in trips
    assert (FID + "mn123457", FT + "clade", "gamma") in trips


def test_idlist():
    assert parse_idlist("EPI653195\nCY246223\n\nA01104095\n") == [
        "EPI653195", "CY246223", "A01104095",
    ]
