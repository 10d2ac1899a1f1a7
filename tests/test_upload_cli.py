"""`upload` / `init` CLI parity (reference ui.py:120-160 init,
ui.py:555-580 upload): turtle files parse dtype-faithfully in
executor tasks and merge idempotently into the store; `classify`
drives an octoFLU checkout and prints the reference's 4-column
table (ui.py:473-516)."""

import os
import stat

import pandas as pd
import pytest

from octofludb_spark.plans.turtle import (
    read_turtle,
    triples_to_turtle,
    turtle_to_frame,
)

FID = "https://flu-crew.org/id/"
FT = "https://flu-crew.org/term/"

ROWS = [
    (FID + "a%2Fsw", FT + "strain_name", "A/sw", ""),
    (FID + "a%2Fsw", FT + "date", "2015-12-07", "xsd:date"),
    (FID + "a%2Fsw", FT + "hasSegment", FID + "epi1", "uri"),
    (FID + "epi1", "http://www.w3.org/2002/07/owl#sameAs",
     FID + "kx123", "uri"),
    (FID + "epi1", FT + "desc", 'quote " tab\t nl\n end', ""),
]


def _frame(rows=ROWS):
    return pd.DataFrame(
        rows, columns=["subject", "predicate", "object_lex", "object_dtype"])


def test_turtle_dtype_round_trip():
    text = triples_to_turtle(_frame())
    back = turtle_to_frame(text)
    assert set(map(tuple, back.itertuples(index=False))) == set(ROWS)


def test_turtle_reader_rdflib_shorthand_literals():
    text = (
        "@prefix f: <https://flu-crew.org/term/> .\n"
        "@prefix fid: <https://flu-crew.org/id/> .\n"
        "fid:x f:n 5 ;\n"
        "    f:y 2.5e0 ;\n"
        "    f:z true .\n"
    )
    got = {tuple(r) for r in turtle_to_frame(text).itertuples(index=False)}
    assert got == {
        (FID + "x", FT + "n", "5", "xsd:integer"),
        (FID + "x", FT + "y", "2.5e0", "xsd:double"),
        (FID + "x", FT + "z", "true", "xsd:boolean"),
    }


def test_read_turtle_distributed_one_task_per_file(spark, tmp_path):
    p1, p2 = str(tmp_path / "a.ttl"), str(tmp_path / "b.ttl")
    with open(p1, "w") as f:
        f.write(triples_to_turtle(_frame(ROWS[:2])))
    with open(p2, "w") as f:
        f.write(triples_to_turtle(_frame(ROWS[2:])))
    df = read_turtle(spark, [p1, p2])
    got = {(r.subject, r.predicate, r.object_lex, r.object_dtype)
           for r in df.collect()}
    assert got == set(ROWS)


def test_cli_init_upload_idempotent(spark, tmp_path, capsys):
    from octofludb_spark import cli
    from octofludb_spark.sources.store import TripleStore

    root = str(tmp_path / "store")
    assert cli.main(["init", root]) == 0
    store = TripleStore(root)
    assert store.manifest()["seq"] == 1  # committed empty manifest

    ttl = str(tmp_path / "x.ttl")
    with open(ttl, "w") as f:
        f.write(triples_to_turtle(_frame()))
    assert cli.main(["upload", root, ttl]) == 0
    assert store.read(spark, "triples").count() == len(ROWS)
    # canonical view stays in sync (merge mirrors through the alias map)
    assert store.read(spark, "triples_canonical") is not None
    # idempotent: re-upload adds nothing
    assert cli.main(["upload", root, ttl]) == 0
    assert store.read(spark, "triples").count() == len(ROWS)
    capsys.readouterr()


def test_cli_classify_fake_checkout(tmp_path, capsys):
    """A fake octoFLU.sh reproducing the checkout's output layout
    (script.py:248-268) drives the CLI end-to-end."""
    from octofludb_spark import cli

    workdir = str(tmp_path / "octoflu")
    os.makedirs(workdir)
    sh = os.path.join(workdir, "octoFLU.sh")
    with open(sh, "w") as f:
        f.write(
            "#!/bin/sh\n"
            'mkdir -p "$1_output"\n'
            'printf "s1\\tH1\\t1A.1\\tcl1\\textra\\n" '
            '> "$1_output/$1_Final_Output.txt"\n'
        )
    os.chmod(sh, os.stat(sh).st_mode | stat.S_IEXEC)
    fa = str(tmp_path / "in.fa")
    with open(fa, "w") as f:
        f.write(">s1\nACGT\n")

    assert cli.main(["classify", fa, "--octoflu-dir", workdir]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "seqid\tsegment_subtype\tclade\tgl_clade"
    assert out[1] == "s1\tH1\t1A.1\tcl1"  # fields 0:4 only


def test_cli_classify_missing_checkout_errors(tmp_path, capsys):
    from octofludb_spark import cli

    fa = str(tmp_path / "in.fa")
    with open(fa, "w") as f:
        f.write(">s1\nACGT\n")
    assert cli.main(["classify", fa,
                     "--octoflu-dir", str(tmp_path / "nope")]) == 1
    assert "octoFLU run failed" in capsys.readouterr().err


def test_scale_cli_roundtrip(spark, tmp_path, capsys):
    """`scale` group: parquet out is readable and matches the direct
    operator; TSV mode prints a header + rows."""
    from octofludb_spark import cli
    from octofludb_spark.scale.dedup import exact_dedup

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "dedup.parquet")
    assert cli.main(["scale", "dedup-exact", src, "--out", out]) == 0
    got = spark.read.parquet(out)
    want = exact_dedup(spark.read.parquet(src))
    assert got.count() == want.count()
    assert set(got.columns) == set(want.columns)

    capsys.readouterr()
    assert cli.main(["scale", "tfidf", src, "--k", "3",
                     "--limit", "5"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].split("\t") == ["doc_id", "term", "tf",
                                    "tfidf_micro", "rank"]
    assert len(lines) == 6
