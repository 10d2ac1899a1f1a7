"""The north_rule packaging gate: the pipeline must run via
``spark-submit --py-files dist/octofludb_spark.zip`` — i.e. every
import, data file, and UDF closure must resolve from the zip alone
(no checkout on sys.path), exactly as on a real cluster.

Runs the real spark-submit binary in a subprocess (cwd=/tmp so the
repo checkout cannot shadow the zip) and asserts on the job's JSON
summary line, including the manifest-swap resume (second run commits
nothing and returns identical counts).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _run(zip_path: str, store: str, docs: int) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "submit_job.py"),
        "--docs", str(docs),
        "--store", store,
        "--partitions", "4",
    ]
    out = subprocess.run(
        cmd, cwd=tempfile.gettempdir(), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith('{"job"')][-1]
    return json.loads(line)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_py_files_packaged_job_runs_and_resumes(tmp_path):
    zip_path = str(tmp_path / "octofludb_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         zip_path],
        check=True, capture_output=True,
    )
    store = str(tmp_path / "store")

    first = _run(zip_path, store, docs=200)
    assert first["triples"] > 0
    assert first["canonical_triples"] > 0
    assert first["sha_mismatch_rows"] == 0
    assert first["stages_committed"] == ["extract", "link", "canon"]

    # resume: all stages already committed -> identical counts, no rebuild
    second = _run(zip_path, store, docs=200)
    assert second["triples"] == first["triples"]
    assert second["canonical_triples"] == first["canonical_triples"]
