"""Parquet layout of the TripleStore writer: rows inside every data
file are sorted by (predicate, subject), so each parquet row group
carries a tight predicate min/max stat and the dominant access
pattern (GraphViews predicate scans, PushedFilters EqualTo(predicate))
skips the row groups of every other predicate instead of decoding
them.  The sort is sortWithinPartitions — map-side only, no extra
shuffle (store.py write / _append_segment).
"""

import glob

import pyarrow.parquet as pq
import pytest

from octofludb_spark.sources.store import TripleStore

pytestmark = pytest.mark.spark

PREDS = [f"p{i:02d}" for i in range(8)]


def _triples(spark, n):
    # interleave predicates so an unsorted write would leave every
    # row group spanning the full predicate range
    rows = [
        (f"s{i:05d}", PREDS[i % len(PREDS)], f"o{i}", "")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "subject string, predicate string, object_lex string, object_dtype string",
    )


def _data_files(root):
    files = [
        f for f in glob.glob(f"{root}/**/*.parquet", recursive=True)
        if "/metadata/" not in f
    ]
    assert files
    return files


def _assert_predicate_runs(root):
    for f in _data_files(root):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        if "predicate" not in names:
            continue
        col = pf.read(columns=["predicate"]).column("predicate").to_pylist()
        assert col == sorted(col), f"{f} not sorted by predicate"
        # footer stats exist and are tight: a row group's [min,max]
        # spans only the predicates it actually holds (sorted runs)
        idx = names.index("predicate")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            assert st.min <= st.max


def test_snapshot_write_sorts_by_predicate(spark, tmp_path):
    store = TripleStore(str(tmp_path / "store"), n_buckets=4)
    store.write(_triples(spark, 4000), "triples", bucket_by_subject=True)
    _assert_predicate_runs(store.root)


def test_merge_segment_sorts_by_predicate(spark, tmp_path):
    store = TripleStore(str(tmp_path / "store"), n_buckets=4)
    store.write(_triples(spark, 2000), "triples", bucket_by_subject=True)
    extra = spark.createDataFrame(
        [(f"t{i:05d}", PREDS[(i * 3) % len(PREDS)], f"x{i}", "")
         for i in range(1500)],
        "subject string, predicate string, object_lex string, object_dtype string",
    )
    store.merge_triples(spark, extra)
    _assert_predicate_runs(store.root)


def test_predicate_less_table_still_writes(spark, tmp_path):
    store = TripleStore(str(tmp_path / "store"), n_buckets=4)
    df = spark.createDataFrame(
        [(f"s{i}", i) for i in range(100)], "subject string, v long")
    store.write(df, "plain", bucket_by_subject=True)
    got = store.read(spark, "plain")
    assert got.count() == 100
