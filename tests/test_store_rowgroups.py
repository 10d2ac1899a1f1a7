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


def test_small_rowgroups_give_disjoint_predicate_ranges(spark, tmp_path):
    """With row groups forced small (parquet.block.size), the sorted
    layout yields multi-row-group files whose per-row-group predicate
    [min,max] ranges are tight runs: for any single predicate, most
    row groups are PRUNABLE by footer stats alone.  This measures the
    skip fraction the 100 TB claim rests on instead of assuming it."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "4096")
    try:
        store = TripleStore(str(tmp_path / "store"), n_buckets=2)
        store.write(_triples(spark, 20000), "triples",
                    bucket_by_subject=True)
    finally:
        if old is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old)

    total = prunable = 0
    multi_rg_files = 0
    target = PREDS[len(PREDS) // 2]
    for f in _data_files(store.root):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        idx = names.index("predicate")
        n_rg = pf.metadata.num_row_groups
        if n_rg > 1:
            multi_rg_files += 1
        for rg in range(n_rg):
            st = pf.metadata.row_group(rg).column(idx).statistics
            total += 1
            if not (st.min <= target <= st.max):
                prunable += 1
    assert multi_rg_files >= 1, "block.size override produced no multi-row-group files"
    assert total >= 8
    # 8 interleaved predicates: an unsorted layout prunes ~0 row
    # groups; sorted runs should let a single-predicate scan skip the
    # clear majority
    assert prunable / total >= 0.5, (prunable, total)


def test_predicate_less_table_still_writes(spark, tmp_path):
    store = TripleStore(str(tmp_path / "store"), n_buckets=4)
    df = spark.createDataFrame(
        [(f"s{i}", i) for i in range(100)], "subject string, v long")
    store.write(df, "plain", bucket_by_subject=True)
    got = store.read(spark, "plain")
    assert got.count() == 100
