"""Iceberg snapshot semantics on the TripleStore: metadata log,
time travel (read as_of), incremental read (read_changes), and
expire_snapshots retention.

Reference parity note: octofludb delegates storage to GraphDB and has
no snapshot model; these are the Iceberg-table semantics the
north_rule requires of the materialize stage (resume from the last
committed snapshot, incremental consumers downstream).
"""

import os

import pytest


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, None) for (s, p, o) in rows],
        "subject string, predicate string, object_lex string, object_dtype string",
    )


@pytest.fixture()
def store(tmp_path):
    from octofludb_spark.sources.store import TripleStore

    return TripleStore(str(tmp_path / "store"), n_buckets=4)


def test_history_logs_every_commit(spark, store):
    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                stage="extract", bucket_by_subject=True)
    store.merge_triples(spark, _triples(spark, [("s2", "p", "b")]))
    h = store.history()
    assert [row["seq"] for row in h] == sorted(row["seq"] for row in h)
    assert len(h) >= 2
    assert "extract" in h[-1]["committed_stages"]
    assert "triples" in h[-1]["tables"]


def test_time_travel_reads_old_snapshot(spark, store):
    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                bucket_by_subject=True)
    v1 = store.manifest()["seq"]
    store.merge_triples(spark, _triples(spark, [("s2", "p", "b")]))
    # current sees both; as_of v1 sees only the first
    cur = {r.subject for r in store.read(spark).select("subject").collect()}
    old = {r.subject
           for r in store.read(spark, as_of=v1).select("subject").collect()}
    assert cur == {"s1", "s2"}
    assert old == {"s1"}


def test_time_travel_unknown_version_raises(spark, store):
    store.write(_triples(spark, [("s1", "p", "a")]), "triples")
    with pytest.raises(ValueError, match="no manifest version"):
        store.read(spark, as_of=999)


def test_read_changes_reads_only_new_segments(spark, store):
    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                bucket_by_subject=True)
    v1 = store.manifest()["seq"]
    store.merge_triples(spark, _triples(spark, [("s2", "p", "b"),
                                                ("s1", "p", "a")]))
    changes = store.read_changes(spark, since=v1)
    rows = {(r.subject, r.object_lex) for r in changes.collect()}
    assert rows == {("s2", "b")}  # the duplicate was not re-appended
    # O(changes) contract: the scan reads ONLY appended segment files,
    # never the primary snapshot
    primary = store.manifest()["tables"]["triples"]
    assert all(not f.replace("file:", "").startswith(primary)
               for f in changes.inputFiles())


def test_merge_null_dtype_idempotent(spark, store):
    """NULL object_dtype must not elude the presence join (null != null
    in SQL) — re-merging the same triple adds nothing."""
    df = _triples(spark, [("s1", "p", "a")])  # dtype NULL by fixture
    store.merge_triples(spark, df)
    store.merge_triples(spark, df)
    assert store.read(spark).count() == 1


def test_read_changes_no_new_commits_is_none(spark, store):
    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                bucket_by_subject=True)
    assert store.read_changes(spark, since=store.manifest()["seq"]) is None


def test_read_changes_since_before_table_existed(spark, store):
    """since=0 (or any seq predating the table) means the whole table
    is new appends — full read, no rewrite error."""
    store.write(_triples(spark, [("other", "p", "x")]), "tags")
    v0 = store.manifest()["seq"]
    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                bucket_by_subject=True)
    for since in (0, v0):
        df = store.read_changes(spark, table="triples", since=since)
        assert {r.subject for r in df.collect()} == {"s1"}


def test_read_changes_rewrite_boundary_raises_then_diffs(spark, store):
    from pyspark.sql import functions as F

    store.write(_triples(spark, [("s1", "p", "a"), ("s2", "p", "b")]),
                "triples", bucket_by_subject=True)
    v1 = store.manifest()["seq"]
    store.delete_where(spark, F.col("subject") == "s2")
    store.merge_triples(spark, _triples(spark, [("s3", "p", "c")]))
    with pytest.raises(ValueError, match="rewritten"):
        store.read_changes(spark, since=v1)
    diff = store.read_changes(spark, since=v1, allow_rewrite_diff=True)
    assert {r.subject for r in diff.collect()} == {"s3"}


def test_expire_snapshots_trims_log_and_data(spark, store):
    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                bucket_by_subject=True)
    v1 = store.manifest()["seq"]
    v1_path = store.manifest()["tables"]["triples"]
    store.write(_triples(spark, [("s2", "p", "b")]), "triples",
                bucket_by_subject=True)
    assert os.path.exists(v1_path)  # retained for time travel
    expired = store.expire_snapshots(keep_last=1)
    assert v1 in expired
    assert not os.path.exists(v1_path)  # v1's snapshot dir collected
    with pytest.raises(ValueError):
        store.read(spark, as_of=v1)
    # the current snapshot still reads fine
    assert store.read(spark).count() == 1


def test_cli_history_expire_changes(spark, store, capsys):
    """The ops surface a cluster operator would drive: `store history`
    lists the commit log, `store changes --since` prints only appended
    rows, `store expire` trims the metadata log."""
    from octofludb_spark import cli

    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                stage="extract", bucket_by_subject=True)
    v1 = store.manifest()["seq"]
    store.merge_triples(spark, _triples(spark, [("s2", "p", "b")]))

    assert cli.main(["store", "history", store.root]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == len(store.history())
    assert lines[0].split("\t")[0] == str(v1)

    assert cli.main(["store", "changes", store.root, "--table", "triples",
                     "--since", str(v1)]) == 0
    out = capsys.readouterr().out
    assert "s2\tp\tb" in out and "s1" not in out

    assert cli.main(["store", "expire", store.root]) == 0
    assert f"expired seq {v1}" in capsys.readouterr().out
    assert len(store.history()) == 1


def test_vacuum_keeps_time_travel_alive(spark, store):
    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                bucket_by_subject=True)
    v1 = store.manifest()["seq"]
    v1_path = store.manifest()["tables"]["triples"]
    store.write(_triples(spark, [("s2", "p", "b")]), "triples",
                bucket_by_subject=True)
    store.vacuum()
    # vacuum must NOT delete a dir a retained metadata version references
    assert os.path.exists(v1_path)
    assert store.read(spark, as_of=v1).count() == 1


def test_commit_conflict_rejects_lost_update(spark, store):
    """Optimistic concurrency: a commit computed against a stale
    manifest must raise (never clobber the interleaved writer's
    commit), and the losing attempt must leave no metadata version."""
    from octofludb_spark.sources.store import StoreCommitConflict

    store.write(_triples(spark, [("s1", "p", "a")]), "triples",
                bucket_by_subject=True)
    stale = store.manifest()          # writer A reads ...
    store.merge_triples(spark, _triples(spark, [("s2", "p", "b")]))  # B wins
    seq_after_b = store.manifest()["seq"]
    stale["tables"]["bogus"] = "/nowhere"
    import pytest as _pytest

    with _pytest.raises(StoreCommitConflict):
        store._commit(stale)          # ... and A's commit is rejected
    m = store.manifest()
    assert m["seq"] == seq_after_b and "bogus" not in m["tables"]
    assert [h["seq"] for h in store.history()] == sorted(
        h["seq"] for h in store.history())
    # a clean retry starting from the CURRENT manifest succeeds
    fresh = store.manifest()
    fresh["tables"]["extra"] = fresh["tables"]["triples"]
    store._commit(fresh)
    assert store.manifest()["tables"]["extra"]


def test_cli_stats_footer_only(spark, store, capsys):
    """`store stats` reports rows/files/bytes/segments/deletes per
    table from parquet FOOTERS alone (no Spark session, no data
    read), and counts appended segments and pending MOR deletes."""
    from octofludb_spark import cli

    store.write(_triples(spark, [("s1", "p", "a"), ("s2", "p", "b")]),
                "triples", bucket_by_subject=True)
    store.merge_triples(spark, _triples(spark, [("s3", "p", "c")]))
    store.delete_rows_mor(spark, _triples(spark, [("s1", "p", "a")]),
                          table="triples")

    assert cli.main(["store", "stats", store.root]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("table\tphysical_rows\tdelete_rows")
    row = {ln.split("\t")[0]: ln.split("\t") for ln in out[1:]}["triples"]
    # physical_rows counts RAW footer rows (3 data rows; the MOR
    # delete applies at read time) and delete_rows the pending
    # equality-delete keys (1); 1 appended segment, 1 pending delete
    assert (row[1], row[2], row[5], row[6]) == ("3", "1", "1", "1")
    assert int(row[3]) >= 2 and int(row[4]) > 0


def test_cli_query_explain(spark, tmp_path, capsys):
    """`query --explain` prints the formatted physical plan (scan
    pushdown visible) and does not execute the query."""
    from octofludb_spark import cli
    from octofludb_spark.build import build_graph
    from octofludb_spark.sources.synth import source_pandas

    root = str(tmp_path / "store")
    build_graph(spark, spark.createDataFrame(source_pandas(12)), root,
                run_ts="2026-01-01T00:00:00")
    assert cli.main(["query", root, "masterlist", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "PushedFilters" in out
