"""Structured Streaming tests: streaming extraction into the triple
store (exactly-once via idempotent merge), and watermarked windowed
aggregation equivalence with the batch plan."""

import pandas as pd
import pytest

from octofludb_spark.sources.store import TripleStore
from octofludb_spark.sources.synth import source_pandas
from octofludb_spark.streaming.pipeline import (
    stream_extract_to_store,
    stream_source,
    windowed_event_counts,
)

pytestmark = pytest.mark.spark


def test_stream_extract_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    pdf = source_pandas(20)
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(2).write.parquet(src_dir)

    store_root = str(tmp_path / "store")
    q = stream_extract_to_store(
        stream_source(spark, src_dir),
        store_root,
        str(tmp_path / "ckpt"),
        run_ts="2026-01-01T00:00:00",
    ).start()
    q.awaitTermination(120)

    got = TripleStore(store_root).read(spark, "triples")
    assert got is not None

    from octofludb_spark.extract.pipeline import run_extraction

    want, _ = run_extraction(sdf, run_ts="2026-01-01T00:00:00")
    assert got.count() == want.count()

    # re-running the same stream (new checkpoint, same files) adds nothing
    q2 = stream_extract_to_store(
        stream_source(spark, src_dir),
        store_root,
        str(tmp_path / "ckpt2"),
        run_ts="2026-01-01T00:00:00",
    ).start()
    q2.awaitTermination(120)
    assert TripleStore(store_root).read(spark, "triples").count() == want.count()


def test_windowed_counts_match_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev_dir = str(tmp_path / "events")
    events.write.parquet(ev_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .parquet(ev_dir)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory").queryName("win_counts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").toPandas()

    want = windowed_event_counts(events).toPandas()
    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    # append-mode emits only watermark-closed windows; every emitted
    # window must match the batch result, and most windows close
    merged = got_s.merge(want_s, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got_s) and len(got_s) > 0
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["avg_value_s"] == merged["avg_value_b"]).all()


def test_stream_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup (training-data ingest): first document
    per digest survives, across micro-batches AND across a restart
    with late-arriving duplicates."""
    from pyspark.sql import functions as F

    from octofludb_spark.streaming.pipeline import stream_dedup_documents

    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    # batch 1: 6 docs, 2 duplicate texts; batch 2: 4 docs all dups of b1
    b1 = [(i, f"text {i % 4}") for i in range(6)]
    spark.createDataFrame(b1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    q = stream_dedup_documents(spark, src, out, ckpt).start()
    q.awaitTermination(120)
    got1 = spark.read.parquet(out)
    assert got1.count() == 4  # 4 distinct texts
    assert got1.select("digest").distinct().count() == 4

    # restart with only-duplicate late arrivals: state survives the
    # checkpoint, nothing new is admitted
    b2 = [(100 + i, f"text {i % 4}") for i in range(4)]
    spark.createDataFrame(b2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    q2 = stream_dedup_documents(spark, src, out, ckpt).start()
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == 4
    # equivalence with the batch operator on the full input
    from octofludb_spark.scale.dedup import exact_dedup
    batch = exact_dedup(spark.read.parquet(src).select("doc_id", "text"))
    assert batch.count() == 4
    assert ({r.digest for r in got2.select("digest").collect()}
            == {r.digest for r in batch.select("digest").collect()})


def test_stream_neardup_matches_batch_candidates(spark, tmp_path):
    """Streaming MinHash-LSH near-dup: the stream's distinct candidate
    pairs equal the batch band-bucket self-join's, across micro-batches
    AND across a restart (bucket membership survives the checkpoint)."""
    from pyspark.sql import functions as F

    from octofludb_spark.scale.dedup import (
        BAND_SIZE, N_PERM, _signatures, shingles)
    from octofludb_spark.streaming.pipeline import stream_neardup_documents

    src = str(tmp_path / "docs")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")

    base = "the quick brown fox jumps over the lazy dog again and again"
    variant = base + " tonight"
    other = "completely different content with no shared shingles at all here"
    b1 = [(0, base), (1, variant), (2, other), (3, base)]
    spark.createDataFrame(b1, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    q = stream_neardup_documents(spark, src, out, ckpt).start()
    q.awaitTermination(120)

    # restart with a late near-duplicate: it must pair with docs seen
    # BEFORE the restart
    b2 = [(10, base + " tonight"), (11, other)]
    spark.createDataFrame(b2, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    q2 = stream_neardup_documents(spark, src, out, ckpt).start()
    q2.awaitTermination(120)

    got = set(map(tuple, spark.read.parquet(out)
                  .select("doc_x", "doc_y").distinct().collect()))

    # batch expectation: the candidate generation of minhash_lsh_pairs
    # (band-bucket self-join) over the full corpus, no DF cap
    docs = spark.read.parquet(src).select("doc_id", "text")
    sig = _signatures(shingles(docs, max_df=None), N_PERM)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(
                    "|", *[F.element_at("sig", b * BAND_SIZE + r + 1)
                           for r in range(BAND_SIZE)]
                )).alias("key"),
            )
            for b in range(N_PERM // BAND_SIZE)
        ])).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    want = set(map(tuple, (
        bands.alias("x").join(bands.alias("y"), ["band", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_x"),
                F.col("y.doc_id").alias("doc_y"))
        .distinct().collect()
    )))

    assert got == want
    # the late arrival paired across the restart boundary
    assert any(x in (0, 1, 3) and y == 10 or x == 10 for x, y in got), got


def test_stream_neardup_with_ttl_runs(spark, tmp_path):
    """state_ttl_minutes wires ProcessingTimeTimeout through the
    stateful operator: within the horizon the pairs still match the
    no-TTL run (the timeout can't fire inside one availableNow pass)."""
    from octofludb_spark.streaming.pipeline import stream_neardup_documents

    src = str(tmp_path / "docs")
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, base), (1, base + " tonight"), (2, base)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)

    def run(tag, ttl):
        out = str(tmp_path / f"pairs_{tag}")
        q = stream_neardup_documents(
            spark, src, out, str(tmp_path / f"ck_{tag}"),
            state_ttl_minutes=ttl).start()
        q.awaitTermination(120)
        return set(map(tuple, spark.read.parquet(out)
                       .select("doc_x", "doc_y").distinct().collect()))

    assert run("ttl", 60) == run("nottl", None) != set()


def test_click_attribution_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join (watermarked views x clicks)
    emits exactly the batch plan's attribution pairs."""
    from octofludb_spark.streaming.pipeline import click_attribution

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    v_dir, c_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    events.where("event_type = 'view'").write.parquet(v_dir)
    events.where("event_type = 'click'").write.parquet(c_dir)

    out_dir = str(tmp_path / "out")
    q = (
        click_attribution(
            spark.readStream.schema(events.schema).parquet(v_dir),
            spark.readStream.schema(events.schema).parquet(c_dir),
            horizon_min=120,
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        map(tuple, spark.read.parquet(out_dir)
            .select("user_id", "view_ts", "click_ts", "lag_s").collect()))
    want = sorted(
        map(tuple, click_attribution(
            events.where("event_type = 'view'"),
            events.where("event_type = 'click'"),
            horizon_min=120)
            .select("user_id", "view_ts", "click_ts", "lag_s").collect()))
    assert got == want
    assert len(got) == 10  # sf0.001 pinned pair count


def test_stream_crawl_to_text_matches_batch_and_resumes(spark, tmp_path):
    """Streaming crawl ingest == batch warc_html_pipeline on the same
    archives, and a SAME-checkpoint re-run re-emits nothing (file-source
    exactly-once: the north_rule's resumability on the crawl path)."""
    from octofludb_spark.scale import web as W
    from octofludb_spark.streaming.pipeline import stream_crawl_to_text

    docs = spark.range(14).toDF("doc_id")
    media_dir = str(tmp_path / "warc_in")
    W.synth_warc_media(docs).coalesce(3).write.parquet(media_dir)

    out_dir = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    q = stream_crawl_to_text(spark, media_dir, out_dir, ckpt,
                             max_files=2).start()
    q.awaitTermination(180)

    cols = ["media_id", "page", "n_links", "text_clean", "n_chars_clean"]
    got = sorted(map(tuple,
                     spark.read.parquet(out_dir).select(*cols).collect()))
    want = sorted(map(tuple,
                      W.warc_html_pipeline(
                          spark.read.parquet(media_dir))
                      .select(*cols).collect()))
    assert got == want and len(got) > 0

    # resume with the same checkpoint: no files left, nothing re-emitted
    q2 = stream_crawl_to_text(spark, media_dir, out_dir, ckpt,
                              max_files=2).start()
    q2.awaitTermination(180)
    assert spark.read.parquet(out_dir).count() == len(want)

    # compressed face flows through the same streaming plan
    gz_dir = str(tmp_path / "warc_gz")
    W.synth_warc_media(docs, compress=True).coalesce(3).write.parquet(gz_dir)
    q3 = stream_crawl_to_text(spark, gz_dir, str(tmp_path / "pages_gz"),
                              str(tmp_path / "ckpt_gz"),
                              compressed=True).start()
    q3.awaitTermination(180)
    got_gz = sorted(map(tuple,
                        spark.read.parquet(str(tmp_path / "pages_gz"))
                        .select(*cols).collect()))
    assert got_gz == want


def test_stream_crawl_tolerant_survives_poisoned_archives(spark, tmp_path):
    """The tolerant streaming ingest keeps flowing through archives
    the strict face would die on: corrupted archives (every
    synth_warc_corrupt mode, incl. gzip faces auto-sniffed) yield
    their surviving pages to one sink and per-archive reject
    telemetry to the _rejects sink — counted loss, no exception."""
    from octofludb_spark.scale import web as W
    from octofludb_spark.streaming.pipeline import stream_crawl_tolerant

    docs = spark.range(16).toDF("doc_id")  # 2 of each corruption mode
    media_dir = str(tmp_path / "warc_bad")
    W.synth_corrupt_media(docs).coalesce(3).write.parquet(media_dir)

    out_dir = str(tmp_path / "pages_tol")
    q = stream_crawl_tolerant(spark, media_dir, out_dir,
                              str(tmp_path / "ckpt_tol"),
                              max_files=2).start()
    q.awaitTermination(180)

    pages = spark.read.parquet(out_dir)
    rejects = spark.read.parquet(out_dir + "_rejects")
    # streaming pages == batch tolerant pipeline on the same archives
    cols = ["media_id", "page", "n_links", "text_clean", "n_chars_clean"]
    want = sorted(map(tuple, W.warc_html_pipeline(
        spark.read.parquet(media_dir), tolerant=True)
        .select(*cols).collect()))
    assert sorted(map(tuple, pages.select(*cols).collect())) == want
    assert pages.count() > 0
    # every archive has an audit row; the corrupted ones show rejects
    assert rejects.count() == 16
    tot = rejects.selectExpr(
        "sum(rej_truncated + rej_version + rej_injection + rej_chunk "
        "+ rej_gzip) AS t").first()["t"]
    assert tot == 12  # modes 1,2,3,4,5,7 x 2 docs each

    # tolerant == strict page output on CLEAN archives
    clean_dir = str(tmp_path / "warc_clean")
    W.synth_warc_media(docs).coalesce(3).write.parquet(clean_dir)
    strict = sorted(map(tuple, W.warc_html_pipeline(
        spark.read.parquet(clean_dir)).select(*cols).collect()))
    tol = sorted(map(tuple, W.warc_html_pipeline(
        spark.read.parquet(clean_dir), tolerant=True)
        .select(*cols).collect()))
    assert tol == strict


def test_stream_validation_matches_batch_row_local_shapes(spark, tmp_path):
    """Streaming SHACL monitor == batch shacl_validate restricted to
    the row-local shapes, on the same triple files; checkpoint re-run
    re-emits nothing."""
    from octofludb_spark.plans.validation import (DEFAULT_SHAPES, NT,
                                                  shacl_validate)
    from octofludb_spark.streaming.pipeline import stream_validation

    rows = []
    for i in range(30):
        # mixed-precision dates (violations) + in/out-of-range segments
        rows.append((f"s{i}", NT + "collection_date",
                     f"2020-0{i % 9 + 1}" if i % 3 == 0 else "2020-01-02",
                     "xsd:gYearMonth" if i % 3 == 0 else "xsd:date"))
        rows.append((f"s{i}", NT + "segment_number",
                     str(i % 12), "string"))
    tdir = str(tmp_path / "triples_in")
    spark.createDataFrame(
        rows, "subject string, predicate string, object_lex string, "
              "object_dtype string").coalesce(3).write.parquet(tdir)

    out_dir = str(tmp_path / "violations")
    ckpt = str(tmp_path / "vckpt")
    q = stream_validation(spark, tdir, out_dir, ckpt, max_files=1).start()
    q.awaitTermination(180)

    cols = ["shape_id", "constraint", "focus", "pred", "value"]
    got = sorted(map(tuple,
                     spark.read.parquet(out_dir).select(*cols).collect()))
    batch = spark.read.parquet(tdir)
    local = [s for s in DEFAULT_SHAPES
             if s["kind"] in ("datatype", "pattern", "nodeKind")]
    want = sorted(map(tuple,
                      shacl_validate(batch, shapes=local, entailed=batch)
                      .select(*cols).collect()))
    assert got == want and len(got) > 0
    # both violation families fired
    fired = {t[0] for t in got}
    assert {"CollectionDateIsFullDate", "SegmentNumberInRange"} <= fired

    # same-checkpoint resume: nothing re-emitted
    q2 = stream_validation(spark, tdir, out_dir, ckpt, max_files=1).start()
    q2.awaitTermination(180)
    assert spark.read.parquet(out_dir).count() == len(want)


def test_stream_code_kg_matches_batch_and_resumes(spark, tmp_path):
    """Streaming code-KG ingest == batch code_kg_triples on the same
    source files, and a same-checkpoint re-run re-emits nothing (the
    north_rule's resumability on its literal source-repo input)."""
    from pyspark.sql import functions as F

    from octofludb_spark.scale.code import code_kg_triples, synth_code_repo
    from octofludb_spark.streaming.pipeline import stream_code_kg

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    src_dir = str(tmp_path / "repos_in")
    synth_code_repo(docs).coalesce(3).write.parquet(src_dir)

    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt_kg")
    q = stream_code_kg(spark, src_dir, out_dir, ckpt, max_files=1).start()
    q.awaitTermination(180)

    cols = ["subject", "predicate", "object_lex", "object_dtype"]
    got = sorted(map(tuple,
                     spark.read.parquet(out_dir).select(*cols).collect()))
    want = sorted(map(tuple,
                      code_kg_triples(spark.read.parquet(src_dir))
                      .select(*cols).collect()))
    assert got == want and len(got) > 0

    # resume with the same checkpoint: nothing re-emitted
    q2 = stream_code_kg(spark, src_dir, out_dir, ckpt, max_files=1).start()
    q2.awaitTermination(180)
    assert spark.read.parquet(out_dir).count() == len(want)
