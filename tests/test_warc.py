"""WARC container support (scale/web.py): record walk, gzip member
walk, magic-scan re-sync splitter, HTTP split, crawl-to-text pipeline.

Trust model: pure-python structural tests on tiny inputs (malformed /
truncated faces the DuckDB gates can't reach), plus Spark-side
equivalence — compressed path == plain path, pipeline == direct
html_extract of the bodies.
"""

import gzip
import hashlib
import zlib

import pytest
from pyspark.sql import functions as F

from octofludb_spark.scale import text as TX
from octofludb_spark.scale import web as W

pytestmark = [pytest.mark.spark, pytest.mark.core]


# --------------------------------------------------------------------------
# pure-python container walk
# --------------------------------------------------------------------------

def test_record_walk_counts_and_headers():
    for d in (0, 1, 2, 5, 97, 1234):
        recs = list(W.iter_warc_records(W.synth_warc(d)))
        assert len(recs) == 1 + 2 * W.n_pages(d)
        assert recs[0]["headers"]["warc-type"] == "warcinfo"
        assert "warc-target-uri" not in recs[0]["headers"]
        for i, r in enumerate(recs):
            assert r["version"] == "WARC/1.0"
            assert int(r["headers"]["content-length"]) == len(r["payload"])
            rid = r["headers"]["warc-record-id"]
            assert rid == ("<urn:uuid:"
                           + hashlib.md5(f"{d}:{i}".encode()).hexdigest()
                           + ">")
        types = [r["headers"]["warc-type"] for r in recs[1:]]
        assert types == ["request", "response"] * W.n_pages(d)


def test_truncated_payload_raises():
    b = W.synth_warc(3)
    with pytest.raises(ValueError, match="truncated"):
        list(W.iter_warc_records(b[:-40]))


def test_bad_version_line_raises():
    with pytest.raises(ValueError, match="version"):
        list(W.iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_unterminated_header_raises():
    with pytest.raises(ValueError, match="unterminated"):
        list(W.iter_warc_records(b"WARC/1.0\r\nWARC-Type: x\r\n"))


def test_http_split_request_and_response():
    req = W.parse_http_message(W.synth_http_request(7, 1).encode())
    assert req["method"] == "GET" and req["path"] == "/doc/7/page/1"
    assert req["body"] == b""
    resp = W.parse_http_message(W.synth_http_response(7, 1).encode())
    assert resp["status"] == 200
    assert resp["headers"]["content-type"] == "text/html"
    assert int(resp["headers"]["content-length"]) == len(resp["body"])
    # 404 face: (d + p) % 7 == 3
    resp = W.parse_http_message(W.synth_http_response(2, 1).encode())
    assert resp["status"] == 404
    assert resp["body"] == b"not found 2/1"


# --------------------------------------------------------------------------
# gzip member machinery (the splittable-read path)
# --------------------------------------------------------------------------

def test_member_walk_roundtrip_and_scan_agreement():
    for d in (0, 1, 2, 9, 97, 555):
        plain = W.synth_warc(d)
        gz = W.synth_warc(d, compress=True)
        members = list(W.iter_gzip_members(gz))
        assert len(members) == 1 + 2 * W.n_pages(d)  # one record each
        assert b"".join(u for _, _, u in members) == plain
        # offsets tile the file exactly
        pos = 0
        for off, clen, _ in members:
            assert off == pos
            pos += clen
        assert pos == len(gz)
        # the mid-file re-sync scanner finds exactly the true offsets
        assert W.scan_gzip_member_offsets(gz) == [o for o, _, _ in members]


def test_scan_rejects_false_magic_inside_members():
    # craft a member whose DEFLATE payload contains the gzip magic:
    # stored (uncompressed) deflate blocks embed raw bytes verbatim.
    raw = b"A" * 10 + W.GZ_MAGIC + b"B" * 10
    c = zlib.compressobj(0, zlib.DEFLATED, 31)  # level 0 -> stored blocks
    member = c.compress(raw) + c.flush()
    assert W.GZ_MAGIC in member[10:]            # the trap is really there
    blob = member + gzip.compress(b"tail", mtime=0)
    offs = W.scan_gzip_member_offsets(blob)
    assert offs == [0, len(member)]


def test_truncated_member_raises():
    gz = W.synth_warc(4, compress=True)
    with pytest.raises(ValueError, match="truncated gzip"):
        list(W.iter_gzip_members(gz[:-5]))


# --------------------------------------------------------------------------
# Spark-side equivalences
# --------------------------------------------------------------------------

def _media(spark, n=12, compress=False):
    docs = spark.range(n).toDF("doc_id")
    return W.synth_warc_media(docs, compress=compress)


def test_warc_records_plain_equals_gz(spark):
    a = W.warc_records(_media(spark)).orderBy("media_id", "rec_idx")
    b = W.warc_records(_media(spark, compress=True),
                       compressed=True).orderBy("media_id", "rec_idx")
    assert a.collect() == b.collect()


def test_http_responses_status_and_page_parse(spark):
    rows = W.http_responses(_media(spark)).collect()
    for r in rows:
        want_404 = (r.media_id + r.page) % 7 == 3
        assert r.http_status == (404 if want_404 else 200)
        assert r.content_type == ("text/plain" if want_404 else "text/html")
        assert r.body_md5 == hashlib.md5(
            W.synth_http_response(r.media_id, r.page)
            .split("\r\n\r\n", 1)[1].encode()).hexdigest()
    # every (d, p) page appears exactly once
    assert len(rows) == sum(W.n_pages(d) for d in range(12))


def test_pipeline_equals_direct_html_extract(spark):
    out = {(r.media_id, r.page): r
           for r in W.warc_html_pipeline(_media(spark)).collect()}
    docs = [(d * 8 + p, W.synth_page_html(d, p))
            for d in range(12) for p in range(W.n_pages(d))
            if (d + p) % 7 != 3]
    direct = {(r.doc_id // 8, r.doc_id % 8): r
              for r in TX.html_extract(
                  spark.createDataFrame(docs, "doc_id long, html string")
              ).collect()}
    assert out.keys() == direct.keys()
    for k, r in out.items():
        assert (r.text_clean, r.n_links, r.n_chars_clean) == (
            direct[k].text_clean, direct[k].n_links,
            direct[k].n_chars_clean)


def test_pipeline_excludes_404_pages(spark):
    rows = W.warc_html_pipeline(_media(spark, n=30)).collect()
    assert rows, "pipeline produced no pages"
    assert all((r.media_id + r.page) % 7 != 3 for r in rows)


# --------------------------------------------------------------------------
# link graph + pagerank composition
# --------------------------------------------------------------------------

def _py_edges(n):
    from collections import Counter
    c = Counter()
    for d in range(n):
        for p in range(W.n_pages(d)):
            for i in range(1 + (d + p) % 3):
                hd = (d + 31 * p + 17 * i + 1) % W.N_HOSTS
                c[(f"example-{d % W.N_HOSTS}.org",
                   f"example-{hd}.org")] += 1
    return c


def test_host_link_graph_matches_python_replay(spark):
    n = 25
    media = W.synth_warc_media(spark.range(n).toDF("doc_id"),
                               linkfarm=True)
    got = {(r.src_host, r.dst_host): r.n_links
           for r in W.host_link_graph(W.http_responses(media)).collect()}
    assert got == dict(_py_edges(n))


def test_extract_links_carries_source_host(spark):
    media = W.synth_warc_media(spark.range(5).toDF("doc_id"),
                               linkfarm=True)
    rows = W.extract_links(W.http_responses(media)).collect()
    for r in rows:
        assert r.src_host == f"example-{r.media_id % W.N_HOSTS}.org"
        assert r.href.startswith("https://example-")


def test_host_pagerank_composition_is_deterministic(spark):
    from octofludb_spark.ops.graph_analytics import pagerank
    media = W.synth_warc_media(spark.range(40).toDF("doc_id"),
                               linkfarm=True)
    edges = W.host_link_graph(W.http_responses(media)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    a = sorted((r.node, r.rank_micro)
               for r in pagerank(edges, iters=3).collect())
    b = sorted((r.node, r.rank_micro)
               for r in pagerank(edges.repartition(7), iters=3).collect())
    assert a == b                      # parallelism-invariant integers
    assert sum(r for _, r in a) > 0


# --------------------------------------------------------------------------
# robots.txt politeness + anchor text
# --------------------------------------------------------------------------

def _robots_resp(spark, n=25):
    docs = spark.range(n).toDF("doc_id")
    return W.http_responses(W.synth_robots_media(docs))


def test_robots_rules_parse_matches_synthesis(spark):
    n = 25
    got = {(r.host, r.directive, r.value)
           for r in W.robots_rules(_robots_resp(spark, n)).collect()}
    want = set()
    for h in range(n):          # n <= N_HOSTS: hosts are 0..n-1
        for ln in W.synth_robots_txt(h).strip().split("\n"):
            k, _, v = ln.partition(":")
            want.add((f"example-{h}.org", k.lower(), v.strip()))
    assert got == want


def test_frontier_filter_rep_prefix_semantics(spark):
    n = 40
    docs = spark.range(n).toDF("doc_id")
    pages = (W.http_responses(W.synth_warc_media(docs))
             .select("media_id", "page", "target_uri"))
    rules = W.robots_rules(_robots_resp(spark, n))
    got = {(r.media_id, r.page)
           for r in W.crawl_frontier_filter(pages, rules).collect()}
    want = set()
    for d in range(n):
        h = d % W.N_HOSTS
        for p in range(W.n_pages(d)):
            path = f"/doc/{d}/page/{p}"
            if h % 5 == 0:
                continue                      # whole-site /doc/ block
            if h % 3 == 0 and path.startswith(f"/doc/{h}"):
                continue                      # char-prefix rule
            want.add((d, p))
    assert got == want
    # host 9 pages blocked by its own char-prefix rule; host 10 (if
    # reached) by the /doc/ rule — both absent above. sanity:
    assert all(m % W.N_HOSTS % 5 != 0 for m, _ in got)


def test_politeness_schedule_slots_and_offsets(spark):
    n = 40
    docs = spark.range(n).toDF("doc_id")
    pages = (W.http_responses(W.synth_warc_media(docs))
             .select("media_id", "page", "target_uri"))
    rules = W.robots_rules(_robots_resp(spark, n))
    rows = W.politeness_schedule(pages, rules).collect()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        h = int(host.split("-")[1].split(".")[0])
        rs.sort(key=lambda r: (r.media_id, r.page))
        for k, r in enumerate(rs, start=1):
            assert r.slot == k
            assert r.fetch_offset_s == (k - 1) * (1 + h % 4)


def test_anchor_text_matches_python_replay(spark):
    from collections import Counter
    n = 30
    docs = spark.range(n).toDF("doc_id")
    resp = W.http_responses(W.synth_warc_media(docs, linkfarm=True))
    got = {(r.dst_host, r.anchor): r.n_refs
           for r in W.anchor_text(resp).collect()}
    want: Counter = Counter()
    for d in range(n):
        for p in range(W.n_pages(d)):
            for i in range(1 + (d + p) % 3):
                hd = (d + 31 * p + 17 * i + 1) % W.N_HOSTS
                want[(f"example-{hd}.org",
                      f"a{(d + 7 * p + 13 * i) % 23}")] += 1
    assert got == dict(want)


# --------------------------------------------------------------------------
# URL canonicalization + WET sink
# --------------------------------------------------------------------------

def test_url_normalize_edge_faces(spark):
    cases = [
        ("HTTP://Example.ORG:80/a//b/./c/../d?b=2&a=1#frag",
         "http://example.org/a/b/d?a=1&b=2"),
        ("https://x.org:443/", "https://x.org/"),
        ("https://x.org", "https://x.org/"),          # bare host -> /
        ("http://y.net/p/q/", "http://y.net/p/q"),    # trailing slash drop
        ("https://z.io/a/b/../../c?z=9", "https://z.io/c?z=9"),
        ("https://h.io/../x", "https://h.io/x"),      # .. past root clamps
        ("http://a.b:8080/x", "http://a.b:8080/x"),   # non-default port kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r.url: r.url_canon for r in W.url_normalize(df).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_wet_records_reparse_roundtrip(spark):
    """The WET sink's output must be valid WARC: re-parse every
    serialized record with our own strict walker and recover the
    exact clean text and target URI."""
    pages = W.warc_html_pipeline(_media(spark, n=10))
    texts = {(r.media_id, r.page): r.text_clean for r in pages.collect()}
    for r in W.wet_records(pages).collect():
        recs = list(W.iter_warc_records(r.wet_record.encode()))
        assert len(recs) == 1
        h = recs[0]["headers"]
        assert h["warc-type"] == "conversion"
        assert h["warc-target-uri"] == (
            f"https://example-{r.media_id % W.N_HOSTS}.org"
            f"/doc/{r.media_id}/page/{r.page}")
        assert recs[0]["payload"].decode() == texts[(r.media_id, r.page)]
        assert r.record_len == len(r.wet_record)
        assert r.record_md5 == hashlib.md5(
            r.wet_record.encode()).hexdigest()


def test_wet_files_concatenate_in_page_order(spark):
    pages = W.warc_html_pipeline(_media(spark, n=10))
    recs = {}
    for r in W.wet_records(pages).collect():
        recs.setdefault(r.media_id, []).append((r.page, r.wet_record))
    want = {m: "".join(w for _, w in sorted(v)) for m, v in recs.items()}
    for r in W.wet_files(pages).collect():
        assert r.file_len == len(want[r.media_id])
        assert r.file_md5 == hashlib.md5(
            want[r.media_id].encode()).hexdigest()


# --------------------------------------------------------------------------
# recrawl diff
# --------------------------------------------------------------------------

def test_crawl_diff_matches_python_replay(spark):
    n = 36
    docs = spark.range(n).toDF("doc_id")
    a = W.http_responses(W.synth_warc_media(docs))
    b = W.http_responses(W.synth_warc_media(docs, rev=1))
    got = {r.target_uri: r.status
           for r in W.crawl_diff(a, b).collect()}
    want = {}
    for d in range(n):
        base = set(range(W.n_pages(d)))
        new = {p for p in base if (d + p) % 9 != 5}
        if d % 6 == 0:
            new.add(W.n_pages(d))
        for p in base | new:
            uri = (f"https://example-{d % W.N_HOSTS}.org"
                   f"/doc/{d}/page/{p}")
            if p not in base:
                want[uri] = "new"
            elif p not in new:
                want[uri] = "gone"
            elif (d + p) % 4 == 0:
                want[uri] = "changed"
            else:
                want[uri] = "same"
    assert got == want
    assert set(want.values()) == {"new", "gone", "changed", "same"}


def test_crawl_diff_identical_snapshots_all_same(spark):
    docs = spark.range(12).toDF("doc_id")
    a = W.http_responses(W.synth_warc_media(docs))
    b = W.http_responses(W.synth_warc_media(docs))
    assert {r.status for r in W.crawl_diff(a, b).collect()} == {"same"}


# --------------------------------------------------------------------------
# CDX capture index
# --------------------------------------------------------------------------

def test_cdx_offsets_reslice_to_same_record_plain_and_gz(spark):
    """The property a CDX index exists for: fetching [offset,
    offset+length) out of the container and re-parsing yields exactly
    the indexed capture."""
    docs = spark.range(9).toDF("doc_id")
    for compress in (False, True):
        media = {r["media_id"]: bytes(r["payload"])
                 for r in W.synth_warc_media(docs, compress=compress)
                 .collect()}
        rows = W.cdx_records(
            W.synth_warc_media(docs, compress=compress),
            compressed=compress).collect()
        assert len(rows) == sum(W.n_pages(d) for d in range(9))
        for r in rows:
            blob = media[r["media_id"]][r["offset"]:r["offset"] + r["length"]]
            if compress:
                blob = gzip.decompress(blob)
            (rec,) = list(W.iter_warc_records(blob))
            assert rec["headers"]["warc-type"] == "response"
            msg = W.parse_http_message(rec["payload"])
            assert hashlib.md5(msg["body"]).hexdigest() == r["digest"]
            assert msg["status"] == r["http_status"]
            assert rec["headers"]["warc-target-uri"] == r["url"]


def test_surt_key_forms(spark):
    df = spark.createDataFrame(
        [("https://www.news.example.org:443/a/b?x=1",),
         ("http://Example.ORG:80/",),
         ("https://example-5.org/doc/5/page/0",)], ["url"])
    got = [r[0] for r in df.select(W.surt_key("url")).collect()]
    assert got == ["org,example,news)/a/b?x=1",
                   "org,example)/",
                   "org,example-5)/doc/5/page/0"]


def test_cdx_index_closed_form(spark):
    rows = W.cdx_index(W.synth_warc_media(spark.range(20).toDF("doc_id"))
                       ).collect()
    by_key = {(r["media_id"], r["url"]): r for r in rows}
    for d in range(20):
        for p in range(W.n_pages(d)):
            r = by_key[(d, f"https://example-{d % W.N_HOSTS}.org"
                           f"/doc/{d}/page/{p}")]
            assert r["surt_key"] == (f"org,example-{d % W.N_HOSTS})"
                                     f"/doc/{d}/page/{p}")
            assert r["ts"] == f"202601{(d % 28) + 1:02d}{d % 24:02d}0000"
            assert r["http_status"] == (404 if (d + p) % 7 == 3 else 200)


def test_cdx_shards_total_order_and_secondary_index(spark):
    cdx = W.cdx_index(W.synth_warc_media(spark.range(60).toDF("doc_id")))
    shards = W.cdx_shards(cdx, n_shards=5).persist()
    try:
        # nothing lost, nothing duplicated
        n = cdx.count()
        assert shards.count() == n
        assert shards.select("cdx_line").distinct().count() == n
        sec = W.cdx_secondary_index(shards).collect()
        assert sum(r["n_captures"] for r in sec) == n
        # each shard internally covers [first,last]; shards don't overlap
        ordered = sorted(sec, key=lambda r: r["shard"])
        for r in ordered:
            assert r["first_key"] <= r["last_key"]
        for a, b in zip(ordered, ordered[1:]):
            assert a["last_key"] <= b["first_key"]
        # within-shard sortedness of the emitted line order
        for sid in [r["shard"] for r in ordered]:
            keys = [(r["surt_key"], r["ts"]) for r in
                    shards.where(F.col("shard") == sid)
                    .select("surt_key", "ts").collect()]
            assert keys == sorted(keys)
    finally:
        shards.unpersist()


# --------------------------------------------------------------------------
# sitemap frontier seeding
# --------------------------------------------------------------------------

def test_sitemap_roundtrip_and_seed_lattice(spark):
    docs = spark.range(25).toDF("doc_id")
    sm = W.synth_sitemap_media(docs)
    # one urlset per distinct host
    assert sm.count() == docs.select(
        (F.col("doc_id") % W.N_HOSTS)).distinct().count()
    urls = W.sitemap_urls(sm)
    # every doc advertises n_pages(d) + 1 locs, host parsed from loc
    want = {(f"https://example-{d % W.N_HOSTS}.org/doc/{d}/page/{p}",
             f"example-{d % W.N_HOSTS}.org",
             f"2026-01-{(d % 28) + 1:02d}")
            for d in range(25) for p in range(W.n_pages(d) + 1)}
    assert {tuple(r) for r in urls.collect()} == want

    crawled = W.http_responses(W.synth_warc_media(docs))
    seed = W.frontier_seed(W.sitemap_urls(sm), crawled).collect()
    # exactly the one uncrawled page per doc survives the anti join
    assert {r["url"] for r in seed} == {
        f"https://example-{d % W.N_HOSTS}.org/doc/{d}/page/{W.n_pages(d)}"
        for d in range(25)}


def test_frontier_seed_is_canonicalization_immune(spark):
    sm = spark.createDataFrame(
        [("https://example-1.org/a/./b?z=1&a=2", "example-1.org", "2026-01-01"),
         ("https://example-1.org/c", "example-1.org", "2026-01-01")],
        ["url", "host", "lastmod"])
    crawled = spark.createDataFrame(
        [("HTTPS://EXAMPLE-1.ORG:443/a/b?a=2&z=1",)], ["target_uri"])
    got = W.frontier_seed(sm, crawled).collect()
    assert [r["url"] for r in got] == ["https://example-1.org/c"]
