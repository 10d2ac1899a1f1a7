"""WARC (Web ARChive, ISO 28500) container support — the source
format of every web-scale crawl corpus (Common Crawl ships ~100 TB
per snapshot as `.warc.gz`).  Pure stdlib: synthesis, strict record
parsing, HTTP response splitting, and the gzip *member-per-record*
layout that makes multi-gigabyte WARC files splittable.

Reference scope note: the reference engine (flu-crew/octofludb) has
no web-crawl ingestion — this module is part of the training-data
pipeline extension mandated alongside SURVEY.md §2 (dedup / quality /
multimodal / web sources), mirroring the reference's *recipe* pattern
(extract/recipes.py style: parse container -> typed rows).

Scale shape
-----------
* A WARC file is a concatenation of self-delimiting records
  (header block + Content-Length payload).  Common Crawl compresses
  EACH record as its own gzip member, so any byte offset in a .warc.gz
  can be re-synchronised by scanning for the next member magic and
  validating — that is what lets a 1 GiB file split across executors.
  `scan_gzip_member_offsets` implements exactly that re-sync scan and
  is test-pinned against the sequential `decompressobj` member walk.
* All parsing here is Arrow-batched `mapInPandas` over binary
  payload columns: record bytes never visit the driver, the explode
  from files to records happens map-side, and everything downstream
  (HTTP split, HTML extraction) is ordinary JVM-side projection.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
BCRLF = b"\r\n"


# ------------------------------------------------------------------
# deterministic synthesis (closed-form parameters from media_id so an
# external engine can reconstruct every payload string exactly)
# ------------------------------------------------------------------

def synth_page_html(d: int, p: int) -> str:
    """The response body for page p of doc d.  Every byte is a
    closed-form function of (d, p): the DuckDB oracles rebuild this
    exact string with `||` concatenation."""
    v = d * 31 + p
    link = ('<a href="https://example.org/more">more</a> '
            if (d + p) % 2 == 0 else "")
    return (
        f"<html><head><title>Doc {d} page {p}</title>"
        "<style>p { color: #222; }</style>"
        f"<script>var x = {d};</script></head>"
        f"<body><!-- note {p} --><h1>Doc {d} page {p}</h1>"
        f"<p>alpha beta gamma {v} delta.</p> "
        f"{link}&amp; fin</body></html>"
    )


N_HOSTS = 97


def synth_link_html(d: int, p: int) -> str:
    """Link-farm body for the host-graph gates: page p of doc d emits
    1 + (d+p) % 3 outlinks whose target hosts AND anchor texts are
    closed-form in (d, p, i) — so an external engine can rebuild the
    whole host-level edge list (and therefore the PageRank trajectory
    and the anchor-text lattice) exactly."""
    k = 1 + (d + p) % 3
    links = "".join(
        f'<a href="https://example-{(d + 31 * p + 17 * i + 1) % N_HOSTS}'
        f'.org/in/{d}">a{(d + 7 * p + 13 * i) % 23}</a> '
        for i in range(k))
    return f"<html><body><h1>Hub {d} {p}</h1>{links}</body></html>"


def synth_http_response(d: int, p: int, linkfarm: bool = False,
                        rev: int = 0) -> str:
    """Full HTTP/1.1 response message (status line + headers + body).
    rev > 0 models a RECRAWL snapshot: every (d+p) % 4 == 0 page's
    body gains a ' rev{rev}' suffix (a changed page); everything else
    is byte-identical to rev 0."""
    if linkfarm:
        status, ctype = "HTTP/1.1 200 OK", "text/html"
        body = synth_link_html(d, p)
    elif (d + p) % 7 == 3:
        status, ctype = "HTTP/1.1 404 Not Found", "text/plain"
        body = f"not found {d}/{p}"
    else:
        status, ctype = "HTTP/1.1 200 OK", "text/html"
        body = synth_page_html(d, p)
    if rev and (d + p) % 4 == 0:
        body += f" rev{rev}"
    return (f"{status}{CRLF}Content-Type: {ctype}{CRLF}"
            f"Content-Length: {len(body)}{CRLF}"
            f"Server: synthd/1.0{CRLF}{CRLF}{body}")


def synth_http_request(d: int, p: int) -> str:
    return (f"GET /doc/{d}/page/{p} HTTP/1.1{CRLF}"
            f"Host: example-{d % 97}.org{CRLF}"
            f"User-Agent: octofludb-spark/1.0{CRLF}"
            f"Accept: text/html{CRLF}{CRLF}")


def synth_warcinfo(d: int) -> str:
    return (f"software: octofludb-spark/1.0{CRLF}"
            f"format: WARC File Format 1.0{CRLF}"
            f"isPartOf: synth-crawl-{d % 10}{CRLF}")


def _record_id(d: int, idx: int) -> str:
    return hashlib.md5(f"{d}:{idx}".encode()).hexdigest()


def _warc_date(d: int) -> str:
    return f"2026-01-{(d % 28) + 1:02d}T{d % 24:02d}:00:00Z"


def _record_bytes(d: int, idx: int, warc_type: str, payload: bytes,
                  target_uri: str | None) -> bytes:
    wct = {
        "warcinfo": "application/warc-fields",
        "request": "application/http; msgtype=request",
        "response": "application/http; msgtype=response",
    }[warc_type]
    hdr = [f"WARC/1.0",
           f"WARC-Type: {warc_type}",
           f"WARC-Record-ID: <urn:uuid:{_record_id(d, idx)}>",
           f"WARC-Date: {_warc_date(d)}"]
    if target_uri is not None:
        hdr.append(f"WARC-Target-URI: {target_uri}")
    hdr.append(f"Content-Type: {wct}")
    hdr.append(f"Content-Length: {len(payload)}")
    head = (CRLF.join(hdr) + CRLF + CRLF).encode()
    # spec: two CRLFs terminate the record after the payload block
    return head + payload + BCRLF + BCRLF


def n_pages(d: int) -> int:
    return 1 + d % 3


def _synth_warc_recs(d: int, linkfarm: bool = False,
                     rev: int = 0) -> list[bytes]:
    """The record list behind synth_warc, exposed so the adversarial
    corruption faces can rebuild individual records surgically."""
    recs = [_record_bytes(d, 0, "warcinfo",
                          synth_warcinfo(d).encode(), None)]
    pages = list(range(n_pages(d)))
    if rev:
        pages = [p for p in pages if (d + p) % 9 != 5]
        if d % 6 == 0:
            pages.append(n_pages(d))
    for p in pages:
        uri = f"https://example-{d % N_HOSTS}.org/doc/{d}/page/{p}"
        recs.append(_record_bytes(d, 2 * p + 1, "request",
                                  synth_http_request(d, p).encode(), uri))
        recs.append(_record_bytes(
            d, 2 * p + 2, "response",
            synth_http_response(d, p, linkfarm=linkfarm,
                                rev=rev).encode(), uri))
    return recs


def synth_warc(d: int, compress: bool = False,
               linkfarm: bool = False, rev: int = 0) -> bytes:
    """One WARC file for doc d: warcinfo, then (request, response)
    per page.  compress=True emits the Common Crawl layout — each
    record its own gzip member (mtime=0 for determinism).
    linkfarm=True swaps the bodies for closed-form outlink pages
    (the host-graph gates).  rev > 0 is a recrawl snapshot: pages
    with (d+p) % 9 == 5 are GONE, every 6th doc gains one NEW page
    at index n_pages(d), and (d+p) % 4 == 0 bodies CHANGE (suffix);
    the rest are byte-identical — the crawl-diff lattice."""
    recs = _synth_warc_recs(d, linkfarm=linkfarm, rev=rev)
    if compress:
        return b"".join(gzip.compress(r, mtime=0) for r in recs)
    return b"".join(recs)


# ------------------------------------------------------------------
# robots.txt (crawl politeness) — Common Crawl keeps robots fetches
# in a dedicated WARC archive; mirrored here as one file per host.
# Every directive is closed-form in the host index h so a DuckDB
# oracle can rebuild the full rules table.
# ------------------------------------------------------------------

def synth_robots_txt(h: int) -> str:
    """robots.txt body for host example-{h}.org.  Three rule shapes:
    a universal never-matching prefix (/private/), a whole-site page
    block on every 5th host (/doc/), and a raw string-prefix rule
    (/doc/{h}) on every 3rd host — the last one deliberately exercises
    REP's character-prefix (not path-segment) match semantics."""
    lines = ["User-agent: *",
             f"Crawl-delay: {1 + h % 4}",
             "Disallow: /private/"]
    if h % 5 == 0:
        lines.append("Disallow: /doc/")
    if h % 3 == 0:
        lines.append(f"Disallow: /doc/{h}")
    return "\n".join(lines) + "\n"


def synth_warc_robots(h: int, compress: bool = False) -> bytes:
    """One robots-fetch WARC (warcinfo, request, response) for host h."""
    uri = f"https://example-{h}.org/robots.txt"
    req = (f"GET /robots.txt HTTP/1.1{CRLF}Host: example-{h}.org{CRLF}"
           f"User-Agent: octofludb-spark/1.0{CRLF}"
           f"Accept: text/plain{CRLF}{CRLF}")
    body = synth_robots_txt(h)
    resp = (f"HTTP/1.1 200 OK{CRLF}Content-Type: text/plain{CRLF}"
            f"Content-Length: {len(body)}{CRLF}"
            f"Server: synthd/1.0{CRLF}{CRLF}{body}")
    recs = [_record_bytes(h, 0, "warcinfo", synth_warcinfo(h).encode(),
                          None),
            _record_bytes(h, 1, "request", req.encode(), uri),
            _record_bytes(h, 2, "response", resp.encode(), uri)]
    if compress:
        return b"".join(gzip.compress(r, mtime=0) for r in recs)
    return b"".join(recs)


# ------------------------------------------------------------------
# strict record parsing
# ------------------------------------------------------------------

def iter_warc_records(b: bytes) -> Iterator[dict]:
    """Walk a (plain) WARC byte stream record by record.  Strict:
    version line must be WARC/0.x or WARC/1.x, Content-Length is
    mandatory, truncated payloads raise."""
    pos, n = 0, len(b)
    while pos < n:
        while b[pos:pos + 2] == BCRLF:       # inter-record padding
            pos += 2
        if pos >= n:
            return
        end = b.find(BCRLF + BCRLF, pos)
        if end < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        block = b[pos:end].decode("utf-8", "replace")
        lines = block.split(CRLF)
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at offset {pos}: "
                             f"{lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        start = end + 4
        payload = b[start:start + clen]
        if len(payload) < clen:
            raise ValueError(f"truncated record at offset {pos}: "
                             f"want {clen}, have {len(payload)}")
        yield {"offset": pos, "version": lines[0],
               "headers": headers, "payload": payload}
        pos = start + clen


def parse_http_message(payload: bytes) -> dict:
    """Split an HTTP/1.1 message into status/headers/body."""
    end = payload.find(BCRLF + BCRLF)
    if end < 0:
        raise ValueError("no HTTP header terminator")
    lines = payload[:end].decode("utf-8", "replace").split(CRLF)
    first = lines[0]
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        headers[k.strip().lower()] = v.strip()
    body = payload[end + 4:]
    out = {"headers": headers, "body": body}
    if first.startswith("HTTP/"):
        parts = first.split(" ", 2)
        out["status"] = int(parts[1])
    else:                                     # request line
        parts = first.split(" ")
        out["method"], out["path"] = parts[0], parts[1]
    return out


# ------------------------------------------------------------------
# gzip member walking (the splittable-read machinery)
# ------------------------------------------------------------------

def iter_gzip_members(b: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Sequential exact member walk via decompressobj unused_data:
    yields (offset, compressed_len, uncompressed_bytes)."""
    pos, n = 0, len(b)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(b[pos:])
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        consumed = (n - pos) - len(d.unused_data)
        yield pos, consumed, out
        pos += consumed


GZ_MAGIC = b"\x1f\x8b\x08"


def _next_valid_member(b: bytes, pos: int) -> tuple[int, int] | None:
    """First offset >= ``pos`` holding a VALID gzip member: candidate
    magic + full-member decompress validation (a random
    \\x1f\\x8b\\x08 inside deflate data fails and is skipped).
    Returns (offset, compressed_length) or None.  The ONE validation
    rule shared by the splittable scanner and the tolerant walker's
    resync — they cannot drift apart."""
    while True:
        hit = b.find(GZ_MAGIC, pos)
        if hit < 0:
            return None
        d = zlib.decompressobj(wbits=31)
        try:
            d.decompress(b[hit:])
            if d.eof:
                return hit, len(b) - hit - len(d.unused_data)
        except zlib.error:
            pass
        pos = hit + 1


def scan_gzip_member_offsets(b: bytes) -> list[int]:
    """Offset re-synchronisation for splittable .warc.gz reads
    (_next_valid_member validation).  On a cluster each split scans
    forward from its assigned byte range to the first valid member
    and stops at the first valid member past its end — no
    coordination, no index file.  Test-pinned == iter_gzip_members."""
    offsets, pos = [], 0
    while True:
        nxt = _next_valid_member(b, pos)
        if nxt is None:
            return offsets
        offsets.append(nxt[0])
        pos = nxt[0] + nxt[1]


# ------------------------------------------------------------------
# adversarial-input tolerance (skip-and-count)
#
# The strict parsers above raise on the first malformed byte — right
# for synthesized archives, wrong for a real crawl corpus where a
# single bad record must not kill a 100 TB job.  The tolerant walkers
# below never raise on content: every malformed region is SKIPPED,
# COUNTED by category, and the walk resyncs at the next record
# boundary (the dedup family's logged-cap contract — loss is bounded
# and always visible, never silent).
# ------------------------------------------------------------------

_WARC_MAGIC = b"WARC/"
_MAX_WARC_HEADER = 65536  # adversarial giant-header guard


def _warc_resync(b: bytes, pos: int) -> int:
    """Next plausible record boundary: a 'WARC/' that starts a line."""
    hit = b.find(BCRLF + _WARC_MAGIC, pos)
    return hit + 2 if hit >= 0 else len(b)


def walk_warc_tolerant(b: bytes) -> tuple[list[dict], dict]:
    """Tolerant twin of iter_warc_records: returns (records, rejects)
    where rejects counts skipped malformations by category —
    bad_version (line doesn't start 'WARC/'), unterminated_header (no
    CRLFCRLF within 64 KiB), bad_content_length (missing / non-
    numeric / negative), truncated_payload (Content-Length exceeds
    the remaining stream — the '>2 GiB lie' and truncated-tail cases
    both land here).  After any reject the walk resyncs at the next
    line-starting 'WARC/', so one bad record costs one record, not
    the archive.  skipped_bytes totals the resync losses."""
    records: list[dict] = []
    rejects = {"bad_version": 0, "unterminated_header": 0,
               "bad_content_length": 0, "truncated_payload": 0,
               "skipped_bytes": 0}
    pos, n = 0, len(b)
    while pos < n:
        while b[pos:pos + 2] == BCRLF:  # inter-record padding
            pos += 2
        if pos >= n:
            break
        if not b.startswith(_WARC_MAGIC, pos):
            rejects["bad_version"] += 1
            nxt = _warc_resync(b, pos)
            rejects["skipped_bytes"] += nxt - pos
            pos = nxt
            continue
        end = b.find(BCRLF + BCRLF, pos, pos + _MAX_WARC_HEADER)
        if end < 0:
            rejects["unterminated_header"] += 1
            nxt = _warc_resync(b, pos + 1)
            rejects["skipped_bytes"] += nxt - pos
            pos = nxt
            continue
        lines = b[pos:end].decode("utf-8", "replace").split(CRLF)
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        start = end + 4
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            clen = -1
        if clen < 0:
            rejects["bad_content_length"] += 1
            nxt = _warc_resync(b, start)
            rejects["skipped_bytes"] += nxt - start
            pos = nxt
            continue
        if clen > n - start:
            rejects["truncated_payload"] += 1
            nxt = _warc_resync(b, start)
            rejects["skipped_bytes"] += nxt - start
            pos = nxt
            continue
        records.append({"offset": pos, "version": lines[0],
                        "headers": headers,
                        "payload": b[start:start + clen]})
        pos = start + clen
    return records, rejects


def walk_gzip_members_tolerant(b: bytes) -> tuple[list[bytes], dict]:
    """Tolerant twin of iter_gzip_members: returns (members, rejects).
    A member that fails to decompress (bit-rot, truncation, a trailer
    cut off mid-stream) is counted as bad_gzip_member and the walk
    resyncs at the next VALIDATED member magic (same validation as
    scan_gzip_member_offsets); non-gzip garbage between members is
    counted as gzip_garbage."""
    members: list[bytes] = []
    rejects = {"bad_gzip_member": 0, "gzip_garbage": 0,
               "skipped_bytes": 0}
    pos, n = 0, len(b)
    while pos < n:
        hit = b.find(GZ_MAGIC, pos)
        if hit < 0:
            rejects["gzip_garbage"] += 1
            rejects["skipped_bytes"] += n - pos
            break
        if hit > pos:
            rejects["gzip_garbage"] += 1
            rejects["skipped_bytes"] += hit - pos
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(b[hit:])
            ok = d.eof
        except zlib.error:
            ok = False
        if ok:
            members.append(out)
            pos = hit + (n - hit - len(d.unused_data))
        else:
            rejects["bad_gzip_member"] += 1
            # resync at the next VALIDATED member (same rule as the
            # splittable scanner: _next_valid_member)
            cand = _next_valid_member(b, hit + 1)
            nxt = cand[0] if cand else n
            rejects["skipped_bytes"] += nxt - hit
            pos = nxt
    return members, rejects


def _dechunk(body: bytes) -> tuple[bytes, int]:
    """RFC 7230 chunked transfer decoding, tolerant: returns
    (decoded_prefix, n_rejects) — a malformed chunk-size line, a
    truncated chunk or a missing chunk terminator counts one reject
    and keeps whatever decoded cleanly before it."""
    out = bytearray()
    pos, rejects = 0, 0
    while True:
        nl = body.find(BCRLF, pos)
        if nl < 0:
            rejects += 1
            break
        tok = body[pos:nl].split(b";")[0].strip()
        try:
            sz = int(tok, 16)
        except ValueError:
            rejects += 1
            break
        if sz == 0:  # terminating chunk (trailers ignored)
            break
        chunk = body[nl + 2:nl + 2 + sz]
        out += chunk
        if len(chunk) < sz:
            rejects += 1
            break
        pos = nl + 2 + sz
        if body[pos:pos + 2] != BCRLF:
            rejects += 1
            break
        pos += 2
    return bytes(out), rejects


def parse_http_tolerant(payload: bytes) -> tuple[dict | None, dict]:
    """Tolerant twin of parse_http_message: returns (message_or_None,
    rejects) with categories no_terminator, bad_status_line,
    header_injection (a bare LF inside the header block — request
    smuggling's signature), bad_chunk (malformed chunked framing),
    length_mismatch (Content-Length disagrees with the actual body).
    Chunked bodies are decoded; the body delivered is whatever
    survived, never an exception."""
    rejects = {"no_terminator": 0, "bad_status_line": 0,
               "header_injection": 0, "bad_chunk": 0,
               "length_mismatch": 0}
    end = payload.find(BCRLF + BCRLF)
    if end < 0:
        rejects["no_terminator"] += 1
        return None, rejects
    head = payload[:end]
    if b"\n" in head.replace(BCRLF, b""):
        rejects["header_injection"] += 1
    lines = head.decode("utf-8", "replace").split(CRLF)
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        headers[k.strip().lower()] = v.strip()
    out: dict = {"headers": headers}
    first = lines[0]
    if first.startswith("HTTP/"):
        parts = first.split(" ", 2)
        try:
            out["status"] = int(parts[1])
        except (IndexError, ValueError):
            rejects["bad_status_line"] += 1
            return None, rejects
    else:
        parts = first.split(" ")
        if len(parts) < 2:
            rejects["bad_status_line"] += 1
            return None, rejects
        out["method"], out["path"] = parts[0], parts[1]
    body = payload[end + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body, nrej = _dechunk(body)
        rejects["bad_chunk"] += nrej
    elif "content-length" in headers:
        try:
            if int(headers["content-length"]) != len(body):
                rejects["length_mismatch"] += 1
        except ValueError:
            rejects["length_mismatch"] += 1
    out["body"] = body
    return out, rejects


# Corruption modes for the fuzz battery / the web_malformed_tolerance
# gate, keyed by d % 8.  Every mode's effect on the tolerant-walk
# counters is closed-form (see the gate's oracle):
#   0 intact plain            4 bare-LF header injection in HTTP
#   1 stream truncated mid-   5 malformed chunked HTTP body
#     payload of last record  6 intact .warc.gz
#   2 Content-Length lie      7 last gzip member truncated
#     (3 GB) on 1st response
#   3 corrupted WARC version
#     line on record 1
def synth_warc_corrupt(d: int) -> bytes:
    """synth_warc(d) with the deterministic adversarial corruption
    d % 8 applied (table above) — the malformed-input battery face."""
    mode = d % 8
    if mode == 6:
        return synth_warc(d, compress=True)
    if mode == 7:
        return synth_warc(d, compress=True)[:-6]  # trailer cut off
    recs = _synth_warc_recs(d)
    uri = f"https://example-{d % N_HOSTS}.org/doc/{d}/page/0"
    if mode == 1:
        return b"".join(recs)[:-10]
    if mode == 2:
        head, _, tail = recs[2].partition(BCRLF + BCRLF)
        resp = synth_http_response(d, 0)
        head = head.replace(
            f"Content-Length: {len(resp.encode())}".encode(),
            b"Content-Length: 3000000000")
        recs[2] = head + BCRLF + BCRLF + tail
    elif mode == 3:
        recs[1] = b"FAKE/9.9" + recs[1][len(b"WARC/1.0"):]
    elif mode == 4:
        resp = synth_http_response(d, 0).encode()
        resp = resp.replace(
            BCRLF, BCRLF + b"X-Smuggle: a\nX-Injected: b" + BCRLF, 1)
        recs[2] = _record_bytes(d, 2, "response", resp, uri)
    elif mode == 5:
        resp = synth_http_response(d, 0).encode()
        head, _, body = resp.partition(BCRLF + BCRLF)
        head = head.replace(
            f"Content-Length: {len(body)}".encode(),
            b"Transfer-Encoding: chunked")
        first = body[:16]
        chunked = (f"{len(first):x}".encode() + BCRLF + first + BCRLF
                   + b"ZZZ" + BCRLF)  # garbage size line -> bad_chunk
        recs[2] = _record_bytes(d, 2, "response",
                                head + BCRLF + BCRLF + chunked, uri)
    return b"".join(recs)


MALFORMED_SCHEMA = ("media_id long, mode int, n_ok int, n_http_ok int, "
                    "rej_truncated int, rej_version int, "
                    "rej_injection int, rej_chunk int, rej_gzip int")


def warc_malformed_stats(media: DataFrame) -> DataFrame:
    """Adversarial-tolerance telemetry, map-side (Arrow-batched
    mapInPandas, bytes never visit the driver): runs the tolerant
    walkers over each archive — gzip membership auto-sniffed per
    payload — and reports records parsed plus every reject counter.
    This is the contract a 100 TB crawl read needs: malformed input
    costs bounded, COUNTED loss instead of a dead executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "mode", "n_ok", "n_http_ok", "rej_truncated",
                "rej_version", "rej_injection", "rej_chunk", "rej_gzip"]
        for pdf in batches:
            out: dict = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                gz_rej = 0
                if raw[:3] == GZ_MAGIC:
                    members, grej = walk_gzip_members_tolerant(raw)
                    raw = b"".join(members)
                    gz_rej = (grej["bad_gzip_member"]
                              + grej["gzip_garbage"])
                recs, wrej = walk_warc_tolerant(raw)
                n_http = inj = chunk = 0
                for rec in recs:
                    if rec["headers"].get("warc-type") != "response":
                        continue
                    msg, hrej = parse_http_tolerant(rec["payload"])
                    if msg is not None:
                        n_http += 1
                    inj += hrej["header_injection"]
                    chunk += hrej["bad_chunk"]
                out["media_id"].append(int(mid))
                out["mode"].append(int(mid) % 8)
                out["n_ok"].append(len(recs))
                out["n_http_ok"].append(n_http)
                out["rej_truncated"].append(wrej["truncated_payload"])
                out["rej_version"].append(wrej["bad_version"])
                out["rej_injection"].append(inj)
                out["rej_chunk"].append(chunk)
                out["rej_gzip"].append(gz_rej)
            yield pd.DataFrame({
                "media_id": pd.array(out["media_id"], dtype="int64"),
                **{c: pd.array(out[c], dtype="int32")
                   for c in cols[1:]},
            })

    return media.mapInPandas(run, MALFORMED_SCHEMA)


def synth_corrupt_media(docs: DataFrame) -> DataFrame:
    """documents -> one deterministically corrupted WARC per doc_id
    (synth_warc_corrupt), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(m) for m in pdf["doc_id"]]
            yield pd.DataFrame({
                "media_id": pd.array(ids, dtype="int64"),
                "payload": [synth_warc_corrupt(d) for d in ids],
            })

    return docs.select("doc_id").mapInPandas(
        run, "media_id long, payload binary")


# ------------------------------------------------------------------
# DataFrame operators
# ------------------------------------------------------------------

WARC_SCHEMA = ("media_id long, rec_idx int, warc_type string, "
               "record_id string, target_uri string, warc_date string, "
               "content_length long, payload_md5 string")


def synth_warc_media(docs: DataFrame, compress: bool = False,
                     linkfarm: bool = False, rev: int = 0) -> DataFrame:
    """documents -> one synthetic WARC file per doc_id (binary
    payload column), Arrow-batched; compress=True gives the
    member-per-record .warc.gz layout; rev > 0 the recrawl snapshot
    (see synth_warc)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(m) for m in pdf["doc_id"]]
            yield pd.DataFrame({
                "media_id": pd.array(ids, dtype="int64"),
                "payload": [synth_warc(d, compress=compress,
                                       linkfarm=linkfarm, rev=rev)
                            for d in ids],
            })

    return docs.select("doc_id").mapInPandas(
        run, "media_id long, payload binary")


def synth_robots_media(docs: DataFrame, compress: bool = False) -> DataFrame:
    """documents -> one robots-fetch WARC per DISTINCT host (doc_id %
    N_HOSTS).  The distinct projects a single tiny column before its
    shuffle; the synthesized archive mirrors Common Crawl's separate
    robotstxt WARC set."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = [int(h) for h in pdf["host_id"]]
            yield pd.DataFrame({
                "media_id": pd.array(hs, dtype="int64"),
                "payload": [synth_warc_robots(h, compress=compress)
                            for h in hs],
            })

    hosts = (docs.select((F.col("doc_id") % N_HOSTS)
                         .cast("long").alias("host_id"))
                 .distinct())
    return hosts.mapInPandas(run, "media_id long, payload binary")


def warc_records(media: DataFrame, compressed: bool = False) -> DataFrame:
    """Explode WARC files into typed records, map-side.  compressed=
    True walks gzip members first (one record per member — the
    Common Crawl contract), proving the splittable path end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "rec_idx", "warc_type", "record_id",
                "target_uri", "warc_date", "content_length", "payload_md5"]
        for pdf in batches:
            out: dict = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if compressed:
                    stream = b"".join(
                        u for _, _, u in iter_gzip_members(raw))
                else:
                    stream = raw
                for i, rec in enumerate(iter_warc_records(stream)):
                    h = rec["headers"]
                    rid = h.get("warc-record-id", "")
                    out["media_id"].append(int(mid))
                    out["rec_idx"].append(i)
                    out["warc_type"].append(h.get("warc-type"))
                    out["record_id"].append(
                        rid.removeprefix("<urn:uuid:").removesuffix(">"))
                    out["target_uri"].append(h.get("warc-target-uri"))
                    out["warc_date"].append(h.get("warc-date"))
                    out["content_length"].append(int(h["content-length"]))
                    out["payload_md5"].append(
                        hashlib.md5(rec["payload"]).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.array(out["media_id"], dtype="int64"),
                "rec_idx": pd.array(out["rec_idx"], dtype="int32"),
                "warc_type": out["warc_type"],
                "record_id": out["record_id"],
                "target_uri": out["target_uri"],
                "warc_date": out["warc_date"],
                "content_length": pd.array(out["content_length"],
                                           dtype="int64"),
                "payload_md5": out["payload_md5"],
            })

    return media.mapInPandas(run, WARC_SCHEMA)


HTTP_SCHEMA = ("media_id long, page int, target_uri string, "
               "http_status int, content_type string, body_len long, "
               "body_md5 string, body string")


def http_responses(media: DataFrame, compressed: bool = False,
                   tolerant: bool = False) -> DataFrame:
    """WARC files -> one row per HTTP response: status, content type,
    body (string — the crawl-to-text handoff column).  Page index is
    parsed from the target URI, not assumed from record order.

    ``tolerant=True`` swaps in the skip-and-count walkers (gzip
    membership auto-sniffed per payload): malformed records are
    dropped instead of raising, so one bad archive costs its bad
    records, not the job — run warc_malformed_stats over the same
    media for the per-category reject counts (the streaming ingest's
    tolerant face writes both)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "page", "target_uri", "http_status",
                "content_type", "body_len", "body_md5", "body"]
        for pdf in batches:
            out: dict = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if tolerant:
                    if raw[:3] == GZ_MAGIC:
                        members, _ = walk_gzip_members_tolerant(raw)
                        raw = b"".join(members)
                    recs = walk_warc_tolerant(raw)[0]
                elif compressed:
                    recs = iter_warc_records(b"".join(
                        u for _, _, u in iter_gzip_members(raw)))
                else:
                    recs = iter_warc_records(raw)
                for rec in recs:
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    if tolerant:
                        msg, _hrej = parse_http_tolerant(rec["payload"])
                        if msg is None:
                            continue
                    else:
                        msg = parse_http_message(rec["payload"])
                    uri = h.get("warc-target-uri", "")
                    tail = uri.rsplit("/", 1)[-1]
                    page = int(tail) if tail.isdigit() else -1
                    body = msg["body"]
                    out["media_id"].append(int(mid))
                    out["page"].append(page)
                    out["target_uri"].append(uri)
                    out["http_status"].append(msg["status"])
                    out["content_type"].append(
                        msg["headers"].get("content-type"))
                    out["body_len"].append(len(body))
                    out["body_md5"].append(hashlib.md5(body).hexdigest())
                    out["body"].append(body.decode("utf-8", "replace"))
            yield pd.DataFrame({
                "media_id": pd.array(out["media_id"], dtype="int64"),
                "page": pd.array(out["page"], dtype="int32"),
                "target_uri": out["target_uri"],
                "http_status": pd.array(out["http_status"], dtype="int32"),
                "content_type": out["content_type"],
                "body_len": pd.array(out["body_len"], dtype="int64"),
                "body_md5": out["body_md5"],
                "body": out["body"],
            })

    return media.mapInPandas(run, HTTP_SCHEMA)


HREF_RE = r'href="([^"]+)"'
HOST_RE = r"^https?://([^/]+)/"


def extract_links(resp: DataFrame, body_col: str = "body") -> DataFrame:
    """One row per outlink: (media_id, page, src_host, href) — pure
    JVM-side regexp explode over the response bodies (whole-stage
    codegen; Python never touches the hot path)."""
    return resp.select(
        "media_id", "page",
        F.regexp_extract("target_uri", HOST_RE, 1).alias("src_host"),
        F.explode(F.regexp_extract_all(
            F.col(body_col), F.lit(HREF_RE), 1)).alias("href"))


def host_link_graph(resp: DataFrame) -> DataFrame:
    """Host-level link graph from crawl responses: aggregate outlinks
    to (src_host, dst_host, n_links).  One explode + one keyed agg
    (map-side partial); at web scale this is the classic host-graph
    build — no joins, no driver state."""
    links = extract_links(resp)
    return (links
            .select("src_host",
                    F.regexp_extract("href", HOST_RE, 1).alias("dst_host"))
            .where(F.col("dst_host") != "")
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").cast("long").alias("n_links")))


def warc_html_pipeline(media: DataFrame, compressed: bool = False,
                       tolerant: bool = False) -> DataFrame:
    """The full crawl-to-text hop: WARC -> HTTP 200 text/html bodies
    -> html_extract (script/style/comment strip, entity decode,
    whitespace collapse).  Everything after the record explode is
    JVM-side regexp projection — at 100 TB this is one scan stage.
    ``tolerant=True``: skip-and-count parsing (see http_responses).

    Output: (media_id, page, n_links, text_clean, n_chars_clean).
    """
    from octofludb_spark.scale.text import html_extract

    resp = http_responses(media, compressed=compressed,
                          tolerant=tolerant)
    pages = (resp
             .where((F.col("http_status") == 200)
                    & (F.col("content_type") == "text/html"))
             .select((F.col("media_id") * 8 + F.col("page"))
                     .cast("long").alias("doc_id"),
                     F.col("body").alias("html")))
    x = html_extract(pages, html_col="html")
    return x.select(
        (F.col("doc_id") / 8).cast("long").alias("media_id"),
        F.pmod(F.col("doc_id"), F.lit(8)).cast("int").alias("page"),
        "n_links", "text_clean", "n_chars_clean")


# ------------------------------------------------------------------
# politeness (robots rules -> frontier filter -> fetch schedule)
# ------------------------------------------------------------------

def robots_rules(resp: DataFrame) -> DataFrame:
    """robots.txt responses -> (host, directive, value) rule rows.
    One JVM-side line explode + two regexp projections; the output is
    the tiny per-host rules table every politeness stage broadcasts."""
    lines = (resp
             .where(F.col("target_uri").endswith("/robots.txt"))
             .select(F.regexp_extract("target_uri", HOST_RE, 1)
                     .alias("host"),
                     F.explode(F.split("body", "\n")).alias("line")))
    return (lines
            .select("host",
                    F.lower(F.regexp_extract(
                        "line", r"^([A-Za-z-]+):", 1)).alias("directive"),
                    F.trim(F.regexp_extract(
                        "line", r"^[A-Za-z-]+:\s*(.*)$", 1)).alias("value"))
            .where(F.col("directive") != ""))


def crawl_frontier_filter(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop frontier URLs disallowed by their host's robots rules
    (REP string-prefix semantics).  The rules side is one-row-per-
    host×rule — broadcast hash join on host with the prefix test as
    residual condition, left_anti keeps the allowed pages.  At crawl
    scale the pages side never shuffles."""
    dis = (rules
           .where((F.col("directive") == "disallow")
                  & (F.col("value") != ""))
           .select(F.col("host").alias("r_host"),
                   F.col("value").alias("prefix")))
    pg = (pages
          .withColumn("host", F.regexp_extract("target_uri", HOST_RE, 1))
          .withColumn("path", F.regexp_replace(
              "target_uri", r"^https?://[^/]+", "")))
    cond = ((pg["host"] == dis["r_host"])
            & pg["path"].startswith(dis["prefix"]))
    return pg.join(F.broadcast(dis), cond, "left_anti")


def politeness_schedule(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """Per-host fetch schedule honoring Crawl-delay: the k-th allowed
    URL of a host fetches at offset (k-1)*delay seconds.  One window
    keyed by host over the filtered frontier — the same shard key a
    polite fetcher uses for its per-host queues — plus a broadcast
    join for the delays."""
    from pyspark.sql import Window

    delay = (rules
             .where(F.col("directive") == "crawl-delay")
             .select(F.col("host").alias("d_host"),
                     F.col("value").cast("int").alias("delay_s")))
    allowed = crawl_frontier_filter(pages, rules)
    w = Window.partitionBy("host").orderBy("media_id", "page")
    return (allowed
            .select("host", "media_id", "page")
            .withColumn("slot", F.row_number().over(w).cast("int"))
            .join(F.broadcast(delay), F.col("host") == F.col("d_host"),
                  "left")
            .select("host", "media_id", "page", "slot",
                    ((F.col("slot") - 1)
                     * F.coalesce("delay_s", F.lit(1)))
                    .cast("long").alias("fetch_offset_s")))


# ------------------------------------------------------------------
# anchor text (the WAT-style inbound-link signal)
# ------------------------------------------------------------------

ANCHOR_TAG_RE = r'<a href="[^"]+">[^<]*</a>'


def anchor_text(resp: DataFrame, body_col: str = "body") -> DataFrame:
    """Aggregate the text people link WITH to the host they link TO:
    (dst_host, anchor, n_refs).  The classic crawl-ranking signal
    (anchor text describes the target better than the target does).
    Pure JVM regexp explode + one keyed agg with map-side partials —
    at 100 TB this is scan + single shuffle, same shape as the host
    graph build."""
    tags = resp.select(
        F.explode(F.regexp_extract_all(
            F.col(body_col), F.lit(ANCHOR_TAG_RE), 0)).alias("tag"))
    return (tags
            .select(F.regexp_extract(
                        "tag", r'href="https?://([^/"]+)', 1)
                    .alias("dst_host"),
                    F.regexp_extract("tag", r">([^<]*)</a>", 1)
                    .alias("anchor"))
            .where(F.col("dst_host") != "")
            .groupBy("dst_host", "anchor")
            .agg(F.count("*").cast("long").alias("n_refs")))


# ------------------------------------------------------------------
# URL canonicalization (frontier normalization before dedup)
# ------------------------------------------------------------------

def url_normalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """RFC 3986-flavored frontier URL canonicalization — delegates to
    the unified ``urlnorm.url_canonicalize(mode="frontier")`` (see
    that module for the convention and how it differs from the
    dedup-layer mode).  Adds ``url_canon`` next to the input column;
    entirely JVM-side, no shuffle."""
    from octofludb_spark.scale.urlnorm import url_canonicalize

    return url_canonicalize(df, url_col, mode="frontier")


# ------------------------------------------------------------------
# WET sink (crawl-to-text serialized back out as conversion records)
# ------------------------------------------------------------------

def wet_records(pages: DataFrame) -> DataFrame:
    """Serialize extracted page text as WARC `conversion` records —
    the WET format Common Crawl publishes alongside each crawl.
    Input: (media_id, page, text_clean).  Output adds the full
    record string plus its md5/length.  Pure JVM concat: the sink's
    hot path is string assembly inside whole-stage codegen, so a
    100 TB WET write is scan-shaped (records then stream to the
    file sink partitioned by media_id)."""
    uri = F.concat(F.lit("https://example-"),
                   F.pmod(F.col("media_id"), F.lit(N_HOSTS)),
                   F.lit(".org/doc/"), F.col("media_id"),
                   F.lit("/page/"), F.col("page"))
    rid = F.md5(F.concat(F.lit("wet:"), F.col("media_id"),
                         F.lit(":"), F.col("page")))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\n"
              "WARC-Record-ID: <urn:uuid:"), rid,
        F.lit(">\r\nWARC-Target-URI: "), uri,
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.length("text_clean").cast("string"),
        F.lit("\r\n\r\n"), F.col("text_clean"), F.lit("\r\n\r\n"))
    return pages.select(
        "media_id", "page",
        rec.alias("wet_record"),
        F.length(rec).cast("long").alias("record_len"),
        F.md5(rec).alias("record_md5"))


def wet_files(pages: DataFrame) -> DataFrame:
    """Assemble one WET FILE body per media_id: conversion records
    ordered by page, concatenated — the grouped sink layout (one WET
    per source WARC).  One keyed agg over the record rows; the
    page-order sort rides the shuffle via sort_array on (page, rec)
    structs, so file assembly costs a single exchange."""
    recs = wet_records(pages)
    return (recs
            .groupBy("media_id")
            .agg(F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("page", "wet_record"))),
                         lambda s: s["wet_record"]), "")
                 .alias("wet_file"))
            .select("media_id",
                    F.length("wet_file").cast("long").alias("file_len"),
                    F.md5("wet_file").alias("file_md5")))


# ------------------------------------------------------------------
# recrawl diff (cross-snapshot CDC — the 100 TB recrawl primitive)
# ------------------------------------------------------------------

def crawl_diff(resp_old: DataFrame, resp_new: DataFrame) -> DataFrame:
    """Diff two crawl snapshots by page identity (WARC-Target-URI)
    and content hash: every URI classed new / gone / changed / same.
    This is the operator a recrawl pipeline runs before anything
    else — only `changed` + `new` flow downstream, so a 100 TB
    snapshot pair reduces to the (small) delta before extraction,
    dedup, or indexing spend a cycle.

    Shape: both sides project to (uri, md5) map-side, then ONE
    uri-keyed full-outer sort-merge join — the unavoidable shuffle,
    each side carrying two short columns.  On a real cluster the
    snapshots would be bucketed by uri hash at write time, making
    this join exchange-free."""
    a = resp_old.select("target_uri", F.col("body_md5").alias("md5_old"))
    b = resp_new.select("target_uri", F.col("body_md5").alias("md5_new"))
    j = a.join(b, "target_uri", "full_outer")
    return j.select(
        "target_uri",
        F.when(F.col("md5_old").isNull(), F.lit("new"))
         .when(F.col("md5_new").isNull(), F.lit("gone"))
         .when(F.col("md5_old") != F.col("md5_new"), F.lit("changed"))
         .otherwise(F.lit("same")).alias("status"),
        "md5_old", "md5_new")


# ------------------------------------------------------------------
# CDX capture index (Common Crawl cdxj: SURT key -> capture row)
# ------------------------------------------------------------------

CDX_SCHEMA = ("media_id long, offset long, length long, url string, "
              "warc_date string, http_status int, mime string, "
              "digest string")


def cdx_records(media: DataFrame, compressed: bool = False) -> DataFrame:
    """One row per WARC *response* record with its exact byte extent
    inside the container — the raw material of a CDX capture index
    (what makes a 100 TB archive random-accessible: a reader fetches
    `length` bytes at `offset` instead of scanning the file).

    Extents are container-native: in the `.warc.gz` layout (one gzip
    member per record — the Common Crawl contract) offset/length are
    the member's compressed span, so a ranged GET + gunzip yields
    exactly one record; in the plain layout they span the record
    through its trailing CRLF CRLF.  Self-consistency (re-slicing the
    container at [offset, offset+length) re-parses to the same
    digest) is test-pinned, since no SQL oracle can see byte
    positions.  digest is md5 of the HTTP body (the repo-wide digest
    convention; Common Crawl ships SHA1-B32 — same role).

    Map-side only: the walk is mapInPandas over (media_id, payload);
    nothing shuffles, payloads never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "offset", "length", "url", "warc_date",
                "http_status", "mime", "digest"]
        for pdf in batches:
            out: dict = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if compressed:
                    spans = []           # (offset, length, record bytes)
                    for off, clen, unz in iter_gzip_members(raw):
                        spans.append((off, clen, unz))
                else:
                    recs = list(iter_warc_records(raw))
                    spans = []
                    for i, rec in enumerate(recs):
                        start = rec["offset"]
                        end = (recs[i + 1]["offset"]
                               if i + 1 < len(recs) else len(raw))
                        spans.append((start, end - start,
                                      raw[start:end]))
                for off, length, blob in spans:
                    for rec in iter_warc_records(blob):
                        h = rec["headers"]
                        if h.get("warc-type") != "response":
                            continue
                        msg = parse_http_message(rec["payload"])
                        out["media_id"].append(int(mid))
                        out["offset"].append(off)
                        out["length"].append(length)
                        out["url"].append(h.get("warc-target-uri", ""))
                        out["warc_date"].append(h.get("warc-date", ""))
                        out["http_status"].append(msg["status"])
                        out["mime"].append(
                            msg["headers"].get("content-type"))
                        out["digest"].append(
                            hashlib.md5(msg["body"]).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.array(out["media_id"], dtype="int64"),
                "offset": pd.array(out["offset"], dtype="int64"),
                "length": pd.array(out["length"], dtype="int64"),
                "url": out["url"],
                "warc_date": out["warc_date"],
                "http_status": pd.array(out["http_status"],
                                        dtype="int32"),
                "mime": out["mime"],
                "digest": out["digest"],
            })

    return media.mapInPandas(run, CDX_SCHEMA)


def surt_key(url_col) -> "F.Column":
    """SURT-form sort key for a URL column, pure JVM expressions:
    scheme dropped, host lowercased / www-stripped / default-port
    stripped, host labels REVERSED comma-joined, then `)` + path.
    `https://www.news.example.org:443/a/b?x=1` ->
    `org,example,news)/a/b?x=1`.  SURT order clusters captures of a
    registrable domain together — the property every CDX range scan
    ("give me */example.org/*") depends on."""
    col = url_col if not isinstance(url_col, str) else F.col(url_col)
    hostport = F.lower(F.regexp_extract(col, r"^[^:]+://([^/?#]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":(80|443)$", "")
    rest = F.lower(F.regexp_extract(col, r"^[^:]+://[^/?#]*([^#]*)", 1))
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        F.when(rest == "", F.lit("/")).otherwise(rest))


def cdx_index(media: DataFrame, compressed: bool = False) -> DataFrame:
    """The CDX(J) capture index over a set of WARC containers:
    (surt_key, ts, url, status, mime, digest, media_id, offset,
    length), one row per HTTP response capture.  ts is the 14-digit
    compaction of WARC-Date (Common Crawl's timestamp form).  Scan-
    shaped: the container walk is map-side and the key/ts columns are
    JVM projections — building the index over 100 TB of archives is
    one pass with zero shuffles; sorting/sharding is `cdx_shards`."""
    r = cdx_records(media, compressed=compressed)
    return r.select(
        surt_key(F.col("url")).alias("surt_key"),
        F.regexp_replace("warc_date", r"[^0-9]", "").alias("ts"),
        "url", "http_status", "mime", "digest",
        "media_id", "offset", "length")


def cdx_shards(cdx: DataFrame, n_shards: int = 8) -> DataFrame:
    """Total-order shard assembly: range-partition the index on
    (surt_key, ts) into n_shards, sort within each shard, and emit
    one line per capture tagged with its shard id and its rank inside
    the shard — exactly the layout of Common Crawl's sorted cdx-NNNNN
    shard files.  repartitionByRange + sortWithinPartitions is
    Spark's scalable total sort (sampled boundaries, no single-node
    sort); at 100 TB this is the same one-shuffle plan.  Shard
    boundary invariants (every shard internally sorted, max of shard
    k <= min of shard k+1, no captures lost) are test-pinned —
    boundaries come from range sampling, so they are layout, not
    semantics, and no value oracle covers them."""
    line = F.concat_ws(
        " ", "surt_key", "ts",
        F.to_json(F.struct("url", "http_status", "mime", "digest",
                           "media_id", "offset", "length")))
    ranked = (cdx
              .repartitionByRange(n_shards, "surt_key", "ts", "digest")
              .sortWithinPartitions("surt_key", "ts", "digest")
              .withColumn("shard", F.spark_partition_id())
              .withColumn("cdx_line", line))
    return ranked.select("shard", "surt_key", "ts", "cdx_line")


def cdx_secondary_index(shards: DataFrame) -> DataFrame:
    """zipnum-style cluster.idx over the shard table: per shard its
    first/last SURT key and capture count, plus an order-insensitive
    content digest (md5 of the sorted line list).  A query for one
    URL binary-searches THIS tiny table to pick the one shard file to
    range-read — the index of the index.  One shard-keyed agg with
    map-side partials; collect_list is bounded by shard size (an
    index line is ~200 bytes: a 4 GiB shard file is the operator's
    working set ceiling, same as Common Crawl's real shards)."""
    return (shards
            .groupBy("shard")
            .agg(F.min("surt_key").alias("first_key"),
                 F.max("surt_key").alias("last_key"),
                 F.count(F.lit(1)).alias("n_captures"),
                 F.md5(F.array_join(
                     F.sort_array(F.collect_list("cdx_line")), "\n"))
                 .alias("lines_md5"))
            .orderBy("shard"))


# ------------------------------------------------------------------
# sitemap.xml (frontier seeding — the pull side of crawl discovery)
# ------------------------------------------------------------------

def synth_sitemap_media(docs: DataFrame) -> DataFrame:
    """One sitemaps.org `urlset` document per host: every doc on the
    host lists pages 0..n_pages(d) INCLUSIVE — one page more than any
    crawl archive holds, so the sitemap always advertises exactly one
    uncrawled URL per doc (the frontier-seed lattice).  Entirely JVM:
    sequence-explode for the page fan-out, one host-keyed agg whose
    collect_list is sorted into deterministic (d, p) document order.
    lastmod is the WARC capture date of the doc (closed-form)."""
    base = docs.select(
        F.col("doc_id").alias("d"),
        (F.col("doc_id") % N_HOSTS).alias("host_id"),
        F.date_format(
            F.make_date(F.lit(2026), F.lit(1),
                        (F.col("doc_id") % 28 + 1).cast("int")),
            "yyyy-MM-dd").alias("lastmod"))
    entries = base.select(
        "host_id", "d",
        F.explode(F.sequence(
            F.lit(0), (F.lit(1) + F.col("d") % 3).cast("int"))).alias("p"),
        "lastmod")
    entry = F.concat(
        F.lit("<url><loc>https://example-"), "host_id",
        F.lit(".org/doc/"), "d", F.lit("/page/"), "p",
        F.lit("</loc><lastmod>"), "lastmod", F.lit("</lastmod></url>"))
    return (entries
            .select("host_id", F.struct("d", "p",
                                        entry.alias("e")).alias("s"))
            .groupBy("host_id")
            .agg(F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                      '<urlset xmlns="http://www.sitemaps.org/'
                      'schemas/sitemap/0.9">'),
                F.array_join(
                    F.transform(F.sort_array(F.collect_list("s")),
                                lambda s: s["e"]), ""),
                F.lit("</urlset>")).alias("sitemap_xml")))


def sitemap_urls(sitemaps: DataFrame,
                 xml_col: str = "sitemap_xml") -> DataFrame:
    """Parse `urlset` documents into (host, url, lastmod) rows: one
    regexp_extract_all explode per `<url>` block, then per-block field
    extraction — all whole-stage-codegen projections, no Python and
    no XML library in the hot path (the subset a crawler needs is
    regular).  Host is derived from the loc itself, so a sitemap
    advertising cross-host URLs still lands on the right shard key."""
    blocks = sitemaps.select(
        F.explode(F.expr(
            f"regexp_extract_all({xml_col}, '<url>(.*?)</url>', 1)"))
        .alias("block"))
    url = F.regexp_extract("block", r"<loc>([^<]*)</loc>", 1)
    return blocks.select(
        url.alias("url"),
        F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1).alias("host"),
        F.regexp_extract("block", r"<lastmod>([^<]*)</lastmod>", 1)
        .alias("lastmod"))


def frontier_seed(sm_urls: DataFrame, crawled: DataFrame,
                  crawled_url_col: str = "target_uri") -> DataFrame:
    """Sitemap-advertised URLs not yet captured: canonicalize both
    sides (url_normalize — case/port/dot-segment/query-order immune)
    and LEFT ANTI join on the canonical key.  The crawled side
    projects to one short column map-side before its shuffle; at
    100 TB both sides hash-partition on url_canon and the anti join
    is the only exchange.  Output feeds crawl_frontier_filter /
    politeness_schedule unchanged (same url/host columns)."""
    sm = url_normalize(sm_urls, "url")
    seen = (url_normalize(
        crawled.select(F.col(crawled_url_col).alias("url")), "url")
        .select("url_canon"))
    return (sm.join(seen, "url_canon", "left_anti")
            .select("url", "host", "lastmod"))


# ------------------------------------------------------------------
# curation: domain blocklist + host reputation
# ------------------------------------------------------------------

def blocklist_filter(pages: DataFrame, blocked: DataFrame,
                     url_col: str = "url", max_labels: int = 6,
                     annotate: bool = False) -> DataFrame:
    """UT1/RefinedWeb-style domain blocklist: drop (or, with
    ``annotate=True``, tag) pages whose URL host equals — or is a
    subdomain of — any domain in ``blocked`` (one ``domain`` column).

    Scale shape: NO explode of the page rows and NO shuffle of the
    pages side.  For each label depth k = 1..``max_labels`` the page's
    last-k-labels host suffix is a map-side projection, and the
    blocklist's exactly-k-label entries are a distinct broadcast dim —
    so the whole match is ``max_labels`` BroadcastHashJoins chained on
    the scan, each against a disjoint slice of the blocklist.  The
    longest (most specific) matching entry wins the ``blocked_by``
    tag.  Blocklist entries deeper than ``max_labels`` labels cannot
    match and are rejected loudly rather than silently ignored.
    """
    deep = blocked.where(
        F.size(F.split("domain", r"\.")) > max_labels).limit(1).count()
    if deep:
        raise ValueError(
            f"blocklist has entries deeper than {max_labels} labels; "
            "raise max_labels")
    parts = F.split(F.regexp_extract(F.col(url_col), HOST_RE, 1), r"\.")
    out = pages
    bcols: list[str] = []
    for k in range(1, max_labels + 1):
        bk = (blocked
              .where(F.size(F.split("domain", r"\.")) == k)
              .select(F.col("domain").alias(f"_b{k}"))
              .distinct())
        sfx = F.when(F.size(parts) >= k,
                     F.array_join(F.slice(parts, -k, k), "."))
        out = out.join(F.broadcast(bk),
                       sfx == F.col(f"_b{k}"), "left")
        bcols.append(f"_b{k}")
    blocked_by = F.coalesce(
        *[F.col(c) for c in reversed(bcols)])  # longest match wins
    if annotate:
        return out.select(*pages.columns, blocked_by.alias("blocked_by"))
    return out.where(blocked_by.isNull()).select(*pages.columns)


def host_reputation(page_quality: DataFrame, graph: DataFrame,
                    own_weight_pct: int = 50) -> DataFrame:
    """Host-level reputation for crawl curation: per-host page count
    and mean quality, smoothed ONE step along the host link graph —
    (host, n_pages, quality_micro, rep_micro) where

      quality_micro = floor(sum(page quality_micro) / n_pages)
      rep_micro     = floor((own*P + in-neighbour*(100-P)) / 100),

    the in-neighbour term being the link-weighted mean of the linking
    hosts' OWN quality (hosts nobody links to keep their own score).
    All arithmetic is BIGINT integral division (Spark ``div``), exact
    past 2^53 where a double round-trip would drift — so results are
    bit-identical at any parallelism on any engine.  ``quality_micro``
    must be non-negative (integral division of mixed signs differs
    across engines).

    Scale shape: one host-keyed agg over the pages (map-side partials;
    the only pass over data-scale rows), then dimension-on-dimension
    hash joins between the host table and the host graph — both
    already host-keyed, so AQE plans them without touching page rows
    again.  ``page_quality`` needs (host, quality_micro) columns."""
    if not 0 <= own_weight_pct <= 100:
        raise ValueError("own_weight_pct must be in [0, 100]")
    own = (page_quality.groupBy("host")
           .agg(F.count("*").cast("long").alias("n_pages"),
                F.expr("sum(quality_micro) div count(*)")
                .alias("quality_micro")))
    nbr = (graph
           .join(own.select(F.col("host").alias("src_host"),
                            F.col("quality_micro").alias("src_q")),
                 "src_host")
           .groupBy(F.col("dst_host").alias("host"))
           .agg(F.expr("sum(n_links * src_q) div sum(n_links)")
                .alias("nbr_q")))
    p = int(own_weight_pct)
    return (own.join(nbr, "host", "left")
            .select("host", "n_pages", "quality_micro",
                    F.when(F.col("nbr_q").isNull(), F.col("quality_micro"))
                    .otherwise(F.expr(
                        f"(quality_micro * {p} + nbr_q * {100 - p}) "
                        "div 100"))
                    .alias("rep_micro")))


def crawl_frontier_rep(pages: DataFrame, rules: DataFrame,
                       annotate: bool = False) -> DataFrame:
    """Full REP precedence frontier filter — Disallow AND Allow with
    longest-match-wins (Google's documented tiebreak: equal lengths
    favour Allow): a URL is blocked iff its longest matching Disallow
    prefix is strictly longer than its longest matching Allow prefix.
    `crawl_frontier_filter` remains the Disallow-only fast path.

    Scale shape: rules collapse to ONE row per host (collect_list of
    (directive, value) structs — robots files are tiny by protocol),
    broadcast-joined on host; both longest-match lengths are then
    map-side `aggregate` folds over the per-host rule array.  The
    pages side never shuffles and never explodes."""
    per_host = (rules
                .where(F.col("directive").isin("allow", "disallow")
                       & (F.col("value") != ""))
                .groupBy(F.col("host").alias("r_host"))
                .agg(F.collect_list(
                    F.struct("directive", "value")).alias("rls")))
    pg = (pages
          .withColumn("host", F.regexp_extract("target_uri", HOST_RE, 1))
          .withColumn("path", F.regexp_replace(
              "target_uri", r"^https?://[^/]+", "")))

    def longest(kind):
        return F.aggregate(
            F.filter(F.col("rls"),
                     lambda r: (r["directive"] == kind)
                     & F.col("path").startswith(r["value"])),
            F.lit(0),
            lambda acc, r: F.greatest(acc, F.length(r["value"])))

    out = (pg.join(F.broadcast(per_host),
                   pg["host"] == F.col("r_host"), "left")
           .withColumn("_dl", F.when(F.col("rls").isNotNull(),
                                     longest("disallow")).otherwise(0))
           .withColumn("_al", F.when(F.col("rls").isNotNull(),
                                     longest("allow")).otherwise(0)))
    blocked = F.col("_dl") > F.col("_al")
    cols = [c for c in pages.columns] + ["host", "path"]
    if annotate:
        return out.select(*cols, blocked.alias("blocked"),
                          F.col("_dl").alias("disallow_len"),
                          F.col("_al").alias("allow_len"))
    return out.where(~blocked).select(*cols)
