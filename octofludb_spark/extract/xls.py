"""Pure-stdlib Excel readers (no xlrd/openpyxl in the sandbox).

The reference ingests GISAID metadata from binary Excel via
``pd.read_excel`` + per-cell ``strOrNone`` (reference:
octofludb/classes.py:258-268; CI fixture test-data/gisaid.xls diffed
against .exp-gisaid.ttl, test-data/Makefile:4-7).  This module
re-implements just enough of both container formats to reproduce that
behavior bit-for-bit on the reference's own fixture:

  * ``.xls``  — OLE2/CFB compound file + BIFF8 worksheet records
    (SST/LABELSST/RK/NUMBER/LABEL/MULRK, with CONTINUE handling).
  * ``.xlsx`` — ZIP + SpreadsheetML (sharedStrings / inlineStr / v).
  * ``write_xlsx`` — a minimal SpreadsheetML writer for test fixtures
    and round-trip tests.

Everything returns rows of ``Optional[str]`` cells: strings verbatim;
numbers via ``_num_to_str`` (int-valued floats render without the
trailing '.0' only when the cell count says integer — mirroring
``str()`` on what pandas would hand back); empty cells None.
"""

from __future__ import annotations

import io
import math
import re
import struct
import zipfile
from typing import Optional
from xml.etree import ElementTree as ET

# --------------------------------------------------------------------------
# OLE2 / CFB container
# --------------------------------------------------------------------------

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


def _read_chain(data: bytes, fat: list[int], start: int,
                sec_size: int) -> bytes:
    # MS-CFB: sector N begins at (N+1)*sector_size — the 512-byte
    # header occupies "sector -1", so the +1 holds for BOTH 512-byte
    # (version 3) and 4096-byte (version 4) sector sizes.
    out = []
    sid = start
    seen = 0
    while sid not in (_ENDCHAIN, _FREE) and seen <= len(fat):
        pos = (sid + 1) * sec_size
        out.append(data[pos:pos + sec_size])
        sid = fat[sid]
        seen += 1
    return b"".join(out)


def cfb_stream(data: bytes, names: tuple[str, ...] = ("Workbook", "Book")) -> bytes:
    """Extract a named stream from an OLE2 compound file."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file")
    sec_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    sec_size, mini_size = 1 << sec_shift, 1 << mini_shift
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    difat = list(struct.unpack_from("<109I", data, 76))
    sid = difat_start
    for _ in range(n_difat):
        pos = (sid + 1) * sec_size
        ids = struct.unpack_from(f"<{sec_size // 4}I", data, pos)
        difat.extend(ids[:-1])
        sid = ids[-1]
    fat: list[int] = []
    for fsid in difat[:n_fat]:
        if fsid in (_FREE, _ENDCHAIN):
            continue
        fat.extend(struct.unpack_from(f"<{sec_size // 4}I", data,
                                      (fsid + 1) * sec_size))

    directory = _read_chain(data, fat, dir_start, sec_size)
    root_start = None
    target = None
    for off in range(0, len(directory), 128):
        ent = directory[off:off + 128]
        if len(ent) < 128:
            break
        cb = struct.unpack_from("<H", ent, 64)[0]
        name = ent[:max(cb - 2, 0)].decode("utf-16-le", "ignore")
        typ = ent[66]
        start = struct.unpack_from("<I", ent, 116)[0]
        size = struct.unpack_from("<I", ent, 120)[0]
        if typ == 5:  # root: mini-stream lives in its chain
            root_start = start
        if typ == 2 and name in names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"stream {names} not found")
    start, size = target
    if size >= mini_cutoff:
        return _read_chain(data, fat, start, sec_size)[:size]
    # small stream: walk the mini-FAT inside the root mini-stream
    minifat = []
    sid = minifat_start
    while sid not in (_ENDCHAIN, _FREE):
        minifat.extend(struct.unpack_from(f"<{sec_size // 4}I", data,
                                          (sid + 1) * sec_size))
        sid = fat[sid]
    mini_stream = _read_chain(data, fat, root_start, sec_size)
    out = []
    sid = start
    while sid not in (_ENDCHAIN, _FREE):
        out.append(mini_stream[sid * mini_size:(sid + 1) * mini_size])
        sid = minifat[sid]
    return b"".join(out)[:size]


# --------------------------------------------------------------------------
# BIFF8 records
# --------------------------------------------------------------------------

class _Records:
    """Iterator over (id, payload, continues[]) BIFF records."""

    def __init__(self, stream: bytes):
        self.stream = stream
        self.pos = 0

    def __iter__(self):
        n = len(self.stream)
        while self.pos + 4 <= n:
            rid, ln = struct.unpack_from("<HH", self.stream, self.pos)
            payload = self.stream[self.pos + 4:self.pos + 4 + ln]
            self.pos += 4 + ln
            yield rid, payload


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """Shared string table, with CONTINUE-spanning unicode strings."""
    chunks = [payload] + continues
    ci = 0  # chunk index
    off = 8  # skip cstTotal/cstUnique
    n_unique = struct.unpack_from("<I", payload, 4)[0]

    def need(nbytes: int) -> bytes:
        """Read nbytes across chunk boundaries (plain bytes)."""
        nonlocal ci, off
        out = b""
        while nbytes:
            if off >= len(chunks[ci]):
                ci += 1
                off = 0
                continue
            take = min(nbytes, len(chunks[ci]) - off)
            out += chunks[ci][off:off + take]
            off += take
            nbytes -= take
        return out

    def at_boundary() -> bool:
        return off >= len(chunks[ci])

    strings: list[str] = []
    for _ in range(n_unique):
        if at_boundary():
            ci += 1
            off = 0
        cch = struct.unpack("<H", need(2))[0]
        grbit = need(1)[0]
        c_run = struct.unpack("<H", need(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<I", need(4))[0] if grbit & 0x04 else 0
        remaining = cch
        text = ""
        high = grbit & 0x01
        while remaining:
            if at_boundary():
                # a string continuing into a CONTINUE record restates
                # the encoding flag as its first byte
                ci += 1
                off = 0
                high = need(1)[0] & 0x01
            avail = len(chunks[ci]) - off
            if high:
                take = min(remaining, avail // 2)
                text += need(take * 2).decode("utf-16-le", "replace")
            else:
                take = min(remaining, avail)
                text += need(take).decode("latin-1")
            if take == 0:  # defensive: avoid an infinite loop
                ci += 1
                off = 0
                high = need(1)[0] & 0x01 if remaining else high
                continue
            remaining -= take
        need(4 * c_run)
        need(cb_ext)
        strings.append(text)
    return strings


def _rk_value(rk: int) -> float:
    div100 = rk & 0x01
    is_int = rk & 0x02
    if is_int:
        v = float(rk >> 2 if rk >= 0 else -((-rk) >> 2))
        if rk & 0x80000000:  # sign via 30-bit two's complement
            v = float(struct.unpack("<i", struct.pack("<I", rk))[0] >> 2)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00"
                          + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if div100 else v


def _num_to_str(v: float) -> str:
    """Mirror str() of what pandas hands back for a numeric cell: an
    int-valued float renders as an int (pandas infers int64 columns),
    otherwise the float repr.  NaN/Infinity cells (writable in BIFF8
    NUMBER records) must not kill the whole sheet parse — render as
    their repr like pandas would."""
    if math.isfinite(v) and v == int(v):
        return str(int(v))
    return repr(v)


def parse_xls(data: bytes) -> list[list[Optional[str]]]:
    """First worksheet of a BIFF8 .xls as rows of Optional[str]."""
    stream = cfb_stream(data)
    # pass 1: collect SST (with CONTINUEs) and first BOUNDSHEET offset
    sst: list[str] = []
    sheet_offsets: list[int] = []
    recs = list(_Records(stream))
    i = 0
    while i < len(recs):
        rid, payload = recs[i]
        if rid == 0x00FC:  # SST
            conts = []
            j = i + 1
            while j < len(recs) and recs[j][0] == 0x003C:
                conts.append(recs[j][1])
                j += 1
            sst = _parse_sst(payload, conts)
            i = j
            continue
        if rid == 0x0085:  # BOUNDSHEET
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        i += 1
    if not sheet_offsets:
        raise ValueError("no worksheet in BIFF stream")
    # pass 2: first sheet substream
    cells: dict[tuple[int, int], Optional[str]] = {}
    pos = sheet_offsets[0]
    depth = 0
    r = _Records(stream[pos:])
    for rid, payload in r:
        if rid == 0x0809:  # BOF
            depth += 1
        elif rid == 0x000A:  # EOF
            depth -= 1
            if depth <= 0:
                break
        elif rid == 0x00FD:  # LABELSST
            row, col, _, isst = struct.unpack_from("<HHHI", payload)
            cells[(row, col)] = sst[isst]
        elif rid == 0x0203:  # NUMBER
            row, col, _ = struct.unpack_from("<HHH", payload)
            cells[(row, col)] = _num_to_str(
                struct.unpack_from("<d", payload, 6)[0])
        elif rid == 0x027E:  # RK
            row, col, _, rk = struct.unpack_from("<HHHI", payload)
            cells[(row, col)] = _num_to_str(_rk_value(rk))
        elif rid == 0x00BD:  # MULRK
            row, col0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for k in range(n):
                rk = struct.unpack_from("<I", payload, 4 + 6 * k + 2)[0]
                cells[(row, col0 + k)] = _num_to_str(_rk_value(rk))
        elif rid == 0x0204:  # LABEL (inline, pre-SST)
            row, col, _, cch, grbit = struct.unpack_from("<HHHHB", payload)
            raw = payload[9:]
            cells[(row, col)] = (
                raw[:cch * 2].decode("utf-16-le", "replace")
                if grbit & 1 else raw[:cch].decode("latin-1"))
    if not cells:
        return []
    n_rows = max(rc[0] for rc in cells) + 1
    n_cols = max(rc[1] for rc in cells) + 1
    return [[cells.get((ri, ci)) for ci in range(n_cols)]
            for ri in range(n_rows)]


# --------------------------------------------------------------------------
# xlsx (SpreadsheetML)
# --------------------------------------------------------------------------

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_COL_RE = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    m = _COL_RE.match(ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def parse_xlsx(data: bytes) -> list[list[Optional[str]]]:
    """First worksheet of an .xlsx as rows of Optional[str]."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    sheet_name = sorted(n for n in zf.namelist()
                        if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n))[0]
    root = ET.fromstring(zf.read(sheet_name))
    cells: dict[tuple[int, int], Optional[str]] = {}
    for ri, row in enumerate(root.iter(f"{_NS}row")):
        rno = int(row.get("r", ri + 1)) - 1
        for ci, c in enumerate(row.findall(f"{_NS}c")):
            ref = c.get("r")
            cno = _col_index(ref) if ref else ci
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                v = "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t"))
            else:
                v_el = c.find(f"{_NS}v")
                if v_el is None or v_el.text is None:
                    continue
                if t == "s":
                    v = shared[int(v_el.text)]
                elif t == "str":
                    v = v_el.text
                else:
                    v = _num_to_str(float(v_el.text))
            cells[(rno, cno)] = v
    if not cells:
        return []
    n_rows = max(rc[0] for rc in cells) + 1
    n_cols = max(rc[1] for rc in cells) + 1
    return [[cells.get((ri, ci)) for ci in range(n_cols)]
            for ri in range(n_rows)]


def write_xlsx(rows: list[list[Optional[str]]]) -> bytes:
    """Minimal SpreadsheetML writer (inline strings) for fixtures."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;"))

    body = []
    for ri, row in enumerate(rows, 1):
        cs = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            col = ""
            n = ci + 1
            while n:
                n, rem = divmod(n - 1, 26)
                col = chr(65 + rem) + col
            cs.append(f'<c r="{col}{ri}" t="inlineStr"><is><t'
                      f' xml:space="preserve">{esc(str(v))}</t></is></c>')
        body.append(f'<row r="{ri}">{"".join(cs)}</row>')
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(body) + "</sheetData></worksheet>")
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" xmlns:r="http://schemas.'
          'openxmlformats.org/officeDocument/2006/relationships">'
          '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/>'
          '</sheets></workbook>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships"><Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/'
            '2006/relationships/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>')
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.'
                 'org/package/2006/relationships"><Relationship '
                 'Id="rId1" Type="http://schemas.openxmlformats.org/'
                 'officeDocument/2006/relationships/officeDocument" '
                 'Target="xl/workbook.xml"/></Relationships>')
    types = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<Types xmlns="http://schemas.openxmlformats.org/package/'
             '2006/content-types"><Default Extension="rels" ContentType='
             '"application/vnd.openxmlformats-package.relationships+xml"/>'
             '<Default Extension="xml" ContentType="application/xml"/>'
             '<Override PartName="/xl/workbook.xml" ContentType='
             '"application/vnd.openxmlformats-officedocument.'
             'spreadsheetml.sheet.main+xml"/>'
             '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
             '"application/vnd.openxmlformats-officedocument.'
             'spreadsheetml.worksheet+xml"/></Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def parse_excel(data: bytes) -> list[list[Optional[str]]]:
    """Dispatch on magic bytes: OLE2 .xls or ZIP .xlsx."""
    if data[:8] == _CFB_MAGIC:
        return parse_xls(data)
    if data[:2] == b"PK":
        return parse_xlsx(data)
    raise ValueError("neither .xls (OLE2) nor .xlsx (ZIP) magic")


def excel_columns(data: bytes) -> dict[str, list[Optional[str]]]:
    """Header-keyed columns for the GISAID path, mirroring mk_gis's
    read shape (recipes.py:158: pd.read_excel keep_default_na=False):
    empty and missing cells are EMPTY STRINGS, never None — an empty
    Segment_Id cell must still be processed (its '' splits to [''],
    so a bare INSDC genbank id anchors the segment)."""
    rows = parse_excel(data)
    if not rows:
        return {}
    header = [("" if h is None else str(h).strip()) for h in rows[0]]
    return {
        h: [("" if (len(r) <= i or r[i] is None) else r[i])
            for r in rows[1:]]
        for i, h in enumerate(header) if h
    }
