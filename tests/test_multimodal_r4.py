"""Round-4 multimodal additions: mp4 (ISO BMFF) box codec, integer
audio features over real PCM decode, perceptual dHash + banded
near-dup pairs.  Pure-python paths fuzz against transparent replays;
Spark paths assert the distributed shape and cross-check a sample."""

import random
import struct

import pytest

pytestmark = pytest.mark.core

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- mp4

def test_mp4_roundtrip_sweep():
    from octofludb_spark.scale.multimodal import decode_mp4_info, synth_mp4

    rng = random.Random(41)
    for _ in range(40):
        w = rng.randrange(16, 4096, 2)
        h = rng.randrange(16, 2160, 2)
        nf = rng.randrange(1, 2000)
        ts = rng.randrange(100, 90000)
        fd = rng.randrange(1, 4000)
        b = synth_mp4(w, h, nf, ts, fd, seed=rng.randrange(1 << 30))
        i = decode_mp4_info(b)
        assert (i["width"], i["height"], i["n_frames"]) == (w, h, nf)
        assert (i["timescale"], i["duration"]) == (ts, nf * fd)
        assert i["duration_ms"] == nf * fd * 1000 // ts
        assert i["media_timescale"] == ts and i["handler"] == "vide"


def test_mp4_sniff_and_header():
    from octofludb_spark.scale.multimodal import (decode_header, sniff_format,
                                                  synth_mp4)

    b = synth_mp4(320, 240, 12, 600, 25)
    assert sniff_format(b) == "mp4"
    meta = decode_header(b)
    assert meta == {"format": "mp4", "width": 320, "height": 240,
                    "n_frames": 12}


def test_mp4_largesize_and_unknown_boxes():
    """The walker must skip unknown boxes and honour 64-bit
    largesize framing."""
    from octofludb_spark.scale.multimodal import decode_mp4_info, synth_mp4

    b = synth_mp4(64, 48, 3, 600, 25)
    free = struct.pack(">I", 16) + b"free" + b"\0" * 8
    # wrap the free payload in a largesize box too
    big = (struct.pack(">I", 1) + b"skip" + struct.pack(">Q", 24)
           + b"\0" * 8)
    # insert after ftyp (24 bytes) — stco offset shifts, but we only
    # read metadata here
    out = b[:24] + free + big + b[24:]
    i = decode_mp4_info(out)
    assert (i["width"], i["height"], i["n_frames"]) == (64, 48, 3)


def test_mp4_truncation_raises():
    from octofludb_spark.scale.multimodal import decode_mp4_info, synth_mp4

    b = synth_mp4(64, 48, 3)
    with pytest.raises(ValueError):
        decode_mp4_info(b[: len(b) // 2])
    with pytest.raises(ValueError):
        decode_mp4_info(b"\0\0\0\x08abcd")  # no ftyp


def test_mp4_stsz_cross_check():
    """A corrupted stsz sample count must be rejected, not ignored."""
    from octofludb_spark.scale.multimodal import decode_mp4_info, synth_mp4

    b = bytearray(synth_mp4(64, 48, 7, 600, 25))
    at = bytes(b).find(b"stsz")
    # sample_count field sits 12 bytes after the type (verflags 4 +
    # sample_size 4 -> count)
    struct.pack_into(">I", b, at + 12, 99)
    with pytest.raises(ValueError, match="stsz"):
        decode_mp4_info(bytes(b))


# --------------------------------------------------- audio features

def test_audio_features_vs_python_replay(spark):
    """Distributed features == a transparent per-clip python replay
    (sign-change definition, de-interleaving, int64 sums)."""
    from octofludb_spark.scale.multimodal import audio_features, synth_media

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    rows = {r["media_id"]: r for r in
            audio_features(synth_media(docs)).collect()}
    checked = 0
    for r in docs.select("doc_id").collect():
        mid = int(r[0])
        if mid % 3 != 1:
            continue
        nch = 1 + mid % 2
        n = (100 + mid % 900) * nch
        s = [(mid + j) % 256 - 128 for j in range(n)]
        zc = 0
        for c in range(nch):
            ch = s[c::nch]
            zc += sum((a < 0) != (b < 0) for a, b in zip(ch, ch[1:]))
        got = rows[mid]
        assert got["zero_crossings"] == zc
        assert got["energy"] == sum(v * v for v in s)
        assert got["peak_abs"] == max(abs(v) for v in s)
        assert got["dc_sum"] == sum(s)
        checked += 1
    assert checked >= 30


# ------------------------------------------------- perceptual dHash

def _replay_dhash(g, w, h, pixel):
    sums = [[0] * 9 for _ in range(8)]
    widths = [0] * 9
    for x in range(w):
        widths[(x * 9) // w] += 1
    for y in range(h):
        for x in range(w):
            sums[(y * 8) // h][(x * 9) // w] += pixel(x, y)
    hi = lo = 0
    for j in range(8):
        for i in range(8):
            if sums[j][i + 1] * widths[i] > sums[j][i] * widths[i + 1]:
                k = j * 8 + i
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
    return hi, lo


def test_dhash_vs_python_replay_fuzz():
    """dhash_pixels over REAL decoded PNGs (random pixels, gray and
    RGB) == the transparent quadratic-time replay."""
    from octofludb_spark.scale.multimodal import (decode_pixels,
                                                  dhash_pixels, synth_png)

    rng = random.Random(7)
    for trial in range(25):
        w, h = rng.randrange(9, 60), rng.randrange(8, 60)
        grid = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        png = synth_png(w, h, lambda x, y: grid[y][x])
        got = dhash_pixels(decode_pixels(png))
        assert got == _replay_dhash(None, w, h, lambda x, y: grid[y][x])


def test_dhash_identical_and_perturbed():
    from octofludb_spark.scale.multimodal import (decode_pixels,
                                                  dhash_pixels, synth_png)

    base = lambda x, y: (5 * x * x + 3 * y * y + x * y) % 256
    a = dhash_pixels(decode_pixels(synth_png(33, 31, base)))
    b = dhash_pixels(decode_pixels(synth_png(33, 31, base)))
    assert a == b
    # brightness shift is NOT identity-preserving for raw sums, but a
    # single-pixel perturbation must stay within a few bits
    pert = lambda x, y: 255 if (x, y) == (4, 4) else base(x, y)
    c = dhash_pixels(decode_pixels(synth_png(33, 31, pert)))
    d = (bin(a[0] ^ c[0]).count("1") + bin(a[1] ^ c[1]).count("1"))
    assert d <= 4


def test_dhash_small_image_rejected():
    from octofludb_spark.scale.multimodal import (decode_pixels,
                                                  dhash_pixels, synth_png)

    with pytest.raises(ValueError, match="dhash"):
        dhash_pixels(decode_pixels(synth_png(8, 8, lambda x, y: x)))


def test_dhash_near_pairs_matches_brute_force(spark):
    """Band-join candidate generation is LOSSLESS: pairs == the
    brute-force O(n^2) hamming filter, for several thresholds."""
    from octofludb_spark.scale.multimodal import (dhash_near_pairs,
                                                  image_dhash,
                                                  synth_patterned_media)

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    hashes = image_dhash(synth_patterned_media(docs)).collect()
    hs = {r["media_id"]: (r["hash_hi"] << 32) | r["hash_lo"]
          for r in hashes}
    ids = sorted(hs)
    for k in (0, 3, 7):
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
               dhash_near_pairs(
                   image_dhash(synth_patterned_media(docs)),
                   max_hamming=k).collect()}
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                d = bin(hs[a] ^ hs[b]).count("1")
                if d <= k:
                    want[(a, b)] = d
        assert got == want, f"k={k}: {len(got)} vs {len(want)}"


def test_dhash_spark_plan_no_nlj(spark):
    """The near-dup join must be hash-partitioned equi joins — never a
    nested-loop / cartesian candidate generation."""
    from octofludb_spark.scale.multimodal import (dhash_near_pairs,
                                                  image_dhash,
                                                  synth_patterned_media)

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    df = dhash_near_pairs(image_dhash(synth_patterned_media(docs)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ------------------------------------------------------- mp4 demux

def _manual_mp4(chunks, sizes, fixed=0):
    """Hand-build an mp4 whose sample data lives in MULTIPLE chunks
    (synth_mp4 always writes one): ``chunks`` is a list of
    (samples_per_chunk, payload_bytes)."""
    from octofludb_spark.scale.multimodal import _box, _full_box, synth_mp4

    ftyp = synth_mp4(16, 16, 1, 600, 25)[:24]  # a valid ftyp box
    stsc_runs, prev = [], None
    for ci, (spc, _) in enumerate(chunks, start=1):
        if spc != prev:
            stsc_runs.append((ci, spc))
            prev = spc
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs))
                     + b"".join(struct.pack(">III", fc, spc, 1)
                                for fc, spc in stsc_runs))
    if fixed:
        stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", fixed,
                                                    len(sizes)))
    else:
        stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, len(sizes))
                         + b"".join(struct.pack(">I", s) for s in sizes))

    def build(offsets):
        stco = _full_box(b"stco", 0, 0, struct.pack(">I", len(chunks))
                         + b"".join(struct.pack(">I", o)
                                    for o in offsets))
        moov = _box(b"moov", _box(b"stbl", stsc + stsz + stco))
        return ftyp + moov

    # stco size is fixed (4 bytes per chunk), so one probe pass with
    # zero offsets sizes the header, then the real offsets are exact
    head_len = len(build([0] * len(chunks)))
    offsets, pos = [], head_len + 8  # first mdat payload byte
    for _, payload in chunks:
        offsets.append(pos)
        pos += len(payload)
    return build(offsets) + _box(b"mdat", b"".join(p for _, p in chunks))


def test_mp4_demux_multichunk_and_fixed_size():
    from octofludb_spark.scale.multimodal import demux_mp4_samples

    # chunk 1: two 3-byte samples; chunk 2: one 4-byte sample
    b = _manual_mp4([(2, b"AAABBB"), (1, b"CCCC")], [3, 3, 4])
    assert demux_mp4_samples(b) == [b"AAA", b"BBB", b"CCCC"]
    # fixed-size stsz path
    b = _manual_mp4([(2, b"XXYY"), (2, b"ZZWW")], [2, 2, 2, 2], fixed=2)
    assert demux_mp4_samples(b) == [b"XX", b"YY", b"ZZ", b"WW"]


def test_mp4_demux_inconsistent_table_raises():
    from octofludb_spark.scale.multimodal import demux_mp4_samples

    # stsz declares 5 samples but chunks only place 3
    b = _manual_mp4([(2, b"AAABBB"), (1, b"CCCC")], [3, 3, 4, 1, 1])
    with pytest.raises(ValueError, match="inconsistent"):
        demux_mp4_samples(b)


def test_mp4_demux_synth_roundtrip():
    from octofludb_spark.scale.multimodal import (demux_mp4_samples,
                                                  synth_mp4)

    for nf, seed in [(1, 0), (31, 5), (240, 1234)]:
        ss = demux_mp4_samples(synth_mp4(160, 90, nf, 600, 25, seed=seed))
        assert len(ss) == nf
        assert all(s == struct.pack(">I", (seed + i) & 0xFFFFFFFF)
                   for i, s in enumerate(ss))


# --------------------------------------------------- color JPEG

def _mcu_color(mid, mx, my):
    return ((mid + 7 * mx + 13 * my) % 256,
            (mid * 3 + 11 * mx + 5 * my) % 256,
            (mid * 5 + 3 * mx + 17 * my) % 256)


def test_jpeg_color_mcu_constant_exact():
    """MCU-constant color images survive the 4:2:0 codec EXACTLY at
    the integer-YCbCr projection of the input color."""
    import numpy as np

    from octofludb_spark.scale.multimodal import (decode_jpeg_pixels,
                                                  rgb_to_ycbcr_int,
                                                  synth_jpeg_color,
                                                  ycbcr_to_rgb_int)

    for mid in (0, 13, 77, 200, 255):
        w, h = 16 * (1 + mid % 4), 16 * (1 + (mid * 3) % 4)
        fn = lambda x, y, m=mid: _mcu_color(m, x // 16, y // 16)
        d = decode_jpeg_pixels(synth_jpeg_color(w, h, fn))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        px = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3)
        for my in range(h // 16):
            for mx in range(w // 16):
                want = ycbcr_to_rgb_int(
                    *rgb_to_ycbcr_int(*_mcu_color(mid, mx, my)))
                blk = px[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
                assert (blk == want).all(), (mid, mx, my)


def test_jpeg_color_444_and_420_bounded_error():
    import numpy as np

    from octofludb_spark.scale.multimodal import (decode_jpeg_pixels,
                                                  synth_jpeg_color)

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24, 3))
    fn = lambda x, y: tuple(int(v) for v in img[y, x])
    d = decode_jpeg_pixels(synth_jpeg_color(24, 16, fn, subsample=False))
    px = np.frombuffer(d["pixels"], np.uint8).reshape(16, 24, 3).astype(int)
    # 4:4:4 stays within DCT quantization error on pure noise
    assert np.abs(px - img).max() <= 48
    # for 4:2:0, use a chroma-aligned image (2x2-constant cells) so
    # the subsample is lossless and the same bound applies
    img2 = np.repeat(np.repeat(rng.integers(0, 256, (8, 12, 3)),
                               2, axis=0), 2, axis=1)
    fn2 = lambda x, y: tuple(int(v) for v in img2[y, x])
    d = decode_jpeg_pixels(synth_jpeg_color(24, 16, fn2, subsample=True))
    px = np.frombuffer(d["pixels"], np.uint8).reshape(16, 24, 3).astype(int)
    assert np.abs(px - img2).max() <= 48


def test_jpeg_color_odd_size_crop_and_gray_compat():
    from octofludb_spark.scale.multimodal import (decode_jpeg_pixels,
                                                  synth_jpeg,
                                                  synth_jpeg_color)

    d = decode_jpeg_pixels(synth_jpeg_color(
        37, 21, lambda x, y: (x % 256, y % 256, (x + y) % 256)))
    assert (d["width"], d["height"], d["channels"]) == (37, 21, 3)
    g = decode_jpeg_pixels(synth_jpeg(40, 24, lambda x, y: (x + y) % 256))
    assert g["channels"] == 1


def test_ycbcr_int_transforms_pinned():
    """The fixed-point transforms the oracle replays — pin a few
    values so a coefficient change cannot slip through silently."""
    from octofludb_spark.scale.multimodal import (rgb_to_ycbcr_int,
                                                  ycbcr_to_rgb_int)

    assert rgb_to_ycbcr_int(0, 0, 0) == (0, 128, 128)
    assert rgb_to_ycbcr_int(255, 255, 255) == (255, 128, 128)
    assert ycbcr_to_rgb_int(128, 128, 128) == (128, 128, 128)
    assert rgb_to_ycbcr_int(255, 0, 0) == (76, 85, 255)
    assert ycbcr_to_rgb_int(76, 85, 255) == (254, 0, 0)


# ------------------------------------- restart intervals + WAV depths

def test_jpeg_restart_intervals_decode_identical():
    """DRI/RSTn handling: a file with restart markers decodes to the
    SAME pixels as the same image without them (predictors reset and
    byte alignment honoured at every boundary)."""
    import numpy as np

    from octofludb_spark.scale.multimodal import (decode_jpeg_pixels,
                                                  synth_jpeg_color)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 48, 3))
    fn = lambda x, y: tuple(int(v) for v in img[y, x])
    plain = decode_jpeg_pixels(synth_jpeg_color(48, 32, fn))
    for ri in (1, 2, 5):
        assert decode_jpeg_pixels(
            synth_jpeg_color(48, 32, fn, restart_interval=ri)) == plain


def test_jpeg_missing_rst_marker_rejected():
    from octofludb_spark.scale.multimodal import (decode_jpeg_pixels,
                                                  synth_jpeg_color)

    b = bytearray(synth_jpeg_color(48, 32, restart_interval=2))
    at = bytes(b).find(b"\xff\xd0")  # first RST0
    b[at + 1] = 0xD4  # wrong restart ordinal
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg_pixels(bytes(b))


def test_wav_bit_depths_roundtrip():
    from octofludb_spark.scale.multimodal import (decode_wav_samples,
                                                  synth_wav)

    for bits, lo, hi in [(8, -128, 127), (16, -32768, 32767),
                         (24, -(1 << 23), (1 << 23) - 1),
                         (32, -(1 << 31), (1 << 31) - 1)]:
        vals = [lo, hi, 0, -1, 1, lo // 3, hi // 7]
        d = decode_wav_samples(synth_wav(1, 8000, len(vals),
                                         lambda j: vals[j], bits=bits))
        assert d["bits"] == bits and list(d["samples"]) == vals


def test_wav_float_pcm_rejected():
    from octofludb_spark.scale.multimodal import (decode_wav_samples,
                                                  synth_wav)

    b = bytearray(synth_wav(1, 8000, 4, bits=32))
    at = bytes(b).find(b"fmt ") + 8
    struct.pack_into("<H", b, at, 3)  # fmt tag 3 = IEEE float
    with pytest.raises(NotImplementedError, match="fmt tag 3"):
        decode_wav_samples(bytes(b))


# ------------------------------------------- interlaced PNG and GIF

def test_adam7_png_equals_plain():
    """Real Adam7 files (seven independently-filtered passes, filters
    cycling within each pass) decode pixel-identical to the plain
    encoding — including widths/heights below one pass cell."""
    from octofludb_spark.scale.multimodal import (decode_png_pixels,
                                                  synth_png)

    rng = random.Random(9)
    for _ in range(30):
        w, h = rng.randrange(1, 40), rng.randrange(1, 40)
        grid = [[rng.randrange(256) for _ in range(w)]
                for _ in range(h)]
        fn = lambda x, y: grid[y][x]
        assert (decode_png_pixels(synth_png(w, h, fn, interlace=True))
                == decode_png_pixels(synth_png(w, h, fn)))


def test_interlaced_gif_equals_plain():
    from octofludb_spark.scale.multimodal import (decode_gif_pixels,
                                                  synth_gif)

    rng = random.Random(10)
    for _ in range(15):
        w = rng.randrange(1, 30)
        h = rng.randrange(1, 30)
        nf = rng.randrange(1, 4)
        fn = lambda x, y, f: (x + y + f) % 2
        assert (decode_gif_pixels(synth_gif(w, h, nf, fn,
                                            interlace=True))
                == decode_gif_pixels(synth_gif(w, h, nf, fn)))


# ---------------------------------------------------------------------------
# AVI (RIFF) MJPEG: writer/demuxer/frame pixel decode
# ---------------------------------------------------------------------------


def _avi_frames(n, w=32, h=16, seed=0):
    from octofludb_spark.scale.multimodal import synth_jpeg_color

    return [synth_jpeg_color(w, h, lambda x, y, f=f: (
        (seed + 29 * f + 7 * (x // 16)) % 256,
        (seed * 3 + 23 * f) % 256,
        (seed * 5 + 19 * f + 17 * (y // 16)) % 256)) for f in range(n)]


def test_avi_roundtrip_sweep():
    from octofludb_spark.scale.multimodal import demux_avi, synth_avi

    rnd = random.Random(11)
    for _ in range(20):
        nf = rnd.randint(1, 7)
        w, h = 16 * rnd.randint(1, 3), 16 * rnd.randint(1, 3)
        frames = _avi_frames(nf, w, h, seed=rnd.randint(0, 255))
        d = demux_avi(synth_avi(w, h, frames, us_per_frame=40000))
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, nf)
        assert d["handler"] == "MJPG"
        assert d["frames"] == frames


def test_avi_odd_sized_frame_word_alignment():
    # a frame with an odd byte length forces the RIFF pad byte; the
    # demuxer must still walk past it and slice the exact payload
    from octofludb_spark.scale.multimodal import demux_avi, synth_avi

    frames = _avi_frames(3)
    frames[1] = frames[1] + b"\x00"  # JPEG decoders ignore trailing pad
    if len(frames[1]) % 2 == 0:
        frames[1] += b"\x00"
    assert len(frames[1]) % 2 == 1
    d = demux_avi(synth_avi(32, 16, frames))
    assert d["frames"] == frames


def test_avi_corruption_raises():
    from octofludb_spark.scale.multimodal import demux_avi, synth_avi

    avi = synth_avi(32, 16, _avi_frames(2))
    with pytest.raises(ValueError):
        demux_avi(avi[:40])  # truncated
    bad = bytearray(avi)
    i = avi.index(b"avih")
    bad[i + 8 + 16:i + 8 + 20] = struct.pack("<I", 99)  # lie: totalFrames
    with pytest.raises(ValueError):
        demux_avi(bytes(bad))
    bad = bytearray(avi)
    i = avi.index(b"idx1")
    bad[i + 8 + 8:i + 8 + 12] = struct.pack("<I", 12345)  # lie: idx offset
    with pytest.raises(ValueError):
        demux_avi(bytes(bad))
    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x04\x00\x00\x00WAVE")  # wrong form type


def test_avi_frame_pixels_exact():
    # MCU-constant colors survive the MJPEG path exactly: decode each
    # demuxed frame and compare every pixel to the integer YCbCr
    # round-trip of the source color.
    import numpy as np

    from octofludb_spark.scale.multimodal import (
        decode_jpeg_pixels, demux_avi, rgb_to_ycbcr_int, synth_avi,
        ycbcr_to_rgb_int)

    frames = _avi_frames(4, w=16, h=16, seed=9)
    d = demux_avi(synth_avi(16, 16, frames))
    for f, payload in enumerate(d["frames"]):
        px = decode_jpeg_pixels(payload)
        arr = np.frombuffer(px["pixels"], np.uint8).reshape(16, 16, 3)
        src = ((9 + 29 * f) % 256, (27 + 23 * f) % 256,
               (45 + 19 * f) % 256)
        exp = ycbcr_to_rgb_int(*rgb_to_ycbcr_int(*src))
        assert (arr == np.array(exp, np.uint8)).all()


def test_avi_spark_frame_sums(spark):
    from pyspark.sql import functions as F

    from octofludb_spark.scale.multimodal import (
        avi_frame_color_sums, synth_avi_media)

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    out = avi_frame_color_sums(synth_avi_media(docs))
    rows = out.collect()
    # frame counts: 1 + doc_id % 6
    by_mid = {}
    for r in rows:
        by_mid.setdefault(r.media_id, []).append(r)
    for mid, rs in by_mid.items():
        assert len(rs) == 1 + mid % 6
        assert rs[0].width == 16 * (1 + mid % 3)
    # plan: single mapInPandas chain, no exchange/join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_avi_spark_stride_sampling(spark):
    from pyspark.sql import functions as F

    from octofludb_spark.scale.multimodal import (
        avi_frame_color_sums, synth_avi_media)

    docs = spark.range(6, 12).select(F.col("id").alias("doc_id"))
    out = avi_frame_color_sums(synth_avi_media(docs), stride=2)
    for r in out.collect():
        assert r.frame_idx % 2 == 0


def test_augment_images_transforms_are_real(spark):
    """hflip/crop verified against a numpy replay of the decoded
    grid; the position checksum distinguishes flip from identity."""
    import hashlib

    import numpy as np

    from octofludb_spark.scale.multimodal import (augment_images,
                                                  synth_patterned_media,
                                                  synth_png)

    docs = spark.range(60).toDF("doc_id")
    m = synth_patterned_media(docs)
    out = {r.media_id: r for r in augment_images(m, seed=0).collect()}
    assert len(out) == 60
    modes = {r.aug_mode for r in out.values()}
    assert modes == {"none", "hflip", "crop8"}  # all faces fired
    for mid, r in out.items():
        g = mid % 211
        w, h = 16 + g % 17, 16 + (3 * g) % 17
        arr = np.array([[(g * 17 + 5 * x * x + 3 * y * y + x * y) % 256
                         for x in range(w)] for y in range(h)],
                       dtype=np.int64)
        mode = int(hashlib.md5(f"0:{mid}".encode())
                   .hexdigest()[:12], 16) % 3
        if mode == 1:
            arr = arr[:, ::-1]
        elif mode == 2:
            cx = int(hashlib.md5(f"0:{mid}:cx".encode())
                     .hexdigest()[:12], 16) % (w - 7)
            cy = int(hashlib.md5(f"0:{mid}:cy".encode())
                     .hexdigest()[:12], 16) % (h - 7)
            arr = arr[cy:cy + 8, cx:cx + 8]
        oh, ow = arr.shape
        wgt = (np.arange(ow)[None, :] + 2 * np.arange(oh)[:, None])
        assert (r.width, r.height) == (ow, oh)
        assert r.pixel_sum == arr.sum()
        assert r.pos_sum == (arr * wgt).sum()
    # a flipped asymmetric image must CHANGE pos_sum but not pixel_sum
    flipped = [r for r in out.values() if r.aug_mode == "hflip"][0]
    g = flipped.media_id % 211
    w, h = 16 + g % 17, 16 + (3 * g) % 17
    arr = np.array([[(g * 17 + 5 * x * x + 3 * y * y + x * y) % 256
                     for x in range(w)] for y in range(h)],
                   dtype=np.int64)
    wgt = (np.arange(w)[None, :] + 2 * np.arange(h)[:, None])
    assert flipped.pixel_sum == arr.sum()
    assert flipped.pos_sum != (arr * wgt).sum()


def test_augment_audio_gain_saturates_and_crop_windows(spark):
    import hashlib

    import numpy as np

    from octofludb_spark.scale.multimodal import (augment_audio,
                                                  synth_media)

    docs = spark.range(120).toDF("doc_id")
    out = {r.media_id: r
           for r in augment_audio(synth_media(docs), seed=0).collect()}
    assert out and {r.aug_mode for r in out.values()} == {
        "none", "gain", "crop"}
    for mid, r in out.items():
        nch, ns = 1 + mid % 2, 100 + mid % 900
        s = np.array([(mid + j) % 256 - 128
                      for j in range(ns * nch)], dtype=np.int64)
        mode = int(hashlib.md5(f"0:{mid}".encode())
                   .hexdigest()[:12], 16) % 3
        if mode == 1:
            s = np.clip(s * 300, -32768, 32767)
        elif mode == 2:
            half = ns // 2
            off = int(hashlib.md5(f"0:{mid}:off".encode())
                      .hexdigest()[:12], 16) % (ns - half + 1)
            s = s[off * nch:(off + half) * nch]
        assert r.energy == (s * s).sum()
        assert r.dc_sum == s.sum()
        assert r.peak_abs == np.abs(s).max()
    # saturation genuinely fires somewhere
    gains = [r for r in out.values() if r.aug_mode == "gain"]
    assert any(r.peak_abs == 32768 or r.peak_abs == 32767
               for r in gains)
