"""Progressive (SOF2) JPEG codec: encoder scan script + multi-scan
decoder (scale/multimodal.py).  The load-bearing invariant: the
progressive encoder reuses the sequential encoders' coefficient
pipeline verbatim, so decode_jpeg_pixels must return byte-identical
pixels for synth_jpeg_progressive and synth_jpeg/synth_jpeg_color on
the same input — and the sequential side is already hash-oracled by
the multimodal_jpeg / multimodal_jpeg_color driver gates, so equality
here transitively pins the progressive path to the external oracle.
No Spark session needed: pure codec tests."""

import pytest

from octofludb_spark.scale.multimodal import (
    decode_header,
    decode_jpeg_pixels,
    pixel_stats,
    synth_jpeg,
    synth_jpeg_color,
    synth_jpeg_progressive,
)

pytestmark = pytest.mark.core

GRAY_SIZES = [(8, 8), (16, 8), (24, 16), (17, 13), (40, 40), (9, 25)]
COLOR_SIZES = [(16, 16), (24, 24), (17, 19), (40, 24), (33, 9)]


def _gradient(x, y):
    return (3 * x + 7 * y + (x * y) // 3) % 256


def _rgb(x, y):
    return ((x * 5 + y * 3) % 256, (x * 7 + 11) % 256,
            (y * 13 + x) % 256)


@pytest.mark.parametrize("w,h", GRAY_SIZES)
def test_gray_progressive_matches_baseline(w, h):
    base = decode_jpeg_pixels(synth_jpeg(w, h, _gradient))
    prog = decode_jpeg_pixels(
        synth_jpeg_progressive(w, h, pixel_fn=_gradient))
    assert (prog["width"], prog["height"], prog["channels"]) == (w, h, 1)
    assert prog["pixels"] == base["pixels"]


@pytest.mark.parametrize("w,h", COLOR_SIZES)
@pytest.mark.parametrize("subsample", [True, False])
def test_color_progressive_matches_baseline(w, h, subsample):
    base = decode_jpeg_pixels(
        synth_jpeg_color(w, h, _rgb, subsample=subsample))
    prog = decode_jpeg_pixels(
        synth_jpeg_progressive(w, h, rgb_fn=_rgb, subsample=subsample))
    assert (prog["width"], prog["height"], prog["channels"]) == (w, h, 3)
    assert prog["pixels"] == base["pixels"]


def test_block_constant_closed_form():
    # same arithmetic as the multimodal_jpeg gate: constant 8x8 blocks
    # survive quantization exactly, so the pixel sum is closed-form
    mid = 37
    wb, hb = 2 + mid % 6, 2 + (mid * 3) % 6
    fn = lambda x, y: (mid + 16 * (x // 8) + 29 * (y // 8)) % 256
    d = decode_jpeg_pixels(
        synth_jpeg_progressive(8 * wb, 8 * hb, pixel_fn=fn))
    expect = 64 * sum((mid + 16 * bx + 29 * by) % 256
                      for bx in range(wb) for by in range(hb))
    assert sum(d["pixels"]) == expect


def test_constant_image_long_eob_runs():
    # 64 all-zero-AC blocks -> EOBn runs spanning the whole scan
    d = decode_jpeg_pixels(
        synth_jpeg_progressive(64, 64, pixel_fn=lambda x, y: 200))
    assert set(d["pixels"]) == {200}


@pytest.mark.parametrize("quant", [1, 4, 8])
def test_sparse_spectrum_refinement(quant):
    # near-flat image + tiny structure at fine quant: coefficients are
    # mostly 0/±1, which drives the AC-refinement newly-nonzero path,
    # refinement ZRL gaps and mixed EOB runs with correction bits
    fn = lambda x, y: 128 + (1 if (x * x + y * y) % 7 == 0 else 0)
    base = decode_jpeg_pixels(synth_jpeg(48, 48, fn, quant=quant))
    prog = decode_jpeg_pixels(
        synth_jpeg_progressive(48, 48, pixel_fn=fn, quant=quant))
    assert prog["pixels"] == base["pixels"]


def test_dense_spectrum_negative_coefficients():
    # pseudo-random texture: dense spectra, deep categories, negative
    # coefficients in every band, both refinement ladder steps active
    fn = lambda x, y: ((x * 37 + y * 61) ^ (x * y)) % 256
    base = decode_jpeg_pixels(synth_jpeg(40, 32, fn, quant=4))
    prog = decode_jpeg_pixels(
        synth_jpeg_progressive(40, 32, pixel_fn=fn, quant=4))
    assert prog["pixels"] == base["pixels"]


def test_header_and_pixel_stats_on_progressive():
    b = synth_jpeg_progressive(20, 12, pixel_fn=_gradient)
    assert decode_header(b) == {"format": "jpeg", "width": 20,
                                "height": 12}
    s = pixel_stats(b)
    assert s["n_pixels"] == 240 and s["pixel_sum"] > 0


def test_16bit_quant_tables_decode():
    # T.81 Pq=1 (legal for SOF1/SOF2; real web JPEGs use it): same
    # quant via 16-bit entries decodes byte-identically, and values
    # above 255 — impossible in an 8-bit table — work
    base = decode_jpeg_pixels(synth_jpeg(40, 24, _gradient))
    p16 = decode_jpeg_pixels(synth_jpeg_progressive(
        40, 24, pixel_fn=_gradient, quant_prec=16))
    assert p16["pixels"] == base["pixels"]
    q, v = 300, 200
    d = decode_jpeg_pixels(synth_jpeg_progressive(
        16, 16, pixel_fn=lambda x, y: v, quant=q, quant_prec=16))
    dcq = round(8 * (v - 128) / q)
    assert set(d["pixels"]) == {min(255, round(dcq * q / 8 + 128))}


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_progressive_restart_markers_gray(ri):
    base = decode_jpeg_pixels(synth_jpeg(40, 24, _gradient))
    prog = decode_jpeg_pixels(synth_jpeg_progressive(
        40, 24, pixel_fn=_gradient, restart_interval=ri))
    assert prog["pixels"] == base["pixels"]


@pytest.mark.parametrize("ri", [1, 3])
def test_progressive_restart_markers_color(ri):
    # interleaved DC scan restarts at MCU boundaries, AC scans at
    # block boundaries; predictors and EOB runs reset at each RSTn
    base = decode_jpeg_pixels(synth_jpeg_color(24, 24, _rgb))
    prog = decode_jpeg_pixels(synth_jpeg_progressive(
        24, 24, rgb_fn=_rgb, restart_interval=ri))
    assert prog["pixels"] == base["pixels"]


def test_truncated_before_sos_rejects():
    # review finding r5: a stream cut between SOF and SOS used to
    # "decode" to all-zero coefficients (mid-gray pixels, plausible
    # bogus pixel_sum) — must reject like the pre-rewrite decoder did
    b = synth_jpeg(16, 16, _gradient)
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg_pixels(b[:b.index(b"\xff\xda")])
    p = synth_jpeg_progressive(16, 16, pixel_fn=_gradient)
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg_pixels(p[:p.index(b"\xff\xda")])


def test_arithmetic_coded_still_raises():
    # flip SOF2 -> SOF10 (progressive arithmetic): honest-scope raise
    b = bytearray(synth_jpeg_progressive(16, 16, pixel_fn=_gradient))
    i = b.index(b"\xff\xc2")
    b[i + 1] = 0xCA
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(bytes(b))
