"""Cross-validation of the image codec family against INDEPENDENT,
third-party-encoded files.

CPython ships a 16x16 logo encoded by external tools (ImageMagick et
al.) in several formats under `test/imghdrdata/`. These are the only
wild-encoder image files available in this sandbox, and they close the
independence gap the in-tree goldens cannot: a decoder bug shared with
the in-tree encoder CANNOT pass here.

Ground truth is the PPM (P6) file, parsed by the inline `_read_ppm`
below — a format so trivial the parser is its own proof.

Observed file facts pinned here:
  - python.png: libpng-produced RGBA -> our decoder matches EXACTLY.
  - python.tiff: LZW TIFF -> EXACT.
  - python.bmp: BITMAPV5, 32-bit BI_BITFIELDS -> EXACT.
  - python.gif: ImageMagick, 64-color quantized palette + transparency
    index 63 -> all pixels match the palette-quantized content; the 9
    transparent-index pixels legitimately decode to palette[63] (we
    return RGB, alpha semantics documented in gif.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

_CANDIDATES = [
    os.path.join(sys.prefix, f"lib/python3.{m}/test/imghdrdata")
    for m in range(9, 15)
]
_DIR = next((p for p in _CANDIDATES if os.path.isdir(p)), None)

pytestmark = pytest.mark.skipif(
    _DIR is None, reason="CPython imghdrdata test files not found"
)


def _load(name: str) -> bytes:
    with open(os.path.join(_DIR, name), "rb") as f:
        return f.read()


def _read_ppm(data: bytes) -> np.ndarray:
    """Minimal independent P6 parser (binary RGB, maxval 255)."""
    tok, i = [], 0
    while len(tok) < 4:
        while data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while data[i] != 0x0A:
                i += 1
            continue
        j = i
        while not data[j : j + 1].isspace():
            j += 1
        tok.append(data[i:j])
        i = j
    assert tok[0] == b"P6" and tok[3] == b"255"
    w, h = int(tok[1]), int(tok[2])
    return np.frombuffer(data, np.uint8, w * h * 3, i + 1).reshape(h, w, 3)


@pytest.fixture(scope="module")
def truth():
    return _read_ppm(_load("python.ppm"))


def test_wild_png_exact(truth):
    from jirlbot_spark.functions.images import decode_png

    assert np.array_equal(decode_png(_load("python.png")), truth)


def test_wild_tiff_exact(truth):
    from jirlbot_spark.functions.tiff import decode_tiff

    assert np.array_equal(decode_tiff(_load("python.tiff")), truth)


def test_wild_bmp_bitfields_exact(truth):
    from jirlbot_spark.functions.images import decode_bmp

    assert np.array_equal(decode_bmp(_load("python.bmp")), truth)


def test_wild_gif_quantized(truth):
    from jirlbot_spark.functions.gif import decode_gif

    data = _load("python.gif")
    px = decode_gif(data)
    # the file's own 64-color global table; transparency index 63
    pal = np.frombuffer(data, np.uint8, 64 * 3, 13).reshape(64, 3)
    transparent = np.all(px == pal[63], axis=2) & (
        np.abs(px.astype(np.int32) - truth.astype(np.int32)).max(axis=2) > 20
    )
    assert int(transparent.sum()) == 9  # the file's transparent pixels
    rest = ~transparent
    diff = np.abs(px.astype(np.int32) - truth.astype(np.int32))[rest]
    assert diff.max() <= 8  # 64-color quantization bound, not our loss
    # and our decode must be internally palette-consistent
    flat = px.reshape(-1, 3)
    pal_set = {tuple(c) for c in pal}
    assert all(tuple(c) in pal_set for c in flat)


def test_wild_pgm_gray_consistency(truth):
    """python.pgm is the same logo as luma; parse it independently and
    check it is a plausible grayscale of the PPM (exercises nothing of
    ours — documents the fixture family's internal consistency)."""
    data = _load("python.pgm")
    tok, i = [], 0
    while len(tok) < 4:
        while data[i : i + 1].isspace():
            i += 1
        j = i
        while not data[j : j + 1].isspace():
            j += 1
        tok.append(data[i:j])
        i = j
    assert tok[0] == b"P5"
    g = np.frombuffer(data, np.uint8, 16 * 16, i + 1).reshape(16, 16)
    luma = truth.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(g.astype(np.float64) - luma).mean() < 16.0


def test_bmp_bitfields_565_synthetic():
    """16-bit RGB565 BI_BITFIELDS with a V3 header + appended masks."""
    import struct

    from jirlbot_spark.functions.images import decode_bmp

    rng = np.random.default_rng(1)
    px0 = rng.integers(0, 256, (5, 7, 3), np.uint8).astype(np.int32)
    h, w, _ = px0.shape
    p16 = (
        ((px0[..., 0] >> 3) << 11)
        | ((px0[..., 1] >> 2) << 5)
        | (px0[..., 2] >> 3)
    ).astype("<u2")
    row_size = (w * 2 + 3) & ~3
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 2] = p16.view(np.uint8).reshape(h, w * 2)
    blob = (
        struct.pack("<2sIHHI", b"BM", 66 + rows.nbytes, 0, 0, 66)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 16, 3, rows.nbytes, 0, 0, 0, 0
        )
        + struct.pack("<III", 0xF800, 0x07E0, 0x001F)
        + rows[::-1].tobytes()
    )
    exp = np.stack(
        [
            (px0[..., 0] >> 3) * 255 // 31,
            (px0[..., 1] >> 2) * 255 // 63,
            (px0[..., 2] >> 3) * 255 // 31,
        ],
        -1,
    ).astype(np.uint8)
    assert np.array_equal(decode_bmp(blob), exp)


def test_wild_pnm_family(truth):
    """Engine PNM codec vs the inline _read_ppm ground-truth parser
    (independent implementations) + the P5/P4 wild files."""
    from jirlbot_spark.functions.pnm import decode_pnm

    assert np.array_equal(decode_pnm(_load("python.ppm")), truth)
    pgm = decode_pnm(_load("python.pgm"))
    assert pgm.shape == (16, 16, 3)
    luma = truth.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(pgm[..., 0].astype(np.float64) - luma).mean() < 16.0
    pbm = decode_pnm(_load("python.pbm"))
    assert set(np.unique(pbm)) <= {0, 255}


def test_wild_sun_raster_exact(truth):
    from jirlbot_spark.functions.legacy_rasters import decode_ras

    assert np.array_equal(decode_ras(_load("python.ras")), truth)


def test_wild_sgi_exact(truth):
    from jirlbot_spark.functions.legacy_rasters import decode_sgi

    assert np.array_equal(decode_sgi(_load("python.sgi")), truth)


def test_wild_xbm_matches_pbm(truth):
    """python.xbm and python.pbm carry the same 1-bit rendering from
    two different third-party encoders; both decoders must agree
    BIT-EXACTLY — a packing/polarity bug in either breaks it."""
    from jirlbot_spark.functions.legacy_rasters import decode_xbm
    from jirlbot_spark.functions.pnm import decode_pnm

    xbm = decode_xbm(_load("python.xbm"))
    pbm = decode_pnm(_load("python.pbm"))
    assert np.array_equal(xbm, pbm)
    # black pixels sit where the truth is dark
    dark = truth.astype(np.float64).mean(axis=2) < 128
    black = xbm[..., 0] == 0
    assert (black == dark).mean() > 0.85


def test_wild_exr_exact_on_opaque(truth):
    """python.exr: third-party HALF ABGR scanline EXR (uncompressed).
    The converter stored display-referred values, so the identity
    transfer reproduces the PPM truth EXACTLY wherever alpha is 1;
    premultiplied edge pixels legitimately differ (alpha semantics
    documented in exr.py)."""
    from jirlbot_spark.functions.exr import decode_exr, decode_exr_channels

    raw = _load("python.exr")
    ch = decode_exr_channels(raw)
    assert sorted(ch) == ["A", "B", "G", "R"]
    out = decode_exr(raw)
    opaque = ch["A"] >= 0.999
    assert int(opaque.sum()) == 109  # the file's own alpha mask
    assert np.array_equal(out[opaque], truth[opaque])


def test_wild_jpeg_psnr(truth):
    """python.jpg / python-raw.jpg: third-party baseline 4:2:0 JPEGs of
    the same logo (one JFIF-framed, one bare SOI+DQT). Wild-encoder
    evidence for the jpeg.py DECODER: total PSNR is bounded by the
    file's own 4:2:0 chroma loss on a saturated 16x16 logo (~23 dB),
    so the discriminating pin is LUMA PSNR >= 35 dB — a decoder bug
    (wrong dequant, IDCT, upsample geometry) lands far below that.
    Both framings must also decode bit-identically (same coefficients,
    different metadata)."""
    from jirlbot_spark.functions.jpeg import decode_jpeg

    a = decode_jpeg(_load("python.jpg"))
    b = decode_jpeg(_load("python-raw.jpg"))
    assert a.shape == (16, 16, 3)
    assert np.array_equal(a, b)
    t = truth.astype(np.float64)
    af = a.astype(np.float64)
    lw = np.array([0.299, 0.587, 0.114])
    mse_luma = np.mean(((af - t) @ lw) ** 2)
    assert 10 * np.log10(255.0**2 / mse_luma) >= 35.0  # measured: 35.54
    mse = np.mean((af - t) ** 2)
    assert 10 * np.log10(255.0**2 / mse) >= 22.0  # measured: 23.44


# ------------------------------------------------- operators over wild files
#
# The image_scrub / image_stats OPERATORS (not just the decoders) must
# handle third-party-encoded bytes: a metadata walk or stats batch that
# only ever saw in-tree-encoded fixtures could share a blind spot with
# the encoder.


def test_wild_image_scrub_operator_preserves_pixels(spark):
    """Scrub the wild PNG/JPEG/GIF through scrub_image_metadata: the
    walk must succeed (scrub_ok), never grow the payload, and the
    scrubbed bytes must decode to EXACTLY the original pixels."""
    from jirlbot_spark.functions.images import decode_image
    from jirlbot_spark.operators.image_scrub import scrub_image_metadata

    cases = [("python.png", "png"), ("python.jpg", "jpeg"),
             ("python.gif", "gif")]
    df = spark.createDataFrame(
        [(n, f, _load(n)) for n, f in cases],
        "image_id string, fmt string, bytes binary",
    )
    rows = {r["image_id"]: r for r in scrub_image_metadata(df).collect()}
    assert len(rows) == len(cases)
    for name, fmt in cases:
        r = rows[name]
        assert r["scrub_ok"] and r["supported"]
        assert r["clean_len"] <= r["orig_len"]
        before = decode_image(_load(name), fmt, 16, 16)
        after = decode_image(bytes(r["clean_bytes"]), fmt, 16, 16)
        assert np.array_equal(before, after), name


def test_wild_image_stats_operator(spark, truth):
    """image_stats over wild-encoder payloads: decode_ok for every
    supported format, stats equal to the direct numpy computation on
    the decoded pixels, and the exact-lossless formats agree with the
    PPM ground truth's stats; junk bytes emit decode_ok=False."""
    from jirlbot_spark.functions.images import (
        decode_image,
        image_stats_array,
    )
    from jirlbot_spark.operators.fetch import image_stats

    cases = [("python.png", "png"), ("python.bmp", "bmp"),
             ("python.tiff", "tiff"), ("python.jpg", "jpeg"),
             ("python.gif", "gif"), ("python.ppm", "ppm")]
    rows_in = [(n, f, _load(n), 16, 16) for n, f in cases]
    rows_in.append(("junk", "png", b"\x00notanimage", 16, 16))
    df = spark.createDataFrame(
        rows_in, "image_id string, fmt string, bytes binary, w int, h int"
    )
    got = {r["image_id"]: r for r in image_stats(df).collect()}
    assert not got["junk"]["decode_ok"]
    truth_stats = image_stats_array(truth)
    for name, fmt in cases:
        r = got[name]
        assert r["decode_ok"], name
        want = image_stats_array(decode_image(_load(name), fmt, 16, 16))
        for k, v in want.items():
            assert r[k] == v, (name, k)
        if fmt in ("png", "bmp", "tiff", "ppm"):  # lossless wild formats
            for k, v in truth_stats.items():
                assert r[k] == v, (name, k)
