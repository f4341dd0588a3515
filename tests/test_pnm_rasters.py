"""PNM family + legacy rasters (Sun Raster / SGI / XBM).

Round-trip coverage for the PPM encoder (the variant that joins
LOSSLESS_FMTS) plus spec-derived synthetic streams for every decode
branch the wild files don't reach (ASCII variants, 16-bit maxval,
RAS RLE/colormap/depths, SGI verbatim/pixmax, XBM decimal tokens).
The third-party wild files themselves are pinned in
tests/test_wild_files.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from jirlbot_spark.functions.legacy_rasters import (
    decode_ras,
    decode_sgi,
    decode_xbm,
)
from jirlbot_spark.functions.pnm import decode_pnm, encode_pnm, is_pnm


@pytest.mark.parametrize("w,h", [(16, 16), (17, 23), (1, 1)])
def test_ppm_roundtrip_exact(w, h):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    blob = encode_pnm(px)
    assert is_pnm(blob)
    assert np.array_equal(decode_pnm(blob), px)


def test_pnm_ascii_variants_and_comments():
    p3 = b"P3\n# hdr comment\n2 2\n255\n255 0 0  0 255 0\n0 0 255 # 9 9 9\n10 20 30\n"
    out = decode_pnm(p3).reshape(-1, 3)
    assert out.tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]]

    # P1 digits need no separators; comments may carry digits
    p1 = b"P1\n# 111\n3 2\n101\n010\n"
    g = decode_pnm(p1)[..., 0]
    assert g.tolist() == [[0, 255, 0], [255, 0, 255]]

    p2 = b"P2\n3 1\n15\n0 7 15\n"
    row = decode_pnm(p2)[0, :, 0]
    assert row.tolist() == [0, 119, 255]  # round(v*255/15)


def test_pnm_binary_16bit_maxval():
    vals = np.array([[0, 1000, 500]], np.uint16)
    blob = b"P5\n3 1\n1000\n" + vals.astype(">u2").tobytes()
    row = decode_pnm(blob)[0, :, 0]
    assert row.tolist() == [0, 255, 128]
    rgb = np.array([[[0, 500, 1000]]], np.uint16)
    blob6 = b"P6\n1 1\n1000\n" + rgb.astype(">u2").tobytes()
    assert decode_pnm(blob6)[0, 0].tolist() == [0, 128, 255]


def test_pnm_p4_row_packing():
    # 10 wide -> 2 bytes/row, MSB-first, trailing pad bits ignored
    rows = np.array([[0b10110000, 0b01000000], [0b00000001, 0b11000000]], np.uint8)
    blob = b"P4\n10 2\n" + rows.tobytes()
    g = decode_pnm(blob)[..., 0]
    exp = 255 - 255 * np.array(
        [[1, 0, 1, 1, 0, 0, 0, 0, 0, 1], [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]]
    )
    assert np.array_equal(g, exp.astype(np.uint8))


def test_pnm_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_pnm(b"P7\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_pnm(b"P6\n2 2\n255\n\x00\x00\x00")  # truncated
    with pytest.raises(ValueError):
        decode_pnm(b"P2\n1 1\n10\n11\n")  # sample > maxval


@pytest.mark.parametrize("fmt", ["ras", "sgi"])
@pytest.mark.parametrize("w,h", [(16, 16), (17, 23), (1, 1)])
def test_legacy_encoders_roundtrip(fmt, w, h):
    from jirlbot_spark.functions.images import decode_image, encode_image

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    assert np.array_equal(decode_image(encode_image(px, fmt), fmt, w, h), px)


# ---------- Sun Raster ----------


def _ras_rle_encode(data: bytes) -> bytes:
    """Spec-derived RT_BYTE_ENCODED writer (test-local, independent of
    the decoder): runs of 2..256 as (0x80, n-1, byte); literal 0x80 as
    (0x80, 0x00)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 256 and data[i + run] == data[i]:
            run += 1
        if run >= 3 or (run >= 2 and data[i] == 0x80):
            out += bytes((0x80, run - 1, data[i]))
            i += run
        elif data[i] == 0x80:
            out += b"\x80\x00"
            i += 1
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _ras_blob(
    w: int,
    h: int,
    depth: int,
    rtype: int,
    body: bytes,
    cmap: bytes = b"",
) -> bytes:
    maptype = 1 if cmap else 0
    hdr = struct.pack(
        ">8i", 0x59A66A95, w, h, depth, len(body), rtype, maptype, len(cmap)
    )
    return hdr + cmap + body


def _pad16(rows: np.ndarray) -> bytes:
    h, rb = rows.shape
    padded = (rb + 1) & ~1
    out = np.zeros((h, padded), np.uint8)
    out[:, :rb] = rows
    return out.tobytes()


def test_ras_24bit_bgr_and_rgb_types():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (4, 3, 3), np.uint8)
    body_bgr = _pad16(px[:, :, ::-1].reshape(4, -1))
    assert np.array_equal(decode_ras(_ras_blob(3, 4, 24, 1, body_bgr)), px)
    body_rgb = _pad16(px.reshape(4, -1))
    assert np.array_equal(decode_ras(_ras_blob(3, 4, 24, 3, body_rgb)), px)


def test_ras_32bit_pad_byte_and_rle():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (5, 3, 3), np.uint8)
    xbgr = np.zeros((5, 3, 4), np.uint8)
    xbgr[:, :, 1:] = px[:, :, ::-1]
    raw = xbgr.reshape(5, -1)
    assert np.array_equal(decode_ras(_ras_blob(3, 5, 32, 1, _pad16(raw))), px)
    rle = _ras_rle_encode(_pad16(raw))
    assert np.array_equal(decode_ras(_ras_blob(3, 5, 32, 2, rle)), px)


def test_ras_8bit_colormap_and_gray():
    idx = np.array([[0, 1, 2, 1]], np.uint8)
    pal = np.array([[10, 20, 30], [40, 50, 60], [200, 210, 220]], np.uint8)
    cmap = pal.T.tobytes()  # three planes R,G,B
    blob = _ras_blob(4, 1, 8, 1, _pad16(idx), cmap)
    assert np.array_equal(decode_ras(blob), pal[idx[0]][None])
    gray = _ras_blob(4, 1, 8, 1, _pad16(idx))
    assert np.array_equal(decode_ras(gray)[0, :, 0], idx[0])


def test_ras_1bit():
    rows = np.array([[0b10100000], [0b01100000]], np.uint8)
    blob = _ras_blob(3, 2, 1, 1, _pad16(rows))
    g = decode_ras(blob)[..., 0]
    assert g.tolist() == [[0, 255, 0], [255, 0, 0]]


def test_ras_rejects_truncation_and_unknown():
    with pytest.raises(ValueError):
        decode_ras(b"\x00" * 32)
    good = _ras_blob(3, 2, 24, 1, b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_ras(good[:40])


# ---------- SGI ----------


def _sgi_header(storage: int, bpc: int, w: int, h: int, z: int, pixmax: int = 255) -> bytes:
    hdr = struct.pack(">HBBHHHHii", 474, storage, bpc, 3, w, h, z, 0, pixmax)
    return hdr + b"\x00" * (512 - len(hdr))


def _sgi_rle_row(samples: np.ndarray) -> bytes:
    """Spec-derived RLE row writer (test-local): 0x80|n literal runs,
    n replicate runs, 0 terminator."""
    out = bytearray()
    i, n = 0, len(samples)
    while i < n:
        run = 1
        while i + run < n and run < 127 and samples[i + run] == samples[i]:
            run += 1
        if run >= 3:
            out += bytes((run, int(samples[i])))
            i += run
        else:
            lit = i
            while (
                i < n
                and i - lit < 127
                and not (
                    i + 2 < n
                    and samples[i] == samples[i + 1] == samples[i + 2]
                )
            ):
                i += 1
            out.append(0x80 | (i - lit))
            out += samples[lit:i].tobytes()
    out.append(0)
    return bytes(out)


def test_sgi_verbatim_rgb_and_gray():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (4, 5, 3), np.uint8)
    planes = px[::-1].transpose(2, 0, 1).tobytes()  # bottom-up, planar
    blob = _sgi_header(0, 1, 5, 4, 3) + planes
    assert np.array_equal(decode_sgi(blob), px)
    g = rng.integers(0, 256, (3, 2), np.uint8)
    blob1 = _sgi_header(0, 1, 2, 3, 1) + g[::-1].tobytes()
    out = decode_sgi(blob1)
    assert np.array_equal(out[..., 0], g) and np.array_equal(out[..., 1], g)


def test_sgi_rle_roundtrip_and_alpha_drop():
    rng = np.random.default_rng(8)
    px = np.repeat(rng.integers(0, 4, (6, 9, 4), np.uint8) * 60, 1, axis=1)
    h, w, z = px.shape
    rows, offs, lens = [], [], []
    pos = 512 + 8 * h * z
    for c in range(z):
        for y in range(h):
            seg = _sgi_rle_row(px[h - 1 - y, :, c])
            offs.append(pos)
            lens.append(len(seg))
            rows.append(seg)
            pos += len(seg)
    table = np.array(offs + lens, ">u4").tobytes()
    blob = _sgi_header(1, 1, w, h, z) + table + b"".join(rows)
    assert np.array_equal(decode_sgi(blob), px[:, :, :3])


def test_sgi_pixmax_scaling_and_bpc2():
    g = np.array([[0, 50, 100]], np.uint8)
    blob = _sgi_header(0, 1, 3, 1, 1, pixmax=100) + g[::-1].tobytes()
    assert decode_sgi(blob)[0, :, 0].tolist() == [0, 128, 255]
    g16 = np.array([[0, 30000, 65535]], ">u2")
    blob16 = _sgi_header(0, 2, 3, 1, 1, pixmax=65535) + g16[::-1].tobytes()
    assert decode_sgi(blob16)[0, :, 0].tolist() == [0, 117, 255]


def test_sgi_gates_and_errors():
    with pytest.raises(ValueError):
        decode_sgi(b"\x00" * 512)
    with pytest.raises(NotImplementedError):
        decode_sgi(_sgi_header(1, 2, 2, 2, 1) + b"\x00" * 64)


# ---------- XBM ----------


def test_xbm_hex_and_decimal_tokens():
    src = (
        b"#define logo_width 10\n#define logo_height 2\n"
        b"static unsigned char logo_bits[] = {\n"
        b"  0x0d, 0x02, 128, 0x03 };\n"
    )
    g = decode_xbm(src)[..., 0]
    # LSB-first: 0x0d -> cols 0,2,3; 0x02 -> col 9; 128 -> col 7; 0x03 -> cols 8,9
    exp = 255 - 255 * np.array(
        [[1, 0, 1, 1, 0, 0, 0, 0, 0, 1], [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]]
    )
    assert np.array_equal(g, exp.astype(np.uint8))


def test_xbm_rejects_malformed():
    with pytest.raises(ValueError):
        decode_xbm(b"static unsigned char x[] = {0x00};")
    with pytest.raises(ValueError):
        decode_xbm(b"#define x_width 16\n#define x_height 16\n char b[] = {0x00};")
