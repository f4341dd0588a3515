"""TIFF codec tests (functions/tiff.py).

Wild-decode vectors are built by `wild_tiff`, a test-local minimal TIFF
writer that is structurally independent from encode_tiff: it lays the
IFD out FIRST (header | IFD | spill | strip data), packs either byte
order, and writes whatever tag set the test asks for — so decoder bugs
can't be masked by a shared layout assumption.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from jirlbot_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    is_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)

_TYPE_FMT = {1: "B", 3: "H", 4: "I", 7: "B"}  # 7 = UNDEFINED (raw bytes)
_TYPE_SIZE = {1: 1, 3: 2, 4: 4, 7: 1}


def wild_tiff(
    order: str,
    w: int,
    h: int,
    strips: list[bytes],
    rows_per_strip: int,
    tags: list[tuple[int, int, list[int]]],
    tile: tuple[int, int] | None = None,
) -> bytes:
    """Assemble a TIFF: header | IFD | spill values | segment data.
    `tags` must NOT include 256/257 or the layout tags (added here).
    tile=(tw, th) switches from strip tags (273/278/279) to tile tags
    (322/323/324/325); rows_per_strip is then ignored."""
    e = "<" if order == "II" else ">"
    if tile is None:
        layout = [
            (278, 4, [rows_per_strip]),
            (279, 4, [len(s) for s in strips]),
            (273, 4, [0] * len(strips)),  # offsets patched below
        ]
        off_tag = 273
    else:
        layout = [
            (322, 4, [tile[0]]),
            (323, 4, [tile[1]]),
            (325, 4, [len(s) for s in strips]),
            (324, 4, [0] * len(strips)),  # offsets patched below
        ]
        off_tag = 324
    all_tags = sorted(tags + [(256, 4, [w]), (257, 4, [h])] + layout)
    n = len(all_tags)
    ifd_size = 2 + 12 * n + 4
    # pass 1: spill sizes
    spill_size = sum(
        _TYPE_SIZE[t] * len(v) + (_TYPE_SIZE[t] * len(v)) % 2
        for _, t, v in all_tags
        if _TYPE_SIZE[t] * len(v) > 4
    )
    data_off = 8 + ifd_size + spill_size
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    all_tags = [
        (tag, typ, offs if tag == off_tag else vals)
        for tag, typ, vals in all_tags
    ]
    # pass 2: emit
    ifd = struct.pack(f"{e}H", n)
    spill = bytearray()
    for tag, typ, vals in all_tags:
        payload = struct.pack(f"{e}{len(vals)}{_TYPE_FMT[typ]}", *vals)
        if len(payload) <= 4:
            ifd += struct.pack(f"{e}HHI", tag, typ, len(vals)) + payload.ljust(
                4, b"\x00"
            )
        else:
            off = 8 + ifd_size + len(spill)
            ifd += struct.pack(f"{e}HHII", tag, typ, len(vals), off)
            spill.extend(payload)
            if len(spill) % 2:
                spill.append(0)
    ifd += struct.pack(f"{e}I", 0)
    magic = struct.pack(f"{e}HI", 42, 8)
    return order.encode() + magic + ifd + bytes(spill) + b"".join(strips)


# ---------- round trips (own encoder) ----------

@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("shape", [(1, 1), (5, 3), (17, 31), (64, 64)])
def test_roundtrip(comp, shape):
    rng = np.random.default_rng(hash((comp, shape)) % 2**32)
    px = rng.integers(0, 256, (*shape, 3), np.uint8)
    blob = encode_tiff(px, compression=comp)
    assert is_tiff(blob)
    assert np.array_equal(decode_tiff(blob), px)


def test_roundtrip_multistrip_compressible():
    gx = np.linspace(0, 255, 64)[None, :]
    gy = np.linspace(0, 255, 48)[:, None]
    px = np.clip(
        np.stack([(gx + gy) / 2, abs(gx - gy), np.full((48, 64), 90)], -1),
        0,
        255,
    ).astype(np.uint8)
    for comp in ("lzw", "deflate"):
        blob = encode_tiff(px, compression=comp, rows_per_strip=7)
        assert np.array_equal(decode_tiff(blob), px)
        assert len(blob) < px.nbytes // 2  # predictor+entropy coding works


# ---------- LZW ----------

def test_lzw_width_boundaries_and_reset():
    rng = np.random.default_rng(3)
    # random bytes force dense table growth across 9->10->11->12 bumps
    # and past the 4094-entry reset
    for n in (600, 2000, 20000, 60000):
        d = rng.integers(0, 256, n, np.uint8).tobytes()
        assert lzw_decode(lzw_encode(d), n) == d
    # heavy runs exercise the KwKwK (code == len(table)) branch
    d = b"".join(bytes([i % 7]) * (i % 50 + 1) for i in range(2000))
    assert lzw_decode(lzw_encode(d), len(d)) == d


def test_lzw_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(0, 3000))
        # mixture of runs and noise
        parts = []
        while sum(map(len, parts)) < n:
            if rng.random() < 0.5:
                parts.append(bytes([int(rng.integers(0, 256))]) * int(rng.integers(1, 40)))
            else:
                parts.append(rng.integers(0, 256, int(rng.integers(1, 40)), np.uint8).tobytes())
        d = b"".join(parts)[:n]
        assert lzw_decode(lzw_encode(d), n) == d


def test_lzw_truncated_raises():
    d = lzw_encode(b"abcabcabc" * 50)
    with pytest.raises(ValueError):
        lzw_decode(d[: len(d) // 2], 450)


# ---------- PackBits ----------

def test_packbits_spec_vector():
    # the worked example from the TIFF 6.0 spec / Apple TN1023
    unp = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(packed, len(unp)) == unp
    assert packbits_decode(packbits_encode(unp), len(unp)) == unp


def test_packbits_noop_and_long_runs():
    # 0x80 is a noop header; runs > 128 must split
    assert packbits_decode(b"\x80\x00A", 1) == b"A"
    d = b"z" * 300 + b"ab" + b"q" * 129
    assert packbits_decode(packbits_encode(d), len(d)) == d


# ---------- wild decodes (independent writer) ----------

def _rgb_tags(comp=1):
    return [(258, 3, [8, 8, 8]), (259, 3, [comp]), (262, 3, [2]), (277, 3, [3])]


def test_wild_rgb_both_orders():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (9, 7, 3), np.uint8)
    for order in ("II", "MM"):
        blob = wild_tiff(order, 7, 9, [px.tobytes()], 9, _rgb_tags())
        assert np.array_equal(decode_tiff(blob), px)


def test_wild_multistrip_rows():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (5, 4, 3), np.uint8)
    strips = [px[i : i + 1].tobytes() for i in range(5)]  # 1 row/strip
    blob = wild_tiff("MM", 4, 5, strips, 1, _rgb_tags())
    assert np.array_equal(decode_tiff(blob), px)


def test_wild_gray8_both_photometrics():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    for photo, expected in ((1, g), (0, 255 - g)):
        blob = wild_tiff(
            "II", 6, 4, [g.tobytes()], 4,
            [(258, 3, [8]), (259, 3, [1]), (262, 3, [photo]), (277, 3, [1])],
        )
        out = decode_tiff(blob)
        assert np.array_equal(out, np.repeat(expected[..., None], 3, 2))


@pytest.mark.parametrize("bits,scale", [(1, 255), (2, 85), (4, 17)])
def test_wild_gray_subbyte(bits, scale):
    w, h = 10, 3
    vals = (np.arange(w * h) % (1 << bits)).astype(np.uint8).reshape(h, w)
    # pack rows MSB-first at `bits` per sample, byte-aligned rows
    row_bytes = (w * bits + 7) // 8
    packed = np.zeros((h, row_bytes), np.uint8)
    for y in range(h):
        bitstr = "".join(format(v, f"0{bits}b") for v in vals[y])
        bitstr += "0" * (row_bytes * 8 - len(bitstr))
        packed[y] = [int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8)]
    blob = wild_tiff(
        "MM", w, h, [packed.tobytes()], h,
        [(258, 3, [bits]), (259, 3, [1]), (262, 3, [1]), (277, 3, [1])],
    )
    out = decode_tiff(blob)
    assert np.array_equal(out, np.repeat((vals * scale)[..., None], 3, 2))


def test_wild_palette():
    idx = np.array([[0, 1, 2, 3]], np.uint8)
    # ColorMap: 3 planes of 2^bits 16-bit values; decoder takes high byte
    pad = [0] * (256 - 4)
    reds = [10 << 8, 20 << 8, 30 << 8, 40 << 8] + pad
    greens = [1 << 8, 2 << 8, 3 << 8, 4 << 8] + pad
    blues = [5 << 8, 6 << 8, 7 << 8, 8 << 8] + pad
    blob = wild_tiff(
        "II", 4, 1, [idx.tobytes()], 1,
        [
            (258, 3, [8]), (259, 3, [1]), (262, 3, [3]), (277, 3, [1]),
            (320, 3, reds + greens + blues),
        ],
    )
    out = decode_tiff(blob)
    exp = np.array([[[10, 1, 5], [20, 2, 6], [30, 3, 7], [40, 4, 8]]], np.uint8)
    assert np.array_equal(out, exp)


def test_wild_16bit_high_byte_both_orders():
    rng = np.random.default_rng(8)
    px16 = rng.integers(0, 65536, (3, 4, 3), np.uint32).astype(np.uint16)
    for order, dt in (("II", "<u2"), ("MM", ">u2")):
        blob = wild_tiff(
            order, 4, 3, [px16.astype(dt).tobytes()], 3,
            [(258, 3, [16, 16, 16]), (259, 3, [1]), (262, 3, [2]), (277, 3, [3])],
        )
        assert np.array_equal(decode_tiff(blob), (px16 >> 8).astype(np.uint8))


def test_wild_predictor_deflate():
    """Horizontal differencing + Deflate built by hand (old + new codes)."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (6, 5, 3), np.uint8)
    d = px.astype(np.int16)
    d[:, 1:, :] -= px[:, :-1, :].astype(np.int16)
    raw = (d & 0xFF).astype(np.uint8).tobytes()
    for comp_code in (8, 32946):
        blob = wild_tiff(
            "II", 5, 6, [zlib.compress(raw)], 6,
            _rgb_tags(comp_code) + [(317, 3, [2])],
        )
        assert np.array_equal(decode_tiff(blob), px)


def test_wild_predictor_16bit():
    px16 = (np.arange(2 * 3 * 3, dtype=np.uint16) * 1000).reshape(2, 3, 3)
    d = px16.astype(np.int32)
    d[:, 1:, :] -= px16[:, :-1, :].astype(np.int32)
    raw = (d & 0xFFFF).astype(">u2").tobytes()
    blob = wild_tiff(
        "MM", 3, 2, [zlib.compress(raw)], 2,
        [(258, 3, [16] * 3), (259, 3, [8]), (262, 3, [2]), (277, 3, [3]),
         (317, 3, [2])],
    )
    assert np.array_equal(decode_tiff(blob), (px16 >> 8).astype(np.uint8))


def test_wild_rgba_alpha_dropped():
    rng = np.random.default_rng(10)
    px = rng.integers(0, 256, (4, 4, 4), np.uint8)
    blob = wild_tiff(
        "II", 4, 4, [px.tobytes()], 4,
        [(258, 3, [8] * 4), (259, 3, [1]), (262, 3, [2]), (277, 3, [4]),
         (338, 3, [2])],
    )
    assert np.array_equal(decode_tiff(blob), px[..., :3])


def test_wild_orientations():
    base = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    expected = {
        1: base,
        2: base[:, ::-1],
        3: base[::-1, ::-1],
        4: base[::-1],
        5: base.swapaxes(0, 1),
        6: base.swapaxes(0, 1)[:, ::-1],
        7: base.swapaxes(0, 1)[::-1, ::-1],
        8: base.swapaxes(0, 1)[::-1],
    }
    for o, exp in expected.items():
        blob = wild_tiff(
            "II", 3, 2, [base.tobytes()], 2,
            _rgb_tags() + [(274, 3, [o])],
        )
        assert np.array_equal(decode_tiff(blob), exp), f"orientation {o}"


def test_wild_packbits_strips():
    px = np.tile(np.array([7, 7, 7, 9, 9, 9], np.uint8), (4, 2)).reshape(4, 4, 3)
    strips = [packbits_encode(px[i : i + 2].tobytes()) for i in (0, 2)]
    blob = wild_tiff("MM", 4, 4, strips, 2, _rgb_tags(32773))
    assert np.array_equal(decode_tiff(blob), px)


# ---------- gates / errors ----------

def test_gates():
    px = np.zeros((2, 2, 3), np.uint8)
    base = _rgb_tags()

    def build(extra, comp_tags=None):
        return wild_tiff("II", 2, 2, [px.tobytes()], 2, (comp_tags or base) + extra)

    with pytest.raises(ValueError):  # tile dims without tile offsets
        decode_tiff(build([(322, 4, [16]), (323, 4, [16])]))
    # fill order 2 on whole-byte uncompressed samples is a spec no-op
    assert decode_tiff(build([(266, 3, [2])])).shape == (2, 2, 3)
    with pytest.raises(NotImplementedError):  # fill order 2 + LZW gated
        decode_tiff(build([(266, 3, [2])], comp_tags=_rgb_tags(5)))
    with pytest.raises(NotImplementedError):  # fax needs 1-bit/1-sample
        decode_tiff(build([], comp_tags=_rgb_tags(2)))
    with pytest.raises(NotImplementedError):  # old-style JPEG
        decode_tiff(build([], comp_tags=_rgb_tags(6)))
    with pytest.raises(NotImplementedError):  # YCbCr without JPEG
        decode_tiff(
            build([], comp_tags=[(258, 3, [8] * 3), (259, 3, [1]),
                                 (262, 3, [6]), (277, 3, [3])])
        )
    with pytest.raises(ValueError):
        decode_tiff(b"II\x2b\x00" + b"\x00" * 8)  # bad magic (BigTIFF)
    with pytest.raises(ValueError):
        decode_tiff(b"PK\x03\x04" + b"\x00" * 8)
    assert not is_tiff(b"PK\x03\x04zzzz")


def test_truncated_strip_raises():
    blob = wild_tiff("II", 4, 4, [b"\x00" * 10], 4, _rgb_tags())
    with pytest.raises(ValueError):
        decode_tiff(blob)


# ---------- tiled / planar layouts ----------

def _lzw_pred_segments(blocks: list[np.ndarray]) -> list[bytes]:
    """Horizontal-difference + TIFF-LZW each (rows, w, spp) block —
    independent of the decoder's predictor path (encode-side spec
    transform, like encode_tiff's)."""
    from jirlbot_spark.functions.tiff import lzw_encode

    out = []
    for b in blocks:
        d = b.astype(np.int16)
        d[:, 1:, :] -= b[:, :-1, :].astype(np.int16)
        out.append(lzw_encode((d & 0xFF).astype(np.uint8).tobytes()))
    return out


def test_tiled_lzw_predictor_edge_tiles():
    rng = np.random.default_rng(21)
    w, h, tw, th = 21, 13, 16, 8  # 2x2 tiles, both edges ragged
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    tiles = []
    for ty in range(2):
        for tx in range(2):
            t = np.zeros((th, tw, 3), np.uint8)  # spec: full-size tiles
            blk = px[ty * th : ty * th + th, tx * tw : tx * tw + tw]
            t[: blk.shape[0], : blk.shape[1]] = blk
            tiles.append(t)
    segs = _lzw_pred_segments(tiles)
    tags = _rgb_tags(5) + [(317, 3, [2])]
    blob = wild_tiff("II", w, h, segs, 0, tags, tile=(tw, th))
    assert np.array_equal(decode_tiff(blob), px)


def test_tiled_big_endian_uncompressed():
    rng = np.random.default_rng(22)
    w, h, tw, th = 32, 16, 16, 16
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    tiles = [px[:, :16].tobytes(), px[:, 16:].tobytes()]
    blob = wild_tiff("MM", w, h, tiles, 0, _rgb_tags(), tile=(tw, th))
    assert np.array_equal(decode_tiff(blob), px)


def test_planar_strips_deflate_predictor():
    import zlib

    rng = np.random.default_rng(23)
    w, h = 9, 6
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    # planar: strips_per_plane=2 (3 rows each), plane-major order
    segs = []
    for p in range(3):
        for y0 in (0, 3):
            plane = px[y0 : y0 + 3, :, p : p + 1]
            d = plane.astype(np.int16)
            d[:, 1:, :] -= plane[:, :-1, :].astype(np.int16)
            segs.append(zlib.compress((d & 0xFF).astype(np.uint8).tobytes()))
    tags = _rgb_tags(8) + [(284, 3, [2]), (317, 3, [2])]
    blob = wild_tiff("II", w, h, segs, 3, tags)
    assert np.array_equal(decode_tiff(blob), px)


def test_planar_16bit_big_endian():
    rng = np.random.default_rng(24)
    w, h = 5, 4
    px16 = rng.integers(0, 65536, (h, w, 3), np.uint16)
    segs = [px16[:, :, p].astype(">u2").tobytes() for p in range(3)]
    tags = [(258, 3, [16] * 3), (259, 3, [1]), (262, 3, [2]),
            (277, 3, [3]), (284, 3, [2])]
    blob = wild_tiff("MM", w, h, segs, h, tags)
    assert np.array_equal(decode_tiff(blob), (px16 >> 8).astype(np.uint8))


def test_planar_tiled_packbits():
    from jirlbot_spark.functions.tiff import packbits_encode

    rng = np.random.default_rng(25)
    w, h, tw, th = 20, 10, 16, 8  # ragged in both axes
    px = rng.integers(0, 8, (h, w, 3), np.uint8) * 32
    segs = []
    for p in range(3):
        for ty in range(2):
            for tx in range(2):
                t = np.zeros((th, tw), np.uint8)
                blk = px[ty * th : ty * th + th, tx * tw : tx * tw + tw, p]
                t[: blk.shape[0], : blk.shape[1]] = blk
                segs.append(packbits_encode(t.tobytes()))
    tags = _rgb_tags(32773) + [(284, 3, [2])]
    blob = wild_tiff("II", w, h, segs, 0, tags, tile=(tw, th))
    assert np.array_equal(decode_tiff(blob), px)


# ---------- JPEG-in-TIFF (compression 7) ----------

def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG into (abbreviated tables stream, table-less
    image stream) per TTN2: DQT/DHT move to JPEGTables."""
    pos = 2
    tables = bytearray()
    rest = bytearray(b"\xff\xd8")
    while pos < len(stream):
        assert stream[pos] == 0xFF
        m = stream[pos + 1]
        if m == 0xDA:  # SOS onward stays with the image
            rest += stream[pos:]
            break
        ln = struct.unpack(">H", stream[pos + 2 : pos + 4])[0]
        seg = stream[pos : pos + 2 + ln]
        (tables if m in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + ln
    return b"\xff\xd8" + bytes(tables) + b"\xff\xd9", bytes(rest)


def test_jpeg_in_tiff_selfcontained_strip():
    from jirlbot_spark.functions.images import psnr
    from jirlbot_spark.functions.jpeg import encode_jpeg
    from jirlbot_spark.sources.fixtures import gen_pixels

    rng = np.random.default_rng(26)
    px = gen_pixels(rng, 24, 16)
    seg = encode_jpeg(px, quality=98)
    tags = [(258, 3, [8] * 3), (259, 3, [7]), (262, 3, [6]), (277, 3, [3])]
    blob = wild_tiff("II", 24, 16, [seg], 16, tags)
    out = decode_tiff(blob)
    assert out.shape == px.shape and psnr(out, px) >= 40.0


def test_jpeg_in_tiff_jpegtables_tiles():
    from jirlbot_spark.functions.images import psnr
    from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from jirlbot_spark.sources.fixtures import gen_pixels

    rng = np.random.default_rng(27)
    w, h, tw, th = 24, 16, 16, 16  # 2x1 tiles, right edge ragged
    px = gen_pixels(rng, w, h)
    tiles, streams = [], []
    for tx in range(2):
        t = np.zeros((th, tw, 3), np.uint8)
        blk = px[:, tx * tw : tx * tw + tw]
        t[:, : blk.shape[1]] = blk
        tiles.append(t)
        streams.append(encode_jpeg(t, quality=98))
    # share tile 0's tables; re-attach each tile's own DHT/DQT would be
    # legal too, but the shared-tables path is what TTN2 readers need.
    tbl0, img0 = _split_jpeg_tables(streams[0])
    # tile 1 keeps its own tables inline (mixed mode is legal)
    segs = [img0, streams[1]]
    tags = [(258, 3, [8] * 3), (259, 3, [7]), (262, 3, [6]), (277, 3, [3]),
            (347, 7, list(tbl0))]
    blob = wild_tiff("II", w, h, segs, 0, tags, tile=(tw, th))
    out = decode_tiff(blob)
    # reference: decode each tile directly and crop
    ref = np.zeros((h, w, 3), np.uint8)
    ref[:, :16] = decode_jpeg(streams[0])
    ref[:, 16:] = decode_jpeg(streams[1])[:, : w - 16]
    assert np.array_equal(out, ref)
    assert psnr(out, px) >= 38.0


# ---------- dispatch integration ----------

def test_dispatch_tiff():
    from jirlbot_spark.functions.images import (
        LOSSLESS_FMTS,
        decode_image,
        encode_image,
        phash64,
    )

    assert "tiff" in LOSSLESS_FMTS
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (16, 16, 3), np.uint8)
    blob = encode_image(px, "tiff")
    out = decode_image(blob, "tiff", 16, 16)
    assert np.array_equal(out, px)
    assert phash64(out) == phash64(px)
