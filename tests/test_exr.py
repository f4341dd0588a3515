"""EXR codec tests (functions/exr.py).

The in-tree encoder only emits ZIP/HALF/RGB, so the other decode
branches (NONE, RLE, ZIPS, FLOAT samples, Y-only images) are covered
by `wild_exr`, a test-local writer that assembles streams from the
file-format doc independently of encode_exr's layout choices. The
third-party wild file is pinned in tests/test_wild_files.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from jirlbot_spark.functions.exr import (
    _predecode,
    decode_exr,
    decode_exr_channels,
    encode_exr,
    is_exr,
)


def _rle_compress(raw: bytes) -> bytes:
    """Spec-derived EXR RLE writer (test-local): n>=0 -> repeat next
    byte n+1 times, n<0 -> -n literal bytes."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        run = 1
        while i + run < n and run < 127 and raw[i + run] == raw[i]:
            run += 1
        if run >= 3:
            out += struct.pack("bB", run - 1, raw[i])
            i += run
        else:
            lit = i
            while (
                i < n
                and i - lit < 127
                and not (i + 2 < n and raw[i] == raw[i + 1] == raw[i + 2])
            ):
                i += 1
            out += struct.pack("b", -(i - lit)) + raw[lit:i]
    return bytes(out)


def wild_exr(
    channels: list[tuple[str, int, np.ndarray]],
    compression: int,
    line_order: int = 0,
) -> bytes:
    """Assemble a scanline EXR: channels = [(name, pixel_type,
    (h, w) float array)] — written in SORTED name order per spec."""
    channels = sorted(channels)
    h, w = channels[0][2].shape
    dt = {1: "<f2", 2: "<f4"}

    def attr(name, typ, val):
        return name + b"\0" + typ + b"\0" + struct.pack("<I", len(val)) + val

    chlist = b"".join(
        n.encode() + b"\0" + struct.pack("<IBBBBii", t, 0, 0, 0, 0, 1, 1)
        for n, t, _ in channels
    ) + b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<iI", 20000630, 2)
        + attr(b"channels", b"chlist", chlist)
        + attr(b"compression", b"compression", bytes([compression]))
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", bytes([line_order]))
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<2f", 0, 0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + b"\0"
    )
    lines = 16 if compression == 3 else 1
    ys = list(range(0, h, lines))
    if line_order == 1:
        ys = ys[::-1]
    blocks = []
    for y in ys:
        n_rows = min(lines, h - y)
        rows = b"".join(
            c[y + r].astype(dt[t]).tobytes()
            for r in range(n_rows)
            for _, t, c in channels
        )
        if compression == 3 or compression == 2:
            payload = zlib.compress(_predecode(rows), 6)
        elif compression == 1:
            payload = _rle_compress(_predecode(rows))
        else:
            payload = rows
        blocks.append((y, payload))
    pos = len(header) + 8 * len(blocks)
    offs, body = [], []
    for y, payload in blocks:
        offs.append(pos)
        body.append(struct.pack("<iI", y, len(payload)) + payload)
        pos += 8 + len(payload)
    return header + struct.pack(f"<{len(blocks)}Q", *offs) + b"".join(body)


@pytest.mark.parametrize("shape", [(1, 1), (16, 16), (33, 21), (5, 40)])
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    px = rng.integers(0, 256, (*shape, 3), np.uint8)
    blob = encode_exr(px)
    assert is_exr(blob)
    assert np.array_equal(decode_exr(blob), px)


@pytest.mark.parametrize("comp", [0, 1, 2, 3])
def test_wild_compressions(comp):
    rng = np.random.default_rng(40 + comp)
    px = rng.integers(0, 5, (21, 13, 3), np.uint8) * 50  # RLE-friendly
    f = px.astype(np.float32) / 255.0
    chans = [(n, 1, f[:, :, i]) for i, n in enumerate("RGB")]
    blob = wild_exr(chans, comp)
    assert np.array_equal(decode_exr(blob), px)


def test_wild_float_samples_and_line_order():
    rng = np.random.default_rng(44)
    px = rng.integers(0, 256, (9, 7, 3), np.uint8)
    f = px.astype(np.float32) / 255.0
    chans = [(n, 2, f[:, :, i]) for i, n in enumerate("RGB")]  # FLOAT
    for lo in (0, 1):  # blocks stamped with absolute y either order
        blob = wild_exr(chans, 3, line_order=lo)
        assert np.array_equal(decode_exr(blob), px)


def test_wild_y_only_gray():
    g = np.linspace(0, 1, 24, dtype=np.float32).reshape(4, 6)
    blob = wild_exr([("Y", 1, g)], 0)
    out = decode_exr(blob)
    exp = np.round(np.clip(g.astype(np.float64), 0, 1) * 255).astype(np.uint8)
    # HALF quantization of linspace values costs at most 1 step here
    assert np.abs(out[..., 0].astype(int) - exp.astype(int)).max() <= 1
    assert np.array_equal(out[..., 0], out[..., 1])


def test_extra_channels_and_hdr_clip():
    rng = np.random.default_rng(45)
    px = rng.integers(0, 256, (6, 6, 3), np.uint8)
    f = px.astype(np.float32) / 255.0
    chans = [(n, 1, f[:, :, i]) for i, n in enumerate("RGB")]
    chans.append(("A", 1, np.ones((6, 6), np.float32)))
    chans.append(("Z", 2, np.full((6, 6), 9.5, np.float32)))
    blob = wild_exr(chans, 2)
    assert np.array_equal(decode_exr(blob), px)  # A/Z ignored for RGB
    ch = decode_exr_channels(blob)
    assert set(ch) == {"R", "G", "B", "A", "Z"}
    assert np.allclose(ch["Z"], 9.5)
    # out-of-range values clamp on the uint8 path
    hot = wild_exr([(n, 2, np.full((2, 2), v, np.float32))
                    for n, v in (("R", 2.0), ("G", -1.0), ("B", 0.5))], 0)
    out = decode_exr(hot)
    assert out[0, 0].tolist() == [255, 0, 128]


def test_gates_and_errors():
    px = np.zeros((4, 4, 3), np.uint8)
    f = px.astype(np.float32)
    chans = [(n, 1, f[:, :, i]) for i, n in enumerate("RGB")]
    with pytest.raises(NotImplementedError):  # PIZ
        decode_exr(wild_exr(chans, 4))
    with pytest.raises(ValueError):
        decode_exr(b"\x00" * 32)
    blob = bytearray(wild_exr(chans, 0))
    blob[5] |= 0x02  # tiled flag without a tiles attribute
    with pytest.raises(ValueError):
        decode_exr(bytes(blob))
    # truncated block
    good = wild_exr(chans, 0)
    with pytest.raises(Exception):
        decode_exr(good[: len(good) - 20])


# ---------- tiled parts ----------

def wild_exr_tiled(
    channels: list[tuple[str, int, np.ndarray]],
    compression: int,
    tile: tuple[int, int],
    mode: int = 0,
    extra_levels: int = 0,
) -> bytes:
    """Tiled single-part EXR with the test's own layout (independent of
    encode_exr_tiled): header | offsets | tile blocks. With mode=1
    (MIPMAP) emits `extra_levels` coarser levels carrying DUMMY pixel
    data after level 0 — the decoder must count and skip them."""
    channels = sorted(channels)
    h, w = channels[0][2].shape
    tw, th = tile
    dt = {1: "<f2", 2: "<f4"}

    def attr(name, typ, val):
        return name + b"\0" + typ + b"\0" + struct.pack("<I", len(val)) + val

    chlist = b"".join(
        n.encode() + b"\0" + struct.pack("<IBBBBii", t, 0, 0, 0, 0, 1, 1)
        for n, t, _ in channels
    ) + b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<iI", 20000630, 2 | 0x200)
        + attr(b"channels", b"chlist", chlist)
        + attr(b"compression", b"compression", bytes([compression]))
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", b"\x00")
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<2f", 0, 0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + attr(b"tiles", b"tiledesc", struct.pack("<IIB", tw, th, mode))
        + b"\0"
    )

    def tile_payload(arrs, cw, ch_rows):
        rows = b"".join(
            a[r, :cw].astype(dt[t]).tobytes()
            for r in range(ch_rows)
            for _, t, a in arrs
        )
        if compression in (2, 3):
            return zlib.compress(_predecode(rows), 6)
        if compression == 1:
            return _rle_compress(_predecode(rows))
        return rows

    blocks = []
    for dy in range((h + th - 1) // th):
        for dx in range((w + tw - 1) // tw):
            cw = min(tw, w - dx * tw)
            ch_rows = min(th, h - dy * th)
            sub = [
                (n, t, a[dy * th : dy * th + ch_rows, dx * tw :])
                for n, t, a in channels
            ]
            blocks.append(
                (dx, dy, 0, 0, tile_payload(sub, cw, ch_rows))
            )
    lw, lh = w, h
    for lvl in range(1, extra_levels + 1):
        lw, lh = max(1, lw // 2), max(1, lh // 2)
        for dy in range((lh + th - 1) // th):
            for dx in range((lw + tw - 1) // tw):
                cw = min(tw, lw - dx * tw)
                ch_rows = min(th, lh - dy * th)
                dummy = [
                    (n, t, np.full((ch_rows, cw), 0.25, np.float32))
                    for n, t, _ in channels
                ]
                blocks.append(
                    (dx, dy, lvl, lvl, tile_payload(dummy, cw, ch_rows))
                )
    pos = len(header) + 8 * len(blocks)
    offs, body = [], []
    for dx, dy, lx, ly, payload in blocks:
        offs.append(pos)
        body.append(struct.pack("<4iI", dx, dy, lx, ly, len(payload)) + payload)
        pos += 20 + len(payload)
    return header + struct.pack(f"<{len(blocks)}Q", *offs) + b"".join(body)


def test_tiled_roundtrip_own_encoder():
    from jirlbot_spark.functions.exr import encode_exr_tiled

    rng = np.random.default_rng(31)
    for shape, tile in [((33, 21), (16, 16)), ((8, 8), (32, 32)),
                        ((40, 64), (16, 8))]:
        px = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        assert np.array_equal(decode_exr(encode_exr_tiled(px, tile)), px)


@pytest.mark.parametrize("comp", [0, 1, 2, 3])
def test_tiled_wild_compressions_edge_tiles(comp):
    rng = np.random.default_rng(comp + 7)
    px = rng.integers(0, 256, (21, 19, 3)).astype(np.uint8)
    f = (px.astype(np.float32) / 255.0).astype("<f2").astype(np.float32)
    chans = [(n, 1, f[:, :, i]) for i, n in enumerate("RGB")]
    out = decode_exr(wild_exr_tiled(chans, comp, (8, 8)))
    assert np.array_equal(out, px)


def test_tiled_mipmap_level0_only():
    """MIPMAP file: the offset table counts every level (round-down
    sizes), level-0 reproduces the image, dummy coarser levels are
    skipped."""
    from jirlbot_spark.functions.exr import _tile_offset_count

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (6, 8, 3)).astype(np.uint8)
    f = (px.astype(np.float32) / 255.0).astype("<f2").astype(np.float32)
    chans = [(n, 1, f[:, :, i]) for i, n in enumerate("RGB")]
    # 8x6 with 4x4 tiles, round-down mipmap: levels (8,6)(4,3)(2,1)(1,1)
    assert _tile_offset_count(8, 6, 4, 4, 1) == 4 + 1 + 1 + 1
    blob = wild_exr_tiled(chans, 3, (4, 4), mode=1, extra_levels=3)
    assert np.array_equal(decode_exr(blob), px)
    # RIPMAP count: every (lx, ly) combination — round-down levels are
    # x: 8,4,2,1 and y: 6,3,1
    assert _tile_offset_count(8, 6, 4, 4, 2) == sum(
        -(-wl // 4) * -(-hl // 4)
        for wl in (8, 4, 2, 1)
        for hl in (6, 3, 1)
    )


def test_tiled_errors():
    from jirlbot_spark.functions.exr import encode_exr_tiled

    px = np.zeros((16, 16, 3), np.uint8)
    blob = bytearray(encode_exr_tiled(px, (8, 8)))
    with pytest.raises(Exception):
        decode_exr(bytes(blob[:-10]))  # truncated final tile
