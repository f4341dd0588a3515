"""ICO/favicon decoder tests (functions/ico.py).

Synthetic containers are assembled by a test-local writer straight from
the format doc (independent of the decoder's parsing); the third-party
multi-member idle.ico (shipped with CPython's IDLE) carries BOTH member
kinds — 32-bpp DIBs and a PNG — and pins the composition paths.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

from jirlbot_spark.functions.ico import decode_ico, is_ico


def make_ico(members: list[tuple[int, int, bytes]]) -> bytes:
    """members = [(w, h, payload_bytes)] -> ICO container."""
    out = struct.pack("<HHH", 0, 1, len(members))
    off = 6 + 16 * len(members)
    dirs, blobs = b"", b""
    for w, h, payload in members:
        dirs_w = 0 if w == 256 else w
        dirs_h = 0 if h == 256 else h
        out_entry = struct.pack(
            "<BBBBHHII", dirs_w, dirs_h, 0, 0, 1, 32, len(payload), off
        )
        dirs += out_entry
        blobs += payload
        off += len(payload)
    return out + dirs + blobs


def dib32(px: np.ndarray) -> bytes:
    """32-bpp BGRA DIB member with doubled height + empty AND mask."""
    h, w, _ = px.shape
    hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0,
                      0, 0, 0, 0, 0)
    bgra = np.zeros((h, w, 4), np.uint8)
    bgra[:, :, :3] = px[:, :, ::-1]
    bgra[:, :, 3] = 255
    and_stride = (w + 31) // 32 * 4
    return hdr + bgra[::-1].tobytes() + b"\x00" * (and_stride * h)


def dib_pal(px_idx: np.ndarray, pal: np.ndarray, bpp: int) -> bytes:
    h, w = px_idx.shape
    n = 1 << bpp
    hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, bpp, 0,
                      0, 0, 0, 0, 0)
    pal4 = np.zeros((n, 4), np.uint8)
    pal4[: len(pal), :3] = pal[:, ::-1]  # RGB -> BGRX
    stride = (w * bpp + 31) // 32 * 4
    rows = np.zeros((h, stride), np.uint8)
    if bpp == 8:
        rows[:, :w] = px_idx
    else:  # pack MSB-first at bpp bits
        for y in range(h):
            bits = "".join(format(v, f"0{bpp}b") for v in px_idx[y])
            bits += "0" * (-len(bits) % 8)
            rows[y, : len(bits) // 8] = np.frombuffer(
                bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)),
                np.uint8,
            )
    and_stride = (w + 31) // 32 * 4
    return hdr + pal4.tobytes() + rows[::-1].tobytes() + b"\x00" * (
        and_stride * h
    )


def test_synthetic_dib32_and_largest_selection():
    rng = np.random.default_rng(31)
    small = rng.integers(0, 256, (8, 8, 3), np.uint8)
    big = rng.integers(0, 256, (24, 16, 3), np.uint8)
    blob = make_ico([(8, 8, dib32(small)), (16, 24, dib32(big))])
    assert is_ico(blob)
    assert np.array_equal(decode_ico(blob), big)  # largest wins
    assert np.array_equal(decode_ico(blob, entry=0), small)


def test_synthetic_png_member():
    from jirlbot_spark.functions.images import encode_png

    rng = np.random.default_rng(32)
    px = rng.integers(0, 256, (20, 20, 3), np.uint8)
    blob = make_ico([(20, 20, encode_png(px))])
    assert np.array_equal(decode_ico(blob), px)


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_synthetic_palette_dibs(bpp):
    rng = np.random.default_rng(33 + bpp)
    n = 1 << bpp
    pal = rng.integers(0, 256, (n, 3), np.uint8)
    idx = rng.integers(0, n, (10, 7), np.uint8)
    blob = make_ico([(7, 10, dib_pal(idx, pal, bpp))])
    assert np.array_equal(decode_ico(blob), pal[idx])


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_ico(b"\x00\x00\x03\x00\x01\x00" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_ico(b"\x00" * 4)
    assert not is_ico(b"\x00\x00\x01\x00\x00\x00")  # zero entries


_WILD = next(
    (
        p
        for p in (
            os.path.join(
                sys.prefix, f"lib/python3.{m}/idlelib/Icons/idle.ico"
            )
            for m in range(9, 15)
        )
        if os.path.exists(p)
    ),
    None,
)


@pytest.mark.skipif(_WILD is None, reason="idle.ico not found")
def test_wild_multimember_favicon():
    """Third-party ICO with 3 DIB members + 1 PNG member: every entry
    decodes, the PNG member is the largest, and all four renditions
    agree on mean color (same artwork at different scales)."""
    with open(_WILD, "rb") as f:
        data = f.read()
    best = decode_ico(data)
    assert best.shape == (256, 256, 3)
    means = []
    for i in range(4):
        px = decode_ico(data, entry=i)
        assert px.shape[0] == px.shape[1] and px.shape[2] == 3
        means.append(px.reshape(-1, 3).mean(axis=0))
    spread = np.ptp(np.stack(means[1:]), axis=0)  # 16x16 downscale is noisy
    assert spread.max() < 40


# ---------- encoder round trips (fixture-mix path) ----------

def test_encode_roundtrip_both_member_kinds():
    """encode_ico is lossless for both member kinds; the content-parity
    switch actually produces both (so the fixture mix covers both)."""
    from jirlbot_spark.functions.ico import encode_ico

    rng = np.random.default_rng(11)
    kinds = set()
    for w, h in [(16, 16), (64, 32), (33, 17), (1, 1), (256, 256)]:
        for _ in range(4):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            blob = encode_ico(px)
            assert is_ico(blob)
            member = blob[6 + 16:]
            kinds.add(
                "png" if member[:8] == b"\x89PNG\r\n\x1a\n" else "dib"
            )
            out = decode_ico(blob)
            assert out.shape == (h, w, 3)
            assert (out == px).all()
    assert kinds == {"png", "dib"}


def test_encode_rejects_oversize():
    from jirlbot_spark.functions.ico import encode_ico

    with pytest.raises(ValueError):
        encode_ico(np.zeros((257, 16, 3), np.uint8))


def test_encoded_dib_member_parses_with_independent_reader():
    """The DIB member the encoder emits is readable by the test-local
    spec-derived field walk, not just by our own decoder."""
    from jirlbot_spark.functions.ico import encode_ico

    px = np.zeros((8, 8, 3), np.uint8)  # sum even -> DIB member
    blob = encode_ico(px)
    member = blob[6 + 16:]
    hdr_size, w, h2, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", member, 0
    )
    assert (hdr_size, w, h2, planes, bpp, comp) == (40, 8, 16, 1, 24, 0)
    xor_stride = (w * 3 + 3) // 4 * 4
    and_stride = (w + 31) // 32 * 4
    assert len(member) == 40 + xor_stride * 8 + and_stride * 8
