"""CCITT T.4/T.6 fax codec tests (functions/ccitt.py + the TIFF fax
branch in functions/tiff.py).

No fax-producing third-party encoder exists in this sandbox (checked:
no PIL/libtiff/ghostscript/pdfminer), so validation is by construction:

  - import-time structural asserts in ccitt.py pin table sizes and
    prefix-freeness (a transcription slip is far more likely to break
    those than to yield a different valid prefix code);
  - the SAME image coded through four control paths (MH / G3-1D /
    G3-2D / G4) must decode bit-identically — the mode coder, the run
    coder, EOL framing and the reference-line logic all cross-check
    each other;
  - hand-packed bitstreams below are derived IN THIS FILE from the
    published code words (retyped, not imported), exercising decode
    without the module's own encoder in the loop.
"""

from __future__ import annotations

import numpy as np
import pytest

from jirlbot_spark.functions import ccitt
from jirlbot_spark.functions.ccitt import (
    bilevel,
    decode_fax,
    decode_g3,
    decode_g4,
    decode_mh,
    encode_g3,
    encode_g4,
    encode_mh,
)
from jirlbot_spark.functions.tiff import decode_tiff, encode_tiff_g4

from tests.test_tiff import wild_tiff


def _bits_to_bytes(s: str) -> bytes:
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _grid(seed: int, h: int, w: int, p: float = 0.35) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.arange(h) // 3, np.arange(w) // 5) % 2).astype(
        np.uint8
    )
    return (base ^ (rng.random((h, w)) < p)).astype(np.uint8)


def _packed(bits: np.ndarray) -> bytes:
    return np.packbits(bits, axis=1).tobytes()


# ---------- round trips + the four-framings identity ----------

@pytest.mark.parametrize(
    "shape", [(1, 1), (1, 8), (3, 5), (16, 16), (33, 61), (7, 1728),
              (5, 3000)]
)
def test_roundtrip_all_framings(shape):
    h, w = shape
    bits = _grid(shape[0] * 100 + shape[1], h, w)
    ref = _packed(bits)
    assert decode_mh(encode_mh(bits), w, h) == ref
    assert decode_g3(encode_g3(bits, False), w, h, 0) == ref
    assert decode_g3(encode_g3(bits, True), w, h, 1) == ref
    assert decode_g4(encode_g4(bits), w, h) == ref


def test_all_white_all_black_and_single_pixel_rows():
    for w in (1, 7, 8, 9, 64, 2561, 6000):
        for fill in (0, 1):
            bits = np.full((3, w), fill, np.uint8)
            ref = _packed(bits)
            assert decode_mh(encode_mh(bits), w, 3) == ref
            assert decode_g4(encode_g4(bits), w, 3) == ref
    # lone black pixel at each edge
    for x in (0, 4, 7):
        bits = np.zeros((2, 8), np.uint8)
        bits[1, x] = 1
        assert decode_g4(encode_g4(bits), 8, 2) == _packed(bits)


def test_vertical_pass_horizontal_coverage():
    """Rows engineered to force every 2D mode: big offsets (horizontal),
    +-1..3 drifts (all six verticals), and runs that vanish between
    rows (pass)."""
    w = 64
    rows = [
        np.zeros(w, np.uint8),  # all white (closing V0 at w)
    ]
    r = np.zeros(w, np.uint8)
    r[10:20] = 1
    rows.append(r)  # horizontal vs all-white ref
    for d in (1, 2, 3, -1, -2, -3):
        r2 = rows[-1].copy()
        idx = np.flatnonzero(np.diff(np.concatenate([[0], r2])))
        r3 = np.zeros(w, np.uint8)
        a, b = idx[0] + d, idx[1] + d
        r3[max(a, 0) : max(b, 1)] = 1
        rows.append(r3)  # vertical drift of both edges
    r4 = np.zeros(w, np.uint8)
    r4[40:50] = 1
    rows.append(r4)  # old run disappears, far new run => pass + horizontal
    bits = np.stack(rows)
    h = bits.shape[0]
    assert decode_g4(encode_g4(bits), w, h) == _packed(bits)
    assert decode_g3(encode_g3(bits, True), w, h, 1) == _packed(bits)


# ---------- hand-packed independent decode vectors ----------

def test_hand_packed_1d_row():
    # white 5 = 1100, black 3 = 10  (T.4 terminating codes, retyped)
    data = _bits_to_bytes("1100 10")
    out = decode_mh(data, 8, 1)
    row = np.array([[0, 0, 0, 0, 0, 1, 1, 1]], np.uint8)
    assert out == _packed(row)


def test_hand_packed_1d_makeup_row():
    # white 64+5 = make-up 64 (11011) + term 5 (1100); black 2 = 11;
    # then closing white 25 = 0101011   (w = 96)
    data = _bits_to_bytes("11011 1100 11 0101011")
    out = decode_mh(data, 96, 1)
    row = np.zeros((1, 96), np.uint8)
    row[0, 69:71] = 1
    assert out == _packed(row)


def test_hand_packed_g4_row():
    # w=8, row = white 2, black 3, white 3, against the imaginary
    # all-white reference: horizontal (001) + white 2 (0111) + black 3
    # (10), then closing V0 (1) at b1=w
    data = _bits_to_bytes("001 0111 10 1")
    out = decode_g4(data, 8, 1)
    row = np.array([[0, 0, 1, 1, 1, 0, 0, 0]], np.uint8)
    assert out == _packed(row)


def test_hand_packed_g4_vertical_and_pass():
    # row0: H + white 2 (0111) + black 3 (10), close V0 (1)
    # row1: same run shifted right by 1: V+1 (011) V+1 (011), close V0
    # row2: run gone (all white): pass (0001) over the run, close V0
    data = _bits_to_bytes("001 0111 10 1  011 011 1  0001 1")
    out = decode_g4(data, 8, 3)
    rows = np.array(
        [
            [0, 0, 1, 1, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
        ],
        np.uint8,
    )
    assert out == _packed(rows)


def test_hand_packed_g3_eol_fill_and_rtc():
    eol = "000000000001"
    # two 1D rows framed by EOLs, the second EOL preceded by 5 fill
    # zeros; RTC (6 EOLs) after row 2 of an h=4 image -> white padding
    row = "1100 10"  # white 5, black 3 (w=8)
    data = _bits_to_bytes(eol + row + "00000" + eol + row + eol * 6)
    out = decode_g3(data, 8, 4, 0)
    rows = np.zeros((4, 8), np.uint8)
    rows[0, 5:] = 1
    rows[1, 5:] = 1
    assert out == _packed(rows)


def test_hand_packed_g3_2d_tag_bits():
    eol = "000000000001"
    # 2D G3: EOL + tag 1 (1D row), EOL + tag 0 (2D row: V0 V0 close V0)
    row1d = "1100 10"
    data = _bits_to_bytes(eol + "1" + row1d + eol + "0" + "11" + "1")
    out = decode_g3(data, 8, 2, 1)
    rows = np.zeros((2, 8), np.uint8)
    rows[:, 5:] = 1
    assert out == _packed(rows)


def test_missing_leading_eol_tolerated():
    data = _bits_to_bytes("1100 10")  # bare 1D row, no EOL at all
    assert decode_g3(data, 8, 1, 0) == _packed(
        np.array([[0, 0, 0, 0, 0, 1, 1, 1]], np.uint8)
    )


# ---------- malformed input fails clean ----------

def test_truncated_and_garbage_raise():
    bits = _grid(5, 20, 40)
    for blob, dec in [
        (encode_mh(bits), lambda d: decode_mh(d, 40, 20)),
        (encode_g3(bits, True), lambda d: decode_g3(d, 40, 20, 1)),
        (encode_g4(bits), lambda d: decode_g4(d, 40, 20)),
    ]:
        with pytest.raises((ValueError, NotImplementedError)):
            dec(blob[: len(blob) // 3])
        with pytest.raises((ValueError, NotImplementedError)):
            dec(bytes(len(blob)))  # all zero bits
    # a run overshooting the row width
    wide = _bits_to_bytes("11011 1100")  # white 69 in an 8-wide row
    with pytest.raises(ValueError):
        decode_mh(wide, 8, 1)


def test_uncompressed_mode_gated():
    data = _bits_to_bytes("0000001 111 0")
    with pytest.raises(NotImplementedError):
        decode_g4(data, 8, 1)
    with pytest.raises(NotImplementedError):
        decode_fax(b"", 8, 1, 3, t4_options=2)


# ---------- TIFF integration (wild framings via the test-local writer) ----------

def test_tiff_g4_roundtrip_and_bilevel_fallback():
    rng = np.random.default_rng(11)
    px = bilevel(rng.integers(0, 256, (40, 55, 3)).astype(np.uint8))
    assert np.array_equal(decode_tiff(encode_tiff_g4(px)), px)
    # non-bilevel input thresholds (the GIF-posterize pattern)
    wide = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff_g4(wide)), bilevel(wide))


@pytest.mark.parametrize("comp,enc,t4", [
    (2, lambda b: encode_mh(b), None),
    (3, lambda b: encode_g3(b, False), 0),
    (3, lambda b: encode_g3(b, True), 1),
    (4, lambda b: encode_g4(b), None),
])
@pytest.mark.parametrize("photo", [0, 1])
def test_wild_fax_strips_both_photometrics(comp, enc, t4, photo):
    h, w = 30, 70
    bits = _grid(comp * 10 + photo, h, w)
    # fax bit 1 = black; photometric decides what "black" renders as
    strips = [enc(bits[:16]), enc(bits[16:])]
    tags = [(258, 3, [1]), (259, 3, [comp]), (262, 3, [photo]),
            (277, 3, [1])]
    if t4 is not None:
        tags.append((292, 4, [t4]))
    blob = wild_tiff("II", w, h, strips, 16, tags)
    out = decode_tiff(blob)
    sample = bits[..., None].repeat(3, axis=2) * 255
    expected = 255 - sample if photo == 0 else sample
    assert np.array_equal(out, expected)


def test_wild_fax_fillorder2_and_big_endian():
    h, w = 24, 33
    bits = _grid(99, h, w)
    strip = encode_g4(bits)
    rev = bytes(int(f"{b:08b}"[::-1], 2) for b in strip)
    tags = [(258, 3, [1]), (259, 3, [4]), (262, 3, [0]), (277, 3, [1]),
            (266, 3, [2])]
    blob = wild_tiff("MM", w, h, [rev], h, tags)
    out = decode_tiff(blob)
    assert np.array_equal(out, 255 - bits[..., None].repeat(3, axis=2) * 255)


def test_wild_fax_tiled_g4():
    h, w = 40, 48
    bits = _grid(3, h, w)
    tw, th = 32, 16  # edge tiles crop per spec (full-size tile data)
    tiles = []
    for ty in range(0, h, th):
        for tx in range(0, w, tw):
            tile = np.zeros((th, tw), np.uint8)
            part = bits[ty : ty + th, tx : tx + tw]
            tile[: part.shape[0], : part.shape[1]] = part
            tiles.append(encode_g4(tile))
    tags = [(258, 3, [1]), (259, 3, [4]), (262, 3, [0]), (277, 3, [1])]
    blob = wild_tiff("II", w, h, tiles, 0, tags, tile=(tw, th))
    out = decode_tiff(blob)
    assert np.array_equal(out, 255 - bits[..., None].repeat(3, axis=2) * 255)


def test_wild_uncompressed_1bit_fillorder2():
    """FillOrder 2 also honored for raw 1-bit rows (byte reversal)."""
    h, w = 10, 20
    bits = _grid(42, h, w)
    packed = np.packbits(bits, axis=1)
    rev = bytes(
        int(f"{b:08b}"[::-1], 2) for b in packed.tobytes()
    )
    tags = [(258, 3, [1]), (259, 3, [1]), (262, 3, [0]), (277, 3, [1]),
            (266, 3, [2])]
    blob = wild_tiff("II", w, h, [rev], h, tags)
    out = decode_tiff(blob)
    assert np.array_equal(out, 255 - bits[..., None].repeat(3, axis=2) * 255)


def test_fax_gates():
    bits = _grid(1, 8, 8)
    strip = encode_g4(bits)
    # fax with bits != 1
    tags = [(258, 3, [8]), (259, 3, [4]), (262, 3, [0]), (277, 3, [1])]
    with pytest.raises(NotImplementedError):
        decode_tiff(wild_tiff("II", 8, 8, [strip], 8, tags))
    # T.6 uncompressed-mode option
    tags = [(258, 3, [1]), (259, 3, [4]), (262, 3, [0]), (277, 3, [1]),
            (293, 4, [2])]
    with pytest.raises(NotImplementedError):
        decode_tiff(wild_tiff("II", 8, 8, [strip], 8, tags))
    # fill-order-2 with a non-bitstream compression stays gated
    from jirlbot_spark.functions.tiff import lzw_encode

    raw = np.zeros((8, 8, 3), np.uint8)
    d = raw.astype(np.int16)
    d[:, 1:, :] -= raw[:, :-1, :].astype(np.int16)
    strip2 = lzw_encode((d & 0xFF).astype(np.uint8).tobytes())
    tags = [(258, 3, [8, 8, 8]), (259, 3, [5]), (262, 3, [2]),
            (277, 3, [3]), (266, 3, [2]), (317, 3, [2])]
    with pytest.raises(NotImplementedError):
        decode_tiff(wild_tiff("II", 8, 8, [strip2], 8, tags))


def test_fax_photometric_defaults_white_is_zero():
    h, w = 6, 9
    bits = _grid(8, h, w)
    tags = [(258, 3, [1]), (259, 3, [4]), (277, 3, [1])]  # no 262
    blob = wild_tiff("II", w, h, [encode_g4(bits)], h, tags)
    out = decode_tiff(blob)
    assert np.array_equal(out, 255 - bits[..., None].repeat(3, axis=2) * 255)


def test_dispatch_tiffg4():
    from jirlbot_spark.functions.images import decode_image, encode_image

    rng = np.random.default_rng(77)
    px = bilevel(rng.integers(0, 256, (32, 24, 3)).astype(np.uint8))
    blob = encode_image(px, "tiffg4")
    assert np.array_equal(decode_image(blob, "tiffg4", 24, 32), px)


def test_compression_wins_on_document_content():
    """The reason fax exists: text-like pages compress far better than
    the generic byte codecs on 1-bit content."""
    rng = np.random.default_rng(4)
    doc = np.zeros((128, 256), np.uint8)
    for y in range(6, 120, 10):  # "text lines": solid word-like strokes
        x = 10
        while x < 240:
            wl = int(rng.integers(8, 30))
            doc[y : y + 5, x : x + wl] = 1
            x += wl + int(rng.integers(4, 12))
    g4 = encode_g4(doc)
    assert len(g4) * 4 < doc.shape[0] * doc.shape[1] // 8  # 4x+ vs packed
