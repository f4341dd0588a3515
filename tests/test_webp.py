"""VP8L (WebP lossless) codec tests (functions/webp.py).

The in-tree encoder is literal-only, so every wild decode path — LZ77
backrefs (plain and 2D neighborhood distances), color cache, meta
prefix groups, and all four transforms — is exercised here through a
TEST-LOCAL stream writer (`_W` + helpers below) that builds feature
streams the encoder never produces, with expected pixels computed by
independent forward transforms.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from jirlbot_spark.functions.webp import (
    _CL_ORDER,
    _DIST_TABLE,
    decode_webp,
    encode_webp,
    is_webp,
)


# ---------- distance table pins ----------

def test_distance_table_structure():
    assert len(_DIST_TABLE) == 120
    assert len(set(_DIST_TABLE)) == 120
    d2 = [x * x + y * y for x, y in _DIST_TABLE]
    assert d2 == sorted(d2)  # closest-first
    for x, y in _DIST_TABLE:
        assert 0 <= y <= 7 and -7 <= x <= 8
        if y == 0:
            assert x > 0
    # spec's first and last rows, transcribed independently of the rule
    assert _DIST_TABLE[:8] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)
    ]
    assert _DIST_TABLE[-8:] == [
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7)
    ]


# ---------- round trips ----------

@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (64, 64), (17, 31)])
def test_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    px = rng.integers(0, 256, (*shape, 3), np.uint8)
    blob = encode_webp(px)
    assert is_webp(blob)
    assert np.array_equal(decode_webp(blob), px)


# ---------- test-local stream writer ----------

class _W:
    def __init__(self):
        self.out = bytearray()
        self.acc = self.nbits = 0

    def w(self, val, n):
        self.acc |= val << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def code(self, c, n):  # prefix-code bits, MSB-of-code-first
        for i in range(n - 1, -1, -1):
            self.w((c >> i) & 1, 1)

    def flush(self):
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _canon(lengths):
    """DEFLATE canonical codes: {sym: (code, len)}."""
    maxlen = max(lengths)
    counts = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            counts[ln] += 1
    code, nxt = 0, {}
    for ln in range(1, maxlen + 1):
        nxt[ln] = code
        code = (code + counts[ln]) << 1
    codes = {}
    for ln in range(1, maxlen + 1):
        for s, l in enumerate(lengths):
            if l == ln:
                codes[s] = (nxt[ln], ln)
                nxt[ln] += 1
    return codes


def _equal_lengths(symbols, alphabet):
    """Complete code over `symbols` (shortest-first for low symbols)."""
    k = len(symbols)
    lengths = [0] * alphabet
    if k == 1:
        lengths[symbols[0]] = 1  # placeholder; caller uses simple form
        return lengths
    L = max(1, (k - 1).bit_length())
    n_long = 2 * (k - (1 << (L - 1))) if (1 << L) != k else k
    if (1 << L) == k:
        for s in symbols:
            lengths[s] = L
    else:
        for i, s in enumerate(sorted(symbols)):
            lengths[s] = L if i >= k - n_long else L - 1
    return lengths


def _emit_code(wr, lengths):
    """Normal-form prefix code: all 19 CL lengths + literal lengths."""
    wr.w(0, 1)  # not simple
    wr.w(15, 4)  # 19 code-length-code lengths
    distinct = sorted(set(lengths))
    cl_lengths = _equal_lengths(distinct, 19)
    for i in range(19):
        wr.w(cl_lengths[_CL_ORDER[i]], 3)
    wr.w(0, 1)  # no max-symbol bound
    cl_codes = _canon(cl_lengths)
    for ln in lengths:
        wr.code(*cl_codes[ln])
    return _canon(lengths)


def _emit_simple(wr, syms):
    wr.w(1, 1)
    wr.w(len(syms) - 1, 1)
    s0 = syms[0]
    if s0 >= 2:
        wr.w(1, 1)
        wr.w(s0, 8)
    else:
        wr.w(0, 1)
        wr.w(s0, 1)
    if len(syms) == 2:
        wr.w(syms[1], 8)
    if len(syms) == 1:
        return {s0: (0, 0)}
    return {syms[0]: (0, 1), syms[1]: (1, 1)}


def _code_for(wr, symbols, alphabet):
    """Emit the best-form prefix code for `symbols`; return codebook."""
    symbols = sorted(set(symbols))
    if len(symbols) <= 2 and all(s <= 255 for s in symbols):
        return _emit_simple(wr, symbols)
    return _emit_code(wr, _equal_lengths(symbols, alphabet))


def _header(wr, w, h):
    wr.w(0x2F, 8)
    wr.w(w - 1, 14)
    wr.w(h - 1, 14)
    wr.w(0, 1)
    wr.w(0, 3)


def _wrap(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _emit_literals(wr, pixels_argb, books):
    gb, rb, bb, ab = books
    for a, r, g, b in pixels_argb:
        wr.code(*gb[g])
        wr.code(*rb[r])
        wr.code(*bb[b])
        wr.code(*ab[a])


def _books_for(wr, pixels_argb, extra_green=(), cache_bits=0):
    """Emit green/red/blue/alpha/distance codes for a literal set."""
    greens = [p[2] for p in pixels_argb] + list(extra_green)
    gb = _code_for(wr, greens, 256 + 24 + ((1 << cache_bits) if cache_bits else 0))
    rb = _code_for(wr, [p[1] for p in pixels_argb], 256)
    bb = _code_for(wr, [p[3] for p in pixels_argb], 256)
    ab = _code_for(wr, [p[0] for p in pixels_argb], 256)
    return gb, rb, bb, ab


# ---------- LZ77 ----------

def test_lz77_plain_distance():
    # 4x2: row 0 literal, row 1 = copy(len 4, dist 4). Distance 4 is
    # encoded as dist_code 124 (plain = code - 120): via distance
    # prefix code 13 -> extra_bits = 5, offset = (2+1)<<5 = 96,
    # 96 + read(5)=27 + 1 = 124. Length 4 = green symbol 256+3
    # (prefix code 3 < 4 -> value 3+1).
    w, h = 4, 2
    row = [(255, 10, 20, 30), (255, 11, 21, 31), (255, 12, 22, 32), (255, 13, 23, 33)]
    wr = _W()
    _header(wr, w, h)
    wr.w(0, 1)  # no transform
    wr.w(0, 1)  # no cache
    wr.w(0, 1)  # no meta
    books = _books_for(wr, row, extra_green=[256 + 3])
    dist_book = _code_for(wr, [13], 40)
    _emit_literals(wr, row, books)
    wr.code(*books[0][256 + 3])   # length = 4
    wr.code(*dist_book[13])       # distance prefix code 13
    wr.w(27, 5)                   # -> dist_code 124 -> dist 4
    out = decode_webp(_wrap(wr.flush()))
    exp = np.array(
        [[[r, g, b] for (_, r, g, b) in row]] * 2, np.uint8
    )
    assert np.array_equal(out, exp)


def test_lz77_2d_distance():
    # dist_code 1 -> offset (0,1) -> dist = w: copies the pixel ABOVE
    w, h = 5, 2
    row = [(255, i, 2 * i, 3 * i) for i in range(5)]
    wr = _W()
    _header(wr, w, h)
    wr.w(0, 1)
    wr.w(0, 1)
    wr.w(0, 1)
    books = _books_for(wr, row, extra_green=[256 + 3])
    dist_book = _code_for(wr, [0], 40)
    _emit_literals(wr, row, books)
    wr.code(*books[0][256 + 3])  # length 4
    wr.code(*dist_book[0])       # distance prefix 0 -> dist_code 1 -> (0,1)
    # one more literal to finish the row (length 4 covered x=0..3)
    wr.code(*books[0][row[4][2]])
    wr.code(*books[1][row[4][1]])
    wr.code(*books[2][row[4][3]])
    wr.code(*books[3][row[4][0]])
    out = decode_webp(_wrap(wr.flush()))
    exp_row = np.array([[r, g, b] for (_, r, g, b) in row], np.uint8)
    assert np.array_equal(out[0], exp_row)
    assert np.array_equal(out[1, :4], exp_row[:4])
    assert np.array_equal(out[1, 4], exp_row[4])


# ---------- color cache ----------

def test_color_cache():
    w, h = 3, 1
    px = (255, 77, 88, 99)
    argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
    cache_bits = 4
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    wr = _W()
    _header(wr, w, h)
    wr.w(0, 1)            # no transform
    wr.w(1, 1)            # cache on
    wr.w(cache_bits, 4)
    wr.w(0, 1)            # no meta
    books = _books_for(
        wr, [px], extra_green=[280 + idx], cache_bits=cache_bits
    )
    dist_book = _code_for(wr, [0], 40)
    assert dist_book is not None
    _emit_literals(wr, [px], books)
    wr.code(*books[0][280 + idx])  # cache hit
    wr.code(*books[0][280 + idx])  # and again
    out = decode_webp(_wrap(wr.flush()))
    exp = np.tile(np.array([77, 88, 99], np.uint8), (1, 3, 1))
    assert np.array_equal(out, exp)


# ---------- transforms ----------

def _emit_plain_stream(wr, pixels_argb):
    """cache bit + meta bit + codes + literals (top-level tail)."""
    wr.w(0, 1)
    wr.w(0, 1)
    books = _books_for(wr, pixels_argb)
    _code_for(wr, [0], 40)
    _emit_literals(wr, pixels_argb, books)


def _emit_substream(wr, pixels_argb):
    """A nested image stream: cache bit + codes + literals (no meta)."""
    wr.w(0, 1)
    books = _books_for(wr, pixels_argb)
    _code_for(wr, [0], 40)
    _emit_literals(wr, pixels_argb, books)


def test_subtract_green():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (4, 6, 3), np.uint8).astype(np.int32)
    res = [
        (
            255,
            (r - g) & 0xFF,
            g,
            (b - g) & 0xFF,
        )
        for r, g, b in px.reshape(-1, 3)
    ]
    wr = _W()
    _header(wr, 6, 4)
    wr.w(1, 1)  # transform present
    wr.w(2, 2)  # subtract green
    wr.w(0, 1)  # no more transforms
    _emit_plain_stream(wr, res)
    assert np.array_equal(decode_webp(_wrap(wr.flush())), px.astype(np.uint8))


def _fwd_predict(px_argb: np.ndarray, size_bits: int, modes: np.ndarray):
    """Independent forward predictor: residuals = px - pred (mod 256).
    px_argb is (h, w, 4) int32 [A,R,G,B]."""
    h, w = px_argb.shape[:2]
    res = np.zeros_like(px_argb)

    def avg2(a, b):
        return (a + b) // 2

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = px_argb[0, x - 1]
            elif x == 0:
                pred = px_argb[y - 1, 0]
            else:
                m = modes[y >> size_bits, x >> size_bits]
                L = px_argb[y, x - 1]
                T = px_argb[y - 1, x]
                TL = px_argb[y - 1, x - 1]
                TR = px_argb[y - 1, x + 1] if x + 1 < w else px_argb[y, 0]
                if m == 0:
                    pred = np.array([255, 0, 0, 0])
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = avg2(avg2(L, TR), T)
                elif m == 6:
                    pred = avg2(L, TL)
                elif m == 7:
                    pred = avg2(L, T)
                elif m == 8:
                    pred = avg2(TL, T)
                elif m == 9:
                    pred = avg2(T, TR)
                elif m == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif m == 11:
                    p = L + T - TL
                    pred = L if np.abs(p - L).sum() < np.abs(p - T).sum() else T
                elif m == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    ave = (L + T) // 2
                    d = ave - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = np.clip(ave + half, 0, 255)
            res[y, x] = (px_argb[y, x] - pred) & 0xFF
    return res


def test_predictor_all_modes():
    """14 modes across a 4x56 image with 2^2 blocks (one mode/block)."""
    rng = np.random.default_rng(6)
    h, w, sb = 4, 56, 2
    px = rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.int32)
    argb = np.concatenate([np.full((h, w, 1), 255), px], axis=2)
    modes = np.array([list(range(14))])  # 1 block row, 14 block cols
    res = _fwd_predict(argb, sb, modes)

    wr = _W()
    _header(wr, w, h)
    wr.w(1, 1)
    wr.w(0, 2)  # predictor
    wr.w(sb - 2, 3)
    # sub-image: modes in the GREEN channel, ARGB literal stream
    sub = [(255, 0, int(m), 0) for m in modes.reshape(-1)]
    _emit_substream(wr, sub)
    wr.w(0, 1)  # no more transforms
    _emit_plain_stream(wr, [tuple(int(v) for v in p) for p in res.reshape(-1, 4)])
    out = decode_webp(_wrap(wr.flush()))
    assert np.array_equal(out, px.astype(np.uint8))


def test_color_transform():
    rng = np.random.default_rng(7)
    h, w, sb = 4, 4, 2  # one block
    px = rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.int32)
    g2r, g2b, r2b = 0x30, 0xE0, 0x15  # mixed-sign int8 multipliers

    def delta(t, c):
        t8 = t - 256 if t >= 128 else t
        c8 = c - 256 if c >= 128 else c
        return (t8 * c8) >> 5

    res = []
    for r, g, b in px.reshape(-1, 3):
        sr = (r - delta(g2r, g)) & 0xFF
        sb_ = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
        res.append((255, int(sr), int(g), int(sb_)))
    wr = _W()
    _header(wr, w, h)
    wr.w(1, 1)
    wr.w(1, 2)  # color transform
    wr.w(sb - 2, 3)
    cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
    sub = [
        (255, (cte >> 16) & 0xFF, (cte >> 8) & 0xFF, cte & 0xFF)
    ]
    _emit_substream(wr, sub)
    wr.w(0, 1)
    _emit_plain_stream(wr, res)
    out = decode_webp(_wrap(wr.flush()))
    assert np.array_equal(out, px.astype(np.uint8))


def test_color_indexing_packed():
    """4-color palette -> 2-bit bundling (4 indices per green byte)."""
    w, h = 9, 2
    pal = [(255, 10, 20, 30), (255, 40, 50, 60), (255, 70, 80, 90), (255, 1, 2, 3)]
    idx = np.array([[0, 1, 2, 3, 0, 1, 2, 3, 0], [3, 2, 1, 0, 3, 2, 1, 0, 3]])
    wb = 2  # 4 colors -> 2-bit indices, 4 per byte
    packed_w = (w + 3) // 4
    packed = []
    for y in range(h):
        for bx in range(packed_w):
            gval = 0
            for k in range(4):
                x = bx * 4 + k
                if x < w:
                    gval |= int(idx[y, x]) << (2 * k)
            packed.append((255, 0, gval, 0))
    # palette sub-stream carries component DELTAS
    deltas = []
    prev = (0, 0, 0, 0)
    for p in pal:
        deltas.append(tuple((p[i] - prev[i]) & 0xFF for i in range(4)))
        prev = p
    wr = _W()
    _header(wr, w, h)
    wr.w(1, 1)
    wr.w(3, 2)  # color indexing
    wr.w(len(pal) - 1, 8)
    _emit_substream(wr, deltas)
    wr.w(0, 1)  # no more transforms
    _emit_plain_stream(wr, packed)
    out = decode_webp(_wrap(wr.flush()))
    exp = np.array([[pal[i][1:] for i in row] for row in idx], np.uint8)
    assert np.array_equal(out, exp)


def test_meta_prefix_groups():
    """Two prefix groups selected by the entropy image (2^2 blocks)."""
    w, h, mb = 8, 2, 2
    left = [(255, 1, 2, 3)] * 8   # block 0 pixels (x<4)
    right = [(255, 9, 8, 7)] * 8  # block 1 pixels
    wr = _W()
    _header(wr, w, h)
    wr.w(0, 1)  # no transform
    wr.w(0, 1)  # no cache
    wr.w(1, 1)  # meta prefix present
    wr.w(mb - 2, 3)
    # entropy image 2x1: group index in (red<<8)|green
    _emit_substream(wr, [(255, 0, 0, 0), (255, 0, 1, 0)])
    books0 = _books_for(wr, left)
    _code_for(wr, [0], 40)
    books1 = _books_for(wr, right)
    _code_for(wr, [0], 40)
    for y in range(h):
        for x in range(w):
            px = left[0] if x < 4 else right[0]
            books = books0 if x < 4 else books1
            wr.code(*books[0][px[2]])
            wr.code(*books[1][px[1]])
            wr.code(*books[2][px[3]])
            wr.code(*books[3][px[0]])
    out = decode_webp(_wrap(wr.flush()))
    exp = np.zeros((h, w, 3), np.uint8)
    exp[:, :4] = (1, 2, 3)
    exp[:, 4:] = (9, 8, 7)
    assert np.array_equal(out, exp)


# ---------- gates / errors ----------

def test_gates():
    with pytest.raises(ValueError):
        decode_webp(b"RIFFxxxxNOPE" + b"\x00" * 8)
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    rng = np.random.default_rng(2)
    assert not any(
        is_webp(rng.bytes(int(rng.integers(50, 500)))) for _ in range(200)
    )


def test_dispatch_webp():
    from jirlbot_spark.functions.images import (
        LOSSLESS_FMTS,
        decode_image,
        encode_image,
    )

    assert "webp" in LOSSLESS_FMTS
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (16, 16, 3), np.uint8)
    assert np.array_equal(
        decode_image(encode_image(px, "webp"), "webp", 16, 16), px
    )
