"""Self-contained WebP-lossless (VP8L) codec (pure Python/numpy).

WebP is the most common modern web image format after JPEG/PNG, so the
payload codec family gains a VP8L branch:

  - decode_webp: full VP8L decoder per the public "WebP Lossless
    Bitstream Specification": LSB-first bitreader, simple + normal
    (code-length-coded) canonical prefix codes, meta-prefix entropy
    images, color cache, LZ77 backward references with the 120-entry
    2D distance neighborhood, and all four transforms inverted in
    reverse read order — predictor (14 modes, spec border rules),
    cross-color, subtract-green, color-indexing with sub-byte pixel
    bundling. Lossy WebP ("VP8 " chunks, boolean-arithmetic coded)
    needs a real codec library and raises the explicit gate — a
    MEASURED infeasibility, same class as MP3 (functions/mp3.py): the
    VP8 intra decoder requires the spec's default coefficient/mode
    probability tables (hundreds of tabulated uint8 entries driving
    the boolean decoder; one wrong entry desynchronizes the whole
    partition) and no spec text or third-party VP8 source exists in
    this sandbox to transcribe them from.
  - encode_webp: minimal VALID VP8L writer — no transforms, no LZ77,
    one prefix group (literal 8-bit R/G/B codes, single-symbol alpha
    and distance codes). ~3 bytes/pixel, bit-exact lossless; exists so
    fixture rows and round-trip tests are real bitstreams.

Validation boundary (stated honestly): no VP8L-producing encoder
exists in this sandbox, so wild-file vectors could not be obtained
(CPython's python.webp is lossy VP8). The decoder is validated by
(a) encoder round-trips, (b) spec-transcribed micro-vectors for each
predictor mode / transform, and (c) the distance table being pinned
TWICE — a literal transcription from the spec cross-checked against
the generation rule (all offsets with y in 0..7, x in -7..8 plus the
y=0 right-half, sorted by x^2+y^2 then |x|, positive-x first) that
reproduces it exactly; a disagreement fails the import, not a decode.

No reference counterpart: RovoMe/JIRLbot never decodes payloads; this
module serves the graft's payload invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

import struct

import numpy as np

from jirlbot_spark.functions.limits import check_dims

# ---------- distance neighborhood table ----------
# literal transcription from the spec (120 (x, y) offsets) ...
_DIST_TABLE_SPEC = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
# ... and the generation rule that must reproduce it exactly
_cand = [(x, 0) for x in range(1, 9)] + [
    (x, y) for y in range(1, 8) for x in range(-7, 9)
]
_DIST_TABLE = sorted(
    _cand, key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0)
)
if _DIST_TABLE != _DIST_TABLE_SPEC:  # pragma: no cover - import-time pin
    raise AssertionError("VP8L distance table rule/spec disagreement")

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# transform types
_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_INDEXING = 0, 1, 2, 3


# ---------- bit I/O (LSB-first) ----------

class _BR:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes, byte_off: int) -> None:
        self.d = data
        self.pos = byte_off * 8
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        p = self.pos
        if p + nbits > self.n:
            raise ValueError("truncated VP8L stream")
        self.pos = p + nbits
        val = 0
        got = 0
        while got < nbits:
            byte = self.d[(p + got) >> 3]
            bit_off = (p + got) & 7
            take = min(8 - bit_off, nbits - got)
            val |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        return val

    def peek(self, nbits: int) -> int:
        """read() without consuming and without the end-of-stream check
        (past-the-end bits read as 0 — callers rewind to a valid pos)."""
        p = self.pos
        val = 0
        got = 0
        nbytes = len(self.d)
        while got < nbits:
            bidx = (p + got) >> 3
            byte = self.d[bidx] if bidx < nbytes else 0
            bit_off = (p + got) & 7
            take = min(8 - bit_off, nbits - got)
            val |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        return val


class _BW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc |= val << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go MSB-of-code-first into the LSB-first
        stream (same convention as DEFLATE)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


# ---------- canonical prefix codes ----------

class _Prefix:
    """Canonical prefix decoder (DEFLATE-style code assignment); reads
    one bit at a time, MSB-of-code-first."""

    def __init__(self, lengths: list[int], single: int | None = None):
        if single is not None:  # 0-bit single-symbol code
            self.single = single
            return
        self.single = None
        maxlen = max(lengths)
        counts = [0] * (maxlen + 1)
        for ln in lengths:
            if ln:
                counts[ln] += 1
        total = sum(counts[ln] << (maxlen - ln) for ln in range(1, maxlen + 1))
        if total != (1 << maxlen):
            if sum(1 for ln in lengths if ln) == 1:
                # degenerate 1-symbol "normal" code: 0 bits
                self.single = lengths.index(1) if 1 in lengths else next(
                    i for i, ln in enumerate(lengths) if ln
                )
                return
            raise ValueError("invalid (incomplete) prefix code")
        code = 0
        firsts = [0] * (maxlen + 1)
        syms: list[int] = []
        for ln in range(1, maxlen + 1):
            firsts[ln] = code
            for s, s_len in enumerate(lengths):
                if s_len == ln:
                    syms.append(s)
            code = (code + counts[ln]) << 1
        self.counts = counts
        self.firsts = firsts
        self.syms = syms
        self.maxlen = maxlen
        # table-driven fast path: peek maxlen LSB-first bits, one dict
        # lookup -> (symbol, length), rewind the unused bits. The
        # stream carries code bits MSB-of-code-first, so the peeked
        # value holds the code bit-reversed in its LOW `length` bits.
        table: dict[int, tuple[int, int]] = {}
        idx_base = 0
        for ln in range(1, maxlen + 1):
            for k in range(counts[ln]):
                c = firsts[ln] + k
                rev = int(f"{c:0{ln}b}"[::-1], 2)
                sym = syms[idx_base + k]
                for pad in range(1 << (maxlen - ln)):
                    table[rev | (pad << ln)] = (sym, ln)
            idx_base += counts[ln]
        self.table = table

    def read(self, br: _BR) -> int:
        if self.single is not None:
            return self.single
        hit = self.table.get(br.peek(self.maxlen))
        if hit is None:
            raise ValueError("bad prefix code in VP8L stream")
        sym, ln = hit
        if br.pos + ln > br.n:
            raise ValueError("truncated VP8L stream")
        br.pos += ln
        return sym


def _read_prefix_code(br: _BR, alphabet: int) -> _Prefix:
    if br.read(1):  # simple code
        n_sym = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if n_sym == 1:
            return _Prefix([], single=s0)
        s1 = br.read(8)
        lengths = [0] * alphabet
        if max(s0, s1) >= alphabet:
            raise ValueError("simple-code symbol out of range")
        lengths[s0] = 1
        lengths[s1] = 1
        # canonical order must keep first-read symbol on code 0
        p = _Prefix(lengths)
        if p.syms[0] != s0:
            p.syms = [s0, s1]
        return p
    # normal: code-length code first
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # bounded number of code-length symbols
        length_nbits = 2 + 2 * br.read(3)
        max_reads = 2 + br.read(length_nbits)
    else:
        max_reads = -1
    lengths = [0] * alphabet
    pos = 0
    prev = 8
    while pos < alphabet:
        if max_reads == 0:
            break
        if max_reads > 0:
            max_reads -= 1
        sym = cl_code.read(br)
        if sym < 16:
            lengths[pos] = sym
            pos += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if pos < alphabet:
                    lengths[pos] = prev
                    pos += 1
        elif sym == 17:
            pos += 3 + br.read(3)
        else:  # 18
            pos += 11 + br.read(7)
    return _Prefix(lengths)


# ---------- LZ77 helpers ----------

def _lz77_value(br: _BR, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# ---------- image-stream decoding ----------

def _decode_image_stream(br: _BR, w: int, h: int, top_level: bool):
    """Returns (pixels: list[int] ARGB length w*h, transforms) — the
    transforms list is only populated at top level."""
    transforms = []
    cur_w = w
    if top_level:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("repeated VP8L transform")
            if ttype == _T_SUBTRACT_GREEN:
                transforms.append((ttype, None, cur_w))
            elif ttype in (_T_PREDICTOR, _T_COLOR):
                size_bits = br.read(3) + 2
                tw = (cur_w + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                sub, _ = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, (size_bits, sub), cur_w))
            elif ttype == _T_INDEXING:
                n_colors = br.read(8) + 1
                pal_raw, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are component-wise deltas
                pal = []
                prev = 0
                for p in pal_raw:
                    cur = (
                        ((prev >> 24) + (p >> 24) & 0xFF) << 24
                        | ((prev >> 16) + (p >> 16) & 0xFF) << 16
                        | ((prev >> 8) + (p >> 8) & 0xFF) << 8
                        | ((prev + p) & 0xFF)
                    )
                    pal.append(cur & 0xFFFFFFFF)
                    prev = cur
                if n_colors <= 2:
                    wb = 3
                elif n_colors <= 4:
                    wb = 2
                elif n_colors <= 16:
                    wb = 1
                else:
                    wb = 0
                transforms.append((ttype, (wb, pal, cur_w), cur_w))
                cur_w = (cur_w + (1 << wb) - 1) >> wb

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix groups (top level only)
    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (cur_w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta, _ = _decode_image_stream(br, mw, mh, False)
        n_groups = max((p >> 8) & 0xFFFF for p in meta) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),   # red
                _read_prefix_code(br, 256),   # blue
                _read_prefix_code(br, 256),   # alpha
                _read_prefix_code(br, 40),    # distance
            )
        )

    n_px = cur_w * h
    out: list[int] = []
    cache = [0] * cache_size
    mw = ((cur_w + (1 << meta_bits) - 1) >> meta_bits) if meta else 0
    g = groups[0]
    while len(out) < n_px:
        if meta is not None:
            pos = len(out)
            x, y = pos % cur_w, pos // cur_w
            mpix = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            g = groups[(mpix >> 8) & 0xFFFF]
        s = g[0].read(br)
        if s < 256:  # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(px)
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:  # backward reference
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, g[4].read(br))
            if dist_code <= 120:
                dx, dy = _DIST_TABLE[dist_code - 1]
                dist = dy * cur_w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            base = len(out) - dist
            if base < 0:
                raise ValueError("VP8L backward reference before start")
            for i in range(length):
                px = out[base + i]
                out.append(px)
                if cache_size:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
        else:  # color-cache hit
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            out.append(cache[idx])
    return out[:n_px], transforms


# ---------- transform inverses ----------

def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _inv_predictor(img: np.ndarray, size_bits: int, sub: list[int]) -> None:
    """In-place inverse of the predictor transform. img is (h, w, 4)
    uint8 [A,R,G,B] of RESIDUALS on entry, pixels on exit."""
    h, w = img.shape[:2]
    tw = (w + (1 << size_bits) - 1) >> size_bits
    modes = np.array(
        [(p >> 8) & 0xFF for p in sub], np.uint8
    ).reshape(-1, tw)
    BLACK = np.array([255, 0, 0, 0], np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = BLACK
            elif y == 0:
                pred = img[0, x - 1].astype(np.int32)
            elif x == 0:
                pred = img[y - 1, 0].astype(np.int32)
            else:
                m = modes[y >> size_bits, x >> size_bits]
                L = img[y, x - 1].astype(np.int32)
                T = img[y - 1, x].astype(np.int32)
                TL = img[y - 1, x - 1].astype(np.int32)
                # spec quirk: TR of the last column is the first pixel
                # of the CURRENT row
                TR = (
                    img[y - 1, x + 1] if x + 1 < w else img[y, 0]
                ).astype(np.int32)
                if m == 0:
                    pred = BLACK
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif m == 6:
                    pred = _avg2(L, TL)
                elif m == 7:
                    pred = _avg2(L, T)
                elif m == 8:
                    pred = _avg2(TL, T)
                elif m == 9:
                    pred = _avg2(T, TR)
                elif m == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif m == 11:
                    # Select: ties go to T (reference semantics)
                    p = L + T - TL
                    if np.abs(p - L).sum() < np.abs(p - T).sum():
                        pred = L
                    else:
                        pred = T
                elif m == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif m == 13:
                    ave = (L + T) // 2
                    d = ave - TL
                    # C truncation toward zero
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = np.clip(ave + half, 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {m}")
            img[y, x] = (img[y, x].astype(np.int32) + pred) & 0xFF


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5, elementwise."""
    t8 = t.astype(np.int8).astype(np.int32)
    c8 = c.astype(np.int8).astype(np.int32)
    return (t8 * c8) >> 5


def _inv_color_transform(
    img: np.ndarray, size_bits: int, sub: list[int]
) -> None:
    """In-place inverse cross-color transform on (h, w, 4) ARGB."""
    h, w = img.shape[:2]
    tw = (w + (1 << size_bits) - 1) >> size_bits
    cte = np.array(sub, np.uint32).reshape(-1, tw)
    by = np.arange(h) >> size_bits
    bx = np.arange(w) >> size_bits
    codes = cte[np.ix_(by, bx)]
    g2r = (codes & 0xFF).astype(np.uint8)
    g2b = ((codes >> 8) & 0xFF).astype(np.uint8)
    r2b = ((codes >> 16) & 0xFF).astype(np.uint8)
    green = img[..., 2]
    red = (img[..., 1].astype(np.int32) + _ct_delta(g2r, green)) & 0xFF
    blue = (
        img[..., 3].astype(np.int32)
        + _ct_delta(g2b, green)
        + _ct_delta(r2b, red.astype(np.uint8))
    ) & 0xFF
    img[..., 1] = red.astype(np.uint8)
    img[..., 3] = blue.astype(np.uint8)


def _inv_subtract_green(img: np.ndarray) -> None:
    g = img[..., 2].astype(np.int32)
    img[..., 1] = ((img[..., 1] + g) & 0xFF).astype(np.uint8)
    img[..., 3] = ((img[..., 3] + g) & 0xFF).astype(np.uint8)


def _inv_indexing(
    img: np.ndarray, wb: int, pal: list[int], full_w: int
) -> np.ndarray:
    """(h, packed_w, 4) -> (h, full_w, 4) palette expansion."""
    h = img.shape[0]
    bits = 8 >> wb
    per = 1 << wb
    greens = img[..., 2]
    idx = np.zeros((h, img.shape[1] * per), np.int32)
    for k in range(per):
        idx[:, k::per] = (greens >> (k * bits)) & ((1 << bits) - 1)
    idx = idx[:, :full_w]
    pal_arr = np.zeros((max(len(pal), int(idx.max()) + 1), 4), np.uint8)
    for i, p in enumerate(pal):
        pal_arr[i] = ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
    # out-of-range indices map to transparent black (all zeros) — rows
    # beyond len(pal) in pal_arr are already zero
    return pal_arr[idx]


# ---------- public API ----------

def is_webp(data: bytes) -> bool:
    return len(data) >= 16 and data[:4] == b"RIFF" and data[8:12] == b"WEBP"


def _find_vp8l(data: bytes) -> bytes:
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"VP8L":
            return data[pos + 8 : pos + 8 + ln]
        if cid == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a codec library"
            )
        pos += 8 + ln + (ln % 2)
    raise ValueError("no VP8L chunk in WebP container")


def decode_webp(data: bytes) -> np.ndarray:
    """WebP (lossless/VP8L) -> (h, w, 3) uint8 RGB (alpha dropped)."""
    if not is_webp(data):
        raise ValueError("not a WebP (RIFF/WEBP) stream")
    body = _find_vp8l(data)
    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BR(body, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    check_dims(w, h, "VP8L")
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    pixels, transforms = _decode_image_stream(br, w, h, True)
    # to (h, cur_w, 4) ARGB channel planes
    arr32 = np.array(pixels, np.uint32)
    img = np.stack(
        [
            (arr32 >> 24) & 0xFF,
            (arr32 >> 16) & 0xFF,
            (arr32 >> 8) & 0xFF,
            arr32 & 0xFF,
        ],
        axis=-1,
    ).astype(np.uint8)
    cur_w = w
    for t in transforms:
        if t[0] == _T_INDEXING:
            cur_w = (t[1][2] + (1 << t[1][0]) - 1) >> t[1][0]
    img = img.reshape(h, cur_w, 4)
    for ttype, params, width_then in reversed(transforms):
        if ttype == _T_INDEXING:
            img = _inv_indexing(img, params[0], params[1], params[2])
        elif ttype == _T_SUBTRACT_GREEN:
            _inv_subtract_green(img)
        elif ttype == _T_PREDICTOR:
            _inv_predictor(img, params[0], params[1])
        elif ttype == _T_COLOR:
            _inv_color_transform(img, params[0], params[1])
    return np.ascontiguousarray(img[..., 1:4])  # RGB


def encode_webp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> minimal valid lossless WebP (module
    docstring: literal-only single-group VP8L)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = pixels.shape
    if w > 16384 or h > 16384:
        raise ValueError("VP8L dimension limit is 16384")
    bw = _BW()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix

    def full_byte_code(n_zero_tail: int) -> None:
        """Normal prefix code: 256 symbols of length 8 (+ zero tail)."""
        bw.write(0, 1)  # not simple
        bw.write(8, 4)  # 4 + 8 = 12 code-length-code lengths
        # order: 17,18,0,1,2,3,4,5,16,6,7,8 — lengths for our alphabet
        need18 = n_zero_tail > 0
        cl = {8: 1, 16: 2 if need18 else 1}
        if need18:
            cl[18] = 2
        for i in range(12):
            bw.write(cl.get(_CL_ORDER[i], 0), 3)
        bw.write(0, 1)  # no max-symbol bound
        # canonical CL codes: {8:'0',16:'10',18:'11'} or {8:'0',16:'1'}
        def emit_cl(sym: int) -> None:
            if sym == 8:
                bw.write_code(0, 1)
            elif sym == 16:
                bw.write_code(2 if need18 else 1, 2 if need18 else 1)
            else:  # 18
                bw.write_code(3, 2)

        emit_cl(8)  # literal length 8 for symbol 0
        for _ in range(42):  # 42 x repeat-6 = 252
            emit_cl(16)
            bw.write(3, 2)  # 3 + 3
        emit_cl(16)  # + repeat-3 -> 256 total
        bw.write(0, 2)
        if need18:
            emit_cl(18)
            bw.write(n_zero_tail - 11, 7)

    def single_code(sym: int) -> None:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if sym >= 2:
            bw.write(1, 1)
            bw.write(sym, 8)
        else:
            bw.write(0, 1)
            bw.write(sym, 1)

    full_byte_code(24)   # green (alphabet 280: 24-symbol zero tail)
    full_byte_code(0)    # red
    full_byte_code(0)    # blue
    single_code(255)     # alpha: constant opaque
    single_code(0)       # distance: never used but must exist
    flat = pixels.reshape(-1, 3)
    for r, g, b in flat:
        bw.write_code(int(g), 8)
        bw.write_code(int(r), 8)
        bw.write_code(int(b), 8)
    body = bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
