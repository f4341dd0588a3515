"""CCITT Group 3 / Group 4 bilevel fax codec (ITU-T T.4 / T.6).

Scanned-document uploads are the highest-volume bilevel TIFFs a crawl's
image+caption payload path meets, and they are overwhelmingly fax-coded
(TIFF compressions 2/3/4). This module gives functions/tiff.py that
branch:

  - decode_fax: one TIFF segment (strip/tile) -> packed 1-bit rows
    (MSB-first, bit 1 = BLACK), covering
      * compression 2 — "Modified Huffman": pure 1D rows, each row
        starting on a byte boundary, no EOL codes;
      * compression 3 — T.4: 1D or mixed 1D/2D per T4Options bit 0,
        EOL-separated rows (leading EOL optional, fill bits before EOL
        accepted, RTC tolerated), uncompressed-mode extension gated;
      * compression 4 — T.6 (G4/MMR): pure 2D against an imaginary
        all-white reference line, EOFB optional.
  - encode_g4 / encode_mh / encode_g3: the matching encoders (G4; MH
    byte-aligned rows; G3 with EOLs, 1D or first-row-1D-then-2D), used
    by encode_tiff_g4 and the tests' cross-framing identity.

Code tables are the published ITU T.4 ones (terminating 0..63, make-up
64..1728 per color, shared extended make-up 1792..2560). Import-time
asserts pin structural facts the spec guarantees: exact table sizes,
prefix-freeness of {color codes + extended + EOL} per color, and the
2D mode-code set. No fax-producing third-party encoder exists in this
sandbox, so wild validation is by construction instead: the SAME image
coded through four control paths (MH / G3-1D / G3-2D / G4) must decode
bit-identically, and hand-packed streams in tests exercise fill bits,
EOL framing, and the KwKwK-free 2D modes directly.

Everything here is plain Python over small per-row state — fax rows are
inherently sequential — and runs per DISTINCT payload inside an Arrow
batch (operators/fetch.py), never per frontier row.

No reference counterpart: RovoMe/JIRLbot crawls URLs and never decodes
payloads; this module serves the graft's payload invariant
(BASELINE.json input_hint: decoded-pixel allclose + caption equality).
"""

from __future__ import annotations

import bisect

import numpy as np

# ---------- ITU T.4 code tables ----------
# (run_length, "bits") — string form keeps the table auditable against
# the published spec; parsed once below.

_WHITE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # make-up
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    # make-up
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended make-up (T.4 §2, shared by both colors)
_EXT = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL_BITS = "000000000001"  # 11 zeros + 1

# 2D (T.4 §2 / T.6 §2) vertical/pass/horizontal mode codes
_MODE_P, _MODE_H = "0001", "001"
_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}
# extension escape (uncompressed mode etc) — gated
_MODE_EXT = "0000001"

_EOL = -1  # decode sentinel


def _enc(table: dict[int, str]) -> dict[int, tuple[int, int]]:
    return {run: (len(b), int(b, 2)) for run, b in table.items()}

def _dec(table: dict[int, str]) -> dict[tuple[int, int], int]:
    return {(len(b), int(b, 2)): run for run, b in table.items()}


_WHITE_ENC = _enc({**_WHITE, **_EXT})
_BLACK_ENC = _enc({**_BLACK, **_EXT})
_WHITE_DEC = _dec({**_WHITE, **_EXT})
_WHITE_DEC[(len(_EOL_BITS), 1)] = _EOL
_BLACK_DEC = _dec({**_BLACK, **_EXT})
_BLACK_DEC[(len(_EOL_BITS), 1)] = _EOL
_MAX_CODE_BITS = 14  # longest entry is 13 (black make-up); +1 headroom


def _assert_tables() -> None:
    """Structural facts T.4 guarantees — a transcription slip in either
    table is far more likely to break one of these than to produce a
    different valid prefix code."""
    for name, tbl in (("white", _WHITE), ("black", _BLACK)):
        assert sorted(k for k in tbl if k < 64) == list(range(64)), name
        assert sorted(k for k in tbl if k >= 64) == list(
            range(64, 1729, 64)
        ), name
        codes = sorted(tbl.values()) + sorted(_EXT.values()) + [_EOL_BITS]
        assert len(set(codes)) == len(codes), f"{name}: duplicate codes"
        for i, a in enumerate(codes):
            for b in codes[i + 1 :]:
                assert not b.startswith(a) and not a.startswith(b), (
                    f"{name}: {a} prefixes {b}"
                )
    assert sorted(_EXT) == list(range(1792, 2561, 64))
    modes = list(_MODE_V.values()) + [_MODE_P, _MODE_H, _MODE_EXT]
    for i, a in enumerate(modes):
        for b in modes[i + 1 :]:
            assert not b.startswith(a) and not a.startswith(b), "2D modes"


_assert_tables()


def bilevel(pixels: np.ndarray, threshold: int = 128) -> np.ndarray:
    """RGB -> pure black/white by luma threshold. Fixture rows store
    bilevel pixels BEFORE G4 encode (the GIF-posterize pattern) so the
    row's pixels/phash describe exactly what the bytes carry."""
    luma = (
        0.299 * pixels[..., 0]
        + 0.587 * pixels[..., 1]
        + 0.114 * pixels[..., 2]
    )
    g = np.where(luma >= threshold, 255, 0).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=2)


# ---------- bit IO (MSB-first, as TIFF FillOrder=1 stores fax data) ----------

class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("truncated fax stream")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def exhausted(self, slack_bits: int = 0) -> bool:
        return self.pos + slack_bits >= self.n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def peek_eol(self) -> bool:
        """True iff the next bits are fill-zeros followed by EOL
        (>= 11 zeros then a 1, all within the buffer)."""
        p, zeros = self.pos, 0
        while p < self.n:
            if (self.data[p >> 3] >> (7 - (p & 7))) & 1:
                return zeros >= 11
            zeros += 1
            p += 1
        return False


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, nbits: int, code: int) -> None:
        self.acc = (self.acc << nbits) | code
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= 0xFF  # keep the accumulator bounded

    def put_bits(self, bits: str) -> None:
        self.put(len(bits), int(bits, 2))

    def align(self) -> None:
        if self.nbits:
            self.put(8 - self.nbits, 0)

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nbits:
            out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(out)


# ---------- run-length code IO ----------

def _read_code(br: _BitReader, white: bool) -> int:
    """One T.4 code of the given color -> run length, or _EOL. Fill bits
    before an EOL (any number of extra zeros) are consumed here: once 12
    bits read all-zero, keep reading zeros until the terminating 1."""
    table = _WHITE_DEC if white else _BLACK_DEC
    code = 0
    for nbits in range(1, _MAX_CODE_BITS + 1):
        code = (code << 1) | br.bit()
        run = table.get((nbits, code))
        if run is not None:
            return run
        if nbits >= 12 and code == 0:  # fill zeros: scan to the EOL's 1
            while br.bit() == 0:
                pass
            return _EOL
    raise ValueError(f"bad {'white' if white else 'black'} fax code")


def _read_run(br: _BitReader, white: bool) -> int:
    """Full run length: zero or more make-up codes then a terminating
    code (T.6 allows repeated 2560 make-ups for very wide runs).
    Raises on EOL — callers handle EOL at row boundaries only."""
    total = 0
    while True:
        run = _read_code(br, white)
        if run == _EOL:
            raise ValueError("EOL inside a run")
        total += run
        if run < 64:
            return total


def _put_run(bw: _BitWriter, run: int, white: bool) -> None:
    """Make-up codes (2560-repeats for very wide runs, then one make-up
    for the 64..2560 remainder) followed by one terminating code."""
    enc = _WHITE_ENC if white else _BLACK_ENC
    while run > 2560 + 63:
        bw.put(*enc[2560])
        run -= 2560
    if run >= 64:
        bw.put(*enc[(run >> 6) << 6])
        run &= 63
    bw.put(*enc[run])


# ---------- row model ----------
# A row is its sorted "changing elements": pixel positions where the
# color flips, starting from an implicit WHITE left edge. Even indices
# are white->black transitions, odd are black->white.

def _row_to_changes(row: np.ndarray) -> list[int]:
    """(w,) uint8 of 0(white)/1(black) -> changing element positions."""
    d = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
    ch = d.tolist()
    if row[0]:
        ch.insert(0, 0)
    return ch

def _changes_to_row(changes: list[int], w: int) -> np.ndarray:
    row = np.zeros(w, np.uint8)
    for i in range(0, len(changes) - 1, 2):
        row[changes[i] : changes[i + 1]] = 1
    if len(changes) % 2:
        row[changes[-1] :] = 1
    return row


def _b1_b2(ref: list[int], a0: int, color: int) -> tuple[int, int]:
    """b1: first changing element of `ref` strictly right of a0 whose
    new color is opposite to `color` (= index parity matches `color`,
    since even indices flip to black); b2: the one after it."""
    i = bisect.bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else _INF
    b2 = ref[i + 1] if i + 1 < len(ref) else _INF
    return b1, b2


_INF = 1 << 30


def _decode_row_1d(br: _BitReader, w: int) -> list[int]:
    """One 1D-coded row -> changing elements. Assumes the caller already
    consumed any EOL/tag framing."""
    changes: list[int] = []
    pos, color = 0, 0  # start white
    while pos < w:
        run = _read_run(br, color == 0)
        pos += run
        changes.append(min(pos, w))
        color ^= 1
    if pos > w:
        raise ValueError("fax row overruns width")
    return changes


def _decode_row_2d(br: _BitReader, ref: list[int], w: int) -> list[int]:
    """One 2D-coded row (T.4 2D == T.6 line coding) -> changing
    elements, `ref` being the previous row's."""
    cur: list[int] = []
    a0, color = -1, 0
    while a0 < w:
        # read one mode code (prefix-free against the run tables)
        if br.bit():
            mode = "v", 0  # V0
        else:
            if br.bit():
                mode = ("v", 1) if br.bit() else ("v", -1)
            else:
                if br.bit():  # 001
                    mode = ("h",)
                else:
                    if br.bit():  # 0001
                        mode = ("p",)
                    else:
                        if br.bit():  # 00001x
                            mode = ("v", 2) if br.bit() else ("v", -2)
                        else:
                            if br.bit():  # 000001x
                                mode = ("v", 3) if br.bit() else ("v", -3)
                            else:  # 0000001: extension escape + 3 type bits
                                ext = (br.bit() << 2) | (br.bit() << 1)
                                ext |= br.bit()
                                if ext == 0b111:
                                    raise NotImplementedError(
                                        "fax 2D uncompressed mode"
                                    )
                                # 11+ zeros here = EOL/EOFB where a mode
                                # code was expected (short/garbled row)
                                raise ValueError(
                                    f"bad fax 2D extension {ext:03b}"
                                )
        b1, b2 = _b1_b2(ref, a0, color)
        if mode[0] == "p":
            if b2 >= _INF:
                raise ValueError("pass mode past row end")
            a0 = b2
        elif mode[0] == "v":
            a1 = min(b1, w) + mode[1]
            if not (0 <= a1 <= w):
                raise ValueError("vertical mode out of row")
            cur.append(a1)
            a0 = a1
            color ^= 1
        else:  # horizontal: two runs, color then opposite
            base = max(a0, 0)
            r1 = _read_run(br, color == 0)
            r2 = _read_run(br, color != 0)
            a1 = base + r1
            a2 = a1 + r2
            if a2 > w and a1 <= w:
                a2 = w  # tolerate trailing-run padding to row end
            if a1 > w or a2 > w:
                raise ValueError("horizontal mode overruns width")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
    # positions must be non-decreasing and within the row
    clipped = [min(c, w) for c in cur]
    if any(b < a for a, b in zip(clipped, clipped[1:])):
        raise ValueError("non-monotonic fax transitions")
    return clipped


def _pack_rows(rows: list[np.ndarray], w: int) -> bytes:
    grid = np.stack(rows) if rows else np.zeros((0, w), np.uint8)
    return np.packbits(grid, axis=1).tobytes()


# ---------- public decode ----------

def decode_mh(data: bytes, w: int, h: int) -> bytes:
    """TIFF compression 2 ("CCITT RLE" / Modified Huffman): pure 1D,
    every row starts on a byte boundary, no EOLs."""
    br = _BitReader(data)
    rows = []
    for _ in range(h):
        rows.append(_changes_to_row(_decode_row_1d(br, w), w))
        br.align()
    return _pack_rows(rows, w)


def decode_g3(data: bytes, w: int, h: int, options: int = 0) -> bytes:
    """TIFF compression 3 (T.4): EOL-framed rows; options bit 0 = 2D
    (each EOL carries a 1D/2D tag bit), bit 1 = uncompressed mode
    (gated), bit 2 = fill bits (accepted regardless — _read_code eats
    fill before any EOL). A missing leading EOL is tolerated; RTC
    (consecutive EOLs) or buffer end terminates early rows short."""
    if options & 2:
        raise NotImplementedError("T.4 uncompressed mode")
    two_d = bool(options & 1)
    br = _BitReader(data)
    rows: list[np.ndarray] = []
    ref: list[int] = [w, w]
    ended = False
    while len(rows) < h and not ended:
        is_2d = False
        if br.peek_eol():
            _read_code(br, True)  # consumes fill + EOL
            if br.exhausted(slack_bits=7):
                ended = True  # clean end after a trailing EOL
                break
            if two_d:
                is_2d = br.bit() == 0
            if br.peek_eol():  # EOL straight after EOL(+tag) = RTC
                ended = True
                break
        elif br.exhausted(slack_bits=7):
            raise ValueError("truncated G3 stream")
        elif two_d and rows:
            raise ValueError("2D G3 row without EOL framing")
        changes = (
            _decode_row_2d(br, ref, w) if is_2d else _decode_row_1d(br, w)
        )
        rows.append(_changes_to_row(changes, w))
        ref = changes + [w, w] if changes else [w, w]
    if rows and len(rows) < h:
        # RTC'd / EOL-terminated short — pad white (libtiff behavior)
        while len(rows) < h:
            rows.append(np.zeros(w, np.uint8))
    elif len(rows) < h:
        raise ValueError("empty G3 stream")
    return _pack_rows(rows, w)


def decode_g4(data: bytes, w: int, h: int) -> bytes:
    """TIFF compression 4 (T.6 / MMR): pure 2D, reference line starts
    as the imaginary all-white row; EOFB optional."""
    br = _BitReader(data)
    rows = []
    ref: list[int] = [w, w]
    for _ in range(h):
        changes = _decode_row_2d(br, ref, w)
        rows.append(_changes_to_row(changes, w))
        ref = changes + [w, w] if changes else [w, w]
    return _pack_rows(rows, w)


def decode_fax(
    data: bytes, w: int, h: int, comp: int,
    t4_options: int = 0, t6_options: int = 0,
) -> bytes:
    """TIFF segment bytes -> packed 1-bit rows (MSB-first, 1 = black),
    sized exactly h * ceil(w/8) — the shape _segment_samples expects."""
    if comp == 2:
        return decode_mh(data, w, h)
    if comp == 3:
        return decode_g3(data, w, h, t4_options)
    if comp == 4:
        if t6_options & 2:
            raise NotImplementedError("T.6 uncompressed mode")
        return decode_g4(data, w, h)
    raise ValueError(f"not a fax compression: {comp}")


# ---------- encode ----------

def _encode_row_1d(bw: _BitWriter, row: np.ndarray) -> None:
    """Alternating white/black runs summing to the width; a row that
    starts black gets the spec's zero-length leading white run."""
    w = len(row)
    pos, color = 0, 0
    for c in _row_to_changes(row) + [w]:
        _put_run(bw, c - pos, color == 0)
        pos, color = c, color ^ 1
        if pos >= w:
            break


def _encode_row_2d(
    bw: _BitWriter, cur: list[int], ref: list[int], w: int
) -> None:
    curs = cur + [_INF, _INF]
    a0, color, ci = -1, 0, 0
    while a0 < w:
        b1, b2 = _b1_b2(ref, a0, color)
        a1 = curs[ci] if ci < len(cur) else _INF
        a1 = min(a1, w) if a1 < _INF else _INF
        if b2 < a1:
            bw.put_bits(_MODE_P)
            a0 = b2
            continue
        if a1 >= _INF:
            # no more transitions: the row ends in `color`; code the
            # closing edge at w as a vertical/horizontal against b1
            a1 = w
        d = a1 - min(b1, w)
        if -3 <= d <= 3:
            bw.put_bits(_MODE_V[d])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            a2 = curs[ci + 1] if ci + 1 < len(cur) else w
            a2 = min(a2, w)
            bw.put_bits(_MODE_H)
            base = max(a0, 0)
            _put_run(bw, a1 - base, color == 0)
            _put_run(bw, a2 - a1, color != 0)
            a0 = a2
            ci += 2


def encode_mh(bits: np.ndarray) -> bytes:
    """(h, w) 0/1 -> TIFF compression-2 stream (byte-aligned 1D rows)."""
    bw = _BitWriter()
    for row in bits:
        _encode_row_1d(bw, row)
        bw.align()
    return bw.bytes()


def encode_g3(bits: np.ndarray, two_d: bool = False) -> bytes:
    """(h, w) 0/1 -> TIFF compression-3 stream: EOL before every row;
    in 2D mode the first row is 1D (tag 1) and the rest 2D (tag 0)."""
    h, w = bits.shape
    bw = _BitWriter()
    ref: list[int] = [w, w]
    for y in range(h):
        bw.put_bits(_EOL_BITS)
        if two_d:
            bw.put(1, 1 if y == 0 else 0)
        if two_d and y > 0:
            cur = _row_to_changes(bits[y])
            _encode_row_2d(bw, cur, ref, w)
            ref = cur + [w, w] if cur else [w, w]
        else:
            _encode_row_1d(bw, bits[y])
            ref = _row_to_changes(bits[y]) + [w, w]
    return bw.bytes()


def encode_g4(bits: np.ndarray) -> bytes:
    """(h, w) 0/1 -> TIFF compression-4 (T.6) stream + EOFB."""
    h, w = bits.shape
    bw = _BitWriter()
    ref: list[int] = [w, w]
    for y in range(h):
        cur = _row_to_changes(bits[y])
        _encode_row_2d(bw, cur, ref, w)
        ref = cur + [w, w] if cur else [w, w]
    bw.put_bits(_EOL_BITS)
    bw.put_bits(_EOL_BITS)  # EOFB
    return bw.bytes()
