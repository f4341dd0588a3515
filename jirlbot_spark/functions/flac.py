"""Self-contained FLAC codec (pure numpy + stdlib, no libFLAC).

The third entry in the engine's "make the gated format REAL" series
(functions/jpeg.py for lossy images, media.encode_wav/decode_wav for
RIFF audio, media.decode_avi for video): a genuine FLAC bitstream per
RFC 9639, so `audio_features` decodes "flac" payload rows for real
in-sandbox instead of through the deterministic fake.

Encoder (subset, always spec-valid):
  - 8/16-bit PCM, mono or multi-channel; for STEREO input each frame
    picks the cheapest of independent / left-side / right-side /
    mid-side by exact bit cost (the side channel coded at bps+1 per
    spec); fixed 4096-sample blocks (last block short), frame-number
    coding
  - per block/channel: best of CONSTANT / FIXED order 0-2 / LPC order
    4, 8 (Levinson-Durbin + error-feedback coefficient quantization,
    12-bit precision) by exact rice-cost; rice partition order 0,
    per-subframe rice parameter, escape to verbatim-residual when rice
    would lose
  - STREAMINFO with the spec's MD5 of the interleaved little-endian
    samples; CRC-8 frame headers, CRC-16 frame footers

Decoder (wider than the encoder):
  - CONSTANT / VERBATIM / FIXED orders 0-4 / LPC orders 1-32
    subframes, RICE and RICE2 residual methods, any partition order,
    escaped partitions, wasted-bits-per-sample, any blocksize/
    sample-rate/bps header code, both blocking strategies; verifies
    both CRCs
  - stereo decorrelation (left-side / right-side / mid-side channel
    assignments) reconstructed exactly; the decoded output is verified
    against the STREAMINFO MD5 whenever the stream carries one and the
    bit depth is byte-aligned — an end-to-end integrity check wild
    files always satisfy

Rice coding is bit-serial by nature; the hot loops are numpy-assisted
(vectorized zigzag/cost/bit-scatter on encode; a precomputed
next-one-bit table collapses the decode loop to integer chasing).
Decode cost on the payload path is per DISTINCT clip inside an Arrow
batch (operators/fetch.py pattern), never per frontier row.

No reference counterpart: RovoMe/JIRLbot never decodes payloads; this
serves the graft's multimodal payload columns (SURVEY §2.3).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"
_BLOCKSIZE = 4096
_SYNC = 0b11111111111110  # 14 bits


# ---------- CRCs (FLAC polynomials) ----------

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TAB[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16_TAB[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# ---------- MSB-first bit IO ----------

class _BitWriter:
    def __init__(self) -> None:
        self.chunks: list[np.ndarray] = []  # uint8 arrays of BITS

    def put(self, value: int, width: int) -> None:
        if width:
            bits = (value >> np.arange(width - 1, -1, -1)) & 1
            self.chunks.append(bits.astype(np.uint8))

    def put_bits(self, bits: np.ndarray) -> None:
        self.chunks.append(bits.astype(np.uint8))

    def align_byte(self) -> None:
        n = sum(len(c) for c in self.chunks)
        if n % 8:
            self.chunks.append(np.zeros(8 - n % 8, np.uint8))

    def to_bytes(self) -> bytes:
        bits = (
            np.concatenate(self.chunks) if self.chunks else np.zeros(0, np.uint8)
        )
        if len(bits) % 8:
            bits = np.concatenate([bits, np.zeros(8 - len(bits) % 8, np.uint8)])
        return np.packbits(bits).tobytes()


class _BitReader:
    """MSB-first reader. Readers only ever move FORWARD through the
    stream, so unary scans use one amortized pointer into the list of
    set-bit positions (total cost O(#ones) over the whole file) instead
    of a per-position lookup table."""

    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = pos_bytes * 8
        self._ones = np.flatnonzero(self.bits).tolist()
        self._j = 0  # index of the first entry of _ones not yet passed

    def read(self, width: int) -> int:
        if width == 0:
            return 0
        if self.pos + width > len(self.bits):
            raise ValueError("truncated FLAC stream")
        chunk = self.bits[self.pos : self.pos + width]
        self.pos += width
        out = 0
        for b in chunk.tolist():
            out = (out << 1) | b
        return out

    def _next_one_at_or_after(self, pos: int) -> int:
        ones, j = self._ones, self._j
        try:
            while ones[j] < pos:
                j += 1
        except IndexError:
            self._j = j
            raise ValueError("truncated FLAC stream (unary)") from None
        self._j = j
        return ones[j]

    def read_unary(self) -> int:
        t = self._next_one_at_or_after(self.pos)
        q = t - self.pos
        self.pos = t + 1
        return q

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------- rice residual coding ----------

def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return ((r << 1) ^ (r >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(
        np.int64
    )


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, total_bits) minimizing rice cost for zigzagged residuals."""
    best_k, best_cost = 0, None
    for k in range(15):  # 15 = escape sentinel in the 4-bit method
        cost = int(np.sum(u >> np.uint64(k))) + len(u) * (1 + k)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k, best_cost


def _rice_encode_bits(u: np.ndarray, k: int) -> np.ndarray:
    """Vectorized rice bit layout: per value, q zeros, a one, k low bits."""
    q = (u >> np.uint64(k)).astype(np.int64)
    lens = q + 1 + k
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    total = int(starts[-1] + lens[-1]) if len(u) else 0
    bits = np.zeros(total, np.uint8)
    term = starts + q
    bits[term] = 1
    for j in range(k):
        bits[term + 1 + j] = (
            (u >> np.uint64(k - 1 - j)) & np.uint64(1)
        ).astype(np.uint8)
    return bits


def _rice_decode(br: _BitReader, n: int, k: int) -> np.ndarray:
    """Chase terminator 1-bits with the amortized ones pointer (the only
    sequential dependency), then extract quotients and low bits in one
    vectorized pass."""
    ones, j = br._ones, br._j
    pos = br.pos
    n_ones = len(ones)
    terms = np.empty(n, np.int64)
    starts = np.empty(n, np.int64)
    try:
        for i in range(n):
            while ones[j] < pos:
                j += 1
            t = ones[j]
            starts[i] = pos
            terms[i] = t
            pos = t + 1 + k
            j += 1
    except IndexError:
        raise ValueError("truncated FLAC stream (rice)") from None
    if pos > len(br.bits):
        raise ValueError("truncated FLAC stream (rice)")
    br.pos = pos
    br._j = j
    q = (terms - starts).astype(np.uint64)
    if k == 0:
        return q
    lo_idx = terms[:, None] + 1 + np.arange(k)
    pow2 = (1 << np.arange(k - 1, -1, -1)).astype(np.uint64)
    lo = br.bits[lo_idx].astype(np.uint64) @ pow2
    return (q << np.uint64(k)) | lo


# ---------- LPC ----------

_LPC_ORDERS = (4, 8)
_LPC_PRECISION = 12


def _levinson_durbin(r: np.ndarray, order: int) -> np.ndarray | None:
    """Autocorrelation -> LPC prediction coefficients (x[n] ~= sum
    c[j] * x[n-1-j]); None when the signal is degenerate."""
    a = [0.0] * (order + 1)
    a[0] = 1.0
    err = float(r[0])
    if err <= 0.0:
        return None
    for i in range(1, order + 1):
        acc = float(r[i])
        for j in range(1, i):
            acc += a[j] * float(r[i - j])
        k = -acc / err
        new = a[:]
        for j in range(1, i + 1):
            new[j] = a[j] + k * a[i - j]
        a = new
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    return -np.asarray(a[1 : order + 1])


def _quantize_lpc(
    lpc: np.ndarray, precision: int
) -> tuple[np.ndarray, int] | None:
    """(int coeffs, shift) with error-feedback rounding, libFLAC-style."""
    cmax = float(np.max(np.abs(lpc)))
    if cmax <= 0.0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - (int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.zeros(len(lpc), np.int64)
    e = 0.0
    for i, c in enumerate(lpc):
        v = c * (1 << shift) + e
        qi = int(np.clip(round(v), -lim, lim - 1))
        e = v - qi
        q[i] = qi
    if not np.any(q):
        return None
    return q, shift


def _lpc_residual(
    x: np.ndarray, q: np.ndarray, shift: int
) -> np.ndarray:
    """FIR prediction residual (encode side is non-recursive)."""
    order = len(q)
    n = len(x)
    pred = np.zeros(n - order, np.int64)
    for j in range(order):
        pred += q[j] * x[order - 1 - j : n - 1 - j]
    return x[order:] - (pred >> shift)


def _lpc_restore(
    res: np.ndarray, warm: np.ndarray, q: np.ndarray, shift: int
) -> np.ndarray:
    """Sequential IIR restore (each sample depends on reconstructed
    predecessors — inherently serial; order is <=32 so the Python loop
    is O(order · n) int ops)."""
    order = len(q)
    x = warm.astype(np.int64).tolist()
    coeffs = q.tolist()
    r = res.tolist()
    for i in range(len(r)):
        acc = 0
        base = len(x) - 1
        for j in range(order):
            acc += coeffs[j] * x[base - j]
        x.append(r[i] + (acc >> shift))
    return np.asarray(x, np.int64)


# ---------- fixed predictors ----------

def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(res: np.ndarray, warmup: np.ndarray, order: int) -> np.ndarray:
    """Invert _fixed_residual given the first `order` true samples."""
    out = res.astype(np.int64)
    for lvl in range(order, 0, -1):
        # prepend the level-(lvl-1) warmup difference, then cumsum
        w = warmup.astype(np.int64)
        for _ in range(lvl - 1):
            w = np.diff(w)
        out = np.cumsum(np.concatenate([[w[0]], out]))
    return out


# ---------- frame-number (UTF-8-style) coding ----------

def _coded_number_encode(bw: _BitWriter, n: int) -> None:
    if n < 0x80:
        bw.put(n, 8)
        return
    payload = []
    while True:
        payload.append(0x80 | (n & 0x3F))
        n >>= 6
        lead_capacity = 7 - len(payload) - 1
        if n < (1 << lead_capacity):
            break
    nbytes = len(payload) + 1
    lead = (0xFF << (8 - nbytes)) & 0xFF | n
    bw.put(lead, 8)
    for b in reversed(payload):
        bw.put(b, 8)


def _coded_number_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    probe = b0
    while probe & 0x40:
        n_extra += 1
        probe <<= 1
    val = b0 & (0x3F >> n_extra)
    for _ in range(n_extra):
        nxt = br.read(8)
        if (nxt & 0xC0) != 0x80:
            raise ValueError("bad coded frame number")
        val = (val << 6) | (nxt & 0x3F)
    return val


# ---------- encode ----------

def encode_flac(
    wave: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    stereo_mode: str = "auto",
) -> bytes:
    """Float samples in [-1, 1] ((n,) mono or (n, ch)) -> FLAC blob.
    Quantization matches encode_wav: round(v * 2^(bits-1)) clipped.

    For 2-channel input, `stereo_mode` picks the per-frame channel
    assignment: "auto" (default) takes the cheapest of the four by
    exact coded bit count; "independent" / "left_side" / "right_side" /
    "mid_side" force one (tests use this to pin each decode path)."""
    if stereo_mode != "auto" and stereo_mode not in _STEREO_FIELD:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if bits not in (8, 16):
        raise ValueError(f"unsupported FLAC encode bit depth {bits}")
    arr = np.asarray(wave, np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_ch = arr.shape
    if not (1 <= n_ch <= 8):
        raise ValueError("1-8 channels")
    full = 1 << (bits - 1)
    q = np.clip(np.round(arr * full), -full, full - 1).astype(np.int64)

    # STREAMINFO MD5: interleaved samples, little-endian, bits/8 bytes
    inter = q.reshape(-1)
    if bits == 8:
        md5 = hashlib.md5(inter.astype(np.int8).tobytes()).digest()
    else:
        md5 = hashlib.md5(inter.astype("<i2").tobytes()).digest()

    head = _BitWriter()
    last_block = n if n else 1
    min_bs = min(_BLOCKSIZE, n) or _BLOCKSIZE
    head.put(min(min_bs, ((n - 1) % _BLOCKSIZE + 1) if n else min_bs), 16)
    head.put(min(_BLOCKSIZE, max(n, 1)), 16)
    head.put(0, 24)  # min frame size unknown
    head.put(0, 24)  # max frame size unknown
    head.put(sample_rate, 20)
    head.put(n_ch - 1, 3)
    head.put(bits - 1, 5)
    head.put(n & ((1 << 36) - 1), 36)
    streaminfo = head.to_bytes() + md5
    assert len(streaminfo) == 34

    out = bytearray(_MAGIC)
    out += bytes([0x80]) + struct.pack(">I", 34)[1:]  # last-block, type 0
    out += streaminfo

    for f_idx, start in enumerate(range(0, max(n, 1), _BLOCKSIZE)):
        block = q[start : start + _BLOCKSIZE]
        bs = len(block) if n else 0
        if bs == 0:
            break
        # subframes FIRST (exact bit costs decide the channel field)
        if n_ch == 2:
            left, right = block[:, 0], block[:, 1]
            mid = (left + right) >> 1
            side = left - right
            by_mode = {
                "independent": (left, bits, right, bits),
                "left_side": (left, bits, side, bits + 1),
                "right_side": (side, bits + 1, right, bits),
                "mid_side": (mid, bits, side, bits + 1),
            }
            if stereo_mode == "auto":
                coded = {
                    m: (_subframe_bits(a, ab), _subframe_bits(b, bb))
                    for m, (a, ab, b, bb) in by_mode.items()
                }
                mode = min(coded, key=lambda m: len(coded[m][0]) + len(coded[m][1]))
            else:
                mode = stereo_mode
                a, ab, b, bb = by_mode[mode]
                coded = {mode: (_subframe_bits(a, ab), _subframe_bits(b, bb))}
            ch_field = _STEREO_FIELD[mode]
            subs = list(coded[mode])
        else:
            ch_field = n_ch - 1
            subs = [_subframe_bits(block[:, ch], bits) for ch in range(n_ch)]

        bw = _BitWriter()
        bw.put(_SYNC, 14)
        bw.put(0, 1)  # reserved
        bw.put(0, 1)  # fixed blocksize strategy
        bw.put(0b0111, 4)  # blocksize: 16-bit value-1 at header end
        bw.put(0b0000, 4)  # sample rate: from STREAMINFO
        bw.put(ch_field, 4)
        bw.put({8: 0b001, 16: 0b100}[bits], 3)
        bw.put(0, 1)  # reserved
        _coded_number_encode(bw, f_idx)
        bw.put(bs - 1, 16)
        hdr = bw.to_bytes()
        bw = _BitWriter()
        bw.put_bits(np.unpackbits(np.frombuffer(hdr, np.uint8)))
        bw.put(crc8(hdr), 8)

        for sb in subs:
            bw.put_bits(sb)
        bw.align_byte()
        frame = bw.to_bytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


# frame-header channel-assignment field per stereo mode (RFC 9639 §9.1.3)
_STEREO_FIELD = {
    "independent": 1,
    "left_side": 0b1000,
    "right_side": 0b1001,
    "mid_side": 0b1010,
}


def _subframe_bits(x: np.ndarray, bits: int) -> np.ndarray:
    """Code one subframe and return its bit array (uint8 of BITS) —
    lets the frame encoder price channel assignments exactly before
    committing a header."""
    bw = _BitWriter()
    _write_subframe(bw, x, bits)
    return (
        np.concatenate(bw.chunks) if bw.chunks else np.zeros(0, np.uint8)
    )


def _write_subframe(bw: _BitWriter, x: np.ndarray, bits: int) -> None:
    bs = len(x)
    if np.all(x == x[0]):
        bw.put(0, 1)
        bw.put(0b000000, 6)  # CONSTANT
        bw.put(0, 1)
        bw.put(int(x[0]) & ((1 << bits) - 1), bits)
        return
    # candidates: fixed orders 0-2 and LPC(4, 8), by exact rice cost
    best = None
    for order in range(0, min(3, bs)):
        res = _fixed_residual(x, order)
        u = _zigzag(res)
        k, cost = _best_rice_param(u)
        total = order * bits + cost
        if best is None or total < best[0]:
            best = (total, ("fixed", order, None, None), k, u)
    xf = x.astype(np.float64)
    for order in _LPC_ORDERS:
        if bs <= order * 2:
            continue
        autoc = np.array(
            [float(np.dot(xf[: bs - lag], xf[lag:])) for lag in range(order + 1)]
        )
        lpc = _levinson_durbin(autoc, order)
        if lpc is None:
            continue
        ql = _quantize_lpc(lpc, _LPC_PRECISION)
        if ql is None:
            continue
        q, shift = ql
        u = _zigzag(_lpc_residual(x, q, shift))
        kk, cost = _best_rice_param(u)
        total = order * bits + 4 + 5 + order * _LPC_PRECISION + cost
        if total < best[0]:
            best = (total, ("lpc", order, q, shift), kk, u)
    total, (kind, order, q, shift), k, u = best
    if total >= bs * bits:
        bw.put(0, 1)
        bw.put(0b000001, 6)  # VERBATIM
        bw.put(0, 1)
        mask = (1 << bits) - 1
        for v in x.tolist():
            bw.put(v & mask, bits)
        return
    bw.put(0, 1)
    if kind == "fixed":
        bw.put(0b001000 | order, 6)  # FIXED
    else:
        bw.put(0b100000 | (order - 1), 6)  # LPC
    bw.put(0, 1)  # no wasted bits
    mask = (1 << bits) - 1
    for v in x[:order].tolist():  # warmup samples
        bw.put(v & mask, bits)
    if kind == "lpc":
        bw.put(_LPC_PRECISION - 1, 4)
        bw.put(shift, 5)
        pmask = (1 << _LPC_PRECISION) - 1
        for c in q.tolist():
            bw.put(c & pmask, _LPC_PRECISION)
    bw.put(0b00, 2)  # residual method: RICE (4-bit params)
    bw.put(0, 4)  # partition order 0
    max_res_bits = int(u.max()).bit_length() if len(u) else 1
    if k >= 15 or max_res_bits > 32:
        # escape: verbatim residuals at a fixed width
        width = max(max_res_bits, 1)
        bw.put(15, 4)
        bw.put(width, 5)
        for v in u.tolist():
            bw.put(int(v), width)
    else:
        bw.put(k, 4)
        bw.put_bits(_rice_encode_bits(u, k))


# ---------- decode ----------

def is_flac(data: bytes) -> bool:
    return data[:4] == _MAGIC


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC blob -> ((n_frames, n_channels) float32 in [-1, 1],
    sample_rate) — the decode_wav contract. Verifies CRC-8/CRC-16."""
    if not is_flac(data):
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("truncated FLAC metadata")
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    n_ch = si.read(3) + 1
    bits = si.read(5) + 1
    total = si.read(36)

    chans: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    got = 0
    # ONE reader for the whole frame section: its bit/next-one tables
    # are O(file) to build, so per-frame construction would be O(file²)
    br = _BitReader(data, pos)
    while pos < len(data) and (total == 0 or got < total):
        pos, block = _read_frame(br, data, pos, n_ch, bits)
        for c in range(n_ch):
            chans[c].append(block[c])
        got += len(block[0])
    full = np.stack(
        [np.concatenate(c) if c else np.zeros(0, np.int64) for c in chans],
        axis=1,
    )
    if total:
        full = full[:total]
    md5_stored = bytes(streaminfo[18:34])
    if md5_stored != b"\x00" * 16 and bits % 8 == 0:
        inter = full.reshape(-1)
        if bits == 8:
            raw = inter.astype(np.int8).tobytes()
        elif bits == 16:
            raw = inter.astype("<i2").tobytes()
        elif bits == 24:
            raw = (
                (inter & 0xFFFFFF)
                .astype("<u4")
                .view(np.uint8)
                .reshape(-1, 4)[:, :3]
                .tobytes()
            )
        else:
            raw = inter.astype("<i4").tobytes()
        if hashlib.md5(raw).digest() != md5_stored:
            raise ValueError("FLAC STREAMINFO MD5 mismatch")
    scale = float(1 << (bits - 1))
    return (full / scale).astype(np.float32), sample_rate


def _read_frame(
    br: _BitReader, data: bytes, pos: int, n_ch: int, bits: int
) -> tuple[int, list[np.ndarray]]:
    br.pos = pos * 8
    if br.read(14) != _SYNC:
        raise ValueError("lost FLAC frame sync")
    br.read(1)  # reserved
    br.read(1)  # blocking strategy (coded number absorbs the difference)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    br.read(1)
    _coded_number_decode(br)
    if bs_code == 0b0110:
        bs = br.read(8) + 1
    elif bs_code == 0b0111:
        bs = br.read(16) + 1
    elif bs_code == 1:
        bs = 192
    elif 2 <= bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif bs_code >= 8:
        bs = 256 << (bs_code - 8)
    else:
        raise ValueError(f"reserved blocksize code {bs_code}")
    if sr_code == 0b1100:
        br.read(8)
    elif sr_code in (0b1101, 0b1110):
        br.read(16)
    bps_map = {0: bits, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    f_bits = bps_map[bps_code]
    if ch_code > 0b1010:
        raise ValueError(f"reserved channel assignment {ch_code}")
    f_nch = 2 if ch_code >= 8 else ch_code + 1
    if f_nch != n_ch:
        raise ValueError("frame/STREAMINFO channel mismatch")
    # br.pos counts bits from byte 0 of `data` (pos_bytes seeds it), so
    # bit//8 is already an absolute byte offset
    hdr_bytes = data[pos : br.pos // 8]
    if br.read(8) != crc8(hdr_bytes):
        raise ValueError("FLAC frame header CRC mismatch")

    if ch_code < 8:
        block = [_read_subframe(br, bs, f_bits) for _ in range(f_nch)]
    else:
        # stereo decorrelation: the SIDE subframe is coded at bps+1
        b0 = _read_subframe(br, bs, f_bits + (1 if ch_code == 0b1001 else 0))
        b1 = _read_subframe(br, bs, f_bits + (1 if ch_code != 0b1001 else 0))
        if ch_code == 0b1000:  # left/side: side = L - R
            block = [b0, b0 - b1]
        elif ch_code == 0b1001:  # right/side: side = L - R
            block = [b1 + b0, b1]
        else:  # mid/side: mid = (L + R) >> 1 (floor), side = L - R
            mid2 = (b0 << 1) | (b1 & 1)  # (side & 1) carries (L+R)'s parity
            block = [(mid2 + b1) >> 1, (mid2 - b1) >> 1]
    br.align_byte()
    end = br.pos // 8
    frame_bytes = data[pos:end]
    footer = struct.unpack(">H", data[end : end + 2])[0]
    if footer != crc16(frame_bytes):
        raise ValueError("FLAC frame CRC-16 mismatch")
    return end + 2, block


def _read_subframe(br: _BitReader, bs: int, bits: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bits - wasted

    def signed(v: int, width: int) -> int:
        return v - (1 << width) if v >= (1 << (width - 1)) else v

    if stype == 0:  # CONSTANT
        out = np.full(bs, signed(br.read(eff), eff), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array(
            [signed(br.read(eff), eff) for _ in range(bs)], np.int64
        )
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = np.array(
            [signed(br.read(eff), eff) for _ in range(order)], np.int64
        )
        res = _read_residual(br, bs, order)
        out = (
            _fixed_restore(res, warm, order) if order else res.astype(np.int64)
        )
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warm = np.array(
            [signed(br.read(eff), eff) for _ in range(order)], np.int64
        )
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 15")
        shift = signed(br.read(5), 5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        q = np.array(
            [signed(br.read(precision), precision) for _ in range(order)],
            np.int64,
        )
        res = _read_residual(br, bs, order)
        out = _lpc_restore(res, warm, q, shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted if wasted else out


def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    out = []
    for p in range(nparts):
        n = bs // nparts - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == esc:
            width = br.read(5)
            u = np.array([br.read(width) for _ in range(n)], np.uint64)
        else:
            u = _rice_decode(br, n, k)
        out.append(_unzigzag(u))
    return np.concatenate(out)
