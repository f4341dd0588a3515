"""Self-contained baseline JPEG codec (pure numpy + stdlib).

Activates the north rule's lossy branch of the per-row payload invariant
(decoded pixels PSNR >= 40 dB vs the reference) inside this sandbox, which
ships no image libraries. Everything here is from the public JPEG spec
(ITU-T T.81): baseline sequential DCT, 8-bit, YCbCr 4:4:4, optimized
(per-image canonical) Huffman tables written into DHT — so the files are
ordinary JPEGs any decoder can read, and the decoder below reads any
baseline 4:4:4 / grayscale JPEG without restart markers.

Scope notes (honest gates, not silent wrongness):
  - encoder: 3-component 4:4:4 only (no chroma subsampling — simplest
    correct variant; subsampling is a rate optimization, not a semantic)
  - decoder: SOF0, 1 or 3 components, all sampling factors 1, no DRI;
    anything else raises NotImplementedError

Determinism: encode(pixels, quality) is a pure function (numpy round,
canonical Huffman with stable tie-breaks), so fixture goldens replay.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants (ITU-T T.81 Annex K base quantization tables) ----

_QY_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QC_BASE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QY_BASE, _QC_BASE):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _zigzag_order() -> np.ndarray:
    """64 (row, col) pairs in JPEG zigzag order, generated, not typed."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij = ij[::-1]  # even diagonals run bottom-left -> top-right
        order.extend(ij)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]  # block.flat indices in zigzag order


def _dct_basis8() -> np.ndarray:
    k = np.arange(8)
    b = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0)
    b[0] *= 1 / np.sqrt(2)
    return b * 0.5  # sqrt(2/8)


_B8 = _dct_basis8()

# ---- color ----


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---- canonical Huffman (per-image optimal; JPEG 16-bit length cap) ----


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code length per symbol: plain Huffman, then Annex K.3-style folding
    of lengths > 16, with a reserved dummy symbol so no REAL symbol gets
    the all-ones code (the libjpeg trick: symbol 256 sorts last)."""
    items = [(f, s) for s, f in freqs.items() if f > 0]
    items.append((1, 256))  # reserved: will absorb the all-ones code
    if len(items) == 1:
        return {}
    # Huffman via repeated merge of two lightest trees (deterministic
    # tie-break on smallest symbol for reproducible files)
    import heapq

    heap = [(f, s, {s: 0}) for f, s in sorted(items)]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, s1, d1 = heapq.heappop(heap)
        f2, s2, d2 = heapq.heappop(heap)
        merged = {s: d + 1 for s, d in d1.items()}
        merged.update({s: d + 1 for s, d in d2.items()})
        heapq.heappush(heap, (f1 + f2, min(s1, s2), merged))
    lengths = heap[0][2]
    # fold lengths deeper than 16 (JPEG cap): repeatedly take a symbol at
    # the deepest level and pair it one level up (Annex K.3 Adjust_BITS).
    # Depth is bounded by the symbol count (<= 257), so size for that.
    counts = np.zeros(260, dtype=np.int64)
    for d in lengths.values():
        counts[d] += 1
    for depth in range(len(counts) - 1, 16, -1):
        while counts[depth] > 0:
            j = depth - 2
            while counts[j] == 0:
                j -= 1
            counts[depth] -= 2
            counts[depth - 1] += 1
            counts[j] -= 1
            counts[j + 1] += 2
    # reassign lengths canonically: shortest lengths to most frequent
    # symbols (stable: ties by symbol value)
    by_freq = sorted(lengths.keys(), key=lambda s: (-freqs.get(s, 1), s))
    out = {}
    li = 1
    for s in by_freq:
        while counts[li] == 0:
            li += 1
        counts[li] -= 1
        out[s] = li
    out.pop(256, None)  # dummy had the lowest freq -> deepest/all-ones
    return out


def _canonical_codes(lengths: dict[int, int]):
    """(bits[1..16], huffval, code dict symbol->(code, length)) with the
    canonical ordering JPEG's DHT segment implies."""
    bits = [0] * 17
    order = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    huffval = [s for s, _ in order]
    for _, ln in order:
        bits[ln] += 1
    codes = {}
    code = 0
    idx = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            codes[huffval[idx]] = (code, ln)
            code += 1
            idx += 1
        code <<= 1
    return bits, huffval, codes


# ---- bit I/O ----


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed
            else:
                # marker (EOI etc.): feed 1-bits, don't advance past it
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map the `size`-bit raw value to its signed amplitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _bitsize(v: int) -> int:
    return int(abs(v)).bit_length()


# ---- encoder ----


def _component_blocks(chan: np.ndarray) -> np.ndarray:
    """(n_blocks, 8, 8) in MCU raster order, edge-replicated to 8|dims."""
    h, w = chan.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    hh, ww = chan.shape
    return (
        chan.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _encode_channel_coefs(chan: np.ndarray, q: np.ndarray) -> np.ndarray:
    blocks = _component_blocks(chan) - 128.0
    coefs = np.einsum("ij,njk,lk->nil", _B8, blocks, _B8)
    return np.round(coefs / q[None, :, :]).astype(np.int32)


def _symbol_stream(coefs: np.ndarray):
    """(dc_symbols, ac_symbols, emit_block) for one component's blocks:
    the symbol lists feed the Huffman-table optimizer; emit_block(writer,
    bi, dc_codes, ac_codes) writes block bi's entropy-coded bits. DC is
    differentially coded in block order (per T.81 F.1.1.5)."""
    zz = coefs.reshape(len(coefs), 64)[:, _ZZ_FLAT]
    dc = zz[:, 0].astype(np.int64)
    diffs = np.diff(np.concatenate([[0], dc]))
    dc_syms = []
    ac_syms = []
    per_block_ac = []
    for bi in range(len(zz)):
        dc_syms.append(_bitsize(int(diffs[bi])))
        acs = []
        row = zz[bi, 1:]
        nz = np.nonzero(row)[0]
        prev = -1
        for idx in nz:
            run = idx - prev - 1
            prev = idx
            while run > 15:
                acs.append((0xF0, 0, 0))
                run -= 16
            v = int(row[idx])
            size = _bitsize(v)
            acs.append(((run << 4) | size, v, size))
        if prev < 62:
            acs.append((0x00, 0, 0))  # EOB
        per_block_ac.append(acs)
        ac_syms.extend(sym for sym, _, _ in acs)

    def emit_block(w: _BitWriter, bi: int, dc_codes, ac_codes) -> None:
        d = int(diffs[bi])
        size = _bitsize(d)
        code, ln = dc_codes[size]
        w.put(code, ln)
        if size:
            w.put(d if d >= 0 else d + (1 << size) - 1, size)
        for sym, v, vsize in per_block_ac[bi]:
            code, ln = ac_codes[sym]
            w.put(code, ln)
            if vsize:
                w.put(v if v >= 0 else v + (1 << vsize) - 1, vsize)

    return dc_syms, ac_syms, emit_block


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Baseline 4:4:4 JPEG of an (h, w, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    qy, qc = _quant_tables(quality)
    ycc = _rgb_to_ycbcr(pixels)
    comps = [
        _encode_channel_coefs(ycc[..., 0], qy),
        _encode_channel_coefs(ycc[..., 1], qc),
        _encode_channel_coefs(ycc[..., 2], qc),
    ]
    streams = [_symbol_stream(c) for c in comps]
    # optimized Huffman: luma tables from comp 0, chroma from comps 1+2
    def table(freq_lists):
        freqs: dict[int, int] = {}
        for fl in freq_lists:
            for s in fl:
                freqs[s] = freqs.get(s, 0) + 1
        return _canonical_codes(_huffman_lengths(freqs))

    dc_y = table([streams[0][0]])
    ac_y = table([streams[0][1]])
    dc_c = table([streams[1][0], streams[2][0]])
    ac_c = table([streams[1][1], streams[2][1]])

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in ((0, qy), (1, qc)):
        out += _seg(
            0xFFDB,
            bytes([tid]) + bytes(int(q.flat[i]) for i in _ZZ_FLAT),
        )
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += _seg(0xFFC0, sof)
    for cls, tid, (bits, huffval, _) in (
        (0, 0, dc_y),
        (1, 0, ac_y),
        (0, 1, dc_c),
        (1, 1, ac_c),
    ):
        out += _seg(
            0xFFC4,
            bytes([(cls << 4) | tid])
            + bytes(bits[1:17])
            + bytes(huffval),
        )
    sos = bytes([3]) + bytes(
        b for cid, tds in ((1, 0x00), (2, 0x11), (3, 0x11)) for b in (cid, tds)
    ) + bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    # interleaved scan: MCU = one 8x8 block of each component (4:4:4)
    wtr = _BitWriter()
    n_blocks = len(comps[0])
    tables = ((dc_y[2], ac_y[2]), (dc_c[2], ac_c[2]), (dc_c[2], ac_c[2]))
    for bi in range(n_blocks):
        for (_, _, emit_block), (dcc, acc) in zip(streams, tables):
            emit_block(wtr, bi, dcc, acc)
    wtr.flush()
    out += bytes(wtr.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ----


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG (SOF0, sampling factors all 1, no DRI) to an
    (h, w, 3) uint8 RGB array (grayscale replicates into 3 channels)."""
    assert data[:2] == b"\xff\xd8", "not a JPEG"
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    scan_comps: list[dict] = []
    while pos < len(data):
        assert data[pos] == 0xFF, f"bad marker sync at {pos}"
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                vals = np.frombuffer(body[p + 1 : p + 65], np.uint8)
                tbl = np.zeros(64, np.int32)
                tbl[_ZZ_FLAT] = vals
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                table: dict[tuple[int, int], int] = {}
                code = 0
                vi = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(cls, tid)] = table
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            assert prec == 8, "8-bit only"
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (sampling factors != 1)"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (not SOF0)")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tds = body[1 + 2 * si : 3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cid)
                comp["td"], comp["ta"] = tds >> 4, tds & 0xF
                scan_comps.append(comp)
            pos += seglen
            break  # entropy data follows
        pos += seglen

    assert comps and scan_comps, "no SOS found"
    bw = (w + 7) // 8
    bh = (h + 7) // 8
    n_blocks = bw * bh
    rdr = _BitReader(data, pos)

    def decode_huff(table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | rdr.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    planes = [
        np.zeros((bh * 8, bw * 8), np.float64) for _ in scan_comps
    ]
    pred = [0] * len(scan_comps)
    for bi in range(n_blocks):
        by, bx = divmod(bi, bw)
        for ci, comp in enumerate(scan_comps):
            dct = huff[(0, comp["td"])]
            act = huff[(1, comp["ta"])]
            size = decode_huff(dct)
            diff = _extend(rdr.receive(size), size)
            pred[ci] += diff
            zz = np.zeros(64, np.int64)
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                sym = decode_huff(act)
                if sym == 0x00:  # EOB
                    break
                run, sz = sym >> 4, sym & 0xF
                if sym == 0xF0:
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(rdr.receive(sz), sz)
                k += 1
            block = np.zeros(64, np.float64)
            block[_ZZ_FLAT] = zz
            block = block.reshape(8, 8) * qt[comp["tq"]]
            px = _B8.T @ block @ _B8 + 128.0
            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px

    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
