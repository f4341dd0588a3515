"""AIFF/AIFC and Sun AU audio codecs + G.711 µ-law/A-law expansion.

The classic uncompressed-audio trio is WAV (RIFF, functions/media.py),
AIFF (IFF, this module) and AU (Sun, this module); wild crawl audio
that isn't lossy-coded is almost always one of the three. Both decode
paths here are pure numpy/struct, like the WAV/FLAC codecs, and both
are validated against THIRD-PARTY-ENCODED files: CPython's
Lib/test/audiodata ships the same pluck clip encoded to all three
containers at 8/16/24/32 bits plus µ-law AU and A-law AIFC
(tests/test_wild_files.py pins the cross-container sample identity).

G.711 expansion uses the exact segment/mantissa recurrences (µ-law:
complement, ((mant<<3)+0x84)<<exp − 0x84; A-law: XOR 0x55,
((mant<<4)+0x108)<<(exp−1) with the 16× scale the 16-bit convention
uses, sign bit MEANING + for A-law and − for µ-law) — pinned by an
exhaustive 256-value equality test against stdlib audioop, a
separately-authored implementation.

Format boundaries (explicit gates, not silent wrong answers):
  AU:   encodings 1 (µ-law), 2-5 (PCM 8/16/24/32 BE), 6 (f32 BE),
        27 (A-law); others raise NotImplementedError.
  AIFF: PCM 1-32 bit big-endian (8-bit SIGNED, unlike WAV); AIFC
        compression NONE/sowt (LE16)/ulaw/ULAW/alaw/ALAW; fl32/fl64
        and lossy AIFC codecs raise NotImplementedError.
The 80-bit extended sample rate in COMM decodes exactly (sign,
15-bit exponent, explicit-integer-bit 64-bit mantissa).
"""

from __future__ import annotations

import struct

import numpy as np


def _ulaw_table() -> np.ndarray:
    u = (~np.arange(256)) & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    a = np.arange(256) ^ 0x55
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


ULAW_TABLE = _ulaw_table()
ALAW_TABLE = _alaw_table()


def _g711_to_float(payload: bytes, table: np.ndarray) -> np.ndarray:
    return table[np.frombuffer(payload, np.uint8)].astype(np.float32) / 32768.0


def _pcm_be_to_float(payload: bytes, bits: int) -> np.ndarray:
    """Big-endian signed PCM in ceil(bits/8) bytes, left-justified."""
    nbytes = (bits + 7) // 8
    raw = np.frombuffer(payload[: len(payload) // nbytes * nbytes], np.uint8)
    b = raw.reshape(-1, nbytes).astype(np.int64)
    v = np.zeros(len(b), np.int64)
    for i in range(nbytes):
        v = (v << 8) | b[:, i]
    width = nbytes * 8
    v = np.where(v >= (1 << (width - 1)), v - (1 << width), v)
    # samples are left-justified within their container bytes
    return v.astype(np.float32) / float(1 << (width - 1))


# ---- Sun AU ----

_AU_MAGIC = b".snd"


def is_au(data: bytes) -> bool:
    return len(data) >= 24 and data[:4] == _AU_MAGIC


def decode_au(data: bytes) -> tuple[np.ndarray, int]:
    """((n_frames, n_channels) float32 in [-1, 1], sample_rate)."""
    if not is_au(data):
        raise ValueError("not a Sun AU stream")
    offset, size, enc, sr, n_ch = struct.unpack(">IIIII", data[4:24])
    if offset < 24 or n_ch < 1 or sr < 1:
        raise ValueError("malformed AU header")
    end = len(data) if size == 0xFFFFFFFF else min(len(data), offset + size)
    payload = data[offset:end]
    if enc == 1:
        flat = _g711_to_float(payload, ULAW_TABLE)
    elif enc in (2, 3, 4, 5):
        flat = _pcm_be_to_float(payload, (enc - 1) * 8)
    elif enc == 6:
        flat = np.frombuffer(payload, ">f4").astype(np.float32)
    elif enc == 27:
        flat = _g711_to_float(payload, ALAW_TABLE)
    else:
        raise NotImplementedError(f"AU encoding {enc}")
    n = len(flat) // n_ch
    return flat[: n * n_ch].reshape(n, n_ch), int(sr)


def encode_au(
    wave: np.ndarray, sample_rate: int, encoding: str = "pcm16"
) -> bytes:
    """Minimal AU encoder for fixtures: pcm16 (big-endian) or ulaw
    (nearest-expansion-value companding via table search — exact G.711
    round-trip for values ON the table)."""
    arr = np.asarray(wave, np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    q = np.clip(np.round(arr * 32768.0), -32768, 32767).astype(
        np.int16
    ).reshape(-1)
    if encoding == "pcm16":
        enc, payload = 3, q.astype(">i2").tobytes()
    elif encoding == "ulaw":
        order = np.argsort(ULAW_TABLE.astype(np.int32), kind="stable")
        svals = ULAW_TABLE.astype(np.int32)[order]
        idx = np.searchsorted(svals, q.astype(np.int32))
        idx = np.clip(idx, 0, 255)
        lo = np.clip(idx - 1, 0, 255)
        pick = np.where(
            np.abs(svals[lo] - q) <= np.abs(svals[idx] - q), lo, idx
        )
        enc, payload = 1, order[pick].astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported AU fixture encoding {encoding}")
    hdr = _AU_MAGIC + struct.pack(
        ">IIIII", 24, len(payload), enc, int(sample_rate), n_ch
    )
    return hdr + payload


# ---- AIFF / AIFC ----


def is_aiff(data: bytes) -> bool:
    return (
        len(data) >= 12
        and data[:4] == b"FORM"
        and data[8:12] in (b"AIFF", b"AIFC")
    )


def _decode_extended(b: bytes) -> float:
    """IEEE 754 80-bit extended float (the COMM sample-rate field)."""
    if len(b) < 10:
        raise ValueError("truncated extended float")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _encode_extended(v: float) -> bytes:
    if v <= 0:
        raise ValueError("sample rate must be positive")
    exp = 16383 + 63
    m = float(v)
    while m >= 2.0**64:
        m /= 2.0
        exp += 1
    while m < 2.0**63:
        m *= 2.0
        exp -= 1
    return struct.pack(">HQ", exp, int(round(m)))


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    """((n_frames, n_channels) float32 in [-1, 1], sample_rate) for
    AIFF and the AIFC compressions listed in the module docstring."""
    if not is_aiff(data):
        raise ValueError("not an AIFF/AIFC stream")
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    end = min(len(data), 8 + struct.unpack(">I", data[4:8])[0])
    comm = ssnd = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + clen + (clen % 2)  # IFF chunks are word-aligned
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        raise ValueError("missing/truncated COMM or SSND chunk")
    n_ch, _n_frames, bits = struct.unpack(">HIH", comm[:8])
    sr = _decode_extended(comm[8:18])
    compression = b"NONE"
    if is_aifc and len(comm) >= 22:
        compression = comm[18:22]
    if n_ch < 1 or not (1 <= bits <= 32) or sr <= 0:
        raise ValueError("malformed COMM chunk")
    off, _blk = struct.unpack(">II", ssnd[:8])
    payload = ssnd[8 + off :]
    comp = compression.lower()
    if comp == b"none":
        flat = _pcm_be_to_float(payload, bits)
    elif comp == b"sowt":  # little-endian PCM16 (Mac convention)
        if bits != 16:
            raise NotImplementedError(f"sowt at {bits} bits")
        flat = np.frombuffer(
            payload[: len(payload) // 2 * 2], "<i2"
        ).astype(np.float32) / 32768.0
    elif comp == b"ulaw":
        flat = _g711_to_float(payload, ULAW_TABLE)
    elif comp == b"alaw":
        flat = _g711_to_float(payload, ALAW_TABLE)
    else:
        raise NotImplementedError(
            f"AIFC compression {compression!r} needs a codec library"
        )
    n = len(flat) // n_ch
    return flat[: n * n_ch].reshape(n, n_ch), int(round(sr))


def encode_aiff(wave: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Minimal AIFF (not AIFC) PCM big-endian encoder for fixtures."""
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported AIFF fixture depth {bits}")
    arr = np.asarray(wave, np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    full = 1 << (bits - 1)
    q = np.clip(np.round(arr * full), -full, full - 1).astype(
        np.int64
    ).reshape(-1)
    nbytes = bits // 8
    out = np.zeros((len(q), nbytes), np.uint8)
    u = (q & ((1 << bits) - 1)).astype(np.uint64)
    for i in range(nbytes):
        out[:, i] = (u >> ((nbytes - 1 - i) * 8)) & 0xFF
    payload = out.tobytes()
    comm = struct.pack(">HIH", n_ch, n_frames, bits) + _encode_extended(
        float(sample_rate)
    )
    ssnd = struct.pack(">II", 0, 0) + payload
    body = b"AIFF"
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(chunk)) + chunk
        if len(chunk) % 2:
            body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + body
