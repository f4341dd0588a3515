"""Netpbm (PNM) codec: PBM/PGM/PPM, ASCII and binary — pure numpy.

The PNM family is the simplest wild raster format a crawl meets
(scientific pipelines, scanners, netpbm toolchains emit it; CPython's
third-party-encoded test logo ships as P4/P5/P6). All six variants
decode:

  P1/P2/P3  ASCII bitmap / graymap / pixmap (whitespace-separated
            decimal samples, '#' comments legal anywhere in the header
            and between samples)
  P4        binary bitmap, rows packed MSB-first, byte-aligned rows
  P5/P6     binary graymap / pixmap, 1 byte per sample at maxval<=255,
            2 bytes BIG-endian at maxval<=65535

Output is always (h, w, 3) uint8 RGB: bitmaps map 1->black 0->white
(PBM polarity), gray replicates, 16-bit samples scale by
round(v * 255 / maxval).

encode_pnm emits binary P6 at maxval 255 — lossless for arbitrary
8-bit RGB, so "ppm" joins images.LOSSLESS_FMTS and the exact-match
branch of the payload invariant (BASELINE.json input_hint).

No reference counterpart: RovoMe/JIRLbot never decodes payloads; this
serves the graft's decoded-pixel invariant like the PNG/TIFF codecs.
"""

from __future__ import annotations

import numpy as np

from jirlbot_spark.functions.limits import check_dims

_MAGICS = {b"P1": 1, b"P2": 2, b"P3": 3, b"P4": 4, b"P5": 5, b"P6": 6}


def encode_pnm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    pixels = np.ascontiguousarray(pixels, np.uint8)
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _header_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated decimal header tokens, honoring
    '#'-to-newline comments. Returns (values, offset past the single
    whitespace byte that terminates the last token)."""
    toks: list[int] = []
    i = 0
    ln = len(data)
    while len(toks) < n:
        while i < ln and data[i : i + 1].isspace():
            i += 1
        if i < ln and data[i] == 0x23:  # '#'
            while i < ln and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < ln and not data[j : j + 1].isspace() and data[j] != 0x23:
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(int(data[i:j]))
        i = j
    if i >= ln or not data[i : i + 1].isspace():
        raise ValueError("PNM header not whitespace-terminated")
    return toks, i + 1


def _ascii_samples(data: bytes, start: int, count: int) -> np.ndarray:
    """Parse ASCII sample payload (P1/P2/P3); strips '#' comments."""
    body = data[start:]
    if b"#" in body:
        lines = body.split(b"\n")
        body = b"\n".join(ln.split(b"#", 1)[0] for ln in lines)
    vals = np.array(body.split(), dtype=np.int64)
    if vals.size < count:
        raise ValueError("truncated ASCII PNM payload")
    return vals[:count]


def decode_pnm(data: bytes) -> np.ndarray:
    """Any P1-P6 -> (h, w, 3) uint8 RGB."""
    kind = _MAGICS.get(data[:2])
    if kind is None:
        raise ValueError("not a PNM file")
    bitmap = kind in (1, 4)
    n_head = 2 if bitmap else 3  # PBM has no maxval
    head, off = _header_tokens(data[2:], n_head)
    off += 2
    w, h = head[0], head[1]
    check_dims(w, h, "PNM")
    maxval = 1 if bitmap else head[2]
    if not 1 <= maxval <= 65535:
        raise ValueError(f"bad PNM maxval {maxval}")
    channels = 3 if kind in (3, 6) else 1
    count = w * h * channels

    if kind in (1, 2, 3):
        if kind == 1:
            # P1 digits need no separating whitespace per spec
            body = data[off - 1 :]
            if b"#" in body:
                body = b"\n".join(
                    ln.split(b"#", 1)[0] for ln in body.split(b"\n")
                )
            arr = np.frombuffer(body, np.uint8)
            digits = arr[(arr == 0x30) | (arr == 0x31)] - 0x30
            if digits.size < count:
                raise ValueError("truncated P1 payload")
            vals = digits[:count].astype(np.int64)
        else:
            vals = _ascii_samples(data, off - 1, count)
    elif kind == 4:
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        raw = np.frombuffer(data, np.uint8, offset=off, count=need)
        bits = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w]
        vals = bits.reshape(-1).astype(np.int64)
    else:  # P5/P6 binary
        if maxval <= 255:
            vals = np.frombuffer(
                data, np.uint8, offset=off, count=count
            ).astype(np.int64)
        else:
            vals = np.frombuffer(
                data, np.dtype(">u2"), offset=off, count=count
            ).astype(np.int64)

    if (vals < 0).any() or (vals > maxval).any():
        raise ValueError("PNM sample out of range")
    if bitmap:
        samples = np.where(vals == 1, 0, 255).astype(np.uint8)
    elif maxval == 255:
        samples = vals.astype(np.uint8)
    else:
        samples = ((vals * 255 + maxval // 2) // maxval).astype(np.uint8)
    img = samples.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img)


def is_pnm(data: bytes) -> bool:
    return data[:2] in _MAGICS and len(data) > 2 and data[2:3].isspace()
