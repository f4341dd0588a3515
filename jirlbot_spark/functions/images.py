"""Image payload codecs + perceptual hash (graft payload path).

The input contract (BASELINE.json:15) is an image+caption table
(image_id, bytes:binary, w, h, fmt, caption, phash:int64) with a per-row
invariant: decoded pixels allclose vs the source (PSNR>=40 dB for lossy
formats) and caption equality.

No PIL in this sandbox, so the codecs are self-contained numpy+stdlib:
  - png: real PNG (IHDR/IDAT/IEND, 8-bit RGB, filter 0; decoder handles
    filters 0-2) — lossless, exact-match invariant
  - bmp: 24-bit BI_RGB bottom-up with row padding — lossless
  - raw: w*h*3 bytes row-major RGB — lossless
  - jpeg: real baseline JPEG (functions/jpeg.py: DCT + quantization +
    optimized Huffman, pure numpy) — LOSSY, activating the mandated
    PSNR>=40dB branch of the per-row invariant; default quality 98
    keeps fixture-content PSNR >= ~43 dB.
  - gif: real GIF89a (functions/gif.py: variable-width LZW, global
    color table, interlace-capable decoder) — lossless for palettized
    content; fixture rows posterize first so the exact branch holds.

phash: classic DCT hash — resize to 32x32 grayscale (area mean-pool),
2D DCT-II, top-left 8x8 minus DC, median threshold -> 64-bit int. Pure
numpy (precomputed DCT basis, one matmul per side).

Spark surface: mapInPandas/pandas_udf batch wrappers; the per-image numpy
work happens inside Arrow batches (binary columns travel zero-copy).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

LOSSLESS_FMTS = ("png", "bmp", "raw", "gif")
LOSSY_FMTS = ("jpeg",)
JPEG_QUALITY = 98  # fixture-content PSNR >= ~43 dB (invariant floor: 40)


# ---------- PNG ----------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter type 0 per scanline."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    )
    idat = zlib.compress(rows.tobytes(), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            w, h, bitd, color = struct.unpack(">IIBB", body[:10])
            assert bitd == 8 and color == 2, "only 8-bit RGB supported"
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride)
    filters, rows = arr[:, 0], arr[:, 1:].copy()
    out = np.zeros_like(rows)
    prev = np.zeros(w * 3, np.int32)
    for y in range(h):
        f = filters[y]
        cur = rows[y].astype(np.int32)
        if f == 0:
            line = cur
        elif f == 1:  # Sub
            line = np.cumsum(cur.reshape(w, 3), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            line = (cur + prev) % 256
        elif f == 3:  # Average — the left term forces a sequential pass,
            # but per-PIXEL (3 channels at once), not per-byte
            line = np.empty(w * 3, np.int32)
            c3 = cur.reshape(w, 3)
            p3 = prev.reshape(w, 3)
            l3 = line.reshape(w, 3)
            left = np.zeros(3, np.int32)
            for x in range(w):
                left = (c3[x] + ((left + p3[x]) >> 1)) & 255
                l3[x] = left
        elif f == 4:  # Paeth
            line = np.empty(w * 3, np.int32)
            c3 = cur.reshape(w, 3)
            p3 = prev.reshape(w, 3)
            l3 = line.reshape(w, 3)
            left = np.zeros(3, np.int32)
            upleft = np.zeros(3, np.int32)
            for x in range(w):
                up = p3[x]
                p = left + up - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - up),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (c3[x] + pred) & 255
                l3[x] = left
                upleft = up
        else:
            raise ValueError(f"invalid PNG filter {f}")
        out[y] = line.astype(np.uint8)
        prev = line
    return out.reshape(h, w, 3)


# ---------- BMP ----------

def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
    padded = np.zeros((h, row_size), np.uint8)
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + padded.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM", "not a BMP"
    (offset,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    assert bpp == 24, "only 24-bit BMP supported"
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(
        data, np.uint8, count=row_size * abs(h), offset=offset
    ).reshape(abs(h), row_size)
    bgr = arr[:, : w * 3].reshape(abs(h), w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if h > 0 else rgb


# ---------- RAW ----------

def encode_raw(pixels: np.ndarray) -> bytes:
    return pixels.tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, np.uint8, count=w * h * 3).reshape(h, w, 3)


# ---------- dispatch ----------

def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "jpeg":
        from jirlbot_spark.functions.jpeg import encode_jpeg

        return encode_jpeg(pixels, quality=JPEG_QUALITY)
    if fmt == "gif":
        # lossless iff pixels are palettized (<=256 colors) — fixture
        # rows are posterized before encode; see functions/gif.py
        from jirlbot_spark.functions.gif import encode_gif

        return encode_gif(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "jpeg":
        from jirlbot_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    if fmt == "gif":
        from jirlbot_spark.functions.gif import decode_gif

        return decode_gif(data)
    raise ValueError(f"unknown fmt {fmt!r}")


# ---------- invariants ----------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ---------- perceptual hash ----------

_DCT_N = 32


def _dct_basis(n: int = _DCT_N) -> np.ndarray:
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis[0] *= 1 / np.sqrt(2)
    return basis * np.sqrt(2 / n)


_BASIS = _dct_basis()


def _resize_area(gray: np.ndarray, n: int = _DCT_N) -> np.ndarray:
    """Area-mean resize to n×n (exact mean-pool when divisible, index-map
    nearest-area otherwise) — deterministic, no interpolation libs."""
    h, w = gray.shape
    ys = (np.arange(n + 1) * h // n).astype(int)
    xs = (np.arange(n + 1) * w // n).astype(int)
    csum = np.zeros((h + 1, w + 1), np.float64)
    csum[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    total = (
        csum[np.ix_(y1, x1)]
        - csum[np.ix_(y0, x1)]
        - csum[np.ix_(y1, x0)]
        + csum[np.ix_(y0, x0)]
    )
    return total / area


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64, row-major bit order)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_area(gray)
    dct = _BASIS @ small @ _BASIS.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC
    bits = block > med
    bits[0] = False
    val = 0
    for b in bits:
        val = (val << 1) | int(bool(b))
    return val - (1 << 64) if val >= (1 << 63) else val  # two's complement


def phash_batch(
    blobs: pd.Series, fmts: pd.Series, ws: pd.Series, hs: pd.Series
) -> pd.Series:
    out = np.zeros(len(blobs), dtype=np.int64)
    vals = zip(blobs.tolist(), fmts.tolist(), ws.tolist(), hs.tolist())
    for i, (b, f, w, h) in enumerate(vals):
        px = decode_image(bytes(b), f, int(w), int(h))
        out[i] = phash64(px)
    return pd.Series(out, index=blobs.index)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
