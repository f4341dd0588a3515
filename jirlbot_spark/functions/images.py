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
  - tiff/webp/ppm/exr/ras/sgi: real codecs in functions/tiff.py,
    webp.py, pnm.py, exr.py, legacy_rasters.py — lossless, exact-match
    invariant (EXR via HALF floats, which resolve 1/255 steps exactly).
  - ico: favicon container (ico.py — the one format every crawl
    fetches): decode handles multi-member files with DIB and PNG
    members; encode writes a single member (kind alternating by
    content so both paths run in the operator contract) — lossless.
  - cur/xbm/pgm/pbm: wild DECODE-only formats (ico.py,
    legacy_rasters.py, pnm.py) — a crawl meets them but they cannot
    carry RGB fixtures; validated against third-party-encoded files
    (tests/test_wild_files.py).

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

from jirlbot_spark.functions.limits import bounded_inflate, check_dims

LOSSLESS_FMTS = (
    "png", "bmp", "raw", "gif", "tiff", "webp", "ppm", "exr", "ras", "sgi",
    "ico", "tiffg4",
)
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


def _png_unfilter(
    raw: memoryview, w: int, h: int, channels: int, bitd: int
) -> tuple[np.ndarray, int]:
    """Undo per-scanline filtering for one (sub-)image: returns the
    (h, stride) byte matrix and the number of raw bytes consumed.
    Filters operate on BYTES at distance bpp = max(1, channels*bitd//8)
    (PNG spec 4.5.4), so every color type / depth shares this kernel."""
    if w == 0 or h == 0:
        return np.zeros((h, 0), np.uint8), 0
    stride = (w * channels * bitd + 7) // 8
    bpp = max(1, channels * bitd // 8)
    need = h * (stride + 1)
    arr = np.frombuffer(raw[:need], np.uint8).reshape(h, stride + 1)
    filters, rows = arr[:, 0], arr[:, 1:]
    # pad stride to a multiple of bpp so rows reshape into (units, bpp)
    pad = -stride % bpp
    units = (stride + pad) // bpp
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride + pad, np.int32)
    for y in range(h):
        f = filters[y]
        cur = np.zeros(stride + pad, np.int32)
        cur[:stride] = rows[y]
        if f == 0:
            line = cur
        elif f == 1:  # Sub
            line = np.cumsum(cur.reshape(units, bpp), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            line = (cur + prev) % 256
        elif f == 3:  # Average — the left term forces a sequential pass,
            # but per-UNIT (bpp bytes at once), not per-byte
            line = np.empty(stride + pad, np.int32)
            cb = cur.reshape(units, bpp)
            pb = prev.reshape(units, bpp)
            lb = line.reshape(units, bpp)
            left = np.zeros(bpp, np.int32)
            for x in range(units):
                left = (cb[x] + ((left + pb[x]) >> 1)) & 255
                lb[x] = left
        elif f == 4:  # Paeth
            line = np.empty(stride + pad, np.int32)
            cb = cur.reshape(units, bpp)
            pb = prev.reshape(units, bpp)
            lb = line.reshape(units, bpp)
            left = np.zeros(bpp, np.int32)
            upleft = np.zeros(bpp, np.int32)
            for x in range(units):
                up = pb[x]
                p = left + up - upleft
                pa, pb_, pc = (
                    np.abs(p - left),
                    np.abs(p - up),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb_) & (pa <= pc),
                    left,
                    np.where(pb_ <= pc, up, upleft),
                )
                left = (cb[x] + pred) & 255
                lb[x] = left
                upleft = up
        else:
            raise ValueError(f"invalid PNG filter {f}")
        out[y] = line[:stride].astype(np.uint8)
        prev = line
    return out, need


def _png_samples(
    rows: np.ndarray, w: int, channels: int, bitd: int
) -> np.ndarray:
    """(h, stride) filtered-out bytes -> (h, w, channels) uint8 samples
    (16-bit takes the high byte; 1/2/4-bit unpack MSB-first and scale
    to full 8-bit range — except palette indices, scaled by caller)."""
    h = len(rows)
    if bitd == 8:
        return rows.reshape(h, -1)[:, : w * channels].reshape(h, w, channels)
    if bitd == 16:
        return (
            rows.reshape(h, -1, 2)[:, : w * channels, 0]
            .reshape(h, w, channels)
        )
    # sub-byte depths: only valid for 1-channel color types
    bits = np.unpackbits(rows, axis=1)
    vals = np.zeros((h, rows.shape[1] * 8 // bitd), np.uint8)
    for b in range(bitd):
        vals = (vals << 1) | bits[:, b :: bitd][:, : vals.shape[1]]
    return vals[:, :w].reshape(h, w, 1)


# Adam7 pass origins/steps (PNG spec 8.2)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to (h, w, 3) uint8 RGB. Wild-capable: color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); bit
    depths 1/2/4/8/16; Adam7 interlacing; all five row filters. Alpha
    is dropped (payload pipelines carry RGB24); 16-bit samples take the
    high byte."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    plte = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            w, h, bitd, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if comp or filt:
                raise ValueError("bad PNG compression/filter method")
        elif typ == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"invalid PNG color type {color}")
    if bitd not in (1, 2, 4, 8, 16) or (
        bitd < 8 and color not in (0, 3)
    ) or (bitd == 16 and color == 3):
        raise ValueError(f"invalid bit depth {bitd} for color type {color}")
    check_dims(w, h, "PNG")
    # inflation bound: pixel bytes + one filter byte per row across all
    # passes (Adam7 splits the same pixels over <= 2h narrower rows)
    max_raw = h * ((w * channels * bitd + 7) // 8 + 2) + 64
    raw = memoryview(bounded_inflate(idat, max_raw))
    if inter == 0:
        rows, _ = _png_unfilter(raw, w, h, channels, bitd)
        samples = _png_samples(rows, w, channels, bitd)
    elif inter == 1:  # Adam7
        samples = np.zeros((h, w, channels), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            rows, used = _png_unfilter(raw[off:], pw, ph, channels, bitd)
            off += used
            samples[y0::dy, x0::dx] = _png_samples(rows, pw, channels, bitd)
    else:
        raise ValueError(f"invalid PNG interlace method {inter}")
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[samples[..., 0]]
    if bitd < 8 and color == 0:  # scale 1/2/4-bit gray to full range
        samples = (
            samples.astype(np.uint16) * (255 // ((1 << bitd) - 1))
        ).astype(np.uint8)
    if color == 0:
        return np.repeat(samples, 3, axis=2)
    if color == 4:  # gray + alpha: drop alpha
        return np.repeat(samples[..., :1], 3, axis=2)
    return samples[..., :3]  # RGB / RGBA (alpha dropped)


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
    """Decode a BITMAPINFOHEADER-family BMP to (h, w, 3) RGB.
    Wild-capable: 24/32-bit BI_RGB (alpha dropped), 1/4/8-bit paletted,
    BI_RLE8, 16/32-bit BI_BITFIELDS with arbitrary channel masks
    (V3 appended masks and V4/V5 in-header masks), top-down rows."""
    assert data[:2] == b"BM", "not a BMP"
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    ah = abs(h)
    check_dims(w, ah, "BMP")
    if compression == 3:  # BI_BITFIELDS
        if bpp not in (16, 32):
            raise NotImplementedError(f"BI_BITFIELDS at {bpp} bpp")
        # masks live in the header for V4/V5 (size >= 52) and directly
        # after a 40-byte V3 header otherwise — byte 54 either way
        masks = struct.unpack("<III", data[54:66])
        dt = "<u2" if bpp == 16 else "<u4"
        row_size = (w * bpp // 8 + 3) & ~3
        arr = np.frombuffer(
            data, np.uint8, count=row_size * ah, offset=offset
        ).reshape(ah, row_size)
        pix = arr[:, : w * bpp // 8].reshape(ah * w, bpp // 8).copy().view(
            dt
        ).reshape(ah, w).astype(np.uint32)
        chans = []
        for m in masks:
            if m == 0:
                chans.append(np.zeros((ah, w), np.uint8))
                continue
            shift = (m & -m).bit_length() - 1
            width = int(m).bit_count()
            v = (pix & m) >> shift
            if width < 8:
                v = v * 255 // ((1 << width) - 1)
            elif width > 8:
                v = v >> (width - 8)
            chans.append(v.astype(np.uint8))
        rgb = np.stack(chans, axis=-1)
        return rgb[::-1] if h > 0 else rgb
    if compression not in (0, 1):
        raise NotImplementedError(f"BMP compression {compression}")
    if bpp in (1, 4, 8):
        (ncolors,) = struct.unpack("<I", data[46:50])
        ncolors = ncolors or (1 << bpp)
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data, np.uint8, count=ncolors * 4, offset=pal_off
        ).reshape(ncolors, 4)[:, 2::-1]  # BGRX -> RGB
        if compression == 1:  # BI_RLE8
            if bpp != 8:
                raise ValueError("RLE8 requires 8-bit pixels")
            idx = _bmp_rle8(data[offset:], w, ah)
        else:
            row_bits = w * bpp
            row_size = ((row_bits + 31) // 32) * 4
            arr = np.frombuffer(
                data, np.uint8, count=row_size * ah, offset=offset
            ).reshape(ah, row_size)
            if bpp == 8:
                idx = arr[:, :w]
            else:
                bits = np.unpackbits(arr, axis=1)
                vals = np.zeros((ah, row_size * 8 // bpp), np.uint8)
                for b in range(bpp):
                    vals = (vals << 1) | bits[:, b::bpp][:, : vals.shape[1]]
                idx = vals[:, :w]
        rgb = pal[idx]
        return rgb[::-1] if h > 0 else rgb
    if compression == 1:
        raise ValueError("RLE8 requires 8-bit pixels")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP")
    nb = bpp // 8
    row_size = (w * nb + 3) & ~3
    arr = np.frombuffer(
        data, np.uint8, count=row_size * ah, offset=offset
    ).reshape(ah, row_size)
    bgr = arr[:, : w * nb].reshape(ah, w, nb)[:, :, 2::-1]  # drop alpha
    return bgr[::-1] if h > 0 else bgr


def _bmp_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) palette indices, bottom-up row order (the
    caller flips). Handles encoded runs, absolute mode with word
    padding, end-of-line (0,0), end-of-bitmap (0,1), delta (0,2)."""
    out = np.zeros((h, w), np.uint8)
    x = y = pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:  # encoded run
            end = min(x + cnt, w)
            out[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if y >= h:
                break
        else:  # absolute mode: val literal bytes, word-aligned
            end = min(x + val, w)
            out[y, x:end] = np.frombuffer(
                data, np.uint8, count=end - x, offset=pos
            )
            x = end
            pos += val + (val % 2)
    return out


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
    if fmt == "tiff":
        from jirlbot_spark.functions.tiff import encode_tiff

        return encode_tiff(pixels)
    if fmt == "tiffg4":
        # lossless iff pixels are bilevel — fixture rows are thresholded
        # before encode; see functions/ccitt.py
        from jirlbot_spark.functions.tiff import encode_tiff_g4

        return encode_tiff_g4(pixels)
    if fmt == "webp":
        from jirlbot_spark.functions.webp import encode_webp

        return encode_webp(pixels)
    if fmt == "ppm":
        from jirlbot_spark.functions.pnm import encode_pnm

        return encode_pnm(pixels)
    if fmt == "exr":
        # ZIP HALF scanlines; half precision resolves 1/255 steps, so
        # the 8-bit round trip is bit-exact (see functions/exr.py)
        from jirlbot_spark.functions.exr import encode_exr

        return encode_exr(pixels)
    if fmt in ("ras", "sgi"):
        from jirlbot_spark.functions import legacy_rasters as lr

        return (lr.encode_ras if fmt == "ras" else lr.encode_sgi)(pixels)
    if fmt == "ico":
        # single-member favicon container; member kind (PNG vs 24-bpp
        # DIB) alternates by content so both wild paths run (ico.py)
        from jirlbot_spark.functions.ico import encode_ico

        return encode_ico(pixels)
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
    if fmt in ("tiff", "tiffg4"):
        from jirlbot_spark.functions.tiff import decode_tiff

        return decode_tiff(data)
    if fmt == "webp":
        from jirlbot_spark.functions.webp import decode_webp

        return decode_webp(data)
    if fmt in ("ppm", "pgm", "pbm", "pnm"):
        from jirlbot_spark.functions.pnm import decode_pnm

        return decode_pnm(data)
    if fmt == "exr":
        from jirlbot_spark.functions.exr import decode_exr

        return decode_exr(data)
    if fmt in ("ras", "sgi", "xbm"):
        from jirlbot_spark.functions import legacy_rasters as lr

        return {
            "ras": lr.decode_ras,
            "sgi": lr.decode_sgi,
            "xbm": lr.decode_xbm,
        }[fmt](data)
    if fmt in ("ico", "cur"):
        from jirlbot_spark.functions.ico import decode_ico

        return decode_ico(data)
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


# ---------- curation stats ----------

def image_stats_array(px: np.ndarray) -> dict[str, float]:
    """Training-data curation signals for one decoded (h, w, 3) image —
    the image-side analog of the text quality_score features. All
    float64, fully deterministic (the driver golden replays this
    function directly):

      mean_luma / std_luma  — Rec.601 luma mean and population std
      entropy               — Shannon entropy (bits) of the 256-bin
                              luma histogram; near 0 for flat fills,
                              near 8 for noise
      colorfulness          — Hasler–Süsstrunk metric over the rg/yb
                              opponent axes; 0 for pure grayscale
      sharpness             — mean |4-neighbor Laplacian| of luma over
                              the interior (0 when no interior exists);
                              a blur proxy: downscale-blurry uploads
                              score low
    """
    f = px.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    mean_luma = float(luma.mean())
    std_luma = float(luma.std())
    hist = np.bincount(
        np.clip(np.round(luma), 0, 255).astype(np.int64).ravel(),
        minlength=256,
    )
    p = hist[hist > 0] / luma.size
    entropy = float(-(p * np.log2(p)).sum())
    rg = f[..., 0] - f[..., 1]
    yb = 0.5 * (f[..., 0] + f[..., 1]) - f[..., 2]
    colorfulness = float(
        np.sqrt(rg.std() ** 2 + yb.std() ** 2)
        + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    )
    h, w = luma.shape
    if h >= 3 and w >= 3:
        lap = (
            4.0 * luma[1:-1, 1:-1]
            - luma[:-2, 1:-1]
            - luma[2:, 1:-1]
            - luma[1:-1, :-2]
            - luma[1:-1, 2:]
        )
        sharpness = float(np.abs(lap).mean())
    else:
        sharpness = 0.0
    return {
        "mean_luma": mean_luma,
        "std_luma": std_luma,
        "entropy": entropy,
        "colorfulness": colorfulness,
        "sharpness": sharpness,
    }
