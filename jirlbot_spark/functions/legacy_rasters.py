"""Legacy raster decoders: Sun Raster (.ras), SGI RGB (.sgi), XBM.

Wild crawls still surface these (archival Unix imagery, X11 assets;
CPython's third-party-encoded test logo ships in all three), so the
payload path decodes them — validated against the third-party files +
spec-derived synthetic streams. ras/sgi also carry minimal lossless
encoders (type-1 BGR strips / verbatim planar) so they join
images.LOSSLESS_FMTS and the fixture mix, flowing the wild-capable
decoders through the Spark operator contract; XBM stays decode-only
(1-bit — cannot round-trip RGB fixtures).

Sun Raster: 8 big-endian int32 header (magic 0x59a66a95, w, h, depth,
length, type, maptype, maplength); rows pad to 16 bits; depth 1/8/24/32;
type 0/1 verbatim, 2 byte-RLE (0x80 escape), 3 RGB-ordered; RMT_EQUAL_RGB
colormap as three planes. 24/32-bit pixels are BGR(x) for types 0-2,
RGB(x) for type 3; depth-1 is MSB-first, 1=black.

SGI RGB: 512-byte big-endian header (magic 474); channel-planar,
bottom-up rows; storage 0 verbatim / 1 RLE (per-row offset+length
tables, count-byte runs); bpc 1 (bpc 2 verbatim only — RLE-bpc2 gated);
pixmax-scaled to 8 bits; 1/2/3/4 channels (alpha dropped, like the TIFF
ExtraSamples rule).

XBM: C-source bitmap (#define _width/_height + hex byte array), bits
LSB-first within each byte, rows byte-padded, 1=foreground=black.
"""

from __future__ import annotations

import re
import struct

import numpy as np

from jirlbot_spark.functions.limits import check_dims

_RAS_MAGIC = 0x59A66A95
_SGI_MAGIC = 474


def _unpad_rows(raw: bytes, h: int, row_bytes: int, padded: int) -> np.ndarray:
    a = np.frombuffer(raw, np.uint8, count=h * padded).reshape(h, padded)
    return a[:, :row_bytes]


def encode_ras(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> standard (type 1) 24-bit BGR Rasterfile,
    rows padded to 16 bits. Lossless."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    padded = (row_bytes + 1) & ~1
    rows = np.zeros((h, padded), np.uint8)
    rows[:, :row_bytes] = pixels[:, :, ::-1].reshape(h, row_bytes)
    body = rows.tobytes()
    hdr = struct.pack(">8i", _RAS_MAGIC, w, h, 24, len(body), 1, 0, 0)
    return hdr + body


def encode_sgi(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> verbatim bpc-1 SGI image (channel-planar,
    bottom-up rows per spec). Lossless."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = pixels.shape
    hdr = struct.pack(">HBBHHHHii", _SGI_MAGIC, 0, 1, 3, w, h, 3, 0, 255)
    hdr += b"\x00" * (512 - len(hdr))
    planes = pixels[::-1].transpose(2, 0, 1).tobytes()
    return hdr + planes


def _ras_rle_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        if b != 0x80:
            out.append(b)
            i += 1
            continue
        cnt = data[i + 1]
        if cnt == 0:  # literal 0x80
            out.append(0x80)
            i += 2
        else:
            out += data[i + 2 : i + 3] * (cnt + 1)
            i += 3
    if len(out) < expected:
        raise ValueError("truncated Sun-Raster RLE stream")
    return bytes(out[:expected])


def decode_ras(data: bytes) -> np.ndarray:
    """Sun Rasterfile -> (h, w, 3) uint8 RGB."""
    if len(data) < 32:
        raise ValueError("short Sun-Raster header")
    magic, w, h, depth, _length, rtype, maptype, maplen = struct.unpack(
        ">8i", data[:32]
    )
    if magic != _RAS_MAGIC:
        raise ValueError("not a Sun Rasterfile")
    if rtype not in (0, 1, 2, 3):
        raise NotImplementedError(f"Sun-Raster type {rtype}")
    if depth not in (1, 8, 24, 32):
        raise NotImplementedError(f"Sun-Raster depth {depth}")
    if maptype not in (0, 1):
        raise NotImplementedError(f"Sun-Raster maptype {maptype}")
    check_dims(w, h, "Sun-Raster")
    pos = 32
    cmap = None
    if maptype == 1 and maplen:
        if maplen % 3:
            raise ValueError("RMT_EQUAL_RGB maplength not divisible by 3")
        planes = np.frombuffer(data, np.uint8, count=maplen, offset=pos)
        cmap = planes.reshape(3, maplen // 3).T.copy()  # (n, rgb)
    pos += maplen

    row_bytes = (w * depth + 7) // 8
    padded = (row_bytes + 1) & ~1  # rows pad to 16 bits
    expected = padded * h
    body = data[pos:]
    if rtype == 2:
        body = _ras_rle_decode(body, expected)
    if len(body) < expected:
        raise ValueError("truncated Sun-Raster image data")
    rows = _unpad_rows(body, h, row_bytes, padded)

    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        if cmap is not None:
            return np.ascontiguousarray(cmap[bits])
        g = np.where(bits == 1, 0, 255).astype(np.uint8)  # 1 = black
        return np.repeat(g[:, :, None], 3, axis=2)
    if depth == 8:
        idx = rows[:, :w]
        if cmap is not None:
            return np.ascontiguousarray(cmap[idx])
        return np.repeat(idx[:, :, None], 3, axis=2).copy()
    if depth == 24:
        px = rows.reshape(h, w, 3)
        return np.ascontiguousarray(px if rtype == 3 else px[:, :, ::-1])
    px = rows.reshape(h, w, 4)[:, :, 1:]  # 32-bit: pad/alpha byte first
    return np.ascontiguousarray(px if rtype == 3 else px[:, :, ::-1])


def _sgi_rle_row(data: bytes, out: np.ndarray) -> None:
    i, o, n = 0, 0, len(data)
    w = out.shape[0]
    while i < n:
        c = data[i]
        i += 1
        cnt = c & 0x7F
        if cnt == 0:
            return
        if c & 0x80:  # literal run
            out[o : o + cnt] = np.frombuffer(data, np.uint8, cnt, i)
            i += cnt
        else:  # replicate run
            out[o : o + cnt] = data[i]
            i += 1
        o += cnt
        if o > w:
            raise ValueError("SGI RLE row overruns width")
    raise ValueError("SGI RLE row missing terminator")


def decode_sgi(data: bytes) -> np.ndarray:
    """SGI image file -> (h, w, 3) uint8 RGB (alpha dropped)."""
    if len(data) < 512:
        raise ValueError("short SGI header")
    magic, storage, bpc, _dim, w, h, z, _pixmin, pixmax = struct.unpack(
        ">HBBHHHHii", data[:20]
    )
    if magic != _SGI_MAGIC:
        raise ValueError("not an SGI image")
    if bpc not in (1, 2):
        raise ValueError(f"bad SGI bytes-per-channel {bpc}")
    if z not in (1, 2, 3, 4):
        raise NotImplementedError(f"SGI with {z} channels")
    check_dims(w, h, "SGI")

    if storage == 0:  # verbatim, channel-planar, bottom-up
        count = w * h * z
        if bpc == 1:
            planes = np.frombuffer(data, np.uint8, count, 512)
        else:
            planes = np.frombuffer(data, np.dtype(">u2"), count, 512)
        img = planes.reshape(z, h, w).transpose(1, 2, 0)[::-1]
    elif storage == 1:
        if bpc != 2:
            n_rows = h * z
            table = np.frombuffer(data, np.dtype(">u4"), 2 * n_rows, 512)
            starts, lengths = table[:n_rows], table[n_rows:]
            img = np.zeros((h, w, z), np.uint8)
            for c in range(z):
                for y in range(h):
                    k = y + c * h
                    seg = data[starts[k] : starts[k] + lengths[k]]
                    _sgi_rle_row(seg, img[h - 1 - y, :, c])
        else:
            raise NotImplementedError("RLE SGI with 2 bytes/channel")
    else:
        raise ValueError(f"bad SGI storage {storage}")

    if bpc == 2 or (0 < pixmax != 255):
        scale_max = pixmax if 0 < pixmax else (65535 if bpc == 2 else 255)
        v = np.minimum(img.astype(np.int64), scale_max)
        img = ((v * 255 + scale_max // 2) // scale_max).astype(np.uint8)
    img = img.astype(np.uint8, copy=False)
    if z == 1:
        return np.repeat(img, 3, axis=2).copy()
    if z == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    return np.ascontiguousarray(img[:, :, :3])


_XBM_DIM = re.compile(rb"#define\s+\w*?_?(width|height)\s+(\d+)")
_XBM_BYTE = re.compile(rb"0[xX][0-9a-fA-F]{1,2}|\b\d{1,3}\b")


def decode_xbm(data: bytes) -> np.ndarray:
    """X BitMap C source -> (h, w, 3) uint8 RGB (1 = black)."""
    dims = {m.group(1): int(m.group(2)) for m in _XBM_DIM.finditer(data)}
    w, h = dims.get(b"width"), dims.get(b"height")
    if not w or not h:
        raise ValueError("XBM missing width/height #defines")
    check_dims(w, h, "XBM")
    brace = data.find(b"{")
    if brace < 0:
        raise ValueError("XBM missing bits array")
    toks = _XBM_BYTE.findall(data[brace:])
    row_bytes = (w + 7) // 8
    need = row_bytes * h
    if len(toks) < need:
        raise ValueError("truncated XBM bits array")
    vals = np.array([int(t, 0) for t in toks[:need]], np.uint8)
    bits = np.unpackbits(
        vals.reshape(h, row_bytes), axis=1, bitorder="little"
    )[:, :w]
    g = np.where(bits == 1, 0, 255).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)
