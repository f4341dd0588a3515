"""Windows ICO (favicon) decoder — pure numpy, composing the family.

Favicons are the one image format EVERY crawl fetches (site roots link
them universally), so the payload path decodes them. An ICO is a
directory of independently-encoded members; each member is either

  - a PNG stream (modern 256x256 entries) -> functions/images.decode_png
  - a BMP DIB: a BITMAPINFOHEADER with biHeight DOUBLED (XOR color
    rows then a 1-bpp AND transparency mask, both bottom-up and padded
    to 32-bit row boundaries), with NO 14-byte BMP file header.

decode_ico returns the LARGEST member as (h, w, 3) uint8 RGB — a crawl
wants the best available rendition. DIB support: 1/4/8-bpp palette
(4-byte BGRX entries), 24-bpp BGR, 32-bpp BGRA (alpha dropped, like
the family's other decoders; the AND mask is likewise transparency
metadata and is not applied to RGB output). CUR files (type 2) share
the container and decode identically.

encode_ico writes a single-member container so favicons can flow
through the fixture mix losslessly; the member kind (PNG stream vs
24-bpp DIB + AND mask) is chosen from the pixel content so BOTH wild
decode paths run inside the Spark operator contract, not just in unit
tests. Directory width/height are single bytes (0 means 256), which
caps encodable dims at 256 — fixture pages are <=64 so the directory
is always exact.

Wild decode validated against a third-party multi-member file carrying
BOTH kinds (tests/test_wild_files.py) plus spec-derived synthetic
containers.
"""

from __future__ import annotations

import struct

import numpy as np

from jirlbot_spark.functions.limits import check_dims

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_dib(member: bytes) -> np.ndarray:
    (hdr_size,) = struct.unpack_from("<I", member, 0)
    if hdr_size < 40:
        raise ValueError(f"unsupported ICO DIB header size {hdr_size}")
    w, h2, _planes, bpp, comp = struct.unpack_from("<iiHHI", member, 4)
    if comp != 0:
        raise NotImplementedError(f"compressed ICO DIB (biCompression {comp})")
    if h2 % 2:
        raise ValueError("ICO DIB height not doubled")
    h = h2 // 2
    check_dims(w, h, "ICO member")
    (n_colors,) = struct.unpack_from("<I", member, 32)
    pos = hdr_size
    pal = None
    if bpp <= 8:
        n = n_colors or (1 << bpp)
        raw = np.frombuffer(member, np.uint8, n * 4, pos).reshape(n, 4)
        pal = raw[:, 2::-1].copy()  # BGRX -> RGB
        pos += n * 4
    stride = (w * bpp + 31) // 32 * 4
    rows = np.frombuffer(member, np.uint8, stride * h, pos).reshape(h, stride)
    rows = rows[::-1]  # bottom-up
    if bpp == 32:
        return np.ascontiguousarray(
            rows[:, : w * 4].reshape(h, w, 4)[:, :, 2::-1]
        )
    if bpp == 24:
        return np.ascontiguousarray(
            rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        )
    if bpp == 8:
        return np.ascontiguousarray(pal[rows[:, :w]])
    if bpp in (1, 4):
        unpacked = np.unpackbits(rows, axis=1)
        vals = np.zeros((h, stride * 8 // bpp), np.uint8)
        for b in range(bpp):
            vals = (vals << 1) | unpacked[:, b::bpp][:, : vals.shape[1]]
        return np.ascontiguousarray(pal[vals[:, :w]])
    raise NotImplementedError(f"{bpp}-bpp ICO DIB")


def decode_ico(data: bytes, entry: int | None = None) -> np.ndarray:
    """ICO/CUR -> (h, w, 3) uint8 RGB of the largest member (or of
    directory index `entry` when given)."""
    if len(data) < 6:
        raise ValueError("short ICO header")
    reserved, typ, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO/CUR file")
    entries = []
    for i in range(count):
        w, h, _nc, _r, _p, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", data, 6 + 16 * i
        )
        entries.append(((w or 256) * (h or 256), off, size))
    if entry is not None:
        _, off, size = entries[entry]
    else:
        _, off, size = max(entries)
    member = bytes(data[off : off + size])
    if len(member) < size:
        raise ValueError("truncated ICO member")
    if member[:8] == _PNG_SIG:
        from jirlbot_spark.functions.images import decode_png

        return decode_png(member)
    return _decode_dib(member)


def _encode_dib_member(pixels: np.ndarray) -> bytes:
    """24-bpp XOR rows + all-opaque 1-bpp AND mask, both bottom-up and
    32-bit padded, under a BITMAPINFOHEADER with biHeight DOUBLED."""
    h, w, _ = pixels.shape
    xor_stride = (w * 3 + 3) // 4 * 4
    xor = np.zeros((h, xor_stride), np.uint8)
    xor[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # BGR, bottom-up
    and_stride = (w + 31) // 32 * 4
    and_mask = np.zeros((h, and_stride), np.uint8)  # 0 = opaque
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0,
        xor_stride * h + and_stride * h, 0, 0, 0, 0,
    )
    return hdr + xor.tobytes() + and_mask.tobytes()


def encode_ico(pixels: np.ndarray) -> bytes:
    """Single-member ICO. Member kind alternates by pixel content
    (sum parity) between a PNG stream and a raw 24-bpp DIB so the
    fixture mix exercises both wild decode paths. Lossless."""
    h, w, _ = pixels.shape
    if w > 256 or h > 256:
        raise ValueError(f"ICO directory cannot describe {w}x{h} (>256)")
    if int(pixels.sum()) % 2:
        from jirlbot_spark.functions.images import encode_png

        member = encode_png(pixels)
    else:
        member = _encode_dib_member(pixels)
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 24, len(member), 6 + 16
    )
    return struct.pack("<HHH", 0, 1, 1) + entry + member


def is_ico(data: bytes) -> bool:
    return (
        len(data) >= 6
        and data[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00")
        and struct.unpack_from("<H", data, 4)[0] > 0
    )
