"""Self-contained GIF89a codec (pure numpy + stdlib, no PIL).

A web crawl's image+caption payload path meets GIFs constantly, so the
engine's codec family (png/bmp/raw in images.py, baseline JPEG in
jpeg.py) gains a real GIF branch:

  - encode_gif: palette-based GIF89a (global color table, one
    non-interlaced frame, variable-width LZW per GIF spec appendix).
    GIF is a palettized format: input with <=256 distinct colors
    round-trips LOSSLESSLY; wider input is first posterized to a fixed
    6x7x6 RGB grid (252 colors, deterministic) — callers who need the
    exact invariant palettize first (fixtures do; see posterize()).
  - decode_gif: parses GIF87a/GIF89a, global/local color tables,
    skips extension blocks, de-interlaces when flagged, and returns the
    FIRST frame as (h, w, 3) uint8 RGB (an animated GIF's later frames
    are deltas against disposal state — out of scope for the payload
    invariant, which pins the stored frame).

LZW is inherently sequential (each code extends the previous string),
so the symbol loop is plain Python over a numpy index array — fine for
the fixture sizes (<=64x64), and on a cluster the decode cost is per
DISTINCT image inside an Arrow batch (operators/fetch.py), never per
frontier row. Palette mapping and bit unpacking are vectorized.

No reference counterpart: RovoMe/JIRLbot crawls URLs and never decodes
payloads; this module serves the graft's payload invariant
(BASELINE.json input_hint: decoded-pixel allclose + caption equality).
"""

from __future__ import annotations

import struct

import numpy as np

from jirlbot_spark.functions.limits import check_dims

_HDR89 = b"GIF89a"
_HDR87 = b"GIF87a"


def posterize(pixels: np.ndarray) -> np.ndarray:
    """Deterministic 6x7x6-level posterize (252 colors) — maps arbitrary
    RGB onto a palette GIF can carry losslessly from then on."""
    levels = np.array([6, 7, 6])
    out = np.empty_like(pixels)
    for c in range(3):
        n = levels[c]
        q = np.minimum(
            (pixels[..., c].astype(np.int32) * n) // 256, n - 1
        )
        out[..., c] = (q * 255 // (n - 1)).astype(np.uint8)
    return out


def _build_palette(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette[k,3], indices[h,w]) for an image with <=256 colors."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    packed = (
        flat[:, 0].astype(np.int32) << 16
        | flat[:, 1].astype(np.int32) << 8
        | flat[:, 2].astype(np.int32)
    )
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(
            f"{len(uniq)} distinct colors; posterize() first (GIF holds 256)"
        )
    pal = np.stack(
        [uniq >> 16 & 0xFF, uniq >> 8 & 0xFF, uniq & 0xFF], axis=1
    ).astype(np.uint8)
    return pal, inv.reshape(h, w).astype(np.int32)


class _BitWriter:
    """LSB-first bit packer (GIF LZW byte order)."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF variable-width LZW over a flat index array."""
    clear = 1 << mcs
    end = clear + 1
    bw = _BitWriter()
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = mcs + 1
    bw.put(clear, width)
    syms = indices.ravel().tolist()
    prefix = syms[0]
    for k in syms[1:]:
        key = (prefix, k)
        code = table.get(key)
        if code is not None:
            prefix = code
            continue
        bw.put(prefix, width)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            bw.put(clear, width)
            table.clear()
            next_code = end + 1
            width = mcs + 1
        prefix = k
    bw.put(prefix, width)
    # mirror the decoder: it appends one more table entry on reading the
    # final data code and may bump ITS width before reading END — emit
    # END at that width or the last code straddles a boundary
    next_code += 1
    if next_code == (1 << width) + 1 and width < 12:
        width += 1
    bw.put(end, width)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int, n_px: int) -> np.ndarray:
    """Inverse of _lzw_encode; returns n_px palette indices. The table
    is indexed directly by code (slots `clear` and `end` stay None)."""
    clear = 1 << mcs
    end = clear + 1

    def fresh_table() -> list[bytes | None]:
        return [bytes([i]) for i in range(clear)] + [None, None]

    table = fresh_table()
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while len(out) < n_px:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh_table()
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if entry is None:
                raise ValueError(f"bad LZW code {code}")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out[:n_px]), np.uint8)


def encode_gif(pixels: np.ndarray) -> bytes:
    """pixels (h,w,3) uint8 -> single-frame GIF89a. Lossless iff the
    image has <=256 distinct colors; otherwise posterized (docstring)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = pixels.shape
    try:
        pal, idx = _build_palette(pixels)
    except ValueError:
        pal, idx = _build_palette(posterize(pixels))
    n_colors = len(pal)
    # GCT size field: 2^(s+1) entries
    s = max(1, int(np.ceil(np.log2(max(n_colors, 2)))) - 1)
    while (1 << (s + 1)) < n_colors:
        s += 1
    gct = np.zeros(((1 << (s + 1)), 3), np.uint8)
    gct[:n_colors] = pal
    mcs = max(2, s + 1)
    lzw = _lzw_encode(idx, mcs)
    out = bytearray()
    out += _HDR89
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | s, 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif_anim(frames: np.ndarray, delay_cs: int = 10) -> bytes:
    """(n, h, w, 3) uint8 -> animated GIF89a: one global palette built
    over ALL frames (posterized first if the union exceeds 256 colors),
    a Graphic Control Extension per frame (disposal 1 = leave in place,
    no transparency) and NETSCAPE2.0 infinite-loop app extension.
    Lossless per frame iff the union palette fits."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("expected (n, h, w, 3) RGB frames")
    n, h, w, _ = frames.shape
    stacked = frames.reshape(n * h, w, 3)
    try:
        pal, idx = _build_palette(stacked)
    except ValueError:
        pal, idx = _build_palette(posterize(stacked))
    idx = idx.reshape(n, h, w)
    n_colors = len(pal)
    s = max(1, int(np.ceil(np.log2(max(n_colors, 2)))) - 1)
    while (1 << (s + 1)) < n_colors:
        s += 1
    gct = np.zeros(((1 << (s + 1)), 3), np.uint8)
    gct[:n_colors] = pal
    mcs = max(2, s + 1)
    out = bytearray()
    out += _HDR89
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | s, 0, 0)
    out += gct.tobytes()
    # NETSCAPE2.0 loop extension (loop count 0 = forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n):
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 1 << 2, delay_cs, 0  # disposal 1, no transparency
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        lzw = _lzw_encode(idx[f].ravel(), mcs)
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> tuple[np.ndarray, list[int]]:
    """Animated GIF -> (composed frames (n, sh, sw, 3) uint8, per-frame
    delays in centiseconds).

    Full GIF89a animation semantics: the logical-screen canvas starts
    as the background color (black without a global table), each image
    block draws its rect through the transparency mask, the emitted
    frame is the canvas AFTER the draw, and disposal then applies —
    0/1 leave, 2 restore the rect to background, 3 restore the rect to
    the pre-draw canvas. Local palettes and per-frame interlacing
    handled; a cumulative canvas-pixel budget (the per-image decode cap
    x frames) bounds hostile frame counts."""
    try:
        return _decode_gif_frames(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated GIF: {e}") from e


def _decode_gif_frames(data: bytes) -> tuple[np.ndarray, list[int]]:
    from jirlbot_spark.functions.limits import MAX_DECODE_PIXELS

    if data[:6] not in (_HDR89, _HDR87):
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    check_dims(sw, sh, "GIF screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(
        3, np.uint8
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    disposal, transparent, delay = 0, None, 0
    budget = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                gpacked, delay = struct.unpack_from("<BH", data, pos + 1)
                disposal = (gpacked >> 2) & 0x07
                transparent = data[pos + 4] if gpacked & 1 else None
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", data[pos + 1 : pos + 10]
        )
        check_dims(w, h, "GIF frame")
        budget += sw * sh
        if budget > MAX_DECODE_PIXELS:
            raise ValueError(
                "GIF animation exceeds the decode pixel budget "
                f"({MAX_DECODE_PIXELS})"
            )
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame rect outside the logical screen")
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame with no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _lzw_decode(bytes(lzw), mcs, w * h).reshape(h, w)
        if ipacked & 0x40:
            order = np.concatenate(
                [np.arange(s0, h, st) for s0, st in _INTERLACE_PASSES]
            )
            deinterlaced = np.empty_like(idx)
            deinterlaced[order] = idx
            idx = deinterlaced
        region = canvas[top : top + h, left : left + w]
        snapshot = region.copy() if disposal == 3 else None
        # a transparent index may sit outside the palette; opaque ones
        # must not (same contract as the single-frame decoder)
        safe = (
            idx
            if transparent is None
            else np.where(idx == transparent, 0, idx)
        )
        if (safe >= len(pal)).any():
            raise ValueError("GIF pixel index outside the color table")
        rgb = pal[safe]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            region[...] = bg_rgb
        elif disposal == 3:
            region[...] = snapshot
        disposal, transparent, delay = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def is_gif(data: bytes) -> bool:
    return data[:6] in (_HDR89, _HDR87)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a -> first frame as (h, w, 3) uint8 RGB."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as e:  # walked off a truncated blob
        raise ValueError(f"truncated GIF: {e}") from e


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (_HDR89, _HDR87):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", data[pos + 1 : pos + 10]
        )
        check_dims(w, h, "GIF frame")
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame with no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(lzw), mcs, w * h)
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            deinterlaced = np.empty_like(rows)
            deinterlaced[order] = rows
            rows = deinterlaced
        return pal[rows]
    raise ValueError("GIF contains no image data")
