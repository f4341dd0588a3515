"""Self-contained baseline-TIFF codec (pure numpy + stdlib, no PIL).

TIFF is the remaining high-frequency LOSSLESS format a crawl's
image+caption payload path meets (scanner/GIS/archival uploads), so the
engine's codec family (png/bmp/raw/gif in images.py + gif.py, jpeg in
jpeg.py) gains a real TIFF branch:

  - encode_tiff: classic little-endian ("II") 8-bit chunky RGB, strip
    layout, compression none / PackBits / LZW (with horizontal
    predictor) / Deflate. Lossless for arbitrary RGB input.
  - decode_tiff: wild-capable baseline+extension reader — both byte
    orders (II/MM), bit depths 1/2/4/8/16, photometric WhiteIsZero /
    BlackIsZero / RGB / Palette (+ YCbCr under JPEG), STRIPPED and
    TILED layouts, chunky and planar (PlanarConfiguration 2) sample
    order, multi-strip, horizontal predictor, ExtraSamples (alpha
    dropped), all 8 orientation transforms, and compressions none (1),
    LZW (5), new-style JPEG (7, shared JPEGTables spliced per segment,
    decoded by the engine's own functions/jpeg.py), Deflate (8 and the
    legacy 32946 code), PackBits (32773), and the CCITT fax family —
    2 (Modified Huffman), 3 (T.4 1D/2D per T4Options) and 4 (T.6/G4) —
    via functions/ccitt.py, including FillOrder=2 (bit-reversed bytes,
    the common fax byte order; also honored for uncompressed 1-bit
    data). Old-style JPEG (6) and FillOrder=2 on non-bitstream
    compressions raise the explicit NotImplementedError gate.
  - encode_tiff_g4: bilevel (h, w, 3) RGB (each pixel pure black or
    pure white) -> single-strip G4 fax TIFF, photometric WhiteIsZero.

TIFF LZW vs the GIF LZW in functions/gif.py: codes pack MSB-first (GIF
is LSB-first), roots are always the 256 byte values with CLEAR=256 /
EOI=257 (GIF sizes them from the palette), and the code width grows one
table entry EARLIER on both sides ("EarlyChange" in the PDF-spec
formulation of the same algorithm): the encoder bumps when next_code
reaches 2^width (GIF: 2^width+1), the decoder when the table length
reaches 2^width - 1 (GIF: 2^width) — the decoder runs one table entry
behind the encoder, which these paired rules keep code-aligned across
the 9->10->11->12 boundaries.

LZW's symbol loop is inherently sequential, so it is plain Python like
gif.py's; everything else (predictor cumsum, bit unpacking, palette
gather, strip assembly) is vectorized numpy. Decode cost is per
DISTINCT payload inside an Arrow batch (operators/fetch.py), never per
frontier row.

No reference counterpart: RovoMe/JIRLbot crawls URLs and never decodes
payloads; this module serves the graft's payload invariant
(BASELINE.json input_hint: decoded-pixel allclose + caption equality).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from jirlbot_spark.functions.limits import bounded_inflate, check_dims

_II, _MM = b"II", b"MM"
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}

# tag numbers (TIFF 6.0 baseline)
_WIDTH, _HEIGHT, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_FILLORDER, _STRIP_OFFSETS, _ORIENTATION, _SPP = 266, 273, 274, 277
_ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR, _PREDICTOR = 278, 279, 284, 317
_COLORMAP = 320
_TILE_W, _TILE_H, _TILE_OFFSETS, _TILE_COUNTS = 322, 323, 324, 325

_COMP_NONE, _COMP_LZW, _COMP_DEFLATE = 1, 5, 8
_COMP_DEFLATE_OLD, _COMP_PACKBITS = 32946, 32773
_COMP_JPEG = 7  # "new-style" JPEG-in-TIFF (TTN2); old-style 6 stays gated
_JPEG_TABLES = 347
_COMP_MH, _COMP_G3, _COMP_G4 = 2, 3, 4  # CCITT fax (functions/ccitt.py)
_FAX_COMPS = (_COMP_MH, _COMP_G3, _COMP_G4)
_T4_OPTIONS, _T6_OPTIONS = 292, 293

# FillOrder=2 stores bits low-order-first within each byte; reversing
# every byte converts a fax bitstream (or uncompressed 1-bit rows) to
# FillOrder-1 exactly.
_BITREV = np.array(
    [int(f"{b:08b}"[::-1], 2) for b in range(256)], np.uint8
)

_CLEAR, _EOI = 256, 257


# ---------- LZW (TIFF variant: MSB-first, early change) ----------

def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW over raw bytes. Emits CLEAR first, resets the table at
    4094 entries (before any code would need 13 bits), EOI last."""
    acc = nbits = 0
    out = bytearray()

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code, width = 258, 9
    put(_CLEAR, width)
    if data:
        prefix = data[0]
        for b in data[1:]:
            key = (prefix, b)
            code = table.get(key)
            if code is not None:
                prefix = code
                continue
            put(prefix, width)
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:  # early change
                width += 1
            if next_code >= 4094:
                put(_CLEAR, width)
                table.clear()
                next_code, width = 258, 9
            prefix = b
        put(prefix, width)
        # mirror the decoder: it appends an entry on reading that final
        # data code and may bump ITS width before reading EOI
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    put(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Inverse of lzw_encode; stops at EOI or `expected` output bytes."""
    def fresh() -> list[bytes | None]:
        return [bytes([i]) for i in range(256)] + [None, None]

    table = fresh()
    width = 9
    out = bytearray()
    acc = nbits = pos = 0
    n = len(data)
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW strip")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            table = fresh()
            width, prev = 9, None
            continue
        if code == _EOI:
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
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:  # early
                width += 1
        prev = entry
    return bytes(out[:expected])


# ---------- PackBits ----------

def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits: runs of >=3 become (257-n, byte); literals chunk
    at 128. Matches the TIFF 6.0 / Apple TN1023 scheme."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(end - j, 128)
            out.append(k - 1)
            out.extend(data[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n and len(out) < expected:
        h = data[pos]
        pos += 1
        if h < 128:  # h+1 literal bytes
            out += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[pos : pos + 1] * (257 - h)
            pos += 1
        # h == 128: noop
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


# ---------- encode ----------

def encode_tiff(
    pixels: np.ndarray,
    compression: str = "lzw",
    rows_per_strip: int = 16,
) -> bytes:
    """(h, w, 3) uint8 RGB -> classic little-endian TIFF.
    compression: "none" | "packbits" | "lzw" | "deflate"; lzw/deflate
    apply the horizontal predictor (tag 317=2) first."""
    comp_tag = {
        "none": _COMP_NONE,
        "packbits": _COMP_PACKBITS,
        "lzw": _COMP_LZW,
        "deflate": _COMP_DEFLATE,
    }.get(compression)
    if comp_tag is None:
        raise ValueError(f"unknown TIFF compression {compression!r}")
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    pixels = np.ascontiguousarray(pixels, np.uint8)
    h, w, _ = pixels.shape
    predictor = 2 if compression in ("lzw", "deflate") else 1
    rps = max(1, min(rows_per_strip, h))
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        block = pixels[y0 : y0 + rps]
        if predictor == 2:
            d = block.astype(np.int16)
            d[:, 1:, :] -= block[:, :-1, :].astype(np.int16)
            raw = (d & 0xFF).astype(np.uint8).tobytes()
        else:
            raw = block.tobytes()
        if comp_tag == _COMP_LZW:
            strips.append(lzw_encode(raw))
        elif comp_tag == _COMP_PACKBITS:
            strips.append(packbits_encode(raw))
        elif comp_tag == _COMP_DEFLATE:
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(raw)

    # layout: header | strip data | extra-values area | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()
    extra_base = pos

    def vals(fmt: str, items: list[int]) -> bytes:
        return struct.pack(f"<{len(items)}{fmt}", *items)

    def entry(tag: int, typ: int, fmt: str, items: list[int]) -> bytes:
        payload = vals(fmt, items)
        if len(payload) <= 4:
            return struct.pack("<HHI", tag, typ, len(items)) + payload.ljust(
                4, b"\x00"
            )
        off = extra_base + len(extra)
        extra.extend(payload)
        if len(extra) % 2:
            extra.append(0)
        return struct.pack("<HHII", tag, typ, len(items), off)

    entries = [
        (_WIDTH, 4, "I", [w]),
        (_HEIGHT, 4, "I", [h]),
        (_BITS, 3, "H", [8, 8, 8]),
        (_COMPRESSION, 3, "H", [comp_tag]),
        (_PHOTOMETRIC, 3, "H", [2]),
        (_STRIP_OFFSETS, 4, "I", strip_offsets),
        (_SPP, 3, "H", [3]),
        (_ROWS_PER_STRIP, 4, "I", [rps]),
        (_STRIP_COUNTS, 4, "I", [len(s) for s in strips]),
        (_PLANAR, 3, "H", [1]),
    ]
    if predictor == 2:
        entries.append((_PREDICTOR, 3, "H", [2]))
    entries.sort()
    ifd = struct.pack("<H", len(entries))
    ifd += b"".join(entry(*e) for e in entries)
    ifd += struct.pack("<I", 0)  # no next IFD
    ifd_off = extra_base + len(extra)
    header = _II + struct.pack("<HI", 42, ifd_off)
    return header + b"".join(strips) + bytes(extra) + ifd


def encode_tiff_g4(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> single-strip CCITT G4 TIFF, photometric 0
    (WhiteIsZero). Round-trips LOSSLESSLY iff the input is bilevel
    (every pixel pure black or pure white); wider input is thresholded
    via ccitt.bilevel first — fixture rows pre-threshold so the stored
    pixels describe exactly what the bytes carry (the GIF posterize
    pattern)."""
    from jirlbot_spark.functions.ccitt import bilevel, encode_g4

    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    black = (flat == 0).all(axis=1)
    white = (flat == 255).all(axis=1)
    if not (black | white).all():
        pixels = bilevel(pixels)
        black = (pixels.reshape(-1, 3) == 0).all(axis=1)
    bits = black.reshape(h, w).astype(np.uint8)  # 1 = black (photo 0)
    strip = encode_g4(bits)

    pos = 8
    extra = bytearray()
    extra_base = pos + len(strip)

    def entry(tag: int, typ: int, fmt: str, items: list[int]) -> bytes:
        payload = struct.pack(f"<{len(items)}{fmt}", *items)
        if len(payload) <= 4:
            return struct.pack("<HHI", tag, typ, len(items)) + payload.ljust(
                4, b"\x00"
            )
        off = extra_base + len(extra)
        extra.extend(payload)
        if len(extra) % 2:
            extra.append(0)
        return struct.pack("<HHII", tag, typ, len(items), off)

    entries = [
        (_WIDTH, 4, "I", [w]),
        (_HEIGHT, 4, "I", [h]),
        (_BITS, 3, "H", [1]),
        (_COMPRESSION, 3, "H", [_COMP_G4]),
        (_PHOTOMETRIC, 3, "H", [0]),
        (_STRIP_OFFSETS, 4, "I", [pos]),
        (_SPP, 3, "H", [1]),
        (_ROWS_PER_STRIP, 4, "I", [h]),
        (_STRIP_COUNTS, 4, "I", [len(strip)]),
        (_T6_OPTIONS, 4, "I", [0]),
    ]
    entries.sort()
    ifd = struct.pack("<H", len(entries))
    ifd += b"".join(entry(*e) for e in entries)
    ifd += struct.pack("<I", 0)
    ifd_off = extra_base + len(extra)
    header = _II + struct.pack("<HI", 42, ifd_off)
    return header + strip + bytes(extra) + ifd


# ---------- decode ----------

def _read_ifd(data: bytes, order: str, off: int) -> dict[int, tuple]:
    (count,) = struct.unpack_from(f"{order}H", data, off)
    tags: dict[int, tuple] = {}
    for i in range(count):
        base = off + 2 + 12 * i
        tag, typ, n = struct.unpack_from(f"{order}HHI", data, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * n
        vpos = base + 8
        if total > 4:
            (vpos,) = struct.unpack_from(f"{order}I", data, base + 8)
        fmt = _TYPE_FMT.get(typ)
        if fmt is not None:
            tags[tag] = struct.unpack_from(f"{order}{n}{fmt}", data, vpos)
        else:  # ASCII/RATIONAL/etc — keep raw bytes; unused below
            tags[tag] = (data[vpos : vpos + total],)
    return tags


def _tag1(tags: dict, tag: int, default=None):
    v = tags.get(tag)
    return default if v is None else v[0]


def _assemble_jpeg(
    data: bytes,
    tags: dict,
    offsets: tuple,
    counts: tuple,
    w: int,
    h: int,
    geom: tuple[int, int, int],
    planar: int,
) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7): each strip/tile is a JPEG
    stream; shared tables from the JPEGTables tag (abbreviated
    SOI..EOI stream) splice in after each segment's SOI. Delegates the
    entropy work to the engine's own codec (functions/jpeg.py)."""
    from jirlbot_spark.functions.jpeg import decode_jpeg

    if planar != 1:
        raise NotImplementedError("planar JPEG-in-TIFF")
    seg_w, seg_h, across = geom
    tbl_raw = tags.get(_JPEG_TABLES)
    tbl = b""
    if tbl_raw:
        # type UNDEFINED arrives as one bytes blob; type BYTE as ints
        if isinstance(tbl_raw[0], (bytes, bytearray)):
            t = bytes(tbl_raw[0])
        else:
            t = bytes(tbl_raw)
        if t[:2] == b"\xff\xd8" and t[-2:] == b"\xff\xd9":
            tbl = t[2:-2]
    canvas = np.zeros((h, w, 3), np.uint8)
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        seg = bytes(data[off : off + cnt])
        if seg[:2] != b"\xff\xd8":
            raise ValueError("JPEG-in-TIFF segment without SOI")
        if tbl:
            seg = seg[:2] + tbl + seg[2:]
        px = decode_jpeg(seg)
        ty, tx = divmod(i, across)
        y0, x0 = ty * seg_h, tx * seg_w
        ph = min(px.shape[0], h - y0)
        pw = min(px.shape[1], w - x0)
        canvas[y0 : y0 + ph, x0 : x0 + pw] = px[:ph, :pw]
    return canvas


def _decompress(raw: bytes, comp: int, expected: int) -> bytes:
    if comp == _COMP_LZW:
        return lzw_decode(raw, expected)
    if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        return bounded_inflate(raw, expected)
    if comp == _COMP_PACKBITS:
        return packbits_decode(raw, expected)
    return raw


def _segment_samples(
    raw: bytes,
    n_rows: int,
    seg_w: int,
    spp: int,
    bits: int,
    predictor: int,
    order: str,
) -> np.ndarray:
    """Decompressed segment bytes -> (n_rows, seg_w, spp) uint8 samples.
    16-bit samples reduce to their high byte AFTER predictor
    accumulation; sub-byte samples unpack MSB-first (FillOrder 1)."""
    row_bytes = (seg_w * spp * bits + 7) // 8
    expected = n_rows * row_bytes
    if len(raw) < expected:
        raise ValueError("truncated TIFF segment")
    rows = np.frombuffer(raw, np.uint8, count=expected).reshape(
        n_rows, row_bytes
    )
    if bits == 8:
        s = rows.reshape(n_rows, seg_w, spp)
        if predictor == 2:
            s = s.cumsum(axis=1, dtype=np.uint8)
        return s
    if bits == 16:
        dt = np.dtype(f"{order}u2")
        s16 = rows.view(dt).reshape(n_rows, seg_w, spp)
        if predictor == 2:
            s16 = s16.cumsum(axis=1, dtype=np.uint16).astype(dt)
        return (s16.astype(np.uint16) >> 8).astype(np.uint8)
    # 1/2/4-bit, single sample per pixel (gated upstream otherwise)
    unpacked = np.unpackbits(rows, axis=1)
    vals = np.zeros((n_rows, row_bytes * 8 // bits), np.uint8)
    for b in range(bits):
        vals = (vals << 1) | unpacked[:, b::bits][:, : vals.shape[1]]
    return vals[:, :seg_w].reshape(n_rows, seg_w, 1)


_ORIENT = {
    1: lambda a: a,
    2: lambda a: a[:, ::-1],
    3: lambda a: a[::-1, ::-1],
    4: lambda a: a[::-1],
    5: lambda a: a.swapaxes(0, 1),
    6: lambda a: a.swapaxes(0, 1)[:, ::-1],
    7: lambda a: a.swapaxes(0, 1)[::-1, ::-1],
    8: lambda a: a.swapaxes(0, 1)[::-1],
}


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode the first IFD of a TIFF to (h, w, 3) uint8 RGB (docstring
    at module top lists the supported/gated feature matrix)."""
    if data[:2] not in (_II, _MM) or len(data) < 8:
        raise ValueError("not a TIFF")
    order = "<" if data[:2] == _II else ">"
    magic, ifd_off = struct.unpack_from(f"{order}HI", data, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    tags = _read_ifd(data, order, ifd_off)

    planar = _tag1(tags, _PLANAR, 1)
    if planar not in (1, 2):
        raise ValueError(f"bad planar configuration {planar}")
    comp = _tag1(tags, _COMPRESSION, 1)
    if comp not in (
        _COMP_NONE, _COMP_LZW, _COMP_DEFLATE, _COMP_DEFLATE_OLD,
        _COMP_PACKBITS, _COMP_JPEG,
    ) and comp not in _FAX_COMPS:
        raise NotImplementedError(f"TIFF compression {comp}")
    photo = _tag1(tags, _PHOTOMETRIC)
    if photo is None and comp in _FAX_COMPS:
        photo = 0  # fax default: WhiteIsZero (what libtiff assumes too)
    if photo not in (0, 1, 2, 3) and not (photo == 6 and comp == _COMP_JPEG):
        raise NotImplementedError(f"TIFF photometric {photo}")
    reverse_bits = _tag1(tags, _FILLORDER, 1) == 2
    if reverse_bits and comp not in _FAX_COMPS and comp != _COMP_NONE:
        # byte-reversal is only exact for bitstream codings and raw
        # 1-bit rows; FillOrder 2 with LZW/Deflate/PackBits/JPEG is
        # nonstandard in the wild
        raise NotImplementedError(f"fill-order-2 with compression {comp}")

    w = _tag1(tags, _WIDTH)
    h = _tag1(tags, _HEIGHT)
    if not w or not h:
        raise ValueError("missing TIFF dimensions")
    check_dims(w, h, "TIFF")
    spp = _tag1(tags, _SPP, 1)
    bits_arr = tags.get(_BITS, (1,) * spp)
    if len(set(bits_arr)) != 1:
        raise NotImplementedError(f"mixed bits-per-sample {bits_arr}")
    bits = bits_arr[0]
    if bits not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"{bits}-bit TIFF samples")
    spp_seg = 1 if planar == 2 else spp  # samples per segment pixel
    if bits < 8 and spp_seg != 1:
        raise NotImplementedError("sub-byte multi-sample TIFF")
    predictor = _tag1(tags, _PREDICTOR, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if predictor == 2 and bits < 8:
        raise NotImplementedError("predictor on sub-byte samples")
    t4_opts = _tag1(tags, _T4_OPTIONS, 0)
    t6_opts = _tag1(tags, _T6_OPTIONS, 0)
    if comp in _FAX_COMPS:
        if bits != 1 or spp != 1:
            raise NotImplementedError(
                f"fax TIFF with {bits}-bit/{spp}-sample pixels"
            )
        if photo not in (0, 1):
            raise ValueError(f"fax TIFF photometric {photo}")
    # byte-wise bit reversal is a no-op for whole-byte samples
    reverse_bits = reverse_bits and (comp in _FAX_COMPS or bits < 8)

    # segment geometry: strips or tiles, chunky or per-plane
    tile_w = _tag1(tags, _TILE_W)
    tile_h = _tag1(tags, _TILE_H)
    tiled = tile_w is not None or tile_h is not None
    planes = spp if planar == 2 else 1
    if tiled:
        if not tile_w or not tile_h:
            raise ValueError("tiled TIFF missing TileWidth/TileLength")
        check_dims(tile_w, tile_h, "TIFF tile")
        offsets = tags.get(_TILE_OFFSETS)
        counts = tags.get(_TILE_COUNTS)
        if offsets is None or counts is None:
            raise ValueError("tiled TIFF missing tile offsets/counts")
        across = (w + tile_w - 1) // tile_w
        down = (h + tile_h - 1) // tile_h
        n_seg = across * down
        rps = tile_h
    else:
        offsets = tags.get(_STRIP_OFFSETS)
        counts = tags.get(_STRIP_COUNTS)
        if offsets is None:
            raise ValueError("missing strip offsets")
        rps = min(int(_tag1(tags, _ROWS_PER_STRIP, h)), h) or h
        n_seg = (h + rps - 1) // rps
        if counts is None:
            if comp != _COMP_NONE or n_seg * planes != 1:
                raise ValueError("missing strip byte counts")
            counts = (len(data) - offsets[0],)
    if len(offsets) != n_seg * planes:
        raise ValueError(
            f"segment count {len(offsets)} != expected {n_seg * planes}"
        )

    if comp == _COMP_JPEG:
        rgb = _assemble_jpeg(
            data, tags, offsets, counts, w, h,
            (tile_w, tile_h, across) if tiled else (w, rps, 1),
            planar,
        )
        samples = None
    else:
        samples = np.zeros((h, w, spp), np.uint8)
        seg_w = tile_w if tiled else w
        for p in range(planes):
            for s in range(n_seg):
                off, cnt = offsets[p * n_seg + s], counts[p * n_seg + s]
                n_rows = rps if tiled else min(rps, h - s * rps)
                expected = n_rows * ((seg_w * spp_seg * bits + 7) // 8)
                seg_raw = bytes(data[off : off + cnt])
                if reverse_bits:
                    seg_raw = _BITREV[
                        np.frombuffer(seg_raw, np.uint8)
                    ].tobytes()
                if comp in _FAX_COMPS:
                    from jirlbot_spark.functions.ccitt import decode_fax

                    raw = decode_fax(
                        seg_raw, seg_w, n_rows, comp, t4_opts, t6_opts
                    )
                else:
                    raw = _decompress(seg_raw, comp, expected)
                seg = _segment_samples(
                    raw, n_rows, seg_w, spp_seg, bits, predictor, order
                )
                if tiled:
                    ty, tx = divmod(s, across)
                    ph = min(tile_h, h - ty * tile_h)
                    pw = min(tile_w, w - tx * tile_w)
                    dst = samples[
                        ty * tile_h : ty * tile_h + ph,
                        tx * tile_w : tx * tile_w + pw,
                    ]
                    if planar == 2:
                        dst[..., p] = seg[:ph, :pw, 0]
                    else:
                        dst[...] = seg[:ph, :pw]
                elif planar == 2:
                    samples[s * rps : s * rps + n_rows, :, p] = seg[..., 0]
                else:
                    samples[s * rps : s * rps + n_rows] = seg

    if comp == _COMP_JPEG:
        pass
    elif photo == 3:  # palette: ColorMap is 3 planes of 2^bits SHORTs
        cmap = tags.get(_COLORMAP)
        if cmap is None:
            raise ValueError("palette TIFF without ColorMap")
        n = 1 << bits
        if len(cmap) < 3 * n:
            raise ValueError("short ColorMap")
        pal = (np.array(cmap[: 3 * n], np.uint16).reshape(3, n).T >> 8).astype(
            np.uint8
        )
        rgb = pal[samples[..., 0]]
    elif photo in (0, 1):  # grayscale
        g = samples[..., :1]
        if bits < 8:
            g = (g.astype(np.uint16) * (255 // ((1 << bits) - 1))).astype(
                np.uint8
            )
        if photo == 0:  # WhiteIsZero
            g = 255 - g
        rgb = np.repeat(g, 3, axis=2)
    else:  # RGB (ExtraSamples beyond the third are dropped)
        if spp < 3:
            raise ValueError(f"RGB TIFF with {spp} samples/pixel")
        rgb = samples[..., :3]

    orient = _tag1(tags, _ORIENTATION, 1)
    fn = _ORIENT.get(orient)
    if fn is None:
        raise ValueError(f"invalid TIFF orientation {orient}")
    return np.ascontiguousarray(fn(rgb))


def is_tiff(data: bytes) -> bool:
    return len(data) >= 8 and data[:2] in (_II, _MM) and struct.unpack_from(
        "<H" if data[:2] == _II else ">H", data, 2
    )[0] == 42
