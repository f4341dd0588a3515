"""OpenEXR scanline codec (pure numpy + zlib) for the payload path.

EXR is the HDR interchange format a crawl meets from VFX/render
pipelines. Single-part scanline AND tiled images decode with
compressions NONE (0), RLE (1), ZIPS (2, 1 line/block) and ZIP (3, 16
lines/block; whole-tile for tiled parts); channel types HALF and FLOAT.
Tiled coverage: ONE_LEVEL fully, MIPMAP/RIPMAP assemble the
full-resolution level (0,0) and skip coarser levels (their offsets are
still counted exactly — _tile_offset_count — so the table parses).
PIZ/PXR24/B44/DWA, deep and multi-part files raise the explicit
NotImplementedError gate. (PIZ is implementable in principle — its
Huffman table travels INSIDE each chunk, unlike MP3/VP8's fixed spec
tables — but its bit-packing and 16-bit wavelet details are pinned only
by the OpenEXR source, no copy of which exists in this sandbox, and no
PIZ-compressed validation file exists here either: an unvalidatable
decoder of from-memory details would be a liability, so the gate
stands, stated as a validation-data limitation rather than a table
one.)

Byte-level details pinned here (OpenEXR file-format doc):
  - header = magic 20000630 | version | attr list (name\\0 type\\0
    size value)*, terminated by an empty name; then one uint64 line-
    offset per block; each block = y:int32 | size:uint32 | payload.
  - payload (after entropy decode) = per scanline, channels in FILE
    ORDER (the chlist is stored sorted), w samples each.
  - RLE: signed count byte n: n < 0 -> -n literal bytes follow,
    n >= 0 -> next byte repeats n+1 times.
  - RLE/ZIP post-process: integrate the delta predictor
    (t[i] += t[i-1] - 128), then de-interleave (first half -> even
    output bytes, second half -> odd).

decode_exr returns (h, w, 3) uint8 via the IDENTITY transfer
(clip [0,1] * 255): EXR is nominally scene-linear, but tone mapping is
display POLICY, not decoding — and wild converter output (e.g.
CPython's third-party test file) stores display-referred values, which
identity reproduces exactly (tests/test_wild_files.py pins ~80 dB on
opaque pixels). Callers needing HDR floats use decode_exr_channels.

encode_exr writes ZIP-compressed HALF RGB. uint8/255 is exactly
representable in half precision to within < 0.5/255, so the
encode->decode round trip is BIT-EXACT for 8-bit RGB and "exr" joins
images.LOSSLESS_FMTS.

No reference counterpart: RovoMe/JIRLbot never decodes payloads; this
serves the graft's decoded-pixel invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from jirlbot_spark.functions.limits import bounded_inflate, check_dims

_MAGIC = 20000630
_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_PT_DTYPE = {_PT_HALF: np.dtype("<f2"), _PT_FLOAT: np.dtype("<f4")}
_COMP_LINES = {0: 1, 1: 1, 2: 1, 3: 16}  # none, rle, zips, zip


def _rle_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = struct.unpack_from("b", data, i)[0]
        i += 1
        if c < 0:
            out += data[i : i - c]
            i += -c
        else:
            out += data[i : i + 1] * (c + 1)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated EXR RLE block")
    return bytes(out[:expected])


def _postdecode(raw: bytes) -> bytes:
    """Predictor integration + de-interleave (RLE/ZIPS/ZIP blocks)."""
    t = np.frombuffer(raw, np.uint8).astype(np.int64)
    t = (np.cumsum(t - 128) + 128 * 1) % 256  # t[i] += t[i-1] - 128
    # first element must stay as stored: cumsum(t-128)+128 at i=0 is t[0]
    n = len(t)
    half = (n + 1) // 2
    out = np.zeros(n, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def _predecode(raw: bytes) -> bytes:
    """Inverse of _postdecode (encoder side): interleave-split, delta."""
    a = np.frombuffer(raw, np.uint8)
    split = np.concatenate([a[0::2], a[1::2]]).astype(np.int64)
    d = np.empty_like(split)
    d[0] = split[0]
    d[1:] = (split[1:] - split[:-1] + 128) % 256
    return d.astype(np.uint8).tobytes()


def _read_header(data: bytes) -> tuple[dict, int]:
    magic, version = struct.unpack_from("<iI", data, 0)
    if magic != _MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x1000 or version & 0x800:
        raise NotImplementedError("multi-part / deep EXR")
    attrs: dict[bytes, tuple[bytes, bytes]] = {}
    pos = 8
    while True:
        if data[pos] == 0:
            pos += 1
            break
        e = data.index(b"\0", pos)
        name = data[pos:e]
        pos = e + 1
        e = data.index(b"\0", pos)
        typ = data[pos:e]
        pos = e + 1
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        attrs[name] = (typ, data[pos : pos + size])
        pos += size
    return attrs, pos


def _parse_channels(val: bytes) -> list[tuple[str, int]]:
    chans = []
    p = 0
    while p < len(val) and val[p] != 0:
        q = val.index(b"\0", p)
        name = val[p:q].decode("latin-1")
        p = q + 1
        (ptype,) = struct.unpack_from("<I", val, p)
        (xs, ys) = struct.unpack_from("<ii", val, p + 8)
        if xs != 1 or ys != 1:
            raise NotImplementedError("subsampled EXR channels")
        p += 16
        chans.append((name, ptype))
    return chans


def _n_levels(size: int, round_up: bool) -> int:
    n = 1
    while size > 1:
        size = (size + 1) // 2 if round_up else size // 2
        n += 1
    return n


def _level_size(size: int, level: int, round_up: bool) -> int:
    for _ in range(level):
        size = max(1, (size + 1) // 2 if round_up else size // 2)
    return size


def _tile_offset_count(
    w: int, h: int, tw: int, th: int, mode: int
) -> int:
    """Offset-table length for a tiled part (file-format doc): ONE_LEVEL
    counts the level-0 grid; MIPMAP sums each level's grid; RIPMAP sums
    every (level_x, level_y) combination."""
    level_mode, round_up = mode & 0x0F, bool(mode >> 4)

    def tiles(sz: int, t: int) -> int:
        return (sz + t - 1) // t

    if level_mode == 0:
        return tiles(w, tw) * tiles(h, th)
    if level_mode == 1:
        n = max(_n_levels(w, round_up), _n_levels(h, round_up))
        return sum(
            tiles(_level_size(w, l, round_up), tw)
            * tiles(_level_size(h, l, round_up), th)
            for l in range(n)
        )
    if level_mode == 2:
        nx, ny = _n_levels(w, round_up), _n_levels(h, round_up)
        return sum(
            tiles(_level_size(w, lx, round_up), tw)
            * tiles(_level_size(h, ly, round_up), th)
            for lx in range(nx)
            for ly in range(ny)
        )
    raise ValueError(f"bad EXR tile level mode {level_mode}")


def decode_exr_channels(data: bytes) -> dict[str, np.ndarray]:
    """Full-precision decode: {channel name: (h, w) float32}. Scanline
    and tiled (ONE_LEVEL fully; MIPMAP/RIPMAP decode the full-resolution
    level 0) single-part images."""
    attrs, pos = _read_header(data)
    version = struct.unpack_from("<I", data, 4)[0]
    tiled = bool(version & 0x200)
    if b"channels" not in attrs or b"dataWindow" not in attrs:
        raise ValueError("EXR missing channels/dataWindow")
    comp = attrs[b"compression"][1][0] if b"compression" in attrs else 0
    if comp not in _COMP_LINES:
        raise NotImplementedError(f"EXR compression {comp}")
    x0, y0, x1, y1 = struct.unpack("<4i", attrs[b"dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    check_dims(w, h, "EXR dataWindow")
    chans = _parse_channels(attrs[b"channels"][1])
    if any(t == _PT_UINT for _, t in chans):
        raise NotImplementedError("UINT EXR channels")
    if tiled:
        if b"tiles" not in attrs:
            raise ValueError("tiled EXR missing the tiles attribute")
        tw, th, tmode = struct.unpack("<IIB", attrs[b"tiles"][1][:9])
        if not tw or not th:
            raise ValueError("bad EXR tile size")
        check_dims(tw, th, "EXR tile")
        return _decode_tiled(
            data, pos, attrs, chans, comp, (x0, y0, w, h), (tw, th, tmode)
        )
    lines = _COMP_LINES[comp]
    n_blocks = (h + lines - 1) // lines
    offsets = struct.unpack_from(f"<{n_blocks}Q", data, pos)

    row_nbytes = sum(w * _PT_DTYPE[t].itemsize for _, t in chans)
    out = {name: np.zeros((h, w), np.float32) for name, _ in chans}
    for off in offsets:
        y, size = struct.unpack_from("<iI", data, off)
        raw = bytes(data[off + 8 : off + 8 + size])
        n_rows = min(lines, y1 - y + 1)
        expected = n_rows * row_nbytes
        if comp in (2, 3):
            raw = _postdecode(bounded_inflate(raw, expected))
        elif comp == 1:
            raw = _postdecode(_rle_decode(raw, expected))
        if len(raw) < expected:
            raise ValueError("truncated EXR block")
        p = 0
        for r in range(n_rows):
            for name, t in chans:
                dt = _PT_DTYPE[t]
                row = np.frombuffer(raw, dt, count=w, offset=p)
                out[name][y - y0 + r] = row.astype(np.float32)
                p += w * dt.itemsize
    return out


def _decode_tiled(
    data: bytes,
    pos: int,
    attrs: dict,
    chans: list[tuple[str, int]],
    comp: int,
    window: tuple[int, int, int, int],
    tiledesc: tuple[int, int, int],
) -> dict[str, np.ndarray]:
    """Tile blocks: dx | dy | level_x | level_y (int32 each) | size
    (uint32) | payload; every tile entropy-decodes as ONE block (the
    scanline 16-row ZIP grouping does not apply). Only level (0, 0)
    is assembled; coarser mip/rip levels are skipped."""
    x0, y0, w, h = window
    tw, th, tmode = tiledesc
    n_off = _tile_offset_count(w, h, tw, th, tmode)
    offsets = struct.unpack_from(f"<{n_off}Q", data, pos)
    out = {name: np.zeros((h, w), np.float32) for name, _ in chans}
    for off in offsets:
        dx, dy, lx, ly, size = struct.unpack_from("<4iI", data, off)
        if (lx, ly) != (0, 0):
            continue
        tx0, ty0 = dx * tw, dy * th
        if not (0 <= tx0 < w and 0 <= ty0 < h):
            raise ValueError("EXR tile outside the data window")
        cw, ch_rows = min(tw, w - tx0), min(th, h - ty0)
        row_nbytes = sum(cw * _PT_DTYPE[t].itemsize for _, t in chans)
        expected = ch_rows * row_nbytes
        raw = bytes(data[off + 20 : off + 20 + size])
        if comp in (2, 3):
            raw = _postdecode(bounded_inflate(raw, expected))
        elif comp == 1:
            raw = _postdecode(_rle_decode(raw, expected))
        if len(raw) < expected:
            raise ValueError("truncated EXR tile")
        p = 0
        for r in range(ch_rows):
            for name, t in chans:
                dt = _PT_DTYPE[t]
                row = np.frombuffer(raw, dt, count=cw, offset=p)
                out[name][ty0 + r, tx0 : tx0 + cw] = row.astype(np.float32)
                p += cw * dt.itemsize
    return out


def decode_exr(data: bytes) -> np.ndarray:
    """EXR -> (h, w, 3) uint8 RGB, identity transfer (see module doc).
    RGB channels preferred; a lone Y channel replicates to gray."""
    ch = decode_exr_channels(data)
    if all(k in ch for k in "RGB"):
        rgb = np.stack([ch["R"], ch["G"], ch["B"]], axis=-1)
    elif "Y" in ch:
        rgb = np.repeat(ch["Y"][:, :, None], 3, axis=2)
    else:
        raise ValueError(f"EXR without RGB or Y channels: {sorted(ch)}")
    return np.round(np.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8)


def encode_exr(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> ZIP-compressed HALF scanline EXR.
    Bit-exact round trip (half precision resolves 1/255 steps)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = pixels.shape
    half = (pixels.astype(np.float32) / 255.0).astype("<f2")

    def attr(name: bytes, typ: bytes, val: bytes) -> bytes:
        return name + b"\0" + typ + b"\0" + struct.pack("<I", len(val)) + val

    chlist = b"".join(
        n.encode() + b"\0" + struct.pack("<IBBBBii", _PT_HALF, 0, 0, 0, 0, 1, 1)
        for n in ("B", "G", "R")  # stored sorted per spec
    ) + b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<iI", _MAGIC, 2)
        + attr(b"channels", b"chlist", chlist)
        + attr(b"compression", b"compression", b"\x03")  # ZIP
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", b"\x00")
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<2f", 0, 0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + b"\0"
    )
    blocks = []
    for y in range(0, h, 16):
        n_rows = min(16, h - y)
        rows = []
        for r in range(n_rows):
            for name in ("B", "G", "R"):
                c = {"R": 0, "G": 1, "B": 2}[name]
                rows.append(half[y + r, :, c].tobytes())
        payload = zlib.compress(_predecode(b"".join(rows)), 6)
        blocks.append((y, payload))
    n_blocks = len(blocks)
    pos = len(header) + 8 * n_blocks
    offsets, body = [], []
    for y, payload in blocks:
        offsets.append(pos)
        body.append(struct.pack("<iI", y, len(payload)) + payload)
        pos += 8 + len(payload)
    return (
        header
        + struct.pack(f"<{n_blocks}Q", *offsets)
        + b"".join(body)
    )


def encode_exr_tiled(
    pixels: np.ndarray, tile: tuple[int, int] = (32, 32)
) -> bytes:
    """(h, w, 3) uint8 RGB -> ONE_LEVEL tiled ZIP HALF EXR (version bit
    0x200, tiledesc attribute, 20-byte tile block headers; edge tiles
    store only their cropped portion per the file-format doc)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = pixels.shape
    tw, th = tile
    half = (pixels.astype(np.float32) / 255.0).astype("<f2")

    def attr(name: bytes, typ: bytes, val: bytes) -> bytes:
        return name + b"\0" + typ + b"\0" + struct.pack("<I", len(val)) + val

    chlist = b"".join(
        n.encode() + b"\0" + struct.pack("<IBBBBii", _PT_HALF, 0, 0, 0, 0, 1, 1)
        for n in ("B", "G", "R")
    ) + b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<iI", _MAGIC, 2 | 0x200)
        + attr(b"channels", b"chlist", chlist)
        + attr(b"compression", b"compression", b"\x03")  # ZIP
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", b"\x00")
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<2f", 0, 0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + attr(b"tiles", b"tiledesc", struct.pack("<IIB", tw, th, 0))
        + b"\0"
    )
    blocks = []
    for dy in range((h + th - 1) // th):
        for dx in range((w + tw - 1) // tw):
            ty0, tx0 = dy * th, dx * tw
            ch_rows, cw = min(th, h - ty0), min(tw, w - tx0)
            rows = []
            for r in range(ch_rows):
                for c in (2, 1, 0):  # B, G, R file order
                    rows.append(
                        half[ty0 + r, tx0 : tx0 + cw, c].tobytes()
                    )
            payload = zlib.compress(_predecode(b"".join(rows)), 6)
            blocks.append((dx, dy, payload))
    n_blocks = len(blocks)
    pos = len(header) + 8 * n_blocks
    offsets, body = [], []
    for dx, dy, payload in blocks:
        offsets.append(pos)
        body.append(
            struct.pack("<4iI", dx, dy, 0, 0, len(payload)) + payload
        )
        pos += 20 + len(payload)
    return header + struct.pack(f"<{n_blocks}Q", *offsets) + b"".join(body)


def is_exr(data: bytes) -> bool:
    return len(data) >= 8 and struct.unpack_from("<i", data, 0)[0] == _MAGIC
