"""Byte-level image metadata scrubbing — the image-side counterpart of
text PII scrubbing (functions/pii.py): EXIF blocks carry GPS positions,
serial numbers, and timestamps; tEXt/COM/comment blocks carry free text.
A training-data pipeline strips them BEFORE the bytes are archived.

The scrub is a pure container walk — no recode, no pixel access: the
compressed pixel payload is copied verbatim, so decoded pixels are
byte-identical before and after (pinned by golden generation and
pytest), the operation is cheap (O(file size) memcpy, no entropy
decode), and it composes with any downstream decoder.

Pinned per-format policy (allow-lists, the privacy-correct direction —
an unknown chunk is dropped, never kept):

- **PNG**: keep the critical chunks {IHDR, PLTE, IDAT, IEND} plus the
  pixel-interpretation ancillaries {tRNS, gAMA, sRGB, sBIT, bKGD};
  everything else (tEXt, zTXt, iTXt, tIME, eXIf, pHYs, …) and any bytes
  after IEND are dropped.
- **JPEG**: before the first SOS, keep only the structural segments
  (DQT, SOFn, DHT, DRI, and the JPEG-internal DNL/EXP); every APPn
  (JFIF, EXIF, XMP, ICC) and COM is dropped — the in-tree decoder and
  wild bare-SOI files (tests/test_wild_files.py python-raw.jpg) prove
  decoders don't need APP0. From the first SOS on, bytes are copied
  VERBATIM (entropy data, progressive re-scans, RSTn, EOI): metadata
  segments after SOS are vanishingly rare in the wild and splitting the
  entropy stream to hunt them risks corrupting what we keep.
- **GIF**: keep the header/LSD/GCT, image descriptors (with their LCT +
  LZW data), graphic-control extensions, and the NETSCAPE2.0 looping
  application extension (dropping it would change animation behavior);
  comment extensions, plain-text extensions, and all other application
  extensions (XMP ships as one) are dropped.

All three walkers validate structure as they go and raise ValueError on
malformed input (the caller's decode-bomb/corruption posture: scrubbing
untrusted bytes must fail closed, not emit half-walked output).
"""

from __future__ import annotations

__all__ = ["strip_png", "strip_jpeg", "strip_gif", "strip_metadata"]

PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_KEEP = {
    b"IHDR",
    b"PLTE",
    b"IDAT",
    b"IEND",
    b"tRNS",
    b"gAMA",
    b"sRGB",
    b"sBIT",
    b"bKGD",
}
# structural JPEG markers kept pre-SOS: DQT, DHT, DAC, DRI, DNL, EXP and
# SOF0-15 (the SOFn range minus the DHT/JPG/DAC slots, which are not
# frame headers — DHT 0xC4 and DAC 0xCC are decode tables and listed
# explicitly: dropping DAC would strip an arithmetic-coded JPEG's
# conditioning tables and break the decoded-pixels-identical contract)
_JPEG_KEEP = (
    {0xDB, 0xC4, 0xCC, 0xDD, 0xDC, 0xDF}
    | {0xC0 + i for i in range(16) if i not in (4, 8, 12)}
)


def strip_png(data: bytes) -> tuple[bytes, int]:
    """(clean_bytes, n_stripped_chunks). Chunk CRCs travel with their
    chunks, so kept chunks stay valid without recomputation."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    out = [PNG_SIG]
    pos = 8
    n_stripped = 0
    seen_end = False
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        end = pos + 12 + ln
        if end > len(data):
            raise ValueError("truncated PNG chunk")
        if typ in PNG_KEEP:
            out.append(data[pos:end])
        else:
            n_stripped += 1
        pos = end
        if typ == b"IEND":
            seen_end = True
            break
    if not seen_end:
        raise ValueError("PNG missing IEND")
    if pos < len(data):
        n_stripped += 1  # trailing junk after IEND
    return b"".join(out), n_stripped


def strip_jpeg(data: bytes) -> tuple[bytes, int]:
    """(clean_bytes, n_stripped_segments)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out = [b"\xff\xd8"]
    pos = 2
    n_stripped = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (no SOS/EOI)")
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        m = data[pos + 1]
        if m == 0xDA:  # SOS: verbatim to the end (policy above)
            out.append(data[pos:])
            break
        if m == 0xD9:  # EOI before any SOS (degenerate but well-formed)
            out.append(data[pos : pos + 2])
            break
        if m == 0xFF:  # fill byte
            pos += 1
            continue
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone markers
            out.append(data[pos : pos + 2])
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG segment header")
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        end = pos + 2 + seglen
        if seglen < 2 or end > len(data):
            raise ValueError("bad JPEG segment length")
        if m in _JPEG_KEEP:
            out.append(data[pos:end])
        else:  # APPn, COM, and anything not structural
            n_stripped += 1
        pos = end
    return b"".join(out), n_stripped


def _gif_subblocks_end(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1 + n
        if n == 0:
            return pos


def strip_gif(data: bytes) -> tuple[bytes, int]:
    """(clean_bytes, n_stripped_extensions)."""
    if data[:3] != b"GIF" or len(data) < 13:
        raise ValueError("not a GIF")
    packed = data[10]
    pos = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    if pos > len(data):
        raise ValueError("truncated GIF header")
    out = [data[:pos]]
    n_stripped = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF missing trailer")
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            out.append(b"\x3b")
            if pos + 1 < len(data):
                n_stripped += 1  # trailing junk
            break
        if b0 == 0x2C:  # image descriptor + LCT + LZW sub-blocks
            p = pos + 10
            if p > len(data):
                raise ValueError("truncated GIF image descriptor")
            pk = data[pos + 9]
            if pk & 0x80:
                p += 3 * (2 << (pk & 7))
            p += 1  # LZW min code size
            p = _gif_subblocks_end(data, p)
            out.append(data[pos:p])
            pos = p
        elif b0 == 0x21:  # extension
            if pos + 2 > len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos + 1]
            p = _gif_subblocks_end(data, pos + 2)
            keep = label == 0xF9 or (
                label == 0xFF
                and data[pos + 3 : pos + 14] == b"NETSCAPE2.0"
            )
            if keep:
                out.append(data[pos:p])
            else:
                n_stripped += 1
            pos = p
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    return b"".join(out), n_stripped


def strip_metadata(data: bytes, fmt: str) -> tuple[bytes, int, bool]:
    """(clean_bytes, n_stripped, supported). Formats without a pinned
    walker pass through untouched with supported=False — a scrub
    pipeline must never corrupt what it cannot parse."""
    f = fmt.lower()
    if f == "png":
        clean, n = strip_png(data)
    elif f in ("jpeg", "jpg"):
        clean, n = strip_jpeg(data)
    elif f == "gif":
        clean, n = strip_gif(data)
    else:
        return data, 0, False
    return clean, n, True
