"""Decode-bomb guards shared by the image/media codec family.

A crawl's payload path decodes UNTRUSTED bytes. Two classic attack /
corruption shapes must fail fast and small, not big and slow:

  1. dimension bombs — a tiny file whose header claims 100000x100000
     pixels: decoders allocate output buffers from HEADER dims before
     any payload byte is validated, so without a cap a 200-byte file
     allocates gigabytes per row inside an executor.
  2. inflation bombs — a kilobyte of zlib that decompresses to
     gigabytes: `zlib.decompress(raw)` is unbounded; every call site
     that knows its expected output size must decompress WITH that
     bound.

`check_dims` is called by every decoder right after header parse,
BEFORE any output allocation. The default cap (2^26 px = 67 Mpx,
192 MiB as RGB) is far above any plausible crawl image while keeping
the worst per-row allocation bounded; deployments override it with
JIRLBOT_MAX_DECODE_PIXELS (read at import, like the session's other
env hooks).

`bounded_inflate` wraps zlib with a hard output ceiling: it raises on
streams that EXCEED the expected size instead of materializing them.
"""

from __future__ import annotations

import os
import zlib

MAX_DECODE_PIXELS = int(
    os.environ.get("JIRLBOT_MAX_DECODE_PIXELS", str(1 << 26))
)


def check_dims(w: int, h: int, what: str = "image") -> None:
    """Raise ValueError for non-positive or bomb-scale dimensions."""
    if w <= 0 or h <= 0:
        raise ValueError(f"bad {what} dimensions {w}x{h}")
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{what} dimensions {w}x{h} exceed the decode-bomb guard "
            f"({MAX_DECODE_PIXELS} px); raise JIRLBOT_MAX_DECODE_PIXELS "
            "if this is intended"
        )


def bounded_inflate(raw: bytes, expected: int) -> bytes:
    """zlib-decompress at most `expected` bytes; raise if the stream
    holds more (an inflation bomb relative to what the caller needs).
    Short output is returned as-is — callers already validate length."""
    d = zlib.decompressobj()
    out = d.decompress(raw, expected + 1)  # one past the cap detects excess
    if len(out) > expected:
        raise ValueError(
            f"compressed stream inflates past the expected {expected} bytes"
        )
    return out
