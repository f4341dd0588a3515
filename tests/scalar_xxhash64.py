"""Pure-Python XXH64 — an INDEPENDENT scalar reference for Spark's
`xxhash64` expression, written from the public xxHash specification
(Yann Collet, github.com/Cyan4973/xxHash — XXH64 algorithm description),
the way tests/scalar_murmur3.py pins the murmur3 kernel from Appleby's
published algorithm.

Spark semantics being pinned (org.apache.spark.sql.catalyst XxHash64):
- string column -> XXH64(utf8 bytes, seed), default seed 42
- integral column (byte/short/int/long) -> XXH64_of_long(value, seed),
  i.e. the canonical single-8-byte-lane finalization
- multi-argument xxhash64(a, b, ...) -> left fold, each argument hashed
  with the RUNNING hash as its seed
These are verified against the live JVM expression in
tests/test_hashing.py::test_xxhash64_scalar_reference.
"""

from __future__ import annotations

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 0) -> int:
    """Canonical XXH64 of a byte string."""
    seed &= MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k1, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h = (
            _rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * P1) & MASK, 23)
            * P2
            + P3
        ) & MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * P5) & MASK, 11) * P1) & MASK
        i += 1
    return _avalanche(h)


def xxh64_long(value: int, seed: int = 0) -> int:
    """Canonical XXH64 of one little-endian 8-byte lane — what Spark's
    XXH64.hashLong computes for integral columns."""
    return xxh64((value & MASK).to_bytes(8, "little"), seed)


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Replicate Spark's xxhash64(...) fold over str/int arguments.
    Returns a SIGNED 64-bit value (Spark LongType)."""
    h = seed & MASK
    for v in values:
        if isinstance(v, str):
            h = xxh64(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = xxh64(v, h)
        elif isinstance(v, bool):
            raise TypeError("pin bools explicitly — Spark hashes as int")
        elif isinstance(v, int):
            h = xxh64_long(v, h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return h - (1 << 64) if h >= (1 << 63) else h
