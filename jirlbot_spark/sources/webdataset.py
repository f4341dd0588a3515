"""WebDataset-style tar shards for image+caption pairs — the standard
large-scale image-text training format (LAION releases, img2dataset
output, the WebDataset loader family): POSIX tar archives whose
consecutive members share a basename key, one sample = {key}.{ext}
(image bytes) + {key}.txt (caption) + {key}.json (metadata).

Byte determinism (the WARC/token_shards contract — re-export is
byte-identical): headers are written as RAW USTAR by this module, not
via the tarfile module — mtime pinned to 0, mode 0644, uid/gid 0,
empty uname/gname, no PAX extensions, samples sorted by key within a
shard, shard membership by deterministic key hash. The stdlib
`tarfile` module is a separately-authored tar implementation, so tests
use it as an INDEPENDENT cross-validator in both directions (our
archives parse with tarfile member-for-member; tarfile-written
archives parse with our reader) — the functions/aiff_au.py wild-file
pattern applied to the container this module owns.

Write path: one applyInPandas task per shard (sorted, in-task atomic
tmp+rename, manifest row back with zlib-crc32 of the full archive so
the driver key can certify payloads against JVM crc32 — two
independent crc implementations). Read path: binaryFile scan over
*.tar + a mapInPandas ustar walk grouping members by key.

Scale posture: the only wide operation is the repartition-by-shard of
(key, bytes, caption) rows; each task holds one shard (size n_shards
so a shard fits an executor — WebDataset practice is ~1 GB shards for
exactly this reason). Keys are sorted per shard, so a training loader
streams sequentially; shard files never rewrite (append a new shard
range for corpus growth).
"""

from __future__ import annotations

import json
import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["write_webdataset", "read_webdataset", "build_tar", "parse_tar"]

_FMT_EXT = {"jpeg": "jpg"}

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
        StructField("crc32", LongType()),
        StructField("path", StringType()),
    ]
)

READ_SCHEMA = StructType(
    [
        StructField("src_file", StringType()),
        StructField("key", StringType()),
        StructField("ext", StringType()),
        StructField("image_bytes", BinaryType()),
        StructField("caption", StringType()),
        StructField("meta_json", StringType()),
    ]
)


def _ustar_header(name: str, size: int) -> bytes:
    """One 512-byte USTAR header, fully pinned (mtime 0, mode 0644,
    uid/gid 0, regular file)."""
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError(f"tar member name too long: {name!r}")
    h = bytearray(512)
    h[0:len(nb)] = nb
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}\x00".encode()
    h[136:148] = b"00000000000\x00"  # mtime 0
    h[148:156] = b" " * 8  # checksum placeholder
    h[156] = 0x30  # typeflag '0'
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}\x00 ".encode()
    return bytes(h)


def _member(name: str, data: bytes) -> bytes:
    pad = (512 - len(data) % 512) % 512
    return _ustar_header(name, len(data)) + data + b"\x00" * pad


def build_tar(samples: list[tuple[str, str, bytes, str, str]]) -> bytes:
    """samples: (key, ext, image_bytes, caption, meta_json), pre-sorted
    by key. Returns the full archive bytes (two zero-blocks appended).

    Keys must be dot-free: WebDataset readers (ours included) split a
    member's basename at the FIRST dot, so a dotted key would silently
    fragment its sample on read — fail loudly at write time instead."""
    out = []
    for key, ext, img, caption, meta in samples:
        if "." in key:
            raise ValueError(
                f"WebDataset sample key {key!r} contains '.' — readers "
                "treat everything after the first dot as the extension"
            )
        out.append(_member(f"{key}.{ext}", img))
        out.append(_member(f"{key}.txt", caption.encode()))
        out.append(_member(f"{key}.json", meta.encode()))
    out.append(b"\x00" * 1024)
    return b"".join(out)


def parse_tar(data: bytes) -> list[tuple[str, bytes]]:
    """(member_name, payload) pairs via our own ustar walk. Stops at
    the terminating zero block; raises on malformed headers (fail
    closed on untrusted bytes, the codec-family posture)."""
    out = []
    pos = 0
    n = len(data)
    terminated = False
    while pos + 512 <= n:
        hdr = data[pos : pos + 512]
        if hdr == b"\x00" * 512:
            terminated = True
            break
        name = hdr[0:100].split(b"\x00", 1)[0].decode()
        size_f = hdr[124:136].split(b"\x00", 1)[0].strip()
        try:
            size = int(size_f or b"0", 8)
        except ValueError as e:
            raise ValueError("bad tar size field") from e
        # verify the header checksum (spaces substituted per spec)
        stored = hdr[148:156].split(b"\x00", 1)[0].strip()
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored and int(stored, 8) != calc:
            raise ValueError("tar header checksum mismatch")
        pos += 512
        if pos + size > n:
            raise ValueError("truncated tar member")
        if hdr[156] in (0x30, 0x00):  # regular file
            out.append((name, data[pos : pos + size]))
        pos += size + (512 - size % 512) % 512
    if not terminated:
        raise ValueError("tar archive missing zero terminator")
    return out


def _meta_json(row, meta_cols: tuple[str, ...]) -> str:
    # pinned key order + separators: byte-deterministic metadata
    out = {}
    for c in meta_cols:
        v = getattr(row, c)
        if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
            out[c] = None
        elif hasattr(v, "item"):  # numpy scalar -> plain python
            out[c] = v.item()
        else:
            out[c] = v
    return json.dumps(out, sort_keys=True, separators=(",", ":"))


def write_webdataset(
    pairs: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
    meta_cols: tuple[str, ...] = ("w", "h", "phash"),
) -> DataFrame:
    """Export the pair table as shard-{s:05d}.tar files under `path`.
    Returns the manifest frame; collect()/count() it to run the
    export."""
    cols = [id_col, bytes_col, fmt_col, caption_col, *meta_cols]
    sel = pairs.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_shards)))
        .cast("int")
        .alias("__shard"),
        *cols,
    )

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values(id_col, kind="mergesort")
        samples = []
        for row in pdf.itertuples(index=False):
            fmt = str(getattr(row, fmt_col))
            samples.append(
                (
                    str(getattr(row, id_col)),
                    _FMT_EXT.get(fmt, fmt),
                    bytes(getattr(row, bytes_col)),
                    str(getattr(row, caption_col)),
                    _meta_json(row, (fmt_col, *meta_cols)),
                )
            )
        data = build_tar(samples)
        os.makedirs(path, exist_ok=True)
        fname = os.path.join(path, f"shard-{shard:05d}.tar")
        tmp = fname + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, fname)  # atomic: readers never see partials
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(samples)],
                "n_bytes": [len(data)],
                "crc32": [zlib.crc32(data)],
                "path": [fname],
            }
        )

    return sel.groupBy("__shard").applyInPandas(part, MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan shard-*.tar archives back into one row per sample:
    (src_file, key, ext, image_bytes, caption, meta_json). Members are
    grouped by basename key as encountered (the WebDataset adjacency
    contract); samples missing an image member are dropped.

    Keying follows the WebDataset convention: everything before the
    FIRST dot of the basename is the key, the rest is the (possibly
    multi-dot) extension. Migration note: shards written with DOTTED
    sample keys by a pre-convention writer cannot be read correctly
    under ANY first-dot reader (the dot is indistinguishable from an
    extension separator) — such keys fragment silently here exactly as
    they would under the reference WebDataset loader. build_tar has
    rejected dotted keys since the convention switch, so only external
    legacy shards are affected."""
    files = spark.read.format("binaryFile").load(path_glob)

    def walk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf[["path", "content"]].itertuples(index=False):
                groups: dict[str, dict[str, bytes]] = {}
                order: list[str] = []
                for name, payload in parse_tar(bytes(t.content)):
                    # WebDataset keys samples by everything before the
                    # FIRST dot of the basename (extensions are multi-dot,
                    # e.g. "seg.png"); splitting at the last dot would
                    # fragment such samples from external shards
                    dirname, _, base = name.rpartition("/")
                    stem, _, ext = base.partition(".")
                    key = f"{dirname}/{stem}" if dirname else stem
                    if key not in groups:
                        groups[key] = {}
                        order.append(key)
                    groups[key][ext] = payload
                for key in order:
                    g = groups[key]
                    img_ext = next(
                        (e for e in g if e not in ("txt", "json")), None
                    )
                    if img_ext is None:
                        continue
                    rows.append(
                        (
                            str(t.path),
                            key,
                            img_ext,
                            g[img_ext],
                            g.get("txt", b"").decode(),
                            g.get("json", b"").decode(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in READ_SCHEMA.fields]
            )

    return files.mapInPandas(walk, READ_SCHEMA)
