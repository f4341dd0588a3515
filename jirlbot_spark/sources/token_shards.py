"""Packed-token binary shard sink + source — the tensor-side handoff.

`operators/packing.py` computes WHERE every document lands in the
packed token stream; this module materializes that stream the way
pretraining data loaders consume it (the Megatron-style indexed-
dataset idea: one flat binary of token ids + an index of document
extents, memory-mapped at train time). The byte format here is the
ENGINE'S OWN pinned contract (documented below, deterministic to the
byte) — "Megatron-style" describes the shape, not byte compatibility
with any external tool.

Pinned format, per shard s:
  shard-{s:05d}.bin   token ids, little-endian, `dtype` (int32 default,
                      uint16 optional — ids are bounds-checked loudly),
                      documents concatenated in ascending doc_id order
                      (the pack_sequences stream order, so start_token
                      offsets from pack_sequences index into this file
                      directly)
  shard-{s:05d}.idx   b"JSHARD01" magic, u8 dtype code (4=int32,
                      2=uint16), u8[3] zero pad, u32 LE n_docs, then
                      n_docs × (i64 LE doc_id, i64 LE n_tokens)

No timestamps, no uuids in the payload: re-exporting the same frame is
byte-identical (the WARC connector's reproducibility contract).

Write path: one applyInPandas task per shard — sorts its docs, writes
.bin/.idx via in-task ATOMIC tmp+rename (the warc.py pattern: a
crashed task leaves no readable garbage, a retried task overwrites
equivalently), and returns a manifest row with byte counts and a
crc32 so the driver key can certify payload integrity with two
independent crc implementations (zlib here, JVM-side on read).

Read path: `spark.read.format("binaryFile")` over .idx and .bin pairs
joined on shard (works on any Hadoop-visible filesystem — no driver-
local listing), then one mapInPandas parse back to (doc_id,
tokens). Round-tripping is the tested contract.

Scale posture: shard count spreads the sort+write exactly like
pack_sequences' shard windows; each task holds one shard's tokens
(size the shard count so a shard fits an executor — the same rule the
packed stream imposes on any writer). The shuffle carries (doc_id,
tokens) once, keyed by shard.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["write_token_shards", "read_token_shards"]

MAGIC = b"JSHARD01"
_DTYPES = {"int32": (4, np.int32, 2**31 - 1), "uint16": (2, np.uint16, 65535)}

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("n_docs", LongType()),
        StructField("n_tokens", LongType()),
        StructField("bin_bytes", LongType()),
        StructField("crc32", LongType()),
        StructField("path", StringType()),
    ]
)


def write_token_shards(
    tokens_df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    dtype: str = "int32",
) -> DataFrame:
    """Write (id, tokens array<int>) as packed binary shards; returns
    the manifest frame (one row per shard, including empty shards'
    absence — shards with no documents write no files)."""
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}")
    code, np_dtype, tok_max = _DTYPES[dtype]
    os.makedirs(out_dir, exist_ok=True)

    rows = tokens_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).alias("tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        s = int(pdf["shard"].iloc[0])
        parts, extents = [], []
        for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
            arr = np.asarray(toks if toks is not None else [], np.int64)
            if len(arr) and (arr.min() < 0 or arr.max() > tok_max):
                raise ValueError(
                    f"token id out of range for {dtype} in doc {doc_id}"
                )
            parts.append(arr.astype("<" + np.dtype(np_dtype).str[1:]))
            extents.append((int(doc_id), len(arr)))
        bin_payload = b"".join(p.tobytes() for p in parts)
        idx = bytearray(MAGIC)
        idx += bytes([code, 0, 0, 0])
        idx += int(len(extents)).to_bytes(4, "little")
        ext = np.array(extents, dtype="<i8").reshape(-1, 2)
        idx += ext.tobytes()
        base = os.path.join(out_dir, f"shard-{s:05d}")
        for suffix, payload in ((".bin", bin_payload), (".idx", bytes(idx))):
            tmp = f"{base}{suffix}.tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, f"{base}{suffix}")
        return pd.DataFrame(
            {
                "shard": [s],
                "n_docs": [len(extents)],
                "n_tokens": [int(sum(n for _, n in extents))],
                "bin_bytes": [len(bin_payload)],
                "crc32": [zlib.crc32(bin_payload)],
                "path": [base + ".bin"],
            }
        )

    return rows.groupBy("shard").applyInPandas(
        write_shard, schema=MANIFEST_SCHEMA
    )


def read_token_shards(spark: SparkSession, shard_dir: str) -> DataFrame:
    """(doc_id, tokens array<int>, shard) back from a shard directory.
    Corrupt magic/dtype raises loudly (shards are engine-written, not
    untrusted web bytes — failing beats silently dropping documents)."""
    def load(name_glob: str) -> DataFrame:
        return (
            spark.read.format("binaryFile")
            .load(os.path.join(shard_dir, name_glob))
            .select(
                F.regexp_extract(F.col("path"), r"shard-(\d+)\.", 1)
                .cast("int")
                .alias("shard"),
                F.col("content"),
            )
        )

    pairs = (
        load("shard-*.idx")
        .withColumnRenamed("content", "idx")
        .join(load("shard-*.bin").withColumnRenamed("content", "bin"), "shard")
    )
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("shard", IntegerType()),
        ]
    )

    def parse(it):
        for pdf in it:
            for shard, idx, bin_ in zip(
                pdf["shard"], pdf["idx"], pdf["bin"]
            ):
                idx = bytes(idx)
                if idx[:8] != MAGIC:
                    raise ValueError(f"bad shard magic in shard {shard}")
                code = idx[8]
                np_dtype = {4: np.int32, 2: np.uint16}.get(code)
                if np_dtype is None:
                    raise ValueError(f"bad dtype code {code}")
                n_docs = int(
                    np.frombuffer(idx[12:16], dtype="<u4")[0]
                )
                ext = np.frombuffer(
                    idx[16 : 16 + 16 * n_docs], dtype="<i8"
                ).reshape(-1, 2)
                toks = np.frombuffer(
                    bytes(bin_), dtype="<" + np.dtype(np_dtype).str[1:]
                ).astype(np.int32)
                off = 0
                ids, arrs = [], []
                for doc_id, n in ext:
                    ids.append(int(doc_id))
                    arrs.append(toks[off : off + int(n)])
                    off += int(n)
                if off != len(toks):
                    raise ValueError(
                        f"shard {shard}: extents cover {off} tokens, "
                        f"bin holds {len(toks)}"
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "tokens": arrs,
                        "shard": [int(shard)] * len(ids),
                    }
                )

    return pairs.mapInPandas(parse, schema=out_schema)
