"""Packed-token binary shards (sources/token_shards.py)."""

from __future__ import annotations

import glob
import os
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from jirlbot_spark.sources.token_shards import (
    MAGIC,
    read_token_shards,
    write_token_shards,
)


def _corpus(spark, n=40):
    rows = [
        (i, [int(x) for x in range(i % 7)] + [i % 50000])
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def test_roundtrip_exact(spark, tmp_path):
    rows, df = _corpus(spark)
    out = str(tmp_path / "shards")
    manifest = write_token_shards(df, out, n_shards=4).collect()
    assert {r["shard"] for r in manifest} == {0, 1, 2, 3}
    assert sum(r["n_docs"] for r in manifest) == len(rows)
    back = {
        r["doc_id"]: (list(r["tokens"]), r["shard"])
        for r in read_token_shards(spark, out).collect()
    }
    for doc_id, toks in rows:
        assert back[doc_id] == (toks, doc_id % 4), doc_id


def test_format_independent_parse(spark, tmp_path):
    """A from-the-docstring parser (struct module, no engine code)
    reads the files — pins the byte format, not just the round trip."""
    rows, df = _corpus(spark, 17)
    out = str(tmp_path / "shards")
    write_token_shards(df, out, n_shards=2).collect()
    got = {}
    for idx_path in sorted(glob.glob(os.path.join(out, "*.idx"))):
        with open(idx_path, "rb") as f:
            raw = f.read()
        assert raw[:8] == MAGIC and raw[8] == 4
        (n_docs,) = struct.unpack("<I", raw[12:16])
        ext = [
            struct.unpack("<qq", raw[16 + 16 * i : 32 + 16 * i])
            for i in range(n_docs)
        ]
        with open(idx_path[:-4] + ".bin", "rb") as f:
            toks = np.frombuffer(f.read(), dtype="<i4")
        off = 0
        for doc_id, n in ext:
            got[doc_id] = list(map(int, toks[off : off + n]))
            off += n
        assert off == len(toks)
    assert got == dict(rows)


def test_deterministic_bytes_and_crc(spark, tmp_path):
    rows, df = _corpus(spark, 23)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = {r["shard"]: r for r in write_token_shards(df, a, 3).collect()}
    mb = {r["shard"]: r for r in write_token_shards(df, b, 3).collect()}
    for s in ma:
        pa, pb = ma[s]["path"], mb[s]["path"]
        with open(pa, "rb") as f:
            bytes_a = f.read()
        with open(pb, "rb") as f:
            bytes_b = f.read()
        assert bytes_a == bytes_b  # re-export is byte-identical
        assert ma[s]["crc32"] == zlib.crc32(bytes_a)
        assert ma[s]["bin_bytes"] == len(bytes_a)


def test_uint16_bounds_checked(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1, 2, 70000])], "doc_id long, tokens array<int>"
    )
    with pytest.raises(Exception, match="out of range|PythonException"):
        write_token_shards(
            df, str(tmp_path / "u16"), 1, dtype="uint16"
        ).collect()


def test_uint16_roundtrip(spark, tmp_path):
    rows = [(i, [i % 65536, 65535]) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = str(tmp_path / "u16ok")
    write_token_shards(df, out, 2, dtype="uint16").collect()
    back = {
        r["doc_id"]: list(r["tokens"])
        for r in read_token_shards(spark, out).collect()
    }
    assert back == dict(rows)


def test_corrupt_magic_raises(spark, tmp_path):
    rows, df = _corpus(spark, 5)
    out = str(tmp_path / "corrupt")
    write_token_shards(df, out, 1).collect()
    idx = glob.glob(os.path.join(out, "*.idx"))[0]
    with open(idx, "r+b") as f:
        f.write(b"XXXXXXXX")
    with pytest.raises(Exception, match="magic|PythonException"):
        read_token_shards(spark, out).collect()
