from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jirlbot_spark.functions.hashing import (
    murmur3_64_series,
    murmur3_x64_128_batch,
)
from tests.scalar_murmur3 import murmur3_x64_128


def _check(data: list[bytes], seed: int = 0):
    h1, h2 = murmur3_x64_128_batch(data, seed=seed)
    for i, b in enumerate(data):
        e1, e2 = murmur3_x64_128(b, seed=seed)
        assert int(h1[i]) == e1, f"h1 mismatch for {b!r}"
        assert int(h2[i]) == e2, f"h2 mismatch for {b!r}"


def test_empty_is_zero():
    h1, h2 = murmur3_x64_128_batch([b""])
    assert int(h1[0]) == 0 and int(h2[0]) == 0


def test_all_lengths_0_to_64():
    data = [bytes(range(1, n + 1)) for n in range(65)]
    _check(data)


def test_block_boundaries_and_seeds():
    payloads = [b"x" * n for n in (7, 8, 9, 15, 16, 17, 31, 32, 33, 127, 128)]
    for seed in (0, 1, 42, 0xDEADBEEF):
        _check(payloads, seed=seed)


def test_urls_batch():
    urls = [f"http://site{i}.example.com/path/{i}?q={i}" for i in range(500)]
    _check([u.encode() for u in urls])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=50))
def test_property_matches_scalar(data):
    _check(data)


def test_series_signed_int64_and_nulls():
    s = pd.Series(["http://a.com/", None, "http://b.com/"])
    out = murmur3_64_series(s)
    assert out.isna().iloc[1]
    e1, _ = murmur3_x64_128(b"http://a.com/")
    assert int(out.iloc[0]) == np.uint64(e1).astype(np.int64)


def test_distribution_sanity():
    data = [f"u{i}".encode() for i in range(10000)]
    h1, _ = murmur3_x64_128_batch(data)
    assert len(np.unique(h1)) == 10000
    buckets = h1 % np.uint64(32)
    counts = np.bincount(buckets.astype(int), minlength=32)
    assert counts.min() > 10000 / 32 * 0.7


def test_spark_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from jirlbot_spark.functions.hashing import url_hash_col

    df = spark.createDataFrame(
        [(f"http://s{i}.com/",) for i in range(100)], ["url"]
    )
    rows = df.withColumn("h", url_hash_col("url")).collect()
    for r in rows:
        e1, _ = murmur3_x64_128(r.url.encode())
        assert r.h == int(np.uint64(e1).astype(np.int64))
