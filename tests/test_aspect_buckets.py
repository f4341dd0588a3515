"""Aspect-ratio bucketing + batch assembly (operators/aspect_buckets.py).

Independent reference: the nearest-aspect argmin recomputed here with
Python Fractions (exact rational arithmetic, no common-denominator
trick) — a different formulation of the same decision; batching checked
for the structural invariants (fixed size, same bucket, disjoint
exhaustive, deterministic under repartitioning).
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from jirlbot_spark.operators.aspect_buckets import (
    SDXL_BUCKETS,
    assign_aspect_buckets,
    bucket_batches,
)

BUCKETS = ((256, 256), (320, 192), (192, 320), (384, 160))


def _ref_bucket(w: int, h: int, buckets=BUCKETS) -> int:
    ar = Fraction(w, h)
    costs = [
        (abs(ar - Fraction(bw, bh)), i)
        for i, (bw, bh) in enumerate(buckets)
    ]
    return min(costs)[1]


def _images(spark, n=300):
    # deterministic wild mix of dims incl. exact bucket ratios and ties
    rows = [
        (i, 64 + (i * 37) % 500, 64 + (i * 53) % 500) for i in range(n)
    ] + [(n, 256, 256), (n + 1, 640, 384), (n + 2, 160, 384)]
    return spark.createDataFrame(rows, "image_id long, w int, h int")


def test_assignment_matches_fraction_reference(spark):
    df = assign_aspect_buckets(_images(spark), BUCKETS)
    for r in df.collect():
        want = _ref_bucket(r["w"], r["h"])
        assert r["bucket_id"] == want, (r["w"], r["h"])
        assert (r["bucket_w"], r["bucket_h"]) == BUCKETS[want]


def test_assignment_tie_breaks_to_lowest_index(spark):
    # buckets 1 and 2 are both distance 1/2 from a square image
    tie = ((3, 2), (1, 1), (2, 1))
    df = spark.createDataFrame(
        [(1, 300, 200), (2, 100, 100), (3, 399, 266)],
        "image_id long, w int, h int",
    )
    got = {
        r["image_id"]: r["bucket_id"]
        for r in assign_aspect_buckets(df, tie).collect()
    }
    assert got[1] == 0 and got[2] == 1
    # 399/266 = 3/2 exactly: exact arithmetic must see cost 0
    assert got[3] == 0


def test_assignment_sdxl_ladder_plain_cases(spark):
    df = spark.createDataFrame(
        [(1, 1024, 1024), (2, 1920, 1080), (3, 720, 1280)],
        "image_id long, w int, h int",
    )
    got = {
        r["image_id"]: (r["bucket_w"], r["bucket_h"])
        for r in assign_aspect_buckets(df, SDXL_BUCKETS).collect()
    }
    assert got[1] == (1024, 1024)
    assert got[2][0] > got[2][1]  # landscape stays landscape
    assert got[3][0] < got[3][1]  # portrait stays portrait


def test_bucket_batches_invariants(spark):
    df = assign_aspect_buckets(_images(spark, 400), BUCKETS)
    out = bucket_batches(df, batch_size=8, n_shards=4, seed=7).collect()
    assert len(out) == 403  # nothing dropped, tails only marked
    by_batch: dict[tuple, list] = {}
    for r in out:
        by_batch.setdefault(
            (r["bucket_id"], r["shard"], r["batch_in_shard"]), []
        ).append(r)
    for (_, _, _), rows in by_batch.items():
        complete = {r["complete"] for r in rows}
        assert len(complete) == 1  # a batch is all-complete or all-tail
        if complete == {True}:
            assert len(rows) == 8
            assert sorted(r["pos_in_batch"] for r in rows) == list(
                range(8)
            )
        else:
            assert len(rows) < 8
        assert len({r["bucket_id"] for r in rows}) == 1


def test_bucket_batches_deterministic_under_repartition(spark):
    df = assign_aspect_buckets(_images(spark, 250), BUCKETS)
    a = sorted(
        (r["image_id"], r["shard"], r["batch_in_shard"], r["pos_in_batch"])
        for r in bucket_batches(df, 8, seed=3).collect()
    )
    b = sorted(
        (r["image_id"], r["shard"], r["batch_in_shard"], r["pos_in_batch"])
        for r in bucket_batches(df.repartition(11), 8, seed=3).collect()
    )
    assert a == b


def test_bucket_batches_rejects_bad_size(spark):
    df = assign_aspect_buckets(_images(spark, 10), BUCKETS)
    with pytest.raises(ValueError):
        bucket_batches(df, 0)


def test_assignment_is_exchange_free(spark):
    df = assign_aspect_buckets(_images(spark, 10), BUCKETS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
