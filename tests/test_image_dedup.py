"""pHash near-dup operator tests (operators/image_dedup.py).

The O(n²) reference here is computed independently in numpy (XOR +
popcount over the full pair matrix), so a green run asserts both the
banded join's arithmetic and its pigeonhole recall — the same style of
check the dedup_simhash golden uses, but executed live.
"""

from __future__ import annotations

import numpy as np
import pytest

from jirlbot_spark.operators.image_dedup import phash_canonical, phash_neardup
from jirlbot_spark.sources.fixtures import gen_phash_corpus


def _exact_pairs(df, max_hamming: int) -> set:
    ph = df["phash"].to_numpy().astype(np.uint64)
    ids = df["image_id"].tolist()
    x = ph[:, None] ^ ph[None, :]
    ham = np.zeros(x.shape, np.int64)
    v = x.copy()
    for _ in range(64):
        ham += (v & 1).astype(np.int64)
        v >>= np.uint64(1)
    out = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and ham[i, j] <= max_hamming:
                out.add((ids[i], ids[j], int(ham[i, j])))
    return out


def test_neardup_matches_exact_reference(spark):
    corpus = gen_phash_corpus(17, 160)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup(
            spark.createDataFrame(corpus), max_hamming=7
        ).collect()
    }
    assert got == _exact_pairs(corpus, 7)
    assert got  # the fixture plants pairs; an empty green would be vacuous


def test_neardup_tighter_band_and_blocks(spark):
    corpus = gen_phash_corpus(5, 96)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup(
            spark.createDataFrame(corpus), max_hamming=3, block_bits=16
        ).collect()
    }
    assert got == _exact_pairs(corpus, 3)


def test_recall_bound_enforced(spark):
    df = spark.createDataFrame(gen_phash_corpus(1, 8))
    with pytest.raises(ValueError):
        phash_neardup(df, max_hamming=8, block_bits=8)  # 8 blocks -> d<=7
    with pytest.raises(ValueError):
        phash_neardup(df, block_bits=12)  # must divide 64


def test_canonical_assignment(spark):
    corpus = gen_phash_corpus(17, 64)
    got = {
        (r.image_id, r.canonical_id)
        for r in phash_canonical(spark.createDataFrame(corpus)).collect()
    }
    by_hash: dict = {}
    for i, p in zip(corpus["image_id"], corpus["phash"]):
        by_hash.setdefault(int(p), []).append(i)
    expected = {
        (i, min(ids)) for ids in by_hash.values() for i in ids
    }
    assert got == expected
    # exact-duplicate groups exist in the fixture and share a canonical
    assert any(a != b for a, b in got)


def test_plan_no_cartesian(spark):
    """The banded join must never degrade to a cartesian product."""
    df = spark.createDataFrame(gen_phash_corpus(3, 64))
    plan = phash_neardup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
