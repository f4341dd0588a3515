"""Bloom membership layer: no false negatives, incremental update, and
bit-identical classification with the fast path on vs off (the membership
contract — filters are physical only)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jirlbot_spark.operators.dedup import (
    DUPLICATE_KEY,
    UNIQUE_KEY,
    classify_batch,
)
from jirlbot_spark.operators.membership import (
    bloom_probe,
    build_bloom_files,
    update_bloom_files,
)

LOG2 = 16  # 64 Kib filters keep the tests fast; sizing is config-only


def _keys_df(spark, keys):
    return spark.createDataFrame(
        [(int(k),) for k in keys], "url_hash long"
    )


def test_no_false_negatives_and_low_fp(spark, tmp_path):
    d = str(tmp_path / "bloom")
    rng = np.random.default_rng(7)
    stored = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    stats = build_bloom_files(
        _keys_df(spark, stored), d, num_buckets=8, log2_bits=LOG2
    )
    assert set(stats["bucket"]) == set(range(8))
    assert (stats["fill_ratio"] < 0.5).all()

    # every stored key must probe maybe=True (definitive-negative contract)
    probed = bloom_probe(
        _keys_df(spark, stored), d, num_buckets=8, log2_bits=LOG2
    )
    assert probed.filter(~F.col("__maybe_seen")).count() == 0

    # fresh keys should be overwhelmingly maybe=False
    fresh = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    fresh = np.setdiff1d(fresh, stored)
    probed = bloom_probe(
        _keys_df(spark, fresh), d, num_buckets=8, log2_bits=LOG2
    )
    fp = probed.filter(F.col("__maybe_seen")).count() / len(fresh)
    assert fp < 0.05


def test_incremental_update_covers_new_keys(spark, tmp_path):
    d = str(tmp_path / "bloom")
    build_bloom_files(_keys_df(spark, range(100)), d, num_buckets=4,
                      log2_bits=LOG2)
    update_bloom_files(_keys_df(spark, range(1000, 1100)), d, num_buckets=4,
                       log2_bits=LOG2)
    both = list(range(100)) + list(range(1000, 1100))
    probed = bloom_probe(_keys_df(spark, both), d, num_buckets=4,
                         log2_bits=LOG2)
    assert probed.filter(~F.col("__maybe_seen")).count() == 0


def test_missing_bucket_file_means_maybe(spark, tmp_path):
    d = str(tmp_path / "bloom_empty")
    d_path = tmp_path / "bloom_empty"
    d_path.mkdir()
    probed = bloom_probe(_keys_df(spark, [1, 2, 3]), d, num_buckets=4,
                         log2_bits=LOG2)
    assert probed.filter(~F.col("__maybe_seen")).count() == 0


@pytest.mark.parametrize("with_batch_dups", [False, True])
def test_classification_equivalence(spark, tmp_path, with_batch_dups):
    """classify_batch(bloom_dir=...) ≡ classify_batch() row for row."""
    d = str(tmp_path / "bloom")
    seen_keys = [10, 20, 30, 40]
    seen = _keys_df(spark, seen_keys)
    build_bloom_files(seen, d, num_buckets=4, log2_bits=LOG2)

    rows = [(10, 1), (11, 2), (12, 3), (20, 4), (99, 5)]
    if with_batch_dups:
        rows += [(11, 6), (10, 7), (99, 8)]
    batch = spark.createDataFrame(rows, "url_hash long, arrival long")

    def result(bloom_dir):
        out = classify_batch(
            batch, seen, order_col="arrival", num_buckets=4,
            bloom_dir=bloom_dir,
        )
        return sorted(
            (r.url_hash, r.arrival, r.drum_result) for r in out.collect()
        )

    plain = result(None)
    fast = result(d)
    assert plain == fast
    # spot-check semantics while we're here
    by = {(k, a): r for k, a, r in plain}
    assert by[(11, 2)] == UNIQUE_KEY
    assert by[(10, 1)] == DUPLICATE_KEY  # in store
    if with_batch_dups:
        assert by[(11, 6)] == DUPLICATE_KEY  # second in-batch arrival
        assert by[(99, 5)] == UNIQUE_KEY
        assert by[(99, 8)] == DUPLICATE_KEY


# ---- epoch self-validation (multi-node node-local dir safety) ----

def test_epoch_lagging_file_probes_as_absent(spark, tmp_path):
    """A sidecar file that missed committed batches must degrade to
    'no information' (all maybe), never produce Bloom false negatives."""
    d = str(tmp_path / "bloom_epoch")
    build_bloom_files(
        _keys_df(spark, range(100)), d, num_buckets=4, log2_bits=LOG2,
        epoch=3,
    )
    probed = bloom_probe(
        _keys_df(spark, range(100, 140)), d, num_buckets=4, min_epoch=5
    ).toPandas()
    assert probed["__maybe_seen"].all()  # lagging (3 < 5) => all maybe
    probed_ok = bloom_probe(
        _keys_df(spark, range(100, 140)), d, num_buckets=4, min_epoch=3
    ).toPandas()
    assert not probed_ok["__maybe_seen"].all()  # fresh file filters again


def test_epoch_update_refuses_fresh_build_on_lag(spark, tmp_path):
    """Per-bucket contract: update over a MISSING file must not create a
    batch-only filter when the store already holds keys for that bucket
    (the false-negative trap on a node that missed prior batches); it
    fresh-builds only for buckets with no prior keys, ORs into files in
    contract, and invalidates files behind their bucket's last
    key-writing batch."""
    import os

    d = str(tmp_path / "bloom_lag")
    # store already has keys for both buckets (last writes at batch 3) —
    # a node with no files must NOT fresh-build from this batch
    stats = update_bloom_files(
        _keys_df(spark, range(50)), d, num_buckets=2, log2_bits=LOG2,
        epoch=4, bucket_key_epochs={0: 3, 1: 3},
    )
    assert stats["stale"].all()
    assert not any(f.endswith(".npy") for f in os.listdir(d))
    # bootstrap: no prior keys for any bucket -> fresh files at epoch 0
    stats0 = update_bloom_files(
        _keys_df(spark, range(50)), d, num_buckets=2, log2_bits=LOG2,
        epoch=0, bucket_key_epochs={},
    )
    assert not stats0["stale"].any()
    # next batch ORs in (files cover bucket-last-write 0) and advances
    stats1 = update_bloom_files(
        _keys_df(spark, range(50, 80)), d, num_buckets=2, log2_bits=LOG2,
        epoch=1, bucket_key_epochs={0: 0, 1: 0},
    )
    assert not stats1["stale"].any()
    assert (stats1["epoch"] == 1).all()
    probed = bloom_probe(
        _keys_df(spark, range(80)), d, num_buckets=2,
        bucket_key_epochs={0: 1, 1: 1},
    ).toPandas()
    assert probed["__maybe_seen"].all()  # every stored key still maybe
    # crash re-run of batch 1 (files already at epoch 1 >= last write 0)
    stats_re = update_bloom_files(
        _keys_df(spark, range(50, 80)), d, num_buckets=2, log2_bits=LOG2,
        epoch=1, bucket_key_epochs={0: 0, 1: 0},
    )
    assert not stats_re["stale"].any()
    # files behind their bucket's last key-writing batch -> invalidated
    stats_bad = update_bloom_files(
        _keys_df(spark, range(10)), d, num_buckets=2, log2_bits=LOG2,
        epoch=5, bucket_key_epochs={0: 4, 1: 4},
    )
    assert stats_bad["stale"].all()
    assert not any(f.endswith(".npy") for f in os.listdir(d))


def test_untouched_bucket_stays_in_contract(spark, tmp_path):
    """A bucket that receives no keys for many batches keeps a VALID
    (probe-usable) file under the per-bucket contract — its file epoch
    only needs to cover its own last key-writing batch, not the global
    batch id. (This is the liveness half the per-bucket design buys;
    the global-epoch design went dark here.)"""
    d = str(tmp_path / "bloom_idle")
    # batch 0 writes keys for both buckets of 2
    update_bloom_files(
        _keys_df(spark, [0, 1, 2, 3]), d, num_buckets=2, log2_bits=LOG2,
        epoch=0, bucket_key_epochs={},
    )
    # batches 1..4 write only EVEN keys (bucket 0); bucket 1 idle
    for j in range(1, 5):
        update_bloom_files(
            _keys_df(spark, [100 + 2 * j]), d, num_buckets=2,
            log2_bits=LOG2, epoch=j,
            bucket_key_epochs={0: j - 1, 1: 0},
        )
    # probe with the store's true per-bucket map: bucket 1's file (epoch
    # 0) is still valid -> unseen odd keys get definite negatives
    probed = bloom_probe(
        _keys_df(spark, [999_001, 999_003, 999_005]), d, num_buckets=2,
        bucket_key_epochs={0: 4, 1: 0},
    ).toPandas()
    assert not probed["__maybe_seen"].all()
