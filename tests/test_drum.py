"""DrumTest-style scripted sequences: exact UNIQUE_KEY/DUPLICATE_KEY
classification in arrival order, store merge, and atomic-commit resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jirlbot_spark.operators.dedup import (
    DUPLICATE_KEY,
    UNIQUE_KEY,
    check_update,
    classify_batch,
)
from jirlbot_spark.sources.storage import TableStore, TableWrite


def _batch(spark, keys):
    return spark.createDataFrame(
        [(k, i, f"aux{k}") for i, k in enumerate(keys)],
        ["url_hash", "arrival", "aux"],
    )


def _results(df):
    rows = df.orderBy("arrival").collect()
    return [r.drum_result for r in rows]


def test_in_batch_duplicate_classification(spark):
    b = _batch(spark, [1, 2, 3, 2])
    out = classify_batch(b, None, order_col="arrival")
    assert _results(out) == [UNIQUE_KEY, UNIQUE_KEY, UNIQUE_KEY, DUPLICATE_KEY]


def test_check_update_sequence(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "state"))

    b1 = _batch(spark, [1, 2, 3, 2])
    c1, u1 = check_update(b1, None, order_col="arrival")
    assert _results(c1) == [UNIQUE_KEY, UNIQUE_KEY, UNIQUE_KEY, DUPLICATE_KEY]
    store.commit_batch(0, {"url_seen": TableWrite(u1, partition_by=("bucket",))})
    assert sorted(r.url_hash for r in store.read("url_seen").collect()) == [1, 2, 3]

    b2 = _batch(spark, [3, 4, 1, 4, 5])
    c2, u2 = check_update(b2, store.read("url_seen"), order_col="arrival")
    assert _results(c2) == [
        DUPLICATE_KEY,
        UNIQUE_KEY,
        DUPLICATE_KEY,
        DUPLICATE_KEY,
        UNIQUE_KEY,
    ]
    store.commit_batch(1, {"url_seen": TableWrite(u2, partition_by=("bucket",))})
    assert sorted(r.url_hash for r in store.read("url_seen").collect()) == [
        1, 2, 3, 4, 5,
    ]


def test_check_does_not_mutate(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "state"))
    b1 = _batch(spark, [7, 8])
    _, u1 = check_update(b1, None, order_col="arrival")
    store.commit_batch(0, {"url_seen": TableWrite(u1, partition_by=("bucket",))})
    before = store.read("url_seen").count()
    classify_batch(_batch(spark, [7, 9]), store.read("url_seen"), order_col="arrival")
    assert store.read("url_seen").count() == before


def test_idempotence_union(spark):
    """run(batch ∪ batch) unique-key set == run(batch)."""
    b = _batch(spark, [10, 11, 12, 11])
    bb = b.unionAll(b)
    _, u1 = check_update(b, None, order_col="arrival")
    _, u2 = check_update(bb, None, order_col="arrival")
    assert sorted(r.url_hash for r in u1.collect()) == sorted(
        r.url_hash for r in u2.collect()
    )


def test_atomic_resume(spark, tmp_path):
    root = str(tmp_path / "state")
    store = TableStore(spark, root)
    _, u1 = check_update(_batch(spark, [1, 2]), None, order_col="arrival")
    store.commit_batch(0, {"url_seen": TableWrite(u1, partition_by=("bucket",))})
    # simulate crash: a new store instance over the same root resumes
    store2 = TableStore(spark, root)
    assert store2.last_batch() == 0
    _, u2 = check_update(
        _batch(spark, [2, 3]), store2.read("url_seen"), order_col="arrival"
    )
    store2.commit_batch(1, {"url_seen": TableWrite(u2, partition_by=("bucket",))})
    assert sorted(r.url_hash for r in store2.read("url_seen").collect()) == [1, 2, 3]
    with pytest.raises(ValueError):
        store2.commit_batch(1, {"url_seen": TableWrite(u2)})


def test_gc_orphans_and_compact(spark, tmp_path):
    root = str(tmp_path / "state")
    store = TableStore(spark, root)
    for i in range(3):
        _, u = check_update(
            _batch(spark, [i * 10, i * 10 + 1]), store.read("url_seen"),
            order_col="arrival",
        )
        store.commit_batch(i, {"url_seen": TableWrite(u, partition_by=("bucket",))})
    assert store.read("url_seen").count() == 6
    store.compact("url_seen", partition_by=("bucket",))
    assert store.read("url_seen").count() == 6
    assert len(store.manifest()["tables"]["url_seen"]) == 1
