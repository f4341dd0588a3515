"""Deterministic sampling/splitting: stability, accuracy, disjointness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jirlbot_spark.operators.sampling import (
    RESOLUTION,
    hash_sample,
    split_dataset,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    ).cache()


def test_hash_sample_deterministic_and_partition_independent(corpus):
    a = {r.doc_id for r in hash_sample(corpus, 0.3, ["doc_id"]).collect()}
    b = {
        r.doc_id
        for r in hash_sample(
            corpus.repartition(17, "lang"), 0.3, ["doc_id"]
        ).collect()
    }
    assert a == b  # decision is by key, not by partition/rng state
    assert abs(len(a) / 20_000 - 0.3) < 0.02


def test_hash_sample_rate_monotone_nested(corpus):
    """A lower rate's sample is a SUBSET of a higher rate's (same seed):
    the u < threshold rule makes samples nested, so a pipeline can
    downsample further without re-decided rows."""
    small = {r.doc_id for r in hash_sample(corpus, 0.1, ["doc_id"]).collect()}
    big = {r.doc_id for r in hash_sample(corpus, 0.4, ["doc_id"]).collect()}
    assert small <= big


def test_hash_sample_seed_changes_sample(corpus):
    a = {r.doc_id for r in hash_sample(corpus, 0.3, ["doc_id"], seed=1).collect()}
    b = {r.doc_id for r in hash_sample(corpus, 0.3, ["doc_id"], seed=2).collect()}
    assert a != b
    assert 0.05 < len(a & b) / len(a) < 0.5  # independent-ish overlap


def test_stratified_rates_and_default(spark, corpus):
    rates = spark.createDataFrame(
        [("en", 0.9), ("de", 0.2)], ["lang", "rate"]
    )
    out = stratified_sample(
        corpus, rates, ["lang"], ["doc_id"], default_rate=0.05
    )
    got = (
        out.groupBy("lang").count().toPandas().set_index("lang")["count"]
    )
    n = 20_000 / 3
    assert abs(got["en"] / n - 0.9) < 0.05
    assert abs(got["de"] / n - 0.2) < 0.05
    assert abs(got.get("fr", 0) / n - 0.05) < 0.03  # default applied


def test_split_disjoint_exhaustive_stable(corpus):
    w = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = split_dataset(corpus, w, ["doc_id"]).cache()
    counts = dict(
        out.groupBy("split").count().rdd.map(tuple).collect()
    )
    assert sum(counts.values()) == 20_000  # exhaustive, disjoint
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    # growing the corpus never moves an old row between splits
    sub = corpus.filter(F.col("doc_id") < 5_000)
    sub_split = {
        r.doc_id: r.split
        for r in split_dataset(sub, w, ["doc_id"]).collect()
    }
    full_split = {
        r.doc_id: r.split
        for r in out.filter(F.col("doc_id") < 5_000).collect()
    }
    assert sub_split == full_split
    out.unpersist()


def test_split_weights_validated(corpus):
    with pytest.raises(ValueError, match="sum"):
        split_dataset(corpus, [("a", 0.5), ("b", 0.2)], ["doc_id"])
    with pytest.raises(ValueError, match="rate"):
        hash_sample(corpus, 1.5, ["doc_id"])


def test_injected_hash_expr_matches_manual(corpus):
    """The driver key's DuckDB twin recomputes the decision in SQL; this
    pins the same arithmetic engine-side with an injected hash."""
    h = (F.col("doc_id") + 1) * F.lit(2654435761) % F.lit(2147483647)
    out = hash_sample(corpus, 0.25, ["doc_id"], hash_expr=h)
    rows = {r.doc_id for r in out.collect()}
    expect = {
        i
        for i in range(20_000)
        if ((i + 1) * 2654435761 % 2147483647) % RESOLUTION
        < int(0.25 * RESOLUTION)
    }
    assert rows == expect
