"""DSIR importance weights (operators/dsir.py).

Independent reference: featurize + fit + score re-implemented here in
pure Python with the spec-derived XXH64 (tests/scalar_xxhash64.py) —
Spark's hash never touches the expected values.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from jirlbot_spark.operators.dsir import dsir_weights, fit_log_ratios
from tests.scalar_xxhash64 import spark_xxhash64

B, SCALE = 64, 10**6

RAW = [
    (1, "spark table scan join join shuffle"),
    (2, "der hund läuft über die brücke brücke"),
    (3, "spark join agg window sort"),
    (4, "la mesa roja y la silla"),
    (5, ""),
    (6, "spark spark spark join"),
]
TARGET = [
    (101, "spark join shuffle agg"),
    (102, "spark window sort table"),
]


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip())


def _buckets(text: str) -> list[int]:
    t = _toks(text)
    out = [spark_xxhash64(w) % B for w in t]
    out += [spark_xxhash64(a, b) % B for a, b in zip(t, t[1:])]
    return out


def _reference() -> dict[int, tuple[int, int]]:
    raw_b = {i: _buckets(t) for i, t in RAW}
    tgt_b = [b for _, t in TARGET for b in _buckets(t)]
    r_cnt: dict[int, int] = {}
    for bs in raw_b.values():
        for b in bs:
            r_cnt[b] = r_cnt.get(b, 0) + 1
    t_cnt: dict[int, int] = {}
    for b in tgt_b:
        t_cnt[b] = t_cnt.get(b, 0) + 1
    T, R = sum(t_cnt.values()), sum(r_cnt.values())
    lam = [
        round(
            SCALE
            * (
                math.log((t_cnt.get(b, 0) + 1) / (T + B))
                - math.log((r_cnt.get(b, 0) + 1) / (R + B))
            )
        )
        for b in range(B)
    ]
    return {
        i: (len(bs), sum(lam[b] for b in bs)) for i, bs in raw_b.items()
    }


def test_matches_independent_reference(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dsir_weights(raw, tgt, n_buckets=B, scale=SCALE).collect()
    }
    ref = _reference()
    assert set(out) == set(ref)
    for i, (n_grams, logw_q) in ref.items():
        assert out[i]["n_grams"] == n_grams, (i, out[i], n_grams)
        assert out[i]["logw_q"] == logw_q, (i, out[i], logw_q)
        assert out[i]["logw"] == logw_q / float(SCALE)


def test_target_like_docs_rank_higher(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, tgt, n_buckets=B).collect()
    }
    # per-gram average weight: spark-y docs above the German/Spanish docs
    avg = {
        i: out[i] / max(len(_buckets(t)), 1) for i, t in RAW if t
    }
    assert avg[1] > avg[2] and avg[3] > avg[4] and avg[6] > avg[2]


def test_partitioning_invariance(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    a = sorted(
        map(
            tuple,
            dsir_weights(raw.repartition(5), tgt, n_buckets=B).collect(),
        )
    )
    b = sorted(
        map(tuple, dsir_weights(raw.coalesce(1), tgt, n_buckets=B).collect())
    )
    assert a == b


def test_fit_log_ratios_bounded_shape(spark):
    t = spark.createDataFrame([(0, 5), (3, 2)], "bucket int, cnt long")
    r = spark.createDataFrame([(0, 1), (2, 9)], "bucket int, cnt long")
    lam = fit_log_ratios(t, r, 8)
    assert len(lam) == 8
    # bucket 0: target-heavy -> positive; bucket 2: raw-only -> negative
    assert lam[0] > 0 > lam[2]
