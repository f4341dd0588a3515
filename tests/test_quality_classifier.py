"""fastText-style quality classifier (operators/quality_classifier.py).

Independent reference: featurize + score re-implemented here in pure
Python with the spec-derived XXH64 (tests/scalar_xxhash64.py) — Spark's
hash never touches the expected values. NB training is checked against a
naive dict/loop trainer, and pareto_keep against its published
closed-form keep probability.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from jirlbot_spark.operators.quality_classifier import (
    gram_hashes,
    pareto_keep,
    score_documents,
    train_nb_weights,
)
from tests.scalar_xxhash64 import spark_xxhash64

SCALE = 10**6

DOCS = [
    (1, "spark table scan join join shuffle"),
    (2, "bad words bad words bad"),
    (3, "spark join agg window sort"),
    (4, ""),
    (5, "   "),
    (6, "solo"),
]

# model: weights on gram STRINGS; hashed below with the independent XXH64
W_STR = {
    ("spark",): 3 * SCALE,
    ("join",): 1 * SCALE,
    ("bad",): -2 * SCALE,
    ("bad", "words"): -3 * SCALE,
    ("spark", "join"): 2 * SCALE,
    ("solo",): 0,
}


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip()) if t]


def _grams(text: str) -> list[tuple[str, ...]]:
    t = _toks(text)
    return [(w,) for w in t] + list(zip(t, t[1:]))


def _ref_scores(bias_q: int, threshold_q: int):
    out = {}
    for i, text in DOCS:
        gs = _grams(text)
        n = len(gs)
        s = sum(W_STR.get(g, 0) for g in gs)
        num = s + bias_q * n
        score = num / (n * SCALE) if n else bias_q / SCALE
        # n=0: keep iff the blank-doc score (bias_q/scale) clears the
        # threshold — NOT the degenerate 0 >= 0 (always-keep) rule
        keep = num >= threshold_q * n if n else bias_q >= threshold_q
        out[i] = (n, s, score, keep)
    return out


def _weights_df(spark):
    rows = [
        (spark_xxhash64(*g), wq) for g, wq in W_STR.items()
    ]
    return spark.createDataFrame(rows, "gh long, w_q long")


def test_gram_hashes_matches_independent_xxh64(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["gh"]) for r in gram_hashes(df).collect()
    )
    want = sorted(
        (i, spark_xxhash64(*g)) for i, t in DOCS for g in _grams(t)
    )
    assert got == want


def test_score_documents_exact(spark):
    bias_q, thr_q = 500_000, 1 * SCALE
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = score_documents(
        df, _weights_df(spark), bias_q=bias_q, threshold_q=thr_q
    ).collect()
    ref = _ref_scores(bias_q, thr_q)
    assert len(out) == len(DOCS)
    for r in out:
        n, s, score, keep = ref[r["doc_id"]]
        assert (r["n_grams"], r["sum_q"]) == (n, s)
        assert r["score"] == score  # one correctly-rounded division
        assert r["keep"] == keep
    # blank docs (4, 5): bias below threshold -> dropped...
    blank = {r["doc_id"]: r["keep"] for r in out if r["doc_id"] in (4, 5)}
    assert blank == {4: False, 5: False}
    # ...and kept when the bias clears it (both n=0 branches exercised)
    out2 = {
        r["doc_id"]: r["keep"]
        for r in score_documents(
            df, _weights_df(spark), bias_q=bias_q, threshold_q=bias_q
        ).collect()
    }
    assert out2[4] and out2[5]


def test_score_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    w = _weights_df(spark)
    a = sorted(map(tuple, score_documents(df, w).collect()))
    b = sorted(
        map(tuple, score_documents(df.repartition(7), w).collect())
    )
    assert a == b


def _naive_nb(pos, neg, max_features, scale):
    cnt: dict[int, list[int]] = {}
    for docs, slot in ((pos, 0), (neg, 1)):
        for _, t in docs:
            for g in _grams(t):
                gh = spark_xxhash64(*g)
                cnt.setdefault(gh, [0, 0])[slot] += 1
    top = sorted(
        cnt.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
    )[:max_features]
    V = max_features
    P = sum(c[0] for _, c in top)
    N = sum(c[1] for _, c in top)
    return {
        gh: round(
            scale
            * (
                math.log((c[0] + 1) / (P + V))
                - math.log((c[1] + 1) / (N + V))
            )
        )
        for gh, c in top
    }


def test_train_nb_weights_matches_naive(spark):
    pos = [(i, t) for i, t in DOCS if i in (1, 3)]
    neg = [(i, t) for i, t in DOCS if i in (2, 6)]
    pdf = spark.createDataFrame(pos, "doc_id long, text string")
    ndf = spark.createDataFrame(neg, "doc_id long, text string")
    w, bias_q = train_nb_weights(pdf, ndf, max_features=8, scale=SCALE)
    got = {r["gh"]: r["w_q"] for r in w.collect()}
    assert got == _naive_nb(pos, neg, 8, SCALE)
    assert bias_q == round(SCALE * math.log(2 / 2))
    # a gram that appears only in pos scores positive, only-neg negative
    sp = spark_xxhash64("table")  # pos-only unigram
    bd = spark_xxhash64("bad")  # neg-only unigram
    if sp in got:
        assert got[sp] > 0
    if bd in got:
        assert got[bd] < 0


def test_trained_weights_separate_classes(spark):
    pos = [(i, f"good clean prose number {i} flows here") for i in range(30)]
    neg = [(i + 100, "spam spam buy now " * 3) for i in range(30)]
    pdf = spark.createDataFrame(pos, "doc_id long, text string")
    ndf = spark.createDataFrame(neg, "doc_id long, text string")
    w, bias_q = train_nb_weights(pdf, ndf, max_features=64)
    both = pdf.unionByName(ndf)
    scores = {
        r["doc_id"]: r["score"]
        for r in score_documents(both, w, bias_q=bias_q).collect()
    }
    assert min(scores[i] for i, _ in pos) > max(
        scores[i] for i, _ in neg
    )


def test_pareto_keep_deterministic_and_calibrated(spark):
    # score 0 for everyone: published keep probability is
    # P[Pareto(9) > 1] = 2^-9; score 1: kept with probability 1.
    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
    )
    out = pareto_keep(df, "score", ("doc_id",), alpha=9, seed=3)
    kept = out.filter("keep_pareto").count()
    expect = n * 2.0**-9
    assert expect * 0.5 < kept < expect * 2.0  # loose binomial envelope
    # determinism under repartitioning
    a = sorted(
        r["doc_id"] for r in out.filter("keep_pareto").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in pareto_keep(
            df.repartition(13), "score", ("doc_id",), alpha=9, seed=3
        )
        .filter("keep_pareto")
        .collect()
    )
    assert a == b
    # monotone: raising every score only adds keeps
    hi = pareto_keep(
        df.withColumn("score", F.lit(0.9)),
        "score",
        ("doc_id",),
        alpha=9,
        seed=3,
    )
    hi_ids = {r["doc_id"] for r in hi.filter("keep_pareto").collect()}
    assert set(a) <= hi_ids
