"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The published recipe for selecting pretraining data that "looks like" a
target distribution: featurize every document into HASHED n-gram bucket
counts (unigrams + bigrams into B buckets — the hashing is what makes
the estimator tractable at web scale), fit two bag-of-ngrams
distributions (target corpus vs raw corpus) over those buckets, and
weight each raw document by its log importance ratio
Σ_grams log(p_target(bucket)/p_raw(bucket)). High-weight documents are
then sampled into the training mix (sampling itself composes with
`operators/sampling.py` — this operator produces the weights).

Pinned exactness contract: per-bucket log ratios are quantized ONCE,
driver-side, to int64 at `scale` (λ_b = round(scale·(ln((t_b+1)/(T+B))
− ln((r_b+1)/(R+B)))), add-1 smoothing per the paper, Python banker's
round) — so every per-document weight is an exact INT64 SUM of pinned
integers: bit-reproducible under any partitioning, Arrow batching, or
engine (the repetition_stats discipline: floats quantize exactly once,
at a bounded boundary). The float `logw` column is one correctly-
rounded division of that exact sum by `scale`.

Physical shape at 10^10 documents:

- featurize: tokenize-below-Generate (the pinned shingle plan shape),
  ONE posexplode emitting unigram AND bigram bucket ids from the same
  token array; only (doc_id, bucket:int) pairs leave the scan — text
  never shuffles.
- count: two map-side-combinable groupBy(bucket) aggs, each B-bounded
  (B defaults to 2^14) — the collect to the driver is O(B), NEVER
  O(corpus) (the ann_ivf bounded-driver pattern).
- score: λ broadcast-joined to the gram stream (B rows — always
  broadcast), then one map-side-combinable groupBy(doc_id) sum.

No reference counterpart (JIRLbot crawls; it does not curate);
semantics pinned to the published recipe. Driver key `dsir_weights`:
the golden oracle replicates featurize+count+fit+score by DIRECT
application with an INDEPENDENT spec-derived pure-Python XXH64
(tests/scalar_xxhash64.py) — so green certifies Spark's xxhash64
against the published algorithm, the bucket arithmetic, and the exact
integer summation, not just plumbing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from jirlbot_spark.functions.text import tokens_col

__all__ = [
    "hashed_gram_buckets",
    "bucket_counts",
    "fit_log_ratios",
    "dsir_weights",
]


def hashed_gram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 14,
) -> DataFrame:
    """(id, bucket) per unigram AND bigram occurrence. One Generate:
    positions 1..n emit unigram buckets, positions n+1..2n-1 emit the
    bigram starting at i-n. The token split lives in its own projection
    below the Generate (the CollapseProject trap pinned by plan-audit
    check #13 — see text_dedup.shingle_hashes)."""
    step = docs.select(F.col(id_col), tokens_col(text_col).alias("__toks"))
    n = F.size("__toks")
    hi = n * 2 - 1
    idx = F.when(hi < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.greatest(hi, F.lit(1)))
    )
    i = F.col("i")
    uni = F.xxhash64(F.element_at("__toks", i))
    bi = F.xxhash64(
        F.element_at("__toks", i - n), F.element_at("__toks", i - n + 1)
    )
    return step.select(
        F.col(id_col), "__toks", F.explode(idx).alias("i")
    ).select(
        F.col(id_col),
        F.pmod(F.when(i <= n, uni).otherwise(bi), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )


def bucket_counts(grams: DataFrame) -> DataFrame:
    """(bucket, cnt) — B-bounded, map-side combined."""
    return grams.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def fit_log_ratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int,
    scale: int = 10**6,
) -> list[int]:
    """λ_b for every bucket b (dense list of length n_buckets), from the
    two B-bounded count frames. Driver memory O(B)."""
    t = dict(target_counts.collect())
    r = dict(raw_counts.collect())
    T = sum(t.values())
    R = sum(r.values())
    B = n_buckets
    return [
        round(
            scale
            * (
                math.log((t.get(b, 0) + 1) / (T + B))
                - math.log((r.get(b, 0) + 1) / (R + B))
            )
        )
        for b in range(B)
    ]


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 14,
    scale: int = 10**6,
) -> DataFrame:
    """(id, n_grams, logw_q, logw): exact int64 quantized log importance
    weight (and its float image) for every raw document. Documents with
    no grams (empty text) get n_grams=0, logw_q=0."""
    spark = raw.sparkSession
    grams = hashed_gram_buckets(raw, text_col, id_col, n_buckets)
    tgrams = hashed_gram_buckets(target, text_col, id_col, n_buckets)
    lam = fit_log_ratios(
        bucket_counts(tgrams), bucket_counts(grams), n_buckets, scale
    )
    lam_df = F.broadcast(
        spark.createDataFrame(
            list(enumerate(lam)), "bucket int, q long"
        )
    )
    scored = (
        grams.join(lam_df, "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("q").cast("long").alias("logw_q"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("logw_q", F.lit(0).cast("long")).alias("logw_q"),
        )
        .withColumn(
            "logw", F.col("logw_q").cast("double") / F.lit(float(scale))
        )
    )
