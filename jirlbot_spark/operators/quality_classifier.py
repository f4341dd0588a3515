"""fastText-style hashed linear quality classifier — the canonical web-
pipeline quality gate (GPT-3's WebText-vs-CommonCrawl logistic filter,
CCNet's fastText step, DCLM-baseline): a linear model over bag-of-ngram
features scored on every document, documents kept by threshold or by
GPT-3's Pareto resampling rule.

Two halves, matching how the stage is deployed at 100 TB:

- **Scoring** (`score_documents`) is the corpus-scale path: features are
  64-bit gram hashes (unigram + bigram, the fastText default wordNgrams=2),
  the model is a SMALL (feature_hash → weight) table broadcast to every
  task, and each document's score is mean-pooled exactly as fastText
  pools: (Σ w[g] + bias·n) / n. The corpus text never shuffles — only
  (doc_id, gram_hash) longs leave the scan, and the weight attach is a
  broadcast join followed by one map-side-combinable groupBy(doc_id).
- **Training** (`train_nb_weights`) runs rarely and on a sample, so the
  pinned in-engine trainer is the exactly-computable one: Naive-Bayes
  log-odds per gram (the fastText-supervised baseline), with vocabulary
  selection = distributed top-`max_features` grams by document frequency
  (TakeOrderedAndProject — driver memory bounded by max_features, never
  corpus-scale; the ann_ivf bounded-driver discipline). Weights from any
  external trainer (a real fastText/LR model) drop into `score_documents`
  unchanged — the scoring contract only needs (hash, w_q) pairs.

Exactness contract (the repetition_stats/dsir discipline): weights are
quantized ONCE to int64 at `scale`; every per-document sum is an exact
int64; the float `score` is ONE correctly-rounded division of two
int64-exact doubles (numerator and denominator both < 2^53); and the
`keep` decision is an exact integer cross-multiplication
(sum_q + bias_q·n ≥ threshold_q·n), so it is bit-reproducible across
engines, partitionings, and Arrow batch shapes.

GPT-3's resampling rule — keep iff score > 1 − Pareto(α=9) draw — is
provided as `pareto_keep`, deterministic by key (hash-uniform u, the
sampling.py discipline) so retries/reruns keep the same documents. Its
float pow() boundary is engine-specific, so it is pytest-covered
(determinism, keep-rate envelope, monotonicity) and deliberately NOT part
of the cross-engine driver contract; the driver key certifies the exact
scoring + threshold path (`quality_classify`, independent DuckDB oracle
over gram STRINGS — green also certifies the 64-bit no-collision
assumption at fixture scale, the decontam precedent).

No reference counterpart (RovoMe/JIRLbot crawls; it does not curate);
mandated by the brief's training-data-pipeline axis.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_hashes",
    "score_documents",
    "train_nb_weights",
    "pareto_keep",
]

# resolution of pareto_keep's hash-uniform draw (see sampling.RESOLUTION)
_PARETO_RES = 1 << 20


def gram_hashes(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gh) — one row per unigram AND bigram occurrence, gh = the
    full 64-bit xxhash64 (unigram: xxhash64(tok); bigram:
    xxhash64(tok_i, tok_i+1) — the multi-arg running-seed fold, pinned
    by tests/scalar_xxhash64.py).

    Same single-Generate shape as dsir.hashed_gram_buckets (positions
    1..n emit unigrams, n+1..2n-1 the bigram starting at i−n), with the
    tokenization in its own projection BELOW the Generate (plan-audit
    check #13's CollapseProject trap). Unlike dsir, empty tokens are
    removed (array_remove — still whole-stage codegen), so blank
    documents contribute zero grams; that is the tokenization the
    independent string-side oracle can replicate.
    """
    toks = F.array_remove(F.split(F.trim(F.col(text_col)), r"\s+"), "")
    step = docs.select(F.col(id_col), toks.alias("__toks"))
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
        F.col(id_col), F.when(i <= n, uni).otherwise(bi).alias("gh")
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10**6,
    bias_q: int = 0,
    threshold_q: int = 0,
) -> DataFrame:
    """Score every document with a pinned linear model.

    `weights`: SMALL frame (gh: long, w_q: long) — the model, broadcast
    (a real fastText vocab is ≤ a few M rows ≪ executor memory; grams
    absent from it contribute 0, fastText's OOV behavior).

    Returns (id, n_grams, sum_q, score, keep):
      score = (sum_q + bias_q·n_grams) / (n_grams·scale)   [n_grams>0]
              bias_q / scale                               [n_grams=0]
      keep  = sum_q + bias_q·n ≥ threshold_q·n             [n_grams>0]
              bias_q ≥ threshold_q                         [n_grams=0]
    Both exact int64; the n=0 rule is the n>0 cross-multiplication rule
    applied to the n=0 score (score ≥ threshold_q/scale), so a blank
    document is kept exactly when its reported score clears the
    threshold — not unconditionally.
    """
    grams = gram_hashes(docs, text_col, id_col)
    scored = (
        grams.join(F.broadcast(weights), "gh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce("w_q", F.lit(0).cast("long")))
            .cast("long")
            .alias("sum_q"),
        )
    )
    n = F.coalesce("n_grams", F.lit(0).cast("long"))
    s = F.coalesce("sum_q", F.lit(0).cast("long"))
    num = s + F.lit(int(bias_q)) * n
    score = F.when(
        n > 0, num.cast("double") / (n * F.lit(int(scale))).cast("double")
    ).otherwise(F.lit(float(bias_q) / float(scale)))
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            n.alias("n_grams"),
            s.alias("sum_q"),
            score.alias("score"),
            F.when(n > 0, num >= F.lit(int(threshold_q)) * n)
            .otherwise(F.lit(int(bias_q) >= int(threshold_q)))
            .alias("keep"),
        )
    )


def train_nb_weights(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_features: int = 1 << 17,
    scale: int = 10**6,
) -> tuple[DataFrame, int]:
    """Fit Naive-Bayes log-odds weights over the top-`max_features` grams.

    Vocabulary = grams ranked by total occurrence count across both
    classes (ties broken by gram hash for determinism), selected with a
    distributed TakeOrdered — the driver holds max_features rows, never
    the corpus-scale distinct-gram set. Per selected gram:
        w = round(scale·(ln((c_pos+1)/(P+V)) − ln((c_neg+1)/(N+V))))
    with V = max_features, P/N = total gram counts per class (add-one
    smoothing, the published NB recipe). Returns (weights frame
    (gh, w_q), bias_q = round(scale·ln(D_pos/D_neg)) — the class-prior
    log odds).
    """
    spark = pos.sparkSession
    pg = gram_hashes(pos, text_col, id_col).groupBy("gh").agg(
        F.count(F.lit(1)).alias("c_pos")
    )
    ng = gram_hashes(neg, text_col, id_col).groupBy("gh").agg(
        F.count(F.lit(1)).alias("c_neg")
    )
    both = pg.join(ng, "gh", "full").select(
        "gh",
        F.coalesce("c_pos", F.lit(0)).cast("long").alias("c_pos"),
        F.coalesce("c_neg", F.lit(0)).cast("long").alias("c_neg"),
    )
    top = both.orderBy(
        F.desc(F.col("c_pos") + F.col("c_neg")), F.asc("gh")
    ).limit(int(max_features))
    rows = top.collect()  # bounded: ≤ max_features rows by construction
    V = int(max_features)
    P = sum(r["c_pos"] for r in rows)
    N = sum(r["c_neg"] for r in rows)
    w = [
        (
            r["gh"],
            round(
                scale
                * (
                    math.log((r["c_pos"] + 1) / (P + V))
                    - math.log((r["c_neg"] + 1) / (N + V))
                )
            ),
        )
        for r in rows
    ]
    d_pos = pos.count()
    d_neg = neg.count()
    bias_q = round(scale * math.log(max(d_pos, 1) / max(d_neg, 1)))
    weights = spark.createDataFrame(w or [(0, 0)], "gh long, w_q long")
    if not w:
        weights = weights.limit(0)
    return weights, bias_q


def pareto_keep(
    df: DataFrame,
    score_col: str = "score",
    key_cols: tuple[str, ...] = ("doc_id",),
    alpha: int = 9,
    seed: int = 0,
    keep_col: str = "keep_pareto",
) -> DataFrame:
    """GPT-3's quality resampling: keep a document iff
    score > 1 − Pareto(α) draw — high-score docs are (almost) always
    kept, low-score docs survive with the Pareto tail probability, so
    the kept corpus is diverse rather than a hard cliff.

    The draw is DETERMINISTIC BY KEY (u = (pmod(xxhash64(keys, seed),
    R)+1)/(R+1) ∈ (0,1], pareto = u^(−1/α) − 1): retries, reruns, and
    repartitions keep the same documents (sampling.py's discipline).
    The pow() boundary is float and engine-specific — this helper is
    pytest-certified (determinism, keep-rate envelope, monotonicity)
    and intentionally outside the cross-engine driver contract.
    """
    u = (
        (
            F.pmod(
                F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)),
                F.lit(_PARETO_RES),
            )
            + 1
        ).cast("double")
    ) / F.lit(float(_PARETO_RES + 1))
    pareto = F.pow(u, F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    return df.withColumn(
        keep_col, F.col(score_col) > (F.lit(1.0) - pareto)
    )
