"""N-gram LM quality scoring — the CCNet perplexity-filter recipe.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model trained on a clean reference corpus (Wikipedia);
low-perplexity documents "look like" the reference and survive. This
operator is that recipe re-expressed with a pinned, exactly-
reproducible bigram LM instead of an external KenLM binary:

    p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)      add-one smoothing
    V        = |vocab| + 1 (the OOV symbol, id 0)

Pinned exactness contract (the DSIR/repetition discipline): per-bigram
log probabilities are quantized ONCE, driver-side, to int64 at `scale`
(Python banker's round over libm ln) — per-document scores are then
exact INT64 SUMS, and `avg_nll` is one correctly-rounded division of
exact ints, so every value is bit-reproducible under any partitioning
and recomputable by the SQL oracle. (Perplexity = exp(avg_nll) is
monotone in avg_nll; the exp is deliberately left to the consumer so
no cross-engine transcendental enters the contract.)

Boundedness at 10^10 documents:

- vocab = top `max_vocab` reference tokens by (freq desc, token asc) —
  the BPE trainer's bounded deterministic collect; everything else is
  OOV. Driver memory O(max_vocab).
- bigram table = top `max_bigrams` mapped bigrams, same bounded
  collect; bigrams outside the cap (and unseen ones) fall back to the
  per-predecessor unseen probability 1/(c(w1)+V) — the pinned cap
  trade, documented to the consumer.
- scoring = tokenize-below-Generate explode, one BROADCAST vocab join,
  a per-document lead() window (bounded by document length), one
  broadcast bigram-q join, one map-side-combinable groupBy(doc) sum.
  Token strings leave the scan only into the broadcast-hash probe;
  nothing unbounded shuffles.

No reference counterpart (JIRLbot crawls; it does not curate);
semantics pinned to the published recipe above. Driver key
`lm_perplexity`: the goldens generator pins ONLY the three LM tables
(vocab, bigram-q, fallback-q) as VALUES — trained by an independent
pure-Python replication — and the DuckDB oracle recomputes
tokenization, OOV mapping, bigram formation, lookup+fallback, and the
exact sums ITSELF.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from jirlbot_spark.functions.text import tokens_col

__all__ = ["BigramLm", "train_bigram_lm", "lm_score"]


@dataclass
class BigramLm:
    vocab: list[str]  # index+1 = word id; id 0 = OOV
    q_bi: dict[tuple[int, int], int]  # (w1, w2) -> quantized log p
    q0: list[int]  # w1 -> quantized log of unseen-bigram prob
    scale: int


def _token_positions(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, tok) over non-empty tokens, pos contiguous from 0.
    Token split in its own projection below the Generate (plan-audit
    check #13's pinned shape)."""
    step = docs.select(
        F.col(id_col),
        F.filter(tokens_col(text_col), lambda t: t != "").alias("__toks"),
    )
    return step.select(
        F.col(id_col), F.posexplode("__toks").alias("pos", "tok")
    )


def _mapped_bigrams(
    docs: DataFrame, vocab_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2) for every in-document bigram, OOV -> 0. vocab_df is
    broadcast (bounded by max_vocab)."""
    pos = _token_positions(docs, text_col, id_col)
    mapped = pos.join(F.broadcast(vocab_df), "tok", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce("wid", F.lit(0)).cast("int").alias("wid"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        mapped.select(
            F.col(id_col),
            F.col("wid").alias("w1"),
            F.lead("wid").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )


def train_bigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 50000,
    max_bigrams: int = 500000,
    scale: int = 10**6,
) -> BigramLm:
    """Fit the pinned add-one bigram LM on the reference corpus. All
    collects are bounded (max_vocab / max_bigrams / V rows)."""
    toks = _token_positions(reference, text_col, id_col)
    vocab_rows = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(max_vocab)
        .collect()
    )
    vocab = [r["tok"] for r in vocab_rows]
    spark = reference.sparkSession
    vocab_df = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(vocab)], "tok string, wid int"
    )
    bi = _mapped_bigrams(reference, vocab_df, text_col, id_col)
    # c(w1) over bigram PREDECESSOR positions (the denominator the
    # add-one estimate normalizes over); bounded <= V rows
    c1 = dict(
        bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    top_bi = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(max_bigrams)
        .collect()
    )
    V = len(vocab) + 1
    q_bi = {
        (r["w1"], r["w2"]): round(
            scale * math.log((r["c"] + 1) / (c1[r["w1"]] + V))
        )
        for r in top_bi
    }
    q0 = [
        round(scale * math.log(1.0 / (c1.get(w, 0) + V))) for w in range(V)
    ]
    return BigramLm(vocab=vocab, q_bi=q_bi, q0=q0, scale=scale)


def lm_score(
    docs: DataFrame,
    lm: BigramLm,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, logp_q, avg_nll) — exact int64 log-prob sum and
    its per-bigram negative mean. Documents with < 2 tokens score
    (0, 0, 0.0)."""
    spark = docs.sparkSession
    vocab_df = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(lm.vocab)], "tok string, wid int"
    )
    bi_df = spark.createDataFrame(
        [(w1, w2, q) for (w1, w2), q in sorted(lm.q_bi.items())],
        "w1 int, w2 int, q long",
    )
    q0_df = spark.createDataFrame(
        list(enumerate(lm.q0)), "w1 int, q0 long"
    )
    pairs = _mapped_bigrams(docs, vocab_df, text_col, id_col)
    scored = (
        pairs.join(F.broadcast(bi_df), ["w1", "w2"], "left")
        .join(F.broadcast(q0_df), "w1")
        .select(F.col(id_col), F.coalesce("q", "q0").alias("__q"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("__q").cast("long").alias("logp_q"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("logp_q", F.lit(0).cast("long")).alias("logp_q"),
        )
        .withColumn(
            "avg_nll",
            F.when(F.col("n_bigrams") == 0, F.lit(0.0)).otherwise(
                (-F.col("logp_q")).cast("double")
                / (F.col("n_bigrams") * lm.scale).cast("double")
            ),
        )
    )
