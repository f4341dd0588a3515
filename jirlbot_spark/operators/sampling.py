"""Deterministic sampling + dataset splitting for training-data curation.

A 100 TB corpus pipeline samples and splits CONSTANTLY — per-language
quotas, quality-tier downsampling, train/val/test assignment — and at
that scale the sampler must be:

  - deterministic BY KEY: the same document gets the same decision on
    every run, every executor count, every retry (rng-state samplers
    like df.sample() are none of these — a task retry can change the
    sample), so pipelines are resumable and two tables sampled on the
    same key stay join-consistent;
  - shuffle-free: decision = pure projection (hash + compare), no
    repartition, vanishes into the scan stage;
  - exactly auditable: the kept fraction converges to the rate by the
    hash's uniformity, and the decision rule is reproducible in any
    engine (the driver key's DuckDB twin recomputes it in SQL).

Decision rule: u = pmod(hash(key, seed), RESOLUTION); keep iff
u < rate * RESOLUTION. `hash` defaults to xxhash64 (JVM, whole-stage
codegen); pass hash_expr to substitute any integer expression — the
driver key injects a Knuth multiplicative hash DuckDB can replicate
exactly, pytest covers the xxhash64 default.

No reference counterpart (RovoMe/JIRLbot is a crawler); mandated by the
brief's training-data-pipeline axis.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decision resolution: rates are quantized to 1/RESOLUTION steps. 2^20
# keeps rate*RESOLUTION exact in doubles for any realistic rate while
# staying far from int64 overflow in the compare.
RESOLUTION = 1 << 20


def _decision_u(
    key_cols: Sequence[str], seed: int, hash_expr: Column | None
) -> Column:
    h = (
        hash_expr
        if hash_expr is not None
        else F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    )
    return F.pmod(h, F.lit(RESOLUTION))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: Sequence[str],
    seed: int = 0,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Keep a deterministic ~`rate` fraction of rows by key."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    u = _decision_u(key_cols, seed, hash_expr)
    return df.filter(u < F.lit(int(rate * RESOLUTION)))


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    stratum_cols: Sequence[str],
    key_cols: Sequence[str],
    seed: int = 0,
    default_rate: float = 0.0,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli-by-key sampling.

    `rates`: a SMALL frame (stratum_cols..., rate double) — broadcast
    onto the corpus (strata cardinality is languages/sources/quality
    tiers, never corpus-scale). Strata absent from `rates` keep
    `default_rate`. The per-row decision stays a projection; the only
    join is the broadcast rate attach.
    """
    u = _decision_u(key_cols, seed, hash_expr)
    joined = df.join(F.broadcast(rates), list(stratum_cols), "left")
    thresh = (
        F.coalesce(F.col("rate"), F.lit(float(default_rate)))
        * RESOLUTION
    ).cast("long")
    return joined.filter(u < thresh).drop("rate")


def split_dataset(
    df: DataFrame,
    weights: Sequence[tuple[str, float]],
    key_cols: Sequence[str],
    seed: int = 0,
    split_col: str = "split",
    hash_expr: Column | None = None,
) -> DataFrame:
    """Assign every row to exactly one named split, deterministically by
    key: cumulative weight thresholds over the same hash-uniform u, so
    splits are disjoint, exhaustive, and stable under reruns/retries —
    and a row's assignment never depends on what other rows exist
    (documents can be added to the corpus without reshuffling old
    rows between train and eval). Weights must sum to ~1."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, want 1.0")
    u = _decision_u(key_cols, seed, hash_expr)
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w
        cond = u < F.lit(int(acc * RESOLUTION))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(weights[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
