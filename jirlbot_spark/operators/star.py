"""STAR — Spam Tracking And Avoidance through Reputation (IRLbot paper).

The reference keeps a DRUM of PLD→PLD link facts and, per update epoch,
ranks pay-level-domains by *distinct in-linking PLD count* (spam resistance:
a PLD can't inflate its own reputation with intra-PLD or single-source
links), then assigns crawl budgets: top-k PLDs get budgets linearly
interpolated between B_hi and B_lo by rank, the tail gets B_lo.

Spark shape:
  - the PLD graph is an append-only DISTINCT edge table; per-batch edge
    dedup reuses the DRUM check_update pattern on hash(src_pld, dst_pld),
    so indegree stays an exact count over distinct pairs at any scale
  - indegree = groupBy(dst_pld).count() over the distinct-edge table
    (map-side partial agg for free); approx_count_distinct variant for the
    10^10 tier where the edge table itself is not materialized
  - ranking = a global window ONLY over the indegree table (one row per
    PLD — orders of magnitude smaller than the frontier), result broadcast
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

B_HI = 10_000
B_LO = 10
TOP_K = 10_000


def distinct_new_edges(
    new_edges: DataFrame,
    existing: DataFrame | None,
    src: str = "src_pld",
    dst: str = "dst_pld",
) -> DataFrame:
    """Edges not yet in the PLD graph (in-batch dedup + anti-join)."""
    e = new_edges.select(src, dst).filter(F.col(src) != F.col(dst)).distinct()
    if existing is not None:
        e = e.join(existing.select(src, dst), [src, dst], "left_anti")
    return e


def pld_indegree(
    edges: DataFrame,
    src: str = "src_pld",
    dst: str = "dst_pld",
    approx: bool = False,
) -> DataFrame:
    """Distinct in-linking PLD count per target PLD.

    `edges` is the distinct-pair table, so exact mode is a plain count —
    no count_distinct shuffle of raw links. `approx=True` computes HLL
    over a non-deduped edge stream instead (scale path when the distinct
    edge table is skipped)."""
    if approx:
        agg = F.approx_count_distinct(src).alias("indegree")
    else:
        agg = F.count(src).alias("indegree")
    return edges.groupBy(F.col(dst).alias("pld_hash")).agg(agg)


def star_budgets(
    indegree: DataFrame,
    top_k: int = TOP_K,
    b_hi: int = B_HI,
    b_lo: int = B_LO,
) -> DataFrame:
    """Rank PLDs by indegree (desc, pld_hash asc tiebreak) and assign
    budgets: rank 1 -> b_hi, rank top_k -> b_lo, linear in between,
    tail -> b_lo. Output is one row per PLD — broadcast-sized by
    construction (frontier PLD cardinality, not URL cardinality).
    """
    w = Window.orderBy(F.desc("indegree"), F.asc("pld_hash"))
    span = max(top_k - 1, 1)
    return indegree.withColumn("rank", F.row_number().over(w)).withColumn(
        "budget",
        F.when(
            F.col("rank") <= top_k,
            (
                F.lit(float(b_hi))
                - (F.col("rank") - 1)
                * F.lit(float(b_hi - b_lo))
                / F.lit(float(span))
            ).cast("long"),
        ).otherwise(F.lit(int(b_lo)).cast("long")),
    )


def star_budgets_scalable(
    indegree: DataFrame,
    top_k: int = TOP_K,
    b_hi: int = B_HI,
    b_lo: int = B_LO,
) -> DataFrame:
    """star_budgets without the all-PLD global window.

    `star_budgets` ranks EVERY PLD through one single-partition window —
    fine at testdata scale, a straggler at 10^8 PLDs. Only the top_k rows
    need exact ranks (every other PLD gets b_lo regardless), so this
    variant does per-partition top-k pruning first (parallel windows over
    spark_partition_id), then ranks only the ≤ k·partitions survivors
    globally, and anti-joins the tail back with budget = b_lo, rank null.

    Budgets are identical to star_budgets for every PLD (property-tested);
    only the tail's rank column differs (null here, dense global rank
    there) — the crawl loop consumes (pld_hash, budget) only.
    """
    ordering = [F.desc("indegree"), F.asc("pld_hash")]
    part_w = Window.partitionBy(F.spark_partition_id()).orderBy(*ordering)
    candidates = (
        indegree.withColumn("__prn", F.row_number().over(part_w))
        .filter(F.col("__prn") <= top_k)
        .drop("__prn")
    )
    span = max(top_k - 1, 1)
    top = (
        candidates.withColumn(
            "rank", F.row_number().over(Window.orderBy(*ordering))
        )
        .filter(F.col("rank") <= top_k)
        .withColumn(
            "budget",
            (
                F.lit(float(b_hi))
                - (F.col("rank") - 1)
                * F.lit(float(b_hi - b_lo))
                / F.lit(float(span))
            ).cast("long"),
        )
    )
    tail = (
        indegree.join(top.select("pld_hash"), "pld_hash", "left_anti")
        .withColumn("rank", F.lit(None).cast("int"))
        .withColumn("budget", F.lit(int(b_lo)).cast("long"))
    )
    return top.select(
        "pld_hash", "indegree", "rank", "budget"
    ).unionByName(tail.select("pld_hash", "indegree", "rank", "budget"))
