"""Recrawl scheduling — freshness-driven revisit priorities for a
continuous crawl (the Cho & Garcia-Molina change-frequency line of
work: estimate how often each page changes from its observed fetch
history, revisit pages in proportion to estimated staleness).

Two stages, both corpus-shaped:

- `change_stats(fetch_log)`: per-URL history aggregation from the raw
  fetch log (url_hash, batch_id, content_hash): n_fetches, n_changes
  (content hash differs from the PREVIOUS fetch of the same URL — one
  lag() window partitioned by url_hash, a high-cardinality
  well-distributed key, then one map-side-combinable groupBy), and
  last_batch.
- `recrawl_priority(stats, current_batch, due_threshold)`: the pinned
  EXACT-INTEGER priority. The textbook estimator is a Poisson rate
  λ̂ = −log((n−X+0.5)/(n+0.5))/Δ, but log() is a per-row transcendental
  that can't be driver-quantized (it's corpus-sized) and would poison
  the cross-engine contract. Instead the contract pins the estimated
  per-interval change probability p̂ = (2·X+1)/(2·n+1) (the same
  +0.5-smoothed ratio; the Poisson inversion is monotone in p̂, so
  every ORDERING this operator feeds — due sets, top-k revisit queues —
  is identical) and scores staleness as age·p̂, carried as the exact
  int64 pair (score_num = age·(2X+1), score_den = 2n+1):
      due  ⟺  age·(2X+1) ≥ threshold·(2n+1)
  — one integer cross-multiplication, bit-reproducible anywhere. The
  float `score` column is one correctly-rounded division of the exact
  pair, for human consumption only.

Never-changed pages (X=0) keep p̂ = 1/(2n+1) > 0: they are revisited at
a decaying but nonzero rate (the smoothing prevents starvation —
exactly why the +0.5 estimator exists). Bounds: age and X,n are batch
counts (≪ 2^31), so score_num ≤ 2^62 holds for any real crawl.

Output feeds the existing frontier machinery: the due set unions into
the candidate stream ahead of STAR/BEAST budgets (a revisit competes
for budget like a discovered link; budgets stay the single admission
authority). No reference counterpart in the IRLbot paper (it crawls
once); pinned to the published recrawl-scheduling literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["change_stats", "recrawl_priority"]


def change_stats(
    fetch_log: DataFrame,
    url_col: str = "url_hash",
    batch_col: str = "batch_id",
    content_col: str = "content_hash",
) -> DataFrame:
    """(url_hash, n_fetches, n_changes, first_batch, last_batch) per
    URL. A change = content hash differs from the previous fetch of
    the SAME url (first fetch is not a change). Duplicate (url, batch)
    rows are collapsed to one observation (max content hash — a pinned
    deterministic pick) before the lag."""
    w = Window.partitionBy(url_col).orderBy(batch_col)
    obs = (
        fetch_log.groupBy(url_col, batch_col)
        .agg(F.max(content_col).alias("__c"))
        .withColumn("__prev", F.lag("__c").over(w))
    )
    chg = F.when(
        F.col("__prev").isNotNull() & (F.col("__c") != F.col("__prev")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        obs.withColumn("__chg", chg)
        .groupBy(url_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.sum("__chg").cast("long").alias("n_changes"),
            F.min(batch_col).cast("long").alias("first_batch"),
            F.max(batch_col).cast("long").alias("last_batch"),
        )
    )


def recrawl_priority(
    stats: DataFrame,
    current_batch: int,
    due_threshold: int,
    url_col: str = "url_hash",
) -> DataFrame:
    """(url_hash, n_fetches, n_changes, age, score_num, score_den,
    score, due) — see module docstring for the pinned integer rule.
    `due_threshold` is in batch units: a page that changes every fetch
    (p̂→1) goes due after ~threshold batches; a page seen unchanged n
    times goes due after ~threshold·(2n+1) batches."""
    age = (F.lit(int(current_batch)) - F.col("last_batch")).cast("long")
    num = age * (F.lit(2) * F.col("n_changes") + 1)
    den = (F.lit(2) * F.col("n_fetches") + 1).cast("long")
    return stats.select(
        url_col,
        "n_fetches",
        "n_changes",
        age.alias("age"),
        num.cast("long").alias("score_num"),
        den.alias("score_den"),
        (num.cast("double") / den.cast("double")).alias("score"),
        (num >= F.lit(int(due_threshold)) * den).alias("due"),
    )
