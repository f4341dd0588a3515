"""BEAST — Budget Enforcement with Anti-Spam Tactics (IRLbot paper).

The reference streams queue Q_j sequentially, admitting at most budget(PLD)
URLs per PLD per pass; the excess is appended to Q_{j+1}, and the queue set
doubles so each URL is re-read amortized-O(1) times.

Spark shape: the frontier TABLE is the queue; one pass =
  broadcast-join budgets → per-PLD priority admission → over-budget rows
  written back with enqueue_batch+1 (partition pruning on enqueue_batch
  replaces queue-doubling).

Hot-PLD skew is handled with EXACT two-phase salted admission:
  phase 1: window over (pld, salt) — S parallel tasks per hot PLD — keeps
           only each salt's top-`budget` rows (any row outside its salt's
           top-budget cannot be in the PLD's global top-budget);
  phase 2: window over (pld) on the ≤ S×budget survivors picks the true
           top-budget set.
Result is bit-identical to the unsalted single-window plan (tested), but no
single task ever owns a hot PLD's full row set. AQE handles residual join
skew; windows get no AQE help, hence the explicit salting (north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 10
SALT_BUCKETS = 16
ADMIT_COL = "admitted"
RANK_COL = "admit_rank"


def beast_enforce(
    frontier: DataFrame,
    budgets: DataFrame | None,
    pld_col: str = "pld_hash",
    priority_col: str = "priority",
    key_col: str = "url_hash",
    default_budget: int = DEFAULT_BUDGET,
    salt_buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Mark each frontier row admitted (rank ≤ budget) or deferred.

    `budgets` carries (pld_hash, budget); missing PLDs get default_budget.
    Admission order within a PLD: priority asc, then key asc — the
    deterministic tiebreak the crawl-order equivalence contract pins.
    Returns the frontier plus `admit_rank` and boolean `admitted`.
    """
    df = frontier
    if budgets is not None:
        b = F.broadcast(
            budgets.select(
                F.col("pld_hash").alias(pld_col), "budget"
            )
        )
        df = df.join(b, pld_col, "left")
    else:
        df = df.withColumn("budget", F.lit(None).cast("long"))
    df = df.withColumn(
        "budget", F.coalesce(F.col("budget"), F.lit(int(default_budget)))
    )

    order = [F.asc(priority_col), F.asc(key_col)]
    if salt_buckets and salt_buckets > 1:
        df = df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets)).cast("int"),
        )
        w1 = Window.partitionBy(pld_col, "__salt").orderBy(*order)
        df = df.withColumn("__rn1", F.row_number().over(w1))
        survivors = df.filter(F.col("__rn1") <= F.col("budget"))
        rest = df.filter(F.col("__rn1") > F.col("budget")).withColumn(
            RANK_COL, F.lit(None).cast("int")
        )
        w2 = Window.partitionBy(pld_col).orderBy(*order)
        survivors = survivors.withColumn(RANK_COL, F.row_number().over(w2))
        out = survivors.unionByName(rest)
        out = out.withColumn(
            ADMIT_COL,
            F.col(RANK_COL).isNotNull() & (F.col(RANK_COL) <= F.col("budget")),
        ).drop("__salt", "__rn1")
    else:
        w = Window.partitionBy(pld_col).orderBy(*order)
        out = df.withColumn(RANK_COL, F.row_number().over(w)).withColumn(
            ADMIT_COL, F.col(RANK_COL) <= F.col("budget")
        )
    return out


def split_admitted(
    enforced: DataFrame, batch_col: str = "enqueue_batch"
) -> tuple[DataFrame, DataFrame]:
    """(admitted rows, deferred rows with enqueue_batch+1) — the Q_{j+1}
    write-back. Helper columns are dropped from both sides."""
    admitted = enforced.filter(F.col(ADMIT_COL)).drop(
        ADMIT_COL, RANK_COL, "budget"
    )
    deferred = (
        enforced.filter(~F.col(ADMIT_COL))
        .drop(ADMIT_COL, RANK_COL, "budget")
        .withColumn(batch_col, F.col(batch_col) + F.lit(1))
    )
    return admitted, deferred


def topk_per_bucket(
    df: DataFrame,
    k: int,
    bucket_col: str,
    priority_col: str = "priority",
    key_col: str = "url_hash",
) -> DataFrame:
    """Scalable top-k per bucket (BEAST pass sizing / O20): windowed
    row_number per bucket — never a global sort or limit."""
    w = Window.partitionBy(bucket_col).orderBy(
        F.asc(priority_col), F.asc(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
