"""Per-host politeness scheduling.

The reference serializes fetches per host in its crawl threads and honors
robots Crawl-delay (IRLbot paper, BEAST/politeness discussion). Here the
per-host sequence is a window (one shuffle on host), and the planned fetch
time is pure column arithmetic:

    seq        = row_number over (host, order by priority, key)
    planned_at = batch_start + (seq - 1) * max(crawl_delay, min_delay)

Execution-time enforcement (actually sleeping between requests) belongs to
the fetch backend: groupBy(host).applyInPandas gives one task per host, so
a backend that honors `planned_at` is trivially serial per host. In this
sandbox fetches are table-backed and instantaneous, so the *schedule* is the
tested artifact (per-host spacing ≥ delay — property-tested).

Skew: a hot host's window is bounded by BEAST admission first (≤ its PLD
budget per pass), so the politeness window never sees unbounded groups —
this ordering of operators is itself the skew control, mirroring the
reference where budget enforcement precedes the host queues.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_DELAY_S = 1.0
SEQ_COL = "seq_in_host"
PLANNED_COL = "planned_at_s"


def politeness_schedule(
    admitted: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    key_col: str = "url_hash",
    delay_col: str | None = "crawl_delay",
    batch_start_s: float = 0.0,
    min_delay_s: float = MIN_DELAY_S,
) -> DataFrame:
    """Attach per-host fetch sequence and planned fetch offset (seconds)."""
    w = Window.partitionBy(host_col).orderBy(
        F.asc(priority_col), F.asc(key_col)
    )
    df = admitted.withColumn(SEQ_COL, F.row_number().over(w))
    if delay_col is not None and delay_col in admitted.columns:
        delay = F.greatest(
            F.coalesce(F.col(delay_col), F.lit(min_delay_s)),
            F.lit(min_delay_s),
        )
    else:
        delay = F.lit(min_delay_s)
    return df.withColumn(
        PLANNED_COL,
        F.lit(float(batch_start_s)) + (F.col(SEQ_COL) - 1) * delay,
    )
