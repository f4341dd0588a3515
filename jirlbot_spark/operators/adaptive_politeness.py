"""Adaptive per-host politeness delays from observed fetch latency.

Static politeness (robots Crawl-delay, else a global minimum) treats a
10 ms CDN edge and a struggling shared host identically. Production
crawlers adapt: Heritrix's canonical politeness rule spaces requests by
`delay-factor × last fetch duration`, clamped to [min-delay, max-delay]
(the published crawler default; IRLbot's politeness discussion likewise
scales per-host load to what the server demonstrates it can sustain).
This operator computes that per-host delay table from the engine's own
`fetch_log`, and `with_adaptive_delay` merges it into the admitted
frame so `politeness_schedule` consumes it through its existing
`crawl_delay` contract (robots delay still wins where larger — adapting
DOWN below a site's declared Crawl-delay is never allowed).

Pinned exactness contract: everything is int64 milliseconds —
    delay_ms = clamp(min_delay_ms, max_delay_ms,
                     (factor_num · sum_rtt_ms) div (factor_den · n_obs))
with `div` = integral division, so the table is bit-reproducible under
any partitioning and recomputable by the SQL oracle (the trap_detect
discipline: no float thresholds anywhere; the only float produced is
the final seconds column, one correctly-rounded division by 1000).

Physical shape at 10^10 URLs: one map-side-combinable groupBy(host) of
(count, sum) over int64 columns pruned straight off the fetch_log scan
— the same shuffle class as metrics_agg; the merge into the admitted
frame is a per-host equi join against a host-cardinality table.

The observation window is the caller's slice of fetch_log (e.g. the
last R batches via partition pruning on `batch` — pass it pre-filtered;
this operator does not hide a time policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["adaptive_host_delays", "with_adaptive_delay"]


def adaptive_host_delays(
    fetch_log: DataFrame,
    host_col: str = "host",
    rtt_col: str = "rtt_ms",
    factor_num: int = 5,
    factor_den: int = 1,
    min_delay_ms: int = 1000,
    max_delay_ms: int = 30000,
) -> DataFrame:
    """(host, n_obs, sum_rtt_ms, delay_ms) per host appearing in the
    (pre-filtered) fetch log. factor defaults to Heritrix's
    delay-factor 5."""
    agg = (
        fetch_log.select(
            F.col(host_col).alias("host"),
            F.col(rtt_col).cast("long").alias("__rtt"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("__rtt").alias("sum_rtt_ms"),
        )
    )
    raw = F.expr(
        f"({int(factor_num)}L * sum_rtt_ms) div "
        f"({int(factor_den)}L * n_obs)"
    )
    return agg.select(
        "host",
        "n_obs",
        "sum_rtt_ms",
        F.least(
            F.greatest(raw, F.lit(int(min_delay_ms))),
            F.lit(int(max_delay_ms)),
        )
        .cast("long")
        .alias("delay_ms"),
    )


def with_adaptive_delay(
    admitted: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    min_delay_s: float = 1.0,
) -> DataFrame:
    """Merge the adaptive table into the admitted frame: the effective
    `crawl_delay` (seconds) is the max of the robots-declared delay (if
    present), the adaptive delay, and the floor — ready for
    politeness_schedule's delay_col contract. Hosts without
    observations keep their existing delay."""
    d = delays.select(
        F.col("host").alias(host_col),
        (F.col("delay_ms").cast("double") / F.lit(1000.0)).alias("__ad"),
    )
    existing = (
        F.coalesce(F.col(delay_col), F.lit(float(min_delay_s)))
        if delay_col in admitted.columns
        else F.lit(float(min_delay_s))
    )
    out = admitted.join(d, host_col, "left")
    return out.withColumn(
        delay_col,
        F.greatest(
            existing,
            F.coalesce("__ad", F.lit(float(min_delay_s))),
            F.lit(float(min_delay_s)),
        ),
    ).drop("__ad")
