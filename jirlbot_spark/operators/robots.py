"""Robots handling (RobotsCache / RobotsRequested in the reference).

Two DRUM-backed structures in the reference become two joins here:

  - robots_requested: a host is fetched-for-robots at most once →
    left-anti join of candidate hosts against the requested set (the
    check_update pattern keyed on host_hash).
  - robots check: URL × cached rules → PASS / FAIL / UNKNOWN(defer).
    Rule match (path vs disallow prefix list) runs JVM-side via the
    higher-order function `exists(disallow, d -> startswith(path, d))` —
    no Python in the hot path at all.

Scale: robots is hash-partitioned by host_hash; host cardinality is ~3-4
orders below URL cardinality, so the join side is small and usually
broadcast; skewed hot hosts only matter for the politeness window, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_COL = "robots_status"
PASS = "PASS"
FAIL = "FAIL"
UNKNOWN = "UNKNOWN"


def robots_requested_new(
    hosts: DataFrame,
    requested: DataFrame | None,
    host_col: str = "host_hash",
) -> DataFrame:
    """Hosts whose robots.txt has never been requested (to fetch now)."""
    h = hosts.select(host_col).distinct()
    if requested is None:
        return h
    return h.join(requested.select(host_col), host_col, "left_anti")


def robots_check(
    urls: DataFrame,
    robots: DataFrame | None,
    host_col: str = "host_hash",
    path_col: str = "path",
    disallow_col: str = "disallow",
) -> DataFrame:
    """Classify each URL PASS / FAIL / UNKNOWN against cached rules.

    UNKNOWN = host has no cached robots yet → caller defers the URL and
    routes the host through robots_requested_new. A NULL/empty disallow
    list means allow-all; the sentinel rule "/" disallows everything.
    """
    if robots is None:
        return urls.withColumn(STATUS_COL, F.lit(UNKNOWN))
    r = robots.select(
        F.col(host_col),
        F.col(disallow_col).alias("__rules"),
    )
    joined = urls.join(r, host_col, "left")
    blocked = F.exists(
        "__rules", lambda d: F.col(path_col).startswith(d)
    )
    return joined.withColumn(
        STATUS_COL,
        F.when(F.col("__rules").isNull(), F.lit(UNKNOWN))
        .when(blocked, F.lit(FAIL))
        .otherwise(F.lit(PASS)),
    ).drop("__rules")


def parse_robots_txt_df(raw: DataFrame, host_col: str = "host") -> DataFrame:
    """Parse raw robots.txt bodies (host, body) into (host, disallow[],
    crawl_delay) with JVM-side string ops: split lines, keep the
    User-agent:* section's Disallow/Crawl-delay directives.

    Simplified grammar (the reference's parser is similarly minimal):
    directives apply if they appear after a `User-agent: *` line.
    """
    lines = raw.select(
        host_col,
        F.posexplode(F.split(F.col("body"), "\n")).alias("pos", "line"),
    ).withColumn("line", F.trim(F.lower("line")))
    # section id = running count of user-agent lines; keep sections for *
    sec = lines.withColumn(
        "is_ua", F.col("line").startswith("user-agent:")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy("pos")
    sec = sec.withColumn("sec_id", F.sum(F.col("is_ua").cast("int")).over(w))
    ua_star = (
        sec.filter(
            F.col("is_ua")
            & (F.trim(F.substring_index("line", ":", -1)) == "*")
        )
        .select(host_col, "sec_id")
        .distinct()
    )
    in_star = sec.join(ua_star, [host_col, "sec_id"], "left_semi").select(
        F.col(host_col).alias("h"), "line"
    )
    dis = (
        in_star.filter(F.col("line").startswith("disallow:"))
        .withColumn("rule", F.trim(F.substring_index("line", ":", -1)))
        .filter(F.col("rule") != "")
        .groupBy("h")
        .agg(F.collect_list("rule").alias("disallow"))
    )
    delay = (
        in_star.filter(F.col("line").startswith("crawl-delay:"))
        .withColumn(
            "crawl_delay",
            F.trim(F.substring_index("line", ":", -1)).cast("double"),
        )
        .groupBy("h")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )
    hosts = raw.select(F.col(host_col).alias("h")).distinct()
    out = (
        hosts.join(dis, "h", "left")
        .join(delay, "h", "left")
        .select(
            F.col("h").alias(host_col),
            F.coalesce(
                "disallow", F.array().cast("array<string>")
            ).alias("disallow"),
            F.coalesce("crawl_delay", F.lit(0.0)).alias("crawl_delay"),
        )
    )
    return out
