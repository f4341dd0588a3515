"""URL-level spam filtering and per-host crawl-trap detection.

IRLbot's spam defense is budget-shaped (STAR reputation -> BEAST
enforcement: a spam farm can link-bomb itself all it wants, it still
gets budget-many fetches) [PAPER:STAR/BEAST]. Production crawls layer a
cheap URL-STRING filter in front of that — the UT1/blocklist style gate
every web-corpus pipeline documents (C4 used a word blocklist; CCNet /
RefinedWeb filter by domain + URL patterns) — plus per-host trap
detection for the failure mode budgets are slow to catch: infinite URL
spaces (calendar pages, faceted search, session-id explosions) where
every URL is NEW so url_seen never fires, burning a polite host's whole
budget on one trap. No reference counterpart exists in the (empty)
reference tree; semantics are pinned here and in the driver oracles.

Both operators share one pinned URL grammar (the same regex family in
the Java-regex∩RE2 common subset so the DuckDB oracle runs the
IDENTICAL patterns — the html_extract/pii_scrub certification pattern):

    host  = lowercased authority, userinfo and :port stripped
    path  = authority..(? or # or end)
    query = ?..(# or end)

`url_spam_filter` is a pure projection (zero shuffle, whole-stage
codegen except the two bounded HOF lambdas); at 10^10 URLs it is a
map-side gate in front of the DRUM exchange, which is exactly where a
string filter must sit — rejected URLs never reach a shuffle.
`host_trap_stats` is one map-side-combinable groupBy over int64
hashes + small ints (URL strings never shuffle).

Blocklist semantics are the standard domain-anchored rule: host is
blocked iff host == entry or host ends with '.' + entry. The entry set
is broadcast as a literal array (UT1-scale lists are ~MBs — broadcast
territory; swap for a broadcast join only past ~10^6 entries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "url_parts",
    "url_spam_filter",
    "host_trap_stats",
    "DEFAULT_SPAM_WORDS",
    "DEFAULT_SESSION_PARAMS",
]

# pinned default lists — tiny, documented stand-ins for a vendored
# UT1-style list (which is per-deployment policy data, not engine code)
DEFAULT_SPAM_WORDS = ("casino", "viagra", "xxx-", "warez", "phish")
DEFAULT_SESSION_PARAMS = (
    "sid",
    "sessionid",
    "phpsessid",
    "jsessionid",
    "cfid",
)

_SCHEME = "[a-zA-Z][a-zA-Z0-9+.-]*://"


def url_parts(url: Column) -> tuple[Column, Column, Column]:
    """(host, path, query) under the pinned grammar above."""
    auth = F.regexp_extract(url, f"^{_SCHEME}([^/?#]*)", 1)
    host = F.lower(
        F.regexp_replace(
            F.regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", ""
        )
    )
    path = F.regexp_extract(url, f"^{_SCHEME}[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    return host, path, query


def url_spam_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: tuple[str, ...] = (),
    spam_words: tuple[str, ...] = DEFAULT_SPAM_WORDS,
    session_params: tuple[str, ...] = DEFAULT_SESSION_PARAMS,
    max_params: int = 4,
    max_depth: int = 8,
    min_segment_repeat: int = 3,
) -> DataFrame:
    """Adds per-rule boolean flags + `keep` (no rule fired). Flags stay
    in the output so kill-rate metrics per rule are one groupBy away
    (the pair_filter contract)."""
    url = F.col(url_col)
    host, path, query = url_parts(url)
    blocked = F.lit(False)
    for b in blocked_domains:
        blocked = blocked | (host == b) | host.endswith("." + b)
    spam_re = "|".join(spam_words)
    flag_keyword = F.lower(url).rlike(spam_re) if spam_words else F.lit(False)
    sess_re = "[?&](" + "|".join(session_params) + ")="
    flag_session = F.lower(url).rlike(sess_re) if session_params else F.lit(False)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs)
    # a path segment occurring >= min_segment_repeat times (calendar /
    # faceted-search traps: /2024/2024/2024, /a/b/a/b/a). O(depth^2)
    # per URL on a <= max_depth-bounded list — constant work.
    rep = F.exists(
        segs,
        lambda s: F.size(F.filter(segs, lambda x: x == s))
        >= F.lit(min_segment_repeat),
    )
    out = df.select(
        "*",
        blocked.alias("flag_blocked"),
        flag_keyword.alias("flag_keyword"),
        flag_session.alias("flag_session"),
        (n_params > max_params).alias("flag_params"),
        (depth > max_depth).alias("flag_depth"),
        rep.alias("flag_repeat"),
    )
    keep = (
        ~F.col("flag_blocked")
        & ~F.col("flag_keyword")
        & ~F.col("flag_session")
        & ~F.col("flag_params")
        & ~F.col("flag_depth")
        & ~F.col("flag_repeat")
    )
    return out.withColumn("keep", keep)


def host_trap_stats(
    df: DataFrame,
    url_col: str = "url",
    max_distinct_paths: int = 1000,
    query_heavy_num: int = 3,
    query_heavy_den: int = 4,
) -> DataFrame:
    """Per-host trap signals: (host, n_urls, n_paths, n_query,
    max_params, sum_depth, trap). A host trips `trap` when its distinct
    path count exceeds the cap OR query-bearing URLs exceed
    query_heavy_num/query_heavy_den of its URLs (exact integer
    cross-multiplication — no float thresholds, so the verdict is
    bit-reproducible cross-engine). Paths are counted as xxhash64
    values so URL strings never shuffle; the driver oracle counts the
    STRINGS themselves, so green certifies the no-collision assumption
    at fixture scale."""
    url = F.col(url_col)
    host, path, query = url_parts(url)
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    rows = df.select(
        host.alias("host"),
        F.xxhash64(path).alias("__ph"),
        (query != "").cast("int").alias("__has_q"),
        n_params.alias("__np"),
        depth.alias("__d"),
    )
    agg = rows.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct("__ph").alias("n_paths"),
        F.sum("__has_q").cast("long").alias("n_query"),
        F.max("__np").cast("int").alias("max_params"),
        F.sum("__d").cast("long").alias("sum_depth"),
    )
    trap = (F.col("n_paths") > max_distinct_paths) | (
        F.col("n_query") * query_heavy_den > F.col("n_urls") * query_heavy_num
    )
    return agg.withColumn("trap", trap)
