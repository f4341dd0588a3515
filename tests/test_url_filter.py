"""URL spam filter + host trap stats (operators/url_filter.py).

Independent reference: `urllib.parse.urlsplit` (a separately-authored
URL grammar) + a naive per-rule Python implementation, compared
row-for-row against the Spark flags.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from pyspark.sql import functions as F

from jirlbot_spark.operators.url_filter import (
    DEFAULT_SESSION_PARAMS,
    DEFAULT_SPAM_WORDS,
    host_trap_stats,
    url_spam_filter,
)

BLOCKED = ("badseo.example", "spam.net")

URLS = [
    "http://ok.example.com/a/b/c?page=2",
    "http://BADSEO.example/x",  # blocked (case-insensitive host)
    "http://sub.badseo.example/y",  # blocked by suffix rule
    "http://notbadseo.example/z",  # NOT blocked (no dot boundary)
    "http://a.com/play-casino-now",  # keyword
    "http://b.com/p?PHPSESSID=deadbeef",  # session id
    "http://c.com/p?a=1&b=2&c=3&d=4&e=5",  # too many params (5 > 4)
    "http://d.com/1/2/3/4/5/6/7/8/9",  # too deep (9 > 8)
    "http://e.com/2024/2024/2024/page",  # repeated segment
    "http://f.com/a/b/a/b/c",  # only 2 repeats each -> keep
    "http://user:pw@g.com:8080/fine",  # userinfo+port stripped
    "http://h.com",  # no path at all
]


def _ref_flags(url: str) -> dict[str, bool]:
    s = urlsplit(url)
    host = (s.hostname or "").lower()
    segs = [p for p in s.path.split("/") if p]
    n_params = len(s.query.split("&")) if s.query else 0
    return {
        "flag_blocked": any(
            host == b or host.endswith("." + b) for b in BLOCKED
        ),
        "flag_keyword": bool(
            re.search("|".join(DEFAULT_SPAM_WORDS), url.lower())
        ),
        "flag_session": bool(
            re.search(
                "[?&](" + "|".join(DEFAULT_SESSION_PARAMS) + ")=",
                url.lower(),
            )
        ),
        "flag_params": n_params > 4,
        "flag_depth": len(segs) > 8,
        "flag_repeat": any(segs.count(x) >= 3 for x in segs),
    }


def test_flags_match_urlsplit_reference(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    rows = url_spam_filter(df, blocked_domains=BLOCKED).collect()
    for r in rows:
        want = _ref_flags(r["url"])
        got = {k: r[k] for k in want}
        assert got == want, (r["url"], got, want)
        assert r["keep"] == (not any(want.values()))


def test_expected_verdicts(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    kept = {
        r["url"]
        for r in url_spam_filter(df, blocked_domains=BLOCKED)
        .where("keep")
        .collect()
    }
    assert kept == {
        "http://ok.example.com/a/b/c?page=2",
        "http://notbadseo.example/z",
        "http://f.com/a/b/a/b/c",
        "http://user:pw@g.com:8080/fine",
        "http://h.com",
    }


def _trap_corpus() -> list[str]:
    urls = []
    # trap host: 60 distinct calendar paths (cap 50 in the test)
    urls += [f"http://trap.com/cal/2024/{i}" for i in range(60)]
    # query-heavy host: 8 of 10 URLs carry queries (8*4 > 10*3)
    urls += [f"http://faceted.com/s?q={i}" for i in range(8)]
    urls += ["http://faceted.com/about", "http://faceted.com/contact"]
    # clean host: 10 plain pages, 2 with a query (2*4 <= 10*3)
    urls += [f"http://clean.com/p{i}" for i in range(8)]
    urls += ["http://clean.com/p?x=1", "http://clean.com/q?y=2"]
    return urls


def test_host_trap_stats(spark):
    df = spark.createDataFrame([(u,) for u in _trap_corpus()], ["url"])
    out = {
        r["host"]: r.asDict()
        for r in host_trap_stats(df, max_distinct_paths=50).collect()
    }
    assert out["trap.com"]["trap"] and out["trap.com"]["n_paths"] == 60
    assert out["faceted.com"]["trap"] and out["faceted.com"]["n_query"] == 8
    assert not out["clean.com"]["trap"]
    assert out["clean.com"]["n_urls"] == 10
    assert out["clean.com"]["sum_depth"] == 10
    assert out["faceted.com"]["max_params"] == 1


def test_trap_stats_partitioning_invariant(spark):
    df = spark.createDataFrame([(u,) for u in _trap_corpus()], ["url"])
    a = sorted(
        map(tuple, host_trap_stats(df.repartition(13)).collect())
    )
    b = sorted(map(tuple, host_trap_stats(df.coalesce(1)).collect()))
    assert a == b


def test_filter_is_pure_projection(spark):
    """Zero exchanges: the gate must sit map-side, in front of any
    shuffle (the 10^10-URL posture in the module docstring)."""
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    plan = (
        url_spam_filter(df, blocked_domains=BLOCKED)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
