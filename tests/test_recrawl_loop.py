"""CrawlLoop integration of freshness-driven recrawl
(cfg.recrawl_threshold): due URLs re-enter the frontier, spaced by the
exact-integer staleness rule, without touching url_seen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jirlbot_spark.plans.loop import CrawlConfig, CrawlLoop
from jirlbot_spark.sources.fixtures import gen_pages
from jirlbot_spark.sources.storage import TableStore

SEEDS = ["http://rc-a.com/", "http://rc-b.com/"]
GRAPH = [
    ("http://rc-a.com/", "http://rc-a.com/p1"),
    ("http://rc-b.com/", "http://rc-b.com/q1"),
]


def _mk_loop(spark, root, cfg):
    pages = spark.createDataFrame(gen_pages(3, cfg.image_scale))
    links = spark.createDataFrame(GRAPH, ["src_url", "dst_url"])
    loop = CrawlLoop(
        spark, TableStore(spark, root), pages, links, None, cfg
    )
    loop.ingest_seeds(
        spark.createDataFrame([(u,) for u in SEEDS], ["url"])
    )
    return loop


def test_recrawl_revisits_without_growing_url_seen(spark, tmp_path):
    loop = _mk_loop(
        spark,
        str(tmp_path / "recrawl"),
        CrawlConfig(recrawl_threshold=1, image_scale=30),
    )
    loop.run(7)
    log = loop.store.read("fetch_log").collect()
    assert "content_hash" in loop.store.read("fetch_log").columns
    by_url: dict[str, list[int]] = {}
    for r in log:
        by_url.setdefault(r["url"], []).append(r["batch"])
    # at least one URL was revisited
    revisited = {u: sorted(b) for u, b in by_url.items() if len(b) > 1}
    assert revisited, "no URL was ever revisited"
    for u, batches in revisited.items():
        # no echo: never fetched in consecutive batches; spacing obeys
        # the exact rule age >= thr*(2n+1) with static content (X=0):
        # after the n-th fetch the gap must be >= 2n+1 batches
        for n, (a, b) in enumerate(
            zip(batches, batches[1:]), start=1
        ):
            assert b - a >= 2 * n + 1, (u, batches)
    # url_seen did NOT grow from revisits: one row per distinct URL
    seen = loop.store.read("url_seen").collect()
    assert len({r["url_hash"] for r in seen}) == len(seen)
    assert len(seen) == len(by_url)


def test_recrawl_off_is_single_pass(spark, tmp_path):
    loop = _mk_loop(
        spark,
        str(tmp_path / "single"),
        CrawlConfig(image_scale=30),
    )
    loop.run(7)
    log = loop.store.read("fetch_log").collect()
    by_url: dict[str, int] = {}
    for r in log:
        by_url[r["url"]] = by_url.get(r["url"], 0) + 1
    assert all(n == 1 for n in by_url.values())
