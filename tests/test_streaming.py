from __future__ import annotations

import time

from pyspark.sql import functions as F

from jirlbot_spark.streaming.stream_loop import metrics_stream, stream_crawl


def test_metrics_stream_windowing(spark, tmp_path):
    """Drive the watermarked window agg with a memory-source stream."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.format_string("h%d", (F.col("value") % 3).cast("int")).alias(
                "host"
            ),
            (F.col("value") % 1000).alias("bytes"),
        )
    )
    out = metrics_stream(src, window="2 seconds", slide="1 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("m_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM m_stream").collect()
            if rows:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert rows, "no windows emitted"
    for r in rows:
        assert r.pages > 0
        assert (r.win_end - r.win_start).total_seconds() == 2.0


def test_stream_crawl_foreachbatch(spark, tmp_path):
    """Streaming seeds -> foreachBatch crawl: same tables as batch mode."""
    from jirlbot_spark.plans.loop import CrawlConfig, CrawlLoop
    from jirlbot_spark.sources.fixtures import gen_pages
    from jirlbot_spark.sources.storage import TableStore

    graph = spark.createDataFrame(
        [
            (f"http://s{i}.com/", f"http://s{(i + 1) % 3}.com/p{j}")
            for i in range(3)
            for j in range(2)
        ],
        ["src_url", "dst_url"],
    )
    robots = spark.createDataFrame(
        [(f"s{i}.com", [], 0.0) for i in range(3)],
        "host string, disallow array<string>, crawl_delay double",
    )
    pages = spark.createDataFrame(gen_pages(42, 20))
    store = TableStore(spark, str(tmp_path / "state"))
    loop = CrawlLoop(
        spark, store, pages, graph, robots,
        CrawlConfig(salt_buckets=2, image_scale=20),
    )

    seeds_dir = tmp_path / "seeds_in"
    seeds_dir.mkdir()
    (seeds_dir / "seeds.txt").write_text(
        "http://s0.com/\nhttp://s1.com/\n"
    )
    seeds_stream = (
        spark.readStream.format("text")
        .load(str(seeds_dir))
        .select(F.col("value").alias("url"))
    )
    q = stream_crawl(
        spark, loop, seeds_stream, str(tmp_path / "ckpt"), max_batches=3,
        passes_per_trigger=3,
    )
    q.awaitTermination(400)
    if q.isActive:
        q.stop()
    assert store.read("url_seen") is not None
    assert store.read("url_seen").count() >= 2
    log = store.read("fetch_log")
    assert log is not None and log.count() >= 2


def test_stream_crawl_backpressure_bounds_per_pass(spark, tmp_path):
    """max_urls_per_pass: a bursty seed file (40 URLs in one trigger)
    drains over several bounded passes inside the trigger — every
    batch's fetch count stays under the cap and the burst completes."""
    from jirlbot_spark.plans.loop import CrawlConfig, CrawlLoop
    from jirlbot_spark.sources.storage import TableStore

    hosts = [f"b{i:02d}.com" for i in range(40)]
    robots = spark.createDataFrame(
        [(h, [], 0.0) for h in hosts],
        "host string, disallow array<string>, crawl_delay double",
    )
    store = TableStore(spark, str(tmp_path / "bp_state"))
    loop = CrawlLoop(
        spark, store, None, None, robots,
        CrawlConfig(salt_buckets=2, num_buckets=8, min_delay_s=0.0),
    )
    seeds_dir = tmp_path / "bp_seeds"
    seeds_dir.mkdir()
    (seeds_dir / "burst.txt").write_text(
        "".join(f"http://{h}/\n" for h in hosts)
    )
    seeds_stream = (
        spark.readStream.format("text")
        .load(str(seeds_dir))
        .select(F.col("value").alias("url"))
    )
    q = stream_crawl(
        spark, loop, seeds_stream, str(tmp_path / "bp_ckpt"),
        passes_per_trigger=13, max_urls_per_pass=16,
    )
    q.awaitTermination(400)
    if q.isActive:
        q.stop()
    assert loop.cfg.max_urls_per_batch == 16  # the knob reached the loop
    per_batch = {
        r["batch"]: r["n"]
        for r in store.read("fetch_log")
        .groupBy("batch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_batch and max(per_batch.values()) <= 16
    assert sum(per_batch.values()) == 40  # the whole burst drained
    assert len(per_batch) >= 3  # across several bounded passes
