"""spark-submit entrypoint for the crawl loop (SCALE.md's cluster recipe).

    spark-submit --py-files dist/jirlbot_spark.zip run_crawl.py \
        --store /path/or/s3/crawl --seeds /path/seeds.txt \
        --pages /path/pages.parquet --links /path/links.parquet \
        --robots /path/robots.parquet --batches 10 \
        [--bloom-dir /local_ssd/bloom] [--resume]

Seeds: text file, one URL per line. pages/links/robots: parquet with the
schemas in SURVEY.md §1.2 (pages = the image+caption payload table;
links = (src_url, dst_url); robots = (host, disallow, crawl_delay)).
Resume: with --resume the loop continues from the store's committed
batch_id — exact-resume semantics per storage.commit_batch.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", required=True)
    p.add_argument("--seeds")
    p.add_argument("--pages")
    p.add_argument("--links")
    p.add_argument("--robots")
    p.add_argument("--batches", type=int, default=1)
    p.add_argument("--bloom-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--top-k", type=int, default=10_000)
    p.add_argument("--b-hi", type=int, default=10_000)
    p.add_argument("--b-lo", type=int, default=10)
    p.add_argument("--default-budget", type=int, default=10)
    p.add_argument("--salt-buckets", type=int, default=16)
    p.add_argument("--min-delay-s", type=float, default=1.0)
    p.add_argument("--num-buckets", type=int, default=32)
    p.add_argument("--compact-every", type=int, default=None)
    args = p.parse_args(argv)

    from jirlbot_spark.plans.loop import CrawlConfig, CrawlLoop
    from jirlbot_spark.session import get_spark
    from jirlbot_spark.sources.storage import TableStore

    spark = get_spark(app_name="jirlbot-crawl")
    store = TableStore(spark, args.store)
    cfg = CrawlConfig(
        top_k=args.top_k,
        b_hi=args.b_hi,
        b_lo=args.b_lo,
        default_budget=args.default_budget,
        salt_buckets=args.salt_buckets,
        min_delay_s=args.min_delay_s,
        num_buckets=args.num_buckets,
        bloom_dir=args.bloom_dir,
        compact_every=args.compact_every,
    )
    pages = spark.read.parquet(args.pages) if args.pages else None
    links = spark.read.parquet(args.links) if args.links else None
    robots = spark.read.parquet(args.robots) if args.robots else None
    loop = CrawlLoop(spark, store, pages, links, robots, cfg)

    if not args.resume:
        if not args.seeds:
            p.error("--seeds is required unless --resume")
        seeds = spark.read.text(args.seeds).withColumnRenamed("value", "url")
        n = loop.ingest_seeds(seeds)
        print(json.dumps({"event": "seeded", "frontier_rows": n}))
    elif args.bloom_dir and store.last_batch() >= 0 and store.exists(
        "url_seen"
    ):
        # Resuming with a (possibly node-local, possibly empty/stale)
        # sidecar dir: rebuild the filters from the committed store so
        # they carry the current epoch — the loop's epoch validation
        # (membership.py) refuses to OR into lagging files, which is
        # safe but leaves the fast path dark until a rebuild like this.
        from jirlbot_spark.operators.membership import build_bloom_files

        stats = build_bloom_files(
            store.read("url_seen"),
            args.bloom_dir,
            num_buckets=args.num_buckets,
            epoch=store.last_batch(),
        )
        print(json.dumps({
            "event": "bloom_rebuilt",
            "buckets": int(len(stats)),
            "epoch": store.last_batch(),
        }))

    for st in loop.run(args.batches):
        print(json.dumps({"event": "batch", **st}))
        if st.get("done"):
            break
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
