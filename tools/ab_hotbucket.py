"""A/B the LSH hot-bucket bound on a boilerplate-skewed corpus (r5).

Builds the adversarial shape the r4 verdict warned about at crawl scale:
the sf0.1 documents table (5,000 real docs) plus N_BOILER near-identical
boilerplate docs (one shared template, tiny numeric suffix), so every
MinHash band forms one mega-bucket holding N_BOILER docs. Then measures
candidate-pair counts and wall time for:

  uncapped   — lsh_candidate_pairs(max_bucket_size=None)  (the r4 plan)
  salted     — cap 4096, hot_mode="salted"  (identical pairs, skew spread)
  drop       — cap 4096, hot_mode="drop"    (hot buckets excluded, logged)

The quadratic blowup is the point: N_BOILER=6000 puts ~18M boilerplate
pairs behind one band hash; drop mode removes them while keeping every
cold-bucket candidate. Results are recorded in SCALE.md addendum 9.

Usage: python tools/ab_hotbucket.py [N_BOILER]
"""
from __future__ import annotations

import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO)


def main() -> int:
    sys.path.insert(0, ".")
    n_boiler = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from jirlbot_spark.operators.text_dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_hashes,
    )
    from jirlbot_spark.session import get_spark

    spark = get_spark(app_name="ab-hotbucket", master="local[32]")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    boiler = spark.range(n_boiler).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit(
                "all rights reserved terms of service privacy policy "
                "cookie banner navigation home about contact copyright "
            ),
            (F.col("id") % 7).cast("string"),  # 7 variants -> huge buckets
        ).alias("text"),
    )
    corpus = docs.unionByName(boiler)
    sig = minhash_signatures(shingle_hashes(corpus)).localCheckpoint(
        eager=True
    )
    print(f"corpus: {corpus.count()} docs ({n_boiler} boilerplate)")

    results = {}
    for name, kwargs in (
        ("uncapped", {"max_bucket_size": None}),
        ("salted", {"max_bucket_size": 4096, "hot_mode": "salted"}),
        ("drop", {"max_bucket_size": 4096, "hot_mode": "drop"}),
    ):
        t0 = time.time()
        n = lsh_candidate_pairs(sig, **kwargs).count()
        dt = time.time() - t0
        results[name] = (n, dt)
        print(f"{name:9s}: {n:>12,} candidate pairs in {dt:6.1f}s")
    assert results["salted"][0] == results["uncapped"][0], "salted != base"
    assert results["drop"][0] < results["uncapped"][0]
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
