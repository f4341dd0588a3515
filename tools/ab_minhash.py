"""Interleaved, probe-balanced A/B of minhash_dedup formulations.

Round-2 verdict #1: the official driver bench clocked `dedup_minhash` at
21.6 s (10x the median key) while the builder's clean-window run said
5.7 s.  Settle it by MEASUREMENT under the BENCH/BASELINE.md protocol:
run candidate formulations INTERLEAVED (A,B,C,A,B,C,...) with a cpu probe
before each trial, so a degraded host window hits all variants equally
and the verdict comes from probe-balanced medians.

ROUND-0 FINDING (recorded in BENCH/BASELINE.md): the r2-shipped
no-persist form and BOTH .persist() forms are catastrophically slower
than materializing the shingle frame: 156 s / 190 s / 131 s vs 11 s in
the same window (probes 156-299).  The docstring's claim that
"Spark's shuffle-stage reuse already dedupes the heavy lifting" is
WRONG here: the semi-join pushdown specializes each branch's exchanges,
so nothing is reused and the shingle pipeline (and the LSH candidate
pipeline above it, which appears 3x in the final tree) re-executes per
branch.  This script now compares the MATERIALIZATION strategies:

  nopersist  — r2 control (one trial per round, it's 10x+ slower)
  bucketed   — write shingles to parquet, read back (needs a scratch dir)
  ckpt_sh    — localCheckpoint(eager) the shingle frame (no scratch dir)
  ckpt_both  — localCheckpoint shingles AND candidate pairs

Usage: python tools/ab_minhash.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import cpu_probe
from jirlbot_spark.operators.text_dedup import (
    exact_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_hashes,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
THRESHOLD, BANDS, NUM_HASHES = 0.8, 16, 32


def _docs(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    # same doubling the driver key uses (forces real dup pairs)
    return d.unionByName(
        d.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )


def _finish(sh, ckpt_cand=False):
    sig = minhash_signatures(sh, num_hashes=NUM_HASHES)
    cand = lsh_candidate_pairs(sig, num_hashes=NUM_HASHES, bands=BANDS)
    if ckpt_cand:
        cand = cand.localCheckpoint(eager=True)
    jac = exact_jaccard(sh, cand)
    out = jac.filter(F.col("jaccard") >= THRESHOLD).select(
        "id_a", "id_b", "jaccard"
    )
    return out.count()


def run_nopersist(spark, docs, tmp):
    return _finish(shingle_hashes(docs))


def run_bucketed(spark, docs, tmp):
    path = os.path.join(tmp, f"sh_{time.time_ns()}")
    shingle_hashes(docs).write.mode("overwrite").parquet(path)
    return _finish(spark.read.parquet(path))


def run_ckpt_sh(spark, docs, tmp):
    return _finish(shingle_hashes(docs).localCheckpoint(eager=True))


def run_ckpt_both(spark, docs, tmp):
    return _finish(
        shingle_hashes(docs).localCheckpoint(eager=True), ckpt_cand=True
    )


VARIANTS = {
    "nopersist": run_nopersist,
    "bucketed": run_bucketed,
    "ckpt_sh": run_ckpt_sh,
    "ckpt_both": run_ckpt_both,
}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from jirlbot_spark.session import get_spark

    spark = get_spark(app_name="ab_minhash", master=f"local[{CPUS}]")
    docs = _docs(spark)
    docs.count()  # warm the scan
    results: dict[str, list[dict]] = {k: [] for k in VARIANTS}
    counts = {}
    with tempfile.TemporaryDirectory(prefix="ab_minhash_") as tmp:
        run_bucketed(spark, docs, tmp)  # untimed warmup (JIT/codegen)
        for r in range(rounds):
            for name, fn in VARIANTS.items():
                if name == "nopersist" and r > 0:
                    continue  # established 10x+ loser; one control trial
                probe = cpu_probe(1.0)
                t0 = time.time()
                n = fn(spark, docs, tmp)
                dt = time.time() - t0
                results[name].append({"s": round(dt, 2), "probe": round(probe)})
                counts.setdefault(name, n)
                assert counts[name] == n, (name, counts, n)
                print(
                    f"round {r} {name:12s} {dt:6.2f}s  probe={probe:6.0f}  n={n}",
                    flush=True,
                )
    first = next(iter(counts.values()))
    assert all(v == first for v in counts.values()), counts
    medians = {
        k: sorted(t["s"] for t in v)[len(v) // 2] for k, v in results.items()
    }
    print(json.dumps({"medians": medians, "trials": results, "pairs": first}))
    spark.stop()


if __name__ == "__main__":
    main()
