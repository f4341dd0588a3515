"""Interleaved, probe-balanced A/B of frontier-pipeline compression codecs.

Motivation (round-3 scaling sessions, BENCH/BASELINE.md): the dedup phase
is the one that does NOT scale 2->8 cores (69.6 s @2 -> 76.7 s @8 in the
last verdict pair, while prepare/schedule scale 2.6-2.8x).  Its cost is
dominated by BYTES THROUGH DRAM — parquet read of the prepared frontier,
one wide shuffle exchange, parquet write of the unique set, all on tmpfs
— and this host's DRAM bandwidth is the documented collapsing axis.
Compression is the engine-level lever that trades bandwidth (the
non-scaling resource here) for CPU (the scaling one):

  base       — Spark defaults: snappy parquet, lz4 shuffle
  zstd_pq    — spark.sql.parquet.compression.codec=zstd
  zstd_io    — spark.io.compression.codec=zstd (shuffle + spill)
  zstd_both  — both of the above

Protocol = BENCH/BASELINE.md: variants run INTERLEAVED (A,B,C,D,A,...)
in fresh subprocesses (bench.py --frontier-only), each trial preceded by
a cpu probe and a 1-proc membw probe so a degraded host window hits all
variants equally and is visible in the artifact.  Output identity is
asserted every trial (n_unique, n_admitted must match across variants).

Usage: python tools/ab_dedup.py [rounds] [cores]   (default 2 rounds @8)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import cpu_probe, membw_probe

VARIANTS = {
    "base": "",
    "zstd_pq": "spark.sql.parquet.compression.codec=zstd",
    "zstd_io": "spark.io.compression.codec=zstd",
    "zstd_both": (
        "spark.sql.parquet.compression.codec=zstd;"
        "spark.io.compression.codec=zstd"
    ),
}


def run_variant(name: str, conf: str, cores: int, n_urls: int) -> dict:
    env = dict(os.environ)
    env["JIRLBOT_SPARK_CONF"] = conf
    env["SPARK_MASTER"] = f"local[{cores}]"
    env["JIRLBOT_BENCH_N"] = str(n_urls)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py", "--frontier-only"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = out.stdout.strip().splitlines()[-1]
    res = json.loads(line)
    res["subproc_wall_s"] = round(time.time() - t0, 1)
    res["variant"] = name
    return res


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_urls = int(os.environ.get("JIRLBOT_BENCH_N", "8000000"))
    trials: list[dict] = []
    identity: set[tuple[int, int]] = set()
    for r in range(rounds):
        for name, conf in VARIANTS.items():
            probe = cpu_probe(1.0)
            membw = membw_probe(1, 1.0)
            res = run_variant(name, conf, cores, n_urls)
            res["probe"] = round(probe)
            res["membw_1p"] = round(membw, 1)
            trials.append(res)
            identity.add((res["n_unique"], res["n_admitted"]))
            t = res["timings"]
            print(
                f"round {r} {name:9s}: dedup {t['dedup_s']:6.1f}s "
                f"prepare {t['prepare_s']:6.1f}s sched {t['schedule_s']:6.1f}s "
                f"wall {res['wall_s']:6.1f}s "
                f"({res['urls_per_sec']:,.0f} urls/s, probe {probe:.0f}, "
                f"membw {membw:.1f} GB/s)",
                flush=True,
            )
    assert len(identity) == 1, f"output identity violated: {identity}"
    print("\nmedian dedup_s / wall_s per variant:")
    for name in VARIANTS:
        ds = [t["timings"]["dedup_s"] for t in trials if t["variant"] == name]
        ws = [t["wall_s"] for t in trials if t["variant"] == name]
        print(
            f"  {name:9s}: dedup {statistics.median(ds):6.1f}s "
            f"wall {statistics.median(ws):6.1f}s  (runs: "
            f"{[round(d, 1) for d in ds]})"
        )
    print(json.dumps({"trials": trials}, default=str))


if __name__ == "__main__":
    main()
