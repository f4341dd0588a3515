"""Aspect-ratio bucketing + deterministic batch assembly for image-model
training — the published recipe (NovelAI's aspect-ratio bucketing, SDXL
appendix: multi-aspect training) over the input-hint pair table
(image_id, bytes, w, h, fmt, caption, phash): every image is assigned to
the pinned resolution bucket whose aspect ratio is nearest its own, then
grouped into fixed-size batches WITHIN a bucket so a training batch never
mixes shapes.

Exactness contract: nearest-aspect is decided entirely in int64 —
|w/h − bw/bh| comparisons are cleared of BOTH denominators by scaling
each bucket's |w·bh − bw·h| with D/bh (D = lcm of all bucket heights,
computed once driver-side from the pinned list), so the argmin is an
exact integer comparison with ties broken by bucket index. No float
enters the decision; the assignment is bit-reproducible in any engine
(the driver key's DuckDB twin recomputes it from the same pinned list).

Batch assembly at 10^10 rows: a GLOBAL contiguous rank per bucket would
be one ordered partition per bucket — the classic hot-window straggler
(the star_budget lesson). Instead rows are sharded by a deterministic
key hash (n_shards scales with the cluster) and ranked only WITHIN
(bucket, shard): the window partitions are corpus/(B·S) rows, batches
never cross shards (exactly how a sharded dataloader consumes them), and
the cost is ≤ batch_size−1 dropped tail rows per (bucket, shard) —
`complete` marks them. Rank order inside a shard is itself a
deterministic hash (shuffle-once semantics: retries, reruns, and
repartitioning reproduce identical batches — the sampling.py
discipline).

No reference counterpart (RovoMe/JIRLbot crawls; it does not build
training batches); mandated by the brief's image-payload axis.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["SDXL_BUCKETS", "assign_aspect_buckets", "bucket_batches"]

# The SDXL ~1024px multi-aspect ladder (64-px quantized, the published
# table's core rungs) — callers pass their own list for other ladders.
SDXL_BUCKETS: tuple[tuple[int, int], ...] = (
    (512, 2048),
    (576, 1664),
    (704, 1472),
    (832, 1216),
    (960, 1088),
    (1024, 1024),
    (1088, 960),
    (1216, 832),
    (1472, 704),
    (1664, 576),
    (2048, 512),
)


def assign_aspect_buckets(
    df: DataFrame,
    buckets: Sequence[tuple[int, int]] = SDXL_BUCKETS,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Add (bucket_id, bucket_w, bucket_h): the pinned bucket with the
    nearest aspect ratio, exact-int64 argmin, ties → lowest index.

    Pure projection (array-of-structs argmin in whole-stage codegen, no
    Exchange); int64 bounds: |w·bh − bw·h|·(D/bh) ≤ dim²·D — safe for
    any real image dimensions against the 67 Mpx decode cap.
    """
    if not buckets:
        raise ValueError("empty bucket list")
    D = math.lcm(*[bh for _, bh in buckets])
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    costs = F.array(
        *[
            F.struct(
                (F.abs(w * F.lit(bh) - F.lit(bw) * h) * F.lit(D // bh))
                .cast("long")
                .alias("cost"),
                F.lit(i).alias("idx"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    best = F.array_min(costs)["idx"]
    bw_map = F.array(*[F.lit(bw) for bw, _ in buckets])
    bh_map = F.array(*[F.lit(bh) for _, bh in buckets])
    return df.withColumns(
        {
            "bucket_id": best,
            "bucket_w": F.element_at(bw_map, best + 1),
            "bucket_h": F.element_at(bh_map, best + 1),
        }
    )


def bucket_batches(
    df: DataFrame,
    batch_size: int,
    key_cols: Sequence[str] = ("image_id",),
    n_shards: int = 64,
    seed: int = 0,
    shard_hash: Column | None = None,
    order_hash: Column | None = None,
) -> DataFrame:
    """Group bucketed rows into fixed-size same-bucket batches.

    Adds (shard, pos, batch_in_shard, pos_in_batch, complete):
    shard = hash(key, seed) mod n_shards; pos = rank within
    (bucket_id, shard) by an independent order hash; batch_in_shard =
    pos div batch_size; complete = the batch has a full batch_size rows
    (tail batches per shard are marked, not silently dropped — filter
    on `complete` to discard them).

    `shard_hash` / `order_hash` substitute any integer Column for the
    default xxhash64 (the driver key injects Knuth multiplicative
    hashes DuckDB replicates exactly; the default path is
    pytest-covered).
    """
    if batch_size < 1:
        raise ValueError(f"batch_size {batch_size} < 1")
    keys = [F.col(c) for c in key_cols]
    sh = (
        shard_hash
        if shard_hash is not None
        else F.xxhash64(*keys, F.lit(seed))
    )
    oh = (
        order_hash
        if order_hash is not None
        else F.xxhash64(*keys, F.lit(seed + 1))
    )
    with_shard = df.withColumns(
        {"shard": F.pmod(sh, F.lit(int(n_shards))).cast("int"),
         "__oh": oh}
    )
    win = Window.partitionBy("bucket_id", "shard").orderBy(
        "__oh", *key_cols
    )
    pos = F.row_number().over(win) - 1
    n_in = F.count(F.lit(1)).over(
        Window.partitionBy("bucket_id", "shard")
    )
    bs = F.lit(int(batch_size))
    return (
        with_shard.withColumns(
            {
                "pos": pos.cast("long"),
                "__n": n_in,
            }
        )
        .withColumns(
            {
                # SQL `div` = exact integer division (no float enters)
                "batch_in_shard": F.expr(f"pos div {int(batch_size)}"),
                "pos_in_batch": F.pmod(F.col("pos"), bs).cast("int"),
                "complete": F.expr(
                    f"(pos div {int(batch_size)})"
                    f" < (__n div {int(batch_size)})"
                ),
            }
        )
        .drop("__oh", "__n")
    )
