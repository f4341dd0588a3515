"""Sequence packing — concatenate-then-chunk layout for pretraining.

Pretraining consumes fixed-length token windows, not documents; the
standard recipe (GPT-family data loaders) concatenates documents in a
fixed order and slices the stream every `window` tokens. This operator
computes that layout declaratively: for every document, WHERE its
tokens land in the packed stream — which window (pack) it starts in
and at what offset — so a downstream tensor-materialization pass can
slice deterministically without ever re-scanning order.

Pinned semantics (driver key `pack_sequences`; the DuckDB oracle
recomputes every assignment independently):

  shard(doc)   = doc_id % n_shards     (each shard packs its own
                                        independent stream — packing a
                                        100 TB corpus as ONE stream
                                        would serialize on a single
                                        global running sum)
  order        = doc_id ascending within the shard (any total order
                 works; doc_id is the one that is stable across runs,
                 partitionings, and corpus growth at the tail)
  start(doc)   = sum of n_tokens over all earlier docs in the shard
  pack_id      = start DIV window      (the window the doc STARTS in;
                                        long docs spill into following
                                        packs, exactly like the
                                        concatenated stream does)
  offset       = start % window

Scale shape: one narrow projection (doc_id, n_tokens longs — text
never leaves the scan), one running-sum window per shard. The window
is the only exchange+sort, over 16 bytes/doc; n_shards spreads it (the
salted-window pattern BEAST uses, except here shards are semantic, not
a rewrite). All arithmetic is int64, so assignments are
bit-reproducible everywhere.

No reference counterpart (crawler; reference tree empty — SURVEY.md
§0); serves the graft's training-data-pipeline set (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jirlbot_spark.functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    window: int = 2048,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns one row per document:
      (id_col, n_tokens, shard, start_token, pack_id, offset)
    where pack_id is shard-local (pair it with shard for a global key).
    Empty documents occupy zero tokens: they inherit the current stream
    position and advance nothing — harmless and deterministic.

    `shuffle_seed`: when set, documents concatenate in SEEDED
    PSEUDO-RANDOM order within each shard — xxhash64(doc_id, seed)
    ascending, doc_id tie-break — instead of doc_id order: the
    published pretraining recipe shuffles documents before packing so
    adjacent windows don't replay corpus order. Same determinism
    contract (stable across runs, retries, partitionings); different
    seeds give independent epoch orders. Default None keeps the pinned
    doc_id order (the driver key's oracle contract).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    rows = docs.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
    )
    order = (
        [F.xxhash64(F.col(id_col), F.lit(shuffle_seed)), F.col(id_col)]
        if shuffle_seed is not None
        else [F.col(id_col)]
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return rows.select(
        F.col(id_col), "n_tokens", "shard", start.alias("start_token")
    ).select(
        F.col(id_col),
        "n_tokens",
        "shard",
        "start_token",
        F.expr(f"start_token DIV {window}").alias("pack_id"),
        F.pmod(F.col("start_token"), F.lit(window)).cast("long").alias(
            "offset"
        ),
    )
