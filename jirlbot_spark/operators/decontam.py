"""Benchmark decontamination — n-gram overlap flagging for training data.

A training corpus must not contain the evaluation benchmarks it will be
judged against; the standard defense (GPT-3 appendix C; Llama 2 §A.6;
The Pile) is n-gram-overlap flagging: a document is contaminated if it
shares at least one k-token n-gram (k≈13 in the published recipes) with
any benchmark document. This module is that operator, shaped for the
100 TB corpus × MB-scale benchmark asymmetry:

  - document grams come from the SAME pinned shingle pipeline the dedup
    family uses (`text_dedup.shingle_hashes`: \\s+ tokens, multi-arg
    xxhash64 over the k tokens, tokenization kept below the Generate —
    plan-audit check #13 applies here too);
  - the benchmark side collapses to a DISTINCT 64-bit gram-hash set and
    is BROADCAST — eval suites are megabytes against a corpus of
    terabytes, so the contamination test is a map-side semi-join: no
    shuffle ever carries document text or document grams to the
    benchmark;
  - per-doc totals (n_grams) are a map-side-combinable count over the
    already-distinct (id, sh) longs; hit counts aggregate only the
    matched rows (benchmark-sized, not corpus-sized).

False-positive rate from the 64-bit hash: a corpus-gram/bench-gram
collision needs ~2^32 × 2^32 pairs (birthday) — negligible, and the
failure mode is an extra DROPPED document, the safe direction for
decontamination. The driver key `decontaminate`'s DuckDB oracle
recomputes contamination INDEPENDENTLY over gram STRINGS (no hashing,
no shared kernel), so green also certifies the no-collision assumption
at fixture scale.

No reference counterpart: RovoMe/JIRLbot is a crawler (the reference
tree is empty regardless — SURVEY.md §0); this operator serves the
graft's training-data-pipeline set (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jirlbot_spark.operators.text_dedup import shingle_hashes


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag documents sharing any k-token n-gram with the benchmark.

    Returns one row per input document:
      (id_col, n_grams, n_hit, contaminated)
    where n_grams = the doc's distinct k-gram count, n_hit = how many of
    those grams appear anywhere in the benchmark, and contaminated =
    (n_hit > 0). Documents shorter than k tokens have n_grams = 0 and
    are never contaminated. Tokenization is the engine's pinned \\s+
    convention (functions/text.tokens_col) on BOTH sides.

    `broadcast_benchmark=True` (default) is the 100 TB path: the
    benchmark's distinct gram-hash set ships to every executor and the
    scan-side semi-join never shuffles. Set False only if the benchmark
    side is itself corpus-sized (then it's a plain shuffled semi-join).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sh = shingle_hashes(docs, text_col=text_col, id_col=id_col, k=k)
    bench_sh = (
        shingle_hashes(
            benchmark,
            text_col=bench_text_col or text_col,
            id_col=id_col,
            k=k,
        )
        .select("sh")
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    totals = sh.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        sh.join(bench_sh, "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )
