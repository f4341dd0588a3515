"""Repetition-based quality signals — the Gopher-rule family.

Published LLM-corpus recipes (Gopher / MassiveText §A1.1, reused by
RedPajama and Dolma) filter documents by REPETITION: boilerplate and
spam pages repeat the same n-grams; natural text doesn't. This module
computes the n-gram repetition family over a documents table, pinned to
exact deterministic definitions so an independent SQL engine can
recompute every value (driver key `repetition_stats`):

  tokens        = \\s+ split of trim(text)  (the engine's pinned
                  tokenization, functions/text.tokens_col)
  total_chars   = length of the single-space re-join of the tokens
                  (normalization makes char counts whitespace-invariant)
  gram(i, n)    = tokens[i..i+n-1]; its char length = sum of token
                  lengths + (n-1) joining spaces
  top_frac(n)   = MAX over distinct grams of count*gram_len / total_chars
                  (the n-gram covering the most characters — a
                  determinism-friendly variant of Gopher's "fraction of
                  characters in the most COMMON n-gram": max-of-products
                  needs no tie-break rule, and ties in count are broken
                  by coverage, the quantity the filter actually targets)
  dup_frac(n)   = SUM over grams with count >= 2 of count*gram_len /
                  total_chars (duplicated-gram coverage, overlapping
                  occurrences counted — the RedPajama/Dolma convention,
                  NOT Gopher's interval-union, which is not expressible
                  as a per-gram aggregate)

Defaults follow the published thresholds' domains: top fractions for
n = 2..4, duplicate fractions for n = 5..10.

Scale shape: a single explode of start indices emits every
(n, gram_hash, gram_len) triple per position in-codegen (tokenization
stays below the Generate — the same CollapseProject trap
shingle_hashes pins, plan-audit check #13; verified in the executed
plan), then one shuffle on (doc, n, hash) longs and one
map-side-combinable per-doc aggregate. The per-doc totals join reads
the (id, text) columns a second time so empty/short documents keep
their real char counts — a column-pruned second scan, each branch
strictly per-doc work. Text never shuffles; every fraction's numerator and
denominator are exact int64s, so the final double division is
bit-reproducible everywhere (IEEE correctly-rounded from exact ints).
All numerators stay far under 2^53: count*gram_len <= total_chars^2 —
documents beyond ~90 MB of text would need a guard, three orders of
magnitude above any sane document cap.

No reference counterpart (crawler; tree empty regardless — SURVEY.md
§0); serves the graft's training-data-pipeline set (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jirlbot_spark.functions.text import tokens_col

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> DataFrame:
    """Per-document repetition fractions (see module docstring).

    Returns one row per input document:
      (id_col, total_chars, top{n}_frac for n in top_ns,
       dup{n}_frac for n in dup_ns)
    Documents too short for a given n (or empty) score 0.0 for it.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    if not all_ns or min(all_ns) < 1:
        raise ValueError("n-gram sizes must be >= 1")
    step = docs.select(
        F.col(id_col),
        tokens_col(text_col).alias("__toks"),
    ).select(
        F.col(id_col),
        "__toks",
        F.length(F.array_join("__toks", " ")).cast("long").alias("__total"),
        F.size("__toks").alias("__nt"),
    )
    # one explode over start positions; guard sequence() against nt < 1
    starts = F.when(
        F.col("__nt") < 1, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.greatest("__nt", F.lit(1))))
    i = F.col("__i")

    def gram_struct(n: int):
        toks = [F.element_at("__toks", i + j) for j in range(n)]
        glen = sum(
            [F.length(t).cast("long") for t in toks], F.lit(n - 1).cast("long")
        )
        return F.when(
            i + F.lit(n - 1) <= F.col("__nt"),
            F.struct(
                F.lit(n).alias("n"),
                F.xxhash64(*toks).alias("h"),
                glen.alias("glen"),
            ),
        )

    grams = (
        step.select(
            F.col(id_col), "__toks", "__total", "__nt",
            F.explode(starts).alias("__i"),
        )
        .select(
            F.col(id_col),
            "__total",
            F.explode(
                F.array_compact(F.array(*[gram_struct(n) for n in all_ns]))
            ).alias("__g"),
        )
        .select(
            F.col(id_col), "__total",
            F.col("__g.n").alias("__n"),
            F.col("__g.h").alias("__h"),
            F.col("__g.glen").alias("__glen"),
        )
    )
    per_gram = grams.groupBy(id_col, "__n", "__h").agg(
        F.count("*").alias("__cnt"), F.max("__glen").alias("__glen")
    )
    cover = F.col("__cnt") * F.col("__glen")
    per_doc_n = per_gram.groupBy(id_col, "__n").agg(
        F.max(cover).alias("__top_cover"),
        F.sum(F.when(F.col("__cnt") >= 2, cover).otherwise(0)).alias(
            "__dup_cover"
        ),
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(
                F.when(F.col("__n") == n, F.col("__top_cover"))
            ).alias(f"__top{n}")
        )
    for n in dup_ns:
        aggs.append(
            F.max(
                F.when(F.col("__n") == n, F.col("__dup_cover"))
            ).alias(f"__dup{n}")
        )
    wide = per_doc_n.groupBy(id_col).agg(*aggs)

    def frac(cover_col: str):
        return F.when(
            F.col("__total") > 0,
            F.coalesce(F.col(cover_col), F.lit(0)).cast("double")
            / F.col("__total").cast("double"),
        ).otherwise(F.lit(0.0))

    out_cols = [
        F.col("__total").alias("total_chars"),
        *[frac(f"__top{n}").alias(f"top{n}_frac") for n in top_ns],
        *[frac(f"__dup{n}").alias(f"dup{n}_frac") for n in dup_ns],
    ]
    # totals come from the pre-explode projection so docs too short to
    # produce any gram still report their real char count (fracs 0.0)
    totals = step.select(F.col(id_col), "__total")
    return totals.join(wide, id_col, "left").select(
        F.col(id_col), *out_cols
    )
