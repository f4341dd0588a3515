"""Gopher document-level quality rules (Rae et al. 2021, Appendix A).

The doc-level filter battery every post-Gopher pipeline quotes
(MassiveText -> Gopher -> Chinchilla -> Llama recipes): word-count
band, mean-word-length band, symbol-to-word ratio, bullet/ellipsis
line ratios, alphabetic-word ratio, minimum stop-word hits. Distinct
from the engine's other text-quality surfaces: `quality_score` is a
soft heuristic score, `c4_clean` is C4's LINE-level grammar, and
`repetition_stats` is Gopher's REPETITION appendix — this module is
Gopher's doc-level accept/reject table.

Pinned exactness contract (the trap_detect discipline): every ratio
threshold is an exact integer cross-multiplication — e.g. "mean word
length in [3,10]" tests `3·n_words <= sum_word_len <= 10·n_words`,
"<=30% ellipsis lines" tests `10·n_ellipsis <= 3·n_lines` — so the
verdicts are bit-reproducible and the SQL oracle recomputes them from
its own counters with no float in sight. Counters ride along in the
output so per-rule kill-rate metrics are one groupBy away (the
pair_filter contract).

All-JVM: one whole-stage-codegen projection; the only interpreted
pieces are bounded HOF lambdas over the token/line arrays (no Generate
beneath them — the shingle trap audited, as in c4_clean). Pure
projection, zero shuffle: at 10^10 documents this is a map-side gate.

Tokens are the pinned tokens_col contract (whitespace split, empties
filtered); sum_word_len is computed as length(text minus whitespace),
which equals the sum of token lengths under that contract without a
second pass over the array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from jirlbot_spark.functions.text import tokens_col

__all__ = ["gopher_counters", "gopher_quality"]

# the pinned stop-word set of the published rule ("contains at least
# two of ...")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _nonempty_tokens(text: Column) -> Column:
    return F.filter(tokens_col(text), lambda t: t != "")


def gopher_counters(text: Column) -> dict[str, Column]:
    """The integer counters every rule tests. Exposed separately so
    metrics pipelines can aggregate them without the verdicts."""
    toks = _nonempty_tokens(text)
    lines = F.transform(F.split(text, "\n"), lambda l: F.trim(l))
    lower = F.transform(toks, lambda t: F.lower(t))
    n_stop = sum(
        (
            F.array_contains(lower, w).cast("int")
            for w in GOPHER_STOPWORDS
        ),
        F.lit(0),
    )
    return {
        "n_words": F.size(toks),
        "sum_word_len": F.length(F.regexp_replace(text, r"\s", "")),
        "n_symbols": F.regexp_count(text, F.lit(r"#|\.\.\.|…")),
        "n_lines": F.size(F.split(text, "\n")),
        "n_bullet": F.size(
            F.filter(lines, lambda l: l.rlike("^[-*•]"))
        ),
        "n_ellipsis": F.size(
            F.filter(
                lines, lambda l: l.endswith("...") | l.endswith("…")
            )
        ),
        "n_alpha_words": F.size(
            F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
        ),
        "n_stop_hits": n_stop,
    }


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100000,
) -> DataFrame:
    """Adds the counters, the seven per-rule flags (True = rule FIRED =
    reject reason), and `keep`. Thresholds beyond the word-count band
    are the published constants, pinned as integer cross-products."""
    c = gopher_counters(F.col(text_col))
    out = docs.select(
        "*", *[v.alias(k) for k, v in c.items()]
    )
    n, swl = F.col("n_words"), F.col("sum_word_len")
    flags = {
        "flag_word_count": (n < min_words) | (n > max_words),
        "flag_mean_len": (swl < 3 * n) | (swl > 10 * n),
        "flag_symbol": 10 * F.col("n_symbols") > n,
        "flag_bullet": 10 * F.col("n_bullet") > 9 * F.col("n_lines"),
        "flag_ellipsis": 10 * F.col("n_ellipsis") > 3 * F.col("n_lines"),
        "flag_alpha": 5 * F.col("n_alpha_words") < 4 * n,
        "flag_stop": F.col("n_stop_hits") < 2,
    }
    out = out.select("*", *[v.alias(k) for k, v in flags.items()])
    keep = F.lit(True)
    for k in flags:
        keep = keep & ~F.col(k)
    return out.withColumn("keep", keep)
