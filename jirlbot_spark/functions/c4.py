"""C4-style line-level cleaning + document gate (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning" §2.2 — the C4 recipe),
adapted to the pinnable subset and kept all-JVM.

Pinned rules (the contract the driver key certifies cross-engine):

  line level — a line is KEPT iff, after trimming, it
    1. ends in terminal punctuation: one of . ! ? " '  (C4's rule,
       closing quotes included);
    2. has >= `min_words` whitespace-separated words (C4 uses 3);
    3. does not contain 'javascript' case-insensitively (C4 drops such
       lines — enable-JS boilerplate).
  document level — `keep` is true iff
    4. the LOWERCASED text does not contain 'lorem ipsum';
    5. the text does not contain '{' (code, not prose);
    6. at least `min_lines` lines survived (C4 uses 5 sentences; the
       knob is per-deployment).

C4's other gates (bad-words list, citation markers, dedup) live
elsewhere in this engine (dedup operators) or are deliberately not
shipped (embedding a slur list in a library is a policy decision for
the deployment, not the engine — the hook is the same contains()
shape as rule 3).

Implementation note: the line filter is a higher-order F.filter lambda
— CodegenFallback (interpreted), the same class of expression the
robots matcher uses. Unlike the shingle case (ROUND3_NOTES session 5)
there is no Generate below it multiplying evaluations: cost is one
interpreted pass over each doc's line array, and the split itself
stays in its own projection so it runs once per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_RE = "[.!?\"']$"
MIN_WORDS = 3
MIN_LINES = 5


def _line_ok(line: Column, min_words: int) -> Column:
    return (
        line.rlike(TERMINAL_RE)
        & (F.size(F.split(line, r"\s+")) >= min_words)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_clean_df(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    min_lines: int = MIN_LINES,
) -> DataFrame:
    """+ text_clean (kept lines, trimmed, '\\n'-joined), n_lines,
    n_kept, keep. Pure projection — no shuffle, no Python; callers
    filter on `keep` so the gate composes with any downstream op."""
    # the explicit lambda is load-bearing: F.trim grew a second (trim
    # chars) parameter, so passing it bare makes transform() call it as
    # trim(element, index) — which trims DIGITS, silently
    trimmed = F.transform(
        F.split(F.col(text_col), "\n"), lambda s: F.trim(s)
    )
    kept = F.filter(trimmed, lambda s: _line_ok(s, min_words))
    out = df.select(
        "*",
        F.size(trimmed).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("text_clean"),
    )
    return out.withColumn(
        "keep",
        ~F.contains(F.lower(F.col(text_col)), F.lit("lorem ipsum"))
        & ~F.contains(F.col(text_col), F.lit("{"))
        & (F.col("n_kept") >= min_lines),
    )
