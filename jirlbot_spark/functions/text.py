"""Text analysis for large-scale training-data pipelines.

Everything here is a COLUMN BUILDER over pyspark.sql.functions — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. Each has an exact ANSI
SQL twin in __spark_entry__.oracle_sql() so the DuckDB oracle can verify it
value-for-value.

Surface: token counting, language-ID (stopword heuristic), quality scoring
(length/punct/stopword ratios), position-weighted document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny embedded stopword sets; a real deployment broadcasts full lists —
# the expressions below are set-membership and don't change with list size
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
FR_STOPWORDS = ("le", "la", "les", "et", "est", "un", "une", "dans")

FP_MOD = 2_147_483_647  # 2^31-1


def tokens_col(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: str | Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(tokens_col(c))
    )


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def lang_id(text: str | Column) -> Column:
    """Rule-based language ID: argmax of stopword hits (en/de/fr), 'und'
    (undetermined) when nothing matches. The n-gram upgrade path keeps the
    same signature."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    en = _stopword_hits(toks, EN_STOPWORDS)
    de = _stopword_hits(toks, DE_STOPWORDS)
    fr = _stopword_hits(toks, FR_STOPWORDS)
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def quality_score(text: str | Column) -> Column:
    """Heuristic [0,1] quality: length band + stopword ratio - punct excess.

    score = 0.4 * min(n_tokens/20, 1)
          + 0.4 * min(stopword_ratio * 5, 1)
          + 0.2 * (1 - min(punct_ratio * 10, 1))
    Deterministic double arithmetic, same op order as the SQL twin.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    n = F.size(toks).cast("double")
    stop = _stopword_hits(toks, EN_STOPWORDS).cast("double")
    punct = (
        F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    ).cast("double")
    chars = F.greatest(F.length(c).cast("double"), F.lit(1.0))
    stop_ratio = stop / F.greatest(n, F.lit(1.0))
    return (
        F.lit(0.4) * F.least(n / F.lit(20.0), F.lit(1.0))
        + F.lit(0.4) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.2)
        * (F.lit(1.0) - F.least(punct / chars * F.lit(10.0), F.lit(1.0)))
    )


def token_fingerprint(text: str | Column) -> Column:
    """Position-weighted 31-bit document fingerprint.

    fp = sum over tokens t at 1-based pos p of
         p * (ascii(t)*31 + length(t))  , all mod 2^31-1.
    Order-sensitive (position weights) yet expressible as a commutative
    SUM — so the DuckDB twin (unnest + row ordinality + SUM) matches
    bit-for-bit. Computed JVM-side with aggregate() over a zipped index —
    no shuffle, no Python.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    idx = F.sequence(F.lit(1), F.size(toks))
    weighted = F.zip_with(
        toks,
        idx,
        lambda t, i: i.cast("long")
        * ((F.ascii(t).cast("long") * F.lit(31) + F.length(t))
           % F.lit(FP_MOD)),
    )
    return F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, x: (acc + x) % F.lit(FP_MOD)
    )
