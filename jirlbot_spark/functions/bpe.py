"""Byte-pair-encoding tokenizer: distributed frequency counting,
bounded driver-side merge training, broadcast-table distributed encode.

The engine's token counts (functions/text.py token_count, the packing
operator's n_tokens) were regex approximations; training pipelines
ultimately need REAL subword tokenization. This module implements
Sennrich-style word-level BPE (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") with
every decision pinned deterministic:

  word symbols   = list(word) + ["</w>"]  (explicit end-of-word symbol)
  pair counts    = sum of word frequencies over adjacent symbol pairs
  merge choice   = max count, ties broken by the lexicographically
                   SMALLEST (a, b) pair — partitioning-independent
  stop           = n_merges reached, or best count < 2 (merging
                   singletons memorizes the corpus, never generalizes)
  encode         = repeatedly apply the lowest-rank applicable merge,
                   left-to-right within a round (the standard GPT-2-
                   style loop); for any word seen in training this
                   reproduces the training segmentation exactly
                   (pytest-pinned).

Scale shape (the 100 TB posture):
  - word_freqs is the distributed part: explode + groupBy(word) with
    map-side combine — the corpus shuffles only (word, count) partials,
    never text;
  - training collects ONLY the top-`max_words` frequency rows
    (deterministic order: count desc, word asc) — the bounded-driver
    pattern ann_ivf's k-means sample pinned; vocabulary coverage loss
    from the cutoff is the standard subword-nmt practice;
  - the merge loop itself is O(max_words · n_merges) driver-side
    python over the freq TABLE (not the corpus) — the same shape every
    published BPE trainer uses, because each round's choice needs the
    GLOBAL pair histogram of the previous round's state;
  - encode broadcasts the merge ranks (a few KB) and runs one
    Arrow-batched pass with a per-batch word→tokens memo, so hot words
    (Zipf) encode once per batch, not once per occurrence.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace words — distributed, map-side
    combined, text never shuffles."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe_from_freqs(
    freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Exact BPE merge training over a (word, freq) table. Pure python,
    deterministic (see module docstring for the pinned tie-break)."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], int(f)) for w, f in freqs if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # max count, smallest pair on ties: one min() with negated count
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        ab = a + b
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Standard lowest-rank-first merge loop; left-to-right within a
    round. Deterministic for any rank table."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                pair = (a, b)
        if best_rank is None:
            break
        a, b = pair
        ab = a + b
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [ab]
            else:
                i += 1
    return syms


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    max_words: int = 50000,
) -> list[tuple[str, str]]:
    """Distributed freq count -> bounded deterministic collect ->
    driver-side merge loop. Driver memory is O(max_words), independent
    of corpus size."""
    wf = (
        word_freqs(df, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return train_bpe_from_freqs([(r.word, r.freq) for r in wf], n_merges)


def bpe_encode_df(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """+ array<string> token column. One Arrow-batched pass; per-batch
    word->tokens memo exploits Zipf (hot words encode once per batch)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            if t is not None:
                for w in t.split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = encode_word(w, ranks)
                    toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))
