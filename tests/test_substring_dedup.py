"""Corpus-level duplicated-substring removal (operators/substring_dedup).

The algorithmic reference here is a SEPARATELY-WRITTEN naive O(n·m)
implementation (dict of window-string occurrences, explicit span union)
— no hashing, no Spark, no shared kernel — so agreement certifies the
distributed pipeline's window extraction, canonical-keep rule, island
merge, and token strip independently of the engine code, the same
pattern test_bpe.py uses for the BPE trainer. Semantics pinned to
Lee et al. 2021 (suffix-array training-data dedup): any >=k-token run
occurring more than once corpus-wide survives only at its canonical
(min doc_id, min pos) occurrence.
"""

from __future__ import annotations

import random

import pytest

from jirlbot_spark.operators.substring_dedup import (
    dedup_substrings,
    duplicated_window_spans,
)


def naive_dedup(docs: list[tuple[int, str]], k: int) -> dict[int, tuple]:
    """Independent reference: returns {doc_id: (clean_text, n_tokens,
    n_removed)}. Windows are token STRINGS; canonical copy = first in
    (doc_id, pos) order; removal set = union of duplicated windows'
    [pos, pos+k) token index ranges."""
    toks = {d: t.strip().split() if t.strip() else [""] for d, t in docs}
    # Spark's split(trim(x), '\s+') on blank text yields [""]
    occs: dict[tuple, list[tuple[int, int]]] = {}
    for d, t in sorted(toks.items()):
        for p in range(len(t) - k + 1):
            occs.setdefault(tuple(t[p : p + k]), []).append((d, p))
    remove: dict[int, set[int]] = {d: set() for d in toks}
    for w, lst in occs.items():
        if len(lst) < 2:
            continue
        for d, p in sorted(lst)[1:]:  # all but canonical
            remove[d].update(range(p, p + k))
    out = {}
    for d, t in toks.items():
        kept = [tok for i, tok in enumerate(t) if i not in remove[d]]
        out[d] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


def _run(spark, rows: list[tuple[int, str]], k: int):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in dedup_substrings(df, k=k).collect()
    }
    return got


def test_shared_run_keeps_canonical_copy(spark):
    shared = "the quick brown fox jumps over the lazy dog again"  # 10 toks
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"unrelated words here {shared} trailing tail tokens"),
        (3, f"{shared} leading position this time"),
    ]
    got = _run(spark, rows, k=8)
    ref = naive_dedup(rows, k=8)
    assert got == ref
    # canonical copy lives in doc 1 (min doc_id): untouched
    assert got[1][2] == 0 and shared in got[1][0]
    # every other occurrence is fully removed
    assert shared not in got[2][0] and shared not in got[3][0]
    assert got[2][2] == 10 and got[3][2] == 10


def test_overlapping_spans_merge(spark):
    # two duplicated 8-windows overlapping by 4 tokens in doc 20 →
    # one merged span, each source run kept once in its own canon doc
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "a5 a6 a7 a8 b5 b6 b7 b8"
    rows = [
        (10, f"x {a} y"),
        (11, f"p {b} q"),
        (20, f"m1 m2 {a} b5 b6 b7 b8 m3"),  # carries a then b-overlap
    ]
    got = _run(spark, rows, k=8)
    assert got == naive_dedup(rows, k=8)
    spans = {
        (r.span_start, r.span_end)
        for r in duplicated_window_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]), k=8
        )
        .where("doc_id = 20")
        .collect()
    }
    assert len(spans) == 1  # merged into a single island


def test_short_and_blank_docs_untouched(spark):
    rows = [
        (1, "only three tokens"),
        (2, "only three tokens"),  # dup doc but < k → no windows
        (3, "   "),
        (4, "a b c d e f g h"),  # exactly k, unique
    ]
    got = _run(spark, rows, k=8)
    assert got == naive_dedup(rows, k=8)
    assert all(v[2] == 0 for v in got.values())


def test_randomized_vs_naive_and_partition_invariance(spark):
    rng = random.Random(1311)
    vocab = [f"w{i}" for i in range(30)]
    boiler = " ".join(rng.choice(vocab) for _ in range(12))
    rows = []
    for d in range(40):
        n = rng.randrange(0, 25)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.4 and n >= 4:
            at = rng.randrange(0, n)
            words[at:at] = boiler.split()
        rows.append((d, " ".join(words)))
    ref = naive_dedup(rows, k=6)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for parts in (1, 7):
        got = {
            r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
            for r in dedup_substrings(df.repartition(parts), k=6).collect()
        }
        assert got == ref


def test_within_doc_repetition(spark):
    # the SAME doc repeating a run twice: second occurrence removed
    run = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [(5, f"{run} middle filler words {run} tail")]
    got = _run(spark, rows, k=8)
    assert got == naive_dedup(rows, k=8)
    assert got[5][2] == 8
    assert got[5][0].count("r1") == 1


@pytest.mark.parametrize("k", [2, 5])
def test_small_k(spark, k):
    rows = [
        (1, "to be or not to be that is the question"),
        (2, "to be or not to be whatever comes next here"),
    ]
    got = _run(spark, rows, k=k)
    assert got == naive_dedup(rows, k=k)
