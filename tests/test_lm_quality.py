"""Bigram-LM quality scoring (operators/lm_quality.py).

Independent reference: the pinned LM (tokenize, bounded vocab with the
(freq desc, token asc) tie rule, add-one estimates, int64 quantization,
scoring with fallback) re-implemented here in pure Python.
"""

from __future__ import annotations

import math
import re

from jirlbot_spark.operators.lm_quality import lm_score, train_bigram_lm

SCALE = 10**6

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "the cat ran to the dog"),
]
DOCS = [
    (10, "the cat sat on the rug"),  # reference-like
    (11, "zebra quark flux bogon"),  # all OOV
    (12, "the the the the"),
    (13, ""),  # no tokens
    (14, "single"),  # no bigrams
    (15, "cat on mat"),
]


def _py_lm(ref, max_vocab, max_bigrams):
    toks = {i: re.split(r"\s+", t.strip()) if t.strip() else [] for i, t in ref}
    freq: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    vocab = [
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:max_vocab]
    wid = {t: i + 1 for i, t in enumerate(vocab)}
    V = len(vocab) + 1
    c1: dict[int, int] = {}
    c12: dict[tuple[int, int], int] = {}
    for ts in toks.values():
        ids = [wid.get(t, 0) for t in ts]
        for a, b in zip(ids, ids[1:]):
            c1[a] = c1.get(a, 0) + 1
            c12[(a, b)] = c12.get((a, b), 0) + 1
    top = sorted(c12.items(), key=lambda kv: (-kv[1], kv[0]))[:max_bigrams]
    q_bi = {
        k: round(SCALE * math.log((c + 1) / (c1[k[0]] + V))) for k, c in top
    }
    q0 = [round(SCALE * math.log(1.0 / (c1.get(w, 0) + V))) for w in range(V)]
    return wid, q_bi, q0


def _py_score(docs, wid, q_bi, q0):
    out = {}
    for i, t in docs:
        ts = re.split(r"\s+", t.strip()) if t.strip() else []
        ids = [wid.get(x, 0) for x in ts]
        pairs = list(zip(ids, ids[1:]))
        s = sum(q_bi.get(p, q0[p[0]]) for p in pairs)
        n = len(pairs)
        out[i] = (n, s, 0.0 if n == 0 else -s / (n * SCALE))
    return out


def _run(spark, max_vocab=100, max_bigrams=1000):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    lm = train_bigram_lm(
        ref, max_vocab=max_vocab, max_bigrams=max_bigrams, scale=SCALE
    )
    return lm, {
        r["doc_id"]: (r["n_bigrams"], r["logp_q"], r["avg_nll"])
        for r in lm_score(docs, lm).collect()
    }


def test_matches_independent_reference(spark):
    lm, got = _run(spark)
    wid, q_bi, q0 = _py_lm(REF, 100, 1000)
    assert {t: i + 1 for i, t in enumerate(lm.vocab)} == wid
    assert lm.q_bi == q_bi and lm.q0 == q0
    assert got == _py_score(DOCS, wid, q_bi, q0)


def test_reference_like_scores_better(spark):
    _, got = _run(spark)
    nll = {i: got[i][2] for i in got}
    assert nll[10] < nll[11], nll
    assert got[13] == (0, 0, 0.0)
    assert got[14] == (0, 0, 0.0)


def test_bigram_cap_falls_back(spark):
    lm, got = _run(spark, max_bigrams=1)
    assert len(lm.q_bi) == 1
    wid, q_bi, q0 = _py_lm(REF, 100, 1)
    assert got == _py_score(DOCS, wid, q_bi, q0)


def test_partitioning_invariance(spark):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    lm = train_bigram_lm(ref, max_vocab=50, max_bigrams=100, scale=SCALE)
    a = sorted(map(tuple, lm_score(docs.repartition(7), lm).collect()))
    b = sorted(map(tuple, lm_score(docs.coalesce(1), lm).collect()))
    assert a == b
