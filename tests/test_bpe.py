"""BPE tokenizer (functions/bpe.py): the Sennrich paper's worked
example, an independent naive re-implementation cross-check,
training/encode consistency, roundtrip, and the distributed paths."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from jirlbot_spark.functions.bpe import (
    END,
    bpe_encode_df,
    bpe_train,
    encode_word,
    train_bpe_from_freqs,
    word_freqs,
)

# the classic corpus from Sennrich et al. 2016 §3.2
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_worked_example():
    """Hand-computed first merges for the paper's corpus with an
    explicit </w> symbol: es(9) -> est(9) -> est</w>(9) -> lo(7) ->
    low(7) ... (ties broken lexicographically smallest)."""
    merges = train_bpe_from_freqs(SENNRICH, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_matches_independent_naive_reference():
    """Re-derive the merge sequence with a SEPARATE implementation
    (dict-of-tuples state, Counter recomputed from scratch, regex-free)
    and compare on a messier corpus."""
    corpus = [
        ("banana", 9),
        ("bandana", 4),
        ("ban", 7),
        ("anna", 3),
        ("nab", 2),
        ("a", 11),
    ]

    def naive(freqs, n):
        state = {w: tuple(w) + (END,) for w, _ in freqs}
        fr = dict(freqs)
        out = []
        for _ in range(n):
            c = Counter()
            for w, syms in state.items():
                for i in range(len(syms) - 1):
                    c[syms[i], syms[i + 1]] += fr[w]
            if not c:
                break
            n_best = max(c.values())
            if n_best < 2:
                break
            pair = min(p for p, v in c.items() if v == n_best)
            out.append(pair)
            a, b = pair
            nxt = {}
            for w, syms in state.items():
                acc = []
                i = 0
                while i < len(syms):
                    if (
                        i < len(syms) - 1
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        acc.append(a + b)
                        i += 2
                    else:
                        acc.append(syms[i])
                        i += 1
                nxt[w] = tuple(acc)
            state = nxt
        return out

    for n in (1, 3, 8, 20):
        assert train_bpe_from_freqs(corpus, n) == naive(corpus, n), n


def test_encode_reproduces_training_segmentation():
    """For every training word, the rank-loop encode must equal the
    segmentation training itself produced (re-derived by replaying
    merges over the word — the property GPT-2-style encoders rely on)."""
    corpus = [("banana", 9), ("bandana", 4), ("ban", 7), ("anna", 3)]
    merges = train_bpe_from_freqs(corpus, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in corpus:
        syms = list(w) + [END]
        for a, b in merges:  # replay in training order
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        assert encode_word(w, ranks) == syms, w


def test_roundtrip_and_unseen_words():
    merges = train_bpe_from_freqs(SENNRICH, 5)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lowest", "newer", "slow", "zzz", "wid"):
        toks = encode_word(w, ranks)
        assert "".join(toks).replace(END, "") == w
        assert toks[-1].endswith(END) or toks[-1] == END


def test_stop_at_singleton_pairs():
    # every pair unique -> nothing to merge after count-1 pairs remain
    merges = train_bpe_from_freqs([("abcd", 1)], 50)
    assert merges == []


def test_word_freqs_distributed_and_partition_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a b a  c"), (2, "b a"), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    want = {"a": 3, "b": 2, "c": 1}
    for frame in (df, df.repartition(7)):
        got = {r.word: r.freq for r in word_freqs(frame).collect()}
        assert got == want


def test_bpe_encode_df_matches_scalar(spark):
    from jirlbot_spark.sources.fixtures import gen_documents

    pdf = gen_documents(31, 40)
    df = spark.createDataFrame(pdf)
    merges = bpe_train(df, n_merges=30)
    assert len(merges) == 30
    out = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode_df(df, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for _, row in pdf.iterrows():
        want = []
        for w in row.text.split():
            want.extend(encode_word(w, ranks))
        assert out[row.doc_id] == want, row.doc_id
