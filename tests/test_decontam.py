from __future__ import annotations

from jirlbot_spark.operators.decontam import ngram_decontaminate


def _ref_decontam(docs, bench, k):
    """Independent pure-Python reference: gram = tuple of k tokens."""
    def grams(text):
        t = text.split()
        return {tuple(t[i : i + k]) for i in range(len(t) - k + 1)}

    bset = set()
    for _, text in bench:
        bset |= grams(text)
    out = {}
    for doc_id, text in docs:
        g = grams(text)
        hit = len(g & bset)
        out[doc_id] = (len(g), hit, hit > 0)
    return out


def test_decontaminate_matches_reference(spark):
    bench = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "pack my box with five dozen liquor jugs again folks"),
    ]
    docs = [
        # contains a full 5-gram from bench doc 100
        (1, "intro words then the quick brown fox jumps and more trailing"),
        # shares only 4-gram runs -> clean at k=5
        (2, "the quick brown fox sleeps over the lazy dog today"),
        # shorter than k -> 0 grams
        (3, "tiny doc here"),
        # exact copy of a benchmark doc
        (4, "pack my box with five dozen liquor jugs again folks"),
        # no overlap at all
        (5, "completely unrelated text with no shared runs anywhere at all"),
        # multiple whitespace must tokenize like single spaces
        (6, "intro   words\tthen the  quick brown fox jumps and more"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    b = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_hit, r.contaminated)
        for r in ngram_decontaminate(d, b, k=5).collect()
    }
    want = _ref_decontam(
        [(i, t) for i, t in docs], bench, 5
    )
    assert got == want
    assert got[1][2] and got[4][2] and got[6][2]
    assert not got[2][2] and not got[3][2] and not got[5][2]
    assert got[3][0] == 0


def test_decontaminate_broadcast_off_equivalent(spark):
    docs = [(i, f"w{i} common run of tokens here plus w{i + 1} tail") for i in range(40)]
    bench = [(900, "common run of tokens here plus")]
    d = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    b = spark.createDataFrame(bench, "doc_id long, text string")
    a = ngram_decontaminate(d, b, k=6, broadcast_benchmark=True)
    c = ngram_decontaminate(d, b, k=6, broadcast_benchmark=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))
    # every doc embeds the 6-gram "common run of tokens here plus"
    assert all(r.contaminated for r in a.collect())
