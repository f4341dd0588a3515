"""text_dup_groups (operators/text_dedup.py): transitive MinHash
near-dup clusters with canonical keepers, checked against an
independent pure-Python exact-Jaccard + union-find reference.
"""

from __future__ import annotations

from jirlbot_spark.operators.text_dedup import text_dup_groups

BASE = "the quick brown fox jumps over the lazy dog again and again ok"
DOCS = [
    (1, BASE),
    (2, BASE + " extra"),  # near-dup of 1
    (3, BASE + " extra tail"),  # near-dup of 2 (chains to 1 transitively)
    (4, "completely different words about spark shuffles and joins"),
    (5, "completely different words about spark shuffles and joins"),
    (6, "an unrelated singleton document with its own vocabulary here"),
    (7, ""),
]


def _shingles(text: str, k=3) -> set[tuple[str, ...]]:
    t = [w for w in text.strip().split() if w]
    return {tuple(t[i : i + k]) for i in range(len(t) - k + 1)}


def _ref_components(threshold=0.8):
    sh = {i: _shingles(t) for i, t in DOCS}
    parent = {i: i for i, _ in DOCS}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = [i for i, _ in DOCS]
    for a in ids:
        for b in ids:
            if a < b and sh[a] and sh[b]:
                inter = len(sh[a] & sh[b])
                j = inter / (len(sh[a]) + len(sh[b]) - inter)
                if j >= threshold:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_groups_match_union_find_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in text_dup_groups(df, bands=16).collect()
    }
    ref = _ref_components()
    assert len(got) == len(DOCS)
    for i, comp in ref.items():
        assert got[i] == (comp, i == comp), i
    # the planted chain collapsed transitively
    assert got[1][0] == got[2][0] == got[3][0] == 1
    assert got[4][0] == got[5][0] == 4
    assert got[6] == (6, True)
    assert got[7] == (7, True)


def test_groups_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, text_dup_groups(df, bands=16).collect()))
    b = sorted(
        map(tuple, text_dup_groups(df.repartition(5), bands=16).collect())
    )
    assert a == b
