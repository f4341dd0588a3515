from __future__ import annotations

import random

from jirlbot_spark.operators.repetition import repetition_stats


def _ref_stats(docs, top_ns, dup_ns):
    """Independent pure-Python replication of the pinned definitions
    (dict/loop formulation, gram = joined string)."""
    out = {}
    for doc_id, text in docs:
        t = text.split()
        total = len(" ".join(t))
        row = {"total_chars": total}
        for n in sorted(set(top_ns) | set(dup_ns)):
            counts = {}
            for i in range(len(t) - n + 1):
                g = " ".join(t[i : i + n])
                counts[g] = counts.get(g, 0) + 1
            top = max(
                (c * len(g) for g, c in counts.items()), default=0
            )
            dup = sum(c * len(g) for g, c in counts.items() if c >= 2)
            if n in top_ns:
                row[f"top{n}_frac"] = top / total if total else 0.0
            if n in dup_ns:
                row[f"dup{n}_frac"] = dup / total if total else 0.0
        out[doc_id] = row
    return out


def test_repetition_matches_reference(spark):
    rng = random.Random(3)
    words = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 40))))
        for i in range(30)
    ]
    docs += [
        (100, "spam spam spam spam spam spam"),
        (101, "a b c d e f g a b c d e f g a b c d e f g"),
        (102, ""),
        (103, "single"),
        (104, "two tokens"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    res = repetition_stats(d, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10))
    got = {r["doc_id"]: r.asDict() for r in res.collect()}
    want = _ref_stats(docs, (2, 3, 4), (5, 6, 7, 8, 9, 10))
    assert set(got) == set(want)
    for doc_id, wrow in want.items():
        grow = got[doc_id]
        assert grow["total_chars"] == wrow["total_chars"], doc_id
        for k, v in wrow.items():
            if k == "total_chars":
                continue
            assert grow[k] == v, (doc_id, k, grow[k], v)
    # sanity on the crafted rows: pure repetition saturates the dup fracs
    assert got[100]["dup5_frac"] > 0.9
    assert got[101]["dup7_frac"] > 0.9
    assert got[102]["total_chars"] == 0 and got[102]["top2_frac"] == 0.0
    assert got[103]["top2_frac"] == 0.0
    # a clean (non-repeating) doc scores 0 duplicated-gram coverage
    assert got[101]["top2_frac"] > 0.0


def test_repetition_whitespace_normalization(spark):
    """Multi-space / tab variants tokenize identically to single-spaced."""
    d = spark.createDataFrame(
        [(1, "x y  z\tx y"), (2, "x y z x y")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.asDict() for r in repetition_stats(d).collect()}
    a, b = rows[1], rows[2]
    a.pop("doc_id"), b.pop("doc_id")
    assert a == b
