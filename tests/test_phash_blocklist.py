"""pHash blocklist matching (operators/image_dedup.py phash_blocklist):
pigeonhole recall, exact verify, deterministic tie-break — against an
independent brute-force python reference.
"""

from __future__ import annotations

import pytest

from jirlbot_spark.operators.image_dedup import phash_blocklist
from jirlbot_spark.sources.fixtures import gen_phash_corpus


def _flip(x: int, bits: tuple[int, ...]) -> int:
    for b in bits:
        x ^= 1 << b
    # keep in signed-int64 range
    return x - (1 << 64) if x >= 1 << 63 else x


def _ref(corpus, blocklist, max_hamming):
    out = {}
    for iid, ph in corpus:
        hits = [
            (bin((ph ^ bp) & ((1 << 64) - 1)).count("1"), bp)
            for bp in blocklist
        ]
        hits = [h for h in hits if h[0] <= max_hamming]
        out[iid] = min(hits) if hits else None
    return out


def test_blocklist_matches_bruteforce(spark):
    pdf = gen_phash_corpus(29, 200)
    corpus = list(zip(pdf["image_id"], (int(p) for p in pdf["phash"])))
    # plant: exact hit, 3-bit hit, 7-bit hit (recall edge), 8-bit miss
    base = [int(p) for p in pdf["phash"][:4]]
    blocklist = [
        base[0],
        _flip(base[1], (1, 17, 33)),
        _flip(base[2], (0, 9, 18, 27, 36, 45, 54)),
        _flip(base[3], tuple(range(0, 64, 8))),
        7777777777,
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in corpus], "image_id string, phash long"
    )
    bdf = spark.createDataFrame(
        [(b,) for b in blocklist], "bad_phash long"
    )
    got = {
        r["image_id"]: (
            (r["best_hamming"], r["matched_phash"]) if r["matched"] else None
        )
        for r in phash_blocklist(df, bdf).collect()
    }
    ref = _ref(corpus, blocklist, 7)
    assert len(got) == len(corpus)
    for iid, want in ref.items():
        assert got[iid] == want, iid
    # the planted rows behave as designed
    ids = list(pdf["image_id"][:4])
    assert got[ids[0]] == (0, base[0])
    assert got[ids[1]][0] == 3
    assert got[ids[2]][0] == 7
    # 8 flipped bits is beyond the recall bound -> must NOT match
    assert got[ids[3]] is None or got[ids[3]][0] <= 7


def test_blocklist_rejects_bad_hamming(spark):
    df = spark.createDataFrame([("a", 1)], "image_id string, phash long")
    bdf = spark.createDataFrame([(1,)], "bad_phash long")
    with pytest.raises(ValueError):
        phash_blocklist(df, bdf, max_hamming=8)


def test_blocklist_no_corpus_shuffle(spark):
    """The corpus-side probes must meet the blocklist via broadcast —
    the only hash exchanges allowed are the distinct() collapse and the
    small post-verify agg, never a corpus-vs-blocklist shuffle join."""
    df = spark.createDataFrame(
        [(f"i{k}", k * 999983) for k in range(50)],
        "image_id string, phash long",
    )
    bdf = spark.createDataFrame([(42,)], "bad_phash long")
    out = phash_blocklist(df, bdf)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
