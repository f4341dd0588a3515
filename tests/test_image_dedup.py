"""pHash near-dup operator tests (operators/image_dedup.py).

The O(n²) reference here is computed independently in numpy (XOR +
popcount over the full pair matrix), so a green run asserts both the
banded join's arithmetic and its pigeonhole recall — the same style of
check the dedup_simhash golden uses, but executed live.
"""

from __future__ import annotations

import numpy as np
import pytest

from jirlbot_spark.operators.image_dedup import phash_canonical, phash_neardup
from jirlbot_spark.sources.fixtures import gen_phash_corpus


def _exact_pairs(df, max_hamming: int) -> set:
    ph = df["phash"].to_numpy().astype(np.uint64)
    ids = df["image_id"].tolist()
    x = ph[:, None] ^ ph[None, :]
    ham = np.zeros(x.shape, np.int64)
    v = x.copy()
    for _ in range(64):
        ham += (v & 1).astype(np.int64)
        v >>= np.uint64(1)
    out = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and ham[i, j] <= max_hamming:
                out.add((ids[i], ids[j], int(ham[i, j])))
    return out


def test_neardup_matches_exact_reference(spark):
    corpus = gen_phash_corpus(17, 160)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup(
            spark.createDataFrame(corpus), max_hamming=7
        ).collect()
    }
    assert got == _exact_pairs(corpus, 7)
    assert got  # the fixture plants pairs; an empty green would be vacuous


def test_neardup_tighter_band_and_blocks(spark):
    corpus = gen_phash_corpus(5, 96)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_neardup(
            spark.createDataFrame(corpus), max_hamming=3, block_bits=16
        ).collect()
    }
    assert got == _exact_pairs(corpus, 3)


def test_recall_bound_enforced(spark):
    df = spark.createDataFrame(gen_phash_corpus(1, 8))
    with pytest.raises(ValueError):
        phash_neardup(df, max_hamming=8, block_bits=8)  # 8 blocks -> d<=7
    with pytest.raises(ValueError):
        phash_neardup(df, block_bits=12)  # must divide 64


def test_canonical_assignment(spark):
    corpus = gen_phash_corpus(17, 64)
    got = {
        (r.image_id, r.canonical_id)
        for r in phash_canonical(spark.createDataFrame(corpus)).collect()
    }
    by_hash: dict = {}
    for i, p in zip(corpus["image_id"], corpus["phash"]):
        by_hash.setdefault(int(p), []).append(i)
    expected = {
        (i, min(ids)) for ids in by_hash.values() for i in ids
    }
    assert got == expected
    # exact-duplicate groups exist in the fixture and share a canonical
    assert any(a != b for a, b in got)


def test_plan_no_cartesian(spark):
    """The banded join must never degrade to a cartesian product."""
    df = spark.createDataFrame(gen_phash_corpus(3, 64))
    plan = phash_neardup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _ref_consistency(rows):
    """Independent dict/loop reference over raw caption strings."""
    from collections import defaultdict

    cap_imgs, cap_pairs, img_caps = (
        defaultdict(set),
        defaultdict(int),
        defaultdict(set),
    )
    for _, cap, ph in rows:
        cap_imgs[cap].add(ph)
        cap_pairs[cap] += 1
        img_caps[ph].add(cap)
    return {
        iid: (
            len(cap_imgs[cap]),
            cap_pairs[cap],
            len(img_caps[ph]),
            len(cap_imgs[cap]) > 1,
            len(img_caps[ph]) > 1,
        )
        for iid, cap, ph in rows
    }


def test_caption_consistency_matches_reference(spark):
    from jirlbot_spark.operators.image_dedup import caption_consistency
    from jirlbot_spark.sources.fixtures import gen_caption_corpus

    corpus = gen_caption_corpus(23, 120)
    rows = list(corpus.itertuples(index=False, name=None))
    df = spark.createDataFrame(
        corpus, "image_id string, caption string, phash long"
    ).repartition(7)
    got = {
        r.image_id: (
            r.images_per_caption,
            r.pairs_per_caption,
            r.captions_per_image,
            r.boilerplate_caption,
            r.divergent_caption,
        )
        for r in caption_consistency(df).collect()
    }
    assert got == _ref_consistency(rows)
    # the engineered defects actually appear
    assert any(v[3] for v in got.values()), "no boilerplate rows"
    assert any(v[4] for v in got.values()), "no divergent rows"
    assert any(not v[3] and not v[4] for v in got.values()), "no clean rows"


def test_caption_consistency_hand_cases(spark):
    from jirlbot_spark.operators.image_dedup import caption_consistency

    rows = [
        ("a", "photo", 1),       # boilerplate: "photo" spans phash 1,2
        ("b", "photo", 2),
        ("c", "unique cat", 3),  # clean
        ("d", "cat on mat", 4),  # divergent: phash 4 has 2 captions
        ("e", "a cat sitting", 4),
        ("f", "same pair", 5),   # exact dup pair: same caption+phash
        ("g", "same pair", 5),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, caption string, phash long"
    )
    got = {r.image_id: r for r in caption_consistency(df).collect()}
    assert got["a"].boilerplate_caption and got["b"].boilerplate_caption
    assert not got["a"].divergent_caption
    assert not got["c"].boilerplate_caption
    assert not got["c"].divergent_caption
    assert got["d"].divergent_caption and got["e"].divergent_caption
    assert not got["d"].boilerplate_caption
    # exact dup pair: 2 rows, 1 image, 1 caption -> neither flag
    assert got["f"].pairs_per_caption == 2
    assert not got["f"].boilerplate_caption
    assert not got["f"].divergent_caption


def test_image_pair_filter_rules(spark):
    from jirlbot_spark.operators.image_dedup import image_pair_filter

    rows = [
        # (id, w, h, caption)
        ("good", 128, 128, "a clear photo of a dog"),
        ("tiny", 32, 128, "a clear photo of a dog"),
        ("sliver", 640, 100, "a clear photo of a dog"),
        ("nocap", 128, 128, None),
        ("blankcap", 128, 128, "   "),
        ("shortcap", 128, 128, "dog photo"),
        ("longcap", 128, 128, "x" * 600),
        ("zero", 0, 0, "a clear photo of a dog"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, caption string"
    )
    got = {r.image_id: r for r in image_pair_filter(df).collect()}
    assert got["good"].keep
    assert not got["tiny"].ok_size and not got["tiny"].keep
    assert not got["sliver"].ok_aspect and got["sliver"].ok_size
    assert not got["nocap"].ok_caption
    assert not got["blankcap"].ok_caption
    assert not got["shortcap"].ok_caption  # 2 words < 3
    assert not got["longcap"].ok_caption
    # zero dims fail size and do NOT divide by zero in aspect
    assert not got["zero"].ok_size


def test_image_dup_groups_matches_union_find(spark):
    """image_dup_groups vs an independent union-find closure over the
    naive O(n²) Hamming pair set."""
    import numpy as np

    from jirlbot_spark.operators.image_dedup import image_dup_groups
    from jirlbot_spark.sources.fixtures import gen_phash_corpus

    corpus = gen_phash_corpus(17, 96)
    ids = list(corpus["image_id"])
    hashes = [int(h) for h in corpus["phash"]]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 7:
                ra, rb = find(ids[a]), find(ids[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}
    df = spark.createDataFrame(corpus)
    got = {
        r["image_id"]: (r["component"], r["keep"])
        for r in image_dup_groups(df).collect()
    }
    assert len(got) == len(ids)
    for i in ids:
        assert got[i] == (want[i], want[i] == i), (i, got[i], want[i])
    # fixture engineering guarantees real multi-member groups exist
    assert sum(1 for i in ids if not got[i][1]) > 5
