"""Recrawl scheduling (operators/recrawl.py) vs an independent
dict/loop reference."""

from __future__ import annotations

from jirlbot_spark.operators.recrawl import change_stats, recrawl_priority

LOG = [
    # url 1: changes every fetch
    (1, 0, 100),
    (1, 2, 200),
    (1, 4, 300),
    # url 2: never changes
    (2, 0, 50),
    (2, 1, 50),
    (2, 2, 50),
    (2, 3, 50),
    # url 3: one change, then stable; duplicate row in batch 5
    (3, 1, 7),
    (3, 5, 9),
    (3, 5, 9),
    (3, 9, 9),
    # url 4: fetched once
    (4, 6, 42),
]


def _ref_stats():
    by_url: dict[int, dict[int, int]] = {}
    for u, b, c in LOG:
        by_url.setdefault(u, {})[b] = max(
            c, by_url.get(u, {}).get(b, c)
        )
    out = {}
    for u, obs in by_url.items():
        batches = sorted(obs)
        changes = sum(
            1
            for a, b in zip(batches, batches[1:])
            if obs[a] != obs[b]
        )
        out[u] = (len(batches), changes, batches[0], batches[-1])
    return out


def test_change_stats_matches_reference(spark):
    df = spark.createDataFrame(
        LOG, "url_hash long, batch_id long, content_hash long"
    )
    got = {
        r["url_hash"]: (
            r["n_fetches"],
            r["n_changes"],
            r["first_batch"],
            r["last_batch"],
        )
        for r in change_stats(df).collect()
    }
    assert got == _ref_stats()


def test_priority_exact_rule(spark):
    df = spark.createDataFrame(
        LOG, "url_hash long, batch_id long, content_hash long"
    )
    now, thr = 12, 2
    out = {
        r["url_hash"]: r
        for r in recrawl_priority(change_stats(df), now, thr).collect()
    }
    ref = _ref_stats()
    for u, (n, x, _, last) in ref.items():
        age = now - last
        num, den = age * (2 * x + 1), 2 * n + 1
        r = out[u]
        assert (r["age"], r["score_num"], r["score_den"]) == (
            age,
            num,
            den,
        )
        assert r["score"] == num / den
        assert r["due"] == (num >= thr * den)
    # semantics: the always-changing url out-scores the never-changing
    assert out[1]["score"] > out[2]["score"]
    # smoothing: never-changed still has positive score (no starvation)
    assert out[2]["score"] > 0


def test_priority_partition_invariant(spark):
    df = spark.createDataFrame(
        LOG, "url_hash long, batch_id long, content_hash long"
    )
    a = sorted(
        map(tuple, recrawl_priority(change_stats(df), 20, 3).collect())
    )
    b = sorted(
        map(
            tuple,
            recrawl_priority(
                change_stats(df.repartition(7)), 20, 3
            ).collect(),
        )
    )
    assert a == b
