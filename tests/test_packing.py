from __future__ import annotations

import random

from jirlbot_spark.operators.packing import pack_sequences


def _ref_pack(docs, window, n_shards):
    """Independent dict/loop reference of the pinned packing layout."""
    out = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        n = len(text.split()) if text.strip() else 0
        by_shard.setdefault(doc_id % n_shards, []).append((doc_id, n))
    for shard, rows in by_shard.items():
        pos = 0
        for doc_id, n in sorted(rows):
            out[doc_id] = (n, shard, pos, pos // window, pos % window)
            pos += n
    return out


def test_pack_sequences_matches_reference(spark):
    rng = random.Random(5)
    docs = [
        (i, " ".join(f"t{j}" for j in range(rng.randint(0, 30))))
        for i in range(200)
    ]
    docs += [(500, ""), (501, "   "), (502, "one")]
    d = spark.createDataFrame(docs, "doc_id long, text string").repartition(9)
    got = {
        r.doc_id: (r.n_tokens, r.shard, r.start_token, r.pack_id, r.offset)
        for r in pack_sequences(d, window=16, n_shards=4).collect()
    }
    assert got == _ref_pack(docs, 16, 4)


def test_pack_sequences_stream_properties(spark):
    """Within a shard, starts are contiguous (no gaps, no overlap) and
    the layout is invariant to input partitioning."""
    docs = [(i, " ".join(["w"] * (i % 7))) for i in range(60)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    a = pack_sequences(d, window=10, n_shards=3).collect()
    b = pack_sequences(d.repartition(11), window=10, n_shards=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rows:
            assert r.start_token == pos
            assert r.pack_id == pos // 10
            assert r.offset == pos % 10
            pos += r.n_tokens


def test_pack_shuffled_order(spark):
    """shuffle_seed: a permutation of the same stream — same totals,
    different order, deterministic under repartitioning, seed-dependent."""
    from pyspark.sql import functions as F

    from jirlbot_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (1 + i % 7)) for i in range(60)],
        "doc_id long, text string",
    )
    plain = pack_sequences(docs, window=16, n_shards=4)
    shuf = pack_sequences(docs, window=16, n_shards=4, shuffle_seed=9)
    p = {r["doc_id"]: r for r in plain.collect()}
    s = {r["doc_id"]: r for r in shuf.collect()}
    # same shards and token counts; per-shard stream length preserved
    assert all(
        (p[i]["shard"], p[i]["n_tokens"]) == (s[i]["shard"], s[i]["n_tokens"])
        for i in p
    )
    for sh in range(4):
        tot_p = sum(r["n_tokens"] for r in p.values() if r["shard"] == sh)
        ends_s = [
            r["start_token"] + r["n_tokens"]
            for r in s.values()
            if r["shard"] == sh
        ]
        assert max(ends_s) == tot_p
    # the order actually changed somewhere
    assert any(p[i]["start_token"] != s[i]["start_token"] for i in p)
    # deterministic under repartitioning
    s2 = {
        r["doc_id"]: r["start_token"]
        for r in pack_sequences(
            docs.repartition(7), window=16, n_shards=4, shuffle_seed=9
        ).collect()
    }
    assert s2 == {i: r["start_token"] for i, r in s.items()}
    # a different seed gives a different epoch order
    s3 = {
        r["doc_id"]: r["start_token"]
        for r in pack_sequences(
            docs, window=16, n_shards=4, shuffle_seed=10
        ).collect()
    }
    assert s3 != s2
