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
