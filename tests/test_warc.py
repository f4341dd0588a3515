"""WARC connector: round-trip, spec framing, wild/corrupt handling."""

from __future__ import annotations

import gzip
import io
import zlib

import pytest
from pyspark.sql import functions as F

from jirlbot_spark.sources.warc import (
    build_record,
    build_response_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

ROWS = [
    ("http://a.com/x", 200, "text/html", b"<html>alpha</html>"),
    ("http://a.com/y", 404, "text/plain", b"gone"),
    ("http://b.com/img", 200, "image/png", bytes(range(256))),
    ("http://c.com/empty", 200, "text/plain", b""),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "url string, status long, content_type string, body binary"
    )


def test_roundtrip_through_spark(spark, tmp_path):
    out_dir = str(tmp_path / "warc")
    manifest = write_warc(_df(spark).repartition(2), out_dir).collect()
    assert sum(m.n_records for m in manifest) == len(ROWS)
    back = read_warc(spark, out_dir).collect()
    got = sorted(
        (r.target_uri, r.status, r.content_type, bytes(r.payload))
        for r in back
    )
    assert got == sorted(
        (u, s, ct, b) for u, s, ct, b in ROWS
    )
    assert all(r.record_type == "response" for r in back)


def test_gz_members_are_independent(spark, tmp_path):
    """Spec seekability: every record its own gzip member — stdlib gzip
    (an independent reader) must walk all members; member count must
    equal record count."""
    out_dir = str(tmp_path / "warc")
    files = [
        m.file for m in write_warc(_df(spark).coalesce(1), out_dir).collect()
    ]
    raw = open(files[0], "rb").read()
    # stdlib multi-member read
    full = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
    assert full.count(b"WARC/1.0\r\n") == len(ROWS)
    members = 0
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        d.decompress(raw[pos:])
        assert d.eof
        members += 1
        pos = len(raw) - pos - len(d.unused_data) + pos
    assert members == len(ROWS)


def test_deterministic_bytes(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_warc(_df(spark).coalesce(1), a).collect()
    write_warc(_df(spark).coalesce(1), b).collect()
    fa = open(a + "/part-00000.warc.gz", "rb").read()
    fb = open(b + "/part-00000.warc.gz", "rb").read()
    assert fa == fb  # re-export forks nothing (gzip mtime pinned)


def test_parse_plain_and_non_response_records():
    info = build_record(
        "warcinfo",
        b"software: jirlbot-spark\r\n",
        content_type="application/warc-fields",
    )
    resp = build_response_record("http://w.com/", 200, "text/html", b"hi")
    recs = parse_warc_bytes(info + resp, src="f")
    assert [r["record_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[0]["payload"] == b"software: jirlbot-spark\r\n"
    assert recs[0]["status"] is None
    assert recs[1]["status"] == 200 and recs[1]["payload"] == b"hi"


def test_corrupt_and_bomb_end_walk_cleanly():
    good = build_response_record("http://w.com/1", 200, "t", b"one")
    # record claiming more content than shipped
    bad = good.replace(b"Content-Length: ", b"Content-Length: 9")
    recs = parse_warc_bytes(good + bad)
    assert len(recs) == 1  # good record parsed, bad one ends the walk
    # truncated gzip member after a good member
    from jirlbot_spark.sources.warc import _gzip_member

    blob = _gzip_member(good) + _gzip_member(good)[:20]
    recs = parse_warc_bytes(blob)
    assert len(recs) == 1
    # garbage entirely
    assert parse_warc_bytes(b"\x00" * 64) == []
    assert parse_warc_bytes(b"") == []


def test_http_headers_parsed_multi_header():
    body = b"payload-bytes"
    http = (
        b"HTTP/1.1 301 Moved Permanently\r\n"
        b"Location: http://new/\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n\r\n" + body
    )
    rec = build_record(
        "response",
        http,
        target_uri="http://old/",
        content_type="application/http;msgtype=response",
    )
    (r,) = parse_warc_bytes(rec)
    assert r["status"] == 301
    assert r["content_type"] == "text/html; charset=utf-8"
    assert r["payload"] == body
