"""rel=canonical extraction (operators/canonical.py)."""

from __future__ import annotations

from jirlbot_spark.operators.canonical import extract_canonical

PAGES = [
    # rel-then-href
    (
        "http://ca-a.com/page?utm=1",
        b'<html><head><link rel="canonical" href="http://ca-a.com/page">'
        b"</head><body>x</body></html>",
    ),
    # href-then-rel, single quotes, relative href
    (
        "http://ca-b.com/dir/leaf",
        b"<head><link href='../top' rel='canonical'></head>",
    ),
    # self-canonical
    (
        "http://ca-c.com/self",
        b'<link rel="canonical" href="http://ca-c.com/self">',
    ),
    # no canonical element
    ("http://ca-d.com/none", b"<html><body>nothing here</body></html>"),
    # a canonical beyond the head window must be ignored
    (
        "http://ca-e.com/deep",
        b" " * 5000
        + b'<link rel="canonical" href="http://ca-e.com/ignored">',
    ),
    # first of multiple wins
    (
        "http://ca-f.com/multi",
        b'<link rel="canonical" href="http://ca-f.com/first">'
        b'<link rel="canonical" href="http://ca-f.com/second">',
    ),
]


def test_extract_canonical(spark):
    df = spark.createDataFrame(PAGES, "url string, body binary")
    got = {
        r["url"]: (r["canonical_url"], r["is_self"])
        for r in extract_canonical(df).collect()
    }
    assert got["http://ca-a.com/page?utm=1"] == (
        "http://ca-a.com/page",
        False,
    )
    # ../top resolved against /dir/leaf -> /top (RFC 3986 merge)
    assert got["http://ca-b.com/dir/leaf"] == ("http://ca-b.com/top", False)
    assert got["http://ca-c.com/self"] == ("http://ca-c.com/self", True)
    assert "http://ca-d.com/none" not in got
    assert "http://ca-e.com/deep" not in got
    assert got["http://ca-f.com/multi"] == (
        "http://ca-f.com/first",
        False,
    )


def test_extract_canonical_raw_mode(spark):
    df = spark.createDataFrame(PAGES[:2], "url string, body binary")
    got = {
        r["url"]: r["canonical_url"]
        for r in extract_canonical(df, resolve=False).collect()
    }
    assert got["http://ca-b.com/dir/leaf"] == "../top"
