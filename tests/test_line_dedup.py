"""Line-level corpus dedup (operators/line_dedup.py).

The independent reference here is a ~20-line pure-Python
implementation written directly from the pinned semantics (normalize,
count, keep rule, rebuild) — no Spark, no shared kernel — run over the
same corpus and compared row-for-row.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from jirlbot_spark.operators.line_dedup import line_dedup


def _norm(line: str) -> str:
    return re.sub(r"\s+", " ", re.sub("[0-9]", "", line.lower())).strip()


def _reference(
    docs: list[tuple[int, str]],
    max_occurrences: int = 1,
    keep_first: bool = True,
) -> dict[int, tuple[str, int, int]]:
    """Independent naive implementation of the pinned semantics."""
    occ: list[tuple[int, int, str]] = []
    counts: dict[str, int] = {}
    for doc_id, text in docs:
        for i, line in enumerate(text.split("\n")):
            n = _norm(line)
            if n == "":
                continue
            occ.append((doc_id, i, n))
            counts[n] = counts.get(n, 0) + 1
    canonical = {}
    for doc_id, i, n in sorted(occ):
        canonical.setdefault(n, (doc_id, i))
    out = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept, removed = [], 0
        for i, line in enumerate(lines):
            n = _norm(line)
            dup = n != "" and counts[n] > max_occurrences
            if dup and keep_first and canonical[n] == (doc_id, i):
                dup = False
            if dup:
                removed += 1
            else:
                kept.append(line)
        out[doc_id] = ("\n".join(kept), len(lines), removed)
    return out


CORPUS = [
    (1, "Home | About | Contact\nunique first body line\nCopyright 2023 x"),
    (2, "Home | About | Contact\nanother unique body\nCopyright 2024 x"),
    (3, "HOME  |  about | contact\nthird body text here\n\nCopyright 1999 x"),
    (4, "no boilerplate at all in this one"),
    (5, "unique first body line\ntail line only here"),
]


def _run(spark, corpus, **kw):
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = line_dedup(df, **kw).collect()
    return {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"]) for r in rows}


def test_matches_independent_reference(spark):
    assert _run(spark, CORPUS) == _reference(CORPUS)


def test_normalization_collapses_variants(spark):
    out = _run(spark, CORPUS)
    # nav bar: case/space variants hash together; doc 1 is canonical
    assert "Home | About | Contact" in out[1][0]
    assert "Home | About | Contact" not in out[2][0]
    assert "about | contact" not in out[3][0].lower()
    # footers: digit years stripped -> all three are one normalized line
    assert "Copyright 2023 x" in out[1][0]
    assert "Copyright" not in out[2][0] and "Copyright" not in out[3][0]
    # duplicated body line keeps doc-1 copy, drops doc-5 copy
    assert "unique first body line" in out[1][0]
    assert "unique first body line" not in out[5][0]
    assert out[4] == ("no boilerplate at all in this one", 1, 0)


def test_blank_lines_exempt(spark):
    out = _run(spark, CORPUS)
    # doc 3's empty line survives even though '' "occurs" everywhere
    assert out[3][0].split("\n").count("") == 1


def test_keep_first_false_removes_all(spark):
    out = _run(spark, CORPUS, keep_first=False)
    ref = _reference(CORPUS, keep_first=False)
    assert out == ref
    assert "Home | About | Contact" not in out[1][0]


def test_max_occurrences_threshold(spark):
    # threshold 2: nav (3 copies) still dies; body dup (2 copies) stays
    out = _run(spark, CORPUS, max_occurrences=2)
    assert out == _reference(CORPUS, max_occurrences=2)
    assert "unique first body line" in out[5][0]
    assert "about | contact" not in out[2][0].lower()


def test_idempotent(spark):
    once = _run(spark, CORPUS)
    again = _run(spark, [(d, t) for d, (t, _, _) in sorted(once.items())])
    assert all(r == 0 for (_, _, r) in again.values())


@pytest.mark.parametrize("kw", [{}, {"keep_first": False}])
def test_partitioning_invariance(spark, kw):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    a = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in line_dedup(df.repartition(7, F.col("doc_id")), **kw).collect()
    }
    b = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in line_dedup(df.coalesce(1), **kw).collect()
    }
    assert a == b
