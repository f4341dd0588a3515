"""Gopher doc-level quality rules (functions/gopher.py).

Independent reference: the published rule table re-implemented naively
in Python (regex module, explicit loops) and compared row-for-row.
"""

from __future__ import annotations

import re

from jirlbot_spark.functions.gopher import GOPHER_STOPWORDS, gopher_quality

DOCS = [
    (1, "the cat and the dog have fun with all of that stuff here now ok"),
    (2, "aa bb cc"),  # too few words
    (3, "# # # # lots of symbols the and"),  # symbol-heavy
    (4, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n"
        "- nine\n- ten"),  # all bullets
    (5, "more... and more... and even more... the end of that..."),
    (6, "1 2 3 4 5 6 7 8 9 10 the of"),  # numeric words
    (7, "the quick brown fox jumps over the lazy dog with plenty of words that"),
    (8, "supercalifragilisticexpialidocious " * 10 + "the of"),  # long words
    (9, ""),
]


def _ref(doc: str, min_words: int, max_words: int) -> dict:
    toks = [t for t in re.split(r"\s+", doc.strip()) if t]
    lines = [l.strip() for l in doc.split("\n")]
    lower = [t.lower() for t in toks]
    c = {
        "n_words": len(toks),
        "sum_word_len": len(re.sub(r"\s", "", doc)),
        "n_symbols": len(re.findall(r"#|\.\.\.|…", doc)),
        "n_lines": len(doc.split("\n")),
        "n_bullet": sum(1 for l in lines if re.match(r"^[-*•]", l)),
        "n_ellipsis": sum(
            1 for l in lines if l.endswith("...") or l.endswith("…")
        ),
        "n_alpha_words": sum(1 for t in toks if re.search("[a-zA-Z]", t)),
        "n_stop_hits": sum(1 for w in GOPHER_STOPWORDS if w in lower),
    }
    n, swl = c["n_words"], c["sum_word_len"]
    f = {
        "flag_word_count": n < min_words or n > max_words,
        "flag_mean_len": swl < 3 * n or swl > 10 * n,
        "flag_symbol": 10 * c["n_symbols"] > n,
        "flag_bullet": 10 * c["n_bullet"] > 9 * c["n_lines"],
        "flag_ellipsis": 10 * c["n_ellipsis"] > 3 * c["n_lines"],
        "flag_alpha": 5 * c["n_alpha_words"] < 4 * n,
        "flag_stop": c["n_stop_hits"] < 2,
    }
    return {**c, **f, "keep": not any(f.values())}


def test_matches_independent_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = gopher_quality(df, min_words=10, max_words=1000).collect()
    assert len(rows) == len(DOCS)
    by_id = {r["doc_id"]: r for r in rows}
    for i, text in DOCS:
        want = _ref(text, 10, 1000)
        got = {k: by_id[i][k] for k in want}
        assert got == want, (i, got, want)


def test_expected_verdicts(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    kept = {
        r["doc_id"]
        for r in gopher_quality(df, min_words=10, max_words=1000)
        .where("keep")
        .collect()
    }
    assert kept == {1, 7}


def test_pure_projection(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Generate" not in plan
