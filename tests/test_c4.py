"""C4-style cleaning (functions/c4.py): each pinned rule in isolation
plus the document gate."""

from __future__ import annotations

from jirlbot_spark.functions.c4 import c4_clean_df

GOOD = "This line is a fine sentence."


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return c4_clean_df(df, **kw).collect()[0]


def test_terminal_punct_rule(spark):
    r = _run(spark, "no terminal punct here\n" + GOOD)
    assert r.text_clean == GOOD
    assert (r.n_lines, r.n_kept) == (2, 1)


def test_terminal_quote_kept(spark):
    r = _run(spark, 'He said "stop right there."\nShort!\n')
    # quote-terminated line kept; 'Short!' fails min_words, '' fails both
    assert r.text_clean == 'He said "stop right there."'


def test_min_words_rule(spark):
    r = _run(spark, "Too short.\n" + GOOD)
    assert r.text_clean == GOOD


def test_javascript_line_dropped(spark):
    r = _run(spark, "Please enable JavaScript to view this site.\n" + GOOD)
    assert r.text_clean == GOOD


def test_lines_trimmed_in_output(spark):
    r = _run(spark, "   Padded but a good line.   \n" + GOOD)
    assert r.text_clean == "Padded but a good line.\n" + GOOD


def test_doc_gate_lorem_brace_minlines(spark):
    five = "\n".join(GOOD for _ in range(5))
    assert _run(spark, five).keep
    assert not _run(spark, five + "\nLorem Ipsum dolor sit.").keep
    assert not _run(spark, five + "\nif (x) { y(); }").keep
    assert not _run(spark, "\n".join(GOOD for _ in range(4))).keep
    assert _run(spark, GOOD, min_lines=1).keep


def test_empty_and_whitespace_doc(spark):
    r = _run(spark, "   \n\n  ")
    assert (r.n_kept, r.text_clean, r.keep) == (0, "", False)
