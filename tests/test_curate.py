"""End-to-end curation pipeline (plans/curate.py)."""

from __future__ import annotations

from jirlbot_spark.plans.curate import curate_corpus

GOOD_BODY = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "with plenty of words that keep this document well above the "
    "minimum length for the gopher gate to accept it today"
)

DOCS = [
    (1, "Home | Nav 2024\n" + GOOD_BODY + " contact me at bob@x.com\n"
        "Copyright 2023 Corp"),
    (2, "Home | Nav 2025\nshort doc\nCopyright 2024 Corp"),
    (3, GOOD_BODY + " and my server is 10.1.2.3 ok"),
    (4, "# # # # # symbols " + GOOD_BODY),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in curate_corpus(df, min_words=20).collect()
    }


def test_stage_order_and_accounting(spark):
    out = _run(spark)
    # doc 1: nav + copyright lines deduped (doc 1 is canonical for both
    # -> keeps them; doc 2 loses both), body survives, email scrubbed
    assert out[2]["n_lines_removed"] == 2
    assert out[1]["keep"] and out[1]["n_email"] == 1
    assert "bob@x.com" not in out[1]["clean_text"]
    assert "<EMAIL>" in out[1]["clean_text"]
    # doc 2: after dedup only "short doc" remains -> word-count reject;
    # rejected docs emit '' and are never scrubbed
    assert not out[2]["keep"]
    assert out[2]["clean_text"] == ""
    assert out[2]["n_email"] == 0
    # doc 3: kept, ip scrubbed
    assert out[3]["keep"] and out[3]["n_ip"] == 1
    assert "10.1.2.3" not in out[3]["clean_text"]
    # doc 4: symbol-heavy -> flag_symbol reject
    assert out[4]["flag_symbol"] and not out[4]["keep"]


def test_gate_judges_cleaned_text(spark):
    # a doc whose SYMBOLS all live in corpus-duplicated lines must be
    # judged on the surviving content (pinned stage order)
    docs = [
        (1, "### spam line ###\n" + GOOD_BODY),
        (2, "### spam line ###\nanother " + GOOD_BODY),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curate_corpus(df, min_words=20).collect()}
    # doc 2's spam line deduped away -> no symbols left -> kept
    assert out[2]["n_symbols"] == 0 and out[2]["keep"]
    # doc 1 keeps the canonical spam line and eats the symbol flag
    assert out[1]["flag_symbol"] and not out[1]["keep"]
