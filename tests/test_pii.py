"""PII scrubbing (functions/pii.py): category coverage, ordering,
survivor cases, idempotence, and count/placeholder consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jirlbot_spark.functions.pii import pii_scrub_df

CASES = [
    # (input, expected scrubbed, (n_email, n_ip, n_phone))
    ("contact bob.smith+x@mail.co.uk now", "contact <EMAIL> now", (1, 0, 0)),
    ("UPPER@EXAMPLE.ORG.", "<EMAIL>.", (1, 0, 0)),
    ("server at 10.0.0.1:8080 up", "server at <IP>:8080 up", (0, 1, 0)),
    # quads not range-checked: over-redaction is the pinned direction
    ("at 999.999.999.999 here", "at <IP> here", (0, 1, 0)),
    # ...but letter-adjacent digit runs are glued words, not PII
    ("v999.999.999.999 here", "v999.999.999.999 here", (0, 0, 0)),
    ("call (555) 123-4567 ok", "call <PHONE> ok", (0, 0, 1)),
    ("+1 555.333.2222", "<PHONE>", (0, 0, 1)),
    ("5551234567", "<PHONE>", (0, 0, 1)),
    # email eats its digits BEFORE phone can half-match the local part
    ("x 5551234567@sms.gw.com y", "x <EMAIL> y", (1, 0, 0)),
    # IP eaten before the phone shape sees it
    ("ping 192.168.1.1 now", "ping <IP> now", (0, 1, 0)),
    # survivors: long digit runs are NOT phones (leading \b per form)
    ("order 123456789012 shipped", "order 123456789012 shipped", (0, 0, 0)),
    ("ts=1692500000000", "ts=1692500000000", (0, 0, 0)),
    ("id x1234567890 ok", "id x1234567890 ok", (0, 0, 0)),
    ("plain text, no pii at all", "plain text, no pii at all", (0, 0, 0)),
    # multiples count per category
    (
        "a@b.co and c@d.io via 1.2.3.4",
        "<EMAIL> and <EMAIL> via <IP>",
        (2, 1, 0),
    ),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], ["doc_id", "text"]
    )
    return {r.doc_id: r for r in pii_scrub_df(df).collect()}


def test_scrub_cases(scrubbed):
    for i, (src, want, _) in enumerate(CASES):
        assert scrubbed[i].text_scrubbed == want, src


def test_counts_match_placeholders(scrubbed):
    for i, (src, _, (ne, ni, np_)) in enumerate(CASES):
        r = scrubbed[i]
        assert (r.n_email, r.n_ip, r.n_phone) == (ne, ni, np_), src
        # counts == placeholders actually inserted
        assert r.text_scrubbed.count("<EMAIL>") == ne
        assert r.text_scrubbed.count("<IP>") == ni
        assert r.text_scrubbed.count("<PHONE>") == np_


def test_idempotent(spark):
    texts = [t for t, _, _ in CASES] + [
        "a@b.co 1.2.3.4 (555) 123-4567 mixed together a@b.co"
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    once = pii_scrub_df(df).select(
        "doc_id", F.col("text_scrubbed").alias("text")
    )
    twice = pii_scrub_df(once).collect()
    for r in twice:
        assert r.text_scrubbed == r.text  # scrub(scrub(x)) == scrub(x)
        assert (r.n_email, r.n_ip, r.n_phone) == (0, 0, 0)
