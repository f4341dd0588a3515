"""PII scrubbing for training corpora — all-JVM regexp chain.

Web-scale training pipelines (the C4/Dolma/FineWeb recipe family)
redact personally identifiable strings before anything else sees the
text. Same engineering contract as functions/html.py: a pinned ordered
(pattern, placeholder) chain written in the Java-regex ∩ RE2 COMMON
SUBSET (no lookarounds — RE2 has none; no backreferences), so the
DuckDB oracle can run the IDENTICAL chain on a separately-authored
regex engine and green certifies the patterns mean the same thing in
both dialects.

Pinned categories and order (order is load-bearing):

  1. EMAIL first — a digit-heavy local part must not be half-eaten by
     the phone pattern before the email pattern sees it.
  2. IPv4 second — '192.168.1.1' would otherwise partially match the
     phone shape. `\\b`-guarded quads; quads are NOT range-checked
     (999.999.999.999 redacts too): over-redaction is the conservative
     direction for privacy, and lookarounds to exclude longer digit
     runs don't exist in RE2. Version strings like '1.2.3.4' therefore
     redact as well — documented approximation, same tradeoff the
     published recipes make.
  3. PHONE last — NANP-style 3-3-4 groups with optional +country and
     () around the area code, separators [-. ] or none between groups.
     Deliberately narrower than "any long digit run": order IDs and
     timestamps must survive. International free-form numbers are out
     of scope (no regex does them justice; a cluster deployment can
     extend the chain).

Placeholders contain no digits or '@', so a later pattern can never
re-match an earlier replacement — the chain is idempotent
(scrub(scrub(x)) == scrub(x), property-tested).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# The leading anchor is per-alternative: `\b` before `\(` is never a
# boundary (non-word→non-word), so the paren form anchors on the paren
# itself and the bare form anchors on `\b` — which is what stops a
# 12-digit order id or epoch-millis timestamp from having its tail 10
# digits redacted (every inner digit→digit position fails `\b`).
PHONE_RE = (
    r"(\+\d{1,2}[-. ]?)?(\(\d{3}\)[-. ]?|\b\d{3}[-. ]?)\d{3}[-. ]?\d{4}\b"
)

PII_STEPS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def scrub_pii(col: Column) -> Column:
    """Text with every pinned-category match replaced by its placeholder."""
    out = col
    for pat, repl in PII_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Per-category match counts (n_email, n_ip, n_phone) — the filter
    signal ("drop documents with > K redactions" is a standard rule).
    Counted on the SAME progressively-scrubbed text the replacements
    see, so counts always equal the number of placeholders inserted."""
    counts = []
    cur = col
    for (pat, repl), name in zip(
        PII_STEPS, ("n_email", "n_ip", "n_phone")
    ):
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(name))
        cur = F.regexp_replace(cur, pat, repl)
    return counts


def pii_scrub_df(df, text_col: str = "text", out_col: str = "text_scrubbed"):
    """documents-shaped frame → + scrubbed text + per-category counts.
    Pure projection: whole-stage codegen, no shuffle, no Python."""
    c = F.col(text_col)
    return df.select(
        "*", scrub_pii(c).alias(out_col), *pii_counts(c)
    )
