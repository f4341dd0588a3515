"""rel=canonical extraction — the page-declared duplicate-alias signal
(Google's canonical-link element): `<link rel="canonical" href=...>` in
a page's head names the URL whose content this page duplicates. A crawl
pipeline uses it two ways: dedup keyed on the canonical target instead
of the fetched URL (mirrors, tracking-param variants, mobile/desktop
splits collapse), and crawl-priority transfer to the canonical.

Extraction is ALL-JVM (whole-stage codegen): two regexps over the body
head — attribute order varies in the wild, so rel-then-href and
href-then-rel are matched separately and coalesced (first match wins;
multiple canonical elements beyond the first are ignored, matching
browser/Googlebot behavior of taking one signal per page). Patterns
live in the Java-regex∩RE2 COMMON SUBSET (no backreferences/lookaround)
so the driver key's DuckDB twin runs the IDENTICAL chain — the
html_extract/pii cross-dialect certification.

Relative hrefs resolve against the page URL through the engine's
canonicalization kernels (base_col path — the same RFC 3986 §5
machinery redirect Location targets use, urljoin-cross-checked in
tests/test_urls.py); the driver key pins canonical-clean fixtures so
its pure-SQL twin stays exact, the messy-input space being covered by
the canonicalize goldens.

Output: (url, canonical_url, is_self) — is_self marks pages that
declare themselves canonical (the common case; consumers usually key
dedup on coalesce(canonical_url, url) and treat is_self=false rows as
alias edges; transitive chains/conflicts go through
operators/graph.connected_components like any alias pair stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["CANONICAL_PATTERNS", "extract_canonical"]

# Java∩RE2 common subset; [^>]* bounded inside the tag, href value in
# either quote style. Scan window: the first `head_bytes` of the body —
# rel=canonical is a <head> element; bounding the scan keeps the regexp
# cost per page constant at 10^10 pages.
CANONICAL_PATTERNS = (
    r'<link[^>]*rel=["\x27]canonical["\x27][^>]*href=["\x27]([^"\x27>]+)',
    r'<link[^>]*href=["\x27]([^"\x27>]+)["\x27][^>]*rel=["\x27]canonical',
)


def extract_canonical(
    pages: DataFrame,
    body_col: str = "body",
    url_col: str = "url",
    head_bytes: int = 4096,
    resolve: bool = True,
) -> DataFrame:
    """(url, canonical_url, is_self) for every page carrying a
    canonical-link element; pages without one are absent from the
    output (LEFT-join back if per-page rows are wanted). `resolve=True`
    runs relative hrefs through the canonicalization kernel against
    the page URL (and normalizes the page URL the same way so is_self
    compares like with like); resolve=False returns the raw href."""
    head = F.substring(
        F.col(body_col).cast("string"), 1, int(head_bytes)
    )
    cands = [
        F.regexp_extract(head, p, 1) for p in CANONICAL_PATTERNS
    ]
    href = F.coalesce(
        *[F.when(c != "", c) for c in cands]
    )
    hits = pages.select(
        F.col(url_col).alias("url"), href.alias("__href")
    ).filter(F.col("__href").isNotNull())
    if not resolve:
        return hits.select(
            "url",
            F.col("__href").alias("canonical_url"),
            (F.col("__href") == F.col("url")).alias("is_self"),
        )
    from jirlbot_spark.functions.prepare import prepare_urls_fused

    # prepare_urls_fused emits the NORMALIZED url as `url`; carry the
    # original page url through `keep` under a non-colliding name
    src = hits.select(
        F.col("url").alias("__page"),
        F.col("url").alias("__orig"),
        "__href",
    )
    resolved = prepare_urls_fused(
        src, "__href", base_col="__page", keep=("__orig",)
    ).select(
        F.col("__orig").alias("url"),
        F.col("url").alias("canonical_url"),
    )
    page_norm = prepare_urls_fused(
        src.select("__orig", F.col("__page").alias("__u")),
        "__u",
        base_col=None,
        keep=("__orig",),
    ).select(
        F.col("__orig").alias("url"),
        F.col("url").alias("__self_norm"),
    )
    return resolved.join(page_norm, "url").select(
        "url",
        "canonical_url",
        (F.col("canonical_url") == F.col("__self_norm")).alias(
            "is_self"
        ),
    )
