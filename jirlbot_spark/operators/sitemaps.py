"""Sitemap ingestion — the sitemaps.org protocol as Spark operators.

A crawler's third URL-discovery channel after seed lists and page links
(IRLbot-era crawlers poll them; robots.txt advertises them via the
`Sitemap:` directive). Reference tree was empty at build time (SURVEY.md
§0), so semantics are pinned to the published protocol at sitemaps.org
and RFC 9309 §2.3's allowance for non-standard directives:

  - sitemap_urls_from_robots: `Sitemap:` directives out of robots.txt
    text (case-insensitive, one absolute URL per directive). Pure JVM
    regexp_extract_all + explode.
  - sitemap_body_text: payload bytes -> text. Gzip members (sitemaps.org
    allows .gz) are inflated with a HARD output cap at the protocol's
    own 50 MiB uncompressed limit — a kilobyte bomb claiming gigabytes
    yields an empty document, never an allocation (same posture as
    functions/limits for image payloads). Arrow-batched pandas UDF; the
    per-row Python loop is bounded by |sitemap files| (≈1-per-host-poll),
    never |URLs|.
  - sitemap_entries: text -> one row per discovered entry:
    (src, loc, kind, lastmod) where kind is 'url' (urlset / plain-text
    sitemaps) or 'sitemap' (sitemapindex — the loop fetches those and
    feeds them back through this operator). XML handling is the
    protocol subset: <url>/<sitemap> blocks, <loc> required,
    <lastmod> optional, the five predefined XML entities unescaped
    (the spec mandates escaping exactly those in loc values). All JVM
    regexp — no Python, Catalyst-visible, vanishes into the scan stage.

Scale posture: sitemap volume is per-HOST (one index + a few files per
host), orders of magnitude below the frontier; every transform here is
a narrow projection with no shuffle. Discovered 'url' rows take the
normal canonicalize -> DRUM dedup -> STAR/BEAST -> politeness path —
a sitemap can only PROPOSE URLs, never bypass budgets.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# sitemaps.org: "A Sitemap file ... must be no larger than 50MB
# (52,428,800 bytes)" uncompressed — the inflate cap for .gz payloads.
SITEMAP_MAX_BYTES = 50 * 1024 * 1024

_ROBOTS_SITEMAP_PAT = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"
_URL_BLOCK_PAT = r"(?is)<url\s*>(.*?)</url\s*>"
_SITEMAP_BLOCK_PAT = r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"
_LOC_PAT = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"
_LASTMOD_PAT = r"(?is)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"
_IS_XML_PAT = r"(?is)<\s*(urlset|sitemapindex)[\s>]"


def sitemap_urls_from_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """`Sitemap:` directives of each host's robots.txt -> (host,
    sitemap_url). The directive is location-independent in the file and
    case-insensitive (RFC 9309 §2.3 / sitemaps.org); values are absolute
    URLs by spec — relative ones still flow through and die in
    canonicalize downstream."""
    return robots.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(_ROBOTS_SITEMAP_PAT), F.lit(1)
            )
        ).alias("sitemap_url"),
    )


def _xml_unescape(col):
    """The five predefined XML entities, &amp; last so '&amp;lt;'
    decodes to '&lt;' (one level), not '<'."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


@F.pandas_udf(StringType())
def sitemap_body_text(bodies: pd.Series) -> pd.Series:
    """Payload bytes -> document text. Gzip members inflate under the
    protocol's 50 MiB cap (excess or corrupt streams -> empty text, the
    fail-clean contract untrusted payloads get everywhere else in this
    engine); plain bodies decode as UTF-8 with replacement."""

    def one(b) -> str:
        if b is None:
            return ""
        b = bytes(b)
        if b[:2] == b"\x1f\x8b":
            try:
                d = zlib.decompressobj(wbits=31)
                out = d.decompress(b, SITEMAP_MAX_BYTES + 1)
                if len(out) > SITEMAP_MAX_BYTES or d.unconsumed_tail:
                    return ""
                b = out
            except zlib.error:
                return ""
        return b.decode("utf-8", errors="replace")

    return bodies.map(one)


def sitemap_entries(
    docs: DataFrame,
    src_col: str = "sitemap_url",
    text_col: str = "body_text",
) -> DataFrame:
    """One row per sitemap entry: (src, loc, kind, lastmod).

    XML documents (<urlset>/<sitemapindex> present) yield their
    <url>/<sitemap> blocks' <loc> (entity-unescaped, whitespace-trimmed;
    blocks without a <loc> are dropped per spec) and optional <lastmod>.
    Anything else is treated as a plain-text sitemap: one URL per line,
    non-URL lines ignored. kind='sitemap' rows are index entries the
    crawl loop fetches and feeds back through this operator.
    """
    src = F.col(src_col)
    text = F.coalesce(F.col(text_col), F.lit(""))
    is_xml = text.rlike(_IS_XML_PAT)

    def xml_side(kind: str, block_pat: str) -> DataFrame:
        return (
            docs.filter(is_xml)
            .select(
                src.alias("src"),
                F.explode(
                    F.regexp_extract_all(text, F.lit(block_pat), F.lit(1))
                ).alias("block"),
            )
            .select(
                "src",
                _xml_unescape(
                    F.regexp_extract("block", _LOC_PAT, 1)
                ).alias("loc"),
                F.lit(kind).alias("kind"),
                F.nullif(
                    F.regexp_extract("block", _LASTMOD_PAT, 1), F.lit("")
                ).alias("lastmod"),
            )
        )

    txt_side = (
        docs.filter(~is_xml)
        .select(
            src.alias("src"),
            F.explode(F.split(text, r"\r?\n")).alias("line"),
        )
        .select(
            "src",
            F.trim("line").alias("loc"),
            F.lit("url").alias("kind"),
            F.lit(None).cast("string").alias("lastmod"),
        )
        .filter(F.col("loc").rlike(r"^[hH][tT][tT][pP][sS]?://"))
    )

    return (
        xml_side("url", _URL_BLOCK_PAT)
        .unionByName(xml_side("sitemap", _SITEMAP_BLOCK_PAT))
        .unionByName(txt_side)
        .filter(F.col("loc") != "")
    )
