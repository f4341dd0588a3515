"""HTML → visible text extraction, all-JVM (regexp chain, codegen'd).

The step between a fetched page body and every text operator in this
engine (dedup, quality, lang-id, decontamination, packing): strip the
markup, keep what a reader sees. A full HTML5 tree builder is neither
needed nor wanted in the hot path — corpus recipes (CommonCrawl WET,
C4's preprocessing) use exactly this class of tag-level extraction.

Pinned contract (driver key `html_extract`; the DuckDB oracle re-runs
the same pipeline on a SEPARATE regex engine — Spark compiles Java
regex, DuckDB compiles RE2 — so green certifies the patterns mean the
same thing in both dialects; every pattern below is written in the
common subset):

  1. drop <script>..</script>, <style>..</style>, <noscript>,
     <template> blocks WITH their contents (case-insensitive, dotall,
     non-greedy; an unclosed block drops to end-of-document — matching
     how browsers treat a script that never closes);
  2. drop <!-- comments --> (non-greedy; unclosed comment drops to
     end) and <!DOCTYPE>/<![CDATA[ wrappers;
  3. every remaining tag <...> becomes ONE SPACE (attribute values
     containing a literal '>' will end the tag early — the documented
     tag-level approximation; real-world rate is negligible and the
     failure mode is extra visible junk, which downstream quality
     filters catch);
  4. decode the pinned entity set — &nbsp; → space, &lt; &gt; &quot;
     &apos; &#39; → their characters, and &amp; LAST so double-encoded
     text decodes one level per pass, never recursively;
  5. collapse all whitespace runs to single spaces and trim.

Numeric entities beyond &#39; are left as-is (decoding arbitrary
&#NNN; needs char-from-codepoint, not expressible in a regexp chain);
they survive as tokens and count against quality, the right direction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — applied in order; the common Java-regex/RE2
# subset: inline (?is) flags, non-greedy .*?, alternation, [^>] classes.
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # 1. container blocks whose CONTENT must go; unclosed -> to end.
    # One pattern per tag name — a backreference (</\1>) would be the
    # compact form, but RE2 (the oracle's engine) has no backreferences,
    # and the pinned contract lives in the common subset.
    (r"(?is)<script\b[^>]*>.*?(</script\s*>|$)", " "),
    (r"(?is)<style\b[^>]*>.*?(</style\s*>|$)", " "),
    (r"(?is)<noscript\b[^>]*>.*?(</noscript\s*>|$)", " "),
    (r"(?is)<template\b[^>]*>.*?(</template\s*>|$)", " "),
    # 2. comments / doctype / cdata
    (r"(?s)<!--.*?(-->|$)", " "),
    (r"(?is)<!doctype[^>]*>", " "),
    (r"(?s)<!\[CDATA\[.*?(\]\]>|$)", " "),
    # 3. any remaining tag
    (r"(?s)<[^>]*>", " "),
    # 4. pinned entity set (&amp; LAST)
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&apos;", "'"),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
)


def html_text(col: str | Column) -> Column:
    """Visible text of an HTML column per the module's pinned contract.
    Pure JVM regexp_replace chain — whole-stage codegen, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))
