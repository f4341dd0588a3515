"""URL canonicalization + pay-level-domain extraction, fully vectorized.

Semantics modeled on IRLbot's URL handling (checkAndTransformURL /
getPLDofURL in the reference's IRLbotUtil; reference tree was empty at build
time — SURVEY.md §0 — so the contract is pinned by the IRLbot paper and the
golden table in tests/test_urls.py):

  canonicalize(url, base):
    - strip ASCII tab/newline/CR anywhere in url and base first (the
      WHATWG URL rule; also the ONLY char where Python-re '$'/'.' and
      re2 semantics diverge, so stripping keeps the pandas and Arrow
      kernels bit-equivalent on dirty link data)
    - resolve relative references against base (scheme-relative, absolute
      path, relative path, query-only)
    - strip the fragment
    - percent-encoding normalization (RFC 3986 §6.2.2): uppercase %XX
      hex, decode unreserved escapes (ALPHA / DIGIT / - . _ ~) — done
      BEFORE dot-segment removal so a decoded %2E participates in it
    - lowercase scheme and host; path/query case preserved
    - IDN: non-ASCII hosts encode to punycode (xn--) labels; hosts the
      idna codec rejects are REJECTED rows
    - drop default ports (http:80, https:443)
    - collapse dot-segments ("/./", "/../") in the path
    - empty path -> "/"
    - REJECT (null) anything that is not http(s), has no host, or exceeds
      MAX_URL_LEN

  pld(host): pay-level-domain via an embedded public-suffix table
    ("a.b.example.co.uk" -> "example.co.uk").

Implementation is pure pandas Series ops (str.extract / str.replace masks),
wrapped in Arrow-batched pandas UDFs — no per-row Python anywhere.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

MAX_URL_LEN = 2048

# Full publicsuffix.org rule sets (vendored — functions/psl.py). Loaded
# lazily so importing this module stays cheap on executors that never
# touch pld.
from jirlbot_spark.functions.psl import MAX_RULE_LABELS, load_psl

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):")
# scheme://host[:port][/path...]
_SPLIT_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.\-]*)://"
    r"(?P<host>[^/:?#]*)(?::(?P<port>\d*))?(?P<rest>[/?].*)?$"
)
# precompiled dot-segment passes (compiled once; pandas accepts patterns)
_DOT_HINT = re.compile(r"/\.")
_P_CUR = re.compile(r"/\./")
_P_CUR_END = re.compile(r"/\.$")
_P_UP = re.compile(r"/[^/]*[^/.][^/]*/\.\./")
_P_UP_END = re.compile(r"/[^/]*[^/.][^/]*/\.\.$")
_P_ROOT = re.compile(r"^/\.\./")
_P_ROOT_END = re.compile(r"^/\.\.$")
_P_FRAG = re.compile(r"#.*$")
_P_QUERY = re.compile(r"\?.*$")
_P_QUERY_CAP = re.compile(r"(\?.*)$")
_P_LASTSEG = re.compile(r"[^/]*$")
_P_QF = re.compile(r"[?#].*$")
_P_BADHOST = re.compile(r"[^a-z0-9.\-:_]")
_P_CTRL = re.compile(r"[\t\n\r]")
_P_NONASCII = re.compile(r"[^\x00-\x7f]")

# Percent-encoding normalization tables (shared verbatim with the Arrow
# kernel — both engines run the SAME pass sequence, so results match even
# on degenerate inputs like stray '%'s). First 12 passes uppercase the hex
# digits of every valid %xx escape (6 per digit position; no lookarounds,
# so re2-compatible), then 66 LITERAL passes decode the unreserved set.
PCT_UPPER_PASSES: list[tuple[str, str]] = [
    (f"%{c}([0-9a-fA-F])", f"%{c.upper()}\\1") for c in "abcdef"
] + [(f"%([0-9A-F]){c}", f"%\\1{c.upper()}") for c in "abcdef"]
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
# Unreserved-escape decode, pinned contract: ITERATED single-pass to
# FIXPOINT. One round is a true simultaneous single pass, in two
# literal-replace phases (RE2 has no replacement callback, so a single
# regex pass isn't expressible in the Arrow kernel):
#   phase 1: each valid %XX -> a private-use placeholder U+E0XX.
#            Placeholders are non-ASCII, so a decode inside one round can
#            never combine with surrounding text into a NEW escape — the
#            round is order-independent, unlike the old 66-sequential-
#            literal scheme whose result depended on pass order.
#   phase 2: placeholder -> the decoded character.
# Rounds repeat until nothing changes. On well-formed input one round is
# a no-op-detecting second pass; on malformed stray-% input ('%7%45E')
# a decode may SYNTHESIZE a new escape ('%7EE'), and the next round
# decodes it ('~E'). That cascading is a deliberate, documented
# divergence from one-shot RFC 3986 decoding: the canonical form must be
# a FIXPOINT of canonicalize (frontier dedup keys would otherwise drift),
# and one-shot decoding leaves non-fixpoint outputs. Golden-pinned in
# tests/test_urls.py; fuzzed in tests/test_arrow_kernels.py.
PCT_DECODE_PHASE1: list[tuple[str, str]] = [
    (f"%{ord(ch):02X}", chr(0xE000 + ord(ch))) for ch in _UNRESERVED
]
PCT_DECODE_PHASE2: list[tuple[str, str]] = [
    (chr(0xE000 + ord(ch)), ch) for ch in _UNRESERVED
]
# adversarial inputs carrying our placeholder code points would corrupt
# phase 2 — strip them first (they're garbage in a URL either way)
_P_PUA_GUARD = re.compile("[\\uE000-\\uE0FF]")
_PCT_UPPER_COMPILED = [(re.compile(p), r) for p, r in PCT_UPPER_PASSES]


def _strip_ctrl(s: pd.Series) -> pd.Series:
    if s.str.contains(_P_CTRL, na=False).any():
        s = s.str.replace(_P_CTRL, "", regex=True)
    return s


def _pct_normalize(s: pd.Series) -> pd.Series:
    """Uppercase %XX hex + fixpoint decode of unreserved escapes
    (iterated placeholder two-phase — see PCT_DECODE_PHASE1), only over
    the rows that contain '%' (subset-scatter like _remove_dot_segments).
    Round count is bounded: each non-final round strictly shortens its
    rows (a decode drops >=2 chars)."""
    m = s.str.contains("%", regex=False, na=False)
    if not m.any():
        return s
    sub = s[m]
    if sub.str.contains(_P_PUA_GUARD, na=False).any():
        sub = sub.str.replace(_P_PUA_GUARD, "", regex=True)
    for pat, rep in _PCT_UPPER_COMPILED:
        sub = sub.str.replace(pat, rep, regex=True)
    for _ in range(64):
        nxt = sub
        for lit, rep in PCT_DECODE_PHASE1:
            nxt = nxt.str.replace(lit, rep, regex=False)
        for lit, rep in PCT_DECODE_PHASE2:
            nxt = nxt.str.replace(lit, rep, regex=False)
        if nxt.equals(sub):
            break
        sub = nxt
    out = s.copy()
    out[m] = sub
    return out


def idna_encode(host: str) -> str | None:
    """Punycode-encode one non-ASCII hostname (None = reject). Scalar —
    called only on the (rare) non-ASCII-host rows via an explicit mask in
    both kernels; ASCII hosts never reach it."""
    try:
        return host.encode("idna").decode("ascii")
    except Exception:
        return None


def _remove_dot_segments(paths: pd.Series) -> pd.Series:
    """Collapse /./ and /../ segments, vectorized to fixpoint.

    Fast path: only rows containing "/." enter the loop (real-world URL
    batches are mostly dot-free); each pass is a whole-subset regex
    replace, loop count bounded by the deepest nesting in the batch.
    """
    has_dots = paths.str.contains(_DOT_HINT, na=False)
    if not has_dots.any():
        return paths
    sub = paths[has_dots]
    for _ in range(64):
        nxt = sub.str.replace(_P_CUR, "/", regex=True)
        nxt = nxt.str.replace(_P_CUR_END, "/", regex=True)
        # "/segment/../" -> "/" (segment must not itself be "." / "..")
        nxt = nxt.str.replace(_P_UP, "/", regex=True)
        nxt = nxt.str.replace(_P_UP_END, "/", regex=True)
        # "/../" at the root has no parent to pop — collapses to "/"
        nxt = nxt.str.replace(_P_ROOT, "/", regex=True)
        nxt = nxt.str.replace(_P_ROOT_END, "/", regex=True)
        if nxt.equals(sub):
            break
        sub = nxt
    out = paths.copy()
    out[has_dots] = sub
    return out


def resolve_series(urls: pd.Series, bases: pd.Series) -> pd.Series:
    """RFC-3986-style reference resolution, vectorized with masks."""
    urls = _strip_ctrl(urls.fillna("")).str.strip()
    bases = _strip_ctrl(bases.fillna("")).str.strip()

    has_scheme = urls.str.match(_SCHEME_RE)
    if (bases == "").all():
        # fast path: nothing to resolve against — relative refs are
        # unresolvable (nulled), absolute refs pass through untouched
        return urls.where(has_scheme, "")
    out = urls.copy()

    bp = bases.str.extract(_SPLIT_RE)
    base_origin = bp["scheme"].fillna("") + "://" + bp["host"].fillna("")
    base_port = bp["port"].fillna("")
    base_origin = base_origin.where(base_port == "", base_origin + ":" + base_port)
    base_path = (
        bp["rest"].fillna("/").str.replace(r"[?#].*$", "", regex=True)
    )
    base_dir = base_path.str.replace(r"[^/]*$", "", regex=True)
    base_dir = base_dir.where(base_dir != "", "/")

    base_query = bp["rest"].fillna("").str.extract(r"(\?[^#]*)")[0].fillna("")

    empty_ref = ~has_scheme & (urls == "")
    scheme_rel = ~has_scheme & ~empty_ref & urls.str.startswith("//")
    abs_path = ~has_scheme & ~empty_ref & ~scheme_rel & urls.str.startswith("/")
    query_only = ~has_scheme & urls.str.startswith("?")
    frag_only = ~has_scheme & urls.str.startswith("#")
    rel_path = (
        ~has_scheme
        & ~empty_ref
        & ~scheme_rel
        & ~abs_path
        & ~query_only
        & ~frag_only
    )

    # empty reference -> the base itself (minus fragment), per RFC 3986 §5.3
    out = out.mask(empty_ref, base_origin + base_path + base_query)
    out = out.mask(scheme_rel, bp["scheme"].fillna("") + ":" + urls)
    out = out.mask(abs_path, base_origin + urls)
    out = out.mask(query_only, base_origin + base_path + urls)
    # fragment-only refs keep the BASE QUERY (RFC 3986 §5.3: query is
    # only replaced when the reference defines one) — dropping it would
    # alias href="#section" to a query-stripped sibling page
    out = out.mask(frag_only, base_origin + base_path + base_query + urls)
    out = out.mask(rel_path, base_origin + base_dir + urls)
    # relative ref with no usable base -> unresolvable
    no_base = bp["host"].isna() | (bp["host"].fillna("") == "")
    out = out.mask(~has_scheme & no_base, "")
    return out


def canonicalize_series(
    urls: pd.Series, bases: pd.Series | None = None
) -> pd.Series:
    """Vectorized canonicalization; returns canonical URL or <NA> (reject)."""
    if bases is None:
        bases = pd.Series([""] * len(urls), index=urls.index)
    u = resolve_series(urls, bases)
    # strip fragment early (it never survives); skip when none present
    if u.str.contains("#", regex=False, na=False).any():
        u = u.str.replace(_P_FRAG, "", regex=True)
    u = _pct_normalize(u)

    parts = u.str.extract(_SPLIT_RE)
    scheme = parts["scheme"].str.lower()
    host = parts["host"].str.lower().str.strip(".")
    nonascii = host.str.contains(_P_NONASCII, regex=True, na=False)
    if nonascii.any():
        host = host.copy()
        host[nonascii] = [idna_encode(h) for h in host[nonascii]]
    port = parts["port"]
    rest = parts["rest"].fillna("")

    has_q = rest.str.contains("?", regex=False, na=False)
    if has_q.any():
        path = rest.str.replace(_P_QUERY, "", regex=True)
        query = rest.str.extract(_P_QUERY_CAP)[0].fillna("")
    else:
        path, query = rest, ""
    path = path.where(path != "", "/")
    path = _remove_dot_segments(path)

    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_sfx = (":" + port.fillna("")).where(
        port.notna() & (port != "") & ~default_port, ""
    )

    canon = scheme + "://" + host + port_sfx + path + query

    ok = (
        scheme.isin(["http", "https"])
        & host.notna()
        & (host != "")
        & ~host.str.contains(_P_BADHOST, regex=True, na=True)
        & (canon.str.len() <= MAX_URL_LEN)
    )
    return canon.where(ok, pd.NA)


def host_of_series(urls: pd.Series) -> pd.Series:
    """Lowercased host of an (already canonical) URL; <NA> if none."""
    h = urls.str.extract(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)")[0]
    return h.str.lower()


def _suffix_re(k: int) -> str:
    """Regex capturing the last k dot-separated labels (no match -> NaN)."""
    if k == 1:
        return r"([^.]+)$"
    return r"((?:[^.]+\.){%d}[^.]+)$" % (k - 1)


def pld_series(hosts: pd.Series) -> pd.Series:
    """Pay-level-domain of a hostname via the full public-suffix list.

    PSL match algorithm, vectorized: the public-suffix label count is the
    longest matching exact rule, or parent+1 for a ``*.parent`` wildcard
    rule, with ``!exception`` rules overriding to len(exception)-1, and
    the implicit ``*`` default (the bare TLD) when nothing matches.  The
    PLD is one label more than the public suffix.  Hosts that ARE a
    public suffix (or single labels like "localhost") are their own PLD;
    IPv4 literals pass through whole.

    Cost per batch: MAX_RULE_LABELS+1 anchored regex extracts plus ~2·K
    hash-set membership tests — shape-independent of the 9.5k-rule table.
    """
    exact, wildcard_parents, exceptions = load_psl()
    h = hosts.fillna("").str.lower().str.strip(".")
    is_ip = h.str.match(r"^\d{1,3}(\.\d{1,3}){3}$")
    K = MAX_RULE_LABELS
    suf = {k: h.str.extract(_suffix_re(k))[0] for k in range(1, K + 2)}
    # implicit '*' rule: the TLD itself is a public suffix
    ps_len = pd.Series(1, index=h.index)
    for k in range(2, K + 1):  # k=1 is the default; exact TLD rules agree
        hit = suf[k].isin(exact)
        if hit.any():
            ps_len = ps_len.mask(hit, k)  # increasing k => longest match
    for k in range(1, K):
        # '*.parent' with k-label parent => (k+1)-label suffixes are public
        hit = suf[k].isin(wildcard_parents)
        if hit.any():
            ps_len = ps_len.mask(hit & (ps_len < k + 1), k + 1)
    for k in range(2, K + 1):
        # exception rule: its own match is REGISTRABLE (ps = rule minus
        # leftmost label); beats wildcard/exact per the PSL spec
        hit = suf[k].isin(exceptions)
        if hit.any():
            ps_len = ps_len.mask(hit, k - 1)
    pld = pd.Series(pd.NA, index=h.index, dtype="object")
    for L in range(2, K + 2):
        pick = ps_len == L - 1
        if pick.any():
            pld = pld.mask(pick, suf[L])
    # host shorter than ps+1 labels (is itself a suffix, or single-label
    # like "localhost") -> own PLD
    pld = pld.fillna(h)
    pld = pld.mask(is_ip, h)
    return pld.mask(h == "", pd.NA)


# ---- Spark column wrappers (Arrow-batched) ----

@F.pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series, bases: pd.Series) -> pd.Series:
    return canonicalize_series(urls, bases).astype("object")


@F.pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return host_of_series(urls).astype("object")


@F.pandas_udf(StringType())
def pld_udf(hosts: pd.Series) -> pd.Series:
    return pld_series(hosts).astype("object")
