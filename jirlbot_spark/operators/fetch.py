"""Fetch, parse/link-extraction, and payload verification operators.

The reference's crawl threads do live HTTP GETs and hand pages to a parser.
This engine keeps fetch as an INJECTED backend so the pipeline is
deterministic and testable (north rule: reproduce crawl ordering under the
same seed list):

  - table_fetch: the sandbox backend — a join from admitted URLs to the
    image+caption `pages` table on image_id (url -> image_id mapping rides
    on the frontier). Broadcast when small; bucket-partitioned equi-join
    at scale.
  - http fetch on a cluster = groupBy(host).applyInPandas batch HTTP with
    the politeness schedule enforced inside each per-host task (stubbed
    here: no network in the sandbox).

Link extraction (UDTF shape): out-links come either from a link table
(synthetic corpus) or from a vectorized regex extract over page text, then
F.explode — 1→N rows, JVM-side explode, Catalyst-visible.

Payload verification (graft axes A+B): decode image bytes per fmt and check
the per-row invariant — decoded pixels exact (lossless) / PSNR>=40dB
(lossy) against reference pixels, caption equality, phash match — all via
mapInPandas over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PSNR_LOSSY_MIN_DB = 40.0


def table_fetch(
    admitted: DataFrame,
    pages: DataFrame,
    url_image_col: str = "image_id",
) -> DataFrame:
    """Sandbox fetch backend: admitted frontier × pages payload join."""
    return admitted.join(pages, url_image_col, "left")


# ---- HTTP fetch backend (the cluster path; injected, deterministic) ----

HTTP_FETCH_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("url_hash", LongType()),
        StructField("seq_in_host", LongType()),
        StructField("planned_at_s", DoubleType()),
        StructField("status", LongType()),
        StructField("content_type", StringType()),
        StructField("body", BinaryType()),
        StructField("fetched_at_s", DoubleType()),
        StructField("location", StringType()),
        StructField("rtt_ms", LongType()),
    ]
)


def _real_clock_factory():
    import time

    return time.monotonic, time.sleep


def urllib_transport(url: str) -> dict:
    """Default real transport (stdlib only; used on a cluster — this
    sandbox has no network, so tests inject fakes).

    Redirects are NOT auto-followed: a crawler must route 3xx targets
    back through canonicalize -> DRUM dedup -> budgets -> politeness
    like any other discovered URL (auto-following would fetch the target
    immediately, outside the target host's politeness schedule). The
    Location header is surfaced instead; route_redirects turns it into
    frontier candidates."""
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            return None  # pragma: no cover - network-only path

    try:  # pragma: no cover - network-only path
        opener = urllib.request.build_opener(_NoRedirect)
        with opener.open(url, timeout=30) as resp:
            return {
                "status": resp.status,
                "content_type": resp.headers.get("Content-Type", ""),
                "body": resp.read(),
                "location": resp.headers.get("Location", ""),
            }
    except urllib.error.HTTPError as e:  # pragma: no cover
        # 3xx land here with redirects disabled; keep their headers
        return {
            "status": e.code,
            "content_type": e.headers.get("Content-Type", ""),
            "body": b"",
            "location": e.headers.get("Location", ""),
        }
    except Exception:  # pragma: no cover
        return {"status": 0, "content_type": "", "body": b""}


def http_fetch(
    scheduled: DataFrame,
    transport=urllib_transport,
    clock_factory=_real_clock_factory,
    host_col: str = "host",
    url_col: str = "url",
    planned_col: str = "planned_at_s",
    seq_col: str = "seq_in_host",
    hash_col: str = "url_hash",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """The reference's live-fetch path, Spark-first: ONE applyInPandas
    task per host executes that host's URLs strictly in politeness order,
    sleeping until each row's `planned_at_s` offset before issuing the
    request — per-host serialization is structural (a host is exactly one
    group = one task), and the politeness delays computed by
    politeness_schedule are enforced INSIDE the task against a task-local
    clock, so no cross-executor coordination is needed.

    `transport(url) -> {status, content_type, body}` and `clock_factory()
    -> (clock, sleeper)` are injected: the cluster uses the stdlib
    urllib transport + real time; tests inject a fake transport and a
    virtual clock, which makes the schedule-honoring behavior exactly
    assertable offline (north-rule determinism). Input contract =
    politeness_schedule output: (host, url, url_hash, seq_in_host,
    planned_at_s).

    Scale posture: groupBy(host) shuffles the admitted batch once;
    BEAST budgets have already bounded every host's row count, so no
    group outgrows a task (hot-host skew is capped upstream by design,
    not by this operator).

    `carry` names extra columns of `scheduled` (depth, priority,
    image_id, ...) to ride through the per-host task unchanged — the
    crawl loop needs them downstream, and carrying beats re-joining the
    fetch results back to the frontier on url_hash (a second shuffle of
    the whole batch for columns the task already holds).
    """
    carry = tuple(c for c in carry)
    carry_fields = [f for f in scheduled.schema.fields if f.name in carry]
    out_fetch_schema = StructType(HTTP_FETCH_SCHEMA.fields + carry_fields)

    def fetch_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([planned_col, seq_col], kind="mergesort")
        clock, sleeper = clock_factory()
        t0 = clock()
        out = {
            "status": np.zeros(len(pdf), np.int64),
            "content_type": [""] * len(pdf),
            "body": [b""] * len(pdf),
            "fetched_at_s": np.zeros(len(pdf), np.float64),
            "location": [""] * len(pdf),
            "rtt_ms": np.zeros(len(pdf), np.int64),
        }
        for i, (planned, url) in enumerate(
            zip(pdf[planned_col].to_numpy(), pdf[url_col].to_numpy())
        ):
            dt = float(planned) - (clock() - t0)
            if dt > 0:
                sleeper(dt)
            t_req = clock()
            r = transport(url)
            out["rtt_ms"][i] = int(round((clock() - t_req) * 1000))
            out["status"][i] = int(r.get("status", 0))
            out["content_type"][i] = str(r.get("content_type", ""))
            out["body"][i] = bytes(r.get("body", b""))
            out["fetched_at_s"][i] = clock() - t0
            out["location"][i] = str(r.get("location", "") or "")
        res = pd.DataFrame(
            {
                "host": pdf[host_col].to_numpy(),
                "url": pdf[url_col].to_numpy(),
                "url_hash": pdf[hash_col].to_numpy(),
                "seq_in_host": pdf[seq_col].to_numpy(dtype=np.int64),
                "planned_at_s": pdf[planned_col].to_numpy(dtype=np.float64),
                **out,
            }
        )
        for c in carry:
            res[c] = pdf[c].to_numpy()
        return res

    cols = [host_col, url_col, hash_col, seq_col, planned_col, *carry]
    return (
        scheduled.select(*cols)
        .groupBy(host_col)
        .applyInPandas(fetch_host, schema=out_fetch_schema)
    )


def http_backend(
    transport=urllib_transport, clock_factory=_real_clock_factory
):
    """Adapter: package http_fetch as a CrawlLoop `fetch_backend`.

    The loop hands the backend its politeness-scheduled frame and expects
    the frontier metadata (depth/priority/pld_hash/image_id/...) back on
    every fetched row; this closure carries those columns through the
    per-host task (see http_fetch `carry`). On a cluster this is the live
    path: CrawlLoop(..., fetch_backend=http_backend()); tests inject a
    fake transport + virtual clock through the same two parameters.
    """
    meta_cols = (
        "host_hash",
        "pld",
        "pld_hash",
        "depth",
        "priority",
        "enqueue_batch",
        "image_id",
    )

    def backend(scheduled: DataFrame) -> DataFrame:
        carry = tuple(c for c in meta_cols if c in scheduled.columns)
        return http_fetch(
            scheduled,
            transport=transport,
            clock_factory=clock_factory,
            carry=carry,
        )

    return backend


def extract_links(
    fetched: DataFrame,
    link_table: DataFrame,
    src_col: str = "url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Out-links of fetched pages via the link table (synthetic corpus).

    Output: one row per (src, dst) link. The left_semi-then-join shape keeps
    only links whose source page was actually fetched this batch.
    """
    srcs = fetched.select(F.col(src_col).alias("src_url")).distinct()
    return link_table.join(srcs, "src_url", "left_semi").select(
        "src_url", F.col(dst_col).alias("out_url")
    )


def extract_links_from_text(
    fetched: DataFrame, text_col: str = "page_text", src_col: str = "url"
) -> DataFrame:
    """UDTF-shaped extraction: regex-find all hrefs (JVM-side
    regexp_extract_all) then explode — 1→N with no Python."""
    return fetched.select(
        F.col(src_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r'href="([^"]+)"'), F.lit(1)
            )
        ).alias("out_url"),
    )


REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def route_redirects(
    fetched: DataFrame,
    src_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
) -> DataFrame:
    """3xx responses become frontier candidates: (src_url, out_url) rows
    shaped exactly like extracted links, so the crawl loop unions them
    into the link stream and the normal canonicalize -> DRUM dedup ->
    budgets -> politeness path applies. Location may be RELATIVE
    (RFC 7231 §7.1.2); downstream resolution uses src_url as the base
    (prepare_urls_fused base_col). Redirect loops terminate via url_seen
    dedup — a target already seen is never re-enqueued. Pure JVM
    filter+project: no shuffle, vanishes into the fetch stage."""
    return fetched.filter(
        F.col(status_col).isin(*REDIRECT_STATUSES)
        & (F.coalesce(F.col(location_col), F.lit("")) != "")
    ).select(
        F.col(src_col).alias("src_url"),
        F.col(location_col).alias("out_url"),
    )


_VERIFY_SCHEMA_EXTRA = [
    StructField("decode_ok", BooleanType()),
    StructField("pixels_ok", BooleanType()),
    StructField("psnr_db", DoubleType()),
    StructField("caption_ok", BooleanType()),
    StructField("phash_computed", LongType()),
    StructField("phash_ok", BooleanType()),
]


PHASH_LOSSY_MAX_HAMMING = 6  # measured <= 4 at JPEG_QUALITY on fixtures


def verify_payload(
    fetched: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    w_col: str = "w",
    h_col: str = "h",
    caption_col: str = "caption",
    expected_caption_col: str = "expected_caption",
    phash_col: str = "phash",
    ref_pixels_col: str = "ref_pixels",
    id_cols: tuple[str, ...] = ("image_id",),
) -> DataFrame:
    """Decode + verify each payload row (mapInPandas over Arrow batches).

    Emits id columns + decode_ok / pixels_ok / psnr_db / caption_ok /
    phash_computed / phash_ok. Two verification modes per the north rule's
    per-row invariant ("decoded pixels allclose, PSNR>=40dB for lossy"):

      - with a `ref_pixels` column (raw w*h*3 RGB of the TRUE pixels, as
        the fixture generator provides): lossless fmts must decode
        bit-exact vs the reference (psnr_db = inf), lossy fmts must reach
        PSNR >= PSNR_LOSSY_MIN_DB vs the reference (psnr_db = actual);
      - without it: encode->decode closure — a lossless fmt must
        round-trip bit-exact through OUR codec; lossy rows report NaN
        (no reference to measure against).

    phash(decoded) must equal the stored phash column exactly for
    lossless fmts; for lossy fmts equality is up to Hamming distance
    PHASH_LOSSY_MAX_HAMMING (that robustness-to-recompression is the
    point of a perceptual hash; exact equality would re-test the codec,
    not the pipeline).
    """
    from jirlbot_spark.functions.images import (
        LOSSLESS_FMTS,
        decode_image,
        decode_raw,
        encode_image,
        hamming64,
        phash64,
        psnr,
    )

    keep = [f for f in fetched.schema.fields if f.name in id_cols]
    out_schema = StructType(keep + _VERIFY_SCHEMA_EXTRA)
    has_expected = expected_caption_col in fetched.columns
    has_ref = ref_pixels_col in fetched.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            res = {
                "decode_ok": np.zeros(n, bool),
                "pixels_ok": np.zeros(n, bool),
                "psnr_db": np.full(n, np.nan),
                "caption_ok": np.zeros(n, bool),
                "phash_computed": np.zeros(n, np.int64),
                "phash_ok": np.zeros(n, bool),
            }
            cols = {
                c: pdf[c].to_numpy()
                for c in (bytes_col, fmt_col, w_col, h_col, caption_col)
            }
            ref_np = pdf[ref_pixels_col].to_numpy() if has_ref else None
            exp_np = (
                pdf[expected_caption_col].to_numpy() if has_expected else None
            )
            ph_np = pdf[phash_col].to_numpy()
            for i in range(n):
                fmt = cols[fmt_col][i]
                w, h = int(cols[w_col][i]), int(cols[h_col][i])
                lossless = fmt in LOSSLESS_FMTS
                try:
                    px = decode_image(bytes(cols[bytes_col][i]), fmt, w, h)
                    res["decode_ok"][i] = True
                except Exception:
                    continue
                if has_ref and ref_np[i] is not None:
                    ref = decode_raw(bytes(ref_np[i]), w, h)
                    if lossless:
                        exact = bool(np.array_equal(px, ref))
                        res["pixels_ok"][i] = exact
                        res["psnr_db"][i] = (
                            float("inf") if exact else psnr(ref, px)
                        )
                    else:
                        p = psnr(ref, px)
                        res["psnr_db"][i] = p
                        res["pixels_ok"][i] = p >= PSNR_LOSSY_MIN_DB
                elif lossless:
                    rt = decode_image(encode_image(px, fmt), fmt, w, h)
                    exact = bool(np.array_equal(px, rt))
                    res["pixels_ok"][i] = exact
                    res["psnr_db"][i] = float("inf") if exact else psnr(px, rt)
                else:
                    res["psnr_db"][i] = np.nan  # lossy with no reference
                    res["pixels_ok"][i] = False
                ph = phash64(px)
                res["phash_computed"][i] = ph
                stored = ph_np[i]
                if stored is not None:
                    if lossless:
                        res["phash_ok"][i] = ph == int(stored)
                    else:
                        res["phash_ok"][i] = (
                            hamming64(ph, int(stored))
                            <= PHASH_LOSSY_MAX_HAMMING
                        )
                cap = cols[caption_col][i]
                if has_expected:
                    res["caption_ok"][i] = cap == exp_np[i]
                else:
                    res["caption_ok"][i] = bool(
                        isinstance(cap, str) and cap.startswith("caption of ")
                    )
            out = pdf[[c for c in id_cols]].copy()
            for k, v in res.items():
                out[k] = v
            yield out

    return fetched.mapInPandas(run, schema=out_schema)


@F.pandas_udf(LongType())
def phash_udf(
    blobs: pd.Series, fmts: pd.Series, ws: pd.Series, hs: pd.Series
) -> pd.Series:
    from jirlbot_spark.functions.images import phash_batch

    return phash_batch(blobs, fmts, ws, hs)


IMAGE_STATS_FIELDS = [
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("mean_luma", DoubleType()),
    StructField("std_luma", DoubleType()),
    StructField("entropy", DoubleType()),
    StructField("colorfulness", DoubleType()),
    StructField("sharpness", DoubleType()),
]


def image_stats(
    pages: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Per-image curation signals over decoded payloads — the
    image-side analog of the text quality_score operator (LAION-style
    filtering keys on exactly these: luma stats, histogram entropy,
    colorfulness, a sharpness/blur proxy; images.image_stats_array
    documents each). Undecodable payloads emit decode_ok=False with
    NaN stats instead of failing the batch — curation must survive the
    garbage it exists to filter.

    Scale posture: one mapInPandas over rows already co-located by the
    fetch join; decode runs per DISTINCT payload upstream when driven
    from the crawl loop (plans/loop.py dedupes on image_id before
    re-attaching bytes), and the stats themselves are a handful of
    numpy reductions per image — decode dominates."""
    from jirlbot_spark.functions.images import decode_image, image_stats_array

    out_schema = StructType(IMAGE_STATS_FIELDS)
    stat_keys = [f.name for f in IMAGE_STATS_FIELDS[2:]]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            res = {
                "decode_ok": np.zeros(n, bool),
                **{k: np.full(n, np.nan) for k in stat_keys},
            }
            blobs = pdf[bytes_col].to_numpy()
            fmts = pdf[fmt_col].to_numpy()
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            for i in range(n):
                try:
                    px = decode_image(
                        bytes(blobs[i]), fmts[i], int(ws[i]), int(hs[i])
                    )
                except Exception:
                    continue
                res["decode_ok"][i] = True
                for k, v in image_stats_array(px).items():
                    res[k][i] = v
            out = pdf[[id_col]].copy()
            for k, v in res.items():
                out[k] = v
            yield out

    return pages.mapInPandas(run, schema=out_schema)
