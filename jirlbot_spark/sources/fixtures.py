"""Deterministic synthetic fixtures (FIXTURES.md §A).

All generators are pure functions of (seed, scale) via numpy default_rng —
no wall clock, no global state. They produce:

  - pages:     the image+caption pair table in the exact input-hint shape
               (image_id, bytes, w, h, fmt, caption, phash)
  - seed_urls: dirty seed list (uppercase hosts, :80, fragments, dot
               segments, post-canonicalization duplicates)
  - web_graph: power-law out-degree link structure with a hot-PLD skew knob
               and spam clusters (huge intra-links, no external in-links)
  - robots:    per-host disallow lists + crawl delays

These drive the pytest goldens and the benchmark frontier. The driver's
/root/testdata tables are used for the DuckDB oracle instead (read-only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from jirlbot_spark.functions.images import (
    LOSSLESS_FMTS,
    encode_image,
    phash64,
)

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper "
    "krill lumen marble nectar onyx prism quartz reed slate tundra"
).split()


def gen_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Seeded gradient + noise — structured enough for meaningful phash."""
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    base = np.stack(
        [
            (gx + gy) / 2,
            np.abs(gx - gy),
            np.full((h, w), rng.integers(0, 256)),
        ],
        axis=-1,
    )
    noise = rng.integers(0, 32, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def gen_pages(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    recs = []
    for idx in range(n):
        w = int(rng.choice([16, 32, 64]))
        h = int(rng.choice([16, 32, 64]))
        fmt = str(rng.choice(LOSSLESS_FMTS))
        px = gen_pixels(rng, w, h)
        if fmt == "gif":
            # GIF is palette-limited: posterize BEFORE storing so the
            # row's pixels/phash describe exactly what the bytes carry
            # and the lossless invariant holds (functions/gif.py)
            from jirlbot_spark.functions.gif import posterize

            px = posterize(px)
        elif fmt == "tiffg4":
            # fax is bilevel: threshold BEFORE storing, same contract
            from jirlbot_spark.functions.ccitt import bilevel

            px = bilevel(px)
        words = " ".join(rng.choice(_WORDS, size=5))
        image_id = f"img{idx:010d}"
        recs.append(
            {
                "image_id": image_id,
                "bytes": encode_image(px, fmt),
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"caption of {image_id}: {words}",
                "phash": phash64(px),
            }
        )
    return pd.DataFrame.from_records(recs)


def gen_pages_lossy(seed: int, n: int) -> pd.DataFrame:
    """Image+caption pages in the input-hint shape PLUS a `ref_pixels`
    column (raw w*h*3 RGB of the true pixels). Two of three rows are JPEG
    (the engine's own baseline codec — lossy, exercising the PSNR>=40dB
    branch of the payload invariant); the rest PNG (exact branch). The
    reference column is what verify_payload measures decoded pixels
    against, per the north rule."""
    rng = np.random.default_rng(seed)
    fmts = ["jpeg", "jpeg", "png"]
    recs = []
    for idx in range(n):
        w = int(rng.choice([16, 32, 64]))
        h = int(rng.choice([16, 32, 64]))
        fmt = fmts[idx % len(fmts)]
        px = gen_pixels(rng, w, h)
        words = " ".join(rng.choice(_WORDS, size=5))
        image_id = f"img{idx:010d}"
        if fmt == "jpeg" and idx % 6 == 1:
            # every few jpeg rows are PROGRESSIVE (SOF2) — same quantized
            # coefficients, so the PSNR>=40dB invariant is untouched, but
            # the multi-scan decode path runs inside the Spark contract
            from jirlbot_spark.functions.images import JPEG_QUALITY
            from jirlbot_spark.functions.jpeg import encode_jpeg

            blob = encode_jpeg(px, quality=JPEG_QUALITY, progressive=True)
        else:
            blob = encode_image(px, fmt)
        recs.append(
            {
                "image_id": image_id,
                "bytes": blob,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"caption of {image_id}: {words}",
                "phash": phash64(px),
                "ref_pixels": px.tobytes(),
            }
        )
    return pd.DataFrame.from_records(recs)


def gen_seed_urls(seed: int, n_sites: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1)
    rows = []
    for k in range(n_sites):
        url = f"http://site{k}.tld{k % 7}.com/"
        rows.append({"url": url, "depth": 0})
        dirty = rng.integers(0, 4)
        if dirty == 1:
            rows.append(
                {"url": f"HTTP://SITE{k}.tld{k % 7}.COM:80/#top", "depth": 0}
            )
        elif dirty == 2:
            rows.append(
                {"url": f"http://site{k}.tld{k % 7}.com/a/../", "depth": 0}
            )
    return pd.DataFrame(rows)


def robots_rfc_scenario() -> tuple[pd.DataFrame, pd.DataFrame]:
    """Fixture for the robots_rfc driver key: (bodies, urls).

    bodies: (host, body) raw robots.txt exercising the full documented
    grammar — comments, mixed-case directives, consecutive User-agent
    lines sharing one group, specific-UA-beats-* group choice, Allow vs
    Disallow longest-match with allow winning ties, mid-rule `*`
    wildcards, `$` end anchors, regex metachars in paths, the "/"
    disallow-everything sentinel, an empty Disallow (allow-all), and a
    malformed Crawl-delay that must degrade to the default, not throw.
    urls: (url_id, host, path) probing every rule boundary.
    """
    bodies = [
        # longest-match + allow-tie-wins + $ anchor + mid wildcard
        (
            "a.com",
            "# fixture\n"
            "User-agent: *\n"
            "Disallow: /private/\n"
            "Allow: /private/pub/\n"
            "Disallow: /*.json$\n"
            "Allow: /api/\n"
            "Disallow: /api/internal\n"
            "Crawl-delay: 2.5\n",
        ),
        # specific group beats *: jirlbot gets a laxer policy
        (
            "b.com",
            "User-agent: *\n"
            "Disallow: /\n"
            "\n"
            "User-agent: jirlbot\n"
            "Disallow: /only-this/\n"
            "Crawl-delay: 10s\n",  # malformed -> default delay
        ),
        # consecutive UA lines share one group; regex metachars in rule
        (
            "c.com",
            "User-agent: otherbot\n"
            "User-agent: jirl\n"
            "Disallow: /a(b)+c?/\n"
            "Allow:\n",  # empty Allow value is dropped
        ),
        # "/" sentinel in the only applicable (*) group
        ("d.com", "User-agent: *\nDisallow: /\n"),
        # allow-all: no matching group at all
        ("e.com", "User-agent: nobody\nDisallow: /\n"),
        # empty body -> allow-all with empty rule arrays
        ("f.com", "\n"),
    ]
    probes = [
        ("a.com", "/private/x"),          # FAIL (disallow /private/)
        ("a.com", "/private/pub/x"),      # PASS (longer allow wins)
        ("a.com", "/data/feed.json"),     # FAIL ($-anchored wildcard)
        ("a.com", "/data/feed.json5"),    # PASS ($ anchor excludes)
        ("a.com", "/api/ok"),             # PASS (allow /api/)
        ("a.com", "/api/internal/x"),     # FAIL (longer disallow wins)
        ("a.com", "/open"),               # PASS
        ("b.com", "/anything"),           # PASS (specific group is laxer)
        ("b.com", "/only-this/x"),        # FAIL (specific group rule)
        ("c.com", "/a(b)+c?/zz"),         # FAIL (escaped metachars match)
        ("c.com", "/abbc/zz"),            # PASS (no regex interpretation)
        ("d.com", "/"),                   # FAIL (sentinel)
        ("d.com", "/any/depth"),          # FAIL
        ("e.com", "/x"),                  # PASS (no applicable group)
        ("f.com", "/x"),                  # PASS (empty body)
    ]
    urls = pd.DataFrame(
        [
            {"url_id": i, "host": h, "path": p}
            for i, (h, p) in enumerate(probes)
        ]
    )
    return pd.DataFrame(bodies, columns=["host", "body"]), urls


def gen_hash_urls(n: int) -> pd.DataFrame:
    """Deterministic canonical-URL corpus for the url_hash driver key:
    (url_id, url) with lengths sweeping every residue mod 16 so the
    murmur3 128-bit block loop AND all 15 tail-switch arms are exercised
    by the driver contract (not just by pytest)."""
    rows = []
    for i in range(n):
        url = (
            f"http://site{i % 53}.example{i % 7}.com/p/{i}"
            + "x" * (i % 16)
            + (f"?q={i % 29}" if i % 3 == 0 else "")
        )
        rows.append({"url_id": i, "url": url})
    return pd.DataFrame(rows)


def gen_web_graph(
    seed: int,
    n_sites: int,
    pages_per_site: int = 10,
    hot_fraction: float = 0.2,
    n_spam: int = 3,
    scale: int = 1000,
) -> pd.DataFrame:
    """Edges src_url -> dst_url; Zipf out-degree; `hot_fraction` of edges
    target site0 (the hot PLD); spam sites only link within themselves."""
    rng = np.random.default_rng(seed + 2)
    hosts = [f"site{k}.tld{k % 7}.com" for k in range(n_sites)]
    spam_hosts = [f"spam{j}.junk.com" for j in range(n_spam)]
    edges = []
    for k, host in enumerate(hosts):
        for p in range(pages_per_site):
            src = f"http://{host}/p{p}"
            deg = min(int(rng.zipf(1.5)), 30)
            for _ in range(deg):
                if rng.random() < hot_fraction:
                    dst_host = hosts[0]
                else:
                    dst_host = hosts[int(rng.integers(0, n_sites))]
                dst = f"http://{dst_host}/p{int(rng.integers(0, pages_per_site))}"
                edges.append({"src_url": src, "dst_url": dst, "anchor": "x"})
    for sh in spam_hosts:
        for p in range(pages_per_site):
            src = f"http://{sh}/p{p}"
            for q in range(20):  # heavy intra-PLD linking, no external
                edges.append(
                    {
                        "src_url": src,
                        "dst_url": f"http://{sh}/p{(p + q) % pages_per_site}",
                        "anchor": "spam",
                    }
                )
    df = pd.DataFrame(edges)
    # deterministic url -> image_id payload mapping (FIXTURES.md A3);
    # crc32, not Python hash() (which is salted per process)
    import zlib

    df["image_id"] = df["src_url"].map(
        lambda u: f"img{zlib.crc32(u.encode()) % scale:010d}"
    )
    return df


def gen_robots(seed: int, hosts: list[str]) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 3)
    rules_pool = ["/private", "/tmp", "/x"]
    rows = []
    for h in hosts:
        r = rng.random()
        if r < 0.1:
            dis = ["/"]  # disallow-all
        elif r < 0.5:
            dis = list(
                rng.choice(rules_pool, size=int(rng.integers(1, 3)), replace=False)
            )
        else:
            dis = []
        rows.append(
            {
                "host": h,
                "disallow": dis,
                "crawl_delay": float(rng.choice([0.0, 1.0, 5.0])),
            }
        )
    return pd.DataFrame(rows)


def gen_documents(seed: int, n: int) -> pd.DataFrame:
    """Seeded text corpus with engineered near-duplicates: every 5th doc
    is its predecessor with ONE word substituted (SimHash hamming small),
    every 7th an exact clone of the doc three back (pairwise clusters,
    not one giant clique). Drives the dedup_simhash driver key
    (fixture-seeded like the media keys, so its golden is
    sf-independent) and text-op tests."""
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    for i in range(n):
        if i >= 7 and i % 7 == 0:
            texts.append(texts[i - 3])
        elif i > 0 and i % 5 == 0:
            words = texts[i - 1].split()
            words[int(rng.integers(0, len(words)))] = str(
                rng.choice(_WORDS)
            )
            texts.append(" ".join(words))
        else:
            k = int(rng.integers(20, 60))
            texts.append(" ".join(rng.choice(_WORDS, size=k)))
    return pd.DataFrame({"doc_id": range(n), "text": texts})


def gen_phash_corpus(seed: int, n: int) -> pd.DataFrame:
    """Seeded (image_id, phash) corpus with engineered near-duplicates
    for the dedup_phash driver key: n base rows of uniform 64-bit
    hashes, plus for each of the first n//8 rows a copy with k seeded
    bit flips — k cycling 1..10, so flips land BOTH inside (<=7) and
    outside (8..10) the operator's default Hamming band, asserting
    exclusion as well as recall — plus exact duplicates of every 16th
    row (hamming-0 pairs through the same path)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)
    ids = [f"img{i:05d}" for i in range(n)]
    hashes = list(base)
    for i in range(n // 8):
        k = (i % 10) + 1
        flips = rng.choice(64, size=k, replace=False)
        m = 0
        for f in flips:
            m ^= 1 << int(f)
        v = (int(base[i]) & 0xFFFFFFFFFFFFFFFF) ^ m  # unsigned xor
        ids.append(f"flip{i:05d}_{k}")
        hashes.append(np.int64(v - (1 << 64) if v >= 1 << 63 else v))
    for i in range(0, n, 16):
        ids.append(f"copy{i:05d}")
        hashes.append(base[i])
    return pd.DataFrame(
        {"image_id": ids, "phash": np.array(hashes, np.int64)}
    )


def gen_caption_corpus(seed: int, n: int) -> pd.DataFrame:
    """Seeded (image_id, caption, phash) pair corpus with engineered
    consistency defects for the caption_consistency driver key:
      - BOILERPLATE captions: every 10th row draws one of 4 stock
        captions, shared across distinct images;
      - DIVERGENT captions: every 8th image's phash reappears under a
        new image_id with a different caption;
      - exact dup pairs: every 16th row repeated verbatim under a new
        image_id (same caption AND same phash);
      - all other rows are unique on both axes.
    Captions are quote-free ASCII so the corpus embeds in a SQL VALUES
    clause verbatim."""
    rng = np.random.default_rng(seed)
    phashes = rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)
    stock = ["a photo", "an image", "picture of something", "img"]
    rows: list[tuple[str, str, int]] = []
    for i in range(n):
        if i % 10 == 0:
            cap = stock[(i // 10) % len(stock)]
        else:
            cap = f"caption {i} {int(rng.integers(0, 1_000_000))}"
        rows.append((f"img{i:05d}", cap, int(phashes[i])))
    base = list(rows)
    for i in range(0, n, 8):
        rows.append((f"alt{i:05d}", f"different caption {i}", base[i][2]))
    for i in range(0, n, 16):
        rows.append((f"dup{i:05d}", base[i][1], base[i][2]))
    return pd.DataFrame(rows, columns=["image_id", "caption", "phash"])


def gen_embeddings(seed: int, n: int, dim: int = 64) -> pd.DataFrame:
    """Seeded float32 embedding corpus (vec_id, embedding[dim]) for the
    fixture-keyed ANN driver checks — sf-independent like the media
    fixtures. Every 9th vector is a noisy copy of the one three back, so
    top-k has engineered true neighbors."""
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(9, n, 9):
        mat[i] = mat[i - 3] + 0.05 * rng.standard_normal(dim).astype(
            np.float32
        )
    return pd.DataFrame(
        {"vec_id": range(n), "embedding": [row.copy() for row in mat]}
    )


def resume_scenario():
    """Shared fixture for the resume_state driver key: a small-but-nontrivial
    crawl world (8 sites, ring + cross links, one disallowed host, varied
    crawl delays, BEAST-deferral-inducing budgets). Defined ONCE here so the
    Spark crawl loop (q_resume_state) and the pure-Python simulator golden
    (tools/gen_goldens.py via tests/oracle_sim.py) consume identical inputs.

    Returns (seeds, web_graph, robots, cfg_kwargs, n_batches)."""
    seeds = [
        "http://site0.com/",
        "HTTP://SITE1.com:80/#top",      # dirty: canonicalizes to site1.com
        "http://site2.com/a/../",        # dot segments
        "http://site3.com/",
        "http://site4.com/",
        "http://site5.com/",
        "http://site1.com/",             # duplicate after canonicalization
        "ftp://nope.com/",               # rejected scheme
    ]
    graph = []
    for i in range(8):
        root = f"http://site{i}.com/"
        graph.append((root, f"http://site{(i + 1) % 8}.com/"))
        for p in range(3):
            graph.append((root, f"http://site{i}.com/p{p}"))
        graph.append(
            (f"http://site{i}.com/p0", f"http://site{(i + 2) % 8}.com/p1")
        )
        graph.append(
            (f"http://site{i}.com/p1", f"http://site{(i + 3) % 8}.com/")
        )
    graph.append(("http://site1.com/", "http://priv.site9.com/secret/x"))
    graph.append(("http://site2.com/", "http://site9.com/ok"))
    graph.append(("http://spam.junk.com/a", "http://spam.junk.com/b"))
    robots = {f"site{i}.com": ([], float(i % 3)) for i in range(8)}
    robots["priv.site9.com"] = (["/secret"], 0.0)
    robots["site9.com"] = ([], 1.0)
    cfg = dict(top_k=4, b_hi=6, b_lo=2, default_budget=3, min_delay_s=1.0)
    # 3 batches (2 before the resume split + 1 after): 20 fetches, still
    # covering dedup, the disallowed host, varied delays, and BEAST
    # deferral — batch 4 added 6 more fetches for ~15 s of extra wall
    # time in the driver's correctness window (r3 verdict item 6)
    return seeds, graph, robots, cfg, 3


def gen_audio(seed: int, n: int) -> pd.DataFrame:
    """Deterministic audio payload rows (media.AUDIO_SCHEMA shape).

    "wav" rows carry REAL RIFF/WAVE bytes (deterministic sine+noise
    mono waveforms across PCM 8/16/24/32-bit and float32 — decoded for
    real by media.decode_wav); "flac" rows carry REAL FLAC bitstreams
    (the engine's own rice/fixed-predictor codec, functions/flac.py);
    "au" rows carry REAL Sun AU bytes alternating PCM16 and G.711
    µ-law, and "aiff" rows REAL AIFF PCM at 8/16/24/32 bits (both via
    functions/aiff_au.py, wild-validated against CPython's third-party
    audiodata files); "mp3" rows carry CONTAINER-REAL stub streams
    (functions/mp3.py
    encode_mp3_stub: valid MPEG frame headers + junk payloads — the
    header walk measures true duration/rate while sample decode stays
    honestly gated behind media's fake backend). Every 4th mp3 row is
    VBR-shaped so the per-frame-length walk is exercised."""
    from jirlbot_spark.functions.aiff_au import encode_aiff, encode_au
    from jirlbot_spark.functions.flac import encode_flac
    from jirlbot_spark.functions.media import encode_wav
    from jirlbot_spark.functions.mp3 import encode_mp3_stub, mp3_info

    rng = np.random.default_rng(seed)
    depths = [(8, False), (16, False), (24, False), (32, False), (32, True)]
    aiff_bits = [8, 16, 24, 32]
    recs = []
    for idx in range(n):
        sr = int(rng.choice([8000, 16000, 44100]))
        n_samples = int(rng.integers(sr // 2, sr * 3))
        fmt = str(rng.choice(["wav", "flac", "mp3", "au", "aiff"]))
        if fmt in ("wav", "flac", "au", "aiff"):
            t = np.arange(n_samples) / sr
            freq = float(rng.uniform(80.0, 2000.0))
            wave = 0.7 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(
                n_samples
            )
            if fmt == "flac":
                w = np.clip(wave, -1, 1)
                if idx % 3 == 0:
                    # stereo rows: a correlated right channel (derived
                    # from the same wave — no extra rng draws, so the
                    # other rows' blobs are untouched) exercises the
                    # codec's per-frame stereo-decorrelation choice
                    w = np.stack([w, np.clip(np.roll(w, 7) * 0.8, -1, 1)], 1)
                blob = encode_flac(w, sr, bits=16 if idx % 2 else 8)
            elif fmt == "au":
                # alternate real PCM16 and real G.711 µ-law payloads
                blob = encode_au(
                    np.clip(wave, -1, 1),
                    sr,
                    encoding="ulaw" if idx % 2 else "pcm16",
                )
            elif fmt == "aiff":
                blob = encode_aiff(
                    np.clip(wave, -1, 1),
                    sr,
                    bits=aiff_bits[idx % len(aiff_bits)],
                )
            else:
                bits, f32 = depths[idx % len(depths)]
                blob = encode_wav(
                    np.clip(wave, -1, 1), sr, bits=bits, float32=f32
                )
        else:
            blob = encode_mp3_stub(
                sr,
                n_samples,
                channels=1 + idx % 2,
                bitrate_kbps=int(rng.choice([64, 96, 128])),
                vbr_cycle=(64, 112, 128) if idx % 4 == 0 else (),
                seed=idx,
                id3_bytes=120 if idx % 5 == 0 else 0,
            )
            # metadata matches the stream (the walk rounds up to a
            # whole MPEG frame)
            n_samples = mp3_info(blob)["n_samples"]
        recs.append(
            {
                "audio_id": f"aud{idx:08d}",
                "bytes": blob,
                "fmt": fmt,
                "sample_rate": sr,
                "n_samples": n_samples,
                "caption": f"audio clip {idx}",
            }
        )
    return pd.DataFrame.from_records(recs)


def gen_video(seed: int, n: int) -> pd.DataFrame:
    """Deterministic video payload rows (media.VIDEO_SCHEMA shape).

    "avi" rows carry REAL uncompressed-AVI bytes and "mjpg" rows REAL
    MJPEG-in-AVI bytes (deterministic moving-gradient frames — both
    decoded for real by media.decode_avi, the MJPEG path through the
    engine's own JPEG codec). Every other "mp4" row carries REAL
    Motion-JPEG-in-mp4 bytes (encode_mp4_mjpeg — decoded for real via
    the stsz/stsc/stco sample-table walk + the engine's JPEG codec);
    the rest carry CONTAINER-REAL stub boxes (functions/mp4.py
    encode_mp4_stub: valid ISO-BMFF structure + junk avc1 mdat). "webm"
    rows are CONTAINER-REAL stub EBML (functions/webm.py: valid
    Segment/Tracks/Cluster structure + junk SimpleBlocks) — the
    box/element walks measure true n_frames/dimensions while frame
    pixels for avc1/webm stay honestly gated."""
    from jirlbot_spark.functions.media import encode_avi
    from jirlbot_spark.functions.mp4 import encode_mp4_stub
    from jirlbot_spark.functions.webm import encode_webm_stub

    rng = np.random.default_rng(seed)
    recs = []
    for idx in range(n):
        w = int(rng.choice([16, 32]))
        h = int(rng.choice([16, 32]))
        n_frames = int(rng.integers(5, 60))
        fps = float(rng.choice([24.0, 30.0]))
        fmt = str(rng.choice(["avi", "mjpg", "mp4", "webm", "gif"]))
        if fmt == "gif":
            # REAL animated-GIF bytes (posterized moving gradient so the
            # one global palette holds all frames losslessly)
            from jirlbot_spark.functions.gif import (
                encode_gif_anim,
                posterize,
            )

            f = np.arange(n_frames, dtype=np.int32)[:, None, None, None]
            y = np.arange(h, dtype=np.int32)[None, :, None, None]
            x = np.arange(w, dtype=np.int32)[None, None, :, None]
            c = np.arange(3, dtype=np.int32)[None, None, None, :]
            frames = ((x * 3 + y * 5 + f * 7 + c * 11 + idx) % 256).astype(
                np.uint8
            )
            frames = np.stack([posterize(fr) for fr in frames])
            blob = encode_gif_anim(frames, delay_cs=max(1, round(100 / fps)))
        elif fmt in ("avi", "mjpg"):
            f = np.arange(n_frames, dtype=np.int32)[:, None, None, None]
            y = np.arange(h, dtype=np.int32)[None, :, None, None]
            x = np.arange(w, dtype=np.int32)[None, None, :, None]
            c = np.arange(3, dtype=np.int32)[None, None, None, :]
            frames = ((x * 3 + y * 5 + f * 7 + c * 11 + idx) % 256).astype(
                np.uint8
            )
            blob = encode_avi(
                frames,
                fps=fps,
                codec="raw" if fmt == "avi" else "mjpg",
                # every third mjpg row is 4:2:0 — the dominant wild
                # chroma layout — so subsampled JPEG decode runs inside
                # the Spark operator path, not just unit tests
                subsample="420" if fmt == "mjpg" and idx % 3 == 0 else "444",
            )
        elif fmt == "mp4":
            if idx % 2 == 0:
                # REAL Motion-JPEG-in-mp4 bytes (functions/mp4.py
                # encode_mp4_mjpeg): frame_sample decodes these for real
                # through the sample-table walk + the engine's JPEG codec
                from jirlbot_spark.functions.mp4 import encode_mp4_mjpeg

                f = np.arange(n_frames, dtype=np.int32)[:, None, None, None]
                y = np.arange(h, dtype=np.int32)[None, :, None, None]
                x = np.arange(w, dtype=np.int32)[None, None, :, None]
                c = np.arange(3, dtype=np.int32)[None, None, None, :]
                frames = (
                    (x * 3 + y * 5 + f * 7 + c * 11 + idx) % 256
                ).astype(np.uint8)
                blob = encode_mp4_mjpeg(
                    frames,
                    fps=fps,
                    subsample="420" if idx % 4 == 0 else "444",
                )
            else:
                blob = encode_mp4_stub(w, h, n_frames, fps=fps, seed=idx)
        else:
            blob = encode_webm_stub(w, h, n_frames, fps=fps, seed=idx)
        recs.append(
            {
                "video_id": f"vid{idx:08d}",
                "bytes": blob,
                "fmt": fmt,
                "w": w,
                "h": h,
                "n_frames": n_frames,
                "fps": fps,
                "caption": f"video clip {idx}",
            }
        )
    return pd.DataFrame.from_records(recs)


def sitemap_scenario() -> list[tuple[str, str]]:
    """Fixture for the sitemap_parse driver key: (src, body_text) docs —
    a urlset (entities, lastmod, whitespace, mixed-case tags, a loc-less
    block dropped per spec), a sitemapindex, a plain-text sitemap with
    CRLF + junk lines, and a non-sitemap HTML page yielding nothing.
    Shared verbatim by the Spark key and its DuckDB twin (the twin
    re-implements the extraction in pure SQL — an independent oracle)."""
    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <url>\n"
        "    <loc> http://ex-a.com/p?x=1&amp;y=2 </loc>\n"
        "    <lastmod>2026-01-04</lastmod>\n"
        "  </url>\n"
        "  <URL><LOC>http://ex-a.com/o&apos;brien</LOC></URL>\n"
        "  <url><priority>0.5</priority></url>\n"
        "</urlset>"
    )
    index = (
        "<sitemapindex>\n"
        "  <sitemap><loc>http://ex-b.com/maps/a.xml.gz</loc>\n"
        "    <lastmod>2025-12-31T23:59:59+00:00</lastmod></sitemap>\n"
        "  <sitemap><loc>http://ex-b.com/maps/b.xml</loc></sitemap>\n"
        "</sitemapindex>"
    )
    plain = (
        "http://ex-c.com/t1\r\n"
        "  https://ex-c.com/t2  \r\n"
        "# comment line\r\n"
        "\r\n"
        "ftp://ex-c.com/nope"
    )
    html = "<html><body><a href=\"/x\">not a sitemap</a></body></html>"
    return [
        ("http://ex-a.com/sitemap.xml", urlset),
        ("http://ex-b.com/sitemap-index.xml", index),
        ("http://ex-c.com/sitemap.txt", plain),
        ("http://ex-d.com/page.html", html),
    ]


def redirect_scenario() -> list[tuple[str, int, str]]:
    """Fixture for the redirect_resolve driver key: (src_url, status,
    location) covering every RFC 3986 merge class a Location header
    hits — absolute, scheme-relative, absolute-path, query-only,
    fragment-only (base query survives), relative-path — plus non-3xx
    and empty-Location rows the operator must drop. Inputs are chosen
    canonical-clean (lowercase hosts, no ports/escapes/dot-segments) so
    the DuckDB twin's pure-SQL resolution is exact; the messy-input
    space is covered by the urljoin cross-check and canonicalize
    goldens in tests/."""
    return [
        ("http://a-site.com/dir/page?q=7", 301, "/moved?x=1#frag"),
        ("http://b-site.com/p1", 302, "http://c-site.com/abs"),
        ("https://d-site.com/a/b", 307, "next/step"),
        ("http://e-site.com/x?old=1", 308, "?new=2"),
        ("http://f-site.com/y", 303, "//g-site.com/scheme-rel"),
        ("http://h-site.com/frag?keep=1", 301, "#anchor-only"),
        ("http://i-site.com/ok", 200, "/not-a-redirect"),
        ("http://j-site.com/none", 301, ""),
        ("https://k-site.com/deep/tree/leaf", 302, "sibling?b=2"),
    ]


def warc_scenario() -> list[tuple[str, int, str, bytes]]:
    """Fixture for the warc_roundtrip driver key: (url, status,
    content_type, body) fetch results exported to WARC and read back.
    The DuckDB twin carries the same tuples as VALUES with zlib-crc32
    payload checksums (an implementation independent of the JVM crc32
    the Spark side computes)."""
    return [
        ("http://wa-site.com/x", 200, "text/html", b"<html>alpha</html>"),
        ("http://wa-site.com/y", 404, "text/plain", b"gone"),
        ("http://wb-site.com/img", 200, "image/png", bytes(range(256))),
        ("http://wc-site.com/empty", 200, "text/plain", b""),
        ("http://wd-site.com/u?q=%C3%A9", 301, "text/html", b"moved"),
    ]


def gen_meta_images(seed: int, n: int) -> pd.DataFrame:
    """Fixture for the image_scrub driver key: (image_id, fmt, bytes)
    rows in PNG/JPEG/GIF with REAL metadata blocks spliced into the
    engine's own encodes — PNG tEXt/tIME/eXIf chunks after IHDR, JPEG
    COM + APP1-Exif after SOI, GIF comment + XMP application extensions
    after the color table — plus every third row left as the bare
    encode (the scrub must count, not assume). Pixel payloads are
    untouched by the splice, so decode(original) == decode(scrubbed)
    byte-for-byte (pinned at golden-generation time and in pytest)."""
    from jirlbot_spark.functions.images import _chunk, encode_image
    from jirlbot_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    recs = []
    for idx in range(n):
        fmt = ("png", "jpeg", "gif")[idx % 3]
        w = int(rng.choice([16, 32]))
        h = int(rng.choice([16, 32]))
        px = gen_pixels(rng, w, h)
        if fmt == "png":
            data = encode_image(px, "png")
        elif fmt == "gif":
            from jirlbot_spark.functions.gif import posterize

            px = posterize(px)
            data = encode_image(px, "gif")
        else:
            data = encode_jpeg(px, quality=90)
        bare = idx % 3 == idx % 9 // 3  # deterministic mix of bare rows
        if not bare:
            note = f"camera note {idx}".encode()
            if fmt == "png":
                head, rest = data[:33], data[33:]  # sig + IHDR = 33
                data = (
                    head
                    + _chunk(b"tEXt", b"Comment\x00" + note)
                    + _chunk(b"tIME", bytes(7))
                    + _chunk(b"eXIf", b"II*\x00" + bytes(4))
                    + rest
                )
            elif fmt == "jpeg":
                com = b"\xff\xfe" + (len(note) + 2).to_bytes(2, "big") + note
                exif = b"Exif\x00\x00II*\x00" + bytes(8)
                app1 = (
                    b"\xff\xe1"
                    + (len(exif) + 2).to_bytes(2, "big")
                    + exif
                )
                data = data[:2] + com + app1 + data[2:]
            else:
                packed = data[10]
                cut = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
                comment = b"\x21\xfe" + bytes([len(note)]) + note + b"\x00"
                xmp = (
                    b"\x21\xff\x0bXMP DataXMP"
                    + bytes([4])
                    + b"<x/>"
                    + b"\x00"
                )
                data = data[:cut] + comment + xmp + data[cut:]
        recs.append(
            {"image_id": f"meta{idx:06d}", "fmt": fmt, "bytes": data}
        )
    return pd.DataFrame.from_records(recs)
