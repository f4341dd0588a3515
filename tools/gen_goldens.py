"""Generate jirlbot_spark/goldens_sql.py — exact DuckDB VALUES oracles for
the deterministic-fixture driver keys.

Principle: these keys run over generator-seeded fixtures (sources/
fixtures.py), not the sf parquet tables, so no table-derived SQL can
express them. But the fixtures are pure functions of a pinned seed, so the
EXPECTED output is computable here by direct function application
(generator + codecs + numpy feature math — no Spark, no mapInPandas): the
oracle then asserts the Spark-side plumbing (Arrow batching, mapInPandas
schemas, explode cardinality) reproduces the direct computation
bit-for-bit. Rerun this script whenever the fixture generators or codec
functions change:

    python tools/gen_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jirlbot_spark.functions.images import decode_image, phash64  # noqa: E402
from jirlbot_spark.functions.media import (  # noqa: E402
    fake_decode_audio,
    fake_decode_frame,
    resize_pixels,
)
from jirlbot_spark.sources.fixtures import (  # noqa: E402
    gen_audio,
    gen_pages,
    gen_video,
)


def lit(v) -> str:
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (int, np.integer)):
        return f"CAST({int(v)} AS BIGINT)"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if np.isinf(f):
            return "CAST('infinity' AS DOUBLE)" if f > 0 else "CAST('-infinity' AS DOUBLE)"
        if np.isnan(f):
            return "CAST('nan' AS DOUBLE)"
        # via string: a bare decimal literal parses as DECIMAL first and
        # can lose the final bit on the way to DOUBLE
        return f"CAST('{f!r}' AS DOUBLE)"
    raise TypeError(f"unsupported literal {type(v)}")


def values_sql(cols: list[str], rows: list[tuple], int_cols: tuple[str, ...] = ()) -> str:
    """SELECT over VALUES; int_cols are presented as INT (not BIGINT) to
    match Spark integer columns."""
    body = ",\n              ".join(
        "(" + ", ".join(lit(v) for v in r) + ")" for r in rows
    )
    sel = ", ".join(
        f"CAST({c} AS INT) AS {c}" if c in int_cols else c for c in cols
    )
    return (
        f"\n            SELECT {sel} FROM (VALUES\n              {body}\n"
        f"            ) AS t({', '.join(cols)})\n        "
    )


def golden_image_verify() -> str:
    pages = gen_pages(42, 128)
    rows = []
    for r in pages.itertuples():
        px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        ph = phash64(px)
        rows.append(
            (
                r.image_id,
                True,                      # decode_ok
                True,                      # pixels_ok (lossless round-trip)
                float("inf"),              # psnr_db
                True,                      # caption_ok
                ph,                        # phash_computed
                ph == r.phash,             # phash_ok
            )
        )
    return values_sql(
        [
            "image_id",
            "decode_ok",
            "pixels_ok",
            "psnr_db",
            "caption_ok",
            "phash_computed",
            "phash_ok",
        ],
        rows,
    )


def golden_image_verify_lossy() -> str:
    from jirlbot_spark.functions.images import hamming64, psnr
    from jirlbot_spark.operators.fetch import (
        PHASH_LOSSY_MAX_HAMMING,
        PSNR_LOSSY_MIN_DB,
    )
    from jirlbot_spark.sources.fixtures import gen_pages_lossy

    pages = gen_pages_lossy(43, 96)
    rows = []
    for r in pages.itertuples():
        px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        ref = np.frombuffer(r.ref_pixels, np.uint8).reshape(r.h, r.w, 3)
        ph = phash64(px)
        if r.fmt == "png":
            exact = bool(np.array_equal(px, ref))
            pixels_ok, p = exact, float("inf") if exact else psnr(ref, px)
            phash_ok = ph == r.phash
        else:
            p = psnr(ref, px)
            pixels_ok = p >= PSNR_LOSSY_MIN_DB
            phash_ok = hamming64(ph, r.phash) <= PHASH_LOSSY_MAX_HAMMING
        assert pixels_ok, f"{r.image_id} {r.fmt} psnr={p}"
        rows.append((r.image_id, True, pixels_ok, p, True, ph, phash_ok))
    return values_sql(
        [
            "image_id",
            "decode_ok",
            "pixels_ok",
            "psnr_db",
            "caption_ok",
            "phash_computed",
            "phash_ok",
        ],
        rows,
    )


def golden_phash() -> str:
    pages = gen_pages(42, 128)
    rows = []
    for r in pages.itertuples():
        px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        rows.append((r.image_id, int(r.phash), phash64(px)))
    return values_sql(["image_id", "phash", "phash_computed"], rows)


def golden_image_stats() -> str:
    from jirlbot_spark.functions.images import image_stats_array

    pages = gen_pages(42, 96)
    rows = []
    for r in pages.itertuples():
        px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        s = image_stats_array(px)
        rows.append(
            (r.image_id, True, s["mean_luma"], s["std_luma"], s["entropy"],
             s["colorfulness"], s["sharpness"])
        )
    return values_sql(
        ["image_id", "decode_ok", "mean_luma", "std_luma", "entropy",
         "colorfulness", "sharpness"],
        rows,
    )


def golden_image_resize() -> str:
    pages = gen_pages(42, 64)
    rows = []
    for r in pages.itertuples():
        px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        rz = resize_pixels(px, 16, 16)
        assert rz.shape == (16, 16, 3)
        rows.append((r.image_id, 16, 16, r.fmt))
    return values_sql(
        ["image_id", "w", "h", "fmt"], rows, int_cols=("w", "h")
    )


def golden_audio_features() -> str:
    from jirlbot_spark.functions.aiff_au import (
        decode_aiff,
        decode_au,
        is_aiff,
        is_au,
    )
    from jirlbot_spark.functions.flac import decode_flac, is_flac
    from jirlbot_spark.functions.media import decode_wav, is_wav
    from jirlbot_spark.functions.mp3 import is_mp3, mp3_info

    audio = gen_audio(7, 64)
    rows = []
    for r in audio.itertuples():
        # mirrors media._decode_audio: real RIFF/WAVE + FLAC + AU +
        # AIFF parses, multi-channel downmixed by channel mean (one
        # sample per frame), container-real mp3 frame walk (true
        # length + rate, fake samples), gated fake for the rest
        sr = None
        if is_wav(bytes(r.bytes)):
            wave, sr = decode_wav(bytes(r.bytes))
        elif is_flac(bytes(r.bytes)):
            wave, sr = decode_flac(bytes(r.bytes))
        elif is_au(bytes(r.bytes)):
            wave, sr = decode_au(bytes(r.bytes))
        elif is_aiff(bytes(r.bytes)):
            wave, sr = decode_aiff(bytes(r.bytes))
        elif is_mp3(bytes(r.bytes)):
            info = mp3_info(bytes(r.bytes))
            wave = fake_decode_audio(bytes(r.bytes), info["n_samples"])
            sr = info["sample_rate"]
        else:
            wave = fake_decode_audio(bytes(r.bytes), r.n_samples)
        if wave.ndim == 2:
            wave = wave.mean(axis=1, dtype=np.float64).astype(np.float32)
        sr = sr or max(int(r.sample_rate), 1)
        rows.append(
            (
                r.audio_id,
                len(wave) / sr,
                float(np.sqrt(np.mean(wave**2))) if len(wave) else 0.0,
                int(np.count_nonzero(np.diff(np.signbit(wave)))),
            )
        )
    return values_sql(
        ["audio_id", "duration_s", "rms", "zero_crossings"], rows
    )


def golden_frame_sample() -> str:
    from jirlbot_spark.functions.gif import decode_gif_frames, is_gif
    from jirlbot_spark.functions.media import decode_avi, is_avi
    from jirlbot_spark.functions.mp4 import (
        JPEG_SAMPLE_FOURCCS,
        decode_mp4_frames,
        is_mp4,
        mp4_info,
    )
    from jirlbot_spark.functions.webm import is_webm, webm_info

    video = gen_video(9, 32)
    rows = []
    for r in video.itertuples():
        # mirrors media.frame_sample: real AVI decode for avi rows,
        # real animated-GIF composition for gif rows, real MJPEG sample
        # decode for 'jpeg'-codec mp4 rows, container-real mp4 box /
        # webm element walks for the rest (true n_frames/dims, fake
        # pixels); px_sum pins the actual emitted pixel CONTENT, not
        # just cardinality
        blob0 = bytes(r.bytes)
        decoded = (
            decode_avi(blob0)[0]
            if is_avi(blob0)
            else decode_gif_frames(blob0)[0]
            if is_gif(blob0)
            else decode_mp4_frames(blob0)[0]
            if is_mp4(blob0)
            and (mp4_info(blob0).get("codec") or "").strip().lower()
            in JPEG_SAMPLE_FOURCCS
            else None
        )
        w, h = int(r.w), int(r.h)
        meta = None
        if decoded is None:
            blob = bytes(r.bytes)
            walker = (
                mp4_info if is_mp4(blob) else webm_info if is_webm(blob) else None
            )
            if walker is not None:
                meta = walker(blob)
                if meta.get("w") and meta.get("h"):
                    w, h = int(meta["w"]), int(meta["h"])
        n_frames = (
            len(decoded)
            if decoded is not None
            else (meta or {}).get("n_frames") or int(r.n_frames)
        )
        for idx in range(0, n_frames, 10):
            frame = (
                decoded[idx]
                if decoded is not None
                else fake_decode_frame(bytes(r.bytes), idx, w, h)
            )
            h, w = frame.shape[:2]
            rows.append(
                (
                    r.video_id,
                    idx,
                    w,
                    h,
                    w * h * 3,
                    int(frame.astype(np.int64).sum()),
                )
            )
    return values_sql(
        ["video_id", "frame_idx", "w", "h", "n_bytes", "px_sum"],
        rows,
        int_cols=("frame_idx", "w", "h", "n_bytes", "px_sum"),
    )


def golden_dedup_simhash() -> str:
    """Expected SimHash near-dup pairs over gen_documents(13, 400): the
    simhash kernel applied directly (numpy), then an O(n²) reference
    implementation of the candidate rule (pairs sharing >=1 of four
    16-bit signature blocks) + hamming <= 3 filter — the pigeonhole
    guarantee's ground truth the Spark blocked self-join must equal."""
    import pandas as pd

    from jirlbot_spark.operators.text_dedup import simhash64_batch
    from jirlbot_spark.sources.fixtures import gen_documents

    docs = gen_documents(13, 400)
    sig = simhash64_batch(pd.Series(docs["text"])).to_numpy().astype(np.uint64)
    ids = docs["doc_id"].to_numpy()
    n = len(ids)
    blocks = np.stack(
        [(sig >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)],
        axis=1,
    )
    rows = []
    for i in range(n):
        share = (blocks[i + 1 :] == blocks[i][None, :]).any(axis=1)
        for j in np.nonzero(share)[0] + i + 1:
            ham = bin(int(sig[i] ^ sig[j])).count("1")
            if ham <= 3:
                rows.append((int(ids[i]), int(ids[j]), ham))
    assert len(rows) >= 30, f"too few near-dup pairs: {len(rows)}"
    return values_sql(
        ["id_a", "id_b", "hamming"], rows, int_cols=("hamming",)
    )


def golden_ann_lsh() -> str:
    """Expected (query_id, vec_id, rank) for q_ann_lsh, computed by a
    bit-exact reimplementation of the JVM plan: F.aggregate is a LEFT
    FOLD over the array, so every dot product / norm here is a
    sequential Python-float fold (IEEE double, same op order), sketches
    use the same seeded planes, candidates the same per-table
    full-sketch equality, and the top-5 the same (-cosine, vec_id)
    order."""
    from jirlbot_spark.sources.fixtures import gen_embeddings

    emb = gen_embeddings(29, 300)
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in zip(emb["vec_id"], emb["embedding"])
    }
    n_planes, n_tables, k = 8, 4, 5

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    sketches = []
    for t in range(n_tables):
        rng = np.random.default_rng(100 + t)
        planes = rng.standard_normal((n_planes, 64))
        table = {}
        for vid, v in vecs.items():
            s = 0
            for j in range(n_planes):
                if fold_dot(v, [float(p) for p in planes[j]]) > 0:
                    s += 1 << j
            table[vid] = s
        sketches.append(table)

    rows = []
    for q in range(10):
        cands = set()
        for table in sketches:
            sq = table[q]
            cands.update(v for v, s in table.items() if s == sq)
        scored = []
        for c in cands:
            dot = fold_dot(vecs[q], vecs[c])
            nq = np.sqrt(fold_dot(vecs[q], vecs[q]))
            nc = np.sqrt(fold_dot(vecs[c], vecs[c]))
            scored.append((float(dot / (nq * nc)), c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, c) in enumerate(scored[:k], start=1):
            rows.append((q, c, rank))
    assert len(rows) >= 20, f"too few ANN rows: {len(rows)}"
    return values_sql(
        ["query_id", "vec_id", "rank"], rows, int_cols=("rank",)
    )


def golden_url_hash() -> str:
    """Expected (url_id, url_hash, bucket) for q_url_hash, computed with
    the INDEPENDENT pure-Python scalar MurmurHash3 reference
    (tests/scalar_murmur3.py — written from Appleby's public-domain
    MurmurHash3.cpp), so a green driver key proves the vectorized numpy
    kernel implements the algorithm, not merely that the plumbing round-
    trips. bucket replicates Spark's pmod(h, 32) on the signed i64."""
    from jirlbot_spark.sources.fixtures import gen_hash_urls
    from tests.scalar_murmur3 import murmur3_x64_128

    pdf = gen_hash_urls(512)
    rows = []
    for i, url in zip(pdf["url_id"], pdf["url"]):
        h1, _ = murmur3_x64_128(str(url).encode("utf-8"), seed=0)
        signed = h1 - (1 << 64) if h1 >= (1 << 63) else h1
        rows.append((int(i), signed, signed % 32))
    assert len({r[1] for r in rows}) == len(rows), "hash collision in fixture"
    return values_sql(
        ["url_id", "url_hash", "bucket"], rows, int_cols=("bucket",)
    )


def golden_robots_rfc() -> str:
    """Expected (url_id, robots_status, crawl_delay) for q_robots_rfc,
    from an INDEPENDENT pure-Python evaluator of the pinned grammar
    (line-loop state machine + per-rule re.match — nothing shared with
    the Spark window/regexp_like implementation)."""
    import re as _re

    from jirlbot_spark.sources.fixtures import robots_rfc_scenario

    UA = "jirlbot"

    def parse(body: str):
        groups: list[tuple[list[str], list[tuple[str, str]]]] = []
        cur_uas: list[str] | None = None
        cur_rules: list[tuple[str, str]] | None = None
        for raw_line in body.split("\n"):
            line = raw_line.split("#", 1)[0].strip()
            if not line:
                continue
            low = line.lower()
            if low.startswith("user-agent:"):
                tok = line.split(":", 1)[1].strip().lower()
                if cur_rules:  # previous group had directives -> close it
                    groups.append((cur_uas or [], cur_rules))
                    cur_uas, cur_rules = None, None
                if cur_uas is None:
                    cur_uas, cur_rules = [], []
                cur_uas.append(tok)
            elif ":" in line and cur_uas is not None:
                d, v = line.split(":", 1)
                cur_rules.append((d.strip().lower(), v.strip()))
        if cur_uas is not None:
            groups.append((cur_uas, cur_rules or []))
        specific = [
            g for g in groups
            if any(t != "*" and UA.startswith(t) for t in g[0])
        ]
        chosen = specific or [g for g in groups if "*" in g[0]]
        allow, disallow, delay = [], [], 0.0
        for _, rules in chosen:
            for d, v in rules:
                if d == "allow" and v:
                    allow.append(v)
                elif d == "disallow" and v:
                    disallow.append(v)
                elif d == "crawl-delay":
                    try:
                        delay = max(delay, float(v))
                    except ValueError:
                        pass
        return allow, disallow, delay

    def rule_re(rule: str) -> str:
        pat = "".join(
            ".*" if ch == "*" else _re.escape(ch) for ch in rule
        )
        if rule.endswith("$"):
            pat = pat[: -len(_re.escape("$"))] + "$"
        return pat

    def check(path: str, allow: list[str], disallow: list[str]) -> str:
        best = {"PASS": -1, "FAIL": -1}
        for verdict, rules in (("PASS", allow), ("FAIL", disallow)):
            for r in rules:
                if _re.match(rule_re(r), path):
                    best[verdict] = max(best[verdict], len(r))
        return "FAIL" if best["FAIL"] > best["PASS"] else "PASS"

    bodies, urls = robots_rfc_scenario()
    parsed = {h: parse(b) for h, b in zip(bodies["host"], bodies["body"])}
    rows = []
    for uid, host, path in zip(urls["url_id"], urls["host"], urls["path"]):
        allow, disallow, delay = parsed[host]
        rows.append((int(uid), check(path, allow, disallow), float(delay)))
    statuses = {r[1] for r in rows}
    assert statuses == {"PASS", "FAIL"}, f"degenerate scenario: {statuses}"
    return values_sql(["url_id", "robots_status", "crawl_delay"], rows)


def golden_ann_ivf() -> str:
    """Expected (query_id, vec_id, cosine, rnk) for q_ann_ivf by direct
    replication of the whole IVF pipeline over the seeded fixture:
    same quantization (floor(x*1000) on float64-widened float32), same
    k-means call over the same full-corpus sample in row order
    (sample_mod=1 at fixture scale), same int64-quantized centroids and
    exact-int cell scores, same int64 _cosine_matrix rerank — so every
    double is bit-identical to what the Spark plan produces and the
    blocking of mapInPandas cannot change assignments or order."""
    from jirlbot_spark.operators.similarity import (
        _cell_scores,
        _cosine_matrix,
        _kmeans_numpy,
        _quantize_centroids,
    )
    from jirlbot_spark.sources.fixtures import gen_embeddings

    emb = gen_embeddings(29, 300)
    mat = np.floor(
        np.vstack(emb["embedding"].to_numpy()).astype(np.float64) * 1000.0
    ).astype(np.int64)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    n_centroids, nprobe, k = 16, 6, 5
    sample_mod = max(1, len(mat) // (256 * n_centroids))
    assert sample_mod == 1, "fixture no longer below the training budget"
    cent_int = _quantize_centroids(_kmeans_numpy(mat, n_centroids, seed=31))

    qmask = ids < 10
    qids, qmat = ids[qmask], mat[qmask]
    qcells = np.argsort(
        -_cell_scores(qmat, cent_int), axis=1, kind="stable"
    )[:, : min(nprobe, len(cent_int))]
    cells = np.argmax(_cell_scores(mat, cent_int), axis=1)

    rows = []
    for qi in range(len(qids)):
        cand = np.nonzero(np.isin(cells, qcells[qi]))[0]
        sims = _cosine_matrix(qmat[qi : qi + 1], mat[cand])[0]
        order = sorted(
            range(len(cand)), key=lambda j: (-sims[j], ids[cand[j]])
        )
        for rank, j in enumerate(order[:k], start=1):
            rows.append(
                (int(qids[qi]), int(ids[cand[j]]), float(sims[j]), rank)
            )
    assert len(rows) == 50, f"unexpected IVF row count {len(rows)}"
    return values_sql(
        ["query_id", "vec_id", "cosine", "rnk"], rows, int_cols=("rnk",)
    )


def golden_resume_state() -> str:
    """Expected 3-batch fetch_log from the pure-Python crawl SIMULATOR
    (tests/oracle_sim.py — an implementation independent of the engine),
    over resume_scenario() — the same inputs q_resume_state feeds the
    Spark crawl loop, including a checkpoint-resume split before the
    final batch."""
    from jirlbot_spark.sources.fixtures import resume_scenario
    from tests.oracle_sim import SimConfig, simulate

    seeds, graph, robots, cfg_kwargs, n_batches = resume_scenario()
    sim = simulate(seeds, graph, robots, n_batches, SimConfig(**cfg_kwargs))
    rows = [
        (
            e["batch"],
            e["url"],
            e["host"],
            e["seq_in_host"],
            float(e["planned_at_s"]),
        )
        for e in sim.fetch_log
    ]
    assert len(rows) >= 18, f"scenario too small: {len(rows)} fetches"
    return values_sql(
        ["batch", "url", "host", "seq_in_host", "planned_at_s"],
        rows,
        int_cols=("batch", "seq_in_host"),
    )


def golden_bpe_encode() -> str:
    """Direct-application golden for the BPE driver key: same training
    (via the bounded-collect ordering replicated exactly: freq desc,
    word asc) + scalar encode over the seeded corpus. Algorithmic
    independence lives in tests/test_bpe.py (a separately-written naive
    trainer + the Sennrich worked example); this golden certifies the
    DISTRIBUTED plumbing — word_freqs shuffle, bounded collect,
    broadcast ranks, Arrow-batched memoized encode — reproduces the
    direct computation bit-for-bit."""
    from collections import Counter

    from jirlbot_spark.functions.bpe import (
        encode_word,
        train_bpe_from_freqs,
    )
    from jirlbot_spark.sources.fixtures import gen_documents

    pdf = gen_documents(17, 160)
    freqs = Counter()
    for t in pdf.text:
        freqs.update(t.split())
    table = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:50000]
    merges = train_bpe_from_freqs(table, 60)
    assert len(merges) == 60
    ranks = {p: i for i, p in enumerate(merges)}
    rows = []
    for doc_id, text in zip(pdf.doc_id, pdf.text):
        toks: list[str] = []
        for w in text.split():
            toks.extend(encode_word(w, ranks))
        rows.append((int(doc_id), len(toks), "|".join(toks)))
    return values_sql(
        ["doc_id", "n_tokens", "token_str"], rows, int_cols=("n_tokens",)
    )


def golden_dedup_semantic() -> str:
    """Oracle SQL for q_dedup_semantic. UNLIKE the VALUES-of-outputs
    goldens, this pins only the two DATA tables (quantized corpus +
    trained int64 centroids — the same centroid table the Spark query
    trains, asserted below) and lets DuckDB recompute EVERYTHING else
    itself: cell assignment (argmax with lowest-index tie-break), exact
    within-cell int cosine pairing, the recursive-CTE component closure,
    and the least-centroid-similar keep rule — algebraic independence
    everywhere except the shared centroid data."""
    from jirlbot_spark.operators.similarity import (
        _kmeans_numpy,
        _quantize_centroids,
    )
    from jirlbot_spark.sources.fixtures import gen_embeddings

    n, dim, k, thr = 120, 16, 4, 0.9
    emb = gen_embeddings(31, n, dim=dim)
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.floor(
        np.vstack(emb["embedding"].to_numpy()).astype(np.float64) * 1000.0
    ).astype(np.int64)
    # train_centroids' bounded hash sample degenerates to the full corpus
    # in row order at this scale — the same invariant golden_ann_ivf pins
    sample_mod = max(1, n // (256 * k))
    assert sample_mod == 1, "fixture no longer below the training budget"
    cent_int = _quantize_centroids(_kmeans_numpy(mat.astype(np.float64), k, 31))

    def arr(v) -> str:
        return "[" + ", ".join(str(int(x)) for x in v) + "]"

    corpus_rows = ",\n              ".join(
        f"({int(i)}, {arr(v)})" for i, v in zip(ids, mat)
    )
    cent_rows = ",\n              ".join(
        f"({c}, {arr(v)})" for c, v in enumerate(cent_int)
    )
    return f"""
            WITH RECURSIVE corpus(vec_id, v) AS (VALUES
              {corpus_rows}
            ), cent(cidx, c) AS (VALUES
              {cent_rows}
            ), scored AS (
              SELECT vec_id, v, cidx,
                     list_dot_product(v, c)
                     / sqrt(greatest(list_dot_product(c, c), 1.0)) AS s
              FROM corpus, cent
            ), assigned AS (
              SELECT vec_id, v, cidx AS cell, s AS cent_sim FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY s DESC, cidx ASC) AS rn
                FROM scored) WHERE rn = 1
            ), pairs AS (
              SELECT a.vec_id AS pu, b.vec_id AS pw
              FROM assigned a JOIN assigned b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE CAST(list_dot_product(a.v, b.v) AS DOUBLE)
                    / SQRT(CAST(CAST(list_dot_product(a.v, a.v) AS BIGINT)
                           * CAST(list_dot_product(b.v, b.v) AS BIGINT)
                           AS DOUBLE)) >= {thr}
            ), sym AS (
              SELECT pu AS s, pw AS t FROM pairs
              UNION
              SELECT pw AS s, pu AS t FROM pairs
            ), reach(id, lbl) AS (
              SELECT vec_id, vec_id FROM corpus
              UNION
              SELECT sym.t, reach.lbl FROM reach JOIN sym ON sym.s = reach.id
            ), comp AS (
              SELECT id, MIN(lbl) AS component FROM reach GROUP BY id
            ), rows_out AS (
              SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell, a.cent_sim,
                     c.component
              FROM assigned a JOIN comp c ON c.id = a.vec_id
            )
            SELECT vec_id, cell, cent_sim, component,
                   ROW_NUMBER() OVER (PARTITION BY component
                                      ORDER BY cent_sim ASC, vec_id ASC) = 1
                     AS keep
            FROM rows_out
        """


def golden_dsir_weights() -> str:
    """Expected (doc_id, n_grams, logw_q, logw) for q_dsir_weights by
    direct application over the sf0.01 documents table (the one table-
    derived golden: DuckDB cannot compute xxhash64, so the bucket ids
    come from the INDEPENDENT spec-derived pure-Python XXH64 in
    tests/scalar_xxhash64.py — green therefore certifies Spark's
    xxhash64 against the published algorithm inside this key's whole
    pipeline, not just plumbing). Tokenization mirrors the pinned
    tokens_col contract (split(trim(text), '\\s+') — empty text yields
    one empty token)."""
    import math
    import re

    import pandas as pd

    from tests.scalar_xxhash64 import spark_xxhash64

    B, SCALE = 4096, 10**6
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")[
        ["doc_id", "text", "lang"]
    ]

    def buckets(text: str) -> list[int]:
        t = re.split(r"\s+", text.strip())
        out = [spark_xxhash64(w) % B for w in t]
        out += [spark_xxhash64(a, b) % B for a, b in zip(t, t[1:])]
        return out

    raw_b = {int(r.doc_id): buckets(r.text) for r in docs.itertuples()}
    tgt_b = [
        b
        for r in docs.itertuples()
        if r.lang == "en"
        for b in buckets(r.text)
    ]
    r_cnt: dict[int, int] = {}
    for bs in raw_b.values():
        for b in bs:
            r_cnt[b] = r_cnt.get(b, 0) + 1
    t_cnt: dict[int, int] = {}
    for b in tgt_b:
        t_cnt[b] = t_cnt.get(b, 0) + 1
    T, R = sum(t_cnt.values()), sum(r_cnt.values())
    lam = [
        round(
            SCALE
            * (
                math.log((t_cnt.get(b, 0) + 1) / (T + B))
                - math.log((r_cnt.get(b, 0) + 1) / (R + B))
            )
        )
        for b in range(B)
    ]
    rows = []
    for i, bs in sorted(raw_b.items()):
        q = sum(lam[b] for b in bs)
        rows.append((i, len(bs), q, q / float(SCALE)))
    assert len(rows) == len(docs)
    return values_sql(["doc_id", "n_grams", "logw_q", "logw"], rows)


def golden_lm_perplexity() -> str:
    """Oracle SQL for q_lm_perplexity: ONLY the three LM tables (vocab,
    bigram-q, fallback-q) are pinned as VALUES — trained here by an
    independent pure-Python replication of the pinned recipe over the
    sf0.01 documents (reference = lang='en') — and DuckDB recomputes
    tokenization, OOV mapping, bigram formation via lead(), the
    lookup+fallback, and the exact int64 sums ITSELF."""
    import math
    import re

    import pandas as pd

    MAX_VOCAB, MAX_BIGRAMS, SCALE = 500, 2000, 10**6
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")[
        ["doc_id", "text", "lang"]
    ]
    ref_toks = [
        re.split(r"\s+", r.text.strip()) if r.text.strip() else []
        for r in docs.itertuples()
        if r.lang == "en"
    ]
    freq: dict[str, int] = {}
    for ts in ref_toks:
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    vocab = [
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:MAX_VOCAB]
    wid = {t: i + 1 for i, t in enumerate(vocab)}
    V = len(vocab) + 1
    c1: dict[int, int] = {}
    c12: dict[tuple[int, int], int] = {}
    for ts in ref_toks:
        ids = [wid.get(t, 0) for t in ts]
        for a, b in zip(ids, ids[1:]):
            c1[a] = c1.get(a, 0) + 1
            c12[(a, b)] = c12.get((a, b), 0) + 1
    top = sorted(c12.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_BIGRAMS]
    vocab_rows = ",\n              ".join(
        f"({lit(t)}, {i + 1})" for i, t in enumerate(vocab)
    )
    biq_rows = ",\n              ".join(
        f"({a}, {b}, {round(SCALE * math.log((c + 1) / (c1[a] + V)))})"
        for (a, b), c in top
    )
    uq_rows = ",\n              ".join(
        f"({w}, {round(SCALE * math.log(1.0 / (c1.get(w, 0) + V)))})"
        for w in range(V)
    )
    return f"""
            WITH vocab(tok, wid) AS (VALUES
              {vocab_rows}
            ), biq(bw1, bw2, q) AS (VALUES
              {biq_rows}
            ), uq(uw1, q0) AS (VALUES
              {uq_rows}
            ), toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 t -> t <> '') AS t
              FROM documents
            ), pos AS (
              SELECT doc_id, i, t[i] AS tok
              FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
            ), mapped AS (
              SELECT p.doc_id, p.i, COALESCE(v.wid, 0) AS wid
              FROM pos p LEFT JOIN vocab v ON v.tok = p.tok
            ), pairs AS (
              SELECT doc_id, wid AS w1,
                     LEAD(wid) OVER (PARTITION BY doc_id ORDER BY i) AS w2
              FROM mapped
            ), scored AS (
              SELECT pr.doc_id, COALESCE(b.q, u.q0) AS q
              FROM pairs pr
              LEFT JOIN biq b ON b.bw1 = pr.w1 AND b.bw2 = pr.w2
              JOIN uq u ON u.uw1 = pr.w1
              WHERE pr.w2 IS NOT NULL
            ), agg AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(SUM(q) AS BIGINT) AS logp_q
              FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(a.logp_q, 0) AS BIGINT) AS logp_q,
                   CASE WHEN COALESCE(a.n_bigrams, 0) = 0 THEN 0.0
                        ELSE CAST(-a.logp_q AS DOUBLE)
                             / CAST(a.n_bigrams * {SCALE} AS DOUBLE)
                   END AS avg_nll
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        """


def golden_image_scrub() -> str:
    """Direct application of strip_metadata over gen_meta_images(11, 24)
    — the byte-level walk, NOT the Spark operator. clean_crc uses
    zlib.crc32 (the Spark side computes JVM F.crc32 — two independent
    crc32 implementations must agree, the warc_roundtrip pattern).
    Generation-time assert: decoded pixels identical before/after."""
    import zlib

    from jirlbot_spark.functions.image_meta import strip_metadata
    from jirlbot_spark.functions.jpeg import decode_jpeg
    from jirlbot_spark.sources.fixtures import gen_meta_images

    rows = []
    for r in gen_meta_images(11, 24).itertuples(index=False):
        raw = bytes(r.bytes)
        clean, n, sup = strip_metadata(raw, r.fmt)
        assert sup
        if r.fmt == "jpeg":
            a, b = decode_jpeg(raw), decode_jpeg(clean)
        else:
            a = decode_image(raw, r.fmt, 0, 0)
            b = decode_image(clean, r.fmt, 0, 0)
        assert np.array_equal(a, b), r.image_id
        rows.append(
            (
                r.image_id,
                r.fmt,
                len(raw),
                len(clean),
                n,
                True,
                True,
                zlib.crc32(clean),
            )
        )
    return values_sql(
        [
            "image_id",
            "fmt",
            "orig_len",
            "clean_len",
            "n_stripped",
            "supported",
            "scrub_ok",
            "clean_crc",
        ],
        rows,
        int_cols=("n_stripped",),
    )


def main() -> None:
    goldens = {
        "image_verify": golden_image_verify(),
        "image_verify_lossy": golden_image_verify_lossy(),
        "phash": golden_phash(),
        "image_stats": golden_image_stats(),
        "image_resize": golden_image_resize(),
        "audio_features": golden_audio_features(),
        "frame_sample": golden_frame_sample(),
        "dedup_simhash": golden_dedup_simhash(),
        "ann_lsh": golden_ann_lsh(),
        "ann_ivf": golden_ann_ivf(),
        "url_hash": golden_url_hash(),
        "robots_rfc": golden_robots_rfc(),
        "resume_state": golden_resume_state(),
        "bpe_encode": golden_bpe_encode(),
        "dedup_semantic": golden_dedup_semantic(),
        "dsir_weights": golden_dsir_weights(),
        "lm_perplexity": golden_lm_perplexity(),
        "image_scrub": golden_image_scrub(),
    }
    out = Path(__file__).resolve().parent.parent / "jirlbot_spark" / "goldens_sql.py"
    with out.open("w") as f:
        f.write(
            '"""GENERATED by tools/gen_goldens.py — do not edit by hand.\n\n'
            "Exact DuckDB oracles (VALUES goldens) for driver keys whose\n"
            "inputs are seeded fixtures rather than the sf parquet tables.\n"
            "Each expected row was computed by DIRECT function application\n"
            "(fixture generator + codecs + numpy feature math), so the\n"
            "driver's side-by-side compare asserts the Spark mapInPandas\n"
            "plumbing reproduces the direct computation exactly.\n"
            '"""\n\nGOLDEN_ORACLES = {\n'
        )
        for k, sql in goldens.items():
            f.write(f'    "{k}": """{sql}""",\n')
        f.write("}\n")
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
