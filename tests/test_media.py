"""Multimodal plumbing (functions/media.py): schemas, cardinality, batch
shapes, and determinism of the Spark-side contract. Pixel/sample CONTENT
comes from the deterministic fake backend in this sandbox (no codec
libs); the real-codec path activates via the same functions on a cluster
image — nothing else changes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jirlbot_spark.functions.images import decode_image
from jirlbot_spark.functions.media import (
    AUDIO_SCHEMA,
    VIDEO_SCHEMA,
    audio_features,
    fake_decode_frame,
    frame_sample,
    resize_images,
    resize_pixels,
)
from jirlbot_spark.sources.fixtures import gen_audio, gen_pages, gen_video


def test_audio_features_shape_and_determinism(spark):
    pdf = gen_audio(3, 12)
    audio = spark.createDataFrame(pdf, schema=AUDIO_SCHEMA)
    out = audio_features(audio).collect()
    assert len(out) == 12
    by_id = {r.audio_id: r for r in out}
    for _, row in pdf.iterrows():
        r = by_id[row["audio_id"]]
        assert r.duration_s == pytest.approx(
            row["n_samples"] / row["sample_rate"]
        )
        assert 0.0 < r.rms < 1.0  # uniform [-1,1] fake -> rms ~ 0.577
        assert r.zero_crossings > 0
    # replay -> identical features (content-seeded fake)
    again = {r.audio_id: r for r in audio_features(audio).collect()}
    for aid, r in by_id.items():
        assert again[aid].rms == r.rms
        assert again[aid].zero_crossings == r.zero_crossings


def test_audio_stub_marker(spark):
    """allow_fake=False raises ONLY for codec-less formats; wav rows
    decode for real and never hit the gate."""
    pdf = gen_audio(3, 16)
    nonwav = pdf[pdf["fmt"] != "wav"]
    assert len(nonwav), "fixture must include a codec-less format"
    audio = spark.createDataFrame(nonwav, schema=AUDIO_SCHEMA)
    with pytest.raises(Exception) as ei:
        audio_features(audio, allow_fake=False).collect()
    assert "STUB" in str(ei.value)
    wav_only = spark.createDataFrame(
        pdf[pdf["fmt"] == "wav"], schema=AUDIO_SCHEMA
    )
    assert audio_features(wav_only, allow_fake=False).count() == len(
        pdf[pdf["fmt"] == "wav"]
    )


def test_wav_roundtrip_all_depths():
    from jirlbot_spark.functions.media import decode_wav, encode_wav, is_wav

    rng = np.random.default_rng(0)
    wave = np.clip(
        0.6 * np.sin(2 * np.pi * 440 * np.arange(4000) / 16000)
        + 0.1 * rng.standard_normal(4000),
        -1,
        1,
    )
    for bits, f32, tol in [
        (8, False, 1 / 128),
        (16, False, 1 / 32000),
        (24, False, 1e-6),
        (32, False, 1e-7),
        (32, True, 1e-7),
    ]:
        blob = encode_wav(wave, 16000, bits=bits, float32=f32)
        assert is_wav(blob)
        dec, sr = decode_wav(blob)
        assert sr == 16000 and dec.shape == (4000, 1)
        assert np.abs(dec[:, 0] - wave).max() <= tol, (bits, f32)


def test_wav_stereo_interleave_and_chunk_walk():
    from jirlbot_spark.functions.media import decode_wav, encode_wav

    st = np.stack(
        [np.linspace(-0.9, 0.9, 500), np.linspace(0.9, -0.9, 500)], axis=1
    )
    blob = encode_wav(st, 8000, bits=16)
    dec, sr = decode_wav(blob)
    assert dec.shape == (500, 2) and sr == 8000
    assert np.abs(dec - st).max() < 1e-3
    # extra chunk between header and data must be skipped
    import struct as _s

    fmt_start = blob.index(b"fmt ")
    extra = b"LIST" + _s.pack("<I", 6) + b"junk!!"
    patched = blob[:fmt_start] + extra + blob[fmt_start:]
    patched = (
        patched[:4]
        + _s.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    dec2, _ = decode_wav(patched)
    assert np.array_equal(dec, dec2)


def test_wav_malformed_and_compressed():
    from jirlbot_spark.functions.media import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"nonsense")
    blob = bytearray(encode_wav(np.zeros(100), 8000, bits=16))
    tag_off = blob.index(b"fmt ") + 8
    blob[tag_off : tag_off + 2] = (85).to_bytes(2, "little")  # mp3 tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no chunks


def test_frame_sample_cardinality_and_layout(spark):
    from jirlbot_spark.functions.gif import decode_gif_frames, is_gif
    from jirlbot_spark.functions.media import decode_avi, is_avi
    from jirlbot_spark.functions.mp4 import (
        JPEG_SAMPLE_FOURCCS,
        decode_mp4_frames,
        is_mp4,
        mp4_info,
    )

    pdf = gen_video(5, 8)
    assert (pdf["fmt"] == "avi").any(), "fixture must include real avi"
    video = spark.createDataFrame(pdf, schema=VIDEO_SCHEMA)
    out = frame_sample(video, every_n=7).collect()
    expected = sum(len(range(0, int(nf), 7)) for nf in pdf["n_frames"])
    assert len(out) == expected
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.video_id, []).append(r)
    for _, row in pdf.iterrows():
        frames = sorted(by_vid[row["video_id"]], key=lambda r: r.frame_idx)
        assert [f.frame_idx for f in frames] == list(
            range(0, int(row["n_frames"]), 7)
        )
        blob = bytes(row["bytes"])
        decoded = (
            decode_avi(blob)[0]
            if is_avi(blob)
            else decode_gif_frames(blob)[0]
            if is_gif(blob)
            else decode_mp4_frames(blob)[0]  # REAL MJPEG-in-mp4 pixels
            if is_mp4(blob)
            and (mp4_info(blob).get("codec") or "").lower()
            in JPEG_SAMPLE_FOURCCS
            else None
        )
        for f in frames:
            assert f.w == row["w"] and f.h == row["h"]
            assert len(f.pixels) == f.w * f.h * 3  # raw RGB24 contract
            exp = (
                decoded[f.frame_idx]  # REAL pixels for avi/gif payloads
                if decoded is not None
                else fake_decode_frame(
                    bytes(row["bytes"]), f.frame_idx, f.w, f.h
                )
            )
            got = np.frombuffer(f.pixels, np.uint8).reshape(f.h, f.w, 3)
            assert np.array_equal(got, exp)  # deterministic replay


def test_avi_roundtrip_and_gates():
    import struct as _s

    from jirlbot_spark.functions.media import decode_avi, encode_avi, is_avi

    rng = np.random.default_rng(2)
    for n, h, w in [(4, 16, 16), (3, 17, 23), (1, 2, 2)]:
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        blob = encode_avi(fr, fps=24.0)
        assert is_avi(blob)
        dec, fps = decode_avi(blob)
        assert np.array_equal(dec, fr) and abs(fps - 24.0) < 1e-9
    with pytest.raises(ValueError):
        decode_avi(b"garbage")
    blob = bytearray(encode_avi(rng.integers(0, 256, (2, 8, 8, 3), np.uint8)))
    off = bytes(blob).index(b"strf") + 8 + 16  # biCompression
    blob[off : off + 4] = _s.pack("<I", 0x34363248)  # 'H264'
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(blob))


def test_video_stub_marker(spark):
    """allow_fake=False raises ONLY for codec-less formats (mp4/webm);
    avi AND mjpg rows decode for real and never hit the gate."""
    pdf = gen_video(5, 12)
    gated = pdf[pdf["fmt"].isin(["mp4", "webm"])]
    assert len(gated), "fixture must include a codec-less format"
    video = spark.createDataFrame(gated, schema=VIDEO_SCHEMA)
    with pytest.raises(Exception) as ei:
        frame_sample(video, allow_fake=False).collect()
    assert "STUB" in str(ei.value)
    real = spark.createDataFrame(
        pdf[pdf["fmt"].isin(["avi", "mjpg"])], schema=VIDEO_SCHEMA
    )
    assert frame_sample(real, every_n=10, allow_fake=False).count() > 0


def test_mjpeg_avi_roundtrip():
    """MJPEG-in-AVI: container + the engine's own JPEG codec compose to a
    REAL compressed-video decode. Lossy, so the invariant is the engine's
    PSNR>=40dB @ quality 90 contract per frame, not bit-equality."""
    from jirlbot_spark.functions.media import decode_avi, encode_avi, is_avi

    y = np.arange(24, dtype=np.int32)[None, :, None, None]
    x = np.arange(40, dtype=np.int32)[None, None, :, None]
    f = np.arange(5, dtype=np.int32)[:, None, None, None]
    c = np.arange(3, dtype=np.int32)[None, None, None, :]
    frames = ((x * 3 + y * 5 + f * 7 + c * 11) % 256).astype(np.uint8)
    blob = encode_avi(frames, fps=24.0, codec="mjpg", quality=90)
    assert is_avi(blob)
    dec, fps = decode_avi(blob)
    assert dec.shape == frames.shape and abs(fps - 24.0) < 1e-9
    mse = np.mean((dec.astype(np.float64) - frames) ** 2, axis=(1, 2, 3))
    psnr = 10 * np.log10(255.0**2 / np.maximum(mse, 1e-12))
    assert (psnr >= 40.0).all(), psnr


def test_resize_pixels_real():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    up = resize_pixels(px, 12, 8)
    assert up.shape == (8, 12, 3)
    # nearest-neighbor: corners preserved
    assert np.array_equal(up[0, 0], px[0, 0])
    assert np.array_equal(up[-1, -1], px[-1, -1])
    down = resize_pixels(px, 3, 2)
    assert down.shape == (2, 3, 3)


def test_resize_images_roundtrip(spark):
    pages = spark.createDataFrame(gen_pages(11, 10))
    out = resize_images(pages, 8, 8).collect()
    assert len(out) == 10
    for r in out:
        assert (r.w, r.h) == (8, 8)
        px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        assert px.shape == (8, 8, 3)
    # deterministic content: resizing the decoded original matches
    src = {p.image_id: p for p in pages.collect()}
    for r in out[:3]:
        orig = src[r.image_id]
        opx = decode_image(bytes(orig.bytes), orig.fmt, orig.w, orig.h)
        assert np.array_equal(
            decode_image(bytes(r.bytes), r.fmt, 8, 8),
            resize_pixels(opx, 8, 8),
        )


def test_media_queries_run(spark):
    """Driver-key smoke: the registered media queries return stable
    schemas and >0 rows at any sf (they build from fixtures)."""
    import __spark_entry__ as e

    qs = e.queries()
    rz = qs["image_resize"](spark, "/root/testdata/sf0.001")
    assert rz.count() > 0
    af = qs["audio_features"](spark, "/root/testdata/sf0.001")
    assert af.count() > 0
    fs = qs["frame_sample"](spark, "/root/testdata/sf0.001")
    assert fs.count() > 0


# ---------- FLAC (functions/flac.py) ----------


def test_flac_roundtrip_exact():
    """Encode->decode is exact at the quantized-sample level across
    depths, channel counts, blocksize boundaries, and content types."""
    from jirlbot_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(11)
    cases = [
        (5000, 16000, 16, 1),   # plain tone
        (4096, 8000, 16, 1),    # exactly one block
        (4097, 8000, 16, 1),    # one sample into block 2
        (100, 8000, 8, 1),      # 8-bit
        (9000, 22050, 16, 2),   # stereo (independent channels)
        (1, 8000, 16, 1),       # single sample
    ]
    for n, sr, bits, ch in cases:
        t = np.arange(n) / sr
        wave = 0.7 * np.sin(2 * np.pi * 440 * t)
        wave += 0.05 * rng.standard_normal(n)
        if ch == 2:
            wave = np.stack([wave, np.roll(wave, 5)], axis=1)
        wave = np.clip(wave, -1, 1)
        back, sr2 = decode_flac(encode_flac(wave, sr, bits=bits))
        full = 1 << (bits - 1)
        q = np.clip(
            np.round((wave if ch == 2 else wave[:, None]) * full),
            -full,
            full - 1,
        )
        assert sr2 == sr
        assert np.array_equal(np.round(back * full), q), (n, sr, bits, ch)
    # silence -> CONSTANT subframes, noise -> verbatim/escape paths
    back, _ = decode_flac(encode_flac(np.zeros(10000), 8000))
    assert np.array_equal(back, np.zeros((10000, 1), np.float32))
    noise = np.clip(rng.standard_normal(8192), -1, 1)
    back, _ = decode_flac(encode_flac(noise, 8000))
    assert np.array_equal(
        np.round(back * 32768).reshape(-1),
        np.clip(np.round(noise * 32768), -32768, 32767),
    )


def test_flac_compresses_tonal_content():
    from jirlbot_spark.functions.flac import encode_flac

    t = np.arange(44100) / 44100
    blob = encode_flac(np.sin(2 * np.pi * 220 * t) * 0.8, 44100)
    assert len(blob) < 44100 * 2 * 0.95  # beats raw 16-bit PCM


def test_flac_crc_rejects_corruption():
    from jirlbot_spark.functions.flac import decode_flac, encode_flac

    blob = bytearray(encode_flac(np.sin(np.arange(5000) / 30.0), 8000))
    blob[200] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[:60]))  # truncated


def test_flac_lpc_roundtrip_and_compression():
    """Tonal content picks the LPC candidate and round-trips exactly;
    LPC beats the fixed-only formulation on compression."""
    from jirlbot_spark.functions import flac as FL

    n, sr = 44100, 44100
    t = np.arange(n) / sr
    wave = np.clip(
        0.6 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 333 * t + 0.4),
        -1,
        1,
    )
    blob = FL.encode_flac(wave, sr)
    back, _ = FL.decode_flac(blob)
    q = np.clip(np.round(wave[:, None] * 32768), -32768, 32767)
    assert np.array_equal(np.round(back * 32768), q)
    # fixed-only encode for comparison (disable LPC candidates)
    orders = FL._LPC_ORDERS
    FL._LPC_ORDERS = ()
    try:
        fixed_blob = FL.encode_flac(wave, sr)
    finally:
        FL._LPC_ORDERS = orders
    back2, _ = FL.decode_flac(fixed_blob)
    assert np.array_equal(np.round(back2 * 32768), q)
    assert len(blob) < len(fixed_blob), (len(blob), len(fixed_blob))


def test_flac_stereo_decorrelation_roundtrip():
    """All four channel assignments (independent, left/side, right/side,
    mid/side) round-trip sample-exact — each mode forced so every decode
    path is pinned, plus auto, which must never lose to any single mode."""
    from jirlbot_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(23)
    sr = 16000
    t = np.arange(9001) / sr  # spans a blocksize boundary
    left = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(len(t))
    right = 0.55 * np.sin(2 * np.pi * 440 * t + 0.2) + 0.05 * rng.standard_normal(
        len(t)
    )
    st = np.clip(np.stack([left, right], axis=1), -1, 1)
    modes = ("independent", "left_side", "right_side", "mid_side", "auto")
    for bits in (8, 16):
        full = 1 << (bits - 1)
        q = np.clip(np.round(st * full), -full, full - 1)
        sizes = {}
        for mode in modes:
            blob = encode_flac(st, sr, bits=bits, stereo_mode=mode)
            back, sr2 = decode_flac(blob)
            assert sr2 == sr
            assert np.array_equal(np.round(back * full), q), (bits, mode)
            sizes[mode] = len(blob)
        assert sizes["auto"] <= min(sizes.values())


def test_flac_stereo_decorrelation_compresses_correlated_channels():
    """Highly correlated stereo content must choose a decorrelated mode
    and beat the independent-channels coding by a real margin."""
    from jirlbot_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(7)
    sr = 16000
    t = np.arange(8192) / sr
    base = 0.6 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(len(t))
    st = np.clip(
        np.stack([base, base * 0.98 + 0.002 * np.sin(2 * np.pi * 5 * t)], 1),
        -1,
        1,
    )
    indep = encode_flac(st, sr, stereo_mode="independent")
    auto = encode_flac(st, sr)
    assert len(auto) < 0.9 * len(indep)
    full = 1 << 15
    q = np.clip(np.round(st * full), -full, full - 1)
    assert np.array_equal(np.round(decode_flac(auto)[0] * full), q)


def test_flac_md5_verifies_decoded_output():
    """decode_flac checks the STREAMINFO MD5 of its own output — a
    stream whose MD5 disagrees with the (CRC-valid) frames is rejected."""
    from jirlbot_spark.functions.flac import decode_flac, encode_flac

    blob = bytearray(encode_flac(np.sin(np.arange(3000) / 10.0), 8000))
    # STREAMINFO MD5 lives at bytes 8+18 .. 8+34 (magic+block hdr = 8)
    blob[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))
    # all-zero MD5 means "unset" per spec: must decode fine
    blob[8 + 18 : 8 + 34] = b"\x00" * 16
    decode_flac(bytes(blob))


def test_gen_audio_flac_rows_decode_real():
    """flac fixture rows are REAL bitstreams: the strict no-fake path
    must decode them (and mp3 rows must still refuse without the fake)."""
    from jirlbot_spark.functions.flac import is_flac
    from jirlbot_spark.functions.media import _decode_audio
    from jirlbot_spark.sources.fixtures import gen_audio

    audio = gen_audio(7, 64)
    fmts = set(audio["fmt"])
    assert {"wav", "flac", "mp3"} <= fmts
    n_flac = 0
    for _, r in audio.iterrows():
        if r["fmt"] == "flac":
            assert is_flac(bytes(r["bytes"]))
            wave, sr = _decode_audio(r, allow_fake=False)
            assert len(wave) == r["n_samples"]
            assert sr == r["sample_rate"]
            n_flac += 1
        elif r["fmt"] == "mp3":
            with pytest.raises(NotImplementedError):
                _decode_audio(r, allow_fake=False)
    assert n_flac > 5


def test_wav_codec_cross_validated_by_stdlib_wave():
    """INDEPENDENT reference: Python's stdlib `wave` module is a
    separately-authored RIFF/WAVE parser — our encoder's output must be
    readable by it and yield byte-identical PCM frames, and our decoder
    must agree with it on scale/shape. This is the algorithmic-
    independence check the generated goldens can't provide (they apply
    the same codec functions directly)."""
    import io
    import wave as stdlib_wave

    from jirlbot_spark.functions.media import decode_wav, encode_wav

    rng = np.random.default_rng(17)
    for bits, n_ch in [(8, 1), (16, 1), (16, 2), (24, 1), (32, 2)]:
        n = 3000
        w = np.clip(
            0.5 * np.sin(np.arange(n) / 13.0)[:, None]
            + 0.1 * rng.standard_normal((n, n_ch)),
            -1,
            1,
        )[:, :n_ch]
        blob = encode_wav(w, 16000, bits=bits)
        r = stdlib_wave.open(io.BytesIO(blob))
        assert r.getframerate() == 16000
        assert r.getnchannels() == n_ch
        assert r.getsampwidth() == bits // 8
        assert r.getnframes() == n
        frames = r.readframes(n)
        # stdlib-read raw frames == the data chunk our decoder consumed
        ours, sr = decode_wav(blob)
        assert sr == 16000 and ours.shape == (n, n_ch)
        if bits == 16:
            theirs = np.frombuffer(frames, "<i2").reshape(n, n_ch)
            assert np.array_equal(
                theirs, np.round(ours * 32768).astype(np.int16)
            )


def test_wav_extensible_format_decodes():
    """WAVE_FORMAT_EXTENSIBLE (the layout most >2ch / 24-bit writers
    emit) decodes: the real tag comes from the SubFormat GUID's first
    word. Built by rewriting a plain PCM file's fmt chunk."""
    import struct

    from jirlbot_spark.functions.media import decode_wav, encode_wav

    wave = np.clip(
        0.5 * np.sin(np.arange(4000) / 7.0)
        + 0.1 * np.sin(np.arange(4000) / 3.0),
        -1,
        1,
    )
    for bits in (16, 24):
        plain = encode_wav(wave, 16000, bits=bits)
        want, sr = decode_wav(plain)
        # rebuild with an EXTENSIBLE fmt chunk (cbSize=22, GUID=PCM)
        base = struct.unpack("<HHIIHH", plain[20:36])
        guid = struct.pack("<H", 1) + bytes(14)  # KSDATAFORMAT PCM
        ext = struct.pack(
            "<HHIIHHHHI", 0xFFFE, *base[1:], 22, bits, 0x4
        ) + guid
        payload = plain[44:]
        chunks = (
            b"fmt " + struct.pack("<I", len(ext)) + ext
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        blob = (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        )
        got, sr2 = decode_wav(blob)
        assert sr2 == sr
        assert np.array_equal(got, want)
