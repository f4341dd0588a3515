"""MP3 frame walk + MP4 box walk (functions/mp3.py, functions/mp4.py)
and their container-real integration into media.audio_features /
media.frame_sample."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jirlbot_spark.functions.mp3 import encode_mp3_stub, is_mp3, mp3_info
from jirlbot_spark.functions.mp4 import encode_mp4_stub, is_mp4, mp4_info


# ---------- mp3 walk ----------

def test_mp3_cbr_walk():
    b = encode_mp3_stub(44100, 44100 * 2, channels=1, bitrate_kbps=128, seed=3)
    i = mp3_info(b)
    assert i["sample_rate"] == 44100 and i["channels"] == 1 and not i["vbr"]
    assert 0 <= i["n_samples"] - 44100 * 2 < 1152  # rounds up to a frame
    assert abs(i["bitrate_kbps"] - 128) < 2.0  # padding-free CBR undershoot


@pytest.mark.parametrize(
    "sr,spf", [(44100, 1152), (16000, 576), (8000, 576)]
)  # MPEG1 / MPEG2 / MPEG2.5 Layer III samples-per-frame
def test_mp3_versions(sr, spf):
    b = encode_mp3_stub(sr, sr, seed=1, bitrate_kbps=64)
    i = mp3_info(b)
    assert i["sample_rate"] == sr
    assert i["n_samples"] == i["n_frames"] * spf


def test_mp3_vbr_and_id3():
    b = encode_mp3_stub(
        16000, 16000 * 3, channels=2, vbr_cycle=(64, 96, 128), seed=5,
        id3_bytes=300,
    )
    i = mp3_info(b)
    assert i["vbr"] and i["channels"] == 2
    assert 64 < i["bitrate_kbps"] < 128  # mean of the cycle


def test_mp3_truncated_final_frame_excluded():
    b = encode_mp3_stub(44100, 44100, seed=9)
    assert mp3_info(b[:-100])["n_frames"] == mp3_info(b)["n_frames"] - 1


def test_mp3_id3v1_trailer_ignored():
    b = encode_mp3_stub(44100, 11520, seed=2)
    tagged = b + b"TAG" + b"\x00" * 125
    assert mp3_info(tagged)["n_frames"] == mp3_info(b)["n_frames"]


def test_mp3_no_false_positives_on_noise():
    rng = np.random.default_rng(0)
    assert not any(
        is_mp3(rng.bytes(int(rng.integers(200, 3000)))) for _ in range(200)
    )
    with pytest.raises(ValueError):
        mp3_info(b"\x00" * 500)


def test_mp3_garbage_prefix_resync():
    b = encode_mp3_stub(44100, 11520, seed=4)
    # walk must scan past leading garbage to the first 2-header sync
    assert mp3_info(b"\x00garbage\xff\xfb" + b)["n_frames"] == mp3_info(b)[
        "n_frames"
    ]


# ---------- mp4 walk ----------

def test_mp4_stub_walk():
    b = encode_mp4_stub(320, 240, 90, fps=30.0, seed=4)
    i = mp4_info(b)
    assert (i["w"], i["h"], i["n_frames"]) == (320, 240, 90)
    assert abs(i["fps"] - 30.0) < 1e-6
    assert abs(i["duration_s"] - 3.0) < 1e-3
    assert i["codec"] == "avc1" and i["n_tracks"] == 1


def test_mp4_codec_fourcc_and_small():
    i = mp4_info(encode_mp4_stub(16, 32, 7, fps=24.0, codec=b"hev1", seed=1))
    assert (i["w"], i["h"], i["n_frames"], i["codec"]) == (16, 32, 7, "hev1")


def test_mp4_errors():
    with pytest.raises(ValueError):
        mp4_info(b"\x00\x00\x00\x0cftypisom")  # no moov
    with pytest.raises(ValueError):
        mp4_info(b"not a container at all")
    rng = np.random.default_rng(1)
    assert not any(
        is_mp4(rng.bytes(int(rng.integers(100, 2000)))) for _ in range(200)
    )


# ---------- media integration (container-real metadata) ----------

def test_audio_features_mp3_duration_is_real(spark):
    from jirlbot_spark.functions.media import AUDIO_SCHEMA, audio_features

    blob = encode_mp3_stub(44100, 44100 * 2, seed=7)
    true_n = mp3_info(blob)["n_samples"]
    # metadata column LIES (wrong rate + wrong length): features must
    # come from the stream walk, not the row
    row = {
        "audio_id": "a0", "bytes": blob, "fmt": "mp3",
        "sample_rate": 8000, "n_samples": 999, "caption": "x",
    }
    df = spark.createDataFrame(pd.DataFrame([row]), schema=AUDIO_SCHEMA)
    out = audio_features(df).collect()[0]
    assert abs(out.duration_s - true_n / 44100) < 1e-9


def test_audio_features_mp3_gate():
    from jirlbot_spark.functions.media import _decode_audio

    blob = encode_mp3_stub(44100, 4410, seed=8)
    row = {"bytes": blob, "n_samples": 4410}
    with pytest.raises(NotImplementedError, match="frame-header walk is real"):
        _decode_audio(row, allow_fake=False)
    wave, sr = _decode_audio(row, allow_fake=True)
    assert sr == 44100 and len(wave) == mp3_info(blob)["n_samples"]


def test_frame_sample_mp4_cardinality_is_real(spark):
    from jirlbot_spark.functions.media import VIDEO_SCHEMA, frame_sample

    blob = encode_mp4_stub(24, 16, 25, fps=30.0, seed=9)
    # metadata LIES: n_frames=99, w/h wrong — walk must win
    row = {
        "video_id": "v0", "bytes": blob, "fmt": "mp4", "w": 8, "h": 8,
        "n_frames": 99, "fps": 30.0, "caption": "x",
    }
    df = spark.createDataFrame(pd.DataFrame([row]), schema=VIDEO_SCHEMA)
    out = frame_sample(df, every_n=10).collect()
    assert sorted(r.frame_idx for r in out) == [0, 10, 20]
    assert all((r.w, r.h) == (24, 16) for r in out)
    assert all(len(r.pixels) == 24 * 16 * 3 for r in out)


# ---------- webm walk ----------

def test_webm_stub_walk():
    from jirlbot_spark.functions.webm import encode_webm_stub, is_webm, webm_info

    b = encode_webm_stub(640, 360, 75, fps=25.0, seed=2)
    assert is_webm(b)
    i = webm_info(b)
    assert (i["w"], i["h"], i["n_frames"]) == (640, 360, 75)
    assert abs(i["duration_s"] - 3.0) < 1e-9
    assert abs(i["fps"] - 25.0) < 1e-9
    assert i["codec"] == "V_VP8" and i["n_tracks"] == 1


def test_webm_codec_and_errors():
    from jirlbot_spark.functions.webm import encode_webm_stub, is_webm, webm_info

    i = webm_info(encode_webm_stub(16, 16, 3, fps=30.0, codec="V_VP9", seed=1))
    assert (i["n_frames"], i["codec"]) == (3, "V_VP9")
    with pytest.raises(ValueError):
        webm_info(b"not ebml at all")
    rng = np.random.default_rng(3)
    assert not any(
        is_webm(rng.bytes(int(rng.integers(100, 2000)))) for _ in range(200)
    )


def test_frame_sample_webm_cardinality_is_real(spark):
    from jirlbot_spark.functions.media import VIDEO_SCHEMA, frame_sample
    from jirlbot_spark.functions.webm import encode_webm_stub

    blob = encode_webm_stub(20, 12, 31, fps=30.0, seed=6)
    row = {
        "video_id": "v1", "bytes": blob, "fmt": "webm", "w": 8, "h": 8,
        "n_frames": 5, "fps": 30.0, "caption": "x",
    }
    df = spark.createDataFrame(pd.DataFrame([row]), schema=VIDEO_SCHEMA)
    out = frame_sample(df, every_n=10).collect()
    assert sorted(r.frame_idx for r in out) == [0, 10, 20, 30]
    assert all((r.w, r.h) == (20, 12) for r in out)


# ---------- Motion-JPEG in mp4 (real sample decode) ----------

def _gradient_frames(n: int, h: int, w: int, salt: int = 0) -> np.ndarray:
    f = np.arange(n, dtype=np.int32)[:, None, None, None]
    y = np.arange(h, dtype=np.int32)[None, :, None, None]
    x = np.arange(w, dtype=np.int32)[None, None, :, None]
    c = np.arange(3, dtype=np.int32)[None, None, None, :]
    return ((x * 3 + y * 5 + f * 7 + c * 11 + salt) % 256).astype(np.uint8)


def test_mp4_mjpeg_roundtrip_psnr():
    from jirlbot_spark.functions.mp4 import decode_mp4_frames, encode_mp4_mjpeg

    frames = _gradient_frames(7, 16, 24)
    blob = encode_mp4_mjpeg(frames, fps=24.0)
    info = mp4_info(blob)
    assert info["codec"] == "jpeg"
    assert info["n_frames"] == 7 and (info["w"], info["h"]) == (24, 16)
    dec, fps = decode_mp4_frames(blob)
    assert fps == pytest.approx(24.0) and dec.shape == frames.shape
    mse = np.mean((dec.astype(np.float64) - frames) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-12)) >= 40.0  # lossy invariant


def test_mp4_mjpeg_subsampled_decodes():
    from jirlbot_spark.functions.mp4 import decode_mp4_frames, encode_mp4_mjpeg

    frames = _gradient_frames(3, 16, 16, salt=5)
    dec, _ = decode_mp4_frames(encode_mp4_mjpeg(frames, subsample="420"))
    assert dec.shape == frames.shape


def test_mp4_non_jpeg_codec_gated():
    from jirlbot_spark.functions.mp4 import decode_mp4_frames

    with pytest.raises(NotImplementedError):
        decode_mp4_frames(encode_mp4_stub(16, 16, 5, codec=b"avc1"))


def test_mp4_sample_range_past_eof_rejected():
    from jirlbot_spark.functions.mp4 import decode_mp4_frames, encode_mp4_mjpeg

    blob = encode_mp4_mjpeg(_gradient_frames(4, 16, 16), fps=30.0)
    with pytest.raises(ValueError):
        decode_mp4_frames(blob[:-10])  # mdat shorter than stsz claims


def test_mp4_sample_ranges_multichunk_stsc_co64():
    """Hand-built stbl: 3 chunks via co64, stsc {chunk1: 2/chunk,
    chunk3: 1/chunk} — exercises the run-length chunk map our own
    encoder (single chunk) never emits."""
    import struct

    from jirlbot_spark.functions.mp4 import mp4_sample_ranges

    def box(t, body):
        return struct.pack(">I4s", 8 + len(body), t) + body

    sizes = [3, 4, 5, 6, 7]
    stsz = box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, 5) + struct.pack(">5I", *sizes),
    )
    stsc = box(
        b"stsc",
        struct.pack(">B3xI", 0, 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 3, 1, 1),
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    payload = bytes(range(64))

    def build(offs):
        co64 = box(
            b"co64", struct.pack(">B3xI", 0, 3) + struct.pack(">3Q", *offs)
        )
        stbl = box(b"stbl", stsz + stsc + co64)
        hdlr = box(
            b"hdlr", struct.pack(">B3xI4s12x", 0, 0, b"vide") + b"x\x00"
        )
        mdia = box(b"mdia", hdlr + box(b"minf", stbl))
        moov = box(b"moov", box(b"trak", mdia))
        return ftyp + moov + payload

    base = len(build((0, 0, 0))) - len(payload)
    o1, o2, o3 = base, base + 16, base + 40
    ranges = mp4_sample_ranges(build((o1, o2, o3)))
    assert ranges == [
        (o1, 3), (o1 + 3, 4), (o2, 5), (o2 + 5, 6), (o3, 7),
    ]


def test_frame_sample_mp4_mjpeg_pixels_are_real(spark):
    from jirlbot_spark.functions.media import VIDEO_SCHEMA, frame_sample
    from jirlbot_spark.functions.mp4 import encode_mp4_mjpeg

    frames = _gradient_frames(25, 16, 24, salt=9)
    blob = encode_mp4_mjpeg(frames, fps=30.0)
    # metadata LIES: decode must come from the bytes, not the row
    row = {
        "video_id": "v2", "bytes": blob, "fmt": "mp4", "w": 8, "h": 8,
        "n_frames": 99, "fps": 30.0, "caption": "x",
    }
    df = spark.createDataFrame(pd.DataFrame([row]), schema=VIDEO_SCHEMA)
    out = {r.frame_idx: r for r in frame_sample(df, every_n=10).collect()}
    assert sorted(out) == [0, 10, 20]
    from jirlbot_spark.functions.mp4 import decode_mp4_frames

    dec, _ = decode_mp4_frames(blob)
    for idx, r in out.items():
        assert (r.w, r.h) == (24, 16)
        assert r.pixels == dec[idx].tobytes()  # bit-equal to direct decode
