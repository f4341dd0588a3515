"""Cross-validation of the audio codec family against INDEPENDENT,
third-party-encoded files.

CPython's `test/audiodata/` ships ONE clip (pluck, stereo, 11025 Hz)
encoded by external tools into WAV/AIFF/AU at PCM 8/16/24/32 bits,
plus µ-law AU and A-law AIFC. Two layers of evidence:

  1. PER-FILE EXACTNESS — stdlib `aifc` and `sunau` are
     separately-authored parsers of the same containers: for every
     file, our decode must equal byte-derived samples from theirs.
     G.711 expansion is pinned by exhaustive 256-value equality against
     stdlib `audioop`.
  2. CROSS-CONTAINER IDENTITY — the 24/32-bit renderings decode
     BIT-IDENTICALLY across all three containers (same master, three
     independent encoders). The 8/16-bit files were mastered
     independently (±1 LSB at 8-bit, ±11 LSB at 16-bit observed), so
     they get tolerance assertions, stated as such.
"""

from __future__ import annotations

import os
import sys
import warnings

import numpy as np
import pytest

_CANDIDATES = [
    os.path.join(sys.prefix, f"lib/python3.{m}/test/audiodata")
    for m in range(9, 15)
]
_DIR = next((p for p in _CANDIDATES if os.path.isdir(p)), None)

pytestmark = pytest.mark.skipif(
    _DIR is None, reason="CPython audiodata test files not found"
)


def _load(name: str) -> bytes:
    with open(os.path.join(_DIR, name), "rb") as f:
        return f.read()


def _stdlib_aiff(name: str) -> tuple[np.ndarray, int]:
    import aifc

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # aifc is deprecated in 3.11
        with aifc.open(os.path.join(_DIR, name)) as f:
            n_ch, sw, sr = f.getnchannels(), f.getsampwidth(), f.getframerate()
            comp = f.getcomptype()
            raw = f.readframes(f.getnframes())
    if comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
        # aifc expands G.711 itself on read: raw is already linear
        # native-endian int16
        flat = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    else:
        b = np.frombuffer(raw, np.uint8).reshape(-1, sw).astype(np.int64)
        v = np.zeros(len(b), np.int64)
        for i in range(sw):  # aifc returns big-endian frames
            v = (v << 8) | b[:, i]
        width = sw * 8
        v = np.where(v >= 1 << (width - 1), v - (1 << width), v)
        flat = v.astype(np.float32) / float(1 << (width - 1))
    return flat.reshape(-1, n_ch), sr


def _stdlib_au(name: str) -> tuple[np.ndarray, int]:
    import sunau

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with sunau.open(os.path.join(_DIR, name)) as f:
            n_ch, sw, sr = f.getnchannels(), f.getsampwidth(), f.getframerate()
            comp = f.getcomptype()  # sunau returns str, not bytes
            raw = f.readframes(f.getnframes())
    if comp in (b"ULAW", "ULAW"):
        # sunau expands ULAW itself on read: raw is already linear
        # native-endian int16
        flat = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    else:
        b = np.frombuffer(raw, np.uint8).reshape(-1, sw).astype(np.int64)
        v = np.zeros(len(b), np.int64)
        for i in range(sw):  # sunau frames are big-endian
            v = (v << 8) | b[:, i]
        width = sw * 8
        v = np.where(v >= 1 << (width - 1), v - (1 << width), v)
        flat = v.astype(np.float32) / float(1 << (width - 1))
    return flat.reshape(-1, n_ch), sr


def test_g711_tables_match_audioop_exhaustively():
    import audioop

    from jirlbot_spark.functions.aiff_au import ALAW_TABLE, ULAW_TABLE

    ref_u = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), "<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), "<i2")
    assert (ULAW_TABLE == ref_u).all()
    assert (ALAW_TABLE == ref_a).all()


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_wild_aiff_matches_stdlib_exactly(bits):
    from jirlbot_spark.functions.aiff_au import decode_aiff

    got, sr = decode_aiff(_load(f"pluck-pcm{bits}.aiff"))
    ref, sr2 = _stdlib_aiff(f"pluck-pcm{bits}.aiff")
    assert sr == sr2 == 11025
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_wild_au_matches_stdlib_exactly(bits):
    from jirlbot_spark.functions.aiff_au import decode_au

    got, sr = decode_au(_load(f"pluck-pcm{bits}.au"))
    ref, sr2 = _stdlib_au(f"pluck-pcm{bits}.au")
    assert sr == sr2 == 11025
    assert np.array_equal(got, ref)


def test_wild_g711_files_match_stdlib_exactly():
    from jirlbot_spark.functions.aiff_au import decode_aiff, decode_au

    got_u, _ = decode_au(_load("pluck-ulaw.au"))
    ref_u, _ = _stdlib_au("pluck-ulaw.au")
    assert np.array_equal(got_u, ref_u)
    got_a, _ = decode_aiff(_load("pluck-alaw.aifc"))
    ref_a, _ = _stdlib_aiff("pluck-alaw.aifc")
    assert np.array_equal(got_a, ref_a)


def test_wild_cross_container_identity():
    """24/32-bit: same master through three independent encoders must
    decode bit-identically (WAV via the in-tree RIFF codec). 8/16-bit
    renderings are independent masters — tolerance stated in module
    docstring."""
    from jirlbot_spark.functions.aiff_au import decode_aiff, decode_au
    from jirlbot_spark.functions.media import decode_wav

    for bits in (24, 32):
        w, _ = decode_wav(_load(f"pluck-pcm{bits}.wav"))
        u, _ = decode_au(_load(f"pluck-pcm{bits}.au"))
        f, _ = decode_aiff(_load(f"pluck-pcm{bits}.aiff"))
        assert np.array_equal(w, u) and np.array_equal(u, f), bits
    for bits, tol_lsb in ((8, 1.0), (16, 12.0)):
        lsb = 1.0 / (1 << (bits - 1))
        w, _ = decode_wav(_load(f"pluck-pcm{bits}.wav"))
        u, _ = decode_au(_load(f"pluck-pcm{bits}.au"))
        f, _ = decode_aiff(_load(f"pluck-pcm{bits}.aiff"))
        assert np.abs(w - u).max() <= tol_lsb * lsb
        assert np.abs(u - f).max() <= tol_lsb * lsb


def test_own_encoders_round_trip():
    from jirlbot_spark.functions.aiff_au import (
        ULAW_TABLE,
        decode_aiff,
        decode_au,
        encode_aiff,
        encode_au,
    )

    rng = np.random.default_rng(11)
    wave = (rng.random((500, 2)) * 2 - 1).astype(np.float64) * 0.9
    for bits in (8, 16, 24, 32):
        dec, sr = decode_aiff(encode_aiff(wave, 8000, bits=bits))
        assert sr == 8000 and dec.shape == (500, 2)
        assert np.abs(dec - wave).max() <= max(1.5 / (1 << (bits - 1)), 1e-7)
    dec, sr = decode_au(encode_au(wave, 22050, "pcm16"))
    assert sr == 22050
    assert np.abs(dec - wave).max() <= 1.5 / (1 << 15)
    # ulaw: every decoded sample must BE an expansion-table value, and
    # within companding error of the source
    dec_u, _ = decode_au(encode_au(wave, 8000, "ulaw"))
    table_vals = set((ULAW_TABLE.astype(np.int32) * 1).tolist())
    ints = np.round(dec_u * 32768.0).astype(np.int32)
    assert set(ints.reshape(-1).tolist()) <= table_vals
    assert np.abs(dec_u - wave).max() < 0.04


# ------------------------------------------------------- wild MP3 walk

_WILD_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/"
    "test.mp3"
)


@pytest.mark.skipif(
    not os.path.isfile(_WILD_MP3), reason="gsutil wild mp3 not present"
)
def test_wild_mp3_header_walk():
    """The one third-party MP3 in the sandbox (gsutil test data): an
    ID3v2-prefixed MPEG-2 Layer III mono stream. The container walk
    must skip the tag, count every frame, and report the structural
    facts pinned here (sample decode itself stays gated — see
    functions/mp3.py's measured-infeasibility note)."""
    from jirlbot_spark.functions.mp3 import is_mp3, mp3_info

    with open(_WILD_MP3, "rb") as f:
        data = f.read()
    assert is_mp3(data)
    info = mp3_info(data)
    assert info["sample_rate"] == 22050  # MPEG-2, sr_idx 0
    assert info["channels"] == 1
    # MPEG-2 Layer III: 576 samples per frame; whole stream walks clean
    assert info["n_frames"] == 45
    assert info["n_samples"] == 45 * 576
    assert round(info["bitrate_kbps"]) == 64 and not info["vbr"]
    assert 1.1 < info["duration_s"] < 1.3
