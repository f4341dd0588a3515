"""Multimodal payload plumbing beyond images: audio + video columns, and
general image resizing.

Design (per the training-data-pipeline mandate): media travel as opaque
`binary` columns with TYPED metadata; decode / feature-extract /
frame-sample run as Arrow-batched mapInPandas operators.

Decode backends, by format:

  - RIFF/WAVE audio, FLAC audio, and uncompressed RIFF/AVI video decode
    for REAL with the engine's own pure-numpy parsers
    (encode_wav/decode_wav, functions/flac.py, encode_avi/decode_avi) —
    no codec library involved, same move as functions/jpeg.py for
    images; the FLAC decoder covers CONSTANT/VERBATIM/FIXED/LPC
    subframes, rice/rice2 residuals, and all three stereo-decorrelation
    channel assignments, with STREAMINFO-MD5 output verification;
  - mp3 and mp4 are CONTAINER-REAL: the engine's own header/box walkers
    (functions/mp3.py frame walk, functions/mp4.py ISO-BMFF walk) read
    true duration / sample rate / frame count / dimensions from the
    bytes, so audio_features' duration and frame_sample's cardinality
    are measured, not metadata-trusted — while SAMPLE decode still
    needs libraries NOT in this container and sits behind a capability
    gate: `audio_codec()` / `video_codec()` try the real imports
    (soundfile / av) and return None here — a cluster image that ships
    the libs activates them with no other change;
  - the gated fallback is a DETERMINISTIC FAKE decoder (seeded from the
    payload bytes): wrong waveforms/frames, right SHAPES — so the
    Spark-side contract (schemas, batch shapes, explode cardinality,
    partitioning) is fully real and fully tested either way;
  - callers that must not silently get fake samples pass
    `allow_fake=False` and receive NotImplementedError — the explicit
    stub marker — for the formats that would need it.

Image resize (resize_pixels / resize_images) is REAL — pure-numpy
nearest-neighbor over the engine's own codecs (functions/images.py).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jirlbot_spark.functions.limits import check_dims
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from jirlbot_spark.functions.images import decode_image, encode_image

# ---- typed payload schemas (SURVEY.md §1.2 style: explicit StructType) ----

AUDIO_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("fmt", StringType()),        # "wav" | "flac" | ...
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("caption", StringType()),
    ]
)

VIDEO_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("fmt", StringType()),        # "mp4" | "webm" | ...
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("caption", StringType()),
    ]
)


def audio_codec():
    """Real audio decoder if available in this environment, else None."""
    try:  # pragma: no cover - not present in the sandbox
        import soundfile  # noqa: F401

        return soundfile
    except ImportError:
        return None


def video_codec():
    """Real video decoder if available in this environment, else None."""
    try:  # pragma: no cover - not present in the sandbox
        import av  # noqa: F401

        return av
    except ImportError:
        return None


# ---- WAV codec (REAL, pure numpy/struct — RIFF is trivial) ----
#
# Makes `audio_features` REAL in-sandbox for wav payloads the same way
# functions/jpeg.py did for lossy images: RIFF/WAVE PCM (8/16/24/32-bit)
# and IEEE float32 decode with no external codec. Non-wav formats (flac,
# mp3, ...) still need a shipped codec and stay behind the fake/gate.

_PCM_TAG, _FLOAT_TAG = 1, 3


def encode_wav(
    wave: np.ndarray, sample_rate: int, bits: int = 16, float32: bool = False
) -> bytes:
    """Encode float samples in [-1, 1] ((n,) mono or (n, ch)) to a RIFF/
    WAVE blob. PCM at 8/16/24/32 bits (8-bit is unsigned per the spec),
    or IEEE float32 when `float32` is set. Quantization: round(v *
    2^(bits-1)) clipped to the signed range — the inverse of decode_wav's
    v / 2^(bits-1) scaling."""
    arr = np.asarray(wave, np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    if float32:
        tag, bits = _FLOAT_TAG, 32
        payload = arr.astype("<f4").tobytes()
    else:
        if bits not in (8, 16, 24, 32):
            raise ValueError(f"unsupported PCM bit depth {bits}")
        tag = _PCM_TAG
        full = 1 << (bits - 1)
        q = np.clip(np.round(arr * full), -full, full - 1).astype(np.int64)
        if bits == 8:
            payload = (q + 128).astype(np.uint8).tobytes()
        elif bits == 24:
            le = (q & 0xFFFFFF).astype("<u4").view(np.uint8).reshape(-1, 4)
            payload = le[:, :3].tobytes()
        else:
            payload = q.astype(f"<i{bits // 8}").tobytes()
    block_align = n_ch * bits // 8
    fmt_chunk = struct.pack(
        "<HHIIHH", tag, n_ch, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    if len(payload) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE blob to ((n_frames, n_channels) float32 in
    [-1, 1], sample_rate). Walks the chunk list (tolerating extra chunks
    like LIST/INFO), supports PCM 8/16/24/32-bit and IEEE float32.
    Compressed formats raise NotImplementedError; malformed structure
    raises ValueError."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = payload = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                # the real format tag is the first word of the SubFormat
                # GUID (offset 24: 16 base + cbSize + wValidBits + mask)
                if len(body) < 26:
                    raise ValueError("truncated EXTENSIBLE fmt chunk")
                fmt = (struct.unpack("<H", body[24:26])[0],) + fmt[1:]
        elif cid == b"data":
            payload = body
        pos += 8 + clen + (clen % 2)
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, sr, _brate, _balign, bits = fmt
    if tag not in (_PCM_TAG, _FLOAT_TAG):
        raise NotImplementedError(f"compressed WAVE format tag {tag}")
    if n_ch < 1:
        raise ValueError("zero channels")
    if tag == _FLOAT_TAG:
        if bits != 32:
            raise NotImplementedError(f"float WAV at {bits} bits")
        flat = np.frombuffer(payload, "<f4").astype(np.float32)
    elif bits == 8:
        flat = (
            np.frombuffer(payload, np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif bits == 24:
        raw = np.frombuffer(payload[: len(payload) // 3 * 3], np.uint8)
        tri = raw.reshape(-1, 3).astype(np.uint32)
        v = (tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)).astype(
            np.int32
        )
        v = (v << 8) >> 8  # sign-extend 24 -> 32
        flat = v.astype(np.float32) / float(1 << 23)
    elif bits in (16, 32):
        flat = np.frombuffer(payload, f"<i{bits // 8}").astype(
            np.float32
        ) / float(1 << (bits - 1))
    else:
        raise NotImplementedError(f"PCM WAV at {bits} bits")
    n_frames = len(flat) // n_ch
    return flat[: n_frames * n_ch].reshape(n_frames, n_ch), int(sr)


# ---- AVI codec (REAL, pure numpy/struct — uncompressed DIB frames) ----
#
# Same move as the WAV codec: AVI is RIFF, and the uncompressed BI_RGB
# variant (24-bit bottom-up BGR '00db' frames) needs no codec library, so
# `frame_sample` becomes REAL in-sandbox for avi payloads. MJPEG-in-AVI
# (biCompression 'MJPG', one baseline JPEG per '00dc' chunk) is ALSO real:
# the container walk below composes with the engine's own JPEG codec
# (functions/jpeg.py), so the most common legacy crawl video format
# decodes end-to-end with zero external libraries. Other compressed
# streams (mp4/webm) still require a shipped decoder and stay behind the
# fake/gate.

MJPG_FOURCC = 0x47504A4D  # "MJPG" as a little-endian biCompression int


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) walking a RIFF chunk list."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen % 2)


def encode_avi(
    frames: np.ndarray,
    fps: float = 30.0,
    codec: str = "raw",
    quality: int = 90,
    subsample: str = "444",
) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an AVI.

    codec="raw":  BI_RGB 24-bit, bottom-up BGR rows padded to 4 bytes,
                  one '00db' chunk per frame (lossless).
    codec="mjpg": MJPEG — one baseline JPEG (functions/jpeg.py) per
                  '00dc' chunk, biCompression='MJPG' (lossy; the engine's
                  PSNR>=40dB @ quality 90 invariant applies per frame at
                  the default 4:4:4; `subsample` passes through to the
                  JPEG encoder for 4:2:2/4:2:0 wild-shaped streams).
    """
    if codec not in ("raw", "mjpg"):
        raise ValueError(f"unknown AVI codec {codec!r}")
    frames = np.asarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    row_pad = (-(w * 3)) % 4
    frame_bytes = (w * 3 + row_pad) * h
    scale, rate = 1000, int(round(fps * 1000))
    handler = b"DIB " if codec == "raw" else b"MJPG"
    compression = 0 if codec == "raw" else MJPG_FOURCC
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(1e6 * scale / max(rate, 1)), frame_bytes * int(fps) + 1, 0,
        0x10, n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0, scale, rate, 0, n,
        frame_bytes, 0xFFFFFFFF & -1, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, compression, frame_bytes, 0, 0, 0, 0,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    if codec == "mjpg":
        from jirlbot_spark.functions.jpeg import encode_jpeg

        movi_body = b"".join(
            chunk(
                b"00dc",
                encode_jpeg(frames[i], quality=quality, subsample=subsample),
            )
            for i in range(n)
        )
    else:
        movi_body = b"".join(
            chunk(
                b"00db",
                np.pad(
                    frames[i, ::-1, :, ::-1].reshape(h, w * 3),  # bottom-up BGR
                    ((0, 0), (0, row_pad)),
                ).tobytes(),
            )
            for i in range(n)
        )
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """Decode an AVI to ((n, h, w, 3) uint8 RGB, fps).
    Supports BI_RGB 24-bit bottom-up '00db'/'00dc' frames and MJPEG
    ('MJPG' biCompression; one baseline JPEG per chunk, decoded by the
    engine's own functions/jpeg.py); other compressed streams raise
    NotImplementedError, malformed structure ValueError."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    w = h = None
    fps = 30.0
    compression = 0
    bitcount = 24
    raw_frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, fps, compression, bitcount
        for cid, bstart, blen in _riff_chunks(data, pos, end):
            body_end = bstart + blen
            if cid == b"LIST":
                walk(bstart + 4, body_end)
            elif cid == b"strh" and data[bstart : bstart + 4] == b"vids":
                _, _, _, _, _, _, scale, rate = struct.unpack(
                    "<4s4sIHHIII", data[bstart : bstart + 28]
                )[:8]
                if scale:
                    fps = rate / scale
            elif cid == b"strf" and w is None:
                (_, bw, bh, _, bc, comp) = struct.unpack(
                    "<IiiHHI", data[bstart : bstart + 20]
                )
                w, h = int(bw), abs(int(bh))
                bitcount, compression = int(bc), int(comp)
            elif cid in (b"00db", b"00dc"):
                raw_frames.append(data[bstart:body_end])

    walk(12, end)
    if w is None or h is None:
        raise ValueError("missing stream format (strf) chunk")
    if compression == MJPG_FOURCC:
        from jirlbot_spark.functions.jpeg import decode_jpeg

        if not raw_frames:
            return np.zeros((0, h, w, 3), np.uint8), float(fps)
        decoded = [decode_jpeg(bytes(rf)) for rf in raw_frames]
        shapes = {d.shape for d in decoded}
        if len(shapes) != 1:
            raise ValueError(f"inconsistent MJPEG frame shapes: {shapes}")
        return np.stack(decoded), float(fps)
    if compression != 0:
        raise NotImplementedError(
            f"compressed AVI stream (fourcc {compression:#x})"
        )
    if bitcount != 24:
        raise NotImplementedError(f"{bitcount}-bit DIB frames")
    check_dims(w, h, "AVI frame")
    row_pad = (-(w * 3)) % 4
    stride = w * 3 + row_pad
    # validate EVERY chunk before the output allocation: with real bytes
    # behind each claimed frame, the alloc is bounded by the input size
    # (a decode-bomb cannot claim frames it did not ship)
    for rf in raw_frames:
        if len(rf) < stride * h:
            raise ValueError("truncated frame chunk")
    out = np.zeros((len(raw_frames), h, w, 3), np.uint8)
    for i, rf in enumerate(raw_frames):
        rows = np.frombuffer(rf[: stride * h], np.uint8).reshape(h, stride)
        out[i] = rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return out, float(fps)


def _seed_from(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2s(data, digest_size=8).digest(), "little")


def fake_decode_audio(data: bytes, n_samples: int) -> np.ndarray:
    """Deterministic fake waveform (float32 [-1,1]) seeded from content."""
    rng = np.random.default_rng(_seed_from(data))
    return (rng.random(int(n_samples), dtype=np.float32) * 2.0) - 1.0


def fake_decode_frame(
    data: bytes, frame_idx: int, w: int, h: int
) -> np.ndarray:
    """Deterministic fake RGB frame (h, w, 3 uint8) seeded from
    (content, frame index) — distinct frames differ, replays match."""
    rng = np.random.default_rng(_seed_from(data) ^ (frame_idx + 1))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _mono(wave: np.ndarray) -> np.ndarray:
    """(frames, ch) -> (frames,) by channel mean — the pinned contract:
    features describe CLIP TIME, so a stereo clip of n frames yields n
    samples (duration n/sr), not 2n interleaved ones."""
    if wave.ndim == 2:
        return wave.mean(axis=1, dtype=np.float64).astype(np.float32)
    return wave.reshape(-1)


def _decode_audio(row, allow_fake: bool) -> tuple[np.ndarray, int | None]:
    """(mono samples, stream sample rate or None) for one payload row
    ((frames,), multi-channel downmixed by `_mono`). RIFF/WAVE and FLAC
    payloads decode for REAL via the engine's own parsers; mp3 payloads
    get a REAL frame-header walk (true n_samples + sample rate) with
    gated fake SAMPLES; other formats use soundfile when shipped, else
    the gated deterministic fake sized from row metadata."""
    data = bytes(row["bytes"])
    if is_wav(data):
        wave, sr = decode_wav(data)
        return _mono(wave), sr
    from jirlbot_spark.functions.flac import decode_flac, is_flac

    if is_flac(data):
        wave, sr = decode_flac(data)
        return _mono(wave), sr
    from jirlbot_spark.functions.aiff_au import (
        decode_aiff,
        decode_au,
        is_aiff,
        is_au,
    )

    if is_au(data):
        wave, sr = decode_au(data)
        return _mono(wave), sr
    if is_aiff(data):
        wave, sr = decode_aiff(data)
        return _mono(wave), sr
    codec = audio_codec()
    if codec is not None:  # pragma: no cover - cluster-only path
        import io

        wave, sr = codec.read(io.BytesIO(data))
        return _mono(np.asarray(wave, dtype=np.float32)), int(sr)
    from jirlbot_spark.functions.mp3 import is_mp3, mp3_info

    if is_mp3(data):
        if not allow_fake:
            raise NotImplementedError(
                "STUB: mp3 SAMPLE decode needs a codec library "
                "(soundfile absent); the frame-header walk is real — "
                "pass allow_fake=True for fake samples at the walked "
                "length"
            )
        info = mp3_info(data)
        return (
            fake_decode_audio(data, info["n_samples"]),
            info["sample_rate"],
        )
    if not allow_fake:
        raise NotImplementedError(
            "STUB: no codec for this audio format in this environment "
            "(soundfile absent); pass allow_fake=True for the "
            "deterministic fake backend"
        )
    return fake_decode_audio(data, row["n_samples"]), None


AUDIO_FEATURES_FIELDS = [
    StructField("audio_id", StringType()),
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("zero_crossings", LongType()),
]


def audio_features(audio: DataFrame, allow_fake: bool = True) -> DataFrame:
    """Per-clip features (duration, RMS, zero crossings) via mapInPandas.
    Feature math is real numpy; only sample decoding is gated/faked."""
    out_schema = StructType(AUDIO_FEATURES_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, row in pdf.iterrows():
                wave, stream_sr = _decode_audio(row, allow_fake)
                # prefer the rate measured from the bytes over the
                # metadata column — features describe the STREAM
                sr = stream_sr or max(int(row["sample_rate"]), 1)
                rows.append(
                    {
                        "audio_id": row["audio_id"],
                        "duration_s": len(wave) / sr,
                        "rms": float(np.sqrt(np.mean(wave**2))) if len(wave) else 0.0,
                        "zero_crossings": int(
                            np.count_nonzero(np.diff(np.signbit(wave)))
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return audio.mapInPandas(run, schema=out_schema)


FRAME_FIELDS = [
    StructField("video_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("pixels", BinaryType()),  # raw RGB24, h*w*3 bytes
]


def frame_sample(
    video: DataFrame, every_n: int = 10, allow_fake: bool = True
) -> DataFrame:
    """1→N frame sampling (video row → every_n-th frame) via mapInPandas.

    The cardinality, schema, and byte layout (raw RGB24) are the real
    contract downstream feature extractors consume; only the pixel source
    is gated/faked. Scale posture: frames of one video stay inside one
    task (no shuffle); downstream repartitions only if it must."""
    out_schema = StructType(FRAME_FIELDS)
    codec = video_codec()
    from jirlbot_spark.functions.gif import decode_gif_frames, is_gif
    from jirlbot_spark.functions.mp4 import (
        JPEG_SAMPLE_FOURCCS,
        decode_mp4_frames,
        is_mp4,
        mp4_info,
    )
    from jirlbot_spark.functions.webm import is_webm, webm_info

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row["bytes"])
                w, h = int(row["w"]), int(row["h"])
                decoded = None
                meta = None
                if is_avi(data):
                    # REAL decode: uncompressed AVI via the engine's own
                    # RIFF parser — no codec library involved
                    decoded, _fps = decode_avi(data)
                elif is_gif(data):
                    # REAL decode: animated GIF with full disposal/
                    # transparency composition (functions/gif.py) — the
                    # web's other wild animation container
                    decoded, _delays = decode_gif_frames(data)
                else:
                    # container-REAL: frame count and dimensions come
                    # from the box/element walk, not the metadata row
                    walker = (
                        mp4_info
                        if is_mp4(data)
                        else webm_info if is_webm(data) else None
                    )
                    if walker is not None:
                        try:
                            meta = walker(data)
                        except ValueError:
                            meta = None
                    if (
                        is_mp4(data)
                        and meta is not None
                        and (meta.get("codec") or "").strip().lower()
                        in JPEG_SAMPLE_FOURCCS
                    ):
                        # REAL decode: Motion-JPEG in mp4/mov — the
                        # sample-table walk (stsz/stsc/stco) hands each
                        # sample to the engine's own JPEG codec
                        decoded, _fps = decode_mp4_frames(data)
                    elif codec is None and not allow_fake:
                        raise NotImplementedError(
                            "STUB: no codec for non-avi video frames in "
                            "this environment (av absent); pass "
                            "allow_fake=True for the deterministic fake "
                            "backend"
                        )
                if meta is not None and meta.get("w") and meta.get("h"):
                    w, h = int(meta["w"]), int(meta["h"])
                n_frames = (
                    len(decoded)
                    if decoded is not None
                    else (meta or {}).get("n_frames") or int(row["n_frames"])
                )
                for idx in range(0, n_frames, every_n):
                    frame = (
                        decoded[idx]
                        if decoded is not None
                        else fake_decode_frame(data, idx, w, h)
                    )
                    rows.append(
                        {
                            "video_id": row["video_id"],
                            "frame_idx": idx,
                            "w": frame.shape[1],
                            "h": frame.shape[0],
                            "pixels": frame.tobytes(),
                        }
                    )
            yield pd.DataFrame(rows)

    return video.mapInPandas(run, schema=out_schema)


@F.pandas_udf(LongType())
def px_sum_udf(b: pd.Series) -> pd.Series:
    """Byte-sum of a binary pixel buffer — a cheap content fingerprint
    the frame_sample driver key pins against golden direct decodes."""
    return b.map(lambda x: int(np.frombuffer(x, np.uint8).sum()))


# ---- image resize (REAL, numpy nearest-neighbor) ----

def resize_pixels(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 array — index-gather
    only, bit-deterministic."""
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return pixels[ys[:, None], xs[None, :]]


RESIZED_FIELDS = [
    StructField("image_id", StringType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
]


def resize_images(pages: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (same fmt) via
    mapInPandas over the `pages` payload table. Fully real: uses the
    engine's own PNG/BMP/RAW codecs."""
    out_schema = StructType(RESIZED_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, row in pdf.iterrows():
                fmt = row["fmt"]
                px = decode_image(
                    bytes(row["bytes"]), fmt, int(row["w"]), int(row["h"])
                )
                rz = resize_pixels(px, out_w, out_h)
                rows.append(
                    {
                        "image_id": row["image_id"],
                        "bytes": encode_image(rz, fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return pages.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema=out_schema
    )
