"""Image metadata scrubbing (functions/image_meta.py +
operators/image_scrub.py): allow-list policy, pixel invariance,
idempotence, fail-closed behavior on malformed containers, and the
Spark operator plumbing.
"""

from __future__ import annotations

import numpy as np
import pytest

from jirlbot_spark.functions.image_meta import (
    strip_gif,
    strip_jpeg,
    strip_metadata,
    strip_png,
)
from jirlbot_spark.functions.images import _chunk, decode_image, encode_image
from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg
from jirlbot_spark.sources.fixtures import gen_meta_images, gen_pixels


def _px(seed=5, w=16, h=16):
    return gen_pixels(np.random.default_rng(seed), w, h)


# ------------------------------------------------------------------ PNG

def test_png_strips_text_chunks_keeps_pixels():
    data = encode_image(_px(), "png")
    head, rest = data[:33], data[33:]
    dirty = (
        head
        + _chunk(b"tEXt", b"Author\x00someone")
        + _chunk(b"zTXt", b"c\x00\x00xxxx")
        + _chunk(b"eXIf", b"II*\x00")
        + rest
    )
    clean, n = strip_png(dirty)
    assert n == 3
    assert clean == data  # exactly the bare encode
    assert np.array_equal(decode_image(clean, "png", 0, 0), _px())


def test_png_keeps_transparency_and_drops_trailing_junk():
    data = encode_image(_px(), "png")
    head, rest = data[:33], data[33:]
    dirty = head + _chunk(b"tRNS", b"\x00\x01") + rest + b"JUNKJUNK"
    clean, n = strip_png(dirty)
    assert n == 1  # only the trailing junk
    assert _chunk(b"tRNS", b"\x00\x01") in clean
    assert not clean.endswith(b"JUNKJUNK")


def test_png_fails_closed():
    data = encode_image(_px(), "png")
    with pytest.raises(ValueError):
        strip_png(data[:-8])  # truncated (IEND gone)
    with pytest.raises(ValueError):
        strip_png(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\xff\xffAAAA")


# ----------------------------------------------------------------- JPEG

def test_jpeg_strips_app_com_pre_sos_only():
    data = encode_jpeg(_px(), quality=90)
    note = b"\xff\xfe\x00\x07hello"
    app1 = b"\xff\xe1\x00\x08Exif\x00\x00"
    dirty = data[:2] + note + app1 + data[2:]
    clean, n = strip_jpeg(dirty)
    # APP0 (JFIF from our encoder) + COM + APP1
    assert n == 3
    assert b"hello" not in clean and b"Exif" not in clean
    assert np.array_equal(decode_jpeg(clean), decode_jpeg(data))
    # bytes from SOS on are verbatim
    sos = clean.find(b"\xff\xda")
    assert sos > 0 and clean[sos:] == data[data.find(b"\xff\xda"):]


def test_jpeg_keeps_dac_conditioning_tables():
    """A DAC (0xCC) segment — arithmetic-coding conditioning tables — is
    structural decode state, not metadata: stripping it would break the
    decoded-pixels-identical contract for arithmetic-coded JPEGs."""
    data = encode_jpeg(_px(), quality=90)
    dac = b"\xff\xcc\x00\x04\x01\x11"
    com = b"\xff\xfe\x00\x06beef"
    dirty = data[:2] + dac + com + data[2:]
    clean, n = strip_jpeg(dirty)
    assert dac in clean
    assert b"beef" not in clean
    assert n == 2  # APP0 (JFIF) + COM, never the DAC


def test_jpeg_fails_closed():
    with pytest.raises(ValueError):
        strip_jpeg(b"\x00\x00")
    data = encode_jpeg(_px(), quality=90)
    with pytest.raises(ValueError):
        strip_jpeg(data[: data.find(b"\xff\xda")])  # no SOS/EOI left


# ------------------------------------------------------------------ GIF

def test_gif_strips_comment_and_xmp_keeps_netscape():
    from jirlbot_spark.functions.gif import (
        decode_gif_frames,
        encode_gif_anim,
        posterize,
    )

    frames = np.stack([posterize(_px(7)), posterize(_px(8))])
    data = encode_gif_anim(frames)
    packed = data[10]
    cut = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    comment = b"\x21\xfe\x05hello\x00"
    xmp = b"\x21\xff\x0bXMP DataXMP\x04<x/>\x00"
    dirty = data[:cut] + comment + xmp + data[cut:]
    clean, n = strip_gif(dirty)
    assert n == 2
    assert b"hello" not in clean and b"XMP" not in clean
    # NETSCAPE loop extension survives if the encoder emitted one;
    # frames decode identically either way
    a, da = decode_gif_frames(data)
    b, db = decode_gif_frames(clean)
    assert np.array_equal(a, b) and da == db


def test_gif_fails_closed():
    with pytest.raises(ValueError):
        strip_gif(b"GIF89a")
    from jirlbot_spark.functions.gif import posterize

    data = encode_image(posterize(_px()), "gif")
    with pytest.raises(ValueError):
        strip_gif(data[:-1])  # trailer gone


# ----------------------------------------------------------- dispatcher

def test_dispatcher_passthrough_unsupported():
    raw = b"\x00\x01\x02\x03"
    clean, n, sup = strip_metadata(raw, "tiff")
    assert (clean, n, sup) == (raw, 0, False)


def test_strip_is_idempotent():
    df = gen_meta_images(3, 18)
    for r in df.itertuples(index=False):
        c1, n1, _ = strip_metadata(bytes(r.bytes), r.fmt)
        c2, n2, _ = strip_metadata(c1, r.fmt)
        assert c2 == c1
        assert n2 == 0


# ------------------------------------------------------------- operator

def test_scrub_operator(spark):
    from jirlbot_spark.operators.image_scrub import scrub_image_metadata

    pdf = gen_meta_images(11, 24)
    df = spark.createDataFrame(pdf)
    out = {
        r["image_id"]: r
        for r in scrub_image_metadata(df).collect()
    }
    assert len(out) == 24
    for t in pdf.itertuples(index=False):
        clean, n, sup = strip_metadata(bytes(t.bytes), t.fmt)
        r = out[t.image_id]
        assert bytes(r["clean_bytes"]) == clean
        assert r["n_stripped"] == n
        assert r["supported"] is sup and r["scrub_ok"]
        assert r["orig_len"] == len(bytes(t.bytes))
        assert r["clean_len"] == len(clean)


def test_scrub_operator_id_cols_order_independent(spark):
    """Two same-typed id columns passed in the REVERSE of schema order
    must still land under their own names (output schema follows
    id_cols order, matching the row-tuple construction)."""
    from jirlbot_spark.operators.image_scrub import scrub_image_metadata

    df = spark.createDataFrame(
        [("idA", "srcB", "png", b"\x89PNG\r\n\x1a\nbroken")],
        "image_id string, src string, fmt string, bytes binary",
    )
    r = scrub_image_metadata(df, id_cols=("src", "image_id")).collect()[0]
    assert (r["src"], r["image_id"]) == ("srcB", "idA")


def test_scrub_operator_corrupt_row_passthrough(spark):
    from jirlbot_spark.operators.image_scrub import scrub_image_metadata

    df = spark.createDataFrame(
        [("bad1", "png", b"\x89PNG\r\n\x1a\nbroken")],
        "image_id string, fmt string, bytes binary",
    )
    r = scrub_image_metadata(df).collect()[0]
    assert not r["scrub_ok"]
    assert bytes(r["clean_bytes"]) == b"\x89PNG\r\n\x1a\nbroken"
