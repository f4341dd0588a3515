from __future__ import annotations

import numpy as np
import pandas as pd
from struct import error as struct_error
import pytest

from jirlbot_spark.functions.images import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
)
from jirlbot_spark.sources.fixtures import gen_pages, gen_pixels


@pytest.mark.parametrize("fmt", ["png", "bmp", "raw"])
@pytest.mark.parametrize("w,h", [(16, 16), (32, 16), (17, 23)])
def test_lossless_roundtrip_exact(fmt, w, h):
    rng = np.random.default_rng(1)
    px = gen_pixels(rng, w, h)
    blob = encode_image(px, fmt)
    out = decode_image(blob, fmt, w, h)
    assert np.array_equal(px, out), f"{fmt} {w}x{h} not bit-exact"


def test_psnr_properties():
    rng = np.random.default_rng(2)
    px = gen_pixels(rng, 32, 32)
    assert psnr(px, px) == float("inf")
    noisy = np.clip(
        px.astype(int) + rng.integers(-2, 3, px.shape), 0, 255
    ).astype(np.uint8)
    assert psnr(px, noisy) >= 40.0  # tiny noise stays above the lossy gate
    garbage = rng.integers(0, 256, px.shape).astype(np.uint8)
    assert psnr(px, garbage) < 20.0


def test_phash_invariance_and_sensitivity():
    rng = np.random.default_rng(3)
    px = gen_pixels(rng, 64, 64)
    h0 = phash64(px)
    # slight noise -> small hamming distance
    noisy = np.clip(px.astype(int) + rng.integers(-4, 5, px.shape), 0, 255).astype(
        np.uint8
    )
    assert hamming64(h0, phash64(noisy)) <= 10
    # different image -> large distance
    other = gen_pixels(np.random.default_rng(99), 64, 64)
    assert hamming64(h0, phash64(other)) >= 16
    # resize the same image -> same-ish hash (scale invariance of DCT hash)
    half = px[::2, ::2]
    assert hamming64(h0, phash64(half)) <= 12


def test_gen_pages_deterministic_and_verified():
    p1 = gen_pages(42, 20)
    p2 = gen_pages(42, 20)
    assert p1["phash"].tolist() == p2["phash"].tolist()
    assert p1["caption"].tolist() == p2["caption"].tolist()
    for _, row in p1.iterrows():
        px = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        assert phash64(px) == row["phash"]
        assert row["caption"].startswith(f"caption of {row['image_id']}:")


def test_jpeg_roundtrip_psnr():
    """Own baseline JPEG codec (functions/jpeg.py): decode(encode(px))
    reaches the north rule's PSNR>=40dB on fixture-style content, incl.
    non-multiple-of-8 dims, and files are deterministic."""
    rng = np.random.default_rng(5)
    for w, h in ((16, 16), (33, 17), (64, 24), (8, 8)):
        px = gen_pixels(rng, w, h)
        blob = encode_image(px, "jpeg")
        out = decode_image(blob, "jpeg", w, h)
        assert out.shape == (h, w, 3)
        assert psnr(px, out) >= 40.0
        assert encode_image(px, "jpeg") == blob  # deterministic bytes
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"


def test_jpeg_decoder_rejects_unsupported():
    from jirlbot_spark.functions.jpeg import decode_jpeg

    with pytest.raises(AssertionError):
        decode_jpeg(b"nonsense")


def test_verify_payload_lossy_branch(spark):
    """With ref_pixels carried, lossy rows verify PSNR>=40 vs the true
    pixels (psnr_db finite), lossless rows verify exact (psnr_db inf);
    corrupting JPEG payload bytes flips that row's pixels_ok off."""
    import pandas as pd

    from jirlbot_spark.functions.jpeg import encode_jpeg
    from jirlbot_spark.operators.fetch import verify_payload
    from jirlbot_spark.sources.fixtures import gen_pages_lossy

    pages = gen_pages_lossy(11, 12)
    out = (
        verify_payload(spark.createDataFrame(pages))
        .toPandas()
        .set_index("image_id")
    )
    assert out["decode_ok"].all() and out["pixels_ok"].all()
    assert out["caption_ok"].all() and out["phash_ok"].all()
    jpeg_ids = pages[pages.fmt == "jpeg"].image_id
    png_ids = pages[pages.fmt == "png"].image_id
    assert np.isfinite(out.loc[jpeg_ids, "psnr_db"]).all()
    assert (out.loc[jpeg_ids, "psnr_db"] >= 40.0).all()
    assert np.isinf(out.loc[png_ids, "psnr_db"]).all()

    # garble one jpeg payload: decoded pixels diverge -> pixels_ok False
    rng = np.random.default_rng(3)
    bad = pages.copy()
    victim = bad.index[bad.fmt == "jpeg"][0]
    px = rng.integers(0, 256, size=(bad.loc[victim, "h"],
                                    bad.loc[victim, "w"], 3), dtype=np.uint8)
    bad.loc[victim, "bytes"] = encode_jpeg(px, 98)  # wrong image entirely
    out2 = (
        verify_payload(spark.createDataFrame(bad))
        .toPandas()
        .set_index("image_id")
    )
    vid = bad.loc[victim, "image_id"]
    assert not out2.loc[vid, "pixels_ok"]
    assert out2.loc[vid, "psnr_db"] < 40.0
    _ = pd  # (imported for clarity of the fixture type)


def test_verify_payload_spark(spark):
    from jirlbot_spark.operators.fetch import verify_payload

    pages = gen_pages(7, 12)
    df = spark.createDataFrame(pages)
    out = verify_payload(df).toPandas().set_index("image_id")
    assert out["decode_ok"].all()
    assert out["pixels_ok"].all()
    assert out["caption_ok"].all()
    assert out["phash_ok"].all()

    # corrupt one caption and one phash -> exactly those rows flagged
    bad = pages.copy()
    bad.loc[0, "caption"] = "not a caption"
    bad.loc[1, "phash"] = bad.loc[1, "phash"] ^ 0xFF
    out2 = (
        verify_payload(spark.createDataFrame(bad))
        .toPandas()
        .set_index("image_id")
    )
    assert not out2.loc[bad.loc[0, "image_id"], "caption_ok"]
    assert not out2.loc[bad.loc[1, "image_id"], "phash_ok"]
    assert int((~out2["caption_ok"]).sum()) == 1
    assert int((~out2["phash_ok"]).sum()) == 1


def test_jpeg_adversarial_content():
    """Codec robustness beyond fixture-style content: pure noise, flat
    fields, hard edges, extreme dims — roundtrip must stay deterministic
    and shape-correct at q98, and near-lossless (q100) must clear the
    40 dB invariant even on noise (quant tables all 1: only rounding +
    colorspace error remains)."""
    from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(21)
    cases = [
        rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8),   # noise
        np.zeros((24, 8, 3), np.uint8),                           # black
        np.full((8, 24, 3), 255, np.uint8),                       # white
        np.kron(                                                  # checker
            rng.integers(0, 2, size=(4, 4)), np.ones((8, 8))
        ).astype(np.uint8)[..., None].repeat(3, axis=2) * 255,
        rng.integers(0, 256, size=(1, 1, 3), dtype=np.uint8),     # 1x1
        rng.integers(0, 256, size=(7, 129, 3), dtype=np.uint8),   # odd dims
    ]
    for px in cases:
        h, w = px.shape[:2]
        blob = encode_jpeg(px, 98)
        dec = decode_jpeg(blob)
        assert dec.shape == (h, w, 3), (h, w)
        assert encode_jpeg(px, 98) == blob
        assert psnr(px, decode_jpeg(encode_jpeg(px, 100))) >= 40.0, (h, w)


# ---------- GIF (functions/gif.py) ----------


def test_gif_lzw_roundtrip_fuzz():
    """Variable-width LZW incl. width-boundary end codes and 4096-entry
    table resets (long streams force the clear-code path)."""
    from jirlbot_spark.functions.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(7)
    for trial in range(120):
        n_sym = int(rng.integers(1, 8))
        n = int(rng.integers(1, 9000))
        mcs = max(2, int(np.ceil(np.log2(max(n_sym, 2)))))
        idx = rng.integers(0, n_sym, n).astype(np.int32)
        dec = _lzw_decode(_lzw_encode(idx, mcs), mcs, n)
        assert np.array_equal(dec, idx.astype(np.uint8)), (trial, n_sym, n)


def test_gif_roundtrip_lossless_palettized():
    from jirlbot_spark.functions.gif import decode_gif, encode_gif, posterize
    from jirlbot_spark.sources.fixtures import gen_pixels

    rng = np.random.default_rng(9)
    for _ in range(12):
        w, h = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        px = posterize(gen_pixels(rng, w, h))
        back = decode_gif(encode_gif(px))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, px)
    # tiny palettes exercise mcs=2 and power-of-two GCT padding
    for ncol in (1, 2, 3, 4, 17, 255, 256):
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        px = pal[rng.integers(0, ncol, (33, 29))]
        assert np.array_equal(decode_gif(encode_gif(px)), px), ncol


def test_gif_posterize_fallback_for_wide_palettes():
    from jirlbot_spark.functions.gif import decode_gif, encode_gif, posterize
    from jirlbot_spark.sources.fixtures import gen_pixels

    px = gen_pixels(np.random.default_rng(3), 64, 64)
    assert np.array_equal(decode_gif(encode_gif(px)), posterize(px))


def test_gif_decodes_interlaced_extensions_and_local_color_table():
    """Wild GIFs the encoder never emits: GIF87a, interlaced row order,
    graphic-control extension blocks, local color table."""
    import struct

    from jirlbot_spark.functions import gif as G

    rng = np.random.default_rng(3)
    w, h = 23, 37
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (h, w))
    px = pal[idx]
    mcs = 4

    def blocks(lzw: bytes) -> bytes:
        out = bytearray()
        for i in range(0, len(lzw), 255):
            b = lzw[i : i + 255]
            out.append(len(b))
            out += b
        return bytes(out) + b"\x00\x3b"

    # interlaced + extension, global color table
    order = np.concatenate(
        [np.arange(s, h, st) for s, st in G._INTERLACE_PASSES]
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | 3, 0, 0)
    out += pal.tobytes()
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE (skipped)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
    out.append(mcs)
    out += blocks(G._lzw_encode(idx[order].astype(np.int32), mcs))
    assert np.array_equal(G.decode_gif(bytes(out)), px)

    # GIF87a + local color table, no GCT
    out2 = bytearray(b"GIF87a")
    out2 += struct.pack("<HHBBB", w, h, 0, 0, 0)
    out2 += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | 3)
    out2 += pal.tobytes()
    out2.append(mcs)
    out2 += blocks(G._lzw_encode(idx.astype(np.int32), mcs))
    assert np.array_equal(G.decode_gif(bytes(out2)), px)


def test_gif_anim_roundtrip():
    from jirlbot_spark.functions.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_anim,
        posterize,
    )
    from jirlbot_spark.sources.fixtures import gen_pixels

    rng = np.random.default_rng(21)
    frames = np.stack(
        [posterize(gen_pixels(rng, 24, 18)) for _ in range(7)]
    )
    blob = encode_gif_anim(frames, delay_cs=6)
    got, delays = decode_gif_frames(blob)
    assert np.array_equal(got, frames)
    assert delays == [6] * 7
    # first-frame decoder agrees with the composed first frame
    assert np.array_equal(decode_gif(blob), frames[0])


def test_gif_anim_disposal_transparency_local_palette():
    """Hand-built animation exercising what the encoder never emits:
    partial-rect frames, transparency holes, disposal 2 (restore to
    background) and 3 (restore to previous), a local palette, and a
    transparent index OUTSIDE the palette."""
    import struct

    from jirlbot_spark.functions import gif as G

    pal = np.array(
        [[250, 0, 0], [0, 250, 0], [0, 0, 250], [40, 40, 40]], np.uint8
    )
    lpal = np.array([[9, 9, 9], [200, 200, 9]], np.uint8)

    def blocks(lzw: bytes) -> bytes:
        out = bytearray()
        for i in range(0, len(lzw), 255):
            b = lzw[i : i + 255]
            out.append(len(b))
            out += b
        return bytes(out) + b"\x00"

    def gce(disposal: int, transparent: int | None) -> bytes:
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        return b"\x21\xf9\x04" + struct.pack(
            "<BHB", packed, 5, transparent or 0
        ) + b"\x00"

    sw = sh = 6
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 1, 3, 0)  # GCT 4, bg=3
    out += pal.tobytes()
    # frame 0: full screen of color 0, disposal 3 (restore previous)
    idx0 = np.zeros((sh, sw), np.int32)
    out += gce(3, None)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, sw, sh, 0) + b"\x02"
    out += blocks(G._lzw_encode(idx0.ravel(), 2))
    # frame 1: 2x2 rect at (1,1) in LOCAL palette, transparent idx 1,
    # disposal 2 (restore rect to background color)
    idx1 = np.array([[0, 1], [1, 0]], np.int32)
    out += gce(2, 1)
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80 | 0)
    out += lpal.tobytes()
    out += b"\x02" + blocks(G._lzw_encode(idx1.ravel(), 2))
    # frame 2: 1x1 at (0,0) color 2, transparent index 3 present in
    # data nowhere (and == GCT size-1, valid)
    out += gce(0, 3)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0) + b"\x02"
    out += blocks(G._lzw_encode(np.array([2], np.int32), 2))
    out += b"\x3b"

    frames, delays = G.decode_gif_frames(bytes(out))
    assert delays == [5, 5, 5]
    bg = np.broadcast_to(pal[3], (sh, sw, 3)).copy()  # bg index 3
    f0 = np.broadcast_to(pal[0], (sh, sw, 3)).copy()
    assert np.array_equal(frames[0], f0)
    # disposal 3 after frame 0 restores the PRE-DRAW canvas (the
    # background) — frame 0's full-screen draw is disposed of; frame 1
    # then draws opaque lpal[0] at (1,1)/(2,2), holes show background
    f1 = bg.copy()
    f1[1, 1] = lpal[0]
    f1[2, 2] = lpal[0]
    assert np.array_equal(frames[1], f1)
    # disposal 2 after frame 1 restores its 2x2 rect to background,
    # then frame 2 draws its single pixel
    f2 = bg.copy()
    f2[0, 0] = pal[2]
    assert np.array_equal(frames[2], f2)


def test_gif_anim_bomb_and_bad_rect():
    import struct

    from jirlbot_spark.functions import gif as G
    from jirlbot_spark.functions.limits import MAX_DECODE_PIXELS

    pal = np.zeros((2, 3), np.uint8)
    one_px = G._lzw_encode(np.zeros(1, np.int32), 2)

    def img_block(left: int, top: int) -> bytes:
        out = bytearray(
            b"\x2c" + struct.pack("<HHHHB", left, top, 1, 1, 0) + b"\x02"
        )
        out.append(len(one_px))
        out += one_px + b"\x00"
        return bytes(out)

    # canvas big enough that few 1x1 frames blow the cumulative budget
    sw = sh = 4096
    n_over = MAX_DECODE_PIXELS // (sw * sh) + 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80, 0, 0)
    out += pal.tobytes()
    for _ in range(n_over):
        out += img_block(0, 0)
    out += b"\x3b"
    with pytest.raises(ValueError, match="budget"):
        G.decode_gif_frames(bytes(out))

    # frame rect outside the logical screen
    out2 = bytearray(b"GIF89a")
    out2 += struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
    out2 += pal.tobytes()
    out2 += img_block(4, 0)
    out2 += b"\x3b"
    with pytest.raises(ValueError, match="rect"):
        G.decode_gif_frames(bytes(out2))


def test_gif_truncated_stream_raises():
    from jirlbot_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    px = rng.integers(0, 4, (20, 20, 3)).astype(np.uint8) * 80
    data = encode_gif(px)
    with pytest.raises((ValueError, AssertionError, struct_error)):
        decode_gif(data[: len(data) // 2])


def test_png_decodes_all_five_filter_types():
    """Wild PNGs mix all five per-row filters (libpng picks per-row);
    decode must invert each. The test applies the spec's ENCODE-side
    filter transforms independently, builds the IDAT, and expects the
    original pixels back — including filter runs that chain (Paeth row
    above an Average row, etc.)."""
    import struct
    import zlib

    from jirlbot_spark.functions.images import _PNG_SIG, _chunk, decode_png

    rng = np.random.default_rng(31)
    h, w = 23, 17
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def paeth(a, b, c):
        p = a.astype(np.int32) + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))

    raw = bytearray()
    prev = np.zeros((w, 3), np.int32)
    for y in range(h):
        f = y % 5
        cur = px[y].astype(np.int32)
        left = np.vstack([np.zeros((1, 3), np.int32), cur[:-1]])
        upleft = np.vstack([np.zeros((1, 3), np.int32), prev[:-1]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            filt = cur - paeth(left, prev, upleft)
        raw.append(f)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), px)


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn streams (wild encoders emit them for error resilience)
    decode bit-identically to the same image without restarts, across
    interval sizes that hit every RSTn cycle position; a stray RST
    without DRI is rejected, not silently mis-decoded."""
    from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:40, 0:56]
    px = np.stack([(x * 3 + y) % 256, (x + y * 2) % 256, (x * 2) % 256], -1)
    px = px.astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, 90))
    for ri in (1, 3, 7, 100):
        blob = encode_jpeg(px, 90, restart_interval=ri)
        assert b"\xff\xdd" in blob
        assert np.array_equal(decode_jpeg(blob), base), ri
    noisy = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    nbase = decode_jpeg(encode_jpeg(noisy, 75))
    for ri in (1, 2, 5):
        blob = encode_jpeg(noisy, 75, restart_interval=ri)
        assert np.array_equal(decode_jpeg(blob), nbase), ri
    blob = bytearray(encode_jpeg(px, 90, restart_interval=3))
    dri = blob.index(b"\xff\xdd")
    del blob[dri : dri + 6]
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(bytes(blob))


def test_jpeg_16bit_quant_tables_decode():
    """A DQT with pq=1 (16-bit entries) decodes identically to the same
    table stored 8-bit — exercised by widening an encoded file's DQT."""
    import struct

    from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:24, 0:24]
    px = np.stack([(x * 5) % 256, (y * 7) % 256, (x + y) % 256], -1)
    px = px.astype(np.uint8)
    blob = encode_jpeg(px, 85)

    out = bytearray(blob[:2])
    pos = 2
    while pos < len(blob):
        marker = blob[pos + 1]
        if marker == 0xDA:
            out += blob[pos:]
            break
        (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        body = blob[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            nbdy = bytearray()
            p = 0
            while p < len(body):
                nbdy.append(0x10 | (body[p] & 0xF))
                nbdy += b"".join(
                    struct.pack(">H", v) for v in body[p + 1 : p + 65]
                )
                p += 65
            out += struct.pack(">HH", 0xFFDB, len(nbdy) + 2) + bytes(nbdy)
        else:
            out += blob[pos : pos + 2 + seglen]
        pos += 2 + seglen
    assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(blob))


def test_jpeg_chroma_subsampling_roundtrip():
    """4:2:2 and 4:2:0 (the dominant wild-file layouts) encode+decode:
    right shape at odd dims (MCU padding cropped), PSNR >= 32 dB on
    smooth content, smaller files than 4:4:4, and composing with
    restart intervals changes nothing in the decoded pixels."""
    from jirlbot_spark.functions.images import psnr
    from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:50, 0:70]
    smooth = (
        np.stack(
            [
                128 + 100 * np.sin(x / 12) * np.cos(y / 15),
                128 + 80 * np.cos(x / 10),
                128 + 60 * np.sin((x + y) / 20),
            ],
            -1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )
    size444 = len(encode_jpeg(smooth, 90))
    for sub in ("422", "420"):
        blob = encode_jpeg(smooth, 90, subsample=sub)
        out = decode_jpeg(blob)
        assert out.shape == smooth.shape
        assert psnr(smooth, out) >= 32.0, (sub, psnr(smooth, out))
        assert len(blob) < size444
        with_rst = encode_jpeg(smooth, 90, restart_interval=2, subsample=sub)
        assert np.array_equal(decode_jpeg(with_rst), out)
    for hw in ((17, 23), (8, 8), (9, 33)):
        im = smooth[: hw[0], : hw[1]]
        for sub in ("422", "420"):
            out = decode_jpeg(encode_jpeg(im, 90, subsample=sub))
            assert out.shape == im.shape
            assert psnr(im, out) >= 30.0


def test_jpeg_progressive_decodes_identical_to_baseline():
    """SOF2 transmits the same quantized coefficients as SOF0 in a
    different order, so decode(progressive) must equal decode(baseline)
    BIT-FOR-BIT. Covers EOB runs with buffered correction bits, ZRL
    inside refinement scans, all three chroma layouts, and odd dims."""
    from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(99)
    flat = np.full((64, 64, 3), 130, np.uint8)
    flat[10, 10] = 255
    y, x = np.mgrid[0:61, 0:83]
    cases = [
        rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),  # refine-heavy
        flat,  # EOB-run-heavy
        np.stack([(x + y) % 256, x % 256, y % 256], -1).astype(np.uint8),
        rng.integers(0, 256, (9, 11, 3), dtype=np.uint8),
        (np.cumsum(np.cumsum(rng.integers(-2, 3, (120, 150, 3)), 0), 1) % 256)
        .astype(np.uint8),  # large: ZRL + padding-block columns
    ]
    for q in (30, 75, 95):
        for im in cases:
            for sub in ("444", "420", "422"):
                blob = encode_jpeg(im, q, subsample=sub, progressive=True)
                assert blob[2:4] != b"\xff\xc0" and b"\xff\xc2" in blob
                assert np.array_equal(
                    decode_jpeg(blob),
                    decode_jpeg(encode_jpeg(im, q, subsample=sub)),
                ), (q, im.shape, sub)


def test_jpeg_progressive_fuzz_identity():
    """Randomized sizes/content/quality/subsampling: the progressive ==
    baseline decode identity is structural, not fixture luck."""
    from jirlbot_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    for trial in range(25):
        h = int(rng.integers(1, 97))
        w = int(rng.integers(1, 97))
        kind = trial % 4
        if kind == 0:
            im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == 1:
            im = (np.cumsum(rng.integers(-4, 5, (h, w, 3)), 1) % 256).astype(
                np.uint8
            )
        elif kind == 2:
            im = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
        else:
            im = np.zeros((h, w, 3), np.uint8)
            im[rng.integers(0, h), rng.integers(0, w)] = 255
        q = int(rng.choice([10, 40, 80, 97]))
        sub = str(rng.choice(["444", "420", "422"]))
        assert np.array_equal(
            decode_jpeg(encode_jpeg(im, q, subsample=sub, progressive=True)),
            decode_jpeg(encode_jpeg(im, q, subsample=sub)),
        ), (trial, h, w, q, sub)


def test_lossy_fixture_includes_progressive_rows():
    """gen_pages_lossy mixes SOF2 rows among the jpegs so the
    progressive decode path runs inside the Spark operator contract;
    the PSNR>=40dB invariant must hold for them identically."""
    import struct

    from jirlbot_spark.functions.images import decode_image, psnr
    from jirlbot_spark.sources.fixtures import gen_pages_lossy

    def sof_marker(blob: bytes) -> int:
        pos = 2
        while pos < len(blob):
            marker = blob[pos + 1]
            if marker in (0xC0, 0xC2):
                return marker
            (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
            pos += 2 + seglen
        raise AssertionError("no SOF marker")

    pages = gen_pages_lossy(43, 24)
    markers = {
        sof_marker(bytes(r.bytes))
        for r in pages.itertuples()
        if r.fmt == "jpeg"
    }
    assert markers == {0xC0, 0xC2}  # both baseline and progressive rows
    for r in pages.itertuples():
        if r.fmt != "jpeg":
            continue
        px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        ref = np.frombuffer(r.ref_pixels, np.uint8).reshape(r.h, r.w, 3)
        assert psnr(px, ref) >= 40.0


def _build_png(w, h, bitd, color, scanlines, plte=None, inter=0):
    import struct
    import zlib

    from jirlbot_spark.functions.images import _PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, bitd, color, 0, 0, inter)
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return (
        out
        + _chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
        + _chunk(b"IEND", b"")
    )


def _png_rows(samples, bitd, channels, filters=None):
    """Filter-0 (or per-row filtered) scanlines from (h, w, ch) samples,
    applying the spec's ENCODE-side transforms at byte distance bpp."""
    h, w, _ = samples.shape
    if bitd == 8:
        mat = samples.reshape(h, w * channels)
    elif bitd == 16:
        sw = np.zeros((h, w, channels, 2), np.uint8)
        sw[..., 0] = samples
        mat = sw.reshape(h, -1)
    else:
        cols = []
        for y in range(h):
            vals = samples[y, :, 0]
            bits = np.zeros(w * bitd, np.uint8)
            for b in range(bitd):
                bits[b::bitd] = (vals >> (bitd - 1 - b)) & 1
            bits = np.concatenate([bits, np.zeros(-len(bits) % 8, np.uint8)])
            cols.append(np.packbits(bits))
        mat = np.stack(cols)
    bpp = max(1, channels * bitd // 8)
    stride = mat.shape[1]
    rows = []
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = (filters[y % len(filters)]) if filters else 0
        cur = mat[y].astype(np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        rows.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    return rows


def test_png_wild_color_types_and_depths():
    """Wild PNG shapes decode to the documented RGB24 projection:
    grayscale replicates, palette maps through PLTE, alpha drops,
    16-bit takes the high byte, 1/2/4-bit gray scales to full range —
    each ALSO under mixed per-row filters (filter distance bpp != 3)."""
    from jirlbot_spark.functions.images import decode_png

    rng = np.random.default_rng(3)
    filters = [0, 1, 2, 3, 4]
    g = rng.integers(0, 256, (9, 7, 1), dtype=np.uint8)
    blob = _build_png(7, 9, 8, 0, _png_rows(g, 8, 1, filters))
    assert np.array_equal(decode_png(blob), np.repeat(g, 3, 2))
    rgba = rng.integers(0, 256, (12, 5, 4), dtype=np.uint8)
    blob = _build_png(5, 12, 8, 6, _png_rows(rgba, 8, 4, filters))
    assert np.array_equal(decode_png(blob), rgba[..., :3])
    ga = rng.integers(0, 256, (4, 8, 2), dtype=np.uint8)
    blob = _build_png(8, 4, 8, 4, _png_rows(ga, 8, 2, filters))
    assert np.array_equal(decode_png(blob), np.repeat(ga[..., :1], 3, 2))
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (10, 11, 1), dtype=np.uint8)
    blob = _build_png(11, 10, 8, 3, _png_rows(idx, 8, 1, filters), plte=plte)
    assert np.array_equal(decode_png(blob), plte[idx[..., 0]])
    blob = _build_png(11, 10, 4, 3, _png_rows(idx, 4, 1), plte=plte)
    assert np.array_equal(decode_png(blob), plte[idx[..., 0]])
    bw = rng.integers(0, 2, (5, 19, 1), dtype=np.uint8)
    blob = _build_png(19, 5, 1, 0, _png_rows(bw, 1, 1))
    assert np.array_equal(decode_png(blob), np.repeat(bw * 255, 3, 2))
    px16 = rng.integers(0, 256, (7, 6, 3), dtype=np.uint8)
    blob = _build_png(6, 7, 16, 2, _png_rows(px16, 16, 3, filters))
    assert np.array_equal(decode_png(blob), px16)


def test_png_adam7_interlace():
    """Adam7: seven filtered sub-images reassemble exactly, across
    dims that empty some passes (1x1 uses only pass 1)."""
    from jirlbot_spark.functions.images import _ADAM7, decode_png

    rng = np.random.default_rng(5)
    for w, h in [(20, 13), (8, 8), (3, 2), (1, 1), (9, 17)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        passes = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            passes.extend(_png_rows(sub, 8, 3, [0, 1, 2, 3, 4]))
        blob = _build_png(w, h, 8, 2, passes, inter=1)
        assert np.array_equal(decode_png(blob), px), (w, h)


def test_bmp_wild_variants():
    """Wild BMP shapes: 32-bit BI_RGB (alpha dropped), top-down rows
    (negative height), 1/4/8-bit palettes, and BI_RLE8 (runs, absolute
    mode with word padding, EOL/EOB/delta escapes)."""
    import struct

    from jirlbot_spark.functions.images import decode_bmp

    rng = np.random.default_rng(4)

    def hdr(w, h, bpp, comp, img_size, ncolors=0, pal=b""):
        off = 54 + len(pal)
        return (
            struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, img_size,
                2835, 2835, ncolors, 0,
            )
            + pal
        )

    px = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    h, w = px.shape[:2]
    # 32-bit BGRA, bottom-up
    rows = np.zeros((h, w, 4), np.uint8)
    rows[..., :3] = px[..., ::-1]
    rows[..., 3] = 200
    body = rows[::-1].tobytes()
    assert np.array_equal(decode_bmp(hdr(w, h, 32, 0, len(body)) + body), px)
    # top-down 24-bit
    row_size = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_size), np.uint8)
    padded[:, : w * 3] = px[..., ::-1].reshape(h, -1)
    blob = hdr(w, -h, 24, 0, padded.size) + padded.tobytes()
    assert np.array_equal(decode_bmp(blob), px)
    # 8-bit palette
    pal_rgb = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    pal = np.zeros((256, 4), np.uint8)
    pal[:, :3] = pal_rgb[:, ::-1]
    idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
    row_size = (w + 3) & ~3
    padded = np.zeros((h, row_size), np.uint8)
    padded[:, :w] = idx[::-1]
    blob = hdr(w, h, 8, 0, padded.size, 256, pal.tobytes()) + padded.tobytes()
    assert np.array_equal(decode_bmp(blob), pal_rgb[idx])
    # 1-bit palette
    pal2_rgb = np.array([[10, 20, 30], [250, 240, 230]], np.uint8)
    pal2 = np.zeros((2, 4), np.uint8)
    pal2[:, :3] = pal2_rgb[:, ::-1]
    bw = rng.integers(0, 2, (h, w), dtype=np.uint8)
    row_size = ((w + 31) // 32) * 4
    mat = np.zeros((h, row_size), np.uint8)
    for y in range(h):
        mat[y] = np.packbits(
            np.concatenate([bw[h - 1 - y], np.zeros(row_size * 8 - w, np.uint8)])
        )
    blob = hdr(w, h, 1, 0, mat.size, 2, pal2.tobytes()) + mat.tobytes()
    assert np.array_equal(decode_bmp(blob), pal2_rgb[bw])
    # RLE8: run / EOL / absolute+pad / delta / EOB
    rle = bytes(
        [6, 5, 0, 0, 0, 3, 1, 2, 3, 0, 3, 9, 0, 0, 0, 2, 2, 1, 2, 7, 0, 1]
    )
    blob = hdr(6, 4, 8, 1, len(rle), 256, pal.tobytes()) + rle
    exp_idx = np.zeros((4, 6), np.uint8)
    exp_idx[0] = 5
    exp_idx[1, :3] = [1, 2, 3]
    exp_idx[1, 3:] = 9
    exp_idx[3, 2:4] = 7
    assert np.array_equal(decode_bmp(blob), pal_rgb[exp_idx][::-1])
    # gates stay loud
    with pytest.raises(NotImplementedError):
        decode_bmp(hdr(4, 4, 16, 0, 32) + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        decode_bmp(hdr(4, 4, 24, 4, 48) + b"\x00" * 48)  # BI_RLE4/JPEG


def test_jpeg_exif_orientation():
    """Camera uploads carry EXIF Orientation (tag 274) and every
    browser displays through it; decode applies the same transform the
    TIFF orientation path uses. The APP1 payloads here are hand-built
    little TIFF files in BOTH byte orders."""
    import struct

    from jirlbot_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        exif_orientation,
    )
    from jirlbot_spark.functions.tiff import _ORIENT

    rng = np.random.default_rng(61)
    px = rng.integers(0, 256, (24, 16, 3)).astype(np.uint8)
    blob = encode_jpeg(px, quality=95)
    base = decode_jpeg(blob)

    def app1(order: str, o: int, magic: int = 42) -> bytes:
        e = "<" if order == "II" else ">"
        tiffb = (
            order.encode()
            + struct.pack(f"{e}HI", magic, 8)
            + struct.pack(f"{e}H", 1)
            + struct.pack(f"{e}HHI", 274, 3, 1)
            + struct.pack(f"{e}H", o)
            + b"\x00\x00"
            + struct.pack(f"{e}I", 0)
        )
        payload = b"Exif\x00\x00" + tiffb
        return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload

    for order in ("II", "MM"):
        for o in range(1, 9):
            j = blob[:2] + app1(order, o) + blob[2:]
            assert exif_orientation(j) == o
            got = decode_jpeg(j)
            assert np.array_equal(got, np.ascontiguousarray(_ORIENT[o](base)))
    # opt-out returns the raw sensor layout
    j = blob[:2] + app1("II", 6) + blob[2:]
    assert np.array_equal(
        decode_jpeg(j, apply_exif_orientation=False), base
    )
    # malformed / out-of-range EXIF degrades to upright, never raises
    assert exif_orientation(blob) == 1  # no APP1 at all
    assert exif_orientation(blob[:2] + app1("II", 9) + blob[2:]) == 1
    assert exif_orientation(blob[:2] + app1("II", 3, magic=41) + blob[2:]) == 1
    junk = b"\xff\xe1\x00\x0aExif\x00\x00zz"
    assert exif_orientation(blob[:2] + junk + blob[2:]) == 1


def test_image_stats_properties(spark):
    """Curation signals behave as documented: flat fields have ~zero
    entropy/sharpness/colorfulness, noise is near-max entropy, gray
    images score colorfulness 0, garbage payloads flag decode_ok=False
    without failing the batch."""
    from jirlbot_spark.functions.images import image_stats_array
    from jirlbot_spark.operators.fetch import image_stats

    flat = np.full((16, 16, 3), 77, np.uint8)
    s = image_stats_array(flat)
    assert s["std_luma"] == 0.0 and s["entropy"] == 0.0
    assert s["sharpness"] == 0.0 and s["colorfulness"] == 0.0
    assert abs(s["mean_luma"] - 77.0) < 1e-9

    rng = np.random.default_rng(8)
    noise = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    sn = image_stats_array(noise)
    assert sn["entropy"] > 6.5 and sn["sharpness"] > 10.0

    gray = np.repeat(
        rng.integers(0, 256, (16, 16, 1)).astype(np.uint8), 3, axis=2
    )
    assert image_stats_array(gray)["colorfulness"] == 0.0

    # Spark operator: golden-style replay + garbage row flagged
    pages = gen_pages(42, 12)
    bad = pages.copy()
    bad.loc[3, "bytes"] = b"not an image at all"
    out = (
        image_stats(spark.createDataFrame(bad))
        .toPandas()
        .set_index("image_id")
    )
    assert not out.loc[bad.loc[3, "image_id"], "decode_ok"]
    assert np.isnan(out.loc[bad.loc[3, "image_id"], "mean_luma"])
    for _, row in pages.drop(3).iterrows():
        px = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        exp = image_stats_array(px)
        got = out.loc[row["image_id"]]
        assert got["decode_ok"]
        for k, v in exp.items():
            assert got[k] == v, (row["image_id"], k)
