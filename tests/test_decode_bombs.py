"""Decode-bomb guards (functions/limits.py) across the codec family.

A crawl decodes untrusted bytes: a tiny file claiming bomb-scale header
dimensions must raise ValueError BEFORE allocating output buffers, and
bounded zlib must refuse streams that inflate past the caller's
expected size. Every case here is a sub-KB input that would otherwise
allocate hundreds of MB to GBs inside an executor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from jirlbot_spark.functions.limits import (
    MAX_DECODE_PIXELS,
    bounded_inflate,
    check_dims,
)

BIG = 1 << 14  # 16384; BIG*BIG = 268M px > the 67M-px default cap


def test_check_dims_and_bounded_inflate():
    check_dims(64, 64)
    with pytest.raises(ValueError):
        check_dims(0, 4)
    with pytest.raises(ValueError):
        check_dims(BIG, BIG)
    assert MAX_DECODE_PIXELS == 1 << 26
    payload = b"x" * 1000
    comp = zlib.compress(payload)
    assert bounded_inflate(comp, 1000) == payload
    assert bounded_inflate(comp, 2000) == payload
    with pytest.raises(ValueError):
        bounded_inflate(zlib.compress(b"\x00" * 10_000_000), 1000)


def _assert_bomb(decoder, blob):
    with pytest.raises(ValueError, match="bomb|dimensions"):
        decoder(blob)


def test_pnm_bomb():
    from jirlbot_spark.functions.pnm import decode_pnm

    _assert_bomb(decode_pnm, b"P6\n%d %d\n255\n\x00\x00\x00" % (BIG, BIG))


def test_png_bombs():
    from jirlbot_spark.functions.images import decode_png

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # dimension bomb
    ihdr = struct.pack(">IIBBBBB", BIG, BIG, 8, 2, 0, 0, 0)
    _assert_bomb(
        decode_png, sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"")
    )
    # inflation bomb: legit 4x4 dims, IDAT inflating to 10 MB
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 10_000_000)
    with pytest.raises(ValueError, match="inflates"):
        decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb))


def test_bmp_bomb():
    from jirlbot_spark.functions.images import decode_bmp

    blob = (
        struct.pack("<2sIHHI", b"BM", 70, 0, 0, 70)
        + struct.pack("<IiiHHIIiiII", 40, BIG, BIG, 1, 24, 0, 0, 0, 0, 0, 0)
        + b"\x00" * 16
    )
    _assert_bomb(decode_bmp, blob)


def test_gif_bomb():
    from jirlbot_spark.functions.gif import decode_gif

    blob = (
        b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80, 0, 0) + b"\x00" * 6
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 0xFFFF, 0xFFFF, 0)
        + b"\x02\x01\x00\x00\x3b"
    )
    _assert_bomb(decode_gif, blob)


def test_jpeg_bomb():
    from jirlbot_spark.functions.jpeg import decode_jpeg

    sof = struct.pack(">BHHB", 8, 0xFFFF, 0xFFFF, 1) + bytes([1, 0x11, 0])
    blob = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )
    _assert_bomb(decode_jpeg, blob)


def test_tiff_bombs():
    from jirlbot_spark.functions.tiff import decode_tiff

    def ifd(entries):
        out = struct.pack("<H", len(entries))
        for tag, typ, val in entries:
            out += struct.pack("<HHII", tag, typ, 1, val)
        return out + struct.pack("<I", 0)

    # dimension bomb
    blob = b"II" + struct.pack("<HI", 42, 8) + ifd(
        [(256, 4, BIG), (257, 4, BIG), (259, 3, 1), (262, 3, 1),
         (273, 4, 200), (279, 4, 4)]
    )
    _assert_bomb(decode_tiff, blob)
    # deflate inflation bomb: 8x8 gray image, strip inflating to 10 MB
    bomb = zlib.compress(b"\x00" * 10_000_000)
    head = b"II" + struct.pack("<HI", 42, 8)
    entries = [
        (256, 4, 8), (257, 4, 8), (258, 3, 8), (259, 3, 8), (262, 3, 1),
        (273, 4, 0), (277, 3, 1), (278, 4, 8), (279, 4, len(bomb)),
    ]
    data_off = len(head) + 2 + 12 * len(entries) + 4
    entries[5] = (273, 4, data_off)
    blob = head + ifd(entries) + bomb
    with pytest.raises(ValueError, match="inflates"):
        decode_tiff(blob)


def test_exr_bombs():
    from jirlbot_spark.functions.exr import decode_exr

    def attr(name, typ, val):
        return name + b"\0" + typ + b"\0" + struct.pack("<I", len(val)) + val

    chlist = (
        b"R\0" + struct.pack("<IBBBBii", 1, 0, 0, 0, 0, 1, 1)
        + b"G\0" + struct.pack("<IBBBBii", 1, 0, 0, 0, 0, 1, 1)
        + b"B\0" + struct.pack("<IBBBBii", 1, 0, 0, 0, 0, 1, 1)
        + b"\0"
    )
    box = struct.pack("<4i", 0, 0, BIG - 1, BIG - 1)
    blob = (
        struct.pack("<iI", 20000630, 2)
        + attr(b"channels", b"chlist", chlist)
        + attr(b"compression", b"compression", b"\x00")
        + attr(b"dataWindow", b"box2i", box)
        + b"\0"
    )
    _assert_bomb(decode_exr, blob)


def test_ras_sgi_xbm_bombs():
    from jirlbot_spark.functions.legacy_rasters import (
        decode_ras,
        decode_sgi,
        decode_xbm,
    )

    ras = struct.pack(">8i", 0x59A66A95, BIG, BIG, 24, 4, 1, 0, 0) + b"\x00" * 4
    _assert_bomb(decode_ras, ras)
    sgi = struct.pack(">HBBHHHHii", 474, 0, 1, 3, BIG, BIG, 3, 0, 255)
    _assert_bomb(decode_sgi, sgi + b"\x00" * 512)
    xbm = (
        b"#define x_width 99999\n#define x_height 99999\n"
        b"static unsigned char x_bits[] = {0x00};"
    )
    _assert_bomb(decode_xbm, xbm)


def test_webp_bomb():
    from jirlbot_spark.functions.webp import decode_webp

    # VP8L header: sig 0x2F then 14-bit w-1 / h-1 LSB-first
    bits = 0
    nbits = 0

    def put(v, n):
        nonlocal bits, nbits
        bits |= v << nbits
        nbits += n

    put(BIG - 1, 14)
    put(BIG - 1, 14)
    put(0, 1)
    put(0, 3)
    payload = b"\x2f" + bits.to_bytes((nbits + 7) // 8, "little")
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l
    _assert_bomb(decode_webp, blob)


def test_ico_bomb():
    """A 38-byte favicon claiming a 16384x16384 DIB member must die in
    check_dims before the row/palette allocation."""
    from jirlbot_spark.functions.ico import decode_ico

    member = struct.pack("<IiiHHI", 40, BIG, BIG * 2, 1, 24, 0)
    blob = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 0, 0, 0, 0, 1, 24, len(member), 22)
        + member
    )
    _assert_bomb(decode_ico, blob)


def test_avi_bomb():
    from jirlbot_spark.functions.media import decode_avi

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    strf = struct.pack("<IiiHHI", 40, BIG, BIG, 1, 24, 0) + b"\x00" * 20
    inner = chunk(b"strf", strf) + chunk(b"00db", b"\x00" * 64)
    body = b"AVI " + chunk(b"LIST", b"hdrl" + inner)
    blob = chunk(b"RIFF", body)
    _assert_bomb(decode_avi, blob)
    # plausible dims but frame bytes absent: must raise BEFORE allocating
    strf = struct.pack("<IiiHHI", 40, 4000, 4000, 1, 24, 0) + b"\x00" * 20
    inner = chunk(b"strf", strf) + chunk(b"00db", b"\x00" * 64)
    blob = chunk(b"RIFF", b"AVI " + chunk(b"LIST", b"hdrl" + inner))
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(blob)


def test_corruption_fuzz_fails_clean_and_fast():
    """Wild bytes WILL be corrupt: mutate valid encodes (bit flips,
    truncations, byte splices) and require every decode to either
    return an array or raise — quickly and with bounded allocation
    (the operator path maps any exception to decode_ok=false;
    fetch.py:333). A hang or a multi-GB allocation here is the failure
    mode this test exists to catch; the 60 s budget for ~3300 corrupt
    decodes enforces both."""
    import time

    from jirlbot_spark.functions.images import (
        LOSSLESS_FMTS,
        decode_image,
        encode_image,
    )

    rng = np.random.default_rng(123)
    px = rng.integers(0, 256, (24, 16, 3), np.uint8)
    t0 = time.monotonic()
    n_raised = 0
    for fmt in (*LOSSLESS_FMTS, "jpeg"):
        src = px if fmt != "gif" else (px // 64 * 64)
        blob = bytearray(encode_image(src, fmt))
        n = len(blob)
        for trial in range(300):
            mutated = bytearray(blob)
            kind = trial % 3
            if kind == 0:  # flip 1-4 bytes
                for _ in range(int(rng.integers(1, 5))):
                    mutated[int(rng.integers(0, n))] = int(
                        rng.integers(0, 256)
                    )
            elif kind == 1:  # truncate
                mutated = mutated[: int(rng.integers(1, n))]
            else:  # splice a random run
                at = int(rng.integers(0, n))
                ln = int(rng.integers(1, 64))
                mutated[at : at + ln] = rng.integers(
                    0, 256, ln, np.uint8
                ).tobytes()
            try:
                out = decode_image(bytes(mutated), fmt, 16, 24)
                assert isinstance(out, np.ndarray)
            except Exception:
                n_raised += 1
    elapsed = time.monotonic() - t0
    assert elapsed < 60.0, f"corrupt decodes too slow: {elapsed:.1f}s"
    assert n_raised > 1000  # most corruptions are caught, none explode


def test_valid_decodes_unaffected():
    from jirlbot_spark.functions.images import (
        LOSSLESS_FMTS,
        decode_image,
        encode_image,
    )

    from jirlbot_spark.functions.ccitt import bilevel

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (16, 16, 3), np.uint8)
    for fmt in LOSSLESS_FMTS:
        src = px
        if fmt == "gif":
            src = px // 64 * 64
        elif fmt == "tiffg4":
            src = bilevel(px)  # fax is bilevel; lossless iff pre-thresholded
        assert np.array_equal(
            decode_image(encode_image(src, fmt), fmt, 16, 16), src
        )


def test_mp4_mjpeg_bombs_and_fuzz():
    """Motion-JPEG mp4 path: sample ranges must be validated against the
    file before any decode; mutated streams must fail clean and fast."""
    import time

    from jirlbot_spark.functions.mp4 import (
        decode_mp4_frames,
        encode_mp4_mjpeg,
        mp4_sample_ranges,
    )

    frames = (
        np.arange(3 * 16 * 16 * 3, dtype=np.int64).reshape(3, 16, 16, 3)
        % 251
    ).astype(np.uint8)
    blob = bytes(encode_mp4_mjpeg(frames, fps=30.0))

    # stsz claiming bytes the file does not ship -> rejected pre-decode
    with pytest.raises(ValueError, match="past end of file"):
        mp4_sample_ranges(blob[:-16])

    # corruption fuzz: every mutation either decodes or raises, fast
    rng = np.random.default_rng(77)
    t0 = time.monotonic()
    n_raised = 0
    for trial in range(120):
        mutated = bytearray(blob)
        kind = trial % 3
        if kind == 0:  # bit flip
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1:  # truncate
            mutated = mutated[: int(rng.integers(12, len(mutated)))]
        else:  # splice random bytes
            i = int(rng.integers(0, len(mutated) - 8))
            mutated[i : i + 8] = rng.bytes(8)
        try:
            out, _fps = decode_mp4_frames(bytes(mutated))
            assert isinstance(out, np.ndarray)
        except Exception:
            # the operator path maps any decode exception to a failed
            # row (fetch.py decode_ok=false), same contract as images
            n_raised += 1
    # nominal ~1.5 s; the wide budget still catches hangs / GB allocs
    # without flaking when the box is saturated by a concurrent bench
    assert time.monotonic() - t0 < 60.0
    assert n_raised > 0  # mutations do get caught, not silently eaten


def test_mp4_uniform_stsz_and_stts_count_bombs():
    """Two attacker-controlled 32-bit counts with no table to bound them:
    a uniform-size stsz count (would materialize a count-sized tuple and
    claim count*size sample bytes) and the stts entry count (would drive
    a ~2^32-iteration timing loop). Both must be bounded by the file."""
    import time

    from jirlbot_spark.functions.mp4 import (
        encode_mp4_stub,
        mp4_info,
        mp4_sample_ranges,
    )

    blob = bytearray(encode_mp4_stub(16, 16, 4, codec=b"jpeg"))

    # uniform stsz: sample_size=64, sample_count at stsz body +8.
    zi = bytes(blob).find(b"stsz")
    assert zi > 0
    struct_at = zi + 4 + 4  # skip fourcc + version/flags
    import struct as _s

    uniform, count = _s.unpack_from(">II", blob, struct_at)
    assert uniform == 64 and count == 4
    bomb = bytearray(blob)
    _s.pack_into(">II", bomb, struct_at, uniform, 0xFFFFFFFF)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="more sample bytes"):
        mp4_sample_ranges(bytes(bomb))
    assert time.monotonic() - t0 < 1.0

    # stts: entry_count at stts body +4; body ships ONE entry. A corrupt
    # huge count must clamp to the box body, not loop or read past it.
    ti = bytes(blob).find(b"stts")
    assert ti > 0
    bomb2 = bytearray(blob)
    _s.pack_into(">I", bomb2, ti + 4 + 4, 0x7FFFFFFF)
    t0 = time.monotonic()
    info = mp4_info(bytes(bomb2))
    assert time.monotonic() - t0 < 1.0
    assert info["n_frames"] == 4  # the one real entry still counted


def test_au_aiff_corruption_fuzz():
    """AU/AIFF decode allocation is linear in the bytes PRESENT (PCM and
    G.711 are ~1:1 codings — no expansion bombs exist), so the only
    hardening needed is clean, fast failure on corrupt streams."""
    import time

    from jirlbot_spark.functions.aiff_au import (
        decode_aiff,
        decode_au,
        encode_aiff,
        encode_au,
    )

    rng = np.random.default_rng(77)
    wave = (rng.random((400, 2)) * 2 - 1) * 0.8
    blobs = [
        (decode_au, bytearray(encode_au(wave, 8000, "pcm16"))),
        (decode_au, bytearray(encode_au(wave, 8000, "ulaw"))),
        (decode_aiff, bytearray(encode_aiff(wave, 8000, bits=16))),
        (decode_aiff, bytearray(encode_aiff(wave, 8000, bits=24))),
    ]
    t0 = time.monotonic()
    for dec, blob in blobs:
        n = len(blob)
        for trial in range(150):
            mutated = bytearray(blob)
            kind = trial % 3
            if kind == 0:
                for _ in range(int(rng.integers(1, 5))):
                    mutated[int(rng.integers(0, n))] = int(
                        rng.integers(0, 256)
                    )
            elif kind == 1:
                mutated = mutated[: int(rng.integers(1, n))]
            else:
                at = int(rng.integers(0, n))
                ln = int(rng.integers(1, 48))
                mutated[at : at + ln] = rng.integers(
                    0, 256, ln, np.uint8
                ).tobytes()
            try:
                out, sr = dec(bytes(mutated))
                assert isinstance(out, np.ndarray) and sr >= 1
            except Exception:
                pass
    assert time.monotonic() - t0 < 20.0
