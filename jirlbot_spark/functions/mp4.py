"""ISO-BMFF (MP4/MOV) box walker — container-real metadata without a
sample decoder.

MP4 sample decode (H.264/H.265/AV1) needs codec libraries not in this
sandbox, and media.py keeps pixels behind its capability gate. The BOX
STRUCTURE, though, is simple public spec (ISO/IEC 14496-12), and
duration / dimensions / frame count / codec fourcc are what a 100 TB
pipeline extracts from video payloads before scheduling decode work.
This module walks the boxes for real:

  - mp4_info: ftyp check, mvhd (v0/v1) movie duration, per-trak tkhd
    dimensions (16.16 fixed), mdhd media timescale, hdlr handler type,
    stsd first-entry codec fourcc, stts frame count; returns the first
    VIDEO track's numbers (falling back to the first track).
  - encode_mp4_stub: a structurally VALID minimal mp4 (ftyp + moov with
    one video trak + junk mdat) whose samples are deterministic junk —
    NOT decodable video, loudly named so. It makes fixture mp4 rows
    container-real: the box walk measures true n_frames/fps/dimensions
    while the pixel path stays honestly gated
    (media.fake_decode_frame).
  - mp4_sample_ranges: the full sample-table walk (stsz sizes, stsc
    sample→chunk map, stco/co64 chunk offsets) producing each sample's
    exact (offset, size) in the file — validated against the file
    length so a bomb cannot claim bytes it did not ship.
  - decode_mp4_frames / encode_mp4_mjpeg: REAL pixels for the one mp4
    codec this sandbox can honestly decode — Motion-JPEG ('jpeg'
    sample-entry fourcc, one baseline/progressive JPEG per sample,
    QuickTime-style MJPEG-in-MOV/MP4) through the engine's own
    functions/jpeg.py. H.264/H.265/AV1 mp4s still raise the explicit
    capability gate in media.frame_sample.

No reference counterpart: RovoMe/JIRLbot never decodes payloads; this
serves the graft's training-data mandate (video payload columns).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def _boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) over a box sequence."""
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", data, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {typ!r}")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, typ: bytes):
    for t, b, e in _boxes(data, pos, end):
        if t == typ:
            return b, e
    return None


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _track_info(data: bytes, b: int, e: int) -> dict:
    """Parse one trak box body."""
    out: dict = {}
    span = _find(data, b, e, b"tkhd")
    if span is not None:
        _tb, te = span
        # width/height are the LAST 8 bytes of tkhd, 16.16 fixed-point —
        # end-anchored so v0 and v1 headers read identically
        wfix, hfix = struct.unpack_from(">II", data, te - 8)
        out["w"], out["h"] = wfix >> 16, hfix >> 16
    mdia = _find(data, b, e, b"mdia")
    if mdia is None:
        return out
    mb, me = mdia
    span = _find(data, mb, me, b"mdhd")
    if span is not None:
        hb, _ = span
        version = data[hb]
        if version == 1:
            ts, dur = struct.unpack_from(">IQ", data, hb + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", data, hb + 4 + 8)
        out["timescale"], out["media_duration"] = ts, dur
    span = _find(data, mb, me, b"hdlr")
    if span is not None:
        hb, _ = span
        out["handler"] = data[hb + 8 : hb + 12].decode("latin1")
    minf = _find(data, mb, me, b"minf")
    if minf is None:
        return out
    stbl = _find(data, minf[0], minf[1], b"stbl")
    if stbl is None:
        return out
    sb, se = stbl
    span = _find(data, sb, se, b"stsd")
    if span is not None:
        db, de = span
        (n_entries,) = struct.unpack_from(">I", data, db + 4)
        if n_entries and db + 16 <= de:
            out["codec"] = data[db + 12 : db + 16].decode("latin1")
    span = _find(data, sb, se, b"stts")
    if span is not None:
        tb2, te2 = span
        (n,) = struct.unpack_from(">I", data, tb2 + 4)
        # clamp the entry count to what the box body actually ships —
        # a corrupt 32-bit count must not drive a multi-second loop or
        # read timing entries from unrelated bytes past the box
        n = min(n, max(0, (te2 - tb2 - 8) // 8))
        total = 0
        for i in range(n):
            cnt, _delta = struct.unpack_from(">II", data, tb2 + 8 + 8 * i)
            total += cnt
        out["n_frames"] = total
    return out


def mp4_info(data: bytes) -> dict:
    """Walk the boxes of an ISO-BMFF file. Returns {duration_s, w, h,
    n_frames, fps, codec, n_tracks} for the first video track (first
    track when no 'vide' handler exists). Raises ValueError on
    non-BMFF or structurally broken input."""
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF (mp4/mov) stream")
    end = len(data)
    moov = _find(data, 0, end, b"moov")
    if moov is None:
        raise ValueError("no moov box")
    mb, me = moov
    duration_s = None
    span = _find(data, mb, me, b"mvhd")
    if span is not None:
        hb, _ = span
        version = data[hb]
        if version == 1:
            ts, dur = struct.unpack_from(">IQ", data, hb + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", data, hb + 4 + 8)
        if ts:
            duration_s = dur / ts
    tracks = [
        _track_info(data, b, e)
        for t, b, e in _boxes(data, mb, me)
        if t == b"trak"
    ]
    if not tracks:
        raise ValueError("moov contains no trak")
    video = next(
        (t for t in tracks if t.get("handler") == "vide"), tracks[0]
    )
    n_frames = video.get("n_frames", 0)
    fps = None
    ts, md = video.get("timescale"), video.get("media_duration")
    if ts and md:
        fps = n_frames * ts / md if md else None
        if duration_s is None:
            duration_s = md / ts
    return {
        "duration_s": duration_s,
        "w": video.get("w"),
        "h": video.get("h"),
        "n_frames": n_frames,
        "fps": fps,
        "codec": video.get("codec"),
        "n_tracks": len(tracks),
    }


# Sample-entry fourccs whose samples are plain JPEG bitstreams — the
# QuickTime/ISO Motion-JPEG family (mjpa = MJPEG-A; field-split MJPEG-B
# 'mjpb' is NOT plain JPEG and stays out). Decodable in-sandbox by the
# engine's own functions/jpeg.py.
JPEG_SAMPLE_FOURCCS = {"jpeg", "mjpg", "mjpa"}


def _video_stbl(data: bytes) -> tuple[int, int]:
    """Locate the sample-table (stbl) span of the first video trak
    (first trak with any stbl when no 'vide' handler exists)."""
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    first = None
    for t, b, e in _boxes(data, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        span = _find(data, mdia[0], mdia[1], b"hdlr")
        handler = data[span[0] + 8 : span[0] + 12] if span else b""
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        if handler == b"vide":
            return stbl
        if first is None:
            first = stbl
    if first is None:
        raise ValueError("no sample table (stbl) in any trak")
    return first


def mp4_sample_ranges(data: bytes) -> list[tuple[int, int]]:
    """Resolve every sample of the first video trak to its exact
    (offset, size) in the file via the full stsz + stsc + stco/co64
    walk. Every range is validated against the file length, so a
    decode-bomb cannot claim sample bytes it did not ship; table
    lengths are validated against their boxes before being read."""
    sb, se = _video_stbl(data)
    span = _find(data, sb, se, b"stsz")
    if span is None:
        raise ValueError("no stsz box")
    zb, zend = span
    uniform, count = struct.unpack_from(">II", data, zb + 4)
    if uniform == 0:
        if zb + 12 + 4 * count > zend:
            raise ValueError("truncated stsz sample-size table")
        sizes = struct.unpack_from(f">{count}I", data, zb + 12)
    else:
        # uniform-size path: `count` is attacker-controlled and unchecked
        # by any table length — bound the CLAIMED total sample bytes by
        # the file itself before materializing anything (a corrupt count
        # of ~2^32 would otherwise allocate a multi-GB tuple here).
        if uniform * count > len(data):
            raise ValueError(
                "stsz claims more sample bytes than the file ships"
            )
        sizes = (uniform,) * count
    width, fmtch = 4, "I"
    span = _find(data, sb, se, b"stco")
    if span is None:
        span = _find(data, sb, se, b"co64")
        width, fmtch = 8, "Q"
    if span is None:
        raise ValueError("no stco/co64 box")
    cb, cend = span
    (n_chunks,) = struct.unpack_from(">I", data, cb + 4)
    if cb + 8 + width * n_chunks > cend:
        raise ValueError("truncated chunk-offset table")
    offsets = struct.unpack_from(f">{n_chunks}{fmtch}", data, cb + 8)
    span = _find(data, sb, se, b"stsc")
    if span is None:
        raise ValueError("no stsc box")
    scb, scend = span
    (n_ent,) = struct.unpack_from(">I", data, scb + 4)
    if scb + 8 + 12 * n_ent > scend:
        raise ValueError("truncated stsc table")
    entries = [
        struct.unpack_from(">II", data, scb + 8 + 12 * i)
        for i in range(n_ent)
    ]
    ranges: list[tuple[int, int]] = []
    si, ei, spc = 0, 0, 0
    for ci in range(n_chunks):
        # applicable samples-per-chunk = last stsc entry whose
        # first_chunk (1-based) <= this chunk
        while ei < len(entries) and entries[ei][0] <= ci + 1:
            spc = entries[ei][1]
            ei += 1
        off = offsets[ci]
        for _ in range(spc):
            if si >= count:
                break
            sz = sizes[si]
            if off + sz > len(data):
                raise ValueError("sample range past end of file")
            ranges.append((off, sz))
            off += sz
            si += 1
        if si >= count:
            break
    if si < count:
        raise ValueError(f"sample table short: {si}/{count} samples mapped")
    return ranges


def decode_mp4_frames(data: bytes) -> tuple[np.ndarray, float]:
    """Decode a Motion-JPEG mp4/mov to ((n, h, w, 3) uint8 RGB, fps).

    Only the JPEG sample-entry family decodes (one baseline/progressive
    JPEG per sample through the engine's own functions/jpeg.py, each
    sample covered by jpeg.py's decode-bomb dims guard); other codecs
    raise NotImplementedError — the same explicit capability gate
    media.frame_sample applies."""
    info = mp4_info(data)
    codec = (info.get("codec") or "").strip().lower()
    if codec not in JPEG_SAMPLE_FOURCCS:
        raise NotImplementedError(
            f"no in-sandbox decoder for mp4 codec {info.get('codec')!r}"
        )
    from jirlbot_spark.functions.jpeg import decode_jpeg

    fps = float(info.get("fps") or 30.0)
    ranges = mp4_sample_ranges(data)
    if not ranges:
        w, h = int(info.get("w") or 0), int(info.get("h") or 0)
        return np.zeros((0, h, w, 3), np.uint8), fps
    decoded = [decode_jpeg(data[o : o + s]) for o, s in ranges]
    shapes = {d.shape for d in decoded}
    if len(shapes) != 1:
        raise ValueError(f"inconsistent MJPEG sample shapes: {shapes}")
    return np.stack(decoded), fps


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), typ) + body


def _build_mp4(
    w: int,
    h: int,
    n_frames: int,
    fps: float,
    codec: bytes,
    mdat_body: bytes,
    uniform_size: int = 0,
    sample_sizes: list[int] | None = None,
) -> bytes:
    """Assemble a minimal one-video-trak ISO-BMFF file around `mdat_body`
    (ftyp + moov[mvhd + trak[tkhd + mdia[mdhd+hdlr+minf[vmhd+stbl]]]] +
    mdat, one chunk holding all samples). `uniform_size` XOR
    `sample_sizes` populates stsz."""
    delta = 1000
    timescale = int(round(fps * delta))
    media_dur = n_frames * delta
    movie_ts = 1000
    movie_dur = int(round(media_dur * movie_ts / max(timescale, 1)))

    matrix = struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, movie_ts, movie_dur)
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)  # rate, volume, rsvd
        + matrix
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        # version, flags=enabled|in-movie, created, modified, track id,
        # reserved, duration
        struct.pack(">B3sIIIII", 0, b"\x00\x00\x07", 0, 0, 1, 0, movie_dur)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt group, volume, pad
        + matrix
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(
        b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale, media_dur, 0x55C4, 0)
    )
    hdlr = _box(
        b"hdlr", struct.pack(">B3xI4s12x", 0, 0, b"vide") + b"stub\x00"
    )
    # visual sample entry: 8 sample-entry bytes + 70 visual bytes
    entry_body = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">III", 0x00480000, 0x00480000, 0)  # 72dpi x2, rsvd
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _box(
        b"stsd", struct.pack(">B3xI", 0, 1) + _box(codec, entry_body)
    )
    stts = _box(b"stts", struct.pack(">B3xIII", 0, 1, n_frames, delta))
    if sample_sizes is not None:
        stsz = _box(
            b"stsz",
            struct.pack(">B3xII", 0, 0, len(sample_sizes))
            + struct.pack(f">{len(sample_sizes)}I", *sample_sizes),
        )
    else:
        stsz = _box(
            b"stsz", struct.pack(">B3xII", 0, uniform_size, n_frames)
        )
    stsc = _box(b"stsc", struct.pack(">B3xIIII", 0, 1, 1, n_frames, 1))
    # chunk offset must point at mdat body: compute after sizing moov
    # with a placeholder, then rebuild (box sizes don't change)
    def build(stco_off: int) -> bytes:
        stco = _box(b"stco", struct.pack(">B3xII", 0, 1, stco_off))
        stbl2 = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", _box(b"vmhd", struct.pack(">B3xHHHH", 0, 0, 0, 0, 0)) + stbl2)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        moov = _box(b"moov", mvhd + trak)
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
        return ftyp + moov + _box(b"mdat", mdat_body)

    probe = build(0)
    stco_off = len(probe) - len(mdat_body)
    return build(stco_off)


def encode_mp4_stub(
    w: int,
    h: int,
    n_frames: int,
    fps: float = 30.0,
    codec: bytes = b"avc1",
    seed: int = 0,
) -> bytes:
    """STUB ENCODER: emits a structurally valid minimal mp4 (box-walkable
    by mp4_info — true dimensions/frame count/fps) whose mdat payload is
    deterministic junk, NOT decodable video."""
    sample_size = 64
    junk = hashlib.blake2b(
        struct.pack("<qiii", seed, w, h, n_frames), digest_size=64
    ).digest()
    mdat_body = (junk * n_frames)[: sample_size * max(n_frames, 1)]
    return _build_mp4(
        w, h, n_frames, fps, codec, mdat_body, uniform_size=sample_size
    )


def encode_mp4_mjpeg(
    frames: np.ndarray,
    fps: float = 30.0,
    quality: int = 90,
    subsample: str = "444",
) -> bytes:
    """REAL ENCODER: Motion-JPEG in mp4 — one baseline JPEG
    (functions/jpeg.py) per sample under a 'jpeg' sample entry, exact
    per-sample stsz table, all samples in one mdat chunk. Lossy; the
    engine's PSNR>=40dB @ quality 90 invariant applies per frame at the
    default 4:4:4 (`subsample` passes through for 4:2:2/4:2:0)."""
    from jirlbot_spark.functions.jpeg import encode_jpeg

    frames = np.asarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    samples = [
        encode_jpeg(frames[i], quality=quality, subsample=subsample)
        for i in range(n)
    ]
    return _build_mp4(
        w,
        h,
        n,
        fps,
        b"jpeg",
        b"".join(samples),
        sample_sizes=[len(s) for s in samples],
    )
