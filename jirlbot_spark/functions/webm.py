"""EBML/Matroska (WebM) walker — container-real metadata without a
sample decoder.

VP8/VP9/AV1 sample decode needs codec libraries not in this sandbox
(media.py gates pixels), but the EBML STRUCTURE is public spec
(RFC 8794 + the Matroska element registry), and duration / dimensions /
frame count / codec id are what a pipeline reads from webm payloads
before scheduling decode. This module walks the elements for real:

  - webm_info: EBML header check, Segment walk — Info (TimestampScale,
    Duration), Tracks (first video TrackEntry's PixelWidth/PixelHeight/
    CodecID), Clusters (video-track SimpleBlock/Block count = frame
    count, lacing-aware). Unknown-size elements (streamed webm) extend
    to the end of their parent.
  - encode_webm_stub: structurally valid minimal webm (EBML header +
    Segment with one video track + clusters of junk SimpleBlocks) —
    NOT decodable video, loudly named so; makes fixture webm rows
    container-real while pixels stay honestly gated
    (media.fake_decode_frame).

No reference counterpart: RovoMe/JIRLbot never decodes payloads; this
serves the graft's training-data mandate (video payload columns).
"""

from __future__ import annotations

import hashlib
import struct

_EBML_MAGIC = b"\x1aE\xdf\xa3"

# element ids (stored form, marker bits included)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1


def _read_vint(data: bytes, pos: int, keep_marker: bool):
    """(value, new_pos). EBML ids keep the marker bit; sizes strip it.
    A size with all value bits set means 'unknown' -> returns None."""
    if pos >= len(data):
        raise ValueError("truncated EBML vint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 9 - first.bit_length()  # leading-zeros + 1
    if pos + length > len(data):
        raise ValueError("truncated EBML vint")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    if not keep_marker and val == (1 << (7 * length)) - 1:
        return None, pos + length  # unknown size
    return val, pos + length


def _elements(data: bytes, pos: int, end: int):
    """Yield (id, body_start, body_end) over a master element's body."""
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        body_end = end if size is None else pos + size
        if body_end > end:
            raise ValueError("EBML element overruns parent")
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def _float(data: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", data[b:e])[0]
    if n == 8:
        return struct.unpack(">d", data[b:e])[0]
    raise ValueError(f"bad EBML float size {n}")


def is_webm(data: bytes) -> bool:
    return data[:4] == _EBML_MAGIC


def _count_block_frames(data: bytes, b: int, e: int) -> int:
    """Frames carried by one (Simple)Block: 1 unless laced (low 2 flag
    bits nonzero -> a frame-count byte follows the flags)."""
    track, p = _read_vint(data, b, keep_marker=False)
    p += 2  # relative timestamp
    if p >= e:
        return 0
    flags = data[p]
    if flags & 0x06:
        if p + 1 >= e:
            return 0
        return data[p + 1] + 1
    return 1


def webm_info(data: bytes) -> dict:
    """Walk a webm/matroska stream. Returns {duration_s, w, h, n_frames,
    fps, codec, n_tracks}. Raises ValueError on non-EBML input."""
    if not is_webm(data):
        raise ValueError("not an EBML (webm/matroska) stream")
    seg = next(
        (
            (b, e)
            for eid, b, e in _elements(data, 0, len(data))
            if eid == _SEGMENT
        ),
        None,
    )
    if seg is None:
        raise ValueError("no Segment element")
    ts_scale = 1_000_000  # ns per tick, Matroska default
    duration_ticks = None
    video_track = None
    codec = w = h = None
    n_tracks = 0
    n_frames = 0
    for eid, b, e in _elements(data, seg[0], seg[1]):
        if eid == _INFO:
            for tid, tb, te in _elements(data, b, e):
                if tid == _TIMESTAMP_SCALE:
                    ts_scale = _uint(data, tb, te)
                elif tid == _DURATION:
                    duration_ticks = _float(data, tb, te)
        elif eid == _TRACKS:
            for tid, tb, te in _elements(data, b, e):
                if tid != _TRACK_ENTRY:
                    continue
                n_tracks += 1
                t_num = t_type = t_codec = t_w = t_h = None
                for fid, fb, fe in _elements(data, tb, te):
                    if fid == _TRACK_NUMBER:
                        t_num = _uint(data, fb, fe)
                    elif fid == _TRACK_TYPE:
                        t_type = _uint(data, fb, fe)
                    elif fid == _CODEC_ID:
                        t_codec = data[fb:fe].decode("latin1").rstrip("\x00")
                    elif fid == _VIDEO:
                        for vid, vb, ve in _elements(data, fb, fe):
                            if vid == _PIXEL_W:
                                t_w = _uint(data, vb, ve)
                            elif vid == _PIXEL_H:
                                t_h = _uint(data, vb, ve)
                if t_type == 1 and video_track is None:  # video
                    video_track, codec, w, h = t_num, t_codec, t_w, t_h
        elif eid == _CLUSTER:
            for cid, cb, ce in _elements(data, b, e):
                if cid == _SIMPLE_BLOCK:
                    blk = (cb, ce)
                elif cid == _BLOCK_GROUP:
                    blk = next(
                        (
                            (gb, ge)
                            for gid, gb, ge in _elements(data, cb, ce)
                            if gid == _BLOCK
                        ),
                        None,
                    )
                    if blk is None:
                        continue
                else:
                    continue
                track, _ = _read_vint(data, blk[0], keep_marker=False)
                if video_track is None or track == video_track:
                    n_frames += _count_block_frames(data, blk[0], blk[1])
    duration_s = (
        duration_ticks * ts_scale / 1e9 if duration_ticks is not None else None
    )
    fps = (
        n_frames / duration_s if duration_s and n_frames else None
    )
    return {
        "duration_s": duration_s,
        "w": w,
        "h": h,
        "n_frames": n_frames,
        "fps": fps,
        "codec": codec,
        "n_tracks": n_tracks,
    }


# ---------- stub encoder ----------

def _vint_size(val: int) -> bytes:
    """Encode an element SIZE as a minimal-length EBML vint."""
    for length in range(1, 9):
        if val < (1 << (7 * length)) - 1:
            out = bytearray(length)
            v = val | (1 << (7 * length))
            for i in range(length - 1, -1, -1):
                out[i] = v & 0xFF
                v >>= 8
            return bytes(out)
    raise ValueError("size too large")


def _eid(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _eid(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, val: int) -> bytes:
    return _el(eid, val.to_bytes(max(1, (val.bit_length() + 7) // 8), "big"))


def encode_webm_stub(
    w: int,
    h: int,
    n_frames: int,
    fps: float = 30.0,
    codec: str = "V_VP8",
    seed: int = 0,
) -> bytes:
    """STUB ENCODER: structurally valid webm (walkable by webm_info —
    true dimensions/frame count/duration) whose SimpleBlock payloads are
    deterministic junk, NOT decodable video."""
    header = _el(
        0x1A45DFA3,
        _el_uint(0x4286, 1)  # EBMLVersion
        + _el_uint(0x42F7, 1)  # EBMLReadVersion
        + _el_uint(0x42F2, 4)  # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)  # EBMLMaxSizeLength
        + _el(0x4282, b"webm")  # DocType
        + _el_uint(0x4287, 2)  # DocTypeVersion
        + _el_uint(0x4285, 2),  # DocTypeReadVersion
    )
    dur_ms = n_frames / fps * 1000.0
    info = _el(
        _INFO,
        _el_uint(_TIMESTAMP_SCALE, 1_000_000)
        + _el(_DURATION, struct.pack(">d", dur_ms)),
    )
    video = _el(_VIDEO, _el_uint(_PIXEL_W, w) + _el_uint(_PIXEL_H, h))
    track = _el(
        _TRACK_ENTRY,
        _el_uint(_TRACK_NUMBER, 1)
        + _el_uint(0x73C5, 1)  # TrackUID
        + _el_uint(_TRACK_TYPE, 1)
        + _el(_CODEC_ID, codec.encode())
        + video,
    )
    tracks = _el(_TRACKS, track)
    clusters = b""
    frames_per_cluster = 20
    junk = hashlib.blake2b(
        struct.pack("<qiii", seed, w, h, n_frames), digest_size=48
    ).digest()
    for c0 in range(0, n_frames, frames_per_cluster):
        body = _el_uint(0xE7, int(c0 / fps * 1000))  # cluster Timestamp
        for i in range(c0, min(c0 + frames_per_cluster, n_frames)):
            rel = int((i - c0) / fps * 1000)
            payload = (
                b"\x81"  # track 1 as a vint
                + struct.pack(">h", rel)
                + b"\x80"  # keyframe flag, no lacing
                + junk
            )
            body += _el(_SIMPLE_BLOCK, payload)
        clusters += _el(_CLUSTER, body)
    return header + _el(_SEGMENT, info + tracks + clusters)
