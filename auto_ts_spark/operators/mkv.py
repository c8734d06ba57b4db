"""Matroska (MKV) container codec for Motion-JPEG video — pure
stdlib ``struct`` + the in-repo JPEG codec, no media library.

Matroska is an EBML document (RFC 8794 + the public Matroska spec):
every element is a variable-length ID, a variable-length size, and a
payload; the tree is Segment → Info (TimestampScale) / Tracks
(TrackEntry: number, type, CodecID, video dimensions) / Cluster
(Timestamp + SimpleBlocks). The DEMUX half walks that tree for real:
EBML varint ID/size parsing (incl. the all-ones "unknown size" form
for streamed Segments), track selection by TrackType==video, frame
timing from DefaultDuration with a cluster-timestamp fallback, and
SimpleBlock/BlockGroup payload extraction for the selected track.
``V_MJPEG`` frames decode through ``operators/jpeg.py``; codecs that
genuinely need a codec library (``V_MPEG4/ISO/AVC``, ``V_VP9`` …)
raise ValueError, routing ``multimodal.decode_video`` to its
documented deterministic fake. Laced blocks are rejected the same way
(our muxer never laces; mis-splitting frames silently would violate
the honest-fallback contract).

The MUX half is fixture-grade but conformant: EBML header
(DocType "matroska"), Segment with Info/Tracks, one Cluster per
``cluster_frames`` with relative-timestamped keyframe SimpleBlocks.

Reference parity: the reference engine has no media codecs at all
(multimodal columns are a scale extension, SURVEY.md §2.9).
"""

from __future__ import annotations

import struct

import numpy as np

from auto_ts_spark.operators.jpeg import decode_jpeg, encode_jpeg

# EBML / Matroska element IDs (public spec), as stored on the wire
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_DOCTYPE = 0x4282


def _id_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _size_bytes(n: int) -> bytes:
    """EBML variable-length size: length marker bit in the first byte."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is reserved (unknown)
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _elem(eid: int, body: bytes) -> bytes:
    return _id_bytes(eid) + _size_bytes(len(body)) + body


def _uint(eid: int, v: int) -> bytes:
    return _elem(eid, v.to_bytes(max((v.bit_length() + 7) // 8, 1), "big"))


def _read_varint(data: bytes, i: int, keep_marker: bool) -> tuple[int, int, bool]:
    """Read one EBML varint at ``i`` → (value, next_index, is_unknown).
    IDs keep the length-marker bit (class IDs are defined with it);
    sizes strip it. ``is_unknown`` flags the all-value-bits-set size."""
    if i >= len(data):
        raise ValueError("invalid MKV: truncated varint")
    first = data[i]
    if first == 0:
        raise ValueError("invalid MKV: bad varint lead byte")
    length = 8 - first.bit_length() + 1
    if i + length > len(data):
        raise ValueError("invalid MKV: truncated varint body")
    raw = int.from_bytes(data[i : i + length], "big")
    if keep_marker:
        return raw, i + length, False
    value = raw - (1 << (7 * length))
    return value, i + length, value == (1 << (7 * length)) - 1


def _iter_elements(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) over an EBML master
    element's children; unknown-size children extend to ``end``."""
    i = start
    while i < end:
        eid, i, _ = _read_varint(data, i, keep_marker=True)
        size, i, unknown = _read_varint(data, i, keep_marker=False)
        body_end = end if unknown else i + size
        if body_end > end:
            raise ValueError("invalid MKV: element overruns its parent")
        yield eid, i, body_end
        i = body_end


# --------------------------------------------------------------------------
# Mux
# --------------------------------------------------------------------------


def encode_mkv_mjpeg(
    frames: np.ndarray, fps: int = 10, quality: int = 90, cluster_frames: int = 4
) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a Matroska file with a
    single ``V_MJPEG`` video track: EBML header, Segment with
    Info/Tracks, one Cluster per ``cluster_frames`` frames, each frame
    a keyframe SimpleBlock whose payload is a complete baseline JPEG
    from ``operators/jpeg.py``. TimestampScale is the 1 ms default."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {frames.shape}")
    n, h, w = frames.shape[:3]
    fps = max(int(fps), 1)
    cluster_frames = max(int(cluster_frames), 1)
    frame_ms = 1000 // fps

    ebml = _elem(
        _EBML,
        _uint(0x4286, 1)  # EBMLVersion
        + _uint(0x42F7, 1)  # EBMLReadVersion
        + _uint(0x42F2, 4)  # EBMLMaxIDLength
        + _uint(0x42F3, 8)  # EBMLMaxSizeLength
        + _elem(_DOCTYPE, b"matroska")
        + _uint(0x4287, 4)  # DocTypeVersion
        + _uint(0x4285, 2),  # DocTypeReadVersion
    )
    info = _elem(
        _INFO,
        _uint(_TIMESTAMP_SCALE, 1_000_000)  # 1 ms ticks (the default)
        + _elem(_MUXING_APP, b"auto_ts_spark")
        + _elem(_WRITING_APP, b"auto_ts_spark"),
    )
    track = _elem(
        _TRACK_ENTRY,
        _uint(_TRACK_NUMBER, 1)
        + _uint(_TRACK_UID, 1)
        + _uint(_TRACK_TYPE, 1)  # video
        + _elem(_CODEC_ID, b"V_MJPEG")
        + _uint(_DEFAULT_DURATION, 1_000_000_000 // fps)
        + _elem(_VIDEO, _uint(_PIXEL_WIDTH, w) + _uint(_PIXEL_HEIGHT, h)),
    )
    tracks = _elem(_TRACKS, track)
    clusters = b""
    for c0 in range(0, n, cluster_frames):
        base_ms = c0 * frame_ms
        body = _uint(_CLUSTER_TIMESTAMP, base_ms)
        for fi in range(c0, min(c0 + cluster_frames, n)):
            rel = fi * frame_ms - base_ms
            block = (
                b"\x81"  # track 1 as a varint
                + struct.pack(">h", rel)
                + b"\x80"  # keyframe, no lacing
                + encode_jpeg(frames[fi], quality)
            )
            body += _elem(_SIMPLE_BLOCK, block)
        clusters += _elem(_CLUSTER, body)
    segment = _elem(_SEGMENT, info + tracks + clusters)
    return ebml + segment


# --------------------------------------------------------------------------
# Demux
# --------------------------------------------------------------------------


def decode_mkv_mjpeg(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a Matroska file whose video track is ``V_MJPEG`` to
    ((n, h, w, 3) RGB uint8, fps): real EBML walk (varint IDs/sizes,
    unknown-size Segment), track selection by TrackType, SimpleBlock +
    BlockGroup/Block extraction for that track, frames decoded by the
    in-repo JPEG codec. Raises ValueError for other video codecs and
    for laced blocks — the caller's documented-fake contract."""
    if not content.startswith(_id_bytes(_EBML)):
        raise ValueError("not a Matroska payload (missing EBML header)")
    segment_span = None
    for eid, b, e in _iter_elements(content, 0, len(content)):
        if eid == _SEGMENT:
            segment_span = (b, e)
            break
    if segment_span is None:
        raise ValueError("invalid MKV: missing Segment")

    scale_ns = 1_000_000
    video_track = None
    codec_id = None
    default_duration = None
    blocks: list[tuple[int, bytes]] = []  # (abs ticks, payload)
    for eid, b, e in _iter_elements(content, *segment_span):
        if eid == _INFO:
            for cid, cb, ce in _iter_elements(content, b, e):
                if cid == _TIMESTAMP_SCALE:
                    scale_ns = int.from_bytes(content[cb:ce], "big")
        elif eid == _TRACKS:
            for cid, cb, ce in _iter_elements(content, b, e):
                if cid != _TRACK_ENTRY:
                    continue
                num = ttype = None
                cod = dur = None
                for tid, tb, te in _iter_elements(content, cb, ce):
                    if tid == _TRACK_NUMBER:
                        num = int.from_bytes(content[tb:te], "big")
                    elif tid == _TRACK_TYPE:
                        ttype = int.from_bytes(content[tb:te], "big")
                    elif tid == _CODEC_ID:
                        cod = content[tb:te].rstrip(b"\x00").decode("latin1")
                    elif tid == _DEFAULT_DURATION:
                        dur = int.from_bytes(content[tb:te], "big")
                if ttype == 1 and video_track is None:
                    video_track, codec_id, default_duration = num, cod, dur
        elif eid == _CLUSTER:
            cluster_ts = 0
            for cid, cb, ce in _iter_elements(content, b, e):
                if cid == _CLUSTER_TIMESTAMP:
                    cluster_ts = int.from_bytes(content[cb:ce], "big")
                elif cid == _SIMPLE_BLOCK:
                    blocks.append(_parse_block(content, cb, ce, cluster_ts))
                elif cid == _BLOCK_GROUP:
                    for gid, gb, ge in _iter_elements(content, cb, ce):
                        if gid == _BLOCK:
                            blocks.append(_parse_block(content, gb, ge, cluster_ts))

    if video_track is None:
        raise ValueError("invalid MKV: no video track")
    if codec_id != "V_MJPEG":
        raise ValueError(
            f"unsupported MKV video codec {codec_id!r} "
            "(V_MJPEG only — other codecs need a codec library)"
        )
    mine = [(ts, payload) for ts, tnum, payload in blocks if tnum == video_track]
    if not mine:
        raise ValueError("invalid MKV: video track has no blocks")
    mine.sort(key=lambda t: t[0])
    frames = []
    for _ts, payload in mine:
        img = decode_jpeg(payload)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        frames.append(img)
    if default_duration:
        fps = max(int(round(1_000_000_000 / default_duration)), 1)
    elif len(mine) > 1 and mine[1][0] > mine[0][0]:
        fps = max(int(round(1_000_000_000 / ((mine[1][0] - mine[0][0]) * scale_ns))), 1)
    else:
        fps = 1
    return np.stack(frames), fps


def _parse_block(
    data: bytes, b: int, e: int, cluster_ts: int
) -> tuple[int, int, bytes]:
    """(absolute ticks, track number, frame payload) from a
    (Simple)Block body; laced blocks are rejected (ValueError)."""
    tnum, i, _ = _read_varint(data, b, keep_marker=False)
    (rel,) = struct.unpack_from(">h", data, i)
    flags = data[i + 2]
    if flags & 0x06:
        raise ValueError("laced MKV blocks not supported")
    return cluster_ts + rel, tnum, data[i + 3 : e]
