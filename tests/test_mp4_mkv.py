"""MP4 (ISO BMFF) and Matroska (EBML) Motion-JPEG container tests
(r13): mux→demux round trips, real sample-table resolution
(multi-run stsc, co64, stts timing; DefaultDuration and
cluster-timestamp fps), hand-built decoder paths the muxer never
emits (BlockGroup/Block, unknown-size Segment), codec gates for
library-bound codecs, and decode_video routing incl. the
documented-fake fallback for corrupt payloads.
"""

import struct

import numpy as np
import pytest

from auto_ts_spark.operators.mkv import (
    _BLOCK,
    _BLOCK_GROUP,
    _CLUSTER,
    _CLUSTER_TIMESTAMP,
    _SEGMENT,
    _elem,
    _id_bytes,
    _uint,
    decode_mkv_mjpeg,
    encode_mkv_mjpeg,
)
from auto_ts_spark.operators.mp4 import decode_mp4_mjpeg, encode_mp4_mjpeg
from auto_ts_spark.operators.multimodal import decode_video, synthetic_media


def _frames(seed: int = 3, n: int = 7, h: int = 24, w: int = 32) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (n, h, w, 3)).astype(np.uint8)


# -------------------------------------------------------------------- MP4


@pytest.mark.parametrize("chunk_samples", [1, 2, 3, 100])
def test_mp4_roundtrip_chunkings(chunk_samples):
    frames = _frames()
    payload = encode_mp4_mjpeg(frames, fps=12, quality=92, chunk_samples=chunk_samples)
    out, fps = decode_mp4_mjpeg(payload)
    assert fps == 12 and out.shape == frames.shape
    assert np.abs(out.astype(float) - frames.astype(float)).mean() < 8.0


def test_mp4_multi_run_stsc_actually_emitted():
    # 7 samples at 3/chunk → chunks of 3,3,1 → TWO stsc runs
    payload = encode_mp4_mjpeg(_frames(), chunk_samples=3)
    i = payload.index(b"stsc")
    (n_runs,) = struct.unpack_from(">I", payload, i + 8)
    assert n_runs == 2


def test_mp4_co64_large_file_offsets():
    frames = _frames(5)
    payload = encode_mp4_mjpeg(frames, fps=10, use_co64=True)
    assert b"co64" in payload and b"stco" not in payload
    out, fps = decode_mp4_mjpeg(payload)
    assert fps == 10 and out.shape == frames.shape


def test_mp4_fps_from_timescale():
    for fps in (1, 10, 30):
        payload = encode_mp4_mjpeg(_frames(n=3), fps=fps)
        assert decode_mp4_mjpeg(payload)[1] == fps


def test_mp4_codec_gate():
    payload = bytearray(encode_mp4_mjpeg(_frames(n=2)))
    i = payload.find(b"jpeg", payload.find(b"stsd"))
    payload[i : i + 4] = b"avc1"
    with pytest.raises(ValueError, match="avc1"):
        decode_mp4_mjpeg(bytes(payload))


def test_mp4_rejects_non_mp4_and_truncation():
    with pytest.raises(ValueError, match="ftyp"):
        decode_mp4_mjpeg(b"RIFF" + b"\x00" * 20)
    payload = encode_mp4_mjpeg(_frames(n=2))
    with pytest.raises(ValueError):
        decode_mp4_mjpeg(payload[: len(payload) // 2])  # moov truncated away


# -------------------------------------------------------------------- MKV


@pytest.mark.parametrize("cluster_frames", [1, 4, 100])
def test_mkv_roundtrip_clusterings(cluster_frames):
    frames = _frames(4, n=9, h=20, w=28)
    payload = encode_mkv_mjpeg(frames, fps=25, quality=92, cluster_frames=cluster_frames)
    out, fps = decode_mkv_mjpeg(payload)
    assert fps == 25 and out.shape == frames.shape
    assert np.abs(out.astype(float) - frames.astype(float)).mean() < 8.0


def test_mkv_codec_gate():
    payload = bytearray(encode_mkv_mjpeg(_frames(n=2)))
    i = payload.find(b"V_MJPEG")
    payload[i : i + 7] = b"V_VP9\x00\x00"
    with pytest.raises(ValueError, match="V_VP9"):
        decode_mkv_mjpeg(bytes(payload))


def test_mkv_unknown_size_segment():
    # streamed Matroska writes the Segment with the reserved all-ones
    # size; the walker must extend it to EOF
    frames = _frames(6, n=3)
    payload = encode_mkv_mjpeg(frames, fps=10)
    sid = _id_bytes(_SEGMENT)
    si = payload.find(sid)
    first = payload[si + 4]
    length = 8 - first.bit_length() + 1
    patched = payload[: si + 4] + b"\x01" + b"\xff" * 7 + payload[si + 4 + length :]
    out, fps = decode_mkv_mjpeg(patched)
    assert fps == 10 and out.shape == frames.shape


def test_mkv_blockgroup_path_and_timestamp_fps():
    # hand-build the decoder path the muxer never emits: Block inside
    # BlockGroup, no DefaultDuration → fps from cluster/block timing
    from auto_ts_spark.operators.jpeg import encode_jpeg
    from auto_ts_spark.operators.mkv import (
        _CODEC_ID, _INFO, _MUXING_APP, _PIXEL_HEIGHT, _PIXEL_WIDTH,
        _TIMESTAMP_SCALE, _TRACKS, _TRACK_ENTRY, _TRACK_NUMBER,
        _TRACK_TYPE, _VIDEO, _WRITING_APP, _EBML, _DOCTYPE,
    )

    frames = _frames(8, n=2, h=16, w=16)
    ebml = _elem(_EBML, _uint(0x4286, 1) + _elem(_DOCTYPE, b"matroska"))
    info = _elem(_INFO, _uint(_TIMESTAMP_SCALE, 1_000_000))
    track = _elem(
        _TRACK_ENTRY,
        _uint(_TRACK_NUMBER, 1)
        + _uint(_TRACK_TYPE, 1)
        + _elem(_CODEC_ID, b"V_MJPEG")
        + _elem(_VIDEO, _uint(_PIXEL_WIDTH, 16) + _uint(_PIXEL_HEIGHT, 16)),
    )
    blocks = b""
    for fi, f in enumerate(frames):
        inner = b"\x81" + struct.pack(">h", fi * 40) + b"\x00" + encode_jpeg(f, 92)
        blocks += _elem(_BLOCK_GROUP, _elem(_BLOCK, inner))
    cluster = _elem(_CLUSTER, _uint(_CLUSTER_TIMESTAMP, 0) + blocks)
    payload = ebml + _elem(_SEGMENT, info + _elem(_TRACKS, track) + cluster)
    out, fps = decode_mkv_mjpeg(payload)
    assert out.shape == frames.shape
    assert fps == 25  # 40 ms per frame at the 1 ms timestamp scale


def test_mkv_lacing_rejected():
    from auto_ts_spark.operators.mkv import _SIMPLE_BLOCK, _iter_elements

    payload = bytearray(encode_mkv_mjpeg(_frames(n=2), cluster_frames=1))
    # walk to the first SimpleBlock with the module's own parser and
    # flip its flags byte to EBML lacing (0x06)
    data = bytes(payload)
    seg = next(e for e in _iter_elements(data, 0, len(data)) if e[0] == _SEGMENT)
    cluster = next(
        e for e in _iter_elements(data, seg[1], seg[2]) if e[0] == _CLUSTER
    )
    block = next(
        e
        for e in _iter_elements(data, cluster[1], cluster[2])
        if e[0] == _SIMPLE_BLOCK
    )
    payload[block[1] + 3] |= 0x06  # track varint(1) + rel i16(2) → flags
    with pytest.raises(ValueError, match="laced"):
        decode_mkv_mjpeg(bytes(payload))


# ------------------------------------------------------- decode_video


def test_decode_video_routes_mp4_and_mkv():
    frames = _frames(9, n=4)
    for payload in (
        encode_mp4_mjpeg(frames, fps=10, quality=92),
        encode_mkv_mjpeg(frames, fps=10, quality=92),
    ):
        out = decode_video(payload)
        assert out.shape == frames.shape
        assert np.abs(out.astype(float) - frames.astype(float)).mean() < 8.0


def test_decode_video_fake_for_library_bound_codecs():
    # an MP4 whose track is avc1 must route to the documented fake at
    # the metadata dimensions, not raise inside the worker
    payload = bytearray(encode_mp4_mjpeg(_frames(n=2, h=8, w=8)))
    i = payload.find(b"jpeg", payload.find(b"stsd"))
    payload[i : i + 4] = b"avc1"
    out = decode_video(bytes(payload), width=8, height=8, n_frames=2)
    assert out.shape == (2, 8, 8, 3)


def test_synthetic_media_video_schedule_mixes_containers(spark):
    media = synthetic_media(spark, 32, kind="video").select("media_id", "mime").collect()
    mimes = {r["media_id"]: r["mime"] for r in media}
    assert mimes[5] == "video/mp4" and mimes[21] == "video/mp4"
    assert mimes[13] == "video/x-matroska" and mimes[29] == "video/x-matroska"
    assert mimes[1] == "video/avi" and mimes[9] == "video/avi"  # MJPEG AVI
    assert mimes[0] == "video/avi" and mimes[2] == "video/avi"  # raw DIB
