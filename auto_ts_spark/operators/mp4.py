"""MP4 / ISO Base Media File Format (ISO/IEC 14496-12) container
codec for Motion-JPEG video — pure stdlib ``struct`` + the in-repo
JPEG codec, no media library.

What this is: the DEMUX half of "decode an .mp4" is pure structure —
a length-prefixed box tree (``ftyp``/``moov``/``mdat``) whose sample
tables (``stsd`` codec entry, ``stsz`` sizes, ``stsc`` chunk runs,
``stco``/``co64`` chunk offsets, ``stts`` timing) map samples to byte
ranges. This module implements that walk faithfully — multi-run
``stsc``, fixed- and per-sample ``stsz``, 32- and 64-bit chunk
offsets, 64-bit ``largesize`` boxes — and decodes the mapped samples
with ``operators/jpeg.py`` when the track's sample entry is
Motion-JPEG (``jpeg``/``mjpg`` — the QuickTime-lineage MJPEG-in-MP4
layout). Tracks carrying codecs that genuinely need a codec library
(``avc1``/``hvc1``/``vp09``/``av01`` …) raise ValueError, routing
``multimodal.decode_video`` to its documented deterministic fake
rather than mis-decoding.

The MUX half exists to make the demuxer testable end-to-end and to
give the media fixtures a real MP4 flavor: a minimal but conformant
``ftyp``+``mdat``+``moov`` writer whose sample table intentionally
splits samples across multiple chunks so the ``stsc`` run-walk is
exercised, not just the trivial one-chunk case.

Reference parity: the reference engine has no media codecs at all
(multimodal columns are a scale extension, SURVEY.md §2.9); this
narrows the "codec-bearing video container" fake list to codecs that
truly require external libraries.
"""

from __future__ import annotations

import struct

import numpy as np

from auto_ts_spark.operators.jpeg import decode_jpeg, encode_jpeg

_MJPEG_FORMATS = {b"jpeg", b"mjpg", b"MJPG", b"mjpa"}


# --------------------------------------------------------------------------
# Mux
# --------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4_mjpeg(
    frames: np.ndarray,
    fps: int = 10,
    quality: int = 90,
    chunk_samples: int = 3,
    use_co64: bool = False,
) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an MP4 with a single
    Motion-JPEG video track (``jpeg`` VisualSampleEntry; every sample
    is a complete baseline JPEG from ``operators/jpeg.py``). Samples
    are grouped ``chunk_samples`` per chunk so the demuxer's ``stsc``
    run-walk sees a multi-chunk table. Layout: ftyp, mdat, moov —
    chunk offsets are absolute file offsets into mdat.
    ``use_co64`` writes 64-bit chunk offsets (the >4 GiB large-file
    form) instead of ``stco``."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {frames.shape}")
    n, h, w = frames.shape[:3]
    fps = max(int(fps), 1)
    chunk_samples = max(int(chunk_samples), 1)
    payloads = [encode_jpeg(f, quality) for f in frames]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp41")
    mdat_payload = b"".join(payloads)
    mdat = _box(b"mdat", mdat_payload)
    first_sample_off = len(ftyp) + 8  # mdat header precedes the payload

    # chunking: runs of chunk_samples, remainder in the last chunk
    chunk_counts: list[int] = []
    left = n
    while left > 0:
        take = min(chunk_samples, left)
        chunk_counts.append(take)
        left -= take
    chunk_offsets: list[int] = []
    off = first_sample_off
    k = 0
    for cnt in chunk_counts:
        chunk_offsets.append(off)
        for _ in range(cnt):
            off += len(payloads[k])
            k += 1
    # stsc runs: (first_chunk, samples_per_chunk, sample_desc_index)
    stsc_runs: list[tuple[int, int, int]] = []
    for ci, cnt in enumerate(chunk_counts, start=1):
        if not stsc_runs or stsc_runs[-1][1] != cnt:
            stsc_runs.append((ci, cnt, 1))

    timescale = fps * 1000
    delta = 1000
    duration = n * delta

    stsd_entry = (
        struct.pack(">I4s", 86, b"jpeg")
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x0bMotion-JPEG" + b"\x00" * 20  # 32-byte compressorname
        + struct.pack(">Hh", 0x0018, -1)
    )
    assert len(stsd_entry) == 86
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    if use_co64:
        stco = _full(
            b"co64",
            0,
            0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        )
    else:
        stco = _full(
            b"stco",
            0,
            0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"VideoHandler\x00"
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),  # und language
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        struct.pack(">IIII", 0, 0, 1, 0)  # track_ID 1
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# Demux
# --------------------------------------------------------------------------


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) over a box sequence,
    honoring 64-bit ``largesize`` and the size==0 to-end form."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", data, i)
        btype = data[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, i + 8)
            body = i + 16
        elif size == 0:
            size = end - i
        if size < body - i or i + size > end:
            raise ValueError("invalid MP4: box overruns its container")
        yield btype, body, i + size
        i += size


def _find_box(data: bytes, start: int, end: int, btype: bytes) -> tuple[int, int]:
    for t, b, e in _iter_boxes(data, start, end):
        if t == btype:
            return b, e
    raise ValueError(f"invalid MP4: missing {btype.decode('latin1')} box")


def _full_body(data: bytes, b: int) -> int:
    """Skip a FullBox's version/flags dword."""
    return b + 4


def decode_mp4_mjpeg(content: bytes) -> tuple[np.ndarray, int]:
    """Decode an MP4 whose video track is Motion-JPEG to
    ((n, h, w, 3) RGB uint8, fps): real box-tree walk, real sample
    table resolution (multi-run stsc, fixed/per-sample stsz,
    stco/co64), each mapped sample decoded by the in-repo JPEG codec.
    Raises ValueError for non-MJPEG video codecs and malformed
    tables — the caller's documented-fake contract."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (missing ftyp)")
    moov_b, moov_e = _find_box(content, 0, len(content), b"moov")
    video_err: str | None = None
    for t, trak_b, trak_e in _iter_boxes(content, moov_b, moov_e):
        if t != b"trak":
            continue
        mdia_b, mdia_e = _find_box(content, trak_b, trak_e, b"mdia")
        hdlr_b, _ = _find_box(content, mdia_b, mdia_e, b"hdlr")
        handler = content[_full_body(content, hdlr_b) + 4 : _full_body(content, hdlr_b) + 8]
        if handler != b"vide":
            continue
        mdhd_b, _ = _find_box(content, mdia_b, mdia_e, b"mdhd")
        p = _full_body(content, mdhd_b)
        version = content[mdhd_b]
        if version == 1:
            timescale = struct.unpack_from(">I", content, p + 16)[0]
        else:
            timescale = struct.unpack_from(">I", content, p + 8)[0]
        minf_b, minf_e = _find_box(content, mdia_b, mdia_e, b"minf")
        stbl_b, stbl_e = _find_box(content, minf_b, minf_e, b"stbl")

        # ---- stsd: the codec gate ----
        stsd_b, _ = _find_box(content, stbl_b, stbl_e, b"stsd")
        p = _full_body(content, stsd_b)
        (entry_count,) = struct.unpack_from(">I", content, p)
        if entry_count < 1:
            raise ValueError("invalid MP4: empty stsd")
        fmt = content[p + 8 : p + 12]
        if fmt not in _MJPEG_FORMATS:
            video_err = (
                f"unsupported MP4 video codec {fmt.decode('latin1')!r} "
                "(Motion-JPEG only — other codecs need a codec library)"
            )
            continue

        # ---- stsz: sample sizes ----
        stsz_b, _ = _find_box(content, stbl_b, stbl_e, b"stsz")
        p = _full_body(content, stsz_b)
        fixed_size, sample_count = struct.unpack_from(">II", content, p)
        if fixed_size:
            sizes = [fixed_size] * sample_count
        else:
            sizes = list(
                struct.unpack_from(f">{sample_count}I", content, p + 8)
            )

        # ---- stco / co64: chunk offsets ----
        try:
            stco_b, _ = _find_box(content, stbl_b, stbl_e, b"stco")
            p = _full_body(content, stco_b)
            (n_chunks,) = struct.unpack_from(">I", content, p)
            offsets = list(struct.unpack_from(f">{n_chunks}I", content, p + 4))
        except ValueError:
            co64_b, _ = _find_box(content, stbl_b, stbl_e, b"co64")
            p = _full_body(content, co64_b)
            (n_chunks,) = struct.unpack_from(">I", content, p)
            offsets = list(struct.unpack_from(f">{n_chunks}Q", content, p + 4))

        # ---- stsc: samples-per-chunk runs → per-sample offsets ----
        stsc_b, _ = _find_box(content, stbl_b, stbl_e, b"stsc")
        p = _full_body(content, stsc_b)
        (n_runs,) = struct.unpack_from(">I", content, p)
        runs = [
            struct.unpack_from(">III", content, p + 4 + 12 * i)
            for i in range(n_runs)
        ]
        sample_ranges: list[tuple[int, int]] = []
        si = 0
        for ri, (first_chunk, per_chunk, _sdi) in enumerate(runs):
            last_chunk = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
            )
            for ci in range(first_chunk - 1, last_chunk):
                off = offsets[ci]
                for _ in range(per_chunk):
                    if si >= sample_count:
                        break
                    sample_ranges.append((off, off + sizes[si]))
                    off += sizes[si]
                    si += 1
        if si != sample_count:
            raise ValueError("invalid MP4: stsc runs do not cover all samples")

        # ---- stts: timing → fps ----
        stts_b, _ = _find_box(content, stbl_b, stbl_e, b"stts")
        p = _full_body(content, stts_b)
        (n_t,) = struct.unpack_from(">I", content, p)
        delta = struct.unpack_from(">II", content, p + 4)[1] if n_t else 0
        fps = max(int(round(timescale / delta)), 1) if delta else 1

        frames = []
        for lo, hi in sample_ranges:
            if hi > len(content):
                raise ValueError("invalid MP4: sample range beyond file end")
            img = decode_jpeg(content[lo:hi])
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            frames.append(img)
        if not frames:
            raise ValueError("invalid MP4: video track has no samples")
        return np.stack(frames), fps
    raise ValueError(video_err or "invalid MP4: no video track")
