"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded and featurized Spark-side via ``mapInPandas``.

Decode kernels are REAL for every container a bare numpy/stdlib stack
can parse, across all three modalities — images: BMP (24-bit BI_RGB),
PPM (P6), PNG (8-bit gray/RGB/RGBA, zlib inflate + all five scanline
filters — r10), sequential AND progressive JPEG (SOF0/SOF1/SOF2
Huffman, 4:4:4/4:2:2/4:2:0, restart markers, spectral selection +
successive approximation — see ``operators/jpeg.py``, r10-r11),
TIFF (8-bit gray/RGB strips, none/PackBits/LZW compression with
Predictor-2 horizontal differencing, new-style JPEG-in-TIFF strips
decoded by the in-repo JPEG codec incl. shared JPEGTables, both byte
orders — r11-r12); audio: WAV (RIFF PCM 8/16-bit + G.711
mu-law/A-law companding — r11); video: AVI with uncompressed DIB
frames (RIFF chunk walk — r10) or Motion-JPEG frames (each '00dc'
chunk decoded by the in-repo JPEG codec — r11) — implemented with struct offsets + ``np.frombuffer`` + a
vectorized numpy IDCT (no codec libraries needed, none exist in this
container; WebP LOSSLESS decodes for real via ``operators/webp.py``,
and 12-bit extended-sequential + LOSSLESS JPEG via the in-repo codec
— r13). Formats that genuinely need a codec library (MP3/AAC,
MP4/MKV/WebM non-MJPEG codecs, LOSSY WebP/VP8, arithmetic-coded
JPEG) fall back to a clearly-marked deterministic fake so the
pipeline shape stays testable; a real deployment swaps only that
fallback body for PIL/soundfile/ffmpeg.

Scale notes: media bytes ride in parquet binary columns;
``mapInPandas`` streams Arrow record batches so a partition never
materializes fully in Python memory. Metadata-only transforms
(filtering by width, codec, duration; video frame sampling) never
touch the bytes — column pruning keeps them out of the scan entirely.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from auto_ts_spark.operators.gif import decode_gif, encode_gif
from auto_ts_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


# --------------------------------------------------------------------------
# Real containers — encode + decode with struct/numpy only.
# --------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed
    BMP (BITMAPINFOHEADER, BI_RGB, bottom-up rows, 4-byte row pad)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    # RGB -> BGR, bottom-up
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def decode_bmp(content: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed bottom-up BMP to (h, w, 3) RGB
    uint8. Only the BI_RGB/24bpp subset `encode_bmp` writes (the
    universal lowest-common-denominator BMP) is supported."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", content, 10)
    dib_size, w, h = struct.unpack_from("<Iii", content, 14)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    (compression,) = struct.unpack_from("<I", content, 30)
    if bpp != 24 or compression != 0 or h <= 0 or dib_size < 40:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression}, h={h})"
        )
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(content, dtype=np.uint8, count=h * stride, offset=offset)
    # bottom-up BGR -> top-down RGB
    return rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as binary PPM (P6)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(content: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) to (h, w, 3) RGB uint8."""
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace separated
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end-of-line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(content[start:pos])
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return (
        np.frombuffer(content, dtype=np.uint8, count=h * w * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------- TIFF (r11/r12) ------------------------------
# Classic TIFF 6.0 baseline: header + IFD tag walk, 8-bit gray/RGB,
# chunky planar config, strip layout, Compression 1 (none), 32773
# (PackBits — the TIFF-native RLE), 5 (LZW, r12 — the TIFF variant:
# MSB-first bit packing and the spec's early code-width change, vs the
# GIF variant's LSB-first packing in operators/gif.py), with Predictor
# 2 horizontal differencing, or 7 (new-style JPEG, r12 — each strip is
# a JPEG stream for the in-repo codec, shared tables via tag 347),
# both byte orders. This covers nearly all real-world TIFFs; only
# deprecated old-style JPEG (6), tiled, planar and non-8-bit variants
# still route to the documented fake.


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 LZW decode (Compression=5). Differs from the GIF
    variant in ``operators/gif.py`` in exactly two public-spec ways:
    codes are packed MSB-first, and the code width grows one code
    EARLY — when the table reaches 2^width - 1 entries, not 2^width
    (the TIFF spec's 'early change' that became canon). Fixed 8-bit
    symbols: Clear=256, EOI=257, first dynamic code 258."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: return what we have
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"corrupt TIFF LZW stream (code {code})")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt TIFF LZW stream (code {code})")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1  # early change: one code before the GIF variant
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 LZW encode (MSB-first, early code-width change). Emits
    Clear, codes, EOI; resets the table before it would need a 13th
    bit, mirroring ``_tiff_lzw_decode``'s growth rule exactly."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # early change: the decoder widens after adding entry
        # 2^width - 2, which corresponds to our next_code hitting
        # 2^width (the encoder table leads the decoder's by one)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # reset before a 13-bit code is needed
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
        # The decoder appends a table entry on this final data code
        # and widens when its table hits 2^width - 1 (511/1023/2047)
        # BEFORE reading the next code — so when the final code lands
        # exactly on that boundary (e.g. bytes(range(254))), EOI must
        # be emitted at the post-growth width or a strict decoder
        # runs out of bits before finding it.
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _predictor2_apply(arr: np.ndarray) -> np.ndarray:
    """TIFF Predictor=2 horizontal differencing (per row, per channel,
    mod 256) — applied before compression."""
    d = arr.astype(np.int16)
    d[:, 1:] = d[:, 1:] - d[:, :-1]
    return (d % 256).astype(np.uint8)


def _predictor2_undo(arr: np.ndarray) -> np.ndarray:
    """Invert Predictor=2: cumulative sum across the row, mod 256."""
    return np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)


def encode_tiff(
    arr: np.ndarray,
    packbits: bool = False,
    *,
    lzw: bool = False,
    predictor: int = 1,
    jpeg_quality: int | None = None,
) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 as little-endian
    single-strip TIFF (Compression=1, 32773 PackBits, 5 LZW —
    optionally with Predictor=2 horizontal differencing, the pairing
    real LZW TIFFs almost always use — or 7 new-style JPEG when
    ``jpeg_quality`` is set: the strip is a complete baseline-JPEG
    stream from the in-repo codec, Photometric 6/YCbCr for RGB per
    TIFF-EP)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected (h,w) gray or (h,w,3) RGB, got {arr.shape}")
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    if predictor == 2:
        raw = _predictor2_apply(arr.reshape(h, w, spp)).tobytes()
    elif predictor == 1:
        raw = arr.tobytes()
    else:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if jpeg_quality is not None:
        from auto_ts_spark.operators.jpeg import encode_jpeg

        if predictor != 1:
            raise ValueError("predictor does not apply to JPEG strips")
        strip = encode_jpeg(arr, quality=jpeg_quality)
        comp = 7
    elif lzw:
        strip = _tiff_lzw_encode(raw)
        comp = 5
    elif packbits:
        out = bytearray()
        # per TIFF spec PackBits compresses each ROW independently
        row_len = w * spp
        for r in range(h):
            row = raw[r * row_len : (r + 1) * row_len]
            i = 0
            while i < len(row):
                run = 1
                while (
                    i + run < len(row) and run < 128 and row[i + run] == row[i]
                ):
                    run += 1
                if run >= 2:
                    out.append(257 - run)  # -(run-1) two's complement
                    out.append(row[i])
                    i += run
                    continue
                lit_start = i
                i += 1
                while i < len(row) and i - lit_start < 128:
                    if i + 1 < len(row) and row[i] == row[i + 1]:
                        break
                    i += 1
                out.append(i - lit_start - 1)
                out += row[lit_start:i]
        strip = bytes(out)
        comp = 32773
    else:
        strip = raw
        comp = 1
    # layout: header(8) + strip + IFD
    strip_off = 8
    strip_len = len(strip)  # true byte count, before the alignment pad
    ifd_off = strip_off + strip_len
    if ifd_off % 2:
        strip += b"\x00"  # word-align the IFD; NOT part of the strip
        ifd_off += 1
    entries = [
        (256, 3, 1, w),  # ImageWidth SHORT
        (257, 3, 1, h),  # ImageLength
        (259, 3, 1, comp),  # Compression
        # Photometric: gray / RGB; JPEG color strips are YCbCr (TIFF-EP)
        (262, 3, 1, 1 if gray else (6 if comp == 7 else 2)),
        (273, 4, 1, strip_off),  # StripOffsets
        (277, 3, 1, spp),  # SamplesPerPixel
        (278, 3, 1, h),  # RowsPerStrip (single strip)
        (279, 4, 1, strip_len),  # StripByteCounts (excludes the pad byte)
        (284, 3, 1, 1),  # PlanarConfiguration: chunky
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))  # Predictor: horizontal differencing
    bps_off = None
    if gray:
        entries.insert(3, (258, 3, 1, 8))  # BitsPerSample
    else:
        # 3 SHORTs do not fit inline — value is an offset
        bps_off = ifd_off + 2 + 12 * (len(entries) + 1) + 4
        entries.insert(3, (258, 3, 3, bps_off))
    entries.sort()
    ifd = struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHI", tag, typ, cnt)
        ifd += struct.pack("<I", val) if typ == 4 or cnt > 1 else struct.pack("<HH", val, 0)
    ifd += struct.pack("<I", 0)  # next IFD
    if bps_off is not None:
        ifd += struct.pack("<HHH", 8, 8, 8)
    return b"II*\x00" + struct.pack("<I", ifd_off) + strip + ifd


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                raise ValueError("truncated PackBits stream")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("truncated PackBits stream")
    return bytes(out[:expected])


def _merge_jpeg_tables(tables: bytes, strip: bytes) -> bytes:
    """TIFF-EP tag 347: JPEGTables holds an abbreviated JPEG stream
    (SOI + DQT/DHT/etc + EOI) shared by all strips; each strip is a
    JPEG stream that may omit those tables. Merge = strip's SOI, then
    the tables' segments, then the rest of the strip."""
    if len(tables) < 4 or tables[:2] != b"\xff\xd8":
        raise ValueError("bad JPEGTables payload")
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    if strip[:2] != b"\xff\xd8":
        raise ValueError("JPEG strip missing SOI")
    return b"\xff\xd8" + body + strip[2:]


def decode_tiff(content: bytes) -> np.ndarray:
    """Decode baseline TIFF (8-bit gray/RGB, chunky, strips,
    Compression 1, 32773/PackBits, 5/LZW with Predictor 1|2, or
    7/new-style JPEG — each strip a JPEG stream for the in-repo codec,
    shared tables via tag 347 honored — either byte order) to
    (h, w, 1|3) uint8. Raises ValueError on old-style-JPEG (6),
    planar, tiled or non-8-bit variants — those route to the
    documented fake."""
    if content[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF payload")
    e = "<" if content[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", content, 4)
    (n_entries,) = struct.unpack_from(e + "H", content, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(e + "HHI", content, off)
        (val,) = struct.unpack_from(e + "I", content, off + 8)
        if typ == 3 and cnt == 1:  # SHORT packed in the first 2 bytes
            (val,) = struct.unpack_from(e + "H", content, off + 8)
        tags[tag] = (typ, cnt, val)

    def arr_vals(tag: int, default=None) -> list[int]:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, cnt, val = tags[tag]
        unit = {3: ("H", 2), 4: ("I", 4)}.get(typ)
        if unit is None:
            raise ValueError(f"unsupported TIFF tag type {typ}")
        if cnt == 1:
            return [val]
        fmt, sz = unit
        if cnt * sz <= 4:
            base = None  # inline — re-read from the entry itself
            for k in range(n_entries):
                off = ifd_off + 2 + 12 * k
                t, _ty, _c = struct.unpack_from(e + "HHI", content, off)
                if t == tag:
                    base = off + 8
                    break
            assert base is not None
        else:
            base = val
        return [
            struct.unpack_from(e + fmt, content, base + i * sz)[0]
            for i in range(cnt)
        ]

    w = arr_vals(256)[0]
    h = arr_vals(257)[0]
    comp = arr_vals(259, [1])[0]
    spp = arr_vals(277, [1])[0]
    bps = arr_vals(258, [8])
    planar = arr_vals(284, [1])[0]
    if comp not in (1, 32773, 5, 7):
        raise ValueError(
            f"unsupported TIFF compression {comp} (none/PackBits/LZW/JPEG only)"
        )
    predictor = arr_vals(317, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if planar != 1 or spp not in (1, 3) or any(b != 8 for b in bps):
        raise ValueError(
            f"unsupported TIFF layout (spp={spp}, bps={bps}, planar={planar})"
        )
    if 322 in tags or 323 in tags:
        raise ValueError("unsupported tiled TIFF")
    offsets = arr_vals(273)
    counts = arr_vals(279)
    rows_per_strip = arr_vals(278, [h])[0]
    if comp == 7:
        from auto_ts_spark.operators.jpeg import decode_jpeg

        tables = None
        if 347 in tags:  # JPEGTables: UNDEFINED bytes at the offset
            typ, cnt, val = tags[347]
            if typ != 7:
                raise ValueError(f"bad JPEGTables tag type {typ}")
            tables = content[val : val + cnt] if cnt > 4 else None
        pieces = []
        for si, (so, sc) in enumerate(zip(offsets, counts)):
            strip = content[so : so + sc]
            stream = (
                _merge_jpeg_tables(tables, strip) if tables else strip
            )
            img = decode_jpeg(stream)
            if img.ndim == 2:
                img = img[:, :, None]
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            pieces.append(img[:nrows, :w, :])
        out = np.concatenate(pieces, axis=0)
        if out.shape != (h, w, spp):
            raise ValueError(
                f"JPEG strips decode to {out.shape}, expected {(h, w, spp)}"
            )
        return out.copy()
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = content[so : so + sc]
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        if comp == 32773:
            raw += _packbits_decode(strip, nrows * w * spp)
        elif comp == 5:
            # clamp like _packbits_decode: the final LZW table entry is
            # emitted whole, so a noncompliant writer whose last entry
            # crosses the strip's pixel boundary would otherwise shift
            # every later strip's rows
            n_bytes = nrows * w * spp
            raw += _tiff_lzw_decode(strip, n_bytes)[:n_bytes]
        else:
            raw += strip[: nrows * w * spp]
    if len(raw) < h * w * spp:
        raise ValueError("truncated TIFF pixel data")
    img = np.frombuffer(bytes(raw), np.uint8, count=h * w * spp).reshape(
        h, w, spp
    )
    if predictor == 2:
        # differencing is per row, so undoing it after strip assembly
        # is equivalent to undoing it per strip
        return _predictor2_undo(img)
    return img.copy()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w), (h, w, 3) or (h, w, 4) uint8 array as a real
    PNG (8-bit gray/RGB/RGBA, zlib DEFLATE, filter 0 rows, no
    interlace) — pure stdlib ``zlib`` + ``struct``, no codec library."""
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"expected (h,w[,3|4]) uint8 array, got {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 (None) prepended to each raw scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * channels)], axis=1
    ).tobytes()
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Undo per-scanline PNG filtering (types 0-4: None/Sub/Up/
    Average/Paeth). Up is vectorized; Sub/Average/Paeth are inherently
    sequential along the row (each byte depends on the reconstructed
    left neighbor), so those rows run a plain byte loop — this executes
    inside an Arrow-batched mapInPandas worker, bounded per image."""
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
            out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        elif ftype == 2:  # Up
            out[y] = (
                np.frombuffer(bytes(row), dtype=np.uint8).astype(np.int16)
                + prev
            ).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
            out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype} at row {y}")
    return out.reshape(h, w, channels)


def decode_png(content: bytes) -> np.ndarray:
    """Decode a PNG (8-bit depth, gray/gray+alpha/RGB/RGBA, no
    interlace) to an (h, w, channels) uint8 array — pure stdlib zlib
    inflate + per-row unfilter, all five standard filters. Palette
    (color type 3), 16-bit depth and Adam7 interlace raise (out of
    scope; the honest-fallback path in :func:`decode_image` never
    routes those here because the magic check passes — so they
    surface as a clear error, not silent garbage)."""
    import zlib

    if content[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_MAGIC)
    w = h = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(content):
        (size,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + size]
        pos += 12 + size  # length + type + body + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace}) — 8-bit gray/RGB/RGBA only"
                )
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * channels):
        raise ValueError("PNG raster size mismatch")
    return _png_unfilter(raw, h, w, channels)


def encode_avi_raw(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a RIFF AVI with
    uncompressed DIB video ('DIB ' handler, BI_RGB 24-bit, '00db'
    frame chunks) — the one video container a bare struct+numpy stack
    can write, by the same public-spec route as BMP/WAV. Every player
    opens it; no codec library involved."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {frames.shape}")
    n, h, w = frames.shape[:3]
    stride = (w * 3 + 3) // 4 * 4
    frame_bytes = []
    for f in frames:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        frame_bytes.append(rows.tobytes())
    sz_img = h * stride

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        sz_img * fps,
        0,
        0x10,  # AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE-ish flags benign
        n,
        0,
        1,
        sz_img,
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, sz_img, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, sz_img, 2835, 2835, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


_MJPG_FOURCC = 0x47504A4D  # 'MJPG' as the strf biCompression dword


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10, quality: int = 90) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as a RIFF AVI with
    Motion-JPEG video ('MJPG' handler; each '00dc' chunk is a complete
    baseline JPEG from ``operators/jpeg.py``) — the most common
    compressed AVI flavor cameras emit, now writable because the JPEG
    codec is in-repo. Lossy but bit-deterministic."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {frames.shape}")
    n, h, w = frames.shape[:3]
    payloads = [encode_jpeg(f, quality) for f in frames]
    sz_img = max(len(p) for p in payloads)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1), sz_img * fps, 0, 0x10, n, 0, 1, sz_img,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, sz_img, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, _MJPG_FOURCC, sz_img, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_raw(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF AVI with uncompressed DIB frames OR Motion-JPEG
    ('MJPG' — each frame chunk is a baseline/progressive JPEG, decoded
    by the in-repo codec, r11) to ((n, h, w, 3) RGB uint8, fps). Walks
    the chunk tree, so extra chunks (idx1, INFO, JUNK) are tolerated;
    other compressed fourccs raise (no codec libraries — the
    honest-fallback contract)."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    rate, scale = 0, 1
    mjpeg = False
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal w, h, rate, scale, mjpeg
        pos = start
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", content, pos)
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)
            elif cid == b"strh":
                fcc_type, handler = content[body_at : body_at + 4], content[body_at + 4 : body_at + 8]
                if fcc_type == b"vids":
                    if handler in (b"MJPG", b"mjpg"):
                        mjpeg = True
                    elif handler not in (b"DIB ", b"\x00\x00\x00\x00", b"RGB "):
                        raise ValueError(
                            f"unsupported AVI video handler {handler!r} — "
                            "uncompressed DIB or MJPG only (no codec libraries)"
                        )
                    _f, _p, _l, _i, scale, rate = struct.unpack_from(
                        "<IHHIII", content, body_at + 8
                    )
            elif cid == b"strf" and w is None:
                _sz, w, h, _pl, bpp, comp = struct.unpack_from(
                    "<IiiHHI", content, body_at
                )
                if comp == _MJPG_FOURCC:
                    mjpeg = True
                elif bpp != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported AVI frame format (bpp={bpp}, compression={comp})"
                    )
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("AVI frame chunk before strf header")
                if mjpeg:
                    img = decode_jpeg(bytes(content[body_at : body_at + size]))
                    if img.ndim == 2:
                        img = np.repeat(img[:, :, None], 3, axis=2)
                    frames.append(img)
                else:
                    stride = (w * 3 + 3) // 4 * 4
                    rows = np.frombuffer(
                        content, np.uint8, count=h * stride, offset=body_at
                    )
                    frames.append(
                        rows.reshape(h, stride)[:, : w * 3]
                        .reshape(h, w, 3)[::-1, :, ::-1]
                    )
            pos = body_at + size + (size & 1)

    walk(12, 8 + struct.unpack_from("<I", content, 4)[0])
    if not frames:
        raise ValueError("AVI contains no video frames")
    fps = int(round(rate / scale)) if scale and rate else 0
    return np.stack(frames), fps


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a float waveform in [-1, 1] as RIFF WAV, PCM 16-bit
    mono."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    data = np.round(pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """(mu_law, a_law) byte → linear int16 decode tables, from the
    public G.711 formulas (the same expansion every telephony stack
    uses)."""
    mu = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        mu[b] = -mag if sign else mag
    al = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        if exp:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        else:
            mag = (mant << 4) + 8
        al[b] = -mag if sign else mag
    return mu, al


_MU_LAW, _A_LAW = _g711_tables()


def encode_wav_g711(samples: np.ndarray, sample_rate: int, law: str = "mu") -> bytes:
    """Encode a float waveform in [-1, 1] as RIFF WAV with G.711
    companding (format 7 μ-law or 6 A-law, 8-bit mono) — the classic
    telephony WAV flavor. Encoding picks, per sample, the code whose
    table expansion is nearest (exact inverse of the decode table)."""
    table = _MU_LAW if law == "mu" else _A_LAW
    fmt_code = 7 if law == "mu" else 6
    pcm = np.round(
        np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0
    ).astype(np.int32)
    order = np.argsort(table.astype(np.int32))
    sorted_vals = table.astype(np.int32)[order]
    idx = np.searchsorted(sorted_vals, pcm)
    idx = np.clip(idx, 1, len(sorted_vals) - 1)
    left = sorted_vals[idx - 1]
    right = sorted_vals[idx]
    pick = np.where(pcm - left <= right - pcm, idx - 1, idx)
    data = order[pick].astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", fmt_code, 1, sample_rate, sample_rate, 1, 8)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


# IMA/DVI4 ADPCM (WAV format tag 17, r12): the public IMA reference
# algorithm — 4-bit codes, 89-step quantizer table, per-block header
# carrying (predictor, step index) so every block decodes
# independently. Pure table+numpy; no codec library involved.
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
        19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
        50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
        337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
        876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
        5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
        15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(
    nibbles: np.ndarray, pred: int, index: int
) -> np.ndarray:
    """Expand a run of 4-bit IMA codes given the block-header state.
    The recurrence is inherently sequential — per-sample loop, but
    blocks are a few hundred samples and independent."""
    out = np.empty(len(nibbles), dtype=np.int16)
    steps = _IMA_STEP_TABLE
    for i, code in enumerate(nibbles):
        step = int(steps[index])
        diff = step >> 3
        if code & 4:
            diff += step
        if code & 2:
            diff += step >> 1
        if code & 1:
            diff += step >> 2
        pred = pred - diff if code & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        out[i] = pred
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[code & 7])))
    return out


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 256
) -> bytes:
    """Encode a float waveform in [-1, 1] as mono RIFF WAV with
    IMA/DVI4 ADPCM (format 17, 4 bits/sample) — the classic voice
    flavor real corpora contain after G.711. Each ``block_align``-byte
    block is independently seeded by a (predictor, step-index) header;
    a ``fact`` chunk records the true sample count so partial final
    blocks round-trip exactly."""
    pcm = np.round(
        np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0
    ).astype(np.int32)
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    steps = _IMA_STEP_TABLE
    data = bytearray()
    index = 0
    for b0 in range(0, len(pcm), spb):
        blk = pcm[b0 : b0 + spb]
        pred = int(blk[0])
        # seed the block's step index with the best match for the
        # first real delta — a common writer strategy; any seed is
        # decodable since the header carries it
        if len(blk) > 1:
            target = abs(int(blk[1]) - pred)
            index = int(np.searchsorted(steps, max(target, 7)))
            index = max(0, min(88, index))
        data += struct.pack("<hBB", pred, index, 0)
        nib = []
        for s in blk[1:]:
            delta = int(s) - pred
            code = 8 if delta < 0 else 0
            delta = abs(delta)
            step = int(steps[index])
            if delta >= step:
                code |= 4
                delta -= step
            if delta >= step >> 1:
                code |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                code |= 1
            # reconstruct exactly as the decoder will, so the encoder
            # predictor tracks the decoder's
            diff = step >> 3
            if code & 4:
                diff += step
            if code & 2:
                diff += step >> 1
            if code & 1:
                diff += step >> 2
            pred = pred - diff if code & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(_IMA_INDEX_TABLE[code & 7])))
            nib.append(code)
        if len(nib) % 2:
            nib.append(0)
        packed = bytes(
            nib[i] | (nib[i + 1] << 4) for i in range(0, len(nib), 2)
        )
        # pad the final block to block_align (decoders read fixed blocks)
        data += packed + b"\x00" * (block_align - 4 - len(packed))
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 17, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", len(pcm))
    return (
        struct.pack(
            "<4sI4s",
            b"RIFF",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data),
            b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"fact", len(fact))
        + fact
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF WAV (PCM 8/16-bit, G.711 μ-law/A-law — r11, or
    mono IMA/DVI4 ADPCM format 17 — r12; PCM/G.711 with any channel
    count → channel 0) to (float32 waveform in [-1, 1], sample_rate).
    Walks the chunk list, so extra chunks (LIST, fact, …) are
    tolerated."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_samples = 12, None, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format == 1 and bits == 16:
        raw = np.frombuffer(data, dtype="<i2")
        wave = raw.astype(np.float32) / 32767.0
    elif audio_format == 1 and bits == 8:  # 8-bit PCM unsigned, midpoint 128
        raw = np.frombuffer(data, dtype=np.uint8)
        wave = (raw.astype(np.float32) - 128.0) / 127.0
    elif audio_format in (6, 7) and bits == 8:  # G.711 A-law / mu-law
        table = _A_LAW if audio_format == 6 else _MU_LAW
        raw = np.frombuffer(data, dtype=np.uint8)
        wave = table[raw].astype(np.float32) / 32767.0
    elif audio_format == 17 and bits == 4:  # IMA/DVI4 ADPCM (r12)
        if n_channels != 1:
            raise ValueError("only mono IMA ADPCM is supported")
        if block_align < 5:
            raise ValueError(f"bad IMA ADPCM block align {block_align}")
        pieces = []
        for b0 in range(0, len(data), block_align):
            blk = data[b0 : b0 + block_align]
            if len(blk) < 4:
                break
            pred, index, _res = struct.unpack_from("<hBB", blk, 0)
            if index > 88:
                raise ValueError(f"bad IMA ADPCM step index {index}")
            packed = np.frombuffer(blk[4:], dtype=np.uint8)
            nibbles = np.empty(len(packed) * 2, dtype=np.uint8)
            nibbles[0::2] = packed & 0x0F  # low nibble first, per spec
            nibbles[1::2] = packed >> 4
            pieces.append(np.int16(pred))
            pieces.append(_ima_decode_nibbles(nibbles, int(pred), int(index)))
        pcm16 = (
            np.concatenate(
                [np.atleast_1d(np.asarray(p, dtype=np.int16)) for p in pieces]
            )
            if pieces
            else np.empty(0, dtype=np.int16)
        )
        if fact_samples is not None:
            pcm16 = pcm16[:fact_samples]  # drop final-block padding
        wave = pcm16.astype(np.float32) / 32767.0
        n_channels = 1
    else:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if n_channels > 1:
        wave = wave[::n_channels]
    return wave, sample_rate


# --------------------------------------------------------------------------
# Sniffing decoders: real containers decode for real; compressed
# formats (absent codecs) fall back to the declared deterministic fake.
# --------------------------------------------------------------------------


def _fake_decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """FALLBACK for image containers the pure-numpy stack cannot parse
    (arithmetic-coded JPEG, LOSSY WebP, old-style JPEG-in-TIFF, …):
    deterministic fake seeded by the content bytes. A real deployment
    replaces this body with PIL/turbojpeg; BMP/PPM/PNG/baseline-TIFF
    and sequential (8/12-bit)/progressive/lossless JPEG payloads never
    reach it (see ``decode_image``)."""
    seed = int.from_bytes(content[:4], "little") if content else 0
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def _fake_decode_audio(content: bytes, n_samples: int) -> np.ndarray:
    """FALLBACK for compressed audio (MP3/AAC — no codec libs in this
    container): deterministic fake waveform seeded by the content
    bytes. WAV payloads never reach it (see ``decode_audio``)."""
    seed = int.from_bytes(content[:4], "little") if content else 0
    rng = np.random.RandomState(seed)
    return (rng.rand(n_samples).astype(np.float32) * 2.0) - 1.0


def decode_image(content: bytes, width: int = 0, height: int = 0) -> np.ndarray:
    """Decode an image payload to (h, w, 3) RGB uint8: real parse for
    BMP/PPM/PNG/baseline-TIFF and sequential (8/12-bit), progressive
    or lossless JPEG (magic-sniffed; gray broadcasts to 3 channels and
    RGBA drops alpha), deterministic fake (at the metadata dimensions)
    for anything else — including arithmetic-coded JPEG, which
    ``decode_jpeg`` rejects with a clear error rather than
    mis-decoding."""
    if content:
        if content[:2] == b"BM":
            return decode_bmp(content)
        if content[:2] == b"P6":
            return decode_ppm(content)
        if content[:4] in (b"II*\x00", b"MM\x00*"):
            try:
                img = decode_tiff(content)
            except (ValueError, IndexError, struct.error):
                # old-style-JPEG(6)/tiled/planar/truncated TIFF, or a
                # corrupt LZW/JPEG strip: fake
                return _fake_decode_image(content, width, height)
            if img.shape[2] == 1:
                return np.repeat(img, 3, axis=2)
            return img
        if content[: len(_PNG_MAGIC)] == _PNG_MAGIC:
            img = decode_png(content)
            if img.shape[2] == 1:  # gray
                return np.repeat(img, 3, axis=2)
            if img.shape[2] == 2:  # gray+alpha
                return np.repeat(img[:, :, :1], 3, axis=2)
            return img[:, :, :3]  # RGB / RGBA minus alpha
        if content[:2] == b"\xff\xd8":
            try:
                img = decode_jpeg(content)
            except (ValueError, IndexError, struct.error):
                # arithmetic-coded/hierarchical (ValueError) or a
                # truncated/corrupt stream (IndexError/struct.error):
                # documented fake, not garbage or a dead executor
                return _fake_decode_image(content, width, height)
            if img.ndim == 2:  # grayscale JPEG
                return np.repeat(img[:, :, None], 3, axis=2)
            return img
        if content[:4] == b"GIF8":
            try:
                return decode_gif(content)
            except (ValueError, IndexError, struct.error):
                # truncated/corrupt GIF container or LZW stream: one
                # bad payload must route to the documented fake, not
                # kill the whole mapInPandas job
                return _fake_decode_image(content, width, height)
        if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
            from auto_ts_spark.operators.webp import decode_webp

            try:
                return decode_webp(content)[:, :, :3]
            except (ValueError, IndexError, struct.error):
                # lossy VP8 (needs a DSP codec) or a truncated/corrupt
                # VP8L stream: documented fake, not a dead executor
                return _fake_decode_image(content, width, height)
    return _fake_decode_image(content, width, height)


def decode_audio(content: bytes, n_samples: int = 0) -> np.ndarray:
    """Decode an audio payload to a float32 waveform: real parse for
    RIFF/WAV, deterministic fake (metadata-sized) for anything else."""
    if content and content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)[0]
    return _fake_decode_audio(content, n_samples)


def _fake_decode_video(
    content: bytes, width: int, height: int, n_frames: int
) -> np.ndarray:
    """FALLBACK for codec-bearing video containers (MP4/MKV/WebM —
    no codec libs in this container): deterministic fake frames seeded
    by the content bytes; raw-DIB AVI payloads never reach it."""
    seed = int.from_bytes(content[:4], "little") if content else 0
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(max(n_frames, 1), height, width, 3), dtype=np.uint8)


def decode_video(
    content: bytes, width: int = 0, height: int = 0, n_frames: int = 1
) -> np.ndarray:
    """Decode a video payload to (n, h, w, 3) RGB uint8: real parse
    for RIFF/AVI (uncompressed DIB or Motion-JPEG frames), MP4 with a
    Motion-JPEG track (ISO BMFF box + sample-table walk,
    operators/mp4.py — r13) and Matroska with a V_MJPEG track (EBML
    walk, operators/mkv.py — r13); deterministic fake (at the
    metadata dimensions) for containers whose codec genuinely needs a
    codec library (H.264/VP9/AV1 …)."""
    if content and content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        try:
            return decode_avi_raw(content)[0]
        except (ValueError, IndexError, struct.error):
            # a truncated/corrupt '00dc' MJPEG frame chunk can raise
            # struct.error/IndexError from decode_jpeg — route one bad
            # payload to the fake instead of killing the mapInPandas job
            return _fake_decode_video(content, width, height, n_frames)
    if content and len(content) >= 12 and content[4:8] == b"ftyp":
        from auto_ts_spark.operators.mp4 import decode_mp4_mjpeg

        try:
            return decode_mp4_mjpeg(content)[0]
        except (ValueError, IndexError, struct.error):
            # non-MJPEG codec (avc1/hvc1/…) or a malformed sample
            # table: documented fake, not a dead executor
            return _fake_decode_video(content, width, height, n_frames)
    if content and content[:4] == b"\x1aE\xdf\xa3":
        from auto_ts_spark.operators.mkv import decode_mkv_mjpeg

        try:
            return decode_mkv_mjpeg(content)[0]
        except (ValueError, IndexError, struct.error):
            # non-V_MJPEG codec or laced/corrupt blocks: documented fake
            return _fake_decode_video(content, width, height, n_frames)
    return _fake_decode_video(content, width, height, n_frames)


# --------------------------------------------------------------------------
# Synthetic media + the mapInPandas operators.
# --------------------------------------------------------------------------


def _image_array(i: int) -> np.ndarray:
    """Deterministic per-item test image: (48 + i%6, 64 + i%8, 3)
    uint8, seeded independently per item so tests and the embedded
    VALUES oracle can regenerate any row without replaying the whole
    sequence."""
    w, h = 64 + i % 8, 48 + i % 6
    return np.random.RandomState(7000 + i).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def _video_frames(i: int) -> np.ndarray:
    """Deterministic per-item test clip: 3 + i%3 frames of
    (24 + i%4, 32 + i%4, 3) noise, independently seeded like
    ``_image_array`` so the VALUES oracle can regenerate any row."""
    n, h, w = 3 + i % 3, 24 + i % 4, 32 + i % 4
    return np.random.RandomState(9000 + i).randint(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )


def _audio_wave(i: int, n: int, sample_rate: int) -> np.ndarray:
    """Deterministic per-item test waveform: a 220+10i Hz half-scale
    sine."""
    t = np.arange(n, dtype=np.float64) / sample_rate
    return 0.5 * np.sin(2.0 * np.pi * (220.0 + 10.0 * i) * t)


def _image_payload(i: int) -> tuple[bytes, str]:
    """Deterministic container schedule for synthetic test images:
    i%3==2 → PNG (lossless), i%6==1 → PROGRESSIVE JPEG (SOF2 spectral
    selection + successive approximation, r11), i%6==4 → baseline JPEG
    4:2:0 (REAL lossy codecs — both Huffman decode paths value-checked
    by the embedded oracle), i%6==3 → GIF (palette-limited fixture —
    GIF is palette-exact), i%12==0 → PackBits TIFF (r11), i%24==6 →
    LZW+Predictor-2 TIFF (r12) — both lossless, so swapping these rows
    off BMP left the oracle constants unchanged — i%48==42 →
    JPEG-in-TIFF (r12; Compression=7, the strip is an in-repo-codec
    baseline JPEG stream — lossy but bit-deterministic like the bare
    JPEG rows), i%48∈{2,26} → WebP LOSSLESS (r13, operators/webp.py —
    row 2: subtract-green + predictor-7 + 5-bit color cache; row 26:
    uniform color transform; both off PNG rows, so the constants are
    again unchanged), i%48∈{14,38} → LOSSLESS JPEG (r13, SOF3 Annex-H
    predictive — row 14: predictor 7 + restart rows; row 38:
    predictor 4; off PNG rows, bit-exact, constants unchanged),
    i%48==22 → 12-BIT extended-sequential JPEG (r13, SOF1 Pq=1 —
    lossy but bit-deterministic; this row's constants were
    regenerated), else BMP. The multimodal VALUES oracle in
    ``oracles.py`` is generated from ``decode_image`` over these exact
    payloads — regenerate it if this schedule or any codec changes."""
    if i % 6 == 3:
        w, h = 64 + i % 8, 48 + i % 6
        rs = np.random.RandomState(7000 + i)
        pal = rs.randint(0, 256, size=(64, 3)).astype(np.uint8)
        arr = pal[rs.randint(0, 64, size=(h, w))]
        return encode_gif(arr), "image/gif"
    arr = _image_array(i)
    if i % 48 == 2:
        # WebP lossless (r13, operators/webp.py): subtract-green +
        # predictor + color-cache chain — lossless, so taking this row
        # off PNG left the oracle constants unchanged
        from auto_ts_spark.operators.webp import encode_webp

        return (
            encode_webp(
                arr, palette="never", subtract_green=True,
                predictor=7, cache_bits=5,
            ),
            "image/webp",
        )
    if i % 48 == 26:
        # WebP lossless, second chain: uniform color transform +
        # literal/run coding (also off a PNG row, constants unchanged)
        from auto_ts_spark.operators.webp import encode_webp

        return (
            encode_webp(arr, palette="never", color_transform=(19, 242, 11)),
            "image/webp",
        )
    if i % 48 == 14:
        # lossless JPEG (r13, SOF3): predictor 7 + restart markers —
        # bit-exact, so taking this row off PNG left the constants
        # unchanged
        return (
            encode_jpeg_lossless(arr, predictor=7, restart_rows=16),
            "image/jpeg",
        )
    if i % 48 == 38:
        # lossless JPEG, second chain: predictor 4 (Ra+Rb-Rc), single
        # scan (also off a PNG row, constants unchanged)
        return encode_jpeg_lossless(arr, predictor=4), "image/jpeg"
    if i % 3 == 2:
        return encode_png(arr), "image/png"
    if i % 3 == 1:
        if i % 48 == 22:
            # 12-bit extended-sequential (r13, SOF1): lossy but
            # bit-deterministic — this row's oracle constants were
            # regenerated from the actual decode
            return (
                encode_jpeg(arr, quality=92, subsampling="4:2:0", precision=12),
                "image/jpeg",
            )
        if i % 6 == 4:
            return encode_jpeg(arr, quality=92, subsampling="4:2:0"), "image/jpeg"
        return encode_jpeg_progressive(arr, quality=92), "image/jpeg"
    if i % 12 == 0:
        return encode_tiff(arr, packbits=True), "image/tiff"
    if i % 24 == 6:
        return encode_tiff(arr, lzw=True, predictor=2), "image/tiff"
    if i % 48 == 42:
        return encode_tiff(arr, jpeg_quality=90), "image/tiff"
    return encode_bmp(arr), "image/bmp"


def synthetic_media(spark, n: int = 64, kind: str = "image", real: bool = True) -> DataFrame:
    """Deterministic media table for tests. With ``real=True`` (the
    default) the payloads are genuine containers — BMP, PNG and
    baseline JPEG for images (see ``_image_payload`` for the schedule;
    JPEG rows are lossy but bit-deterministic, so the value-checked
    feature oracle covers the real Huffman+IDCT decode), WAV (PCM16)
    for audio, raw-DIB AVI for video (r10) — so the decode path under
    test is the real parser for every modality. ``real=False`` emits
    opaque seeded bytes with a fake mime, exercising the no-codec
    fallback."""
    rng = np.random.RandomState(7)
    rows = []
    for i in range(n):
        w, h = 64 + i % 8, 48 + i % 6
        duration_ms, sample_rate = 1000 + i, 16000
        if not real:
            payload, mime = rng.bytes(256), f"{kind}/fake"
        elif kind == "video":
            # i%4==1 rows are Motion-JPEG (r11; lossy but
            # bit-deterministic — the video VALUES oracle regenerated
            # over the actual decode): container rotates AVI (i%8==1)
            # / MP4 (i%16==5) / MKV (i%16==13) — all three wrap the
            # SAME quality-92 10-fps JPEG payloads, so the decoded
            # frames and the oracle constants are identical across
            # containers (r13). The rest are raw-DIB AVI.
            if i % 4 == 1:
                if i % 16 == 5:
                    from auto_ts_spark.operators.mp4 import encode_mp4_mjpeg

                    payload = encode_mp4_mjpeg(_video_frames(i), fps=10, quality=92)
                    mime = "video/mp4"
                elif i % 16 == 13:
                    from auto_ts_spark.operators.mkv import encode_mkv_mjpeg

                    payload = encode_mkv_mjpeg(_video_frames(i), fps=10, quality=92)
                    mime = "video/x-matroska"
                else:
                    payload = encode_avi_mjpeg(_video_frames(i), fps=10, quality=92)
                    mime = "video/avi"
            else:
                payload = encode_avi_raw(_video_frames(i), fps=10)
                mime = "video/avi"
            duration_ms = (3 + i % 3) * 100  # n_frames / 10 fps
        elif kind == "image":
            payload, mime = _image_payload(i)
        elif kind == "audio":
            n_samp = sample_rate * duration_ms // 1000
            payload = encode_wav(_audio_wave(i, n_samp, sample_rate), sample_rate)
            mime = "audio/wav"
        else:
            raise ValueError(f"unknown kind {kind!r}")
        rows.append((i, kind, bytearray(payload), mime, (w, h, duration_ms, sample_rate)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_and_featurize(df: DataFrame) -> DataFrame:
    """image → per-channel mean/std features via mapInPandas.

    Output: (media_id, mean_r, mean_g, mean_b, std_gray). The Arrow
    batch iterator bounds Python memory regardless of partition size;
    BMP/PPM decode is a real numpy parse, anything else hits the
    documented fake fallback at the metadata dimensions.
    """
    out_schema = (
        "media_id long, mean_r double, mean_g double, mean_b double, std_gray double"
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                img = decode_image(
                    row.content, meta["width"], meta["height"]
                ).astype(np.float64)
                feats.append(
                    (
                        row.media_id,
                        img[:, :, 0].mean(),
                        img[:, :, 1].mean(),
                        img[:, :, 2].mean(),
                        img.mean(axis=2).std(),
                    )
                )
            yield pd.DataFrame(
                feats, columns=["media_id", "mean_r", "mean_g", "mean_b", "std_gray"]
            )

    return df.select("media_id", "content", "meta").mapInPandas(worker, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real nearest-neighbor resize: decode (BMP/PPM real, fallback
    fake), index-sample to (height, width), re-encode as BMP. Binary-in
    / binary-out mapInPandas shape; output payloads are themselves
    decodable BMPs."""
    out_schema = "media_id long, content binary, width int, height int"

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                img = decode_image(row.content, meta["width"], meta["height"])
                ys = (np.arange(height) * img.shape[0]) // height
                xs = (np.arange(width) * img.shape[1]) // width
                resized = img[ys][:, xs]
                rows.append((row.media_id, encode_bmp(resized), width, height))
            yield pd.DataFrame(rows, columns=["media_id", "content", "width", "height"])

    return df.select("media_id", "content", "meta").mapInPandas(worker, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampler: emits (media_id, frame_idx, ts_ms) rows
    from duration metadata — metadata-only, never decodes bytes, so
    the scan prunes the content column entirely. This is the 100 TB
    plan for sampling DECISIONS; ``video_frame_features`` below is the
    byte-touching path for rows that survive the decision."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.col("meta.duration_ms") / every_ms).cast("int"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
        )
    )


def video_frame_features(df: DataFrame, *, every_n: int = 2) -> DataFrame:
    """video → per-sampled-frame features via mapInPandas:
    (media_id, frame_idx, mean_gray, std_gray) for every ``every_n``-th
    frame. Raw-DIB/MJPEG AVI, MJPEG-MP4 and MJPEG-MKV payloads decode
    for real (struct+numpy walks, r13); containers whose codec needs a
    codec library hit the documented deterministic fake at the
    metadata dimensions. Binary-in/rows-out, Arrow-batched
    — the 100 TB shape for frame-level featurization after
    ``frame_sample`` has pruned the candidate set."""
    out_schema = "media_id long, frame_idx int, mean_gray double, std_gray double"

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                frames = decode_video(
                    row.content, meta["width"], meta["height"],
                    max(int(meta["duration_ms"] // 100), 1),
                )
                for idx in range(0, frames.shape[0], every_n):
                    g = frames[idx].astype(np.float64).mean(axis=2)
                    rows.append((row.media_id, idx, g.mean(), g.std()))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "mean_gray", "std_gray"]
            )

    return df.select("media_id", "content", "meta").mapInPandas(worker, out_schema)


def audio_spectral_features(df: DataFrame) -> DataFrame:
    """audio → spectral features via mapInPandas + numpy rFFT:
    (media_id, spectral_centroid_hz, rolloff85_hz, flatness).
    Centroid = POWER-weighted mean frequency over a Hann-windowed
    frame — a pure tone's centroid IS its frequency (the oracle
    exploits that; amplitude weighting without a window drifts
    hundreds of Hz off a pure tone from spectral-leakage tails —
    measured before choosing this form); rolloff85 = the frequency
    below which 85% of spectral energy lies; flatness = geometric/
    arithmetic mean ratio of the power spectrum (1 = white noise,
    →0 = tonal). WAV payloads parse for real; compressed audio hits
    the documented metadata-sized fake."""
    out_schema = (
        "media_id long, spectral_centroid_hz double, rolloff85_hz double, "
        "flatness double"
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                sr = int(meta["sample_rate"] or 16000)
                hint = max(int(meta["duration_ms"] * sr / 1000), 1)
                wave = decode_audio(row.content, hint).astype(np.float64)
                spec = np.abs(np.fft.rfft(wave * np.hanning(len(wave))))
                freqs = np.fft.rfftfreq(len(wave), d=1.0 / sr)
                energy = spec**2
                total = energy.sum()
                if total <= 0:
                    rows.append((row.media_id, 0.0, 0.0, 0.0))
                    continue
                centroid = float((freqs * energy).sum() / total)
                cum = np.cumsum(energy)
                rolloff = float(freqs[np.searchsorted(cum, 0.85 * cum[-1])])
                power = energy + 1e-20  # log of exact zeros
                flatness = float(
                    np.exp(np.mean(np.log(power))) / np.mean(power)
                )
                rows.append((row.media_id, centroid, rolloff, flatness))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "spectral_centroid_hz",
                    "rolloff85_hz",
                    "flatness",
                ],
            )

    return df.select("media_id", "content", "meta").mapInPandas(worker, out_schema)


def audio_features(df: DataFrame, *, frame_ms: int = 250) -> DataFrame:
    """audio → (media_id, rms, zero_crossing_rate, n_samples) via
    mapInPandas. WAV payloads are really parsed (sample count and rate
    from the file itself); compressed formats fall back to the
    metadata-sized fake."""
    out_schema = "media_id long, rms double, zero_crossing_rate double, n_samples long"

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                hint = max(int(meta["duration_ms"] * meta["sample_rate"] / 1000), 1)
                wave = decode_audio(row.content, hint)
                zc = float(np.mean(np.abs(np.diff(np.signbit(wave).astype(np.int8)))))
                rows.append(
                    (row.media_id, float(np.sqrt((wave**2).mean())), zc, len(wave))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "rms", "zero_crossing_rate", "n_samples"],
            )

    return df.select("media_id", "content", "meta").mapInPandas(worker, out_schema)
