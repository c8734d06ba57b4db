"""Guard for the embedded multimodal VALUES oracle: the entry's
_SQL_MULTIMODAL constants must equal what the REAL decode paths
(operators/multimodal.py ``_image_payload`` schedule — BMP, PNG,
baseline JPEG via operators/jpeg.py, and GIF via operators/gif.py —
decoded by ``decode_image``) actually produce — if the image
generator, container schedule, or any codec changes, this test points
at the oracle to regenerate.

Regeneration snippet (prints the VALUES rows):

    from auto_ts_spark.operators.multimodal import (
        _image_payload, decode_image)
    for i in range(48):  # the full 48-row schedule cycle (r12)
        img = decode_image(_image_payload(i)[0]).astype(np.float64)
        print("  (%d, %s, %s, %s, %s)," % (
            i, _r6(img[:,:,0].mean()), _r6(img[:,:,1].mean()),
            _r6(img[:,:,2].mean()), _r6(img.mean(axis=2).std())))

(use this module's ``_r6``, NOT Python ``round`` — Spark rounds
HALF_UP.)
"""

import re
import struct

import numpy as np
import pytest

from auto_ts_spark.operators.multimodal import (
    _fake_decode_image,
    _image_array,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def _r6(x: float) -> float:
    """Spark F.round semantics — BigDecimal.valueOf(double).setScale(6,
    HALF_UP) — NOT Python's banker's round (they differ at exact
    0.5e-6 ties, e.g. media_id=8's 128.5778125)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _expected_rows():
    from auto_ts_spark.operators.multimodal import _image_payload, decode_image

    rows = []
    for i in range(48):  # r12: the oracle covers the full 48-row schedule
        img = decode_image(_image_payload(i)[0]).astype(np.float64)
        rows.append(
            (
                i,
                _r6(img[:, :, 0].mean()),
                _r6(img[:, :, 1].mean()),
                _r6(img[:, :, 2].mean()),
                _r6(img.mean(axis=2).std()),
            )
        )
    return rows


def test_multimodal_oracle_constants_match_real_decode():
    from auto_ts_spark import oracles as ORC

    values = re.findall(
        r"\(\s*(\d+),\s*([\d.]+),\s*([\d.]+),\s*([\d.]+),\s*([\d.]+)\s*\)",
        ORC._SQL_MULTIMODAL,
    )
    got = [(int(a), float(b), float(c), float(d), float(e)) for a, b, c, d, e in values]
    assert got == _expected_rows(), (
        "embedded _SQL_MULTIMODAL oracle is stale — regenerate with the "
        "snippet in this file's docstring"
    )


# --------------------------------------------------------------------------
# Real-codec unit tests: exact pixels/samples, not just shapes.
# --------------------------------------------------------------------------


def test_bmp_roundtrip_exact_with_row_padding():
    # widths 2..5 cover every 4-byte row-pad remainder (6,9,12,15 bytes/row)
    for w in (2, 3, 4, 5):
        arr = np.arange(w * 3 * 3, dtype=np.uint8).reshape(3, w, 3)
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr), w


def test_bmp_known_pixels():
    # 2x2 image with distinct corner colors survives BGR/bottom-up round-trip
    arr = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    payload = encode_bmp(arr)
    assert payload[:2] == b"BM"
    out = decode_bmp(payload)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 1].tolist() == [10, 20, 30]


def test_ppm_roundtrip_and_comment_header():
    arr = np.random.RandomState(3).randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    # hand-built header with a comment line still parses
    payload = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    out = decode_ppm(payload)
    assert out.shape == (1, 2, 3) and out[0, 1].tolist() == [4, 5, 6]


def test_wav_square_wave_exact_features():
    # full-scale square wave: rms == 1.0 (16-bit exact), one sign flip
    # per half-period
    sq = np.tile(np.array([1.0] * 4 + [-1.0] * 4), 100)
    wave, sr = decode_wav(encode_wav(sq, 8000))
    assert sr == 8000 and len(wave) == 800
    assert abs(float(np.sqrt((wave**2).mean())) - 1.0) < 1e-9
    flips = int(np.abs(np.diff(np.signbit(wave).astype(np.int8))).sum())
    assert flips == 199  # 100 periods x 2 edges - 1 boundary


def test_wav_chunk_walk_tolerates_extra_chunks():
    import struct

    body = encode_wav(np.array([0.0, 0.5, -0.5]), 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    spliced = body[:fmt_end] + extra + body[fmt_end:]
    wave, sr = decode_wav(spliced)
    assert sr == 16000 and len(wave) == 3
    assert abs(wave[1] - 0.5) < 1e-3


def test_fake_fallback_still_reached_for_opaque_bytes():
    from auto_ts_spark.operators.multimodal import decode_image

    blob = b"\x89PNG-not-really" + bytes(64)
    out = decode_image(blob, 8, 6)
    assert out.shape == (6, 8, 3)
    assert np.array_equal(out, _fake_decode_image(blob, 8, 6))


# ---------------------------------------------------------------- PNG (r10)


def test_png_roundtrip_rgb_rgba_gray():
    from auto_ts_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(23, 31, 3), dtype=np.uint8)
    rgba = rng.randint(0, 256, size=(10, 7, 4), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)
    assert np.array_equal(decode_png(encode_png(gray)), gray[:, :, None])


def test_png_all_five_filters_decode_exactly():
    """Hand-filter a known image with every scanline filter type (the
    encoder only writes filter 0, so this is the only way to exercise
    Sub/Up/Average/Paeth) and assert the decoder reconstructs the
    byte-exact original."""
    import zlib

    from auto_ts_spark.operators.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        decode_png,
    )

    rng = np.random.RandomState(4)
    h, w, ch = 5, 6, 3
    img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    flat = img.reshape(h, w * ch).astype(np.int16)
    bpp = ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int16)
        raw.append(ftype)
        for x in range(w * ch):
            left = int(cur[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                v = int(cur[x])
            elif ftype == 1:
                v = int(cur[x]) - left
            elif ftype == 2:
                v = int(cur[x]) - up
            elif ftype == 3:
                v = int(cur[x]) - ((left + up) >> 1)
            else:
                v = int(cur[x]) - paeth(left, up, ul)
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_png_unsupported_variants_raise():
    import zlib

    from auto_ts_spark.operators.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    # 16-bit depth / palette / interlace are declared out of scope
    for depth, color, interlace in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        png = (
            _PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 13))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported PNG"):
            decode_png(png)
    with pytest.raises(ValueError, match="expected"):
        encode_png(np.zeros((4, 4, 2), dtype=np.uint8))


def test_decode_image_routes_png_and_normalizes_channels():
    from auto_ts_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.RandomState(12)
    rgb = rng.randint(0, 256, size=(8, 9, 3), dtype=np.uint8)
    rgba = rng.randint(0, 256, size=(8, 9, 4), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(8, 9), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)
    assert np.array_equal(decode_image(encode_png(rgba)), rgba[:, :, :3])
    got = decode_image(encode_png(gray))
    assert got.shape == (8, 9, 3) and np.array_equal(got[:, :, 0], gray)


def test_synthetic_media_mixes_codec_rows(spark):
    """The synthetic image schedule covers every real image codec —
    PackBits TIFF (i%12==0, r11), LZW+Predictor-2 TIFF (i%24==6, r12),
    JPEG-in-TIFF (i%48==42, r12), BMP (i%48==18), progressive JPEG
    (i%6==1, r11), baseline JPEG 4:2:0 (i%6==4), 12-bit JPEG
    (i%48==22, r13), lossless JPEG (i%48∈{14,38}, r13 — two
    predictors, one with restart markers), WebP lossless (i%48∈{2,26},
    r13 — two different transform chains), PNG (i%3==2 otherwise),
    GIF (i%6==3, palette-limited) — so the 48-row multimodal feature
    oracle value-checks every real decode path
    (TIFF/BMP/PNG/GIF/WebP-lossless/lossless-JPEG exact; DCT JPEG
    lossy but deterministic, its oracle rows generated from the
    actual decode)."""
    from auto_ts_spark.operators.multimodal import synthetic_media

    media = synthetic_media(spark, 43).select("media_id", "mime").collect()
    mimes = {r["media_id"]: r["mime"] for r in media}
    assert mimes[2] == "image/webp" and mimes[26] == "image/webp"
    assert mimes[14] == "image/jpeg" and mimes[38] == "image/jpeg"  # lossless
    assert mimes[22] == "image/jpeg"  # 12-bit SOF1
    assert mimes[5] == "image/png" and mimes[8] == "image/png"
    assert mimes[1] == "image/jpeg" and mimes[4] == "image/jpeg"
    assert mimes[3] == "image/gif" and mimes[9] == "image/gif"
    assert mimes[0] == "image/tiff" and mimes[12] == "image/tiff"
    assert mimes[6] == "image/tiff"  # the r12 LZW row
    assert mimes[42] == "image/tiff"  # the r12 JPEG-in-TIFF row
    assert mimes[18] == "image/bmp"


# ---------------------------------------------------------------- AVI (r10)


def test_avi_raw_roundtrip_exact():
    from auto_ts_spark.operators.multimodal import decode_avi_raw, encode_avi_raw

    rng = np.random.RandomState(5)
    # odd width exercises the 4-byte row stride pad
    frames = rng.randint(0, 256, (6, 13, 21, 3), np.uint8)
    out, fps = decode_avi_raw(encode_avi_raw(frames, fps=12))
    assert fps == 12
    assert np.array_equal(out, frames)


def test_avi_chunk_walk_tolerates_junk_and_rejects_codecs():
    from auto_ts_spark.operators.multimodal import decode_avi_raw, encode_avi_raw

    frames = np.random.RandomState(6).randint(0, 256, (2, 8, 8, 3), np.uint8)
    payload = encode_avi_raw(frames, fps=10)
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    spliced = payload[:12] + junk + payload[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, _ = decode_avi_raw(spliced)
    assert np.array_equal(out, frames)
    bad = bytearray(payload)
    i = bad.find(b"vids") + 4
    bad[i : i + 4] = b"H264"  # genuinely codec-bearing (mjpg is real now, r11)
    with pytest.raises(ValueError, match="handler"):
        decode_avi_raw(bytes(bad))


def test_decode_video_dispatch_and_fallback():
    from auto_ts_spark.operators.multimodal import (
        _fake_decode_video,
        decode_video,
        encode_avi_raw,
    )

    frames = np.random.RandomState(7).randint(0, 256, (3, 10, 12, 3), np.uint8)
    assert np.array_equal(decode_video(encode_avi_raw(frames)), frames)
    blob = b"\x00\x00\x00\x18ftypmp42" + bytes(64)  # MP4-shaped
    out = decode_video(blob, 12, 10, 3)
    assert out.shape == (3, 10, 12, 3)
    assert np.array_equal(out, _fake_decode_video(blob, 12, 10, 3))
    # WAV payloads must not be mistaken for AVI (both RIFF)
    from auto_ts_spark.operators.multimodal import decode_audio, encode_wav

    wav = encode_wav(np.zeros(10), 8000)
    out = decode_video(wav, 4, 4, 2)
    assert out.shape == (2, 4, 4, 3)  # fake at metadata dims, no crash


# ---------------------------------------------------------------- GIF (r10)


# ---------------------------------------------------------------- TIFF (r11)


def test_tiff_roundtrip_none_and_packbits():
    from auto_ts_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.RandomState(2)
    for img in (
        rng.randint(0, 256, (17, 29, 3), np.uint8),
        rng.randint(0, 256, (11, 13), np.uint8),  # gray
        np.full((9, 9, 3), 42, np.uint8),  # long runs
        np.arange(128 * 3, dtype=np.uint8).reshape(1, 128, 3),  # 128-literal edge
    ):
        exp = img[..., None] if img.ndim == 2 else img
        for pb in (False, True):
            assert np.array_equal(decode_tiff(encode_tiff(img, pb)), exp), (
                img.shape,
                pb,
            )


def test_tiff_big_endian_and_multistrip():
    """decode_tiff must handle MM byte order and multi-strip layout —
    build both by hand since encode_tiff writes single-strip II."""
    img = np.random.RandomState(4).randint(0, 256, (8, 6, 3), np.uint8)
    h, w = 8, 6
    raw = img.tobytes()
    rows_per_strip = 3
    strips = [
        raw[r * w * 3 : min(r + rows_per_strip, h) * w * 3]
        for r in range(0, h, rows_per_strip)
    ]
    strip_off0 = 8
    offs, offsets = strip_off0, []
    for s in strips:
        offsets.append(offs)
        offs += len(s)
    ifd_off = offs + (offs % 2)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (259, 3, 1, 1), (262, 3, 1, 2),
        (277, 3, 1, 3), (278, 3, 1, rows_per_strip), (284, 3, 1, 1),
    ]
    n = len(entries) + 3  # + BitsPerSample, StripOffsets, StripByteCounts
    extra = ifd_off + 2 + 12 * n + 4
    entries.append((258, 3, 3, extra))
    entries.append((273, 4, len(strips), extra + 6))
    entries.append((279, 4, len(strips), extra + 6 + 4 * len(strips)))
    entries.sort()
    ifd = struct.pack(">H", n)
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(">HHI", tag, typ, cnt)
        ifd += (
            struct.pack(">HH", val, 0)
            if typ == 3 and cnt == 1
            else struct.pack(">I", val)
        )
    ifd += struct.pack(">I", 0)
    ifd += struct.pack(">HHH", 8, 8, 8)
    for o in offsets:
        ifd += struct.pack(">I", o)
    for s in strips:
        ifd += struct.pack(">I", len(s))
    payload = b"MM\x00*" + struct.pack(">I", ifd_off)
    body = b"".join(strips)
    payload += body + b"\x00" * (ifd_off - 8 - len(body)) + ifd
    from auto_ts_spark.operators.multimodal import decode_tiff

    assert np.array_equal(decode_tiff(payload), img)


def test_tiff_unsupported_variants_route_to_fake():
    from auto_ts_spark.operators.multimodal import (
        _fake_decode_image,
        decode_image,
        decode_tiff,
        encode_tiff,
    )

    img = np.random.RandomState(5).randint(0, 256, (6, 7, 3), np.uint8)
    payload = bytearray(encode_tiff(img))
    # flip Compression (tag 259) to 6 (OLD-style JPEG — deprecated by
    # TIFF-EP and still unsupported now that r12 decodes new-style 7)
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        (tag,) = struct.unpack_from("<H", payload, off)
        if tag == 259:
            struct.pack_into("<H", payload, off + 8, 6)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(payload))
    out = decode_image(bytes(payload), 7, 6)
    assert np.array_equal(out, _fake_decode_image(bytes(payload), 7, 6))


# ------------------------------------------------------ LZW TIFF (r12)


class _MsbWriter:
    """Minimal MSB-first bit packer, independent of the encoder under
    test, for hand-building known LZW streams."""

    def __init__(self):
        self.acc, self.nbits, self.out = 0, 0, bytearray()

    def put(self, code, width):
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def bytes(self):
        if self.nbits:
            return bytes(self.out) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.out)


def test_tiff_lzw_known_stream_msb_first():
    """Hand-packed [Clear, 'A', 'B', 'C', EOI] at width 9, MSB-first —
    pins the bit order (the GIF variant packs LSB-first and would
    misread this stream)."""
    from auto_ts_spark.operators.multimodal import _tiff_lzw_decode

    w = _MsbWriter()
    for code in (256, 65, 66, 67, 257):
        w.put(code, 9)
    assert _tiff_lzw_decode(w.bytes(), 3) == b"ABC"


def test_tiff_lzw_early_code_width_change():
    """256 distinct literals after Clear: the decoder's table reaches
    511 entries after the 254th code, so codes 255-256 arrive at width
    10 ALREADY — one code earlier than the GIF growth rule. A decoder
    with GIF timing reads the 255th code at 9 bits and derails."""
    from auto_ts_spark.operators.multimodal import _tiff_lzw_decode

    w = _MsbWriter()
    w.put(256, 9)  # Clear
    for k in range(1, 257):  # literals 0..255
        w.put(k - 1, 9 if k <= 254 else 10)
    w.put(257, 10)  # EOI
    assert _tiff_lzw_decode(w.bytes(), 256) == bytes(range(256))


def test_tiff_lzw_roundtrip_growth_and_reset():
    """Raw LZW round-trips across every code-width boundary and the
    4094-entry table reset (100k of noise guarantees both)."""
    from auto_ts_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rs = np.random.RandomState(11)
    runs = bytes(
        rs.choice([0, 1, 2, 255], size=50_000, p=[0.4, 0.3, 0.2, 0.1]).astype(
            np.uint8
        )
    )
    noise = rs.randint(0, 256, 100_000, np.uint8).tobytes()
    for data in (b"", b"A", b"AAAAAA", runs, noise):
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_tiff_lzw_container_roundtrip_and_predictor():
    from auto_ts_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.RandomState(12)
    for img in (
        rng.randint(0, 256, (17, 29, 3), np.uint8),
        rng.randint(0, 256, (11, 13), np.uint8),  # gray
        np.full((9, 9, 3), 42, np.uint8),  # long runs
    ):
        exp = img[..., None] if img.ndim == 2 else img
        for pred in (1, 2):
            t = encode_tiff(img, lzw=True, predictor=pred)
            assert np.array_equal(decode_tiff(t), exp), (img.shape, pred)
    # predictor 2 exists because it pays on smooth data: a horizontal
    # gradient must compress dramatically better with differencing
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 4)).reshape(64, 1024)
    plain = len(encode_tiff(grad, lzw=True, predictor=1))
    diffed = len(encode_tiff(grad, lzw=True, predictor=2))
    assert diffed < plain // 4


def test_tiff_lzw_eoi_emitted_at_post_growth_width():
    """A spec decoder appends a table entry on the FINAL data code and
    widens when its table hits 2^width-1 before reading the next code
    — so when the final code lands exactly on that boundary, EOI must
    be written at the grown width. bytes(range(254)) is the minimal
    failing input pre-fix: the strict reader below (which refuses to
    stop before an explicit EOI) ran out of bits. Sweep the
    neighborhood of every 9->10 boundary plus a 10->11 case."""
    from auto_ts_spark.operators.multimodal import _tiff_lzw_encode

    def strict_decode(blob: bytes) -> bytes:
        # independent spec decoder: MSB-first, early change, REQUIRES
        # an explicit EOI inside the bitstream
        pos = 0

        def read(width: int) -> int:
            nonlocal pos
            if pos + width > len(blob) * 8:
                raise EOFError("bitstream exhausted before EOI")
            v = 0
            for _ in range(width):
                v = (v << 1) | ((blob[pos >> 3] >> (7 - (pos & 7))) & 1)
                pos += 1
            return v

        out = bytearray()
        table: list[bytes] = []
        width, prev = 9, b""
        while True:
            code = read(width)
            if code == 257:
                return bytes(out)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width, prev = 9, b""
                continue
            if code < len(table) and table[code]:
                entry = table[code]
            elif code == len(table) and prev:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad code {code}")
            if prev:
                table.append(prev + entry[:1])
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1

    rs = np.random.RandomState(29)
    cases = [bytes(range(n)) for n in range(250, 257)]
    cases.append(rs.randint(0, 256, 1000, np.uint8).tobytes())  # 10->11
    cases += [b"", b"A", b"ABAB"]
    for data in cases:
        assert strict_decode(_tiff_lzw_encode(data)) == data


def test_tiff_lzw_overshooting_strip_is_clamped():
    """A noncompliant writer whose strip's final LZW table entry
    crosses the strip's pixel-byte boundary must not shift the next
    strip's rows: decode clamps each strip to nrows*w*spp bytes, like
    PackBits."""
    from auto_ts_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_tiff,
    )

    row0_over = b"ABABABABAB"  # encodes 10 bytes; strip declares 5
    assert len(_tiff_lzw_decode(_tiff_lzw_encode(row0_over), 5)) == 7
    row1 = bytes(range(10, 15))
    strips = [_tiff_lzw_encode(row0_over), _tiff_lzw_encode(row1)]
    offs, cur = [], 8
    for s in strips:
        offs.append(cur)
        cur += len(s)
    ifd_off = cur + (cur % 2)
    entries = [
        (256, 3, 1, 5), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 5),
        (262, 3, 1, 1), (277, 3, 1, 1), (278, 3, 1, 1), (284, 3, 1, 1),
    ]
    n = len(entries) + 2
    extra = ifd_off + 2 + 12 * n + 4
    entries.append((273, 4, 2, extra))
    entries.append((279, 4, 2, extra + 8))
    entries.sort()
    ifd = struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHI", tag, typ, cnt)
        ifd += (
            struct.pack("<I", val)
            if (typ == 4 or cnt > 1)
            else struct.pack("<HH", val, 0)
        )
    ifd += struct.pack("<I", 0)
    for o in offs:
        ifd += struct.pack("<I", o)
    for s in strips:
        ifd += struct.pack("<I", len(s))
    body = b"".join(strips)
    payload = (
        b"II*\x00" + struct.pack("<I", ifd_off)
        + body + b"\x00" * (ifd_off - 8 - len(body)) + ifd
    )
    got = decode_tiff(payload)
    exp = np.array([list(b"ABABA"), list(row1)], dtype=np.uint8)[..., None]
    assert np.array_equal(got, exp)


def test_tiff_lzw_corrupt_stream_routes_to_fake():
    from auto_ts_spark.operators.multimodal import (
        _fake_decode_image,
        decode_image,
        encode_tiff,
    )

    img = np.random.RandomState(13).randint(0, 256, (6, 7, 3), np.uint8)
    payload = bytearray(encode_tiff(img, lzw=True))
    # stomp the LZW strip (bytes 8..) with 0xFF — code 511 right after
    # Clear is out of table range and must fault cleanly to the fake
    for i in range(8, 24):
        payload[i] = 0xFF
    out = decode_image(bytes(payload), 7, 6)
    assert np.array_equal(out, _fake_decode_image(bytes(payload), 7, 6))


# -------------------------------------------------- JPEG-in-TIFF (r12)


def test_jpeg_in_tiff_matches_bare_jpeg_exactly():
    """Compression=7 strips must decode to EXACTLY the pixels the bare
    in-repo JPEG codec produces for the same stream — the container
    adds plumbing, never pixels."""
    from auto_ts_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from auto_ts_spark.operators.multimodal import decode_tiff, encode_tiff

    for shape, q in [((48, 64, 3), 92), ((33, 47, 3), 85), ((24, 32), 90)]:
        img = np.random.RandomState(sum(shape)).randint(
            0, 256, size=shape, dtype=np.uint8
        )
        got = decode_tiff(encode_tiff(img, jpeg_quality=q))
        ref = decode_jpeg(encode_jpeg(img, quality=q))
        if ref.ndim == 2:
            ref = ref[:, :, None]
        assert np.array_equal(got, ref), (shape, q)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG stream into (JPEGTables payload, abbreviated
    stream) by moving DQT/DHT segments out — builds the tag-347 shape
    real TIFF-EP writers emit."""
    pos, tables, rest = 2, b"", b""
    while pos < len(stream):
        marker = stream[pos + 1]
        if marker in (0xD9, 0xDA):
            rest += stream[pos:]
            break
        seglen = struct.unpack(">H", stream[pos + 2 : pos + 4])[0]
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        pos += 2 + seglen
    return b"\xff\xd8" + tables + b"\xff\xd9", b"\xff\xd8" + rest


def test_jpeg_in_tiff_multistrip_with_jpegtables_tag():
    """Hand-built big-feature fixture: two strips whose DQT/DHT live in
    a shared JPEGTables (347) payload; decode must merge the tables
    into each strip and reproduce the full-stream pixels."""
    from auto_ts_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from auto_ts_spark.operators.multimodal import decode_tiff

    img = np.random.RandomState(9).randint(0, 256, (32, 48, 3), np.uint8)
    full = [encode_jpeg(img[0:16], quality=90), encode_jpeg(img[16:32], quality=90)]
    tables0, ab0 = _split_jpeg_tables(full[0])
    tables1, ab1 = _split_jpeg_tables(full[1])
    assert tables0 == tables1  # same quality -> shared tables
    strips = [ab0, ab1]
    offs, cur = [], 8
    for s in strips:
        offs.append(cur)
        cur += len(s)
    tab_off = cur
    cur += len(tables0)
    pad = b"\x00" if cur % 2 else b""
    ifd_off = cur + len(pad)
    entries = [
        (256, 3, 1, 48), (257, 3, 1, 32), (259, 3, 1, 7), (262, 3, 1, 6),
        (277, 3, 1, 3), (278, 3, 1, 16), (284, 3, 1, 1),
        (347, 7, len(tables0), tab_off),
    ]
    n = len(entries) + 3
    extra = ifd_off + 2 + 12 * n + 4
    entries.append((258, 3, 3, extra))
    entries.append((273, 4, 2, extra + 6))
    entries.append((279, 4, 2, extra + 6 + 8))
    entries.sort()
    ifd = struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHI", tag, typ, cnt)
        ifd += (
            struct.pack("<I", val)
            if (typ in (4, 7) or cnt > 1)
            else struct.pack("<HH", val, 0)
        )
    ifd += struct.pack("<I", 0)
    ifd += struct.pack("<HHH", 8, 8, 8)
    for o in offs:
        ifd += struct.pack("<I", o)
    for s in strips:
        ifd += struct.pack("<I", len(s))
    payload = (
        b"II*\x00" + struct.pack("<I", ifd_off)
        + b"".join(strips) + tables0 + pad + ifd
    )
    got = decode_tiff(payload)
    ref = np.concatenate([decode_jpeg(s) for s in full], axis=0)
    assert np.array_equal(got, ref)


def test_jpeg_in_tiff_corrupt_strip_routes_to_fake():
    from auto_ts_spark.operators.multimodal import (
        _fake_decode_image,
        decode_image,
        encode_tiff,
    )

    img = np.random.RandomState(6).randint(0, 256, (16, 16, 3), np.uint8)
    payload = bytearray(encode_tiff(img, jpeg_quality=90))
    for i in range(8, 24):  # stomp the strip's SOI/DQT region
        payload[i] = 0x00
    out = decode_image(bytes(payload), 16, 16)
    assert np.array_equal(out, _fake_decode_image(bytes(payload), 16, 16))


# ---------------------------------------------------- IMA ADPCM (r12)


def test_ima_adpcm_known_nibble_expansion():
    """Hand-computed expansion of four codes from (pred=0, index=0),
    straight from the public IMA reference math — pins the step/index
    tables and the diff formula independently of the encoder."""
    from auto_ts_spark.operators.multimodal import _ima_decode_nibbles

    # step=7: code 0 -> diff = 7>>3 = 0, pred 0,  index -1 -> 0
    # step=7: code 7 -> diff = 0+7+3+1 = 11, pred 11, index 0+8 = 8
    # step=16 (idx 8): code 8 -> diff = 16>>3 = 2, pred 9, index 8-1=7
    # step=14 (idx 7): code 15 -> diff = 1+14+7+3 = 25, pred -16, idx 15
    out = _ima_decode_nibbles(
        np.array([0, 7, 8, 15], dtype=np.uint8), 0, 0
    )
    assert list(out) == [0, 11, 9, -16]


def test_ima_adpcm_roundtrip_snr_and_partial_block():
    from auto_ts_spark.operators.multimodal import (
        _audio_wave,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    sr = 16000
    for i in (0, 5):
        w = _audio_wave(i, sr, sr)
        dec, rate = decode_wav(encode_wav_ima_adpcm(w, sr))
        assert rate == sr and len(dec) == len(w)
        err = dec - w.astype(np.float32)
        snr = 10 * np.log10(np.mean(w**2) / np.mean(err**2))
        assert snr > 35.0, snr  # 4-bit ADPCM holds a tone above ~40 dB
    # partial final block: the fact chunk trims the padding exactly
    w = _audio_wave(2, 1234, sr)
    dec, _ = decode_wav(encode_wav_ima_adpcm(w, sr))
    assert len(dec) == 1234
    # single-sample edge: just the block-header predictor
    one, _ = decode_wav(encode_wav_ima_adpcm(np.array([0.5]), 8000))
    assert len(one) == 1 and abs(one[0] - 0.5) < 1e-3


def test_ima_adpcm_unsupported_variants_raise():
    from auto_ts_spark.operators.multimodal import (
        _audio_wave,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    enc = bytearray(encode_wav_ima_adpcm(_audio_wave(0, 600, 8000), 8000))
    struct.pack_into("<H", enc, 12 + 8 + 2, 2)  # nChannels -> 2
    with pytest.raises(ValueError, match="mono"):
        decode_wav(bytes(enc))


def test_ima_adpcm_block_independence():
    """Each block's header reseeds (predictor, index), so decoding a
    stream whose first block is stomped still recovers the second
    block exactly — the property that makes huge voice files seekable."""
    from auto_ts_spark.operators.multimodal import (
        _audio_wave,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    sr = 8000
    spb = (256 - 4) * 2 + 1  # samples per 256-byte block
    w = _audio_wave(3, 2 * spb, sr)
    enc = encode_wav_ima_adpcm(w, sr)
    clean, _ = decode_wav(enc)
    corrupt = bytearray(enc)
    data_off = enc.index(b"data") + 8
    for k in range(data_off + 4, data_off + 40):  # stomp block 0 codes
        corrupt[k] ^= 0xFF
    dirty, _ = decode_wav(bytes(corrupt))
    assert np.array_equal(dirty[spb:], clean[spb:])
    assert not np.array_equal(dirty[:spb], clean[:spb])


# ------------------------------------------------------- MJPEG + G.711 (r11)


def test_mjpeg_avi_roundtrip_and_dispatch():
    from auto_ts_spark.operators.multimodal import (
        decode_avi_raw,
        decode_video,
        encode_avi_mjpeg,
    )

    rng = np.random.RandomState(6)
    frames = rng.randint(0, 256, (4, 24, 32, 3), np.uint8)
    dec, fps = decode_avi_raw(encode_avi_mjpeg(frames, fps=10, quality=95))
    assert dec.shape == frames.shape and fps == 10
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 40  # lossy
    # flat frames survive JPEG exactly
    flat = np.full((3, 16, 16, 3), 90, np.uint8)
    decf, _ = decode_avi_raw(encode_avi_mjpeg(flat, quality=90))
    assert np.array_equal(decf, flat)
    # and the sniffing dispatch routes MJPG AVIs to the real decoder
    assert decode_video(encode_avi_mjpeg(frames)).shape == frames.shape


def test_g711_wav_decode():
    from auto_ts_spark.operators.multimodal import (
        decode_wav,
        encode_wav_g711,
    )

    t = np.arange(16000) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    for law in ("mu", "a"):
        w, sr = decode_wav(encode_wav_g711(x, 16000, law))
        assert sr == 16000 and len(w) == len(x)
        # 8-bit companding: ~38 dB SNR on a half-scale tone
        snr = 10 * np.log10(np.mean(x**2) / np.mean((w - x) ** 2))
        assert snr > 30, (law, snr)
        assert np.abs(w - x).max() < 0.02, law


def test_gif_roundtrip_palette_sizes_and_interlace():
    from auto_ts_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(1)
    for n_colors in (2, 16, 250):
        pal = np.unique(rng.randint(0, 256, (n_colors, 3), np.uint8), axis=0)
        img = pal[rng.randint(0, len(pal), (23, 14))]
        assert np.array_equal(decode_gif(encode_gif(img)), img), n_colors
        assert np.array_equal(
            decode_gif(encode_gif(img, interlace=True)), img
        ), n_colors


def test_truncated_gif_routes_to_fake_not_crash():
    """One corrupt GIF payload in a corpus must route decode_image to
    the deterministic fake (like the JPEG branch), not raise out of
    the mapInPandas job — truncated sub-block chains raise IndexError
    from the container walk, which the dispatch now catches."""
    from auto_ts_spark.operators.gif import encode_gif
    from auto_ts_spark.operators.multimodal import decode_image

    img = np.random.RandomState(7).randint(0, 256, (9, 11, 3), np.uint8)
    payload = encode_gif(img)
    for cut in (len(payload) // 3, len(payload) - 2, 14):
        out = decode_image(payload[:cut], 11, 9)
        assert out.shape == (9, 11, 3)  # fake at metadata dims, no crash


def test_gif_lzw_table_reset_on_large_image():
    from auto_ts_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    img = pal[rng.randint(0, 16, (300, 300))]  # 90k px → >4096 LZW codes
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif89a_extension_blocks_skipped():
    from auto_ts_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    img = pal[rng.randint(0, 16, (8, 8))]
    payload = bytearray(encode_gif(img))
    payload[:6] = b"GIF89a"
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # graphic control extension
    i = 13 + 16 * 3  # header + 16-entry GCT (padded to 16)
    spliced = bytes(payload[:i]) + gce + bytes(payload[i:])
    assert np.array_equal(decode_gif(spliced), img)


def test_gif_palette_exact_guard_and_dispatch():
    from auto_ts_spark.operators.gif import encode_gif
    from auto_ts_spark.operators.multimodal import decode_image

    img = np.random.RandomState(4).randint(0, 256, (30, 30, 3), np.uint8)
    with pytest.raises(ValueError, match="palette-exact"):
        encode_gif(img)  # ~900 distinct colors
    pal = np.random.RandomState(5).randint(0, 256, (8, 3), np.uint8)
    small = pal[np.random.RandomState(6).randint(0, 8, (6, 10))]
    assert np.array_equal(decode_image(encode_gif(small)), small)


# ------------------------------------------------------- audio spectral (r10)


def test_spectral_centroid_is_the_tone_frequency():
    """The self-evidence check behind the audio_spectral_features
    oracle: a Hann-windowed power-spectral centroid of a pure sine
    equals its frequency (to micro-Hz), for every synthetic payload."""
    from auto_ts_spark.operators.multimodal import (
        _audio_wave,
        decode_audio,
        encode_wav,
    )

    for i in (0, 3, 7, 15):
        sr = 16000
        n = sr * (1000 + i) // 1000
        wave = decode_audio(encode_wav(_audio_wave(i, n, sr), sr), n).astype(
            np.float64
        )
        spec = np.abs(np.fft.rfft(wave * np.hanning(len(wave))))
        freqs = np.fft.rfftfreq(len(wave), d=1.0 / sr)
        energy = spec**2
        centroid = (freqs * energy).sum() / energy.sum()
        assert abs(centroid - (220.0 + 10.0 * i)) < 1e-3, (i, centroid)


def test_spectral_flatness_separates_tone_from_noise():
    from auto_ts_spark.operators.multimodal import audio_spectral_features  # noqa: F401 (import path)
    import numpy as np

    sr = 8000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t)
    noise = np.random.RandomState(0).uniform(-1, 1, sr)

    def flat(w):
        spec = np.abs(np.fft.rfft(w * np.hanning(len(w))))
        p = spec**2 + 1e-20
        return float(np.exp(np.mean(np.log(p))) / np.mean(p))

    assert flat(tone) < 1e-6
    assert flat(noise) > 0.5
