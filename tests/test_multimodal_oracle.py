"""Guard for the embedded multimodal VALUES oracle: the entry's
_SQL_MULTIMODAL constants must equal what the REAL BMP decode path
(operators/multimodal.py: encode_bmp over _image_array, decoded by
decode_bmp) actually produces — if the image generator or codec
changes, this test points at the oracle to regenerate.

Regeneration snippet (prints the VALUES rows):

    from auto_ts_spark.operators.multimodal import (
        _image_array, encode_bmp, decode_bmp)
    for i in range(32):
        img = decode_bmp(encode_bmp(_image_array(i))).astype(np.float64)
        print("  (%d, %s, %s, %s, %s)," % (
            i, _r6(img[:,:,0].mean()), _r6(img[:,:,1].mean()),
            _r6(img[:,:,2].mean()), _r6(img.mean(axis=2).std())))

(use this module's ``_r6``, NOT Python ``round`` — Spark rounds
HALF_UP.)
"""

import re

import numpy as np

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
    rows = []
    for i in range(32):
        img = decode_bmp(encode_bmp(_image_array(i))).astype(np.float64)
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
