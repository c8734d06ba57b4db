"""Lossless (SOF3, T.81 Annex H) and 12-bit extended-sequential
(SOF1) JPEG codec tests (r13).

Round-trip exactness for lossless across every predictor, restart
intervals, point transforms, and the full 2..16-bit precision range
(incl. the modulo-65536 / SSSS=16 wrap case that only exists at
16-bit); bounded error for the lossy 12-bit DCT path; header-level
conformance (SOF marker choice, 16-bit DQT, the reserved all-ones
Huffman code); and honest rejection of the modes we do not decode.
"""

import struct

import numpy as np
import pytest

from auto_ts_spark.operators.jpeg import (
    _decode_table,
    _optimal_spec,
    decode_jpeg,
    decode_jpeg_lossless,
    encode_jpeg,
    encode_jpeg_lossless,
)


def _img(seed: int = 42, shape=(49, 67, 3)) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, size=shape).astype(np.uint8)


# ---------------------------------------------------------------- lossless


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_lossless_roundtrip_every_predictor(predictor):
    img = _img()
    enc = encode_jpeg_lossless(img, predictor=predictor)
    assert np.array_equal(decode_jpeg_lossless(enc), img.astype(np.int32))


@pytest.mark.parametrize("predictor", [1, 4, 7])
def test_lossless_roundtrip_with_restart(predictor):
    img = _img(7)
    enc = encode_jpeg_lossless(img, predictor=predictor, restart_rows=8)
    assert b"\xff\xd0" in enc  # RST0 actually emitted
    assert np.array_equal(decode_jpeg_lossless(enc), img.astype(np.int32))


def test_lossless_gray_roundtrip():
    gray = _img(9, shape=(31, 53))
    enc = encode_jpeg_lossless(gray, predictor=2)
    assert np.array_equal(decode_jpeg_lossless(enc), gray.astype(np.int32))
    # uint8 contract path returns (h, w)
    assert np.array_equal(decode_jpeg(enc), gray)


def test_lossless_point_transform_drops_exactly_pt_bits():
    img = _img(11)
    enc = encode_jpeg_lossless(img, predictor=5, point_transform=2)
    dec = decode_jpeg_lossless(enc)
    assert np.array_equal(dec, (img.astype(np.int32) >> 2) << 2)


def test_lossless_16bit_wrap_and_ssss16():
    # alternating 0 / 32768 forces diff == 32768 ≡ -32768 (mod 2^16):
    # the SSSS=16 symbol that carries no magnitude bits
    x = np.zeros((4, 6), dtype=np.int64)
    x[:, 1::2] = 32768
    enc = encode_jpeg_lossless(x, predictor=1, precision=16)
    assert np.array_equal(decode_jpeg_lossless(enc), x.astype(np.int32))
    rnd = np.random.RandomState(3).randint(0, 65536, size=(23, 29)).astype(np.int64)
    enc = encode_jpeg_lossless(rnd, predictor=1, precision=16)
    assert np.array_equal(decode_jpeg_lossless(enc), rnd.astype(np.int32))


def test_lossless_low_precision_and_uint8_scaling():
    x = np.random.RandomState(5).randint(0, 16, size=(9, 11)).astype(np.int64)
    enc = encode_jpeg_lossless(x, predictor=7, precision=4)
    assert np.array_equal(decode_jpeg_lossless(enc), x.astype(np.int32))
    # decode_jpeg scales 4-bit samples up to the uint8 range
    assert np.array_equal(decode_jpeg(enc), (x << 4).astype(np.uint8))


def test_lossless_smooth_image_compresses():
    g = np.add.outer(np.arange(100), np.arange(120)) % 256
    img = np.stack([g, g[::-1], (g * 2) % 256], -1).astype(np.uint8)
    enc = encode_jpeg_lossless(img, predictor=7)
    assert len(enc) < 0.5 * img.nbytes  # prediction + optimal tables pay off
    assert np.array_equal(decode_jpeg_lossless(enc), img.astype(np.int32))


def test_lossless_sof3_marker_and_no_dqt():
    enc = encode_jpeg_lossless(_img(1))
    assert b"\xff\xc3" in enc
    assert b"\xff\xdb" not in enc  # no quantization table in lossless
    assert b"\xff\xe0" not in enc  # no JFIF APP0 (would declare YCbCr)


def test_lossless_rejects_subsampled_frame():
    enc = bytearray(encode_jpeg_lossless(_img(2, shape=(8, 8))))
    sof = enc.index(b"\xff\xc3")
    # component 0's Hi/Vi byte: marker(2) + len(2) + P,Y,X,Nf(6) + Ci(1)
    assert enc[sof + 11] == 0x11
    enc[sof + 11] = 0x22
    with pytest.raises(ValueError, match="subsampled lossless"):
        decode_jpeg(bytes(enc))


def test_lossless_encoder_validation():
    img = _img(3)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(img, predictor=0)
    with pytest.raises(ValueError, match="point transform"):
        encode_jpeg_lossless(img, point_transform=8)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(img.astype(np.int64), precision=17)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_lossless(np.full((4, 4), 300, dtype=np.int64), precision=8)


# ---------------------------------------------------------------- 12-bit


def test_12bit_sof1_and_16bit_dqt():
    enc = encode_jpeg(_img(4), quality=92, precision=12)
    assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc
    dqt = enc.index(b"\xff\xdb")
    assert enc[dqt + 4] >> 4 == 1  # Pq=1: 16-bit table entries


def test_12bit_roundtrip_error_matches_8bit():
    img = _img(6)
    for sub in ("4:4:4", "4:2:0"):
        e8 = encode_jpeg(img, quality=92, subsampling=sub)
        e12 = encode_jpeg(img, quality=92, subsampling=sub, precision=12)
        err8 = np.abs(decode_jpeg(e8).astype(float) - img.astype(float)).mean()
        err12 = np.abs(decode_jpeg(e12).astype(float) - img.astype(float)).mean()
        # same ×16-scaled tables → the 12-bit path should be at least
        # as accurate as 8-bit after scaling back down
        assert err12 <= err8 + 0.5, (sub, err8, err12)


def test_12bit_gray_restart_roundtrip():
    gray = _img(8, shape=(31, 53))
    enc = encode_jpeg(gray, quality=85, precision=12, restart_interval=4)
    assert b"\xff\xdd" in enc
    dec = decode_jpeg(enc)
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(float) - gray.astype(float)).mean() < 8.0


def test_12bit_native_input_range_checked():
    x12 = np.random.RandomState(10).randint(0, 4096, size=(16, 16)).astype(np.int32)
    enc = encode_jpeg(x12, quality=95, precision=12)
    assert decode_jpeg(enc).shape == (16, 16)
    with pytest.raises(ValueError, match=r"\[0, 4095\]"):
        encode_jpeg(np.full((8, 8), 5000, dtype=np.int32), precision=12)


# ------------------------------------------------------- optimal tables


def test_optimal_spec_reserves_all_ones_code():
    # heavily skewed frequencies drive one symbol to the max depth;
    # the emitted table must never assign the all-ones code of its
    # deepest length (T.81 C.2)
    freqs = {s: 1 for s in range(17)}
    freqs[0] = 10_000
    bits, vals = _optimal_spec(freqs)
    assert sum(bits) == len(vals) == 17
    table = _decode_table(bits, vals)
    max_len = max(length for length, _ in table)
    assert (max_len, (1 << max_len) - 1) not in table


def test_optimal_spec_single_and_empty():
    bits, vals = _optimal_spec({5: 100})
    assert vals == [5]
    bits, vals = _optimal_spec({})
    assert len(vals) == 1  # degenerate guard symbol


# ------------------------------------------------------------ rejection


def test_arithmetic_sof_still_rejected():
    enc = bytearray(encode_jpeg(_img(12, shape=(8, 8)), quality=90))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(bytes(enc))
