"""Baseline JPEG codec tests (operators/jpeg.py): round-trip error
bounds on smooth and hard content, both chroma modes, grayscale,
restart markers, decoder stream-feature coverage (16-bit DQT, SOF1),
and the honest-rejection contract for non-baseline modes.

JPEG is lossy, so there is no byte-exact round trip; the assertions
bound reconstruction error the way the spec's quantization predicts —
tight on smooth gradients at high quality, loose only on white noise
(which no DCT codec preserves). The embedded multimodal VALUES oracle
(tests/test_multimodal_oracle.py) separately pins the decode output
bit-for-bit via its feature constants.
"""

import struct

import numpy as np
import pytest

from auto_ts_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _gradient(h=45, w=61):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 / (h - 1),
            xx * 255 / (w - 1),
            (yy + xx) * 255 / (h + w - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_gradient_roundtrip_tight_bounds():
    img = _gradient()
    for q, sub, max_tol, mean_tol in [
        (95, "4:4:4", 6, 1.0),
        (90, "4:4:4", 8, 1.5),
        (95, "4:2:0", 12, 2.5),
        (75, "4:2:0", 20, 4.0),
    ]:
        out = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        assert out.shape == img.shape and out.dtype == np.uint8
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= max_tol, (q, sub, err.max())
        assert err.mean() <= mean_tol, (q, sub, err.mean())


def test_flat_color_is_exact():
    flat = np.full((16, 24, 3), 137, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)


def test_grayscale_roundtrip():
    g = _gradient()[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == g.shape and out.ndim == 2
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


def test_odd_dimensions_and_mcu_padding():
    # sizes straddling 8/16 boundaries in both modes (pad-and-crop path)
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 15), (16, 16), (9, 24)]:
        img = _gradient(max(h, 2), max(w, 2))[:h, :w]
        for sub in ("4:4:4", "4:2:0"):
            out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
            assert out.shape == img.shape, (h, w, sub)


def test_restart_markers_roundtrip():
    img = _gradient()
    plain = decode_jpeg(encode_jpeg(img, quality=90, subsampling="4:2:0"))
    with_dri = decode_jpeg(
        encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=2)
    )
    # RST changes only entropy segmentation, not coefficients
    assert np.array_equal(plain, with_dri)


def test_deterministic_bytes():
    img = _gradient()
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


def test_noise_survives_roundtrip_without_error():
    noisy = np.random.RandomState(3).randint(0, 256, (48, 64, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(noisy, quality=95))
    assert out.shape == noisy.shape  # lossy by design; just no decode error


def test_decoder_rejects_lossless_and_bad_magic():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, 90))
    sof = payload.find(b"\xff\xc0")
    # rebadging SOF0 as SOF3 (lossless, decoded for real since r13)
    # leaves a DCT-layout scan whose Ss=0 is an illegal predictor
    # selection — must raise, not mis-predict
    payload[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    # rebadging SOF0 as SOF2 leaves a baseline-layout scan (Se=63
    # interleaved) that is ILLEGAL as a progressive DC scan — must
    # raise, not decode garbage
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se"):
        decode_jpeg(bytes(payload))


def test_decoder_rejects_non_interleaved_multi_scan():
    """A baseline JPEG is allowed to split components across several
    scans (non-interleaved); this decoder reads only the first scan,
    so it must REJECT such streams (routing decode_image to the
    documented fake) rather than silently produce Y-only/scrambled
    pixels. Simulate by rewriting the SOS header to cover just one of
    the three frame components."""
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, 90))
    sos = payload.find(b"\xff\xda")
    (old_len,) = struct.unpack_from(">H", payload, sos + 2)
    body = bytes(payload[sos + 4 : sos + 2 + old_len])
    ns = body[0]
    assert ns == 3  # color encode emits one interleaved YCbCr scan
    new_body = bytes([1]) + body[1:3] + body[1 + 2 * ns :]  # first comp only
    new_seg = struct.pack(">HH", 0xFFDA, len(new_body) + 2) + new_body
    rewritten = bytes(payload[:sos]) + new_seg + bytes(payload[sos + 2 + old_len :])
    with pytest.raises(ValueError, match="scan layout"):
        decode_jpeg(rewritten)


def test_decoder_accepts_sof1_and_16bit_dqt():
    """Third-party baseline files may use SOF1 (extended sequential —
    identical decode at 8-bit) and 16-bit-precision DQT entries; our
    encoder emits neither, so rewrite a stream to cover both parses."""
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, 90))
    expected = decode_jpeg(bytes(payload))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC1  # SOF1
    dqt = payload.find(b"\xff\xdb")
    (old_len,) = struct.unpack_from(">H", payload, dqt + 2)
    body = bytes(payload[dqt + 4 : dqt + 2 + old_len])
    # body = [0x00, 64 x u8] [0x01, 64 x u8] → widen both to Pq=1/u16
    new_body = bytearray()
    p = 0
    while p < len(body):
        tq = body[p] & 0x0F
        vals = body[p + 1 : p + 65]
        new_body.append(0x10 | tq)
        for v in vals:
            new_body += struct.pack(">H", v)
        p += 65
    new_seg = struct.pack(">HH", 0xFFDB, len(new_body) + 2) + bytes(new_body)
    rewritten = bytes(payload[:dqt]) + new_seg + bytes(payload[dqt + 2 + old_len :])
    assert np.array_equal(decode_jpeg(rewritten), expected)


def test_decode_image_dispatch_and_fallback():
    from auto_ts_spark.operators.multimodal import (
        _fake_decode_image,
        decode_image,
    )

    img = _gradient(12, 20)
    payload = encode_jpeg(img, 95)
    out = decode_image(payload)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6
    # grayscale JPEG broadcasts to 3 channels
    gout = decode_image(encode_jpeg(img[:, :, 0], 95))
    assert gout.shape == (12, 20, 3)
    assert np.array_equal(gout[:, :, 0], gout[:, :, 1])
    # lossless rebadge → documented fake, not an exception
    bad = bytearray(payload)
    bad[bad.find(b"\xff\xc0") + 1] = 0xC3
    fout = decode_image(bytes(bad), 20, 12)
    assert np.array_equal(fout, _fake_decode_image(bytes(bad), 20, 12))
    # REAL progressive payload decodes through dispatch (r11)
    from auto_ts_spark.operators.jpeg import encode_jpeg_progressive

    pout = decode_image(encode_jpeg_progressive(img, 95))
    assert np.array_equal(pout, decode_image(encode_jpeg(img, 95)))


def test_progressive_decodes_identical_to_baseline():
    """encode_jpeg_progressive and encode_jpeg entropy-code the SAME
    quantized coefficients, so their decodes must be bit-identical —
    this pins the whole progressive pipeline (spectral selection,
    successive approximation, EOBn band runs, refinement correction
    bits) against the already-oracle-checked baseline decoder."""
    from auto_ts_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    cases = [
        (_gradient(16, 16), "4:4:4", 90),
        (_gradient(17, 23), "4:4:4", 75),  # odd dims, MCU padding
        (_gradient(32, 48), "4:2:0", 90),  # subsampled chroma
        (rng.randint(0, 256, (21, 13, 3), np.uint8), "4:2:0", 85),
        (rng.randint(0, 256, (19, 27), np.uint8), "4:4:4", 70),  # gray
        (np.full((16, 16, 3), 137, np.uint8), "4:4:4", 90),  # flat
    ]
    for img, sub, q in cases:
        base = decode_jpeg(encode_jpeg(img, q, sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, q, sub))
        assert np.array_equal(base, prog), (img.shape, sub, q)


def _encode_noninterleaved(img, quality=90, subsampling="4:4:4"):
    """Test-side encoder for the non-interleaved SEQUENTIAL layout
    (SOF0, one full-band baseline scan per component — legal T.81,
    occasionally emitted by hardware encoders): built from the
    module's own primitives so the decoder is tested against an
    independent scan arrangement of the SAME quantized coefficients."""
    from auto_ts_spark.operators.jpeg import (
        AC_CHROMA_BITS, AC_CHROMA_VALS, AC_LUMA_BITS, AC_LUMA_VALS,
        DC_CHROMA_BITS, DC_CHROMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS,
        ZIGZAG, _BitWriter, _canonical_codes, _dht_body, _encode_block,
        _quantize_components, _seg,
    )

    gray, h, w, hv, qy, qc, qb, true_dims, _mx, _my = _quantize_components(
        img, quality, subsampling
    )
    ncomp = 1 if gray else 3
    tbl_of = [0] + [1, 1][: max(0, ncomp - 1)]
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0))
    body = bytes([0x00]) + qy.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    if not gray:
        body += bytes([0x01]) + qc.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out += _seg(0xFFDB, body)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, hv[ci][0] << 4 | hv[ci][1], tbl_of[ci]])
    out += _seg(0xFFC0, sof)
    dht = _dht_body(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) + _dht_body(
        1, 0, AC_LUMA_BITS, AC_LUMA_VALS
    )
    if not gray:
        dht += _dht_body(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS) + _dht_body(
            1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS
        )
    out += _seg(0xFFC4, dht)
    for ci in range(ncomp):
        t = tbl_of[ci]
        out += _seg(0xFFDA, bytes([1, ci + 1, t << 4 | t, 0, 63, 0]))
        writer = _BitWriter()
        prev = 0
        bh, bw = true_dims[ci]
        for by in range(bh):
            for bx in range(bw):
                zz = qb[ci][by, bx].reshape(64)[ZIGZAG]
                prev = _encode_block(writer, zz, prev, dc_codes[t], ac_codes[t])
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def test_noninterleaved_sequential_decodes_identical():
    """One-scan-per-component SOF0 streams (r11) must decode to the
    SAME pixels as the interleaved encode of the same image — same
    quantized coefficients, different scan arrangement."""
    rng = np.random.RandomState(3)
    for img, sub in (
        (_gradient(16, 16), "4:4:4"),
        (_gradient(17, 23), "4:4:4"),
        (_gradient(36, 52), "4:2:0"),  # true dims != padded MCU grid
        (rng.randint(0, 256, (19, 27), np.uint8), "4:4:4"),  # grayscale
    ):
        base = decode_jpeg(encode_jpeg(img, 90, sub))
        noni = decode_jpeg(_encode_noninterleaved(img, 90, sub))
        assert np.array_equal(base, noni), (img.shape, sub)


def test_progressive_long_eob_runs():
    """A large flat image with one detailed corner forces EOBn band
    runs spanning many blocks (run length >> 1) in the AC-first scans
    and correction-bit EOB bands in the refinement scans — the paths
    a small noisy fixture never reaches."""
    from auto_ts_spark.operators.jpeg import encode_jpeg_progressive

    img = np.full((96, 128, 3), 90, np.uint8)
    img[:16, :16] = np.random.RandomState(5).randint(0, 256, (16, 16, 3), np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        base = decode_jpeg(encode_jpeg(img, 80, sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, 80, sub))
        assert np.array_equal(base, prog), sub


def test_progressive_restart_markers_roundtrip():
    """Real progressive files carry RSTn markers; the decoder resets
    DC predictors AND the EOB run at each restart, per scan. Encoded
    with per-scan restart intervals small enough that every scan type
    (interleaved DC, AC first with EOB runs, AC/DC refinement)
    crosses several restart boundaries."""
    from auto_ts_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(9)
    cases = [
        (rng.randint(0, 256, (48, 64, 3), np.uint8), "4:4:4", 2),
        (rng.randint(0, 256, (48, 64, 3), np.uint8), "4:2:0", 3),
        (rng.randint(0, 256, (33, 41), np.uint8), "4:4:4", 5),
        (np.full((64, 64, 3), 77, np.uint8), "4:4:4", 4),  # EOB runs cut by RST
    ]
    for img, sub, ri in cases:
        base = decode_jpeg(encode_jpeg(img, 85, sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, 85, sub, restart_interval=ri)
        )
        assert np.array_equal(base, prog), (img.shape, sub, ri)


def test_quality_tables_follow_libjpeg_convention():
    q50_y, _ = quality_tables(50)
    assert q50_y[0, 0] == 16  # scale 100% at q=50 → Annex-K verbatim
    q100_y, q100_c = quality_tables(100)
    assert q100_y.max() == 1 and q100_c.max() == 1  # all-ones at q=100
    q10_y, _ = quality_tables(10)
    assert q10_y.max() == 255  # clamped


def test_table_invariants():
    # canonical-code invariants a typo'd table would break
    assert sum(DC_LUMA_BITS) == len(DC_LUMA_VALS) == 12
    assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
