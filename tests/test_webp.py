"""WebP lossless (VP8L) codec — operators/webp.py.

Round-trip matrix through the in-repo encoder (palette/packing,
literal, runs, cache, subtract-green, color transform, all 14
predictor modes, combined chains), plus HAND-BUILT bitstreams for the
decoder paths the encoder never emits (meta prefix codes, the
explicit max_symbol budget, the 16-repeat code-length extension), the
distance-map head pin, and the multimodal routing contract."""

import numpy as np
import pytest

from auto_ts_spark.operators.webp import (
    _BitWriter,
    _distance_map,
    _encode_image_data,
    _write_prefix_code,
    decode_vp8l,
    decode_webp,
    encode_webp,
)


def _rt(img, **kw):
    out = decode_webp(encode_webp(img, **kw))
    if img.shape[2] == 3:
        assert (out[:, :, 3] == 255).all()
        out = out[:, :, :3]
    assert np.array_equal(out, img), kw
    return out


# --------------------------------------------------------- round-trips


def test_palette_roundtrip_all_packings():
    rs = np.random.RandomState(3)
    # 2/3/9/60/256 colors hit xbits 3/2/1/1/0 (8, 4, 2, 2, 1 px/byte)
    for ncol, shape in [(2, (7, 13)), (3, (5, 9)), (9, (8, 8)),
                        (60, (16, 16)), (256, (32, 32))]:
        pal = rs.randint(0, 256, (ncol, 3), np.uint8)
        _rt(pal[rs.randint(0, ncol, shape)])


def test_literal_rgba_and_alpha_flag():
    rs = np.random.RandomState(5)
    img4 = rs.randint(0, 256, (9, 11, 4), np.uint8)
    assert np.array_equal(decode_webp(encode_webp(img4, palette="never")), img4)
    _rt(rs.randint(0, 256, (21, 17, 3), np.uint8), palette="never")


def test_runs_and_color_cache():
    img = np.zeros((24, 24, 3), np.uint8)
    img[:12] = [10, 200, 30]
    img[12:] = [99, 5, 250]
    img[::3, ::3] = [1, 2, 3]
    _rt(img, palette="never", cache_bits=4)
    _rt(img, palette="never", cache_bits=0)


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes(mode):
    rs = np.random.RandomState(19 + mode)
    _rt(rs.randint(0, 256, (19, 23, 3), np.uint8),
        palette="never", predictor=mode, predictor_bits=3)


def test_transform_chain_and_compression_engages():
    rs = np.random.RandomState(7)
    img = rs.randint(0, 256, (19, 23, 3), np.uint8)
    _rt(img, palette="never", subtract_green=True)
    _rt(img, palette="never", color_transform=(23, 250, 7))
    _rt(img, palette="never", subtract_green=True,
        color_transform=(5, 6, 7), predictor=7, cache_bits=6)
    # a smooth gradient must actually compress through the chain
    g = np.arange(64, dtype=np.uint8)
    grad = np.stack(
        [np.tile(g, (64, 1)), np.tile(g[:, None], (1, 64)),
         np.full((64, 64), 7, np.uint8)], axis=2)
    n_pred = len(encode_webp(grad, palette="never", subtract_green=True,
                             predictor=7, cache_bits=4))
    n_lit = len(encode_webp(grad, palette="never"))
    _rt(grad, palette="never", subtract_green=True, predictor=7, cache_bits=4)
    assert n_pred < n_lit / 5, (n_pred, n_lit)


def test_edge_shapes():
    rs = np.random.RandomState(11)
    _rt(np.array([[[5, 6, 7]]], np.uint8), palette="never")
    _rt(rs.randint(0, 256, (1, 40, 3), np.uint8), palette="never", predictor=11)
    _rt(rs.randint(0, 256, (40, 1, 3), np.uint8), palette="never", predictor=12)


# ---------------------------------------------------------- spec pins


def test_distance_map_head_matches_spec_table():
    """First 40 entries of the generated short-distance map pinned to
    the table listed in the lossless spec."""
    exp = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
           (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
           (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
           (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
           (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5),
           (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    dm = _distance_map()
    assert dm[:40] == exp
    assert len(dm) == 120


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms


def test_meta_prefix_codes_hand_built_stream():
    """8x8 image, meta_bits=2 → a 2x2 entropy image selecting between
    two prefix-code groups; group g colors every pixel (a=255, r=g+1,
    g=0, b=9-g). The encoder never emits meta codes, so this stream is
    built by hand."""
    w = h = 8
    meta_bits = 2
    meta_ids = [0, 1, 1, 0]  # 2x2 blocks
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(meta_bits - 2, 3)
    # the meta image: green channel = group id (red contributes <<8)
    _encode_image_data(bw, [(0xFF << 24) | (gid << 8) for gid in meta_ids], 2)
    # two groups, literal single-symbol trees per channel
    for gid in (0, 1):
        for alphabet, sym in [(280, 0), (256, gid + 1), (256, 9 - gid),
                              (256, 255), (40, 0)]:
            lengths = [0] * alphabet
            lengths[sym] = 1
            _write_prefix_code(bw, lengths)
    # zero payload bits: every tree is single-symbol, so all 64 pixels
    # decode without reading — but the stream must still parse
    out = decode_vp8l(bytes(bw.bytes()))
    assert out.shape == (8, 8, 4)
    for y in range(8):
        for x in range(8):
            gid = meta_ids[(y >> 2) * 2 + (x >> 2)]
            assert tuple(out[y, x]) == (gid + 1, 0, 9 - gid, 255), (x, y)


def test_max_symbol_budget_hand_built_stream():
    """Full-form green tree whose code lengths stop early via the
    explicit max_symbol budget (2 + 2-bit field)."""
    w, h = 4, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green tree, full form: cl code = single symbol "1" (0-bit reads)
    bw.write(0, 1)  # not simple
    bw.write(19 - 4, 4)
    cl_lengths = {1: 1}
    from auto_ts_spark.operators.webp import _CL_ORDER

    for k in range(19):
        bw.write(cl_lengths.get(_CL_ORDER[k], 0), 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2 → lengths[0]=1, lengths[1]=1, rest 0
    # red/blue/alpha/distance: simple single-symbol trees
    for alphabet, sym in [(256, 7), (256, 8), (256, 255), (40, 0)]:
        lengths = [0] * alphabet
        lengths[sym] = 1
        _write_prefix_code(bw, lengths)
    # pixels: green symbols 0,1,1,0 (1 bit each: canonical 0→0, 1→1)
    for bit in (0, 1, 1, 0):
        bw.write(bit, 1)
    out = decode_vp8l(bytes(bw.bytes()))
    assert [tuple(px) for px in out[0]] == [
        (7, 0, 8, 255), (7, 1, 8, 255), (7, 1, 8, 255), (7, 0, 8, 255)]


def test_16_repeat_code_length_hand_built_stream():
    """Code-length symbol 16 (repeat previous nonzero length) and 18
    (zero run) in one green tree: lengths [2,2,2,2] + 276 zeros."""
    w, h = 4, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)  # full form
    bw.write(19 - 4, 4)
    # cl code: {2:1, 16:2, 18:2} — canonical: 2→"0", 16→"10", 18→"11"
    cl_lengths = {2: 1, 16: 2, 18: 2}
    from auto_ts_spark.operators.webp import _CL_ORDER

    for k in range(19):
        bw.write(cl_lengths.get(_CL_ORDER[k], 0), 3)
    bw.write(0, 1)  # no max_symbol
    bw.write_code(0, 1)  # cl sym 2 → lengths[0] = 2
    bw.write_code(0b10, 2)  # cl sym 16: repeat prev len
    bw.write(0, 2)  # 3 + 0 repeats → lengths[1..3] = 2
    bw.write_code(0b11, 2)  # cl sym 18: 11+127 = 138 zeros
    bw.write(127, 7)
    bw.write_code(0b11, 2)  # another 138 → 280 total
    bw.write(127, 7)
    for alphabet, sym in [(256, 1), (256, 2), (256, 255), (40, 0)]:
        lengths = [0] * alphabet
        lengths[sym] = 1
        _write_prefix_code(bw, lengths)
    # greens 0..3, canonical 2-bit codes 00,01,10,11
    for code in range(4):
        bw.write_code(code, 2)
    out = decode_vp8l(bytes(bw.bytes()))
    assert [int(px[1]) for px in out[0]] == [0, 1, 2, 3]
    assert [tuple(px[[0, 2, 3]]) for px in out[0]] == [(1, 2, 255)] * 4


# ------------------------------------------------------ error routing


def test_lossy_vp8_raises():
    import struct as st

    body = b"\x00" * 10
    chunk = b"VP8 " + st.pack("<I", len(body)) + body
    blob = b"RIFF" + st.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(blob)


def test_truncated_and_garbage_raise():
    rs = np.random.RandomState(2)
    blob = encode_webp(rs.randint(0, 256, (8, 8, 3), np.uint8), palette="never")
    with pytest.raises(ValueError):
        decode_webp(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WEBP")
    with pytest.raises(ValueError):
        decode_webp(b"not even riff")


def test_decode_image_routes_webp():
    """multimodal.decode_image: VP8L decodes for REAL; lossy VP8 and
    corrupt VP8L route to the deterministic fake."""
    import struct as st

    from auto_ts_spark.operators.multimodal import (
        _fake_decode_image,
        decode_image,
    )

    rs = np.random.RandomState(4)
    img = rs.randint(0, 256, (12, 17, 3), np.uint8)
    blob = encode_webp(img, palette="never", subtract_green=True, cache_bits=3)
    assert np.array_equal(decode_image(blob), img)
    body = b"\x00" * 10
    chunk = b"VP8 " + st.pack("<I", len(body)) + body
    lossy = b"RIFF" + st.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert np.array_equal(
        decode_image(lossy, 5, 4), _fake_decode_image(lossy, 5, 4))
    corrupt = blob[:30]
    assert np.array_equal(
        decode_image(corrupt, 5, 4), _fake_decode_image(corrupt, 5, 4))


def test_schedule_rows_2_and_26_are_webp_and_lossless():
    from auto_ts_spark.operators.multimodal import (
        _image_array,
        _image_payload,
        decode_image,
    )

    for i in (2, 26):
        payload, mime = _image_payload(i)
        assert mime == "image/webp"
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
        assert np.array_equal(decode_image(payload), _image_array(i))
