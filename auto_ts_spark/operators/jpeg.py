"""JPEG (ITU-T T.81, JFIF container) codec — pure numpy + stdlib
``struct``, no codec library.

Scope: what a training-data pipeline actually meets in the wild as
"a JPEG" — baseline sequential DCT (SOF0) and extended-sequential
(SOF1, 8-bit AND 12-bit sample precision, r13) AND progressive DCT
(SOF2, spectral selection + successive approximation, T.81 Annex G —
the second-most-common JPEG flavor in real web corpora) AND lossless
(SOF3, T.81 Annex H predictive coding, r13: predictors 1-7, point
transform, modulo-65536 differences incl. the SSSS=16 case, restart
intervals, 2-16-bit precision), Huffman entropy coding, grayscale or
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart markers.
Arithmetic coding (SOF9/10/11/13-15) and hierarchical mode raise a
clear error instead of producing garbage — the honest-fallback
contract of ``multimodal.decode_image``.

Encoder: standard Annex-K quantization tables scaled by the libjpeg
quality formula, standard Annex-K Huffman tables, selectable 4:4:4 or
4:2:0, optional restart interval. Decoder: reads DQT/DHT from the
stream (so it decodes third-party baseline files, not just our own),
vectorized numpy IDCT over all blocks of a component at once; only the
entropy decode is a per-symbol Python loop, and it runs inside the
Arrow-batched ``mapInPandas`` workers, bounded per image.

All tables and formulas are from the public spec (ITU-T T.81 Annex K)
and the public libjpeg quality convention. Reference parity: the
reference engine has no media codecs at all (multimodal columns are a
scale extension, SURVEY.md §2.9); this closes the "JPEG needs a codec
library" gap for baseline files.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K) and derived constants
# --------------------------------------------------------------------------

Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)

Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _zigzag() -> np.ndarray:
    """Zigzag scan order as indices into a row-major flattened 8x8
    block (generated, not hand-typed — the diagonal walk of T.81
    Figure 5)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1)]
        if s % 2 == 0:
            diag.reverse()
        order.extend(i * 8 + j for i, j in diag if i < 8 and j < 8)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K Huffman specs: (BITS[1..16] code-length histogram, HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# a mistyped table would mis-encode silently; the canonical-code
# invariant (histogram total == symbol count) catches transposition
for _bits, _vals in (
    (DC_LUMA_BITS, DC_LUMA_VALS),
    (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS),
    (AC_CHROMA_BITS, AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals), "corrupt Annex-K Huffman table"


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: forward F = C @ B @ C.T,
    inverse B = C.T @ F @ C — exactly the T.81 FDCT/IDCT pair."""
    n = np.arange(8, dtype=np.float64)
    c = np.cos((2.0 * n[None, :] + 1.0) * n[:, None] * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_DCT = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the public libjpeg quality convention
    (quality_scaling in jcparam.c: 1-100 → 5000/q below 50, 200-2q
    above; entries clamped to [1, 255])."""
    q = min(max(int(quality), 1), 100)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    out = []
    for tbl in (Q_LUMA, Q_CHROMA):
        t = np.floor((tbl * scale + 50.0) / 100.0)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# --------------------------------------------------------------------------
# Bit I/O + Huffman code construction
# --------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (0xFF → 0xFF
    0x00); final byte is 1-padded per the spec."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, bits: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (bits & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) under T.81 canonical assignment
    (Annex C: codes of each length are consecutive, lengths ascending)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, the decode-side view of the same
    canonical assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    """SSSS magnitude category: bit length of |v| (0 for 0)."""
    return int(abs(v)).bit_length()


_PSEUDO = -1  # sorts first among frequency ties → always deepest code


def _optimal_spec(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Frequency-optimal DHT spec (BITS, HUFFVAL) for the symbols in
    ``freqs``: code lengths from the shared 16-limited package-merge
    helper (operators/webp.py), with a minimum-weight pseudo-symbol
    folded into the length computation and dropped from the emitted
    table so the all-ones code of the deepest length stays unused —
    T.81 C.2 reserves it, and this is the same trick as libjpeg's
    reserved 256th symbol. Used by the 12-bit and lossless encoders,
    whose symbol ranges exceed the fixed Annex-K tables."""
    from auto_ts_spark.operators.webp import _huffman_lengths

    f = {int(s): int(c) for s, c in freqs.items() if c > 0}
    if not f:
        f[0] = 1  # degenerate scan (e.g. an all-constant plane)
    f[_PSEUDO] = 1
    lengths = _huffman_lengths(f, 16)
    if lengths[_PSEUDO] != max(lengths.values()):  # pragma: no cover
        raise AssertionError("pseudo-symbol not at max code depth")
    bits = [0] * 16
    vals: list[int] = []
    # canonical order: length ascending, pseudo LAST within its group,
    # so dropping it removes exactly the numerically-largest code
    for sym in sorted(lengths, key=lambda s: (lengths[s], s == _PSEUDO, s)):
        if sym == _PSEUDO:
            continue
        bits[lengths[sym] - 1] += 1
        vals.append(sym)
    return bits, vals


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray, mid: float = 128.0) -> np.ndarray:
    """JFIF full-range BT.601 RGB → YCbCr, float64 (h, w, 3); ``mid``
    is the chroma zero point (128 at 8-bit, 2048 at 12-bit)."""
    f = arr.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = mid - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = mid + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blockize(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (H//8, W//8, 8, 8)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)


def _fdct_quant(
    plane: np.ndarray, qtbl: np.ndarray, shift: float = 128.0
) -> np.ndarray:
    """Level-shift, forward-DCT and quantize every 8x8 block of a
    component plane at once → int32 (bh, bw, 8, 8). ``shift`` is the
    T.81 level shift 2^(P-1)."""
    blocks = _blockize(plane.astype(np.float64) - shift)
    coeffs = np.einsum("ki,yxij,lj->yxkl", _DCT, blocks, _DCT)
    return np.round(coeffs / qtbl).astype(np.int32)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw) — replication keeps
    the padded blocks' high-frequency energy (and thus file size) low."""
    h, w = plane.shape
    return np.pad(
        plane, ((0, (-h) % mh), (0, (-w) % mw)), mode="edge"
    )


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC for
    the next block's differential."""
    dc = int(zz[0])
    diff = dc - prev_dc
    size = _category(diff)
    code, length = dc_codes[size]
    writer.put(code, length)
    if size:
        writer.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    nz = np.nonzero(zz[1:])[0]
    pos = 0
    for idx in nz:
        run = int(idx) - pos
        while run >= 16:
            zrl, zlen = ac_codes[0xF0]
            writer.put(zrl, zlen)
            run -= 16
        v = int(zz[1 + idx])
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.put(code, length)
        writer.put(v if v >= 0 else v + (1 << size) - 1, size)
        pos = int(idx) + 1
    if pos != 63:
        eob, elen = ac_codes[0x00]
        writer.put(eob, elen)
    return dc


def _count_block(
    zz: np.ndarray,
    prev_dc: int,
    dc_freq: dict[int, int],
    ac_freq: dict[int, int],
) -> int:
    """Counting twin of ``_encode_block`` for the optimal-table first
    pass (12-bit encoder): tallies the DC category and AC run/size
    symbols the emission pass will code, returns the block's DC."""
    dc = int(zz[0])
    size = _category(dc - prev_dc)
    dc_freq[size] = dc_freq.get(size, 0) + 1
    nz = np.nonzero(zz[1:])[0]
    pos = 0
    for idx in nz:
        run = int(idx) - pos
        while run >= 16:
            ac_freq[0xF0] = ac_freq.get(0xF0, 0) + 1
            run -= 16
        sym = (run << 4) | _category(int(zz[1 + idx]))
        ac_freq[sym] = ac_freq.get(sym, 0) + 1
        pos = int(idx) + 1
    if pos != 63:
        ac_freq[0x00] = ac_freq.get(0x00, 0) + 1
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc << 4 | th] + bits + vals)


def _quantize_components(
    arr: np.ndarray, quality: int, subsampling: str, precision: int = 8
) -> tuple:
    """Shared encoder front half: color convert, subsample, pad to the
    MCU grid, FDCT + quantize. Returns (gray, h, w, hv, qy, qc,
    quant_blocks, true_dims, mcus_x, mcus_y) where ``true_dims`` is
    each component's non-padded block grid (what non-interleaved
    progressive scans cover). ``precision`` 12 widens the level shift
    to 2048 and scales the quantization tables ×16 (the libjpeg
    convention), keeping perceptual quality comparable; uint8 input is
    upscaled ×16 to the 12-bit sample range."""
    if precision == 12:
        if arr.dtype == np.uint8:
            arr = np.ascontiguousarray(arr).astype(np.int32) << 4
        else:
            arr = np.ascontiguousarray(arr).astype(np.int32)
            if arr.min() < 0 or arr.max() > 4095:
                raise ValueError("12-bit JPEG samples must be in [0, 4095]")
    elif precision == 8:
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
    else:
        raise ValueError(f"unsupported DCT JPEG precision {precision}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected (h,w) gray or (h,w,3) RGB, got {arr.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad image dimensions {(h, w)}")
    qy, qc = quality_tables(quality)
    shift = float(1 << (precision - 1))
    if precision == 12:
        qy, qc = np.minimum(qy * 16.0, 65535.0), np.minimum(qc * 16.0, 65535.0)

    if gray:
        hv = [(1, 1)]
        planes = [arr.astype(np.float64)]
        qtbls = [qy]
    else:
        ycc = _rgb_to_ycbcr(arr, mid=shift)
        if subsampling == "4:2:0":
            hv = [(2, 2), (1, 1), (1, 1)]
            planes = [ycc[..., 0]]
            for c in (1, 2):
                full = _pad_edge(ycc[..., c], 2, 2)  # 2x2 means need even dims
                sub = full.reshape(full.shape[0] // 2, 2, full.shape[1] // 2, 2)
                planes.append(sub.mean(axis=(1, 3)))
        else:
            hv = [(1, 1), (1, 1), (1, 1)]
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtbls = [qy, qc, qc]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    quant_blocks = []
    true_dims = []
    for (ch, cv), plane, qtbl in zip(hv, planes, qtbls):
        # each component plane must cover the full MCU grid:
        # mcus_y*cv x mcus_x*ch blocks of 8x8
        target_h, target_w = mcus_y * cv * 8, mcus_x * ch * 8
        padded = np.pad(
            plane,
            ((0, target_h - plane.shape[0]), (0, target_w - plane.shape[1])),
            mode="edge",
        )
        quant_blocks.append(_fdct_quant(padded, qtbl, shift))
        true_dims.append((-(-plane.shape[0] // 8), -(-plane.shape[1] // 8)))
    return gray, h, w, hv, qy, qc, quant_blocks, true_dims, mcus_x, mcus_y


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG. ``subsampling``: "4:4:4" or "4:2:0" (ignored
    for grayscale). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs. ``precision`` 12 (r13) emits an
    extended-sequential SOF1 frame with 16-bit quantization tables and
    frequency-optimal Huffman tables built by a counting first pass —
    the fixed Annex-K tables only cover 8-bit DC/AC categories."""
    gray, h, w, hv, qy, qc, quant_blocks, _td, mcus_x, mcus_y = (
        _quantize_components(arr, quality, subsampling, precision)
    )
    ncomp = 1 if gray else 3
    tbl_of = [0] + [1, 1][: max(0, len(hv) - 1)]

    def mcu_blocks():
        """(component, table_class, zigzag block) in emission order,
        with a (-1, -1, None) sentinel at each restart boundary —
        shared by the counting and emission passes so their
        per-COMPONENT DC difference chains agree exactly."""
        since = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and since == restart_interval:
                    yield -1, -1, None
                    since = 0
                for ci in range(ncomp):
                    ch, cv = hv[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = quant_blocks[ci][my * cv + by, mx * ch + bx]
                            yield ci, tbl_of[ci], blk.reshape(64)[ZIGZAG]
                since += 1

    if precision == 12:
        ntab = 1 if gray else 2
        dc_freq: list[dict[int, int]] = [{} for _ in range(ntab)]
        ac_freq: list[dict[int, int]] = [{} for _ in range(ntab)]
        prev = [0] * ncomp
        for ci, t, zz in mcu_blocks():
            if ci < 0:
                prev = [0] * ncomp
                continue
            prev[ci] = _count_block(zz, prev[ci], dc_freq[t], ac_freq[t])
        dc_specs = [_optimal_spec(f) for f in dc_freq]
        ac_specs = [_optimal_spec(f) for f in ac_freq]
    else:
        dc_specs = [(DC_LUMA_BITS, DC_LUMA_VALS)]
        ac_specs = [(AC_LUMA_BITS, AC_LUMA_VALS)]
        if not gray:
            dc_specs.append((DC_CHROMA_BITS, DC_CHROMA_VALS))
            ac_specs.append((AC_CHROMA_BITS, AC_CHROMA_VALS))
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    # ---- headers ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    # DQT bodies carry the table in zigzag order (Pq=1 → 16-bit entries)
    if precision == 12:
        body = bytes([0x10]) + qy.reshape(64)[ZIGZAG].astype(">u2").tobytes()
        if not gray:
            body += bytes([0x11]) + qc.reshape(64)[ZIGZAG].astype(">u2").tobytes()
    else:
        body = bytes([0x00]) + qy.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        if not gray:
            body += bytes([0x01]) + qc.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out += _seg(0xFFDB, body)
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, hv[ci][0] << 4 | hv[ci][1], tbl_of[ci]])
    # SOF0 baseline is 8-bit by definition; 12-bit → SOF1 extended
    out += _seg(0xFFC0 if precision == 8 else 0xFFC1, sof)
    dht = _dht_body(0, 0, *dc_specs[0]) + _dht_body(1, 0, *ac_specs[0])
    if not gray:
        dht += _dht_body(0, 1, *dc_specs[1]) + _dht_body(1, 1, *ac_specs[1])
    out += _seg(0xFFC4, dht)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, tbl_of[ci] << 4 | tbl_of[ci]])
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    # ---- entropy-coded scan ----
    writer = _BitWriter()
    prev_dc = [0] * ncomp
    rst = 0
    for ci, t, zz in mcu_blocks():
        if ci < 0:  # restart boundary
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out += struct.pack(">H", 0xFFD0 + (rst & 7))
            rst += 1
            prev_dc = [0] * ncomp
            continue
        prev_dc[ci] = _encode_block(
            writer, zz, prev_dc[ci], dc_codes[t], ac_codes[t]
        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Lossless encoder (T.81 Annex H, Huffman)
# --------------------------------------------------------------------------


def _lossless_predict(
    x: np.ndarray, predictor: int, default: int, restart_rows: int
) -> np.ndarray:
    """Vectorized prediction plane for LOSSLESS encoding — the
    reconstruction equals the source, so every neighbor (Ra left,
    Rb above, Rc above-left) is just a shifted view of the source.
    T.81 H.1.2.1 boundary rules: the first sample at the start of the
    scan (and of each restart interval) is predicted as
    2^(P-Pt-1); the rest of that first line uses predictor 1 (Ra);
    the first sample of every other line uses predictor 2 (Rb)."""
    h, w = x.shape
    xi = x.astype(np.int64)
    ra = np.empty_like(xi)
    ra[:, 1:] = xi[:, :-1]
    ra[:, 0] = 0
    rb = np.empty_like(xi)
    rb[1:] = xi[:-1]
    rb[0] = 0
    rc = np.empty_like(xi)
    rc[1:, 1:] = xi[:-1, :-1]
    rc[0] = 0
    rc[:, 0] = 0
    if predictor == 1:
        px = ra.copy()
    elif predictor == 2:
        px = rb.copy()
    elif predictor == 3:
        px = rc.copy()
    elif predictor == 4:
        px = ra + rb - rc
    elif predictor == 5:
        px = ra + ((rb - rc) >> 1)  # numpy >> is arithmetic = spec's shift
    elif predictor == 6:
        px = rb + ((ra - rc) >> 1)
    elif predictor == 7:
        px = (ra + rb) >> 1
    else:
        raise ValueError(f"lossless predictor must be 1-7, got {predictor}")
    interval_starts = (
        set(range(0, h, restart_rows)) if restart_rows else {0}
    )
    for r in range(h):
        if r in interval_starts:
            px[r, 0] = default
            px[r, 1:] = xi[r, :-1]  # predictor 1 on the interval's first line
        else:
            px[r, 0] = rb[r, 0]  # predictor 2 at each line start
    return px


def _wrap_diff(d: np.ndarray) -> np.ndarray:
    """Modulo-65536 difference mapped to [-32768, 32767] (T.81 H.1.2.2
    — lossless differences are computed modulo 2^16)."""
    return ((d + 32768) & 0xFFFF) - 32768


def encode_jpeg_lossless(
    arr: np.ndarray,
    predictor: int = 1,
    point_transform: int = 0,
    precision: int | None = None,
    restart_rows: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, ncomp) array as a LOSSLESS
    JPEG (SOF3, T.81 Annex H): per-sample prediction (``predictor``
    1-7), modulo-65536 differences Huffman-coded as DC-style SSSS
    categories (incl. the SSSS=16 / diff=32768 special case), optional
    ``point_transform`` Pt (samples are coded as x >> Pt — the only
    lossy knob, 0 = bit-exact round trip), optional restart markers
    every ``restart_rows`` sample lines. Components are coded
    DIRECTLY (no color conversion — an RGB round trip is bit-exact).
    ``precision`` defaults to 8 for uint8 input, else to the smallest
    P in 2..16 that covers the sample range. Tables are
    frequency-optimal per table class (component 0, and one shared by
    the rest) via ``_optimal_spec`` — two passes over the diffs."""
    a = np.ascontiguousarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or not (1 <= a.shape[2] <= 4):
        raise ValueError(f"expected (h,w) or (h,w,1..4), got {arr.shape}")
    h, w, ncomp = a.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad image dimensions {(h, w)}")
    a = a.astype(np.int64)
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else max(int(a.max()).bit_length(), 2)
    if not 2 <= precision <= 16:
        raise ValueError(f"lossless precision must be 2-16, got {precision}")
    if a.min() < 0 or a.max() >= (1 << precision):
        raise ValueError(f"samples exceed {precision}-bit range")
    pt = int(point_transform)
    if not 0 <= pt < precision:
        raise ValueError(f"point transform must be in [0, {precision}), got {pt}")
    default = 1 << (precision - pt - 1)
    if restart_rows:
        if restart_rows * w > 65535:
            raise ValueError("restart interval exceeds the 16-bit DRI field")

    # per-component wrapped diffs (prediction over the Pt-shifted samples)
    diffs = []
    for ci in range(ncomp):
        x = a[:, :, ci] >> pt
        diffs.append(_wrap_diff(x - _lossless_predict(x, predictor, default, restart_rows)))

    # pass 1: SSSS category frequencies per table class
    tbl_of = [0] + [1] * (ncomp - 1)
    ntab = 1 if ncomp == 1 else 2
    freqs: list[dict[int, int]] = [{} for _ in range(ntab)]
    for ci in range(ncomp):
        d = diffs[ci]
        # vectorized exact bit_length: SSSS = #{k : 2^k <= |d|}
        mag = np.abs(d).astype(np.int64)
        cat = (mag[:, :, None] >= (1 << np.arange(17))[None, None, :]).sum(
            axis=2, dtype=np.int64
        )
        cat[d == -32768] = 16
        syms, counts = np.unique(cat, return_counts=True)
        f = freqs[tbl_of[ci]]
        for s, c in zip(syms.tolist(), counts.tolist()):
            f[s] = f.get(s, 0) + c
    specs = [_optimal_spec(f) for f in freqs]
    codes = [_canonical_codes(*s) for s in specs]

    # ---- headers ----
    out = bytearray(b"\xff\xd8")  # SOI (no JFIF APP0: lossless codes
    # source components directly, JFIF would wrongly declare YCbCr)
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, Tq unused
    out += _seg(0xFFC3, sof)
    dht = b""
    for t, (bits, vals) in enumerate(specs):
        dht += _dht_body(0, t, bits, vals)
    out += _seg(0xFFC4, dht)
    if restart_rows:
        out += _seg(0xFFDD, struct.pack(">H", restart_rows * w))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, tbl_of[ci] << 4])  # Ta unused in lossless
    sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah=0, Al=Pt
    out += _seg(0xFFDA, sos)

    # ---- entropy-coded scan: sample-interleaved MCUs, raster order ----
    writer = _BitWriter()
    rst = 0
    for r in range(h):
        if restart_rows and r and r % restart_rows == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out += struct.pack(">H", 0xFFD0 + (rst & 7))
            rst += 1
        for c in range(w):
            for ci in range(ncomp):
                code_tbl = codes[tbl_of[ci]]
                d = int(diffs[ci][r, c])
                size = 16 if d == -32768 else _category(d)
                code, length = code_tbl[size]
                writer.put(code, length)
                if size and size != 16:  # SSSS=16 carries no extra bits
                    writer.put(d if d >= 0 else d + (1 << size) - 1, size)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G, Huffman)
# --------------------------------------------------------------------------


# The Annex-K AC tables are SEQUENTIAL tables: they carry only the
# (run, size) symbols baseline needs — no EOBn band-run symbols
# (r << 4, size 0 for r = 1..14), which exist only in progressive
# scans (real progressive files ship custom per-scan tables for the
# same reason). This fixed table covers the full progressive AC
# alphabet — all 16 runs x sizes 0..10, EOBn and ZRL included — as a
# flat 9-bit canonical code: 176 symbols x 2^-9 = 0.34 Kraft sum, a
# legal (if uncompressed-ish) Huffman table any decoder accepts.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
assert sum(PROG_AC_BITS) == len(PROG_AC_VALS)


def _emit_eobrun(
    writer: _BitWriter,
    ac_codes: dict[int, tuple[int, int]],
    eobrun: int,
    pending: list[int],
) -> int:
    """Flush a pending EOBn band run: the (nbits << 4) symbol, its
    low-order extra bits, then every buffered correction bit that
    belongs to the blocks inside the run (refinement scans only —
    first scans always pass an empty list)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        writer.put(code, length)
        if nbits:
            writer.put(eobrun, nbits)
        for b in pending:
            writer.put(b, 1)
        pending.clear()
    return 0


def _ac_first_encode_block(
    writer: _BitWriter,
    ac_codes: dict[int, tuple[int, int]],
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
    _none: list[int],
) -> int:
    """First AC pass of one block: baseline run-length coding with the
    point transform (magnitude >> al, truncation toward zero) and EOBn
    band runs instead of plain EOB."""
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        a = abs(t) >> al
        if a == 0:
            r += 1
            continue
        if eobrun > 0:
            eobrun = _emit_eobrun(writer, ac_codes, eobrun, _none)
        while r > 15:
            code, length = ac_codes[0xF0]
            writer.put(code, length)
            r -= 16
        nbits = a.bit_length()
        code, length = ac_codes[(r << 4) | nbits]
        writer.put(code, length)
        v = a if t >= 0 else -a
        writer.put(v if v >= 0 else v + (1 << nbits) - 1, nbits)
        r = 0
    if r > 0:
        eobrun += 1
        if eobrun == 0x7FFF:  # spec cap on a single EOBn run
            eobrun = _emit_eobrun(writer, ac_codes, eobrun, _none)
    return eobrun


def _ac_refine_encode_block(
    writer: _BitWriter,
    ac_codes: dict[int, tuple[int, int]],
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
    pending: list[int],
) -> int:
    """Refinement AC pass of one block (the libjpeg
    encode_mcu_AC_refine structure): newly-nonzero coefficients
    (shifted magnitude exactly 1) get (run, 1) symbols + a sign bit;
    previously-nonzero ones contribute one buffered correction bit,
    emitted after the next symbol (or with the EOB run that swallows
    them); zero-runs count zero-history positions only."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the last newly-nonzero coefficient
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k
    r = 0
    br: list[int] = []  # this block's own correction bits
    for k in range(ss, se + 1):
        a = absv[k - ss]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            eobrun = _emit_eobrun(writer, ac_codes, eobrun, pending)
            code, length = ac_codes[0xF0]
            writer.put(code, length)
            r -= 16
            for b in br:
                writer.put(b, 1)
            br = []
        if a > 1:  # previously nonzero: buffer its correction bit
            br.append(a & 1)
            continue
        eobrun = _emit_eobrun(writer, ac_codes, eobrun, pending)
        code, length = ac_codes[(r << 4) | 1]
        writer.put(code, length)
        writer.put(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            writer.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        eobrun += 1
        pending.extend(br)
        if eobrun == 0x7FFF:
            eobrun = _emit_eobrun(writer, ac_codes, eobrun, pending)
    return eobrun


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    PROGRESSIVE (SOF2) JFIF JPEG using the standard spectral-selection
    + successive-approximation scan script (the libjpeg jcparam.c
    default: coarse DC first, banded coarse AC, then one-bit
    refinement passes). ``restart_interval`` > 0 emits DRI + RSTn
    every that many MCUs of EACH scan (for a non-interleaved scan an
    MCU is one block), flushing any open EOB run first — real
    progressive files carry restarts, so this exists to test the
    decoder path. Decodes to the exact same pixels as the baseline
    encode of the same image — both entropy-code the same quantized
    coefficients losslessly."""
    gray, h, w, hv, qy, qc, quant_blocks, true_dims, mcus_x, mcus_y = (
        _quantize_components(arr, quality, subsampling)
    )
    ncomp = 1 if gray else 3
    tbl_of = [0] + [1, 1][: max(0, ncomp - 1)]
    dc_codes = [
        _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    prog_ac = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    # zigzag views of every component's quantized blocks, int
    zzs = [
        qb.reshape(qb.shape[0], qb.shape[1], 64)[:, :, ZIGZAG]
        for qb in quant_blocks
    ]

    # ---- headers (same as baseline except the SOF marker) ----
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0))
    body = bytes([0x00]) + qy.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    if not gray:
        body += bytes([0x01]) + qc.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out += _seg(0xFFDB, body)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, hv[ci][0] << 4 | hv[ci][1], tbl_of[ci]])
    out += _seg(0xFFC2, sof)
    dht = _dht_body(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) + _dht_body(
        1, 0, PROG_AC_BITS, PROG_AC_VALS
    )
    if not gray:
        dht += _dht_body(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _seg(0xFFC4, dht)

    # the jcparam.c default script: (comp or None=all-DC, ss, se, ah, al)
    if gray:
        script = [
            (None, 0, 0, 0, 1),
            (0, 1, 63, 0, 2),
            (0, 1, 63, 2, 1),
            (None, 0, 0, 1, 0),
            (0, 1, 63, 1, 0),
        ]
    else:
        script = [
            (None, 0, 0, 0, 1),
            (0, 1, 5, 0, 2),
            (2, 1, 63, 0, 1),
            (1, 1, 63, 0, 1),
            (0, 6, 63, 0, 2),
            (0, 1, 63, 2, 1),
            (None, 0, 0, 1, 0),
            (2, 1, 63, 1, 0),
            (1, 1, 63, 1, 0),
            (0, 1, 63, 1, 0),
        ]

    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    for comp, ss, se, ah, al in script:
        # T.81 E.1.4: the RSTn modulo-8 count restarts at RST0 in each
        # scan — strict decoders (libjpeg) validate the index and would
        # resync/skip data if numbering continued across scans
        rst = 0
        members = list(range(ncomp)) if comp is None else [comp]
        sos = bytes([len(members)])
        for ci in members:
            # DC scans reference the per-component DC table; AC scans
            # all share the progressive AC table (class 1, id 0)
            sos += bytes([ci + 1, (tbl_of[ci] << 4) if ss == 0 else 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        writer = _BitWriter()
        since = 0
        if ss == 0:  # DC scan (interleaved over the full MCU grid)
            prev_dc = [0] * len(members)
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and since == restart_interval:
                        writer.flush()
                        out += writer.out
                        writer = _BitWriter()
                        out += struct.pack(">H", 0xFFD0 + (rst & 7))
                        rst += 1
                        prev_dc = [0] * len(members)
                        since = 0
                    since += 1
                    for mi, ci in enumerate(members):
                        ch, cv = hv[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                v = int(zzs[ci][my * cv + by, mx * ch + bx, 0])
                                if ah == 0:
                                    v >>= al  # arithmetic shift (G.1.2.1)
                                    diff = v - prev_dc[mi]
                                    prev_dc[mi] = v
                                    size = _category(diff)
                                    code, length = dc_codes[tbl_of[ci]][size]
                                    writer.put(code, length)
                                    if size:
                                        writer.put(
                                            diff
                                            if diff >= 0
                                            else diff + (1 << size) - 1,
                                            size,
                                        )
                                else:
                                    writer.put((v >> al) & 1, 1)
        else:  # AC scan: single component, true block grid
            ci = members[0]
            act = prog_ac
            bh, bw = true_dims[ci]
            eobrun = 0
            pending: list[int] = []
            block_fn = _ac_first_encode_block if ah == 0 else _ac_refine_encode_block
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and since == restart_interval:
                        eobrun = _emit_eobrun(writer, act, eobrun, pending)
                        writer.flush()
                        out += writer.out
                        writer = _BitWriter()
                        out += struct.pack(">H", 0xFFD0 + (rst & 7))
                        rst += 1
                        since = 0
                    since += 1
                    eobrun = block_fn(
                        writer, act, zzs[ci][by, bx], ss, se, al, eobrun, pending
                    )
            _emit_eobrun(writer, act, eobrun, pending)
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over already-unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                return 0  # only reachable past a final EOB-terminated block
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a size-bit magnitude code to its signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_sym(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: bad Huffman code in scan")


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded scan into unstuffed segments between
    restart markers; returns (segments, index of the terminating
    marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _ac_first_block(
    reader: _BitReader,
    actab: dict[tuple[int, int], int],
    coef: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """First AC pass of a progressive scan over one block (T.81
    G.1.2.2): run-length Huffman like baseline, plus EOBn band-run
    symbols (size 0, run < 15 → skip 2^run + extra blocks) and the
    point transform (values enter shifted left by ``al``)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_sym(reader, actab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run != 15:  # EOBn
                eobrun = (1 << run) - 1
                if run:
                    eobrun += reader.read(run)
                break
            k += 16  # ZRL
        else:
            k += run
            if k > se:
                raise ValueError("invalid JPEG: AC index overflow")
            coef[k] = _extend(reader.read(size), size) << al
            k += 1
    return eobrun


def _ac_refine_block(
    reader: _BitReader,
    actab: dict[tuple[int, int], int],
    coef: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Successive-approximation AC refinement over one block (T.81
    G.1.2.3): zero-run symbols count ZERO-HISTORY coefficients only;
    every already-nonzero coefficient passed along the way carries one
    correction bit that may add ±2^al toward larger magnitude."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_sym(reader, actab)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:  # EOBn: current block joins the band run
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.read(run)
                    break
                newval = 0  # ZRL: 16 zero-history positions, no new coef
            else:
                if size != 1:
                    raise ValueError("invalid JPEG: AC refinement size != 1")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if size and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(coef[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(content: bytes, _raw_lossless: bool = False) -> np.ndarray:
    """Decode a sequential (interleaved or one-scan-per-component,
    8- or 12-bit), progressive, or LOSSLESS (SOF3, r13) JPEG to uint8
    — (h, w, 3) RGB for color, (h, w) for grayscale; >8-bit samples
    are scaled down to the uint8 contract (use
    ``decode_jpeg_lossless`` for true-precision output). Raises
    ValueError on arithmetic-coded / hierarchical streams (and
    partial-interleave scan layouts) rather than mis-decoding them."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    lossless = False
    restart_interval = 0
    i = 2
    n = len(content)
    # each scan: (comps [(cid, td, ta)], ss, se, ah, al, segs,
    #             restart_interval, huffman-table snapshot)
    scans: list[tuple] = []
    while i < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xFF, 0x00) or 0xD0 <= marker <= 0xD7:
            i += 2 if marker != 0xFF else 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", content, i + 2)
        body = content[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", count=64, offset=p)
                    p += 128
                else:
                    vals = np.frombuffer(body, np.uint8, count=64, offset=p)
                    p += 64
                tbl = np.zeros(64, dtype=np.float64)
                tbl[ZIGZAG] = vals.astype(np.float64)
                qtables[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # SOF0/1 sequential, SOF2 progressive, SOF3 lossless (r13)
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(f"bad lossless JPEG precision {prec}")
            elif progressive and prec != 8:
                raise ValueError("progressive JPEG decode is 8-bit only")
            elif prec not in (8, 12):
                raise ValueError(f"unsupported JPEG precision {prec} (8/12-bit)")
            comps = []
            for c in range(ncomp):
                cid, hvb, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hvb >> 4, hvb & 0x0F, tq))
            frame = (prec, fh, fw, comps)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF marker 0xFF{marker:02X}) — "
                "Huffman sequential/progressive/lossless only (no "
                "arithmetic coding, no hierarchical mode)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scomps = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ns)
            ]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            segs, i = _split_scan(content, i)
            # snapshot the table dict: DHT between scans rebinds keys
            scans.append(
                (scomps, ss, se, ahal >> 4, ahal & 0x0F, segs,
                 restart_interval, dict(htables))
            )
            continue
        # APPn / COM / others: skipped via seglen
    if frame is None or not scans:
        raise ValueError("invalid JPEG: missing SOF/SOS")
    prec, fh, fw, comps = frame
    if lossless:
        raw = _decode_lossless(prec, fh, fw, comps, scans)
        if _raw_lossless:
            return raw if raw.shape[2] > 1 else raw[:, :, 0]
        if prec > 8:
            raw = raw >> (prec - 8)
        elif prec < 8:
            raw = raw << (8 - prec)
        out8 = np.clip(raw, 0, 255).astype(np.uint8)
        return out8 if out8.shape[2] > 1 else out8[:, :, 0]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    comp_idx = {c[0]: ci for ci, c in enumerate(comps)}
    # zigzag-order int coefficient store per component, full MCU grid;
    # true_dims is the NON-padded block grid non-interleaved scans cover
    coeffs = [
        np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
        for _cid, ch, cv, _tq in comps
    ]
    true_dims = []
    for _cid, ch, cv, _tq in comps:
        comp_h = -(-fh * cv // vmax)  # ceil(fh * cv / vmax)
        comp_w = -(-fw * ch // hmax)
        true_dims.append((-(-comp_h // 8), -(-comp_w // 8)))

    if progressive:
        for scomps, ss, se, ah, al, segs, rst_int, tabs in scans:
            _decode_progressive_scan(
                scomps, ss, se, ah, al, segs, rst_int, tabs,
                comps, comp_idx, coeffs, true_dims, mcus_x, mcus_y,
            )
    else:
        # Sequential: either ONE interleaved scan covering every frame
        # component in frame order (the overwhelmingly common layout),
        # or a non-interleaved multi-scan stream whose single-
        # component scans cover each component exactly once (legal
        # baseline, occasionally emitted; r11 — previously rejected).
        # Partial-interleave layouts (a scan covering a strict subset
        # of >1 components) stay rejected → decode_image's documented
        # deterministic fallback.
        full_interleave = (
            len(scans) == 1
            and [s[0] for s in scans[0][0]] == [c[0] for c in comps]
        )
        noninterleaved = all(len(sc[0]) == 1 for sc in scans) and sorted(
            sc[0][0][0] for sc in scans
        ) == sorted(c[0] for c in comps)
        if not full_interleave and not noninterleaved:
            raise ValueError(
                "unsupported JPEG scan layout: expected one interleaved scan "
                "covering all frame components or one scan per component, "
                f"got {[[s[0] for s in sc[0]] for sc in scans]}"
            )
        for scan, _ss, _se, _ah, _al, segs, rst_int, tabs in scans:
            order = []
            for cid, td, ta in scan:
                _c, ch, cv, _tq = comps[comp_idx[cid]]
                order.append((comp_idx[cid], ch, cv, tabs[(0, td)], tabs[(1, ta)]))
            seg_idx = 0
            reader = _BitReader(segs[0])
            prev_dc = [0] * len(order)
            since_restart = 0
            if full_interleave:
                units = (
                    (my, mx) for my in range(mcus_y) for mx in range(mcus_x)
                )
            else:
                # non-interleaved MCU = one block of the single
                # component, raster over its true (non-padded) grid
                bh, bw = true_dims[order[0][0]]
                units = ((by, bx) for by in range(bh) for bx in range(bw))
            for uy, ux in units:
                if rst_int and since_restart == rst_int:
                    seg_idx += 1
                    if seg_idx >= len(segs):
                        raise ValueError("invalid JPEG: missing restart segment")
                    reader = _BitReader(segs[seg_idx])
                    prev_dc = [0] * len(order)
                    since_restart = 0
                for mi, (ci, ch, cv, dct_t, act_t) in enumerate(order):
                    blocks = (
                        (
                            (uy * cv + by, ux * ch + bx)
                            for by in range(cv)
                            for bx in range(ch)
                        )
                        if full_interleave
                        else ((uy, ux),)
                    )
                    for by, bx in blocks:
                        zz = coeffs[ci][by, bx]
                        size = _decode_sym(reader, dct_t)
                        diff = _extend(reader.read(size), size) if size else 0
                        prev_dc[mi] += diff
                        zz[0] = prev_dc[mi]
                        k = 1
                        while k < 64:
                            rs = _decode_sym(reader, act_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("invalid JPEG: AC index overflow")
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                since_restart += 1

    planes = []
    for (cid, ch, cv, tq), arr in zip(comps, coeffs):
        qtbl = qtables[tq]
        bh, bw = arr.shape[0], arr.shape[1]
        blocks = np.zeros((bh, bw, 8, 8), dtype=np.float64)
        # inverse zigzag: encoder gathered zz[i] = natural[ZIGZAG[i]],
        # so scatter back with the same index array
        blocks.reshape(bh, bw, 64)[:, :, ZIGZAG] = arr.astype(np.float64)
        blocks *= qtbl
        pix = np.einsum("ik,yxkl,jl->yxij", _DCT.T, blocks, _DCT.T)
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + float(
            1 << (prec - 1)
        )
        # upsample to full MCU-grid resolution (nearest — the JFIF
        # baseline convention; smooth upsampling is a decoder choice)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        if prec > 8:  # uint8 output contract: scale 12-bit down
            plane = plane / float(1 << (prec - 8))
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def _decode_progressive_scan(
    scomps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    segs: list[bytes],
    rst_int: int,
    tabs: dict[tuple[int, int], dict[tuple[int, int], int]],
    comps: list[tuple[int, int, int, int]],
    comp_idx: dict[int, int],
    coeffs: list[np.ndarray],
    true_dims: list[tuple[int, int]],
    mcus_x: int,
    mcus_y: int,
) -> None:
    """Apply ONE progressive scan to the coefficient store. DC scans
    (ss == 0) may be interleaved over the MCU grid; AC scans are
    single-component by spec and walk that component's true (non-
    padded) block grid in raster order. Restart markers reset the DC
    predictors and the EOB run."""
    seg_idx = 0
    reader = _BitReader(segs[0])
    since = 0

    def maybe_restart() -> None:
        nonlocal seg_idx, reader, since, prev_dc, eobrun
        if rst_int and since == rst_int:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("invalid JPEG: missing restart segment")
            reader = _BitReader(segs[seg_idx])
            prev_dc = [0] * len(scomps)
            eobrun = 0
            since = 0

    prev_dc = [0] * len(scomps)
    eobrun = 0
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("invalid JPEG: DC scan with Se != 0")
        members = [(comp_idx[cid], td) for cid, td, _ta in scomps]
        if len(members) > 1:  # interleaved over the full MCU grid
            for _my in range(mcus_y):
                for _mx in range(mcus_x):
                    maybe_restart()
                    for mi, (ci, td) in enumerate(members):
                        _cid, ch, cv, _tq = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                coef = coeffs[ci][_my * cv + by, _mx * ch + bx]
                                if ah == 0:
                                    size = _decode_sym(reader, tabs[(0, td)])
                                    diff = (
                                        _extend(reader.read(size), size)
                                        if size
                                        else 0
                                    )
                                    prev_dc[mi] += diff
                                    coef[0] = prev_dc[mi] << al
                                elif reader.read_bit():
                                    coef[0] |= 1 << al
                    since += 1
        else:
            ci, td = members[0]
            bh, bw = true_dims[ci]
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    coef = coeffs[ci][by, bx]
                    if ah == 0:
                        size = _decode_sym(reader, tabs[(0, td)])
                        diff = _extend(reader.read(size), size) if size else 0
                        prev_dc[0] += diff
                        coef[0] = prev_dc[0] << al
                    elif reader.read_bit():
                        coef[0] |= 1 << al
                    since += 1
        return
    # AC scan: exactly one component (T.81 G.1)
    if len(scomps) != 1:
        raise ValueError("invalid JPEG: interleaved AC progressive scan")
    cid, _td, ta = scomps[0]
    ci = comp_idx[cid]
    actab = tabs[(1, ta)]
    bh, bw = true_dims[ci]
    for by in range(bh):
        for bx in range(bw):
            maybe_restart()
            coef = coeffs[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(reader, actab, coef, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, actab, coef, ss, se, al, eobrun)
            since += 1


# --------------------------------------------------------------------------
# Lossless decoder (T.81 Annex H)
# --------------------------------------------------------------------------


def _decode_lossless(
    prec: int, fh: int, fw: int, comps: list, scans: list
) -> np.ndarray:
    """Reconstruct a SOF3 lossless frame: sequential Huffman decode of
    SSSS-category differences (DC-table coding, SSSS=16 → diff 32768
    with no magnitude bits), per-sample prediction with the H.1.2.1
    boundary rules (scan/restart start → 2^(P-Pt-1), rest of that
    line → Ra, other line starts → Rb), modulo-65536 reconstruction,
    output shifted left by the point transform. Handles the
    sample-interleaved single scan our encoder emits AND
    one-scan-per-component streams; subsampled (non-1x1) lossless
    frames are rejected. Returns int32 (fh, fw, ncomp) at TRUE
    precision."""
    for _cid, ch, cv, _tq in comps:
        if (ch, cv) != (1, 1):
            raise ValueError("subsampled lossless JPEG not supported")
    comp_idx = {c[0]: ci for ci, c in enumerate(comps)}
    planes = np.zeros((fh, fw, len(comps)), dtype=np.int64)
    covered: set[int] = set()
    for scomps, ss, _se, _ah, al, segs, rst_int, tabs in scans:
        predictor, pt = ss, al
        if not 1 <= predictor <= 7:
            raise ValueError(f"bad lossless predictor selection {predictor}")
        if not 0 <= pt < prec:
            raise ValueError(f"bad lossless point transform {pt}")
        default = 1 << (prec - pt - 1)
        idxs = [comp_idx[cid] for cid, _td, _ta in scomps]
        tables = [tabs[(0, td)] for _cid, td, _ta in scomps]
        views = [planes[:, :, k] for k in idxs]
        ncs = len(scomps)
        # DRI counts MCUs (= samples here); our encoder emits
        # row-aligned intervals, and row alignment is what makes the
        # boundary rules well-defined — reject the rest
        if rst_int and rst_int % fw != 0:
            raise ValueError("lossless restart interval not row-aligned")
        rows_per_seg = (rst_int // fw) if rst_int else 0
        seg_idx = 0
        reader = _BitReader(segs[0])
        for r in range(fh):
            if rows_per_seg and r and r % rows_per_seg == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("invalid JPEG: missing restart segment")
                reader = _BitReader(segs[seg_idx])
            line_start = (r % rows_per_seg == 0) if rows_per_seg else (r == 0)
            for c in range(fw):
                for k in range(ncs):
                    sym = _decode_sym(reader, tables[k])
                    if sym == 16:
                        d = 32768
                    elif sym:
                        d = _extend(reader.read(sym), sym)
                    else:
                        d = 0
                    pl = views[k]
                    if line_start:
                        px = default if c == 0 else int(pl[r, c - 1])
                    elif c == 0:
                        px = int(pl[r - 1, 0])
                    else:
                        ra = int(pl[r, c - 1])
                        rb = int(pl[r - 1, c])
                        rc = int(pl[r - 1, c - 1])
                        if predictor == 1:
                            px = ra
                        elif predictor == 2:
                            px = rb
                        elif predictor == 3:
                            px = rc
                        elif predictor == 4:
                            px = ra + rb - rc
                        elif predictor == 5:
                            px = ra + ((rb - rc) >> 1)
                        elif predictor == 6:
                            px = rb + ((ra - rc) >> 1)
                        else:
                            px = (ra + rb) >> 1
                    pl[r, c] = (px + d) & 0xFFFF
        for k in idxs:
            planes[:, :, k] <<= pt
        covered.update(idxs)
    if covered != set(range(len(comps))):
        raise ValueError("lossless scans do not cover every component")
    return planes.astype(np.int32)


def decode_jpeg_lossless(content: bytes) -> np.ndarray:
    """Decode a lossless (SOF3) JPEG at TRUE sample precision:
    int32 (h, w) for one component, (h, w, ncomp) otherwise — the
    bit-exact inverse of ``encode_jpeg_lossless`` at Pt=0."""
    return decode_jpeg(content, _raw_lossless=True)
