"""WebP lossless (VP8L) codec — pure stdlib+numpy decode plus a
fixture-grade encoder.

Everything here derives from the public WebP container / lossless
bitstream specification (RFC 9649 and the "Specification for the WebP
Lossless Bitstream"). The reference repo has no media handling at all
(no counterpart file); this codec exists to narrow the engine's
documented multimodal fake list: WebP-lossless payloads previously
routed to ``_fake_decode_image``. Lossy WebP (a ``VP8 `` chunk) still
needs a real DSP codec and keeps raising → fake.

Decoder scope (full VP8L):
- all four transforms: predictor (14 modes, block-based subimage),
  color transform (per-block ColorTransformElement), subtract-green,
  color-indexing (delta-coded palette incl. sub-byte pixel packing);
- color cache (1..11 bits, 0x1e35a7bd multiplicative hash);
- meta prefix codes (entropy image selecting per-block code groups);
- both prefix-code forms: "simple" (1-2 symbols) and full canonical
  code-lengths with the 19-symbol code-length code and 16/17/18
  repeat extensions;
- LZ77 backward references with the 120-entry short-distance map.

Encoder scope (enough to produce spec-valid fixtures exercising every
decoder path): auto color-indexing for <=256-color images (with pixel
packing), optional subtract-green / uniform color transform / single-
mode predictor transform, optional color cache, literal + run
(distance-1 and vertical distance-w) LZ77 emission, real canonical
length-limited Huffman codes (package-merge fallback), simple-form
trees for degenerate alphabets. One prefix-code group (the decoder's
meta-code path is exercised by hand-built streams in tests).

Distance map note: the 120 short-distance offsets are generated from
the spec's ordering rule (candidates y in [0,7], x in [-8,8], future
pixels excluded, sorted by squared distance, then larger y first,
then positive x first); the generated prefix agrees with the table
listed in the spec.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# --------------------------------------------------------------- bits

_MAX_CODE_LEN = 15  # VP8L prefix codes never exceed 15 bits
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_HASH_MUL = 0x1E35A7BD


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        v = 0
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    """LSB-first bit writer."""

    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Huffman codes are walked MSB-first by the decoder, so emit
        the code's bits most-significant-first into the LSB-first
        stream."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# ------------------------------------------------------------ huffman


def _canonical(lengths) -> list[tuple[int, int, int]]:
    """(symbol, length, code) triples for a canonical prefix code."""
    syms = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out = []
    code = 0
    prev_len = 0
    for ln, s in syms:
        code <<= ln - prev_len
        out.append((s, ln, code))
        code += 1
        prev_len = ln
    return out


class _PrefixCode:
    """Canonical prefix decoder. A single-symbol code reads 0 bits
    per symbol (both the spec's simple form with one symbol and a
    full form whose lengths have one nonzero entry)."""

    __slots__ = ("single", "table")

    def __init__(self, lengths) -> None:
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            return
        self.single = None
        self.table = {}
        for s, ln, code in _canonical(lengths):
            if ln > _MAX_CODE_LEN:
                raise ValueError("VP8L: code length > 15")
            self.table[(ln, code)] = s

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        table = self.table
        for ln in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """One prefix code: simple (1-2 symbols) or full code-lengths form
    with the 19-symbol code-length code and 16/17/18 repeats."""
    lengths = [0] * alphabet_size
    if br.read_bit():  # simple form
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol coded in 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read_bit()
        if s0 >= alphabet_size:
            raise ValueError("VP8L: simple-form symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise ValueError("VP8L: simple-form symbol out of range")
            lengths[s1] = 1
        return _PrefixCode(lengths)
    # full form: code lengths for the code-length alphabet first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bit():  # explicit symbol-count budget
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    i = 0
    prev = 8
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[i] = cl
            i += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                rep, fill = 3 + br.read(2), prev
            elif cl == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if i + rep > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            if fill:
                for k in range(i, i + rep):
                    lengths[k] = fill
            i += rep
    return _PrefixCode(lengths)


def _huffman_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Code lengths for a COMPLETE prefix code over the used symbols,
    depth-limited to ``limit``: plain Huffman first, package-merge
    when the tree runs too deep. Deterministic (symbol-id tiebreaks)."""
    syms = sorted(freqs)
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    # heap items: (weight, min-symbol tiebreak, tree node)
    heap = [(freqs[s], s, ("leaf", s)) for s in syms]
    heapq.heapify(heap)
    while len(heap) > 1:
        w1, t1, n1 = heapq.heappop(heap)
        w2, t2, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (w1 + w2, min(t1, t2), ("node", n1, n2)))
    depths: dict[int, int] = {}
    stack = [(heap[0][2], 0)]
    while stack:
        node, d = stack.pop()
        if node[0] == "leaf":
            depths[node[1]] = max(d, 1)
        else:
            stack.append((node[1], d + 1))
            stack.append((node[2], d + 1))
    if max(depths.values()) <= limit:
        return depths
    return _package_merge(freqs, limit)


def _package_merge(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Length-limited prefix code via package-merge (Larmore-Hirschberg
    1990 — public algorithm); produces a complete code with every
    length <= limit."""
    syms = sorted(freqs)
    n = len(syms)
    if n > (1 << limit):
        raise ValueError("alphabet too large for depth limit")
    leaves = sorted(((freqs[s], (s,)) for s in syms), key=lambda t: (t[0], t[1]))
    merged = list(leaves)
    for _ in range(limit - 1):
        merged.sort(key=lambda t: (t[0], t[1]))
        packages = [
            (
                merged[i][0] + merged[i + 1][0],
                merged[i][1] + merged[i + 1][1],
            )
            for i in range(0, len(merged) - 1, 2)
        ]
        merged = sorted(leaves + packages, key=lambda t: (t[0], t[1]))
    counts: dict[int, int] = {s: 0 for s in syms}
    for _, members in merged[: 2 * n - 2]:
        for s in members:
            counts[s] += 1
    return counts


def _write_prefix_code(
    bw: _BitWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Serialize one prefix code (simple form when it fits, else the
    full code-lengths form with 17/18 zero-run compression); returns
    symbol -> (code, nbits) for the payload writer."""
    nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
    enc = {s: (code, ln) for s, ln, code in _canonical(lengths)}
    if 1 <= len(nz) <= 2 and all(s <= 255 for s, _ in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        s0 = nz[0][0]
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        # simple-form codes: 1 symbol = 0 bits, 2 symbols = 1 bit each
        if len(nz) == 1:
            return {s0: (0, 0)}
        return {s0: (0, 1), nz[1][0]: (1, 1)}
    bw.write(0, 1)  # full form
    # code-length symbol stream: literal lengths + 17/18 zero runs
    stream: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_bits)
    i, total = 0, len(lengths)
    while i < total:
        if lengths[i] == 0:
            j = i
            while j < total and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                take = min(run, 138)
                stream.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                stream.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                stream.append((0, 0, 0))
            i = j
        else:
            stream.append((lengths[i], 0, 0))
            i += 1
    cl_freqs: dict[int, int] = {}
    for sym, _, _ in stream:
        cl_freqs[sym] = cl_freqs.get(sym, 0) + 1
    cl_lengths_map = _huffman_lengths(cl_freqs, 7)
    cl_lengths = [cl_lengths_map.get(s, 0) for s in range(19)]
    bw.write(19 - 4, 4)  # write all 19 code-length code lengths
    for k in range(19):
        bw.write(cl_lengths[_CL_ORDER[k]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    single_cl = len(cl_freqs) == 1
    cl_enc = {s: (code, ln) for s, ln, code in _canonical(cl_lengths)}
    for sym, extra, extra_bits in stream:
        if not single_cl:
            code, ln = cl_enc[sym]
            bw.write_code(code, ln)
        if extra_bits:
            bw.write(extra, extra_bits)
    return enc


# ------------------------------------------------------ LZ77 prefixes


def _lz77_decode_value(br: _BitReader, prefix: int) -> int:
    """length/distance prefix decode: 24-symbol (length) / 40-symbol
    (distance) alphabets share this shape."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_encode_value(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_value, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, v - offset, extra


def _distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance (dx, dy) offsets, generated from the
    spec's ordering (see module docstring)."""
    cand = [
        (x, y)
        for y in range(0, 8)
        for x in range(-8, 9)
        if y > 0 or x > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cand[:120]


_DIST_MAP = _distance_map()
_DIST_INDEX = {off: i + 1 for i, off in enumerate(_DIST_MAP)}


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


def _distance_to_plane(dist: int, xsize: int) -> int:
    """Encoder-side inverse: prefer a short-distance code when the
    offset is in the map (exercises the mapped branch on round-trip)."""
    if xsize > 0:
        dy, dx = divmod(dist, xsize)
        if dx > 8:
            dx -= xsize
            dy += 1
        if -8 <= dx <= 8 and 0 <= dy <= 7:
            code = _DIST_INDEX.get((dx, dy))
            if code is not None and _plane_to_distance(code, xsize) == dist:
                return code
    return dist + 120


# ----------------------------------------------------- image decoding


def _subsampled(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


class _CodeGroup:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _BitReader, cache_size: int) -> None:
        self.green = _read_prefix_code(br, 256 + 24 + cache_size)
        self.red = _read_prefix_code(br, 256)
        self.blue = _read_prefix_code(br, 256)
        self.alpha = _read_prefix_code(br, 256)
        self.dist = _read_prefix_code(br, 40)


def _decode_image_data(
    br: _BitReader, w: int, h: int, *, allow_meta: bool = False
) -> list[int]:
    """One entropy-coded image (spec order: color-cache info, then —
    for spatially coded images only — the meta prefix-code image, then
    the prefix-code groups, then pixels). Returns row-major ARGB
    uint32 values."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: color cache bits out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta_ids = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        meta_w = _subsampled(w, meta_bits)
        meta_img = _decode_image_data(br, meta_w, _subsampled(h, meta_bits))
        # group index = (red << 8) | green of the entropy-image pixel
        meta_ids = [((px >> 8) & 0xFFFF) for px in meta_img]
        n_groups = max(meta_ids) + 1
    groups = [_CodeGroup(br, 1 << cache_bits if cache_bits else 0)
              for _ in range(n_groups)]
    n = w * h
    out = [0] * n
    pos = 0
    g = groups[0]
    row_blk = -1
    while pos < n:
        if meta_ids is not None:
            x = pos % w
            y = pos // w
            blk = (y >> meta_bits) * meta_w + (x >> meta_bits)
            if blk != row_blk:
                g = groups[meta_ids[blk]]
                row_blk = blk
        s = g.green.read(br)
        if s < 256:
            r = g.red.read(br)
            b = g.blue.read(br)
            a = g.alpha.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _lz77_decode_value(br, s - 256)
            dist_code = _lz77_decode_value(br, g.dist.read(br))
            dist = _plane_to_distance(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            if pos + length > n:
                raise ValueError("VP8L: backward reference past end")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[
                        ((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


# ----------------------------------------------------------- transforms


def _argb_split(px: int) -> tuple[int, int, int, int]:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _argb_join(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2(p: tuple, q: tuple) -> tuple:
    return tuple((p[i] + q[i]) >> 1 for i in range(4))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(L: tuple, T: tuple, TL: tuple) -> tuple:
    p = [L[i] + T[i] - TL[i] for i in range(4)]
    p_l = sum(abs(p[i] - L[i]) for i in range(4))
    p_t = sum(abs(p[i] - T[i]) for i in range(4))
    return L if p_l < p_t else T


def _predict(mode: int, L: tuple, T: tuple, TL: tuple, TR: tuple) -> tuple:
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(L, T, TL)
    if mode == 12:
        return tuple(_clamp(L[i] + T[i] - TL[i]) for i in range(4))
    if mode == 13:
        avg = _avg2(L, T)
        # C-style truncating division of the (possibly negative) delta
        return tuple(
            _clamp(avg[i] + int((avg[i] - TL[i]) / 2)) for i in range(4)
        )
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def _inverse_predictor(
    argb: list[int], w: int, h: int, size_bits: int, pred_img: list[int]
) -> None:
    """In-place inverse predictor transform: residual + prediction per
    channel mod 256. Edge rules: (0,0) predicts opaque black, the rest
    of the top row predicts L, the left column predicts T; the
    rightmost column's TR wraps to the first pixel of the current row
    (the flat-index pos - w + 1 convention)."""
    pred_w = _subsampled(w, size_bits)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if pos == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = _argb_split(argb[pos - 1])
        elif x == 0:
            pred = _argb_split(argb[pos - w])
        else:
            mode = (
                pred_img[(y >> size_bits) * pred_w + (x >> size_bits)] >> 8
            ) & 0xFF
            L = _argb_split(argb[pos - 1])
            T = _argb_split(argb[pos - w])
            TL = _argb_split(argb[pos - w - 1])
            TR = _argb_split(argb[pos - w + 1])
            pred = _predict(mode, L, T, TL, TR)
        res = _argb_split(argb[pos])
        argb[pos] = _argb_join(
            (res[0] + pred[0]) & 0xFF,
            (res[1] + pred[1]) & 0xFF,
            (res[2] + pred[2]) & 0xFF,
            (res[3] + pred[3]) & 0xFF,
        )


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: both arguments as int8, product >> 5
    (arithmetic)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inverse_color_transform(
    argb: list[int], w: int, h: int, size_bits: int, ct_img: list[int]
) -> None:
    """In-place inverse color transform. The ColorTransformElement is
    carried as a pixel: red = red_to_blue, green = green_to_blue,
    blue = green_to_red. Decoding ADDS the deltas, restoring red
    before blue uses it."""
    ct_w = _subsampled(w, size_bits)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        cte = ct_img[(y >> size_bits) * ct_w + (x >> size_bits)]
        r2b = (cte >> 16) & 0xFF
        g2b = (cte >> 8) & 0xFF
        g2r = cte & 0xFF
        px = argb[pos]
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
        argb[pos] = _argb_join(a, r, g, b)


def _inverse_subtract_green(argb: list[int]) -> None:
    for pos, px in enumerate(argb):
        g = (px >> 8) & 0xFF
        r = ((px >> 16) + g) & 0xFF
        b = (px + g) & 0xFF
        argb[pos] = (px & 0xFF00FF00) | (r << 16) | b


def _palette_xbits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_color_indexing(
    argb: list[int], packed_w: int, h: int, full_w: int,
    palette: list[int], xbits: int,
) -> list[int]:
    """Unpack sub-byte indices (xbits > 0 packs 1 << xbits pixels per
    green byte, low bits first) and map through the palette.
    Out-of-range indices resolve to transparent black (0) — the spec's
    behavior for indices past the palette end."""
    out = [0] * (full_w * h)
    per = 1 << xbits
    bit_w = 8 >> xbits
    mask = (1 << bit_w) - 1
    n_pal = len(palette)
    for y in range(h):
        for px_i in range(packed_w):
            g = (argb[y * packed_w + px_i] >> 8) & 0xFF
            base_x = px_i << xbits
            for k in range(per):
                x = base_x + k
                if x >= full_w:
                    break
                idx = (g >> (k * bit_w)) & mask
                out[y * full_w + x] = palette[idx] if idx < n_pal else 0
    return out


# ------------------------------------------------------ VP8L top level


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload to (h, w, 4) RGBA uint8."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    # transform chain — each type at most once; color-indexing shrinks
    # the coded width for everything read after it
    transforms: list[tuple] = []
    seen: set[int] = set()
    cur_w = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            size_bits = br.read(3) + 2
            data = _decode_image_data(
                br, _subsampled(cur_w, size_bits), _subsampled(h, size_bits)
            )
            transforms.append(("predictor", size_bits, data, cur_w))
        elif ttype == 1:  # color transform
            size_bits = br.read(3) + 2
            data = _decode_image_data(
                br, _subsampled(cur_w, size_bits), _subsampled(h, size_bits)
            )
            transforms.append(("color", size_bits, data, cur_w))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_deltas = _decode_image_data(br, n_colors, 1)
            # palette entries are stored delta-coded against the
            # previous entry, component-wise mod 256
            palette: list[int] = []
            prev = 0
            for d in pal_deltas:
                a = ((prev >> 24) + (d >> 24)) & 0xFF
                r = ((prev >> 16) + (d >> 16)) & 0xFF
                g = ((prev >> 8) + (d >> 8)) & 0xFF
                b = (prev + d) & 0xFF
                prev = _argb_join(a, r, g, b)
                palette.append(prev)
            xbits = _palette_xbits(n_colors)
            full_w = cur_w
            cur_w = _subsampled(cur_w, xbits)
            transforms.append(("palette", palette, xbits, full_w))
    argb = _decode_image_data(br, cur_w, h, allow_meta=True)
    # inverses run in reverse bitstream order
    for t in reversed(transforms):
        if t[0] == "palette":
            _, palette, xbits, full_w = t
            argb = _inverse_color_indexing(
                argb, cur_w, h, full_w, palette, xbits
            )
            cur_w = full_w
        elif t[0] == "subtract_green":
            _inverse_subtract_green(argb)
        elif t[0] == "color":
            _, size_bits, data, t_w = t
            if t_w != cur_w:
                raise ValueError("VP8L: color transform width mismatch")
            _inverse_color_transform(argb, cur_w, h, size_bits, data)
        else:
            _, size_bits, data, t_w = t
            if t_w != cur_w:
                raise ValueError("VP8L: predictor transform width mismatch")
            _inverse_predictor(argb, cur_w, h, size_bits, data)
    if cur_w != w:
        raise ValueError("VP8L: width not restored by transforms")
    flat = np.asarray(argb, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = (flat >> 16) & 0xFF  # R
    out[:, :, 1] = (flat >> 8) & 0xFF  # G
    out[:, :, 2] = flat & 0xFF  # B
    out[:, :, 3] = (flat >> 24) & 0xFF  # A
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP container to (h, w, 4) RGBA uint8 — lossless
    (VP8L) only. A lossy ``VP8 `` chunk raises ValueError (needs a DSP
    codec; the multimodal layer routes that to the documented fake)."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise ValueError("lossy WebP (VP8) needs a codec library")
        # VP8X / ALPH / EXIF / ... : skip to the next chunk (padded)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L chunk")


# ------------------------------------------------------------- encoder


def _forward_subtract_green(argb: list[int]) -> list[int]:
    out = []
    for px in argb:
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) - g) & 0xFF
        b = ((px & 0xFF) - g) & 0xFF
        out.append((px & 0xFF00FF00) | (r << 16) | b)
    return out


def _forward_color_transform(
    argb: list[int], w: int, h: int, g2r: int, g2b: int, r2b: int
) -> list[int]:
    """Uniform-element forward color transform (the decoder restores
    red first, so blue's r2b delta uses the ORIGINAL red)."""
    out = []
    for px in argb:
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        nr = (r - _ct_delta(g2r, g)) & 0xFF
        nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        out.append(_argb_join(a, nr, g, nb))
    return out


def _forward_predictor(
    argb: list[int], w: int, h: int, mode: int, size_bits: int
) -> list[int]:
    """Residuals for a single predictor mode applied to every block.
    Lossless ⇒ the decoder's reconstructed neighbors equal the
    original pixels, so residual = pixel - predict(original
    neighbors) per channel mod 256."""
    out = []
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if pos == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = _argb_split(argb[pos - 1])
        elif x == 0:
            pred = _argb_split(argb[pos - w])
        else:
            pred = _predict(
                mode,
                _argb_split(argb[pos - 1]),
                _argb_split(argb[pos - w]),
                _argb_split(argb[pos - w - 1]),
                _argb_split(argb[pos - w + 1]),
            )
        cur = _argb_split(argb[pos])
        out.append(
            _argb_join(*[(cur[i] - pred[i]) & 0xFF for i in range(4)])
        )
    return out


def _tokenize_pixels(
    argb: list[int], w: int, cache_bits: int
) -> list[tuple]:
    """Greedy token stream: ('copy', length, dist) for runs of the
    previous pixel (dist 1) or of the pixel above (dist w, vertical
    runs — exercises the 2D short-distance map), ('cache', idx), or
    ('lit', px). Decisions depend only on pixel values, so the same
    stream drives both the histogram pass and the emission pass."""
    toks: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(argb)
    pos = 0
    while pos < n:
        best_len = 0
        best_dist = 0
        for dist in (1, w):
            if dist < 1 or pos < dist:
                continue
            ln = 0
            while pos + ln < n and ln < 4096 and (
                argb[pos + ln] == argb[pos + ln - dist]
            ):
                ln += 1
            if ln > best_len:
                best_len = ln
                best_dist = dist
        if best_len >= 3:
            toks.append(("copy", best_len, best_dist))
            if cache is not None:
                for k in range(best_len):
                    px = argb[pos + k]
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += best_len
            continue
        px = argb[pos]
        if cache is not None:
            idx = ((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                toks.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = px
        toks.append(("lit", px))
        pos += 1
    return toks


def _encode_image_data(
    bw: _BitWriter, argb: list[int], w: int, *, cache_bits: int = 0,
    main: bool = False,
) -> None:
    """One entropy-coded image: single prefix-code group, optional
    color cache, literal/run/cache token emission. The meta-prefix
    bit exists ONLY for the main (spatially coded) image — sub-images
    (transform data, palette) must not carry it."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if main:
        bw.write(0, 1)  # no meta prefix codes
    toks = _tokenize_pixels(argb, w, cache_bits)
    freqs: list[dict[int, int]] = [{} for _ in range(5)]

    def bump(t: int, s: int) -> None:
        freqs[t][s] = freqs[t].get(s, 0) + 1

    for tok in toks:
        if tok[0] == "lit":
            px = tok[1]
            bump(0, (px >> 8) & 0xFF)
            bump(1, (px >> 16) & 0xFF)
            bump(2, px & 0xFF)
            bump(3, (px >> 24) & 0xFF)
        elif tok[0] == "copy":
            bump(0, 256 + _lz77_encode_value(tok[1])[0])
            bump(4, _lz77_encode_value(_distance_to_plane(tok[2], w))[0])
        else:
            bump(0, 280 + tok[1])
    # every tree must exist: unused trees get a 1-symbol simple form
    for t in range(5):
        if not freqs[t]:
            freqs[t] = {0: 1}
    sizes = [256 + 24 + ((1 << cache_bits) if cache_bits else 0),
             256, 256, 256, 40]
    encs = []
    for t in range(5):
        lmap = _huffman_lengths(freqs[t], _MAX_CODE_LEN)
        lengths = [lmap.get(s, 0) for s in range(sizes[t])]
        encs.append(_write_prefix_code(bw, lengths))

    def put(t: int, s: int) -> None:
        code, ln = encs[t][s]
        bw.write_code(code, ln)

    for tok in toks:
        if tok[0] == "lit":
            px = tok[1]
            put(0, (px >> 8) & 0xFF)
            put(1, (px >> 16) & 0xFF)
            put(2, px & 0xFF)
            put(3, (px >> 24) & 0xFF)
        elif tok[0] == "copy":
            lcode, lextra, lbits = _lz77_encode_value(tok[1])
            put(0, 256 + lcode)
            if lbits:
                bw.write(lextra, lbits)
            plane = _distance_to_plane(tok[2], w)
            dcode, dextra, dbits = _lz77_encode_value(plane)
            put(4, dcode)
            if dbits:
                bw.write(dextra, dbits)
        else:
            put(0, 280 + tok[1])


def encode_webp(
    arr: np.ndarray,
    *,
    cache_bits: int = 0,
    subtract_green: bool = False,
    predictor: int | None = None,
    predictor_bits: int = 4,
    color_transform: tuple[int, int, int] | None = None,
    palette: str = "auto",
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w, 4) RGBA uint8 as a lossless WebP
    (RIFF + VP8L). ``palette='auto'`` uses the color-indexing
    transform (with sub-byte packing) when the image has <= 256
    distinct colors and no other transform was requested; 'never'
    disables it; 'force' requires it. The other flags pick the
    transform chain for fixture variety — every combination
    round-trips through :func:`decode_webp`."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"expected (h,w,3|4) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("WebP dimensions must be 1..16384")
    if arr.shape[2] == 3:
        alpha = np.full((h, w), 255, np.uint8)
        rgb = arr
    else:
        alpha = arr[:, :, 3]
        rgb = arr[:, :, :3]
    flat = (
        (alpha.astype(np.uint32) << 24)
        | (rgb[:, :, 0].astype(np.uint32) << 16)
        | (rgb[:, :, 1].astype(np.uint32) << 8)
        | rgb[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    argb = [int(v) for v in flat]
    other_transforms = subtract_green or predictor is not None or (
        color_transform is not None
    )
    uniq = sorted(set(argb))
    use_palette = palette == "force" or (
        palette == "auto" and not other_transforms and len(uniq) <= 256
    )
    if palette == "force" and len(uniq) > 256:
        raise ValueError("palette='force' needs <= 256 distinct colors")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(bool((alpha != 255).any())), 1)
    bw.write(0, 3)  # version
    cur_w = w
    if use_palette:
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(len(uniq) - 1, 8)
        # palette image: delta-coded entries
        deltas = []
        prev = 0
        for px in uniq:
            a = ((px >> 24) - (prev >> 24)) & 0xFF
            r = ((px >> 16) - (prev >> 16)) & 0xFF
            g = ((px >> 8) - (prev >> 8)) & 0xFF
            b = (px - prev) & 0xFF
            deltas.append(_argb_join(a, r, g, b))
            prev = px
        _encode_image_data(bw, deltas, len(uniq))
        index = {px: i for i, px in enumerate(uniq)}
        xbits = _palette_xbits(len(uniq))
        packed_w = _subsampled(w, xbits)
        bit_w = 8 >> xbits
        packed = [0] * (packed_w * h)
        for y in range(h):
            for x in range(w):
                idx = index[argb[y * w + x]]
                g_byte = idx << ((x & ((1 << xbits) - 1)) * bit_w)
                packed[y * packed_w + (x >> xbits)] |= g_byte << 8
        # packed pixels: only the green byte carries data
        packed = [(0xFF << 24) | (px & 0xFF00) for px in packed]
        argb = packed
        cur_w = packed_w
    else:
        # bitstream order = forward application order here (subtract
        # green, then color transform, then predictor), because the
        # decoder inverts in reverse bitstream order
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            argb = _forward_subtract_green(argb)
        if color_transform is not None:
            g2r, g2b, r2b = (c & 0xFF for c in color_transform)
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(predictor_bits - 2, 3)
            tw = _subsampled(cur_w, predictor_bits)
            th = _subsampled(h, predictor_bits)
            cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
            _encode_image_data(bw, [cte] * (tw * th), tw)
            argb = _forward_color_transform(argb, cur_w, h, g2r, g2b, r2b)
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("predictor mode must be 0..13")
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(predictor_bits - 2, 3)
            tw = _subsampled(cur_w, predictor_bits)
            th = _subsampled(h, predictor_bits)
            mode_px = (0xFF << 24) | (predictor << 8)
            _encode_image_data(bw, [mode_px] * (tw * th), tw)
            argb = _forward_predictor(argb, cur_w, h, predictor, predictor_bits)
    bw.write(0, 1)  # end of transforms
    _encode_image_data(bw, argb, cur_w, cache_bits=cache_bits, main=True)
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
