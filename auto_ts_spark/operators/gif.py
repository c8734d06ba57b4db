"""GIF codec (GIF87a/89a) — pure stdlib + numpy, no codec library.

Decode: full LZW decompression (variable-width codes, CLEAR/EOI,
dictionary growth to 4096), global and local color tables, interlaced
images (Adam-style four-pass row order), GIF89a extension blocks
skipped per spec. Returns the FIRST image frame as (h, w, 3) RGB
uint8 — the image-corpus use case; animation disposal semantics are
out of scope and documented (an animated GIF still decodes: you get
frame 1). Transparency is ignored (the transparent index renders its
palette color) — features over corpus thumbnails don't composite.

Encode: GIF87a with a global color table built from the image's
distinct colors (≤ 256 required — encode exists to round-trip-test
the decoder with palette-limited fixtures, not to quantize photos).

Everything follows the public GIF87a/89a specification; the LZW
variant is the GIF-specific one (code width grows AFTER the table
fills, EOI terminates, CLEAR resets width)."""

from __future__ import annotations

import struct

import numpy as np

_HEADER87 = b"GIF87a"
_HEADER89 = b"GIF89a"


# --------------------------------------------------------------------------
# LZW (GIF variant)
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Decode GIF LZW sub-block payload (already concatenated) into
    index bytes. Stops at EOI or when n_pixels indices are produced."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first within and across bytes (GIF convention)
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        prev = entry
        # GIF grows the code width when the NEXT code would overflow
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encode (emits CLEAR, codes, EOI). Table resets when
    full — the simplest spec-conformant strategy."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# Container
# --------------------------------------------------------------------------


def decode_gif(content: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to (h, w, 3) RGB uint8."""
    if content[:6] not in (_HEADER87, _HEADER89):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(content):
        b = content[pos]
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    content, np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image has no color table")
            min_code_size = content[pos]
            pos += 1
            data = bytearray()
            while content[pos] != 0:
                ln = content[pos]
                data.extend(content[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code_size, w * h), np.uint8
            )
            if len(idx) < w * h:  # truncated: pad with background 0
                idx = np.concatenate([idx, np.zeros(w * h - len(idx), np.uint8)])
            img = table[idx[: w * h]].reshape(h, w, 3)
            if iflags & 0x40:  # interlaced: undo the four-pass row order
                order = np.concatenate(
                    [
                        np.arange(0, h, 8),
                        np.arange(4, h, 8),
                        np.arange(2, h, 4),
                        np.arange(1, h, 2),
                    ]
                )
                out = np.empty_like(img)
                out[order] = img
                img = out
            return img.copy()
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{b:02X} at {pos}")
    raise ValueError("GIF contains no image data")


def encode_gif(arr: np.ndarray, *, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image with ≤ 256 distinct colors
    as GIF87a (exact palette — raises if the image needs quantizing)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors — encode_gif is palette-exact "
            "(≤256); quantize first"
        )
    # palette size must be a power of two ≥ 2
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    min_code_size = max(bits, 2)
    img = arr
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate(
            [
                np.arange(0, h, 8),
                np.arange(4, h, 8),
                np.arange(2, h, 4),
                np.arange(1, h, 2),
            ]
        )
        idx = idx[order]
    lzw = _lzw_encode(idx.reshape(-1).tobytes(), min_code_size)
    out = bytearray(_HEADER87)
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x70) | (bits - 1), 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
