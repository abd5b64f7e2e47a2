"""Minimal GIF decoder — pure stdlib + numpy (LZW per GIF89a spec §22).

Decodes GIF87a/GIF89a: global/local color tables, interlaced images,
multiple frames (returns the first by default or all via
``decode_gif_frames``); transparency index is reported, not composited.
The encoder referee writes a single-frame GIF87a with an uncompressed-
style LZW stream (clear codes every symbol — legal per spec, trivially
correct) so decode must run the real LZW machinery.

Completes the native image-codec family (PNG: multimodal.decode_png,
JPEG: operators.jpeg) behind ``decode_image_real``.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3).copy()
    return table, pos + 3 * n


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW (spec Appendix F): variable code width starting at
    min_code_size+1, clear/eoi codes, dictionary capped at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1, eoi + 1

    table, width, next_code = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == eoi:
                return out[:n_out]
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
            n_out += len(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out[:n_out]


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((h, w), dtype=np.uint8)
    rows = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    for src, dst in enumerate(rows):
        out[dst] = idx[src]
    return out


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every image block -> list of (h, w, 3) uint8 RGB arrays
    (frame-local rectangles; animation composition is out of scope)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    _w, _h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(payload, pos, 2 << (flags & 0x07))
    frames: list[np.ndarray] = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            table = gct
            if iflags & 0x80:
                table, pos = _color_table(payload, pos, 2 << (iflags & 0x07))
            if table is None:
                raise ValueError("GIF image with no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                n = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + n])
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(min_code, b"".join(chunks), iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("GIF LZW stream truncated")
            grid = idx[: iw * ih].reshape(ih, iw)
            if iflags & 0x40:
                grid = _deinterlace(grid, ih, iw)
            frames.append(table[grid])
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]


def encode_gif(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Test referee: single-frame GIF87a from an (h, w) palette-index
    array + (n, 3) palette. Emits a clear code before every pixel code so
    the stream stays at the initial width — legal LZW the decoder must
    still run through its dictionary machinery. ``interlace`` stores the
    rows in the spec's four-pass order (and sets the flag) so the
    decoder's deinterlacer is exercised."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = idx[order]
    n = len(palette)
    size_exp = max(1, int(np.ceil(np.log2(max(n, 2)))))
    table = np.zeros((1 << size_exp, 3), dtype=np.uint8)
    table[:n] = palette
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    min_code = max(2, size_exp)
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    bits = bytearray()
    acc = nbits = 0

    def push(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    push(clear)
    for px in idx.reshape(-1):
        push(int(px))
        push(clear)  # keep the dictionary (and code width) at initial state
    push(eoi)
    if nbits:
        bits.append(acc & 0xFF)
    out += bytes([min_code])
    data = bytes(bits)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
