"""Minimal baseline JPEG codec — pure stdlib + numpy, no third-party libs.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale / 3-component
YCbCr with 4:4:4, 4:2:2 or 4:2:0 subsampling, restart markers, standard
Huffman tables (ITU-T T.81 §B.2 / Annex F decode procedures). This covers
the JFIF files training corpora overwhelmingly contain.

Encoder: the test referee only — grayscale or YCbCr 4:4:4, caller-chosen
quantization table (all-ones by default so flat images round-trip exactly).

Used by ``operators.multimodal.decode_image_real`` when the payload is a
JPEG; runs per-payload inside Arrow-batched ``mapInPandas`` stages, so at
100 TB the decode parallelism is the table's partitioning — no driver-side
work. (Reference has no media surface; this extends it for training-data
pipelines.)
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)  # fmt: skip

# 8x8 DCT-II basis matrix: block = C.T @ coef @ C (T.81 §A.3.3).
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_C *= 0.5
_C[0] *= 1 / np.sqrt(2)


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _HuffTable:
    """Canonical Huffman table from DHT (counts, symbols) — T.81 §C.2."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 byte-stuffing, stops at
    markers (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                raise _RestartMarker
            else:
                raise ValueError(f"marker 0x{nxt:02x} inside entropy data")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_restart(self) -> None:
        """Skip to just past the next restart marker and reset bits."""
        self.bits = self.nbits = 0
        while True:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _RestartMarker(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """DC/AC value extension (T.81 §F.2.2.1, EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w) uint8 (grayscale) or (h, w, 3)
    uint8 RGB. Raises NotImplementedError for progressive (SOF2) /
    arithmetic / 12-bit inputs."""
    if not payload.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(body[p + 1 : p + 65], np.uint8).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                n = sum(counts)
                huff[(tc, th)] = _HuffTable(counts, body[p + 17 : p + 17 + n])
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"non-baseline SOF marker 0xff{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tables >> 4, tables & 0x0F)
            pos += seglen
            return _decode_scan(payload, pos, frame, qt, huff, sel, restart_interval)
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, qt, huff, sel, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dc_t = huff[(0, sel[c["id"]][0])]
                    ac_t = huff[(1, sel[c["id"]][1])]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = np.zeros(64, dtype=np.int32)
                            t = reader.decode(dc_t)
                            diff = _extend(reader.read_bits(t), t)
                            pred[ci] += diff
                            coef[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = reader.decode(ac_t)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                coef[k] = _extend(reader.read_bits(s), s)
                                k += 1
                            block = np.zeros(64, dtype=np.float64)
                            block[ZIGZAG] = coef * q
                            px = _idct2(block.reshape(8, 8)) + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            except _RestartMarker:
                # Encoder emitted the marker early for this interval;
                # resync and redo nothing (conservative: data is aligned
                # by the interval logic above on the next MCU).
                raise ValueError("unexpected restart marker mid-MCU") from None
            mcu_count += 1
    # Upsample each component to full resolution (nearest neighbour) and
    # crop to the declared (h, w).
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder — test referee (grayscale or YCbCr 4:4:4, standard tables).
# ---------------------------------------------------------------------------

# Standard luminance Huffman tables (T.81 Annex K.3) — legal for chroma too.
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_SYMBOLS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)  # fmt: skip


def _encode_codes(counts, symbols):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = self.n = 0
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(writer, dc_codes, ac_codes, coef, pred):
    diff = int(coef[0]) - pred
    t = _category(diff)
    writer.write(*dc_codes[t])
    if t:
        writer.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
    run = 0
    last_nz = int(np.max(np.nonzero(coef)[0])) if np.any(coef[1:]) else 0
    for k in range(1, 64):
        v = int(coef[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        writer.write(*ac_codes[(run << 4) | s])
        writer.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if last_nz < 63:
        writer.write(*ac_codes[0x00])  # EOB
    return int(coef[0])


def _encode_plane_block(writer, dc_codes, ac_codes, quant, plane, y0, x0, pred):
    block = np.full((8, 8), 128.0)
    tile = plane[y0 : y0 + 8, x0 : x0 + 8]
    block[: tile.shape[0], : tile.shape[1]] = tile
    coef = np.round(_dct2(block - 128.0)).astype(np.int32)
    zz = coef.reshape(64)[ZIGZAG]
    if (quant != 1).any():
        zz = np.round(zz / quant).astype(np.int32)
    return _encode_block(writer, dc_codes, ac_codes, zz, pred)


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JPEG
    (standard Huffman tables; 4:4:4, or 4:2:0 with ``subsample=True`` —
    chroma 2x2-averaged, MCU = four Y blocks + Cb + Cr). Default quant
    table is all-ones so the only loss is DCT-coefficient rounding (plus
    chroma averaging under 4:2:0) — the property the round-trip tests
    rely on."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if quant is None:
        quant = np.ones(64, dtype=np.int32)
    quant = np.asarray(quant, dtype=np.int32).reshape(64)
    if gray:
        planes = [img]
        subsample = False
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        if subsample:
            # 2x2 mean-pool the chroma planes (edge-pad odd dims first).
            def pool(p):
                p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (
                    p[0::2, 0::2] + p[1::2, 0::2]
                    + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0

            planes = [planes[0], pool(planes[1]), pool(planes[2])]
    nc = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(quant[i]) for i in range(64)
    )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        samp = 0x22 if (subsample and i == 0) else 0x11
        sof += bytes([i + 1, samp, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in (
        (0, _DC_COUNTS, _DC_SYMBOLS),
        (1, _AC_COUNTS, _AC_SYMBOLS),
    ):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_codes = _encode_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _encode_codes(_AC_COUNTS, _AC_SYMBOLS)
    writer = _BitWriter()
    pred = [0] * nc
    if not subsample:
        by, bx = -(-h // 8), -(-w // 8)
        for my in range(by):
            for mx in range(bx):
                for ci, plane in enumerate(planes):
                    pred[ci] = _encode_plane_block(
                        writer, dc_codes, ac_codes, quant, plane,
                        my * 8, mx * 8, pred[ci],
                    )
    else:
        # 4:2:0 MCU order (T.81 §A.2.3): Y00 Y01 Y10 Y11, Cb, Cr.
        by, bx = -(-h // 16), -(-w // 16)
        for my in range(by):
            for mx in range(bx):
                for dy in (0, 1):
                    for dx in (0, 1):
                        pred[0] = _encode_plane_block(
                            writer, dc_codes, ac_codes, quant, planes[0],
                            (my * 2 + dy) * 8, (mx * 2 + dx) * 8, pred[0],
                        )
                for ci in (1, 2):
                    pred[ci] = _encode_plane_block(
                        writer, dc_codes, ac_codes, quant, planes[ci],
                        my * 8, mx * 8, pred[ci],
                    )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
