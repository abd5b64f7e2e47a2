"""Minimal WAV (RIFF PCM) codec — pure stdlib + numpy.

Decoder: canonical RIFF/WAVE with PCM (format 1) or IEEE-float (format
3) data, 8/16/32-bit integer or 32/64-bit float samples, any channel
count; unknown chunks are skipped per the RIFF contract. Returns samples
as an (n_frames, n_channels) array. Encoder writes 16-bit PCM and is the
test referee.

Gives the multimodal audio column a REAL decode kernel (the image twin
is operators.jpeg / the PNG decoder): per-payload inside Arrow-batched
``mapInPandas``, so decode parallelism is the table's partitioning.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

_INT_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_FLOAT_DTYPES = {32: np.dtype("<f4"), 64: np.dtype("<f8")}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload -> (samples, sample_rate); samples is
    (n_frames, n_channels) in the container's native dtype."""
    if len(payload) < 12 or payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _bps, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if audio_fmt == 1:
        dtype = _INT_DTYPES.get(bits)
    elif audio_fmt == 3:
        dtype = _FLOAT_DTYPES.get(bits)
    else:
        raise NotImplementedError(f"WAV format {audio_fmt} unsupported")
    if dtype is None:
        raise NotImplementedError(f"WAV {bits}-bit format-{audio_fmt} unsupported")
    samples = np.frombuffer(data, dtype=dtype)
    n_frames = len(samples) // n_ch
    return samples[: n_frames * n_ch].reshape(n_frames, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode (n_frames,) or (n_frames, n_channels) int16 samples as
    canonical 16-bit PCM WAV — the test referee."""
    s = np.asarray(samples, dtype=np.dtype("<i2"))
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
