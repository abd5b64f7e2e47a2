"""Multimodal column operators — opaque binary payloads + typed metadata.

The data model for image/audio/video at 100 TB: payloads are opaque
``binary`` columns, typed metadata (dims, sample rate, frame count)
rides alongside in a struct, and every media transform is an
Arrow-batched ``mapInPandas`` stage — the pipeline shape a training-data
system needs (decode -> feature-extract -> resize / frame-sample).

This container ships no image/audio codecs, so the DECODE KERNEL is
swappable: ``decode_image_real`` raises NotImplementedError until a
codec (PIL / torchvision / ffmpeg) is installed, and the default
``_fake_decode`` is a DETERMINISTIC stand-in — payload bytes ARE the
"pixels" (one byte = one intensity sample). Everything around the
kernel — schema handling, Arrow batch iteration, multi-row (frame
explode) output, metadata propagation, partition independence — is real
and is what the tests and oracle queries verify. The fake is chosen so
every transform is ALSO expressible in ANSI SQL over characters, which
puts the mapInPandas plumbing itself under the driver's hash gate.

Scale notes: mapInPandas streams Arrow batches — peak memory is
O(batch), not O(partition); media tables should be stored with payloads
in their own parquet column (column pruning skips them when a query
touches only metadata); frame explode multiplies rows, so it runs
BEFORE any shuffle-heavy stage and carries only (doc_id, frame_id,
payload) forward.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (spec §11.2.2).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + per-scanline unfilter,
    PNG spec §9): 8-bit depth, non-interlaced, color types 0/2/4/6.
    Returns an (height, width, channels) uint8 array. This is a REAL
    codec for the format training corpora overwhelmingly use for small
    images — no third-party library required."""
    import struct
    import zlib

    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, idat, meta = len(PNG_MAGIC), [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace} "
                    "outside the supported 8-bit non-interlaced subset"
                )
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, ch)


def decode_image_real(payload: bytes) -> "np.ndarray":
    """Real image decode: PNG handled natively (decode_png, stdlib
    zlib), baseline JPEG natively (operators.jpeg — pure numpy Huffman +
    IDCT), GIF natively (operators.gif — LZW); other formats fall
    through to PIL when installed."""
    if payload.startswith(PNG_MAGIC):
        return decode_png(payload)
    from xova_spark.operators.gif import GIF_MAGICS, decode_gif
    from xova_spark.operators.jpeg import JPEG_MAGIC, decode_jpeg

    if payload.startswith(JPEG_MAGIC):
        return decode_jpeg(payload)
    if payload[:6] in GIF_MAGICS:
        return decode_gif(payload)
    try:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError as e:
        raise NotImplementedError(
            "non-PNG/JPEG/GIF payload and no PIL in this environment; "
            "multimodal transforms fall back to the deterministic "
            "_fake_decode"
        ) from e


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes as uint8 samples."""
    return np.frombuffer(payload, dtype=np.uint8)


def media_table(docs: DataFrame) -> DataFrame:
    """Build the typed media table from the documents corpus: payload =
    utf-8 bytes of the text (the opaque blob), media_type cycled by
    doc_id, metadata struct with fake-but-typed dims."""
    payload = F.encode(F.col("text"), "utf-8")
    n = F.octet_length(payload)
    mtype = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            n.alias("n_bytes"),
            F.ceil(F.sqrt(n)).cast("int").alias("width"),
            F.ceil(n / F.ceil(F.sqrt(n))).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.floor(n / F.lit(64)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_auto(payload: bytes) -> np.ndarray:
    """Kernel dispatch: real PNG/JPEG/GIF decode when the payload IS
    one, deterministic byte-sample fake otherwise (flattened to 1-D
    samples either way, so every downstream stat is codec-agnostic)."""
    if payload.startswith(PNG_MAGIC):
        return decode_png(payload).reshape(-1)
    from xova_spark.operators.gif import GIF_MAGICS, decode_gif
    from xova_spark.operators.jpeg import JPEG_MAGIC, decode_jpeg

    if payload.startswith(JPEG_MAGIC):
        return decode_jpeg(payload).reshape(-1)
    if payload[:6] in GIF_MAGICS:
        return decode_gif(payload).reshape(-1)
    return _fake_decode(payload)


def _fake_decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Deterministic audio stand-in: payload bytes as mono uint8 samples
    at a nominal 16 kHz (the audio twin of _fake_decode)."""
    return np.frombuffer(payload, dtype=np.uint8)[:, None].astype(np.float64), 16000


def decode_audio_auto(payload: bytes) -> tuple[np.ndarray, int]:
    """Audio kernel dispatch: REAL RIFF/WAVE decode (operators.wav) when
    the payload is one, byte-sample fake otherwise. Returns
    ((n_frames, n_channels) float array, sample_rate)."""
    from xova_spark.operators.wav import WAV_MAGIC, decode_wav

    if payload.startswith(WAV_MAGIC):
        samples, rate = decode_wav(payload)
        return samples.astype(np.float64), rate
    return _fake_decode_audio(payload)


def audio_stats(media: DataFrame, kernel=_fake_decode_audio) -> DataFrame:
    """decode -> per-clip audio statistics (frames, channels, rate,
    duration, RMS) — the audio twin of decode_stats, same Arrow-batched
    mapInPandas shape. Pass ``decode_audio_auto`` to run real WAV
    payloads through the same plumbing."""
    schema = (
        "doc_id bigint, n_frames int, n_channels int, sample_rate int, "
        "duration_s double, rms double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = kernel(b)
                nf, nc = samples.shape
                rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                rows.append((doc_id, nf, nc, rate, nf / rate, rms))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_channels", "sample_rate",
                    "duration_s", "rms",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def decode_stats(media: DataFrame, kernel=_fake_decode) -> DataFrame:
    """decode -> per-item sample statistics (n_samples, mean/min/max
    intensity). The mapInPandas stage iterates Arrow batches; numpy does
    the per-payload reduction. ``kernel`` selects the decode (the
    oracle queries pin the deterministic fake; pass ``decode_auto`` to
    run real PNG payloads through the same plumbing)."""
    schema = "doc_id bigint, n_samples int, mean_intensity double, min_intensity int, max_intensity int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [kernel(b).reshape(-1) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_samples": [len(p) for p in px],
                    "mean_intensity": [float(p.sum()) / len(p) for p in px],
                    "min_intensity": [int(p.min()) for p in px],
                    "max_intensity": [int(p.max()) for p in px],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def extract_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """decode -> fixed-width feature vector (intensity histogram over
    n_bins residue classes), the embedding-ish output a downstream
    similarity stage consumes. Columns f0..f{n-1} (int counts)."""
    schema = "doc_id bigint, " + ", ".join(f"f{i} int" for i in range(n_bins))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                px = _fake_decode(b)
                counts = np.bincount(px % n_bins, minlength=n_bins)
                rows.append((doc_id, *(int(c) for c in counts)))
            yield pd.DataFrame(
                rows, columns=["doc_id", *[f"f{i}" for i in range(n_bins)]]
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def resize(media: DataFrame, stride: int = 4) -> DataFrame:
    """'Resize' = deterministic stride-downsample of the sample array
    (the plumbing twin of an image resize: payload in, smaller payload
    out, metadata updated)."""
    schema = "doc_id bigint, payload binary, n_samples int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _fake_decode(b)[::stride].tobytes() for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "payload": out,
                    "n_samples": [len(o) for o in out],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def frame_sample(
    media: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """Video-style frame sampling: split the payload into fixed-size
    frames, keep every n-th — a MULTI-ROW mapInPandas (one input row ->
    many output rows), the shape video decoding pipelines need. Partial
    trailing frames are dropped (codec convention)."""
    schema = "doc_id bigint, frame_id int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(b) // frame_bytes
                for k in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    fids.append(k)
                    frames.append(bytes(b[k * frame_bytes : (k + 1) * frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_id": fids, "frame": frames}
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def frame_histograms(
    media: DataFrame, frame_bytes: int = 64, n_bins: int = 8
) -> DataFrame:
    """Per-frame intensity histograms: split each payload into
    fixed-size frames and emit one row per frame with n_bins residue
    counts (columns h0..h{n-1}) — the feature stage between frame
    sampling and content-aware selection. Multi-row mapInPandas like
    frame_sample; partial trailing frames are dropped."""
    schema = "doc_id bigint, frame_id int, " + ", ".join(
        f"h{i} int" for i in range(n_bins)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                px = _fake_decode(b)
                for k in range(len(px) // frame_bytes):
                    fr = px[k * frame_bytes : (k + 1) * frame_bytes]
                    counts = np.bincount(fr % n_bins, minlength=n_bins)
                    rows.append((doc_id, k, *(int(c) for c in counts)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_id", *[f"h{i}" for i in range(n_bins)]],
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def keyframe_select(
    media: DataFrame,
    frame_bytes: int = 64,
    n_bins: int = 8,
    threshold: int = 16,
) -> DataFrame:
    """Content-aware keyframe selection: a frame is a KEYFRAME when its
    histogram's L1 distance to the PREVIOUS frame exceeds ``threshold``
    (frame 0 always kept) — the standard shot-boundary heuristic.

    The decode/feature boundary is the only Python stage
    (frame_histograms); the distance, lag window, and per-video rollup
    are pure Catalyst — lag partitions by doc_id and orders by
    frame_id, so at 100 TB each video's frames sort within their
    partition group, never globally."""
    hists = frame_histograms(media, frame_bytes, n_bins)
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    l1 = None
    for i in range(n_bins):
        term = F.abs(F.col(f"h{i}") - F.lag(f"h{i}").over(w))
        l1 = term if l1 is None else l1 + term
    scored = hists.withColumn("l1_prev", l1)
    is_key = F.col("l1_prev").isNull() | (F.col("l1_prev") > threshold)
    return (
        scored.withColumn("is_key", is_key.cast("int"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum("is_key").alias("n_keyframes"),
        )
    )


def image_phash(media: DataFrame, kernel=_fake_decode) -> DataFrame:
    """decode -> 64-bit block-mean perceptual hash (aHash family): the
    sample stream is cut into 64 equal index blocks (block of sample i
    is ``i*64 // n`` — exact integer mapping), and bit k is set iff
    block k's mean exceeds the global mean, decided on the INTEGER
    cross-multiplied lattice (block_sum * n > total_sum * block_n — no
    float division, so the hash is bit-identical everywhere). Emitted
    as two 32-bit halves (hash_hi, hash_lo) so the value stays inside
    signed int64.

    Same Arrow-batched mapInPandas shape as decode_stats; downstream
    near-dup grouping is an ordinary shuffle on the hash columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                px = kernel(bytes(b)).reshape(-1).astype(np.int64)
                n = len(px)
                blocks = (np.arange(n) * 64) // n
                bs = np.bincount(blocks, weights=px, minlength=64).astype(
                    np.int64
                )
                bn = np.bincount(blocks, minlength=64).astype(np.int64)
                total = int(px.sum())
                bits = (bs * n) > (total * bn)
                lo = int(sum(int(bits[k]) << k for k in range(32)))
                hi = int(sum(int(bits[32 + k]) << k for k in range(32)))
                out.append((int(doc_id), n, hi, lo))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_samples", "hash_hi", "hash_lo"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, n_samples long, hash_hi long, hash_lo long"
    )


def scene_segments(
    media: DataFrame,
    frame_bytes: int = 64,
    n_bins: int = 8,
    threshold: int = 16,
) -> DataFrame:
    """SCENE SEGMENTATION — group consecutive frames into shots: a new
    scene opens at every shot boundary (the keyframe_select criterion:
    histogram L1 to the previous frame > threshold, frame 0 always a
    boundary), and scene ids are the running count of boundaries.
    Emits one row per (video, scene) with its start frame and length.

    Same single Python stage as keyframe_select (frame_histograms);
    the lag, running-sum window, and per-scene rollup are Catalyst,
    partitioned by doc_id — each video's frames order within their
    group, never globally."""
    hists = frame_histograms(media, frame_bytes, n_bins)
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    l1 = None
    for i in range(n_bins):
        term = F.abs(F.col(f"h{i}") - F.lag(f"h{i}").over(w))
        l1 = term if l1 is None else l1 + term
    marks = hists.withColumn(
        "is_b",
        (l1.isNull() | (l1 > threshold)).cast("int"),
    )
    scene = F.sum("is_b").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marks.withColumn("scene_id", scene.cast("int"))
        .groupBy("doc_id", "scene_id")
        .agg(
            F.min("frame_id").cast("int").alias("start_frame"),
            F.count("*").cast("long").alias("n_frames"),
        )
    )
