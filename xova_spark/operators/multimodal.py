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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")


def decode_image_real(payload: bytes) -> "np.ndarray":
    """Real codec hook — swap in PIL/libvips when available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "no image codec in this environment; multimodal transforms run "
            "on the deterministic fake decode (_fake_decode)"
        ) from e
    raise NotImplementedError("wire PIL decode here when the codec ships")


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


def decode_stats(media: DataFrame) -> DataFrame:
    """decode -> per-item sample statistics (n_samples, mean/min/max
    intensity). The mapInPandas stage iterates Arrow batches; numpy does
    the per-payload reduction."""
    schema = "doc_id bigint, n_samples int, mean_intensity double, min_intensity int, max_intensity int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [_fake_decode(b) for b in pdf["payload"]]
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
