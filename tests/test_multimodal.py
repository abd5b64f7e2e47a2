"""Multimodal plumbing tests: Arrow-batch independence, multi-row frame
explode conservation, payload column pruning, and the codec stub gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xova_spark.operators import multimodal as MM
from xova_spark.queries.relational import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    return MM.media_table(docs)


def test_codec_fallback_raises_for_unknown_format(media):
    """Formats beyond the native PNG/JPEG codecs still need a
    third-party library; the seam raises clearly when none is
    installed. The fake decode is the oracle-gated kernel."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the fallback path is live, not a stub")
    except ImportError:
        pass
    with pytest.raises((NotImplementedError, ValueError)):
        MM.decode_image_real(b"GIF89a gif-ish payload")
    assert list(MM._fake_decode(b"abc")) == [97, 98, 99]


# -- real PNG codec (stdlib zlib path) --------------------------------------

def _encode_png(pixels, filters=None) -> bytes:
    """Spec-following PNG writer used ONLY as the test's independent
    referee: scanlines are FILTERED here by the spec's forward formulas
    (§9.2), so a correct decode must invert them exactly."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y, ftype in zip(range(h), filters):
        line = px[y].reshape(-1).astype(np.int16)
        out = line.copy()
        if ftype == 1:
            out[ch:] = (line[ch:] - line[:-ch]) % 256
        elif ftype == 2:
            out = (line - prev) % 256
        elif ftype == 3:
            for x in range(w * ch):
                left = int(line[x - ch]) if x >= ch else 0
                out[x] = (int(line[x]) - (left + int(prev[x])) // 2) % 256
        elif ftype == 4:
            for x in range(w * ch):
                left = int(line[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                out[x] = (int(line[x]) - MM._paeth(left, int(prev[x]), ul)) % 256
        raw.append(ftype)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        MM.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    """Golden path: pixels -> spec-filtered scanlines -> decode -> the
    same pixels, for every PNG filter type and for gray/RGB/RGBA."""
    import numpy as np

    rng = np.random.RandomState(7)
    for ch in (1, 3, 4):
        px = rng.randint(0, 256, size=(5, 4, ch)).astype(np.uint8)
        for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                        [0, 1, 2, 3, 4]):
            got = MM.decode_png(_encode_png(px, filters))
            assert got.shape == px.shape
            assert (got == px).all(), (ch, filters)


def test_png_decode_known_tiny_image():
    """A well-known 1x1 PNG (the ubiquitous tracking-pixel bytes)
    decodes without error to a 1x1 image."""
    import base64

    payload = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    got = MM.decode_png(payload)
    assert got.shape[0] == 1 and got.shape[1] == 1


def test_decode_stats_runs_real_png_through_spark(spark):
    """The mapInPandas plumbing with the REAL codec: a media table of
    genuine PNG payloads -> decode_stats(kernel=decode_auto) must
    reproduce the per-image pixel statistics computed locally."""
    import numpy as np

    rng = np.random.RandomState(21)
    imgs = {i: rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
            for i in range(8)}
    rows = [(i, _encode_png(px, filters=[4] * 6)) for i, px in imgs.items()]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = (
        MM.decode_stats(media, kernel=MM.decode_auto)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, px in imgs.items():
        flat = px.reshape(-1)
        assert got.loc[i, "n_samples"] == flat.size
        assert abs(got.loc[i, "mean_intensity"] - flat.mean()) < 1e-9
        assert got.loc[i, "min_intensity"] == flat.min()
        assert got.loc[i, "max_intensity"] == flat.max()


# -- real baseline JPEG codec (pure numpy Huffman + IDCT) -------------------

def test_jpeg_roundtrip_flat_and_noise():
    """Encoder referee -> decoder: flat blocks are EXACT (only the DC
    coefficient survives, quant=1 preserves it); dense noise must stay
    within the +/-1 DCT rounding envelope; non-multiple-of-8 dims crop
    correctly."""
    import numpy as np

    from xova_spark.operators import jpeg as J

    flat = np.full((8, 16), 100, np.uint8)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(flat)), flat)

    rng = np.random.RandomState(13)
    noise = rng.randint(0, 256, (13, 21), np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(noise))
    assert got.shape == noise.shape
    assert np.abs(got.astype(int) - noise.astype(int)).max() <= 1


def test_jpeg_color_and_quantized():
    """YCbCr 4:4:4 color roundtrip within the color-transform envelope;
    a coarse quant table is lossy but structurally decodable (DQT path,
    ZRL/EOB runs)."""
    import numpy as np

    from xova_spark.operators import jpeg as J

    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, (16, 8, 3), np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(img))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3

    q = np.full(64, 16, np.int32)
    lossy = J.decode_jpeg(J.encode_jpeg(img, quant=q))
    assert lossy.shape == img.shape
    assert np.abs(lossy.astype(int) - img.astype(int)).mean() < 16


def test_jpeg_420_subsampled_roundtrip():
    """The decoder's 4:2:0 path (multi-block MCUs + chroma upsampling):
    flat color is exact (constant chroma pools losslessly); gray-as-RGB
    noise stays within the DCT envelope because Y rides at full
    resolution; odd dims crop correctly."""
    import numpy as np

    from xova_spark.operators import jpeg as J

    flat = np.zeros((16, 16, 3), np.uint8)
    flat[..., 0], flat[..., 1], flat[..., 2] = 200, 50, 100
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(flat, subsample=True)), flat)

    rng = np.random.RandomState(3)
    n = np.repeat(rng.randint(0, 256, (24, 24, 1)), 3, axis=2).astype(np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(n, subsample=True))
    assert np.abs(got.astype(int) - n.astype(int)).max() <= 1

    odd = np.full((19, 21, 3), 77, np.uint8)
    assert J.decode_jpeg(J.encode_jpeg(odd, subsample=True)).shape == (19, 21, 3)


def test_decode_stats_runs_real_jpeg_through_spark(spark):
    """mm_decode_stats on REAL JPEG payloads (VERDICT r2 item 6): media
    table of baseline JPEGs -> decode_stats(kernel=decode_auto) matches
    statistics computed on the locally-decoded pixels."""
    import numpy as np

    from xova_spark.operators import jpeg as J

    rng = np.random.RandomState(31)
    imgs = {i: rng.randint(0, 256, (11, 7), np.uint8) for i in range(6)}
    payloads = {i: J.encode_jpeg(px) for i, px in imgs.items()}
    rows = [(i, p) for i, p in payloads.items()]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = (
        MM.decode_stats(media, kernel=MM.decode_auto)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, p in payloads.items():
        flat = J.decode_jpeg(p).reshape(-1)  # local referee decode
        assert got.loc[i, "n_samples"] == flat.size
        assert abs(got.loc[i, "mean_intensity"] - flat.mean()) < 1e-9
        assert got.loc[i, "min_intensity"] == flat.min()
        assert got.loc[i, "max_intensity"] == flat.max()


# -- GIF (LZW) and WAV (RIFF PCM) codecs ------------------------------------

def test_gif_roundtrip_and_dispatch():
    """Encoder referee -> LZW decoder: palette-indexed pixels map back
    to exact RGB; decode_image_real dispatches on the GIF magic."""
    import numpy as np

    from xova_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    idx = rng.randint(0, 16, (9, 14), np.uint8)
    payload = encode_gif(idx, pal)
    assert np.array_equal(decode_gif(payload), pal[idx])
    assert np.array_equal(MM.decode_image_real(payload), pal[idx])
    # interlaced storage order must deinterlace back to the same pixels
    inter = encode_gif(idx, pal, interlace=True)
    assert np.array_equal(decode_gif(inter), pal[idx])
    # decode_auto flattens GIF RGB like the other image codecs
    assert np.array_equal(MM.decode_auto(payload), pal[idx].reshape(-1))


def test_wav_roundtrip_and_audio_stats_through_spark(spark):
    """Real WAV payloads through the audio_stats mapInPandas stage:
    frames/channels/rate/duration/RMS must match numpy on the source
    samples."""
    import numpy as np

    from xova_spark.operators.wav import encode_wav

    rng = np.random.RandomState(17)
    clips = {
        i: rng.randint(-2000, 2000, (800 + 100 * i, 2), np.int16)
        for i in range(5)
    }
    rows = [(i, encode_wav(s, 8000)) for i, s in clips.items()]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = (
        MM.audio_stats(media, kernel=MM.decode_audio_auto)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, s in clips.items():
        assert got.loc[i, "n_frames"] == s.shape[0]
        assert got.loc[i, "n_channels"] == 2
        assert got.loc[i, "sample_rate"] == 8000
        assert abs(got.loc[i, "duration_s"] - s.shape[0] / 8000) < 1e-12
        rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2)))
        assert abs(got.loc[i, "rms"] - rms) < 1e-9


def test_metadata_query_prunes_payload(spark, media, tmp_path):
    """A metadata-only projection over a MATERIALIZED media table must
    not read the payload column — at 100 TB the payload IS the data
    volume. (Derived-on-the-fly metadata cannot prune; stored media
    tables keep metadata materialized for exactly this reason.)"""
    path = str(tmp_path / "media")
    media.write.parquet(path)
    stored = spark.read.parquet(path)
    q = stored.select("doc_id", "media_type", F.col("meta.n_bytes"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "payload" not in scan  # payload column pruned from the scan


def test_partitioning_invariance(spark, media):
    """mapInPandas output must not depend on batch/partition layout."""
    base = MM.decode_stats(media).toPandas().set_index("doc_id").sort_index()
    re = (
        MM.decode_stats(media.repartition(13))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (base == re).all().all()


def test_frame_sample_conservation(spark, media):
    """Every doc yields ceil(n_frames / every_n) sampled frames of
    exactly frame_bytes bytes."""
    frames = MM.frame_sample(media, 64, 4)
    got = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled"),
        F.min(F.length("frame")).alias("minlen"),
        F.max(F.length("frame")).alias("maxlen"),
    )
    j = got.join(
        media.select("doc_id", F.col("meta.n_frames").alias("n_frames")),
        "doc_id",
        "right",
    ).toPandas()
    import numpy as np

    expect = np.ceil(j["n_frames"] / 4)
    got_n = j["n_sampled"].fillna(0)
    assert (got_n == expect).all()
    assert (j["minlen"].dropna() == 64).all()
    assert (j["maxlen"].dropna() == 64).all()


def test_resize_halves_then_quarters(spark, media):
    """Composability: resize(2) twice == resize(4) once (stride
    composition) — metadata and payload both."""
    once = MM.resize(media, 4).toPandas().set_index("doc_id").sort_index()
    half = MM.resize(media, 2)
    twice = (
        MM.resize(half, 2).toPandas().set_index("doc_id").sort_index()
    )
    assert (once["n_samples"] == twice["n_samples"]).all()
    assert (once["payload"] == twice["payload"]).all()


def test_image_phash_laws(spark):
    """aHash laws: constant image -> hash 0 (strict >); a bright/dark
    half-split image sets exactly the bright half's bits; identical
    payloads collide; and the operator hashes REAL PNG payloads through
    decode_auto identically to hashing their raw pixels."""
    import numpy as np

    const = bytes([7] * 128)
    half = bytes([1] * 64 + [201] * 64)
    rows = [(0, const), (1, half), (2, const)]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in MM.image_phash(media).collect()
    }
    assert got[0]["hash_hi"] == got[0]["hash_lo"] == 0
    assert got[0]["hash_hi"] == got[2]["hash_hi"]
    assert got[0]["hash_lo"] == got[2]["hash_lo"]
    # 128 samples over 64 blocks -> blocks 0..31 dark, 32..63 bright.
    assert got[1]["hash_lo"] == 0
    assert got[1]["hash_hi"] == (1 << 32) - 1

    # Real PNG: hash(decode_auto(png)) == hash(raw pixel bytes).
    px = np.arange(128, dtype=np.uint8).reshape(8, 16, 1)
    png = _encode_png(px)
    m2 = spark.createDataFrame(
        [(10, png), (11, px.tobytes())], "doc_id long, payload binary"
    )
    out = {
        r["doc_id"]: (r["hash_hi"], r["hash_lo"])
        for r in MM.image_phash(m2, kernel=MM.decode_auto).collect()
    }
    assert out[10] == out[11]


def test_phash_neardup_banding_mechanics(spark):
    """The banded Hamming join finds a perturbed near-dup (few flipped
    blocks -> shared band + small distance) and rejects an unrelated
    payload — pinned synthetically because the sf0.01 corpus genuinely
    contains no band collisions (the registry entry's 0 rows)."""
    base = bytes(([10] * 2 + [200] * 2) * 32)  # alternating blocks
    near = bytearray(base)
    near[0:2] = b"\xc8\xc8"  # flip block 0 bright -> 1-2 bit change
    far = bytes(range(128))
    media = spark.createDataFrame(
        [(1, base), (2, bytes(near)), (3, far)], "doc_id long, payload binary"
    )
    h = MM.image_phash(media)
    a = h.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hash_hi").alias("hi_a"),
        F.col("hash_lo").alias("lo_a"),
    )
    b = h.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hash_hi").alias("hi_b"),
        F.col("hash_lo").alias("lo_b"),
    )
    ham = (
        F.bit_count(F.expr("hi_a ^ hi_b")) + F.bit_count(F.expr("lo_a ^ lo_b"))
    ).cast("int")
    pairs = (
        a.join(
            b,
            (F.col("doc_a") < F.col("doc_b"))
            & ((F.col("hi_a") == F.col("hi_b")) | (F.col("lo_a") == F.col("lo_b"))),
        )
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= 8)
        .select("doc_a", "doc_b", "hamming")
        .collect()
    )
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in found and found[(1, 2)] <= 2
    assert all(3 not in k for k in found)


def test_oracle_text_cap_covers_every_fixture_tier():
    """Every mm_* oracle walks characters with
    generate_series(1, ORACLE_TEXT_CAP); parity silently depends on no
    document exceeding the cap. Pin the invariant against max(n_chars)
    of every sf tier so a longer-text fixture fails loudly here instead
    of hash-diverging in the gate."""
    import glob

    import duckdb

    from xova_spark.queries.multimodalq import ORACLE_TEXT_CAP, REGISTRY

    capped = [
        name
        for name, (_fn, sql) in REGISTRY.items()
        if sql and f"generate_series(1, {ORACLE_TEXT_CAP})" in sql
    ]
    assert len(capped) >= 8, capped  # the character-walk oracle family
    tiers = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert tiers
    for path in tiers:
        (mx,) = duckdb.sql(
            f"SELECT max(length(text)) FROM '{path}'"
        ).fetchone()
        assert mx <= ORACLE_TEXT_CAP, (path, mx, ORACLE_TEXT_CAP)
