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


def test_codec_stub_raises(media):
    """The real-decode hook is a clearly-marked stub until a codec
    ships; the fake decode is the active kernel."""
    with pytest.raises(NotImplementedError):
        MM.decode_image_real(b"\x89PNG")
    assert list(MM._fake_decode(b"abc")) == [97, 98, 99]


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
