"""Continuous-aggregate maintenance: the foreachBatch-merged rollup over
N micro-batches must equal the one-shot batch aggregation, and partial
merges must be visible after every batch (monotone accumulation)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xova_spark.streaming.materialize import materialized_rollup, read_rollup


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """events split into 3 arrival files by event_id range."""
    out = str(tmp_path_factory.mktemp("mat_in"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "value"
    )
    n = ev.count()
    for i in range(3):
        chunk = ev.filter(
            (F.col("event_id") % 3) == i
        )
        chunk.coalesce(1).write.parquet(os.path.join(out, f"c{i}"))
    flat = os.path.join(out, "flat")
    os.makedirs(flat)
    for i in range(3):
        d = os.path.join(out, f"c{i}")
        (part,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
        os.rename(os.path.join(d, part), os.path.join(flat, f"{i:02d}.parquet"))
        os.utime(os.path.join(flat, f"{i:02d}.parquet"), (1_000_000_000 + i,) * 2)
    return flat, ev, n


def test_rollup_converges_to_batch(spark, split_events, tmp_path):
    flat, ev, n = split_events
    stream = (
        spark.readStream.schema("event_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(flat)
    )
    out_dir = str(tmp_path / "rollup")
    q = materialized_rollup(
        stream, out_dir, ["event_type"], str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) == 3
    got = (
        read_rollup(spark, out_dir)
        .select("event_type", "n", F.round("total", 4).alias("total"))
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    want = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert (got["n"] == want["n"]).all()
    assert (abs(got["total"] - want["total"]) < 1e-6).all()
    assert got["n"].sum() == n
