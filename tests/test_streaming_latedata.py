"""Watermark late-data semantics: rows arriving after the watermark has
passed their window must be DROPPED from an append-mode aggregation —
the behavior that bounds state at 100 TB stream scale."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def late_dir(tmp_path_factory):
    """Three files arriving in order. 00: on-time rows t=[1000..1019].
    01: t=1022 — advances the watermark past the early windows, which
    EMITS them (append mode) and evicts their state. 02: a row at
    t=1002, now later than its already-emitted window — must be dropped
    (the watermark contract: a window, once finalized, never updates)."""
    out = str(tmp_path_factory.mktemp("late_in"))
    files = [
        pd.DataFrame(
            {"ts_sec": [1000.0, 1004.0, 1008.0, 1012.0, 1016.0, 1019.0], "v": 1}
        ),
        pd.DataFrame({"ts_sec": [1022.0], "v": 1}),
        pd.DataFrame({"ts_sec": [1002.0, 1026.0], "v": 10}),
    ]
    for i, pdf in enumerate(files):
        f = os.path.join(out, f"{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), f)
        # FileStreamSource orders micro-batches by modification time —
        # pin the arrival order explicitly
        os.utime(f, (1_000_000_000 + 100 * i,) * 2)
    return out


def test_late_rows_dropped_in_append_mode(spark, late_dir):
    stream = (
        spark.readStream.schema("ts_sec double, v bigint")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(late_dir)
    )
    agg = (
        stream.withColumn("ts", F.timestamp_seconds(F.col("ts_sec")))
        .withWatermark("ts", "2 seconds")
        .groupBy(F.window("ts", "4 seconds").alias("win"))
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .select(
            F.unix_timestamp("win.start").alias("start"), "total", "n"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_demo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("late_demo").collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(int(r["start"]), []).append((r["total"], r["n"]))
    # The [1000,1004) window was emitted when the watermark passed it
    # (batch 1). The late t=1002/v=10 row arriving in batch 2 must be
    # DROPPED: exactly one emission for that window, without the late
    # row, and append mode never re-emits it.
    assert got[1000] == [(1, 1)], got
    # the v=10 value may only ever appear in the t=1026 fresh window
    assert all(
        t < 10 for start, emis in got.items() if start < 1024 for (t, _n) in emis
    ), got
