"""dropDuplicatesWithinWatermark: the bounded-state streaming dedup.

Unbounded dropDuplicates keeps every key forever — impossible at 100 TB
stream scale. The within-watermark variant guarantees dedup only for
duplicates arriving within the watermark delay and EVICTS older state.
This test pins both sides of that contract:
  - duplicates within the delay are removed;
  - a duplicate arriving long after (state evicted) is emitted again.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dup_in"))
    batches = [
        # k=1 duplicated within seconds -> deduped
        pd.DataFrame({"ts_sec": [1000.0, 1001.0, 1002.0], "k": [1, 1, 2]}),
        # watermark advances far past k=1's expiry (delay 10 s)...
        pd.DataFrame({"ts_sec": [2000.0], "k": [3]}),
        # ...and state eviction is applied on the NEXT batch commit
        pd.DataFrame({"ts_sec": [2050.0], "k": [4]}),
        # k=1 reappears long after eviction -> emitted AGAIN
        pd.DataFrame({"ts_sec": [2051.0], "k": [1]}),
    ]
    for i, pdf in enumerate(batches):
        f = os.path.join(out, f"{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), f)
        os.utime(f, (1_000_000_000 + 100 * i,) * 2)
    return out


def test_dedup_within_watermark_bounds_state(spark, dup_dir):
    stream = (
        spark.readStream.schema("ts_sec double, k bigint")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(dup_dir)
    )
    deduped = (
        stream.withColumn("ts", F.timestamp_seconds("ts_sec"))
        .withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ks = sorted(
        int(r["k"]) for r in spark.table("dd_wm").select("k").collect()
    )
    # k=1 twice (dup within 1 s removed; resurrection after eviction
    # emitted), k=2/k=3/k=4 once each
    assert ks == [1, 1, 2, 3, 4], ks
