"""Incrementally-materialized rollup — the continuous-aggregate pattern.

``foreachBatch`` gives a streaming query an arbitrary batch-DataFrame
sink; here each micro-batch's partial aggregates MERGE into a
parquet-backed rollup table (read-merge-overwrite). This is the
hypertable continuous-aggregate / materialized-view-maintenance shape:
the stored table always holds the rollup of everything consumed so far,
and merging partials is valid because the aggregates carried are
decomposable (count/sum pairs; averages derive at read time).

At real scale the overwrite becomes a transactional MERGE into a table
format with commit semantics (Delta/Iceberg); the plan shape — batch
partial agg, key-join merge, atomic swap — is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_into(batch_df: DataFrame, batch_id: int, out_dir: str, keys: list[str]):
    spark = batch_df.sparkSession
    partial = batch_df.groupBy(*keys).agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    tmp = os.path.join(out_dir, "_staged")
    cur = os.path.join(out_dir, "current")
    if os.path.exists(cur):
        existing = spark.read.parquet(cur)
        merged = (
            existing.unionByName(partial)
            .groupBy(*keys)
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        )
    else:
        merged = partial
    # stage-then-swap: the reader never sees a half-written rollup
    merged.write.mode("overwrite").parquet(tmp)
    swap = os.path.join(out_dir, "_old")
    if os.path.exists(cur):
        os.rename(cur, swap)
    os.rename(tmp, cur)
    if os.path.exists(swap):
        import shutil

        shutil.rmtree(swap)


def materialized_rollup(
    stream_df: DataFrame, out_dir: str, keys: list[str], checkpoint: str
):
    """Start the maintenance query (availableNow); returns the handle."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: _merge_into(df, bid, out_dir, keys)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "current"))
