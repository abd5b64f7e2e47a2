"""Stream-stream interval join: availableNow convergence to the batch
interval join, on Spark itself (the oracle gate re-proves vs DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.queries.streamingq import stream_click_attribution
from xova_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def test_stream_stream_join_converges_to_batch(spark):
    got = stream_click_attribution(spark, SF)
    ev = load_tables(spark, SF, ("events",))["events"]
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    ref = (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") < F.col("v_ts") + F.expr("interval 4 hours")),
        )
        .select(
            F.col("view_id").cast("long"),
            F.col("click_id").cast("long"),
            "user_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts"))
            .cast("long")
            .alias("lag_us"),
        )
    )
    assert got.count() > 0
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
