"""Bucketing: the storage-layout decision SCALE.md prescribes for the
100 TB bin-map joins — bucketed tables joined on the bucket key must
co-locate (no Exchange feeding the join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xova_spark import plans as P


@pytest.fixture(scope="module")
def bucketed(spark, ms):
    # default spark-warehouse dir (gitignored). DROP TABLE only clears
    # the (session-scoped, in-memory) catalog — orphan directories from
    # earlier sessions must be removed from disk too.
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_vis")
    spark.sql("DROP TABLE IF EXISTS b_bins")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_vis", "b_bins"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        ms["ms_vis"]
        .write.bucketBy(8, "row_id")
        .sortBy("row_id")
        .mode("overwrite")
        .saveAsTable("b_vis")
    )
    from xova_spark.operators import timechannel as tc

    (
        tc.bin_map(ms["ms_rows"], 4.0)
        .write.bucketBy(8, "row_id")
        .sortBy("row_id")
        .mode("overwrite")
        .saveAsTable("b_bins")
    )
    return spark.table("b_vis"), spark.table("b_bins")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    """vis ⨝ bin-map on row_id over 8-bucket tables: the join consumes
    both sides' bucketing — zero exchanges in the plan (the claim
    SCALE.md makes for the 100 TB layout)."""
    vis, bins = bucketed
    # disable auto-broadcast so the join strategy, not size, is tested
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = vis.join(bins.hint("merge"), "row_id")
        assert P.exchange_count(j) == 0, P.executed_plan(j)[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_unbucketed(spark, ms, bucketed):
    """Same rows either way — bucketing is layout, not semantics."""
    vis, bins = bucketed
    got = vis.join(bins, "row_id").count()
    from xova_spark.operators import timechannel as tc

    want = ms["ms_vis"].join(tc.bin_map(ms["ms_rows"], 4.0), "row_id").count()
    assert got == want


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed):
    """groupBy on the bucket key reuses the bucketing distribution —
    no exchange before the aggregation."""
    vis, _ = bucketed
    agg = vis.groupBy("row_id").agg(F.count("*").alias("n"))
    assert P.exchange_count(agg) == 0, P.executed_plan(agg)[:2000]
