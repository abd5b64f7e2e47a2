"""Custom MS DataSource tests: equality with the native parquet read,
row-group partitioning, and filter pushdown semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xova_spark.sources.ms_datasource import MSDataSource, MSReader


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(MSDataSource)
    return spark


def test_source_matches_parquet(registered, ms_dir, ms):
    via_source = (
        registered.read.format("xova_ms").load(ms_dir).toPandas().sort_values("row_id")
    )
    via_parquet = ms["ms_rows"].toPandas().sort_values("row_id")
    assert (
        via_source.reset_index(drop=True)
        .eq(via_parquet.reset_index(drop=True))
        .all()
        .all()
    )


def test_source_other_table(registered, ms_dir, ms):
    w = registered.read.format("xova_ms").option("table", "ms_weights").load(ms_dir)
    assert w.count() == ms["ms_weights"].count()


def test_pushed_filter_semantics(registered, ms_dir, ms):
    got = (
        registered.read.format("xova_ms")
        .load(ms_dir)
        .filter((F.col("FIELD_ID") == 0) & (F.col("ANTENNA1") == 3))
        .count()
    )
    want = (
        ms["ms_rows"].filter((F.col("FIELD_ID") == 0) & (F.col("ANTENNA1") == 3)).count()
    )
    assert got == want > 0


def test_unsupported_filters_returned_to_spark(registered, ms_dir, ms):
    """Non-EqualTo predicates are evaluated by Spark post-scan — results
    must still be correct."""
    got = (
        registered.read.format("xova_ms")
        .load(ms_dir)
        .filter((F.col("TIME") > 5.03e9) & (F.col("SCAN_NUMBER") == 1))
        .count()
    )
    want = (
        ms["ms_rows"]
        .filter((F.col("TIME") > 5.03e9) & (F.col("SCAN_NUMBER") == 1))
        .count()
    )
    assert got == want > 0


def test_row_group_stats_skipping():
    """A pushed equality outside a row group's [min, max] skips the
    group entirely."""

    class FakeStats:
        has_min_max = True
        min, max = 2, 5

    class FakeCol:
        path_in_schema = "FIELD_ID"
        statistics = FakeStats()

    class FakeRG:
        num_columns = 1

        def column(self, i):
            return FakeCol()

    class FakeMeta:
        def row_group(self, i):
            return FakeRG()

    r = MSReader("/nonexistent")
    r.eq_filters = [("FIELD_ID", 7)]
    assert not r._row_group_can_match(FakeMeta(), 0)
    r.eq_filters = [("FIELD_ID", 3)]
    assert r._row_group_can_match(FakeMeta(), 0)
