"""Distributed exact ranking (operators/ranking.py): bit-parity with
the unpartitioned window it replaces, across partition counts, skew,
and NTILE remainder cases — plus the no-single-partition plan claim."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from xova_spark.operators.ranking import (
    global_ntile,
    global_rank,
    ntile_from_rank,
)


def _events(spark, n=4000, seed=7):
    # Deterministic skewed integer data: value collisions force the
    # tiebreak column to matter; one heavy key exercises range skew.
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.pmod(F.col("id") * 2654435761 + seed, F.lit(97)))
        .cast("long")
        .alias("v"),
        F.when(F.col("id") % 5 == 0, F.lit(42))
        .otherwise(F.pmod(F.col("id") * 40503 + 11, F.lit(1000)))
        .cast("long")
        .alias("skewed"),
    )


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_global_rank_matches_window(spark, parts):
    df = _events(spark)
    order = [F.desc("v"), F.col("k")]
    got = global_rank(df, order, rank_col="r", num_partitions=parts)
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_rank_skewed_order_key(spark):
    df = _events(spark)
    order = [F.col("skewed"), F.col("k")]
    got = global_rank(df, order, rank_col="r", num_partitions=8)
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert got.exceptAll(want).count() == 0


@pytest.mark.parametrize("n,k", [(10, 4), (12, 4), (4000, 10), (3, 7)])
def test_ntile_formula_matches_sql(spark, n, k):
    df = spark.range(n).select(F.col("id").alias("k"))
    rank = F.row_number().over(Window.orderBy("k"))
    want = df.select(
        "k",
        F.ntile(k).over(Window.orderBy("k")).alias("t"),
    )
    got = df.select(
        "k", ntile_from_rank(rank, n, k).alias("t")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_ntile_matches_window(spark):
    df = _events(spark, n=1003)
    order = [F.desc("v"), F.col("k")]
    got = global_ntile(
        df, order, 10, "decile", num_partitions=6, window_max_rows=0
    )
    want = df.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(*order))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_ntile_paths_agree(spark):
    """The size gate's two paths (window below, distributed above) must
    be bit-identical — and pick the expected physical shape."""
    df = _events(spark, n=997)
    order = [F.col("skewed"), F.col("k")]
    small = global_ntile(df, order, 7, "t")  # under the gate → window
    large = global_ntile(df, order, 7, "t", window_max_rows=0)
    assert small.exceptAll(large).count() == 0
    assert large.exceptAll(small).count() == 0
    assert "Window" in small._jdf.queryExecution().executedPlan().toString()
    assert (
        "Window"
        not in large._jdf.queryExecution().executedPlan().toString()
    )


def test_no_unpartitioned_window_in_plan(spark):
    """The whole point: the executed plan has zero Window operators
    (rank comes from range shuffle + Arrow pass, not WindowExec)."""
    df = _events(spark)
    got = global_rank(df, [F.col("k")], rank_col="r", num_partitions=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "rangepartitioning" in plan, plan


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_global_cumsum_matches_window(spark, parts):
    from xova_spark.operators.ranking import global_cumsum

    df = _events(spark).select(
        "k", "v", (F.col("skewed") - 500).alias("val")  # negatives too
    )
    order = [F.col("v"), F.col("k")]
    got = global_cumsum(
        df, order, "val", "cs", num_partitions=parts, window_max_rows=0
    )
    want = df.withColumn(
        "cs",
        F.sum("val")
        .over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_cumsum_paths_agree(spark):
    """The size gate's two routes are bit-identical: same frame through
    the plain window (gate open) and the distributed two-pass running
    sum (gate forced shut)."""
    from xova_spark.operators.ranking import global_cumsum

    df = _events(spark, n=2000).select("k", "v", F.col("skewed").alias("val"))
    order = [F.col("v"), F.col("k")]
    small = global_cumsum(df, order, "val", "cs", window_max_rows=1_000_000)
    dist = global_cumsum(df, order, "val", "cs", window_max_rows=0)
    assert small.exceptAll(dist).count() == 0
    assert dist.exceptAll(small).count() == 0


def test_global_cumsum_multicolumn_paths_agree(spark):
    """The multi-column form (several running sums sharing one range
    shuffle) matches per-column plain windows on both gate routes."""
    from xova_spark.operators.ranking import global_cumsum

    df = _events(spark, n=1500).select(
        "k", "v", F.col("skewed").alias("a"), (F.col("v") * 3).alias("b")
    )
    order = [F.desc("v"), F.col("k")]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("ca", F.sum("a").over(w).cast("long")).withColumn(
        "cb", F.sum("b").over(w).cast("long")
    )
    for gate in (1_000_000, 0):
        got = global_cumsum(
            df, order, ["a", "b"], ["ca", "cb"], window_max_rows=gate
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_global_cumsum_null_values_both_paths(spark):
    """NULL values contribute 0 on BOTH gate routes (ADVICE r6: the
    distributed path used to crash via int(None) when a partition's
    value column summed to NULL). One partition is engineered all-NULL
    by clustering NULLs at the low end of the range order."""
    from xova_spark.operators.ranking import global_cumsum

    df = spark.range(300).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 120, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 7)
        .alias("val"),
    )
    order = [F.col("k")]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cs", F.sum("val").over(w).cast("long"))
    for gate, parts in ((1_000_000, None), (0, 8)):
        got = global_cumsum(
            df, order, "val", "cs", num_partitions=parts, window_max_rows=gate
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
