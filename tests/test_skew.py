"""Skew handling: AQE must split a genuinely skewed join partition
(spark.sql.adaptive.skewJoin is on in session.py), and the explicit
salted join must agree with the plain join on skewed data too."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    """Fact table where one key owns ~90% of rows (hot key 0)."""
    n = 400_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise((F.col("id") % 1000).cast("long"))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    return fact, dim


def test_salted_join_equals_plain_on_skew(spark, skewed):
    fact, dim = skewed
    S = 8
    plain = (
        fact.join(dim, "k")
        .groupBy("attr")
        .agg(F.count("*").alias("n"), F.round(F.sum("x"), 4).alias("sx"))
    )
    salted_f = fact.withColumn(
        "salt", F.pmod(F.xxhash64("x"), F.lit(S)).cast("int")
    )
    salted_d = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    salted = (
        salted_f.join(salted_d, ["k", "salt"])
        .groupBy("attr")
        .agg(F.count("*").alias("n"), F.round(F.sum("x"), 4).alias("sx"))
    )
    a = {r["attr"]: (r["n"], r["sx"]) for r in plain.collect()}
    b = {r["attr"]: (r["n"], r["sx"]) for r in salted.collect()}
    assert a == b
    assert a[0][0] == 360_000 + 400  # hot key joined correctly


def test_aqe_skew_split_activates(spark, skewed):
    """With broadcast disabled and skew thresholds lowered, AQE marks
    the sort-merge join as skew-handled (isSkew=true in the final plan)."""
    fact, dim = skewed
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        # coalescing would fold the small partitions and mask the skew
        # annotation at this tiny test scale
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # the skew split breaks the join's output partitioning, which a
        # downstream exchange must rebuild — allow that trade explicitly
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = fact.join(dim.hint("merge"), "k").select(F.sum("x").alias("s"))
        # collect() drives THIS DataFrame's QueryExecution, so its
        # AdaptiveSparkPlan mutates to the final (skew-annotated) plan
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
        assert "AQEShuffleRead skewed" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
