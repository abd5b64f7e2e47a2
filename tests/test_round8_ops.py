"""Round-8 operator laws: Theil/Hoover inequality replicas plus
structural laws the oracle hash can't see (nonnegativity, the
equal-population zero, the Gini-Hoover ordering)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _user_counts(spark):
    return sorted(
        r["c"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    )


def test_theil_matches_python_lattice_replica(spark):
    """ev_theil_index vs a pure-python replica on the SAME micro-nat
    lattice (per-row ln rounded half-away to 1e-6 before the weighted
    sum), plus the laws: T >= 0 and T <= ln(n) (the Theil T upper
    bound, reached when one user holds everything)."""
    from xova_spark.queries.relext import ev_theil_index

    row = ev_theil_index(spark, SF).collect()[0]
    xs = _user_counts(spark)
    n, t = len(xs), sum(xs)
    assert (row["n_users"], row["total_events"]) == (n, t)

    def half_away(v: float) -> int:
        return int(v + 0.5) if v >= 0 else -int(-v + 0.5)

    dividend = sum(x * half_away(math.log(x * n / t) * 1_000_000) for x in xs)
    want = max(dividend, 0) // t
    assert row["theil_micro_nats"] == want
    assert 0 <= row["theil_micro_nats"] <= int(math.log(n) * 1_000_000) + 1


def test_hoover_matches_python_exact_replica(spark):
    """ev_hoover_index vs the exact integer formula (no floats anywhere
    in this op), plus the laws: 0 <= H < 1000 permille and the
    Hoover <= Gini dominance (H is the max vertical Lorenz gap, Gini
    twice the area — H <= G always)."""
    from xova_spark.queries.relext import (
        ev_gini_coefficient,
        ev_hoover_index,
    )

    row = ev_hoover_index(spark, SF).collect()[0]
    xs = _user_counts(spark)
    n, t = len(xs), sum(xs)
    assert (row["n_users"], row["total_events"]) == (n, t)
    want = sum(abs(x * n - t) for x in xs) * 1000 // (2 * n * t)
    assert row["hoover_permille"] == want
    assert 0 <= row["hoover_permille"] < 1000
    gini = ev_gini_coefficient(spark, SF).collect()[0]["gini_permille"]
    assert row["hoover_permille"] <= gini


def test_inequality_trio_equal_population_is_zero(spark):
    """All three inequality scalars must read exactly 0 on a perfectly
    equal synthetic population pushed through the SAME production
    expressions (the distributed path, not a shortcut)."""
    eq = spark.range(1, 65).select(
        F.col("id").alias("user_id"), F.lit(7).cast("long").alias("x")
    )
    tot = eq.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("t"),
    )
    both = (
        eq.crossJoin(F.broadcast(tot))
        .select(
            "n",
            "t",
            F.expr(
                "CAST(x AS DECIMAL(38,0))"
                " * CAST(round(ln(CAST(x AS DOUBLE) * n / t)"
                "              * 1000000) AS BIGINT)"
            ).alias("term"),
            F.expr("abs(CAST(x AS DECIMAL(38,0)) * n - t)").alias("dev"),
        )
        .groupBy("n", "t")
        .agg(
            F.expr(
                "CAST(greatest(sum(term), CAST(0 AS DECIMAL(38,0)))"
                " div CAST(max(t) AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("theil"),
            F.expr(
                "CAST(sum(dev) * 1000"
                " div (2 * CAST(max(n) AS DECIMAL(38,0)) * max(t))"
                " AS BIGINT)"
            ).alias("hoover"),
        )
        .collect()[0]
    )
    assert both["theil"] == 0 and both["hoover"] == 0
