"""Greedy-binning (A7) tests: an independent pure-pandas oracle
implementation plus the reference's invariants (chunking.py:125-157 —
a unique time never splits; :168-214 — row-cap re-split)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from xova_spark.operators import chunking as C
from xova_spark.operators.timechannel import PART_KEYS


def _oracle_bins(stats: pd.DataFrame, bin_secs: float, max_rows=None):
    """Independent greedy reimplementation over pandas."""
    out = []
    for _, g in stats.groupby(PART_KEYS, sort=False):
        g = g.sort_values("TIME")
        bin_id, acc, rows_acc = 0, 0.0, 0
        for _, r in g.iterrows():
            if acc >= bin_secs or (max_rows and rows_acc + r.n_rows > max_rows):
                if acc > 0:
                    bin_id += 1
                    acc, rows_acc = 0.0, 0
            out.append((*[r[k] for k in PART_KEYS], r.TIME, bin_id))
            acc += r.avg_interval
            rows_acc += r.n_rows
    return pd.DataFrame(out, columns=[*PART_KEYS, "TIME", "time_bin"])


def test_greedy_matches_independent_oracle(spark, ms):
    stats = C.unique_time_stats(ms["ms_rows"])
    got = (
        C.greedy_bins(stats, 4.0)
        .toPandas()
        .sort_values([*PART_KEYS, "TIME"])
        .reset_index(drop=True)
    )
    want = (
        _oracle_bins(stats.toPandas(), 4.0)
        .sort_values([*PART_KEYS, "TIME"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_unique_time_never_splits(spark, ms):
    """Invariant chunking.py:125-157: all rows sharing (partition,
    TIME) land in the same bin — guaranteed by construction, asserted
    end-to-end through the row join."""
    binned = C.assign_greedy_bins(ms["ms_rows"], 4.0)
    n = (
        binned.groupBy(*PART_KEYS, "TIME")
        .agg(F.countDistinct("time_bin").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert n == 0
    assert binned.count() == ms["ms_rows"].count()


def test_bin_interval_budget(spark, ms):
    """Each closed bin accumulated < time_bin_secs before its last
    unique time was admitted (greedy closure semantics)."""
    stats = C.unique_time_stats(ms["ms_rows"])
    bins = C.greedy_bins(stats, 4.0).join(stats, [*PART_KEYS, "TIME"])
    per_bin = (
        bins.groupBy(*PART_KEYS, "time_bin")
        .agg(
            F.sum("avg_interval").alias("span"),
            F.max("avg_interval").alias("last"),
        )
        .toPandas()
    )
    # budget: span - last < threshold (the last admit may overshoot)
    assert ((per_bin["span"] - per_bin["last"]) < 4.0).all()


def test_row_cap_resplit(spark, ms):
    """max_rows_per_bin forces earlier closure (chunking.py:168-214)."""
    nbl = 120  # rows per unique time in the fixture
    binned = C.assign_greedy_bins(ms["ms_rows"], 1e9, max_rows_per_bin=nbl)
    sizes = (
        binned.groupBy(*PART_KEYS, "time_bin").count().select("count").toPandas()
    )
    assert (sizes["count"] <= nbl).all()
