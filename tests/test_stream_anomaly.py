"""The streaming anomaly detector must converge to the batch
train/serve split: same baseline, same scored buckets, and its scored
half must agree with the full-history ev_anomaly_zscore on bucket
counts (the z-scores differ by design — different baseline window)."""

from __future__ import annotations

import pandas as pd

from xova_spark.queries import relext as R
from xova_spark.queries import streamingq as SQ

SF = "/root/testdata/sf0.001"


def test_stream_anomaly_converges_to_batch_split(spark):
    got = (
        SQ.stream_anomaly_alerts(spark, SF)
        .toPandas()
        .sort_values(["event_type", "day", "hour"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    # serve half only: every bucket is on/after the split day
    split_day = (
        pd.Timestamp(SQ._ANOM_SPLIT) - pd.Timestamp("2024-01-01")
    ).days
    assert (got["day"] >= split_day).all()
    assert set(got["anomaly"]) <= {0, 1}
    # flagged iff |z| >= 2 (the emitted z is rounded; 6 dp cannot
    # cross the 2.0 threshold for |z| bounded away from it by >1e-6)
    flagged = got["anomaly"] == 1
    assert (got.loc[flagged, "zscore"].abs() >= 2.0 - 1e-6).all()
    assert (got.loc[~flagged, "zscore"].abs() < 2.0 + 1e-6).all()

    # bucket counts agree with the full-history batch detector on the
    # shared (event_type, day, hour) keys
    batch = R.ev_anomaly_zscore(spark, SF).toPandas()
    merged = got.merge(
        batch, on=["event_type", "day", "hour"], suffixes=("_s", "_b")
    )
    assert len(merged) > 0
    assert (merged["n_s"] == merged["n_b"]).all()
