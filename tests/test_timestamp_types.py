"""Timestamp-type drift property test (round-2 postmortem).

The driver fixture's ``events.ts`` is parquet INT64
Timestamp(isAdjustedToUTC=false, unit=MICROS); Spark 4's NTZ inference
loads it as ``timestamp_ntz``, which broke ``unix_micros`` in round 2.
This class of environment drift recurs, so pin it: every registry query
that touches ``ts`` must analyze AND produce identical results when the
parquet column arrives as

- NTZ micros  (the driver fixture as-is),
- UTC-adjusted micros (``timestamp[us, tz=UTC]`` — classic TIMESTAMP),
- raw int64 nanoseconds (the legacy nanosAsLong shape).

``session.load_tables`` is the single normalization point; these tests
fail loudly if a new timestamp shape slips past it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from xova_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"

TS_QUERIES = (
    "w_sessionize",
    "join_asof",
    "w1_cumulative_binning",
    "w_moving_avg",
    "w_lag_lead",
    "ev_hourly_rollup_gapfill",
    "ev_funnel_conversion",
    "ev_retention_cohorts",
    "ev_anomaly_zscore",
    "ev_user_paths",
)

VARIANTS = ("ntz_micros", "utc_micros", "int64_nanos")


def _write_variant(tbl: pa.Table, variant: str, path: str) -> None:
    ts = tbl.column("ts")
    if variant == "ntz_micros":
        new = ts.cast(pa.timestamp("us"))
    elif variant == "utc_micros":
        new = ts.cast(pa.timestamp("us")).cast(pa.timestamp("us", tz="UTC"))
    elif variant == "int64_nanos":
        micros = ts.cast(pa.timestamp("us")).cast(pa.int64())
        new = pc.multiply(micros, pa.scalar(1000, pa.int64()))
    else:  # pragma: no cover
        raise ValueError(variant)
    idx = tbl.schema.get_field_index("ts")
    out = tbl.set_column(idx, pa.field("ts", new.type), new)
    pq.write_table(out, path)


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    """One sf-dir per timestamp variant; non-events tables symlinked."""
    src = pa.parquet.read_table(os.path.join(SF_DIR, "events.parquet"))
    dirs = {}
    for variant in VARIANTS:
        d = tmp_path_factory.mktemp(f"ts_{variant}")
        for f in os.listdir(SF_DIR):
            if f.endswith(".parquet") and f != "events.parquet":
                os.symlink(os.path.join(SF_DIR, f), str(d / f))
        _write_variant(src, variant, str(d / "events.parquet"))
        dirs[variant] = str(d)
    return dirs


def test_load_tables_normalizes_every_variant(spark, variant_dirs):
    """All variants load as TIMESTAMP with identical epoch values."""
    from pyspark.sql import functions as F

    sums = {}
    for variant, d in variant_dirs.items():
        ev = load_tables(spark, d, names=("events",))["events"]
        assert dict(ev.dtypes)["ts"] == "timestamp", variant
        sums[variant] = ev.agg(
            F.sum(F.unix_micros("ts")).alias("s"), F.count("*").alias("n")
        ).collect()[0]
    ref = sums["ntz_micros"]
    for variant, row in sums.items():
        assert (row.s, row.n) == (ref.s, ref.n), variant


def test_load_tables_repins_utc(spark, variant_dirs):
    """A non-UTC (but mutable) session tz is re-pinned to UTC on load."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        load_tables(spark, variant_dirs["ntz_micros"], names=("events",))
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


@pytest.mark.parametrize("name", TS_QUERIES)
def test_ts_queries_identical_across_variants(spark, variant_dirs, name):
    qs = entrymod.queries()
    results = {}
    for variant, d in variant_dirs.items():
        df = qs[name](spark, d)
        df.schema  # noqa: B018 — analysis must succeed
        pdf = df.toPandas()
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        if len(pdf):
            pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
        results[variant] = pdf.reset_index(drop=True)
    ref = results["ntz_micros"]
    for variant, pdf in results.items():
        assert pdf.equals(ref), f"{name}: {variant} differs from ntz_micros"
