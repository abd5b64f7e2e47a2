"""Round-10 law tests.

Opens with the ADVICE r9 boundary cases: (a) the Holm-Bonferroni
all-reject boundary — the oracle's kfail fallback must come from an
UNFILTERED scope or every `rejected` goes NULL exactly when every
hypothesis rejects; (b) the Welch d^2 guard on its own post-division
divisor.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from xova_spark.session import get_spark

    return get_spark("round10-tests")


def _write_events_parquet(tmpdir: str, rows: list[tuple]) -> str:
    """Write a tiny events.parquet with the fixture's timestamp shape
    (naive int64 micros, isAdjustedToUTC=false — what the driver's
    generator emits and load_tables NTZ-normalizes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    tbl = pa.Table.from_pandas(
        df.astype({"value": "float64"}), preserve_index=False
    ).cast(
        pa.schema(
            [
                ("event_type", pa.string()),
                ("ts", pa.timestamp("us")),
                ("value", pa.float64()),
            ]
        )
    )
    pq.write_table(tbl, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


def _all_reject_events():
    """A 2x2 contingency so extreme every cell's standardized residual
    is ~22 sigma: counts (1000, 1) / (1, 1000). All four Holm
    hypotheses reject — the boundary where the pre-fix oracle returned
    NULL for every `rejected` (ADVICE r9, medium)."""
    rows = []
    for et, hr, n in (
        ("click", 1, 1000),
        ("click", 2, 1),
        ("view", 1, 1),
        ("view", 2, 1000),
    ):
        ts = pd.Timestamp(f"2024-03-05 {hr:02d}:00:00")
        rows.extend((et, ts, 1.0) for _ in range(n))
    return rows


def test_holm_all_reject_boundary_spark_and_oracle(spark, tmp_path):
    """On an all-reject input both engines must return rejected=TRUE
    for every row — never NULL. Reproduces ADVICE r9's divergence: the
    oracle's old kfail took the m+1 fallback from a scope filtered to
    failing rows, so the empty-failure case made kf NULL and every
    `rejected` NULL while Spark's window form said TRUE."""
    import duckdb

    import __spark_entry__ as m
    from xova_spark.queries.relext import ev_holm_bonferroni

    d = _write_events_parquet(str(tmp_path), _all_reject_events())

    got = ev_holm_bonferroni(spark, d).collect()
    assert len(got) == 4
    assert all(r["rejected"] is True for r in got), got

    sql = m.oracle_sql()["ev_holm_bonferroni"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    ora = con.execute(sql).fetchall()
    cols = [c[0] for c in con.execute(f"DESCRIBE {sql}").fetchall()]
    rej = cols.index("rejected")
    assert len(ora) == 4
    assert all(r[rej] is True for r in ora), (
        "oracle rejected column must be TRUE (not NULL) on the "
        f"all-reject boundary: {ora}"
    )


def test_holm_no_reject_boundary_spark_and_oracle(spark, tmp_path):
    """The opposite boundary: a uniform contingency (all residuals ~0,
    every p ~1) must reject NOTHING on both engines — pins that the
    kfail rewrite did not disturb the first-failing-rank semantics."""
    import duckdb

    import __spark_entry__ as m
    from xova_spark.queries.relext import ev_holm_bonferroni

    rows = []
    for et in ("click", "view"):
        for hr in (1, 2):
            ts = pd.Timestamp(f"2024-03-05 {hr:02d}:00:00")
            rows.extend((et, ts, 1.0) for _ in range(500))
    d = _write_events_parquet(str(tmp_path), rows)

    got = ev_holm_bonferroni(spark, d).collect()
    assert len(got) == 4
    assert all(r["rejected"] is False for r in got), got

    sql = m.oracle_sql()["ev_holm_bonferroni"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    ora = con.execute(sql).fetchall()
    cols = [c[0] for c in con.execute(f"DESCRIBE {sql}").fetchall()]
    rej = cols.index("rejected")
    assert all(r[rej] is False for r in ora), ora


def test_welch_d2_zero_guard_covers_post_division_floor(spark, tmp_path):
    """ADVICE r9 (low): the pooled SUM (n1-1)*v1 + (n2-1)*v2 can be
    positive while the actual d^2 divisor — that sum integer-divided by
    (n1+n2-2) — floors to 0; the guard must check the POST-division
    value and return the docstring's promised 0, not the NULL a
    div-by-zero yields. Construction: 600k constant clicks (v1=0) plus
    TWO purchases 1 milli apart (v2=500000 micro^2) makes the pooled
    sum 500000 but the divisor floor 500000 // 600000 = 0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xova_spark.queries.relext import ev_welch_t2_effect

    n1 = 600_000
    et = np.concatenate(
        [np.repeat("click", n1), np.repeat("purchase", 2)]
    )
    ts = np.full(n1 + 2, np.datetime64("2024-03-05T01:00:00", "us"))
    val = np.concatenate([np.full(n1, 1.0), np.array([2.0, 2.001])])
    tbl = pa.Table.from_pydict(
        {"event_type": et, "ts": ts, "value": val},
        schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("ts", pa.timestamp("us")),
                ("value", pa.float64()),
            ]
        ),
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))

    (row,) = ev_welch_t2_effect(spark, str(tmp_path)).collect()
    # Pre-fix this was NULL (guard on the pre-division sum, divisor 0).
    assert row["d2_micro"] == 0, row
    # t^2 stays live on the same input (its divisor v2//n2 is 250000).
    assert row["t2_milli"] is not None and row["t2_milli"] > 0, row
