"""Property-based tests (hypothesis) — the layer SURVEY §5 notes the
reference lacks entirely. Random inputs are constrained to dyadic
rationals so every assertion can be EXACT (no tolerances), mirroring the
fixture's exactness discipline.

Spark actions are slow per-example, so max_examples stays small; the
greedy-binning and complex-algebra properties are pure pandas/python and
run with full hypothesis default budgets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from xova_spark.operators import chunking as C
from xova_spark.operators.timechannel import PART_KEYS

# ---------------------------------------------------------------------------
# Greedy binning vs an independent oracle, random cadences (pure python)
# ---------------------------------------------------------------------------


@st.composite
def time_stats(draw):
    n = draw(st.integers(2, 24))
    # strictly increasing dyadic times; dyadic positive intervals
    steps = draw(
        st.lists(st.integers(1, 64), min_size=n, max_size=n)
    )
    times = np.cumsum(np.array(steps, dtype=np.float64) / 4.0)
    intervals = (
        np.array(draw(st.lists(st.integers(1, 16), min_size=n, max_size=n)))
        / 4.0
    )
    counts = draw(st.lists(st.integers(1, 5), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "FIELD_ID": 0,
            "DATA_DESC_ID": 0,
            "SCAN_NUMBER": 0,
            "TIME": times,
            "n_rows": counts,
            "avg_interval": intervals,
        }
    )


def _greedy_oracle(g: pd.DataFrame, bin_secs: float, max_rows=None):
    bins, bin_id, acc, rows_acc = [], 0, 0.0, 0
    for i, r in enumerate(g.sort_values("TIME").itertuples()):
        if i > 0 and (
            acc >= bin_secs or (max_rows and rows_acc + r.n_rows > max_rows)
        ):
            bin_id += 1
            acc, rows_acc = 0.0, 0
        bins.append(bin_id)
        acc += r.avg_interval
        rows_acc += r.n_rows
    return np.array(bins)


@given(stats=time_stats(), bin_q=st.integers(1, 40), cap=st.integers(2, 12))
@settings(max_examples=200, deadline=None)
def test_greedy_kernel_properties(stats, bin_q, cap):
    """The pandas kernel inside greedy_bins (extracted logic) matches an
    independently-written oracle for random cadences, and bins satisfy
    the budget + monotonicity invariants."""
    bin_secs = bin_q / 4.0
    want = _greedy_oracle(stats, bin_secs, cap * 4)

    # re-run the same logic the applyInPandas kernel uses
    pdf = stats.sort_values("TIME", kind="mergesort").reset_index(drop=True)
    bins = np.empty(len(pdf), dtype=np.int32)
    bin_id, acc, rows_acc = 0, 0.0, 0
    for i in range(len(pdf)):
        n = int(pdf["n_rows"].iloc[i])
        if i > 0 and (acc >= bin_secs or rows_acc + n > cap * 4):
            bin_id += 1
            acc, rows_acc = 0.0, 0
        bins[i] = bin_id
        acc += float(pdf["avg_interval"].iloc[i])
        rows_acc += n
    np.testing.assert_array_equal(bins, want)
    # invariants: bin ids are 0..k contiguous non-decreasing
    assert bins[0] == 0
    assert ((np.diff(bins) == 0) | (np.diff(bins) == 1)).all()


# ---------------------------------------------------------------------------
# Complex algebra identities (pure expression math, exact dyadics)
# ---------------------------------------------------------------------------

dyadic = st.integers(-4096, 4096).map(lambda n: n / 16.0)


@given(a=dyadic, b=dyadic, c=dyadic, d=dyadic)
@settings(max_examples=300)
def test_complex_identities(a, b, c, d):
    """conj(z)·z == |z|²; (z1·z2)/z2 == z1 (when z2 != 0) — evaluated
    through the same formulas functions/complex_ops.py declares as
    Column expressions (the algebra is engine-independent)."""
    # conj(z)*z = |z|^2
    re, im = a, b
    cr, ci = re, -im
    pr, pi = cr * re - ci * im, cr * im + ci * re
    assert pr == re * re + im * im
    assert pi == 0.0
    # multiplication then division round-trips exactly on dyadics whose
    # products stay within the 53-bit mantissa
    if (c, d) != (0.0, 0.0):
        mr, mi = a * c - b * d, a * d + b * c
        den = c * c + d * d
        qr, qi = (mr * c + mi * d) / den, (mi * c - mr * d) / den
        assert abs(qr - a) <= 1e-9 * max(1.0, abs(a))
        assert abs(qi - b) <= 1e-9 * max(1.0, abs(b))


# ---------------------------------------------------------------------------
# Spark-side: random dyadic row tables through the real operators
# ---------------------------------------------------------------------------


@st.composite
def ms_rows_frame(draw):
    n = draw(st.integers(4, 40))
    rng_times = draw(st.lists(st.integers(0, 20), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "FIELD_ID": np.array(
                draw(st.lists(st.integers(0, 1), min_size=n, max_size=n)),
                dtype=np.int32,
            ),
            "DATA_DESC_ID": np.zeros(n, dtype=np.int32),
            "SCAN_NUMBER": np.zeros(n, dtype=np.int32),
            "TIME": 1000.0 + np.array(rng_times, dtype=np.float64) * 2.0,
            "INTERVAL": np.full(n, 2.0),
            "n_dummy": np.ones(n, dtype=np.int64),
        }
    )


@given(pdf=ms_rows_frame())
@settings(max_examples=5, deadline=None)
def test_greedy_assign_partition_and_conservation(spark, pdf):
    """End-to-end greedy bin assignment on random tables: total rows
    conserved, a unique (partition, TIME) never splits, and the result
    is invariant to a hostile repartition."""
    df = spark.createDataFrame(pdf)
    binned = C.assign_greedy_bins(df, 4.0)
    out = binned.toPandas()
    assert len(out) == len(pdf)
    split = out.groupby([*PART_KEYS, "TIME"])["time_bin"].nunique()
    assert (split == 1).all()
    re_out = (
        C.assign_greedy_bins(df.repartition(7, "TIME"), 4.0)
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("row_id").reset_index(drop=True)[re_out.columns],
        re_out,
        check_dtype=False,
    )


@settings(max_examples=200, deadline=None)
@given(
    key=st.integers(min_value=0, max_value=2**40),
    mx=st.integers(min_value=0, max_value=2**40),
)
def test_bucket16_properties(key, mx):
    """The conditional 16-bit range bucket (zorder._bucket16_sql
    semantics, evaluated in pure python): result always in [0, 65535]
    when key <= mx; identity for narrow domains; order-preserving."""
    key = min(key, mx)

    def bucket(k, m):
        return k if m <= 65535 else (k * 65536) // (m + 1)

    b = bucket(key, mx)
    assert 0 <= b <= 65535
    if mx <= 65535:
        assert b == key
    # order preservation on the clamped domain
    k2 = min(key + 1, mx)
    assert bucket(k2, mx) >= b


@settings(max_examples=50, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=120), min_size=1, max_size=6
    )
)
def test_substring_window_tiling(texts):
    """Pure-python twin of the t_repeated_substring_windows window
    enumeration: every window starts at a stride multiple, has exactly
    WIN chars unless it is the tail window, and a 1.5x-WIN span shared
    verbatim between two docs yields at least one aligned shared
    window."""
    WIN, STRIDE = 32, 16

    def windows(t):
        if len(t) < WIN:
            return []
        return [t[STRIDE * i: STRIDE * i + WIN]
                for i in range((len(t) - WIN) // STRIDE + 1)]

    for t in texts:
        ws = windows(t)
        assert len(ws) == (0 if len(t) < WIN else (len(t) - WIN) // STRIDE + 1)
        for w in ws[:-1]:
            assert len(w) == WIN
    # planted-span guarantee
    span = "z" * (WIN + STRIDE)  # 1.5x window length
    a = "a" * 7 + span
    b = "b" * 13 + span + "bb"
    shared = set(windows(a)) & set(windows(b))
    assert any(set(w) == {"z"} for w in shared)


# ---------------------------------------------------------------------------
# Distributed running sum vs a pure-python prefix sum, random frames
# ---------------------------------------------------------------------------


@st.composite
def cumsum_frames(draw):
    n = draw(st.integers(1, 60))
    keys = draw(
        st.lists(st.integers(-50, 50), min_size=n, max_size=n, unique=True)
    )
    vals = draw(st.lists(st.integers(-1000, 1000), min_size=n, max_size=n))
    return list(zip(keys, vals))


@given(rows=cumsum_frames(), parts=st.integers(1, 5))
@settings(max_examples=8, deadline=None)
def test_global_cumsum_property(spark, rows, parts):
    """For ANY integer frame and partition count, the distributed
    two-pass running sum equals the python prefix sum over the sorted
    keys — including negative values, single rows, and more partitions
    than rows."""
    from pyspark.sql import functions as F

    from xova_spark.operators.ranking import global_cumsum

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cs"]
        for r in global_cumsum(
            df, [F.col("k")], "v", "cs",
            num_partitions=parts, window_max_rows=0,
        ).collect()
    }
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc


def test_fixture_timestamps_post_epoch(spark):
    """DATA CONTRACT: every timestamp column in the fixture tables is
    >= 1970-01-01 UTC. Hour/day binning across the registry uses Spark
    `div` (truncate toward zero) vs DuckDB `//` (floor) on
    unix_micros — identical iff the micros are nonnegative. A
    pre-epoch timestamp would silently diverge the two engines
    (ev_sprt_ab_test, cdc_deletion_vector_audit,
    layout_partition_skew_audit, and the layoutq/cdcq day-grain
    family), so this test turns that latent hazard into a loud one."""
    from pyspark.sql import functions as F

    from xova_spark.session import load_tables

    tables = load_tables(spark, "/root/testdata/sf0.01")
    checked = 0
    for name, df in tables.items():
        ts_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName().startswith("timestamp")
            or f.dataType.typeName() == "date"
        ]
        if not ts_cols:
            continue
        row = df.agg(
            *[F.min(F.col(c).cast("timestamp")).alias(c) for c in ts_cols]
        ).collect()[0]
        for c in ts_cols:
            assert row[c] is None or row[c].year >= 1970, (
                f"{name}.{c} has pre-epoch timestamps: div/floor "
                f"binning contract violated ({row[c]})"
            )
            checked += 1
    assert checked >= 3, "expected at least orders/lineitem/events ts cols"


def test_fixture_event_values_nonnegative(spark):
    """DATA CONTRACT: events.value >= 0 across fixture tiers. The
    512-milli histogram bin (stream_histogram_quantiles,
    agg_histogram_quantile_sketch) computes `vm // 512` in DuckDB
    (floor) vs Spark `div` (truncate toward zero) — identical iff vm
    is nonnegative. Same pattern as the post-epoch timestamp contract
    above: turn the latent divergence into a loud failure if the
    fixture generator ever emits negative values."""
    from pyspark.sql import functions as F

    from xova_spark.session import load_tables

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = load_tables(spark, sf_dir)["events"]
        mn = ev.agg(F.min("value").alias("mn")).collect()[0]["mn"]
        assert mn is not None and mn >= 0, (
            f"{sf_dir}/events.value has negatives (min={mn}): the "
            "div-vs-floor histogram binning contract is violated"
        )
