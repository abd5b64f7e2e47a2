"""Property tests for the time-series rollup additions: OHLC
candlesticks (pandas cross-check) and the distribution-window family
(rank laws, balanced quartiles)."""

from __future__ import annotations

import pandas as pd

from xova_spark.queries import relext as R

SF = "/root/testdata/sf0.001"


def _ev():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_ohlc_matches_pandas(spark):
    got = R.ev_hourly_ohlc(spark, SF).toPandas()
    ev = _ev()
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    ev["hour"] = ev["ts"].dt.hour
    grp = ev.sort_values(["ts", "event_id"]).groupby(
        ["event_type", "day", "hour"]
    )
    want = grp.agg(
        n=("value", "size"),
        open=("value", "first"),
        high=("value", "max"),
        low=("value", "min"),
        close=("value", "last"),
    ).reset_index()
    merged = got.merge(
        want, on=["event_type", "day", "hour"], suffixes=("_g", "_w")
    )
    assert len(merged) == len(got) == len(want) > 0
    for c in ("n", "open", "high", "low", "close"):
        assert (merged[f"{c}_g"] == merged[f"{c}_w"]).all()
    assert (got["low"] <= got["open"]).all() and (got["open"] <= got["high"]).all()
    assert (got["low"] <= got["close"]).all() and (got["close"] <= got["high"]).all()


def test_distribution_windows_laws(spark):
    df = R.w_distribution_functions(spark, SF).toPandas()
    ev = _ev()
    assert len(df) == len(ev)
    assert df["quartile"].between(1, 4).all()
    assert df["pct_rank"].between(0.0, 1.0).all()
    assert (df["cume"] > 0.0).all() and (df["cume"] <= 1.0).all()
    for et, g in df.groupby("event_type"):
        # ntile quartiles balanced within 1
        sizes = g["quartile"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        # first_in_type is the argmin of (value, event_id)
        sub = ev[ev["event_type"] == et].sort_values(["value", "event_id"])
        assert (g["first_in_type"] == sub["event_id"].iloc[0]).all()
        # pct_rank monotone in (value, event_id) order
        gg = g.merge(
            ev[["event_id", "value"]], on="event_id"
        ).sort_values(["value", "event_id"])
        assert gg["pct_rank"].is_monotonic_increasing
        assert gg["cume"].is_monotonic_increasing


def test_ewma_counts_matches_pandas_grid(spark):
    from xova_spark.queries import relext as RX

    got = RX.ev_ewma_counts(spark, SF).toPandas()
    ev = _ev()
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    ev["hour"] = ev["ts"].dt.hour
    b = (
        ev.groupby(["event_type", "day", "hour"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["event_type", "day", "hour"])
    )
    want = {}
    for et, g in b.groupby("event_type"):
        ns = list(g["n"])
        for i, row in enumerate(g.itertuples()):
            acc = 0
            for k in range(8):
                x = ns[i - k] if i - k >= 0 else 0
                acc += (1 << (7 - k)) * x
            want[(et, row.day, row.hour)] = acc
    got_map = {
        (r.event_type, r.day, r.hour): r.ewma_q256 for r in got.itertuples()
    }
    assert got_map == want


def test_sliding_count_1h_matches_pandas(spark):
    from xova_spark.queries import relext as RX

    got = RX.w_sliding_count_1h(spark, SF).toPandas()
    ev = _ev().sort_values("ts")
    want = {}
    for et, g in ev.groupby("event_type"):
        ts = g["ts"].to_numpy()
        ids = g["event_id"].to_numpy()
        for i in range(len(g)):
            lo = ts[i] - pd.Timedelta(hours=1)
            want[int(ids[i])] = int(((ts >= lo) & (ts <= ts[i])).sum())
    got_map = dict(zip(got["event_id"].astype(int), got["n_last_hour"].astype(int)))
    assert got_map == want


def test_chi2_cells_consistency(spark):
    from xova_spark.queries import relext as RX

    df = RX.agg_contingency_chi2cells(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    assert df["o"].sum() == len(li)
    # marginals really are the row/col sums of the cell table
    for flag, g in df.groupby("flag"):
        assert (g["row_total"] == g["o"].sum()).all()
    for status, g in df.groupby("status"):
        assert (g["col_total"] == g["o"].sum()).all()
    assert (df["chi2_cell"] >= 0).all()
    # spot-check one cell against numpy
    r = df.iloc[0]
    e = r.row_total * r.col_total / df["o"].sum()
    assert abs(r.expected - round(e, 6)) < 1e-9
    assert abs(r.chi2_cell - round((r.o - e) ** 2 / e, 6)) < 1e-9


def test_session_stats_consistent_with_sessionize(spark):
    from xova_spark.queries import relational as RL
    from xova_spark.queries import relext as RX

    st = RX.ev_session_stats(spark, SF).toPandas()
    sz = RL.w_sessionize(spark, SF).toPandas()
    # same session partition: identical (user, session) -> n_events
    a = st.set_index(["user_id", "session_id"])["n_events"].sort_index()
    b = sz.set_index(["user_id", "session_id"])["n_events"].sort_index()
    assert (a == b).all() and len(a) == len(b)
    assert (st["duration_us"] >= 0).all()
    assert (st["session_end"] >= st["session_start"]).all()
    # singleton sessions have zero duration
    singles = st[st["n_events"] == 1]
    assert (singles["duration_us"] == 0).all()
    # gap law: within a user, the next session starts > 1h after the
    # previous session's end
    for _, g in st.sort_values(["user_id", "session_id"]).groupby("user_id"):
        if len(g) < 2:
            continue
        prev_end = g["session_end"].iloc[:-1].to_numpy()
        next_start = g["session_start"].iloc[1:].to_numpy()
        assert ((next_start - prev_end) > pd.Timedelta(hours=1).to_timedelta64()).all()


def test_median_mad_outliers_match_numpy(spark):
    import numpy as np

    from xova_spark.queries import relext as RX

    df = RX.agg_median_mad_outliers(spark, SF).toPandas().set_index("flag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_extendedprice"].to_numpy()
        med = np.quantile(x, 0.5)
        mad = np.quantile(np.abs(x - med), 0.5)
        r = df.loc[flag]
        assert r.n == len(x)
        assert abs(r["median"] - med) < 1e-6
        assert abs(r["mad"] - mad) < 1e-6
        assert r.n_outliers == int((np.abs(x - med) > 3.0 * 1.4826 * mad).sum())
        # robust law: outliers are a small minority
        assert r.n_outliers < 0.1 * r.n


def test_double_smooth_forecast_laws(spark):
    """Brown forecast laws on the dyadic grid: s1 is the same EWMA the
    ewma query computes, and for a steady-state (all 8 lags present and
    equal) series the one-step forecast equals the level exactly."""
    got = R.ev_double_smooth_forecast(spark, SF).toPandas()
    ew = R.ev_ewma_counts(spark, SF).toPandas()
    m = got.merge(ew, on=["event_type", "day", "hour", "n"], how="inner")
    assert len(m) == len(got) == len(ew)
    assert (m["s1_q256"] == m["ewma_q256"]).all()

    # Synthetic steady state: constant n across >= 16 buckets.
    import pandas as pd

    const = pd.DataFrame(
        {
            "event_type": ["x"] * 20,
            "day": [0] * 20,
            "hour": list(range(20)),
            "n": [7] * 20,
        }
    )
    # Replay the same dyadic formulas in pandas.
    w = [1 << (7 - k) for k in range(8)]

    def ewma8(vals):
        out = []
        for i in range(len(vals)):
            out.append(sum(w[k] * (vals[i - k] if i - k >= 0 else 0) for k in range(8)))
        return out

    s1 = ewma8(const["n"].tolist())
    s2 = ewma8(s1)
    fc = [3 * 256 * a - 2 * b for a, b in zip(s1, s2)]
    # After 15 warmup buckets both smoothings saturate: s1 = 7 * 255
    # (the 8 dyadic weights sum to 255/256), s2 = 255 * s1, and the
    # forecast recovers the constant level to within the truncation
    # bias (factor (255*258)/65536 ≈ 1.004).
    assert s1[-1] == 7 * 255
    assert s2[-1] == 255 * s1[-1]
    assert fc[-1] == 3 * 256 * s1[-1] - 2 * s2[-1] == 7 * 255 * 258
    assert abs(fc[-1] - 7 * 65536) <= 0.01 * 7 * 65536


def test_rfm_and_actives_laws(spark):
    """RFM: quartiles balanced (ntile law), rfm digits match the three
    scores. Actives: dau <= wau <= mau, and dau equals the per-day
    distinct count computed independently."""
    got = R.ev_rfm_segments(spark, SF).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        counts = got[c].value_counts()
        assert set(counts.index) <= {1, 2, 3, 4}
        assert counts.max() - counts.min() <= 1  # ntile balance
    assert (
        got["rfm"]
        == got["r_score"] * 100 + got["f_score"] * 10 + got["m_score"]
    ).all()

    act = R.ev_active_users_rolling(spark, SF).toPandas()
    assert (act["dau"] <= act["wau"]).all()
    assert (act["wau"] <= act["mau"]).all()
    ev = _ev()
    day = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    dau_ref = (
        ev.assign(day=day).groupby("day")["user_id"].nunique().rename("dau_ref")
    )
    m = act.set_index("day").join(dau_ref)
    assert (m["dau"] == m["dau_ref"]).all()


def test_ab_ztest_matches_scipy_formula(spark):
    """z equals the textbook two-proportion pooled z computed in numpy
    from the same integer counts; flag consistent with |z|."""
    import numpy as np

    got = R.ev_ab_test_ztest(spark, SF).toPandas().iloc[0]
    n_a, c_a, n_b, c_b = (
        float(got.n_a), float(got.c_a), float(got.n_b), float(got.c_b)
    )
    p = (c_a + c_b) / (n_a + n_b)
    z = (c_a / n_a - c_b / n_b) / np.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    assert abs(got.zscore - round(z, 6)) < 1e-9
    assert got.significant == int(abs(z) >= 1.96)
    assert 0 < c_a < n_a and 0 < c_b < n_b  # non-degenerate fixture


def test_cusum_matches_resetting_recursion(spark):
    """The window form (prefix - running min) equals the textbook
    resetting recursion S_t = max(0, S_{t-1} + x_t - k) replayed in
    pandas; alert iff S >= 20."""
    got = R.ev_cusum_alerts(spark, SF).toPandas()
    ev = _ev()
    ev["day"] = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    ev["hour"] = ev["ts"].dt.hour
    b = (
        ev.groupby(["event_type", "day", "hour"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["event_type", "day", "hour"])
    )
    want = {}
    for et, g in b.groupby("event_type"):
        k = int(g["n"].sum()) // len(g) + 1
        s = 0
        for row in g.itertuples():
            s = max(0, s + int(row.n) - k)
            want[(et, row.day, row.hour)] = s
    got_map = {
        (r.event_type, r.day, r.hour): (r.cusum, r.alert)
        for r in got.itertuples()
    }
    assert len(got_map) == len(want)
    for key, s in want.items():
        assert got_map[key] == (s, int(s >= 20)), key


def test_forecast_backtest_consistency(spark):
    """Backtest totals recompute from the forecast query itself: join
    forecast at t with the actual at the next bucket, post-warmup."""
    bt = R.ev_forecast_backtest(spark, SF).toPandas().set_index("event_type")
    fc = R.ev_double_smooth_forecast(spark, SF).toPandas()
    for et, g in fc.groupby("event_type"):
        g = g.sort_values(["day", "hour"]).reset_index(drop=True)
        g["actual_next"] = g["n"].shift(-1)
        g["rn"] = range(1, len(g) + 1)
        e = g[(g["rn"] > 15) & g["actual_next"].notna()]
        want_err = int(
            (e["forecast_q65536"] - e["actual_next"] * 65536).abs().sum()
        )
        r = bt.loc[et]
        assert r.n_evals == len(e)
        assert r.total_abs_err_q65536 == want_err


def test_autocorr_matches_numpy_pairwise_pearson(spark):
    """ev_autocorr equals a numpy pairwise-complete Pearson replica on
    the hourly count series, and every coefficient is in [-1, 1]."""
    import numpy as np

    got = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in R.ev_autocorr(spark, SF).collect()
    }
    assert got, "fixture yields at least one (type, lag) row"
    ev = _ev()
    anchor = pd.Timestamp("2024-01-01")
    ev = ev.assign(
        h=(ev["ts"].dt.normalize() - anchor).dt.days * 24 + ev["ts"].dt.hour
    )
    series = ev.groupby(["event_type", "h"]).size()
    for (etype, lag), (n_pairs, acf) in got.items():
        s = series[etype]
        idx = s.index.to_numpy()
        have = set(idx)
        xs = np.array([s[h] for h in idx if h + lag in have], dtype=float)
        ys = np.array([s[h + lag] for h in idx if h + lag in have], dtype=float)
        assert n_pairs == len(xs)
        k = len(xs)
        num = k * (xs * ys).sum() - xs.sum() * ys.sum()
        den = (k * (xs * xs).sum() - xs.sum() ** 2) * (
            k * (ys * ys).sum() - ys.sum() ** 2
        )
        assert den > 0  # filtered rows never reach the output
        assert abs(acf - round(num / np.sqrt(den), 6)) < 1e-9, (etype, lag)
        assert -1.0 <= acf <= 1.0


def test_hll_mergeable_rollup_laws(spark):
    """Register-union losslessness and the 5% accuracy gate hold on the
    small fixture too, and the exact columns re-derive from pandas."""
    row = R.ev_hll_mergeable_rollup(spark, SF).collect()[0]
    assert row["merge_equals_direct"] is True
    assert row["merged_within_5pct"] is True
    ev = _ev()
    anchor = pd.Timestamp("2024-01-01")
    day = (ev["ts"].dt.normalize() - anchor).dt.days
    b = pd.DataFrame({"day": day, "user_id": ev["user_id"]}).drop_duplicates()
    assert row["n_days"] == b["day"].nunique()
    assert row["exact_total_distinct"] == b["user_id"].nunique()
    assert row["sum_daily_distinct"] == len(b)
    # the cautionary column: naive per-day-distinct sums genuinely inflate
    assert row["sum_daily_distinct"] > row["exact_total_distinct"]


def test_series_similarity_matches_numpy_replica(spark):
    """ev_series_similarity equals a pandas/numpy replica: the SAX word
    per user, block-complete candidate set, and exact sparse squared
    distance (absent days are zeros)."""
    import numpy as np

    ev = _ev()
    anchor = pd.Timestamp("2024-01-01")
    day = (ev["ts"].dt.normalize() - anchor).dt.days
    daily = (
        pd.DataFrame({"u": ev["user_id"], "d": day})
        .groupby(["u", "d"])
        .size()
    )
    users = sorted(daily.index.get_level_values(0).unique())
    vec = {}
    words = {}
    for u in users:
        s = daily[u]
        v = np.zeros(64, dtype=np.int64)
        for d, c in s.items():
            v[d] = c
        vec[u] = v
        segs = [v[i * 8 : (i + 1) * 8].sum() for i in range(4)]
        total = v.sum()
        words[u] = "".join("1" if 4 * sg > total else "0" for sg in segs)
    expect = {}
    for i, ua in enumerate(users):
        for ub in users[i + 1 :]:
            if words[ua] == words[ub]:
                dv = vec[ua] - vec[ub]
                shared = int(((vec[ua] > 0) & (vec[ub] > 0)).sum())
                expect[(ua, ub)] = (words[ua], shared, int((dv * dv).sum()))
    got = {
        (r["user_a"], r["user_b"]): (r["word"], r["n_shared_days"], r["dist2"])
        for r in R.ev_series_similarity(spark, SF).collect()
    }
    assert got == expect
    assert expect, "fixture yields same-word candidate pairs"


def test_dtw_pairs_replica_and_elasticity_laws(spark):
    """ev_dtw_pairs equals an independent python DP replica; DTW never
    exceeds the lockstep L1 distance (the diagonal is one admissible
    warping path); and a 1-day shift is DTW-cheap but L1-expensive
    (the elasticity DTW exists for)."""
    import numpy as np

    from xova_spark.queries.relext import DTW_BAND, DTW_T, ev_dtw_pairs

    T, R, BIG = DTW_T, DTW_BAND, 1 << 50

    def dtw(a, b):
        D = {}
        for i in range(T):
            for j in range(max(0, i - R), min(T, i + R + 1)):
                cost = abs(int(a[i]) - int(b[j]))
                cands = [
                    D.get((i - 1, j), BIG),
                    D.get((i, j - 1), BIG),
                    D.get((i - 1, j - 1), BIG),
                ]
                D[(i, j)] = cost + (0 if i == j == 0 else min(cands))
        return D[(T - 1, T - 1)]

    ev = _ev()
    anchor = pd.Timestamp("2024-01-01")
    day = (ev["ts"].dt.normalize() - anchor).dt.days
    g = pd.DataFrame({"t": ev["event_type"], "d": day}).groupby(["t", "d"]).size()
    types = sorted(g.index.get_level_values(0).unique())
    vecs = {}
    for t in types:
        v = np.zeros(T, dtype=np.int64)
        for d, c in g[t].items():
            if 0 <= d < T:
                v[d] = c
        vecs[t] = v
    got = {
        (r["type_a"], r["type_b"]): r["dtw_dist"]
        for r in ev_dtw_pairs(spark, SF).collect()
    }
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            a, b = vecs[ta], vecs[tb]
            assert got[(ta, tb)] == dtw(a, b)
            assert got[(ta, tb)] <= int(np.abs(a - b).sum())  # diagonal bound
    # elasticity: a 1-day shift stays strictly cheaper under DTW than
    # under lockstep L1 (the warping path absorbs the shift)
    a = vecs[types[0]]
    shifted = np.roll(a, 1)
    shifted[0] = 0
    l1 = int(np.abs(a - shifted).sum())
    assert l1 > 0 and dtw(a, shifted) < l1


def test_max_drawdown_matches_python_replica(spark):
    """Per-stream peak/drawdown recomputed by a pure-python walk over
    the same signed daily flows must match ev_max_drawdown exactly."""
    from pyspark.sql import functions as F

    (ev,) = R._t(spark, SF, "events")
    flow = F.floor(F.col("value") * 100 + 0.5).cast("long") * F.when(
        F.col("event_id") % 2 == 0, 1
    ).otherwise(-1)
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
        )
        .agg(F.sum(flow).cast("long").alias("net"))
        .collect()
    )
    series: dict[str, dict[int, int]] = {}
    for r in daily:
        series.setdefault(r["event_type"], {})[r["day"]] = r["net"]
    got = {r["event_type"]: r for r in R.ev_max_drawdown(spark, SF).collect()}
    assert set(got) == set(series)
    for t, by_day in series.items():
        equity = peak = max_eq = max_dd = 0
        under = 0
        first = True
        for d in sorted(by_day):
            equity += by_day[d]
            peak = equity if first else max(peak, equity)
            max_eq = equity if first else max(max_eq, equity)
            first = False
            dd = peak - equity
            max_dd = max(max_dd, dd)
            if dd > 0:
                under += 1
        r = got[t]
        assert r["n_days"] == len(by_day)
        assert r["drawdown_days"] == under
        assert r["max_equity_cents"] == max_eq
        assert r["max_drawdown_cents"] == max_dd


def test_kaplan_meier_replica_and_km_laws(spark):
    """ev_kaplan_meier vs a pure-python product-limit replica over the
    same hour-grain spans, plus the KM structural laws: n_risk is
    strictly decreasing down the curve, survival is non-increasing,
    every step has deaths, and censored users reduce LATER risk sets
    without ever being deaths."""
    import math

    from pyspark.sql import functions as F

    from xova_spark.queries.relext import (
        _KM_QUIET_HOURS,
        _US_PER_HOUR,
        ev_kaplan_meier,
    )

    sf = "/root/testdata/sf0.01"
    out = sorted(
        (r.asDict() for r in ev_kaplan_meier(spark, sf).collect()),
        key=lambda r: r["dur_hours"],
    )
    assert out
    ev = spark.read.parquet(f"{sf}/events.parquet").selectExpr(
        "user_id", f"unix_micros(to_utc_timestamp(ts, 'UTC')) div {_US_PER_HOUR} AS hr"
    )
    spans = {}
    for r in ev.groupBy("user_id").agg(
        F.min("hr").alias("f"), F.max("hr").alias("l")
    ).collect():
        spans[r["user_id"]] = (r["f"], r["l"])
    m = max(l for _, l in spans.values())
    users = [
        (l - f, l <= m - _KM_QUIET_HOURS) for f, l in spans.values()
    ]
    from collections import Counter

    deaths = Counter(d for d, ch in users if ch)
    everyone = Counter(d for d, _ in users)
    prev_risk = None
    prev_surv = None
    cum = 0
    for r in out:
        t = r["dur_hours"]
        n = sum(c for d, c in everyone.items() if d >= t)
        assert r["n_risk"] == n
        assert r["n_churn"] == deaths[t] > 0
        assert r["n_censored"] == everyone[t] - deaths[t]
        cum += round(math.log((n - deaths[t]) / n) * 1e6) if deaths[t] < n else 0
        if r["n_churn"] == r["n_risk"]:
            assert r["at_zero"] and r["survival_micro_nats"] is None
        else:
            assert r["survival_micro_nats"] == cum <= 0
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk
            if prev_surv is not None and r["survival_micro_nats"] is not None:
                assert r["survival_micro_nats"] <= prev_surv
        prev_risk = r["n_risk"]
        prev_surv = r["survival_micro_nats"]
