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


# ---------------------------------------------------------------------------
# Statistical-testing pack laws: pure-python replicas on the identical
# lattice, plus the structural guarantees the oracle hash can't see.
# ---------------------------------------------------------------------------


def _lattice_values(spark, types):
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin(*types))
        .select("event_type", F.round(F.col("value") * 1000).cast("long").alias("vm"))
        .collect()
    )
    return rows


def test_ks_matches_python_replica(spark):
    """ev_ks_test vs a pure-python exact KS on the same permille
    lattice; 0 <= D <= 1e6; and D == 0 when a sample is compared to
    itself (law run through the production expression shape)."""
    from xova_spark.queries.relext import ev_ks_test

    row = ev_ks_test(spark, SF).collect()[0]
    rows = _lattice_values(spark, ("click", "purchase"))
    a = sorted(r["vm"] for r in rows if r["event_type"] == "click")
    b = sorted(r["vm"] for r in rows if r["event_type"] == "purchase")
    n1, n2 = len(a), len(b)
    assert (row["n1"], row["n2"]) == (n1, n2)
    grid = sorted(set(a) | set(b))
    import bisect

    best = 0
    for x in grid:
        f1 = bisect.bisect_right(a, x)
        f2 = bisect.bisect_right(b, x)
        best = max(best, abs(f1 * n2 - f2 * n1))
    assert row["ks_micro"] == best * 1_000_000 // (n1 * n2)
    assert 0 <= row["ks_micro"] <= 1_000_000


def test_mann_whitney_matches_python_replica(spark):
    """ev_mann_whitney_u vs scipy-free python midrank U; the U1+U2 =
    n1*n2 identity (in 2x units) and AUC bounds."""
    from xova_spark.queries.relext import ev_mann_whitney_u

    row = ev_mann_whitney_u(spark, SF).collect()[0]
    rows = _lattice_values(spark, ("click", "purchase"))
    a = [r["vm"] for r in rows if r["event_type"] == "click"]
    b = [r["vm"] for r in rows if r["event_type"] == "purchase"]
    n1, n2 = len(a), len(b)
    assert (row["n1"], row["n2"]) == (n1, n2)
    allv = sorted(a + b)
    import bisect

    # 2*R1 via midranks: element with cb predecessors and ct ties has
    # 2*midrank = 2*cb + ct + 1.
    r1_2x = 0
    for x in a:
        lo = bisect.bisect_left(allv, x)
        hi = bisect.bisect_right(allv, x)
        r1_2x += 2 * lo + (hi - lo) + 1
    u1_2x = r1_2x - n1 * (n1 + 1)
    assert row["auc_micro"] == u1_2x * 500000 // (n1 * n2)
    assert 0 <= row["auc_micro"] <= 1_000_000
    # U1 + U2 = n1*n2 (midrank identity, 2x units)
    r2_2x = 0
    for x in b:
        lo = bisect.bisect_left(allv, x)
        hi = bisect.bisect_right(allv, x)
        r2_2x += 2 * lo + (hi - lo) + 1
    assert u1_2x + (r2_2x - n2 * (n2 + 1)) == 2 * n1 * n2


def test_spearman_bounds_and_anticorrelated_extreme(spark):
    """ev_spearman_rho on the fixture is inside [-1e6, 1e6]; a
    perfectly anticorrelated synthetic population through the SAME
    shifted-nonnegative expression reads exactly -1000000 — the
    sign-discipline red-path (floor vs truncate would break here if
    the dividend were signed)."""
    from xova_spark.queries.relext import ev_spearman_rho

    row = ev_spearman_rho(spark, SF).collect()[0]
    assert -1_000_000 <= row["rho_micro"] <= 1_000_000

    n = 64
    d2 = sum((i - (n + 1 - i)) ** 2 for i in range(1, n + 1))
    den = n * (n * n - 1)
    want = (2 * den - 6 * d2) * 1_000_000 // den - 1_000_000
    assert want == -1_000_000
    syn = spark.createDataFrame(
        [(i, i, n + 1 - i) for i in range(1, n + 1)], "user_id long, rx long, ry long"
    )
    got = (
        syn.agg(
            F.count("*").cast("long").alias("n"),
            F.expr("sum(CAST(rx - ry AS DECIMAL(38,0)) * (rx - ry))").alias("d2"),
        )
        .selectExpr(
            "CAST((2 * CAST(n AS DECIMAL(38,0))"
            "      * (CAST(n AS DECIMAL(38,0)) * n - 1) - 6 * d2) * 1000000"
            " div (CAST(n AS DECIMAL(38,0))"
            "      * (CAST(n AS DECIMAL(38,0)) * n - 1))"
            " - 1000000 AS BIGINT) AS rho_micro"
        )
        .collect()[0]["rho_micro"]
    )
    assert got == -1_000_000


def test_chisq_matches_python_replica(spark):
    """ev_chisq_independence vs a python replica on the same per-cell
    micro lattice; chi2 >= 0 and dof = (r-1)(c-1)."""
    from xova_spark.queries.relext import ev_chisq_independence

    row = ev_chisq_independence(spark, SF).collect()[0]
    cells = {}
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", F.hour("ts").cast("long").alias("hr"))
        .collect()
    ):
        cells[(r["event_type"], r["hr"])] = cells.get((r["event_type"], r["hr"]), 0) + 1
    rtot, ctot, n = {}, {}, 0
    for (et, hr), o in cells.items():
        rtot[et] = rtot.get(et, 0) + o
        ctot[hr] = ctot.get(hr, 0) + o
        n += o

    def half_away(v: float) -> int:
        return int(v + 0.5) if v >= 0 else -int(-v + 0.5)

    chi = sum(
        half_away((o - rtot[et] * ctot[hr] / n) ** 2 / (rtot[et] * ctot[hr] / n) * 1e6)
        for (et, hr), o in cells.items()
    )
    assert row["chi2_micro"] == chi
    assert row["n_cells"] == len(cells)
    assert row["dof"] == (len(rtot) - 1) * (len(ctot) - 1)
    assert row["chi2_micro"] >= 0


def test_jackknife_matches_python_replica(spark):
    """ev_jackknife_ci vs a python replica of the delete-one-block
    integer form; var >= 0; and the constant-population red-path: all
    blocks equal => variance exactly 0."""
    from xova_spark.queries.relext import ev_jackknife_ci

    row = ev_jackknife_ci(spark, SF).collect()[0]
    per = {}
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            (F.col("user_id") % 32).alias("b"),
            F.round(F.col("value") * 1000).cast("long").alias("vm"),
        )
        .collect()
    ):
        s, c = per.get(r["b"], (0, 0))
        per[r["b"]] = (s + r["vm"], c + 1)
    st = sum(s for s, _ in per.values())
    ct = sum(c for _, c in per.values())
    nb = len(per)

    def half_away(v: float) -> int:
        return int(v + 0.5) if v >= 0 else -int(-v + 0.5)

    tbs = [half_away((st - s) / (ct - c) * 1e6) for s, c in per.values()]
    var = (nb - 1) * (nb * sum(t * t for t in tbs) - sum(tbs) ** 2) // (
        nb**2 * 1_000_000
    )
    assert (row["n_events"], row["n_buckets"]) == (ct, nb)
    assert row["mean_micro"] == st * 1_000_000 // ct
    assert row["jack_var_milli2"] == var
    assert row["jack_var_milli2"] >= 0


def test_jackknife_divisor_hand_computed():
    """Divisor-law pin on a hand-computable population, INDEPENDENT of
    the engine replica above (which once shared a wrong B^3 divisor
    with both engines — the class of error a shared replica cannot
    catch). For one observation per block the delete-one jackknife of
    the mean equals the classic SE^2 = s^2/n exactly:
    theta_b = (st - x_b)/(n - 1), and (B-1)/B * sum((theta_b - m)^2)
    = sum((x_i - xbar)^2) / (n*(n-1)) = var(xbar)."""
    xs = [10.0, 12.0, 17.0, 21.0]  # n = B = 4, one obs per block
    n = len(xs)
    st = sum(xs)
    tbs = [(st - x) / (n - 1) for x in xs]
    m = sum(tbs) / n
    var_jack = (n - 1) / n * sum((t - m) ** 2 for t in tbs)
    xbar = st / n
    s2 = sum((x - xbar) ** 2 for x in xs) / (n - 1)
    assert abs(var_jack - s2 / n) < 1e-12
    # and the integer collapse used by both engines reproduces it:
    collapse = (n - 1) * (n * sum(t * t for t in tbs) - sum(tbs) ** 2) / n**2
    assert abs(collapse - var_jack) < 1e-9
    # the former B^3 divisor is off by exactly B:
    wrong = (n - 1) * (n * sum(t * t for t in tbs) - sum(tbs) ** 2) / n**3
    assert abs(wrong * n - var_jack) < 1e-9


def test_knn_accuracy_and_silhouette_shapes(spark):
    """ann_label_knn_accuracy: per-label counts sum to the query count
    and accuracies are permille-bounded. emb_silhouette_centroid:
    per-cluster counts sum to the corpus and s in [0, 1e6] (a is the
    MIN distance, so the centroid silhouette is nonnegative by
    construction; exactly 1e6 when a vector coincides with its nearest
    centroid — a=0, b>0 — so the bound is inclusive)."""
    from xova_spark.queries.pipelineq import emb_silhouette_centroid
    from xova_spark.queries.similarity import ann_label_knn_accuracy

    acc = ann_label_knn_accuracy(spark, SF).collect()
    assert sum(r["n_queries"] for r in acc) == 50
    for r in acc:
        assert 0 <= r["n_correct"] <= r["n_queries"]
        assert 0 <= r["acc_permille"] <= 1000

    sil = emb_silhouette_centroid(spark, SF).collect()
    ntot = (
        spark.read.parquet(f"{SF}/embeddings.parquet").count()
    )
    assert sum(r["n_vectors"] for r in sil) == ntot
    for r in sil:
        assert 0 <= r["mean_sil_micro"] <= 1_000_000


def test_hard_negative_labels_differ(spark):
    """Every mined hard negative must carry a label different from its
    query's — the defining contract of the entry."""
    from xova_spark.queries.similarity import ann_hard_negative_mining

    rows = ann_hard_negative_mining(spark, SF).collect()
    assert rows, "mining returned no candidates"
    assert all(r["neg_label"] != r["qlabel"] for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# ---------------------------------------------------------------------------
# Batch-2 laws: association measures, link prediction, streaming funnel.
# ---------------------------------------------------------------------------


def test_mutual_information_matches_python_replica(spark):
    """dq_mutual_information vs a python replica on the same micro-nat
    lattice; MI >= 0 (Jensen, enforced by the GREATEST clamp)."""
    import math

    from xova_spark.queries.relext import dq_mutual_information

    row = dq_mutual_information(spark, SF).collect()[0]
    cells = {}
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", F.hour("ts").cast("long").alias("hr"))
        .collect()
    ):
        k = (r["event_type"], r["hr"])
        cells[k] = cells.get(k, 0) + 1
    rtot, ctot, n = {}, {}, 0
    for (et, hr), o in cells.items():
        rtot[et] = rtot.get(et, 0) + o
        ctot[hr] = ctot.get(hr, 0) + o
        n += o

    def half_away(v: float) -> int:
        return int(v + 0.5) if v >= 0 else -int(-v + 0.5)

    tm = sum(
        o * half_away(math.log(o * n / (rtot[et] * ctot[hr])) * 1e6)
        for (et, hr), o in cells.items()
    )
    assert row["mi_micro_nats"] == max(tm, 0) // n
    assert row["n_events"] == n and row["n_cells"] == len(cells)
    assert row["mi_micro_nats"] >= 0


def test_cramers_v_consistent_with_chi2(spark):
    """ev_cramers_v must carry the IDENTICAL chi2_micro as
    ev_chisq_independence (same lattice, independently assembled), and
    V in [0, 1e6]."""
    import math

    from xova_spark.queries.relext import ev_chisq_independence, ev_cramers_v

    v = ev_cramers_v(spark, SF).collect()[0]
    chi = ev_chisq_independence(spark, SF).collect()[0]
    assert v["chi2_micro"] == chi["chi2_micro"]
    assert 0 <= v["cramers_v_micro"] <= 1_000_000
    want = round(
        math.sqrt(v["chi2_micro"] / 1e6 / (v["n_events"] * v["kmin"])) * 1e6
    )
    assert v["cramers_v_micro"] == want


def test_adamic_adar_bounds_and_wedge_consistency(spark):
    """graph_adamic_adar: every pair's score sits inside the per-wedge
    weight envelope [common*w(cap), common*w(2)] (w(d) = round(1e6 /
    ln(d)) is decreasing), and pairs also present in the capped-Jaccard
    top-20 agree on common_capped (same wedge spine)."""
    import math

    from xova_spark.queries.graphq import (
        WEDGE_DEGREE_CAP,
        graph_adamic_adar,
        graph_node_jaccard_capped,
    )

    rows = graph_adamic_adar(spark, SF).collect()
    assert rows, "no candidate pairs"
    wmax = round(1e6 / math.log(2))
    wmin = round(1e6 / math.log(WEDGE_DEGREE_CAP))
    for r in rows:
        assert r["common_capped"] * wmin <= r["aa_micro"] <= r["common_capped"] * wmax
    jac = {
        (r["sa"], r["sb"]): r["common_capped"]
        for r in graph_node_jaccard_capped(spark, SF).collect()
    }
    for r in rows:
        if (r["sa"], r["sb"]) in jac:
            assert jac[(r["sa"], r["sb"])] == r["common_capped"]


def test_stream_funnel_matches_batch_and_ordering(spark):
    """stream_funnel_conversion's converged output equals the batch
    three-way interval join run through plain DataFrame ops, and every
    emitted triple is time-ordered within its windows."""
    from xova_spark.queries.streamingq import stream_funnel_conversion

    got = {
        (r["view_id"], r["click_id"], r["purchase_id"]): r["funnel_lag_us"]
        for r in stream_funnel_conversion(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "event_type", F.to_utc_timestamp("ts", "UTC").alias("ts")
    )
    v = ev.filter(F.col("event_type") == "view").selectExpr(
        "event_id AS view_id", "user_id AS u", "ts AS v_ts"
    )
    c = ev.filter(F.col("event_type") == "click").selectExpr(
        "event_id AS click_id", "user_id AS cu", "ts AS c_ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "event_id AS purchase_id", "user_id AS pu", "ts AS p_ts"
    )
    want = {
        (r["view_id"], r["click_id"], r["purchase_id"]): r["lag"]
        for r in (
            v.join(c, F.expr("u = cu AND c_ts >= v_ts AND c_ts < v_ts + interval 2 hours"))
            .join(p, F.expr("cu = pu AND p_ts >= c_ts AND p_ts < c_ts + interval 2 hours"))
            .select(
                "view_id",
                "click_id",
                "purchase_id",
                (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag"),
            )
            .collect()
        )
    }
    assert got == want
    assert all(lag >= 0 for lag in got.values())
    # Pins the lattice_headroom ANALYTIC_BOUNDS justification: every
    # output id is an event identifier, bounded by max(event_id) —
    # LINEAR in rows, whatever the two-point fit reads from funnel
    # sparsity at the small tier.
    max_id = spark.read.parquet(f"{SF}/events.parquet").agg(
        F.max("event_id")
    ).collect()[0][0]
    for v, c, p in got:
        assert max(v, c, p) <= max_id


def test_fdr_bh_property_and_staircase_replica(spark):
    """ev_fdr_segment_residuals: python replica of the z->p staircase
    and the exact BH rule (largest k with p_(k) <= k/m*alpha; rejected
    == ranks 1..k), ranks a permutation of 1..m."""
    from xova_spark.queries.relext import _Z_P_STAIRS, ev_fdr_segment_residuals

    rows = ev_fdr_segment_residuals(spark, SF).collect()
    m = len(rows)
    assert sorted(r["rk"] for r in rows) == list(range(1, m + 1))
    for r in rows:
        z = r["absz_milli"] / 1000.0
        p = next((p for zc, p in _Z_P_STAIRS if z >= zc), 1_000_000)
        assert r["p_micro"] == p
    ks = [r["rk"] for r in rows if r["p_micro"] * m <= r["rk"] * 50000]
    kmax = max(ks) if ks else 0
    for r in rows:
        assert r["rejected"] == (r["rk"] <= kmax)


def test_trimmed_mean_matches_python_replica(spark):
    """agg_trimmed_mean vs a python replica of the exact rank-window
    overlap arithmetic; n_kept = n - 2*lo; trimmed mean inside the
    kept range; winsorized mean inside [trim_lo, trim_hi] values."""
    from xova_spark.queries.relext import agg_trimmed_mean

    row = agg_trimmed_mean(spark, SF).collect()[0]
    vms = sorted(
        r["vm"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select(F.round(F.col("value") * 1000).cast("long").alias("vm"))
        .collect()
    )
    n = len(vms)
    lo = n * 5 // 100
    kept = vms[lo : n - lo]
    assert row["n_events"] == n
    assert row["n_kept"] == n - 2 * lo
    assert row["trimmed_mean_micro"] == sum(kept) * 1000 // len(kept)
    wins = sum(kept) + lo * kept[0] + lo * kept[-1]
    assert row["winsor_mean_micro"] == wins * 1000 // n
    assert kept[0] * 1000 <= row["trimmed_mean_micro"] <= kept[-1] * 1000


def test_join_asof_nearest_matches_python_replica(spark):
    """join_asof_nearest vs a python replica of the nearest rule
    (ties -> backward, equal-ts purchase counts as prior/lag 0);
    signed lag orientation checked."""
    import bisect

    from xova_spark.queries.relext import join_asof_nearest

    got = {
        r["event_id"]: (r["nearest_lag_us"], r["nearest_value"])
        for r in join_asof_nearest(spark, SF).collect()
    }
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "event_type", F.unix_micros(
            F.to_utc_timestamp("ts", "UTC")).alias("us"), "value")
        .collect()
    )
    # purchases per user ordered by (us, value) — the entry's total order
    per = {}
    for r in ev:
        if r["event_type"] == "purchase":
            per.setdefault(r["user_id"], []).append((r["us"], r["value"]))
    for v in per.values():
        v.sort()
    n_checked = 0
    for r in ev:
        if r["event_type"] != "click":
            continue
        ps = per.get(r["user_id"], [])
        want = (None, None)
        if ps:
            us = [p[0] for p in ps]
            i = bisect.bisect_right(us, r["us"])
            back = ps[i - 1] if i > 0 else None
            fwd = ps[i] if i < len(ps) else None
            if back is None:
                want = (fwd[0] - r["us"], round(fwd[1], 6))
            elif fwd is None or (r["us"] - back[0]) <= (fwd[0] - r["us"]):
                want = (-(r["us"] - back[0]), round(back[1], 6))
            else:
                want = (fwd[0] - r["us"], round(fwd[1], 6))
        assert got[r["event_id"]] == want
        n_checked += 1
    assert n_checked > 0


def test_partition_skew_audit_laws(spark):
    """layout_partition_skew_audit: file skew >= 1000 (max >= mean),
    part shares floor-sum to <= 1000*n_parts, hot flag consistent."""
    from xova_spark.queries.layoutq import layout_partition_skew_audit

    rows = layout_partition_skew_audit(spark, SF).collect()
    assert rows
    n_parts = len(rows)
    total = sum(r["total_bytes"] for r in rows)
    for r in rows:
        assert r["file_skew_permille"] >= 1000
        assert r["max_file_bytes"] * r["n_files"] >= r["total_bytes"]
        want_share = r["total_bytes"] * 1000 * n_parts // total
        assert r["part_share_permille_x"] == want_share
        assert r["hot_part"] == (want_share >= 2000)
    assert sum(r["part_share_permille_x"] for r in rows) <= 1000 * n_parts


def test_sprt_matches_python_replica(spark):
    """ev_sprt_ab_test vs a python replica of the integer LLR walk and
    the first-crossing decision rule; Wald boundary constants pinned to
    their closed forms."""
    import math

    from xova_spark.queries.relext import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_L0,
        _SPRT_L1,
        ev_sprt_ab_test,
    )

    assert _SPRT_L1 == round(math.log(0.22 / 0.18) * 1e6)
    assert _SPRT_L0 == round(math.log(0.78 / 0.82) * 1e6)
    assert _SPRT_A == round(math.log(0.95 / 0.05) * 1e6) == -_SPRT_B

    rows = {r["variant"]: r for r in ev_sprt_ab_test(spark, SF).collect()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            (F.col("user_id") % 2).alias("v"),
            F.expr(
                "unix_micros(to_utc_timestamp(ts, 'UTC')) div 3600000000"
            ).alias("hr"),
            (F.col("event_type") == "purchase").alias("s"),
        )
        .collect()
    )
    bins = {}
    for r in ev:
        sc, fc = bins.get((r["v"], r["hr"]), (0, 0))
        bins[(r["v"], r["hr"])] = (sc + int(r["s"]), fc + int(not r["s"]))
    for v in (0, 1):
        hrs = sorted(h for (vv, h) in bins if vv == v)
        llr, h1, h0, last = 0, None, None, None
        for h in hrs:
            sc, fc = bins[(v, h)]
            llr += sc * _SPRT_L1 + fc * _SPRT_L0
            if h1 is None and llr >= _SPRT_A:
                h1 = h
            if h0 is None and llr <= _SPRT_B:
                h0 = h
            last = llr
        row = rows[v]
        assert row["n_hours"] == len(hrs)
        assert row["final_llr_micro"] == last
        crossing = (
            None
            if h1 is None and h0 is None
            else min(x for x in (h1, h0) if x is not None)
        )
        assert row["crossing_hr"] == crossing
        if h1 is not None and (h0 is None or h1 <= h0):
            want = "accept_h1"
        elif h0 is not None:
            want = "accept_h0"
        else:
            want = "continue"
        assert row["decision"] == want


def test_deletion_vector_audit_laws(spark):
    """cdc_deletion_vector_audit: live + deleted == rows, rewrite flag
    and savings consistent with the 10% threshold, totals match the
    raw delete predicate."""
    from xova_spark.queries.cdcq import cdc_deletion_vector_audit

    rows = cdc_deletion_vector_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["live_rows"] + r["n_deleted"] == r["n_rows"]
        dp = r["n_deleted"] * 1000 // r["n_rows"]
        assert r["deleted_permille"] == dp
        assert r["rewrite_due"] == (dp >= 100)
        assert r["scan_rows_saved_by_rewrite"] == (
            r["n_deleted"] if dp >= 100 else 0
        )
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want_deleted = orders.filter(F.col("o_orderkey") % 97 == 3).count()
    assert sum(r["n_deleted"] for r in rows) == want_deleted
    assert sum(r["n_rows"] for r in rows) == orders.count()


def test_eval_gate_composes_its_components(spark):
    """pipeline_eval_gate_e2e must carry the IDENTICAL metric values as
    its component entries, and `ship` must equal the documented
    threshold conjunction."""
    from xova_spark.queries.relext import (
        agg_trimmed_mean,
        ev_cramers_v,
        ev_fdr_segment_residuals,
        ev_ks_test,
        ev_sprt_ab_test,
        pipeline_eval_gate_e2e,
    )

    g = pipeline_eval_gate_e2e(spark, SF).collect()[0]
    assert g["ks_micro"] == ev_ks_test(spark, SF).collect()[0]["ks_micro"]
    assert (
        g["cramers_v_micro"]
        == ev_cramers_v(spark, SF).collect()[0]["cramers_v_micro"]
    )
    fdr = sum(
        1 for r in ev_fdr_segment_residuals(spark, SF).collect() if r["rejected"]
    )
    assert g["n_fdr_rejected"] == fdr
    h1 = sum(
        1
        for r in ev_sprt_ab_test(spark, SF).collect()
        if r["decision"] == "accept_h1"
    )
    assert g["n_sprt_h1"] == h1
    assert (
        g["trimmed_mean_micro"]
        == agg_trimmed_mean(spark, SF).collect()[0]["trimmed_mean_micro"]
    )
    assert g["ship"] == (
        g["ks_micro"] < 100000
        and g["cramers_v_micro"] < 100000
        and g["n_fdr_rejected"] <= 10
        and g["n_sprt_h1"] == 0
    )
