"""Round-10 batch-9 law tests: Mood dispersion, Wilcoxon signed-rank,
Cox-Stuart, Kendall's W, experiment readout composite.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from xova_spark.session import get_spark

    return get_spark("round10e-tests")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


# ---------------------------------------------------------------------------
# Mood dispersion


def _mood_disp(a: list, b: list):
    """Returns (vr_micro, z2m) on the declared downscaled lattice."""
    from collections import Counter

    fa, fb = Counter(a), Counter(b)
    bins = sorted(set(a) | set(b))
    m, n2 = len(a), len(b)
    n = m + n2
    cb = 0
    t4ds = 0
    for v in bins:
        ct = fa[v] + fb[v]
        dd = 2 * cb + ct + 1 - (n + 1)
        t4ds += fa[v] * ((dd * dd) // 10**6)
        cb += ct
    ed = m * (n * n - 1) // 3_000_000
    vr = 0 if ed == 0 else t4ds * 10**6 // ed
    if m == 0 or n2 == 0 or n < 3:
        z = 0
    else:
        d6 = t4ds - ed
        vn = 4.0 * m * n2 * (n + 1) * (float(n) * n - 4)
        q = round(1.0e15 * float(abs(d6)) / vn * float(abs(d6)))
        z = q if d6 >= 0 else -q
    return vr, z


def test_mood_dispersion_replica_and_laws(spark, duck):
    from xova_spark.queries.relext import ev_mood_dispersion_test

    (row,) = ev_mood_dispersion_test(spark, SF).collect()
    vals = duck.execute(
        "SELECT event_type, CAST(round(value * 1000) AS BIGINT)"
        " FROM events WHERE event_type IN ('click', 'view')"
    ).fetchall()
    a = [vm for t, vm in vals if t == "click"]
    b = [vm for t, vm in vals if t == "view"]
    vr, z = _mood_disp(a, b)
    assert row["vr_micro"] == vr
    assert row["z2_signed_milli"] == z
    # dispersion law: A in the tails, B in the middle -> A's squared
    # rank deviations exceed expectation (vr > 1e6, z positive). The
    # populations must be LARGE: dd is in doubled-rank units, so the
    # declared 1e6 downscale needs N in the thousands before per-term
    # signal survives (exactly the regime the entry targets)
    wide = list(range(1, 2501)) + list(range(7501, 10001))
    narrow = list(range(2501, 7501))
    vr_w, z_w = _mood_disp(wide, narrow)
    assert vr_w > 10**6 and z_w > 0
    vr_n, z_n = _mood_disp(narrow, wide)
    assert vr_n < 10**6 and z_n < 0


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank


def _wilcoxon(pairs: list):
    """pairs: list of (early, late). Returns (n, w2p, d2w, z2m)."""
    from collections import Counter

    ds = [l - e for e, l in pairs if l != e]
    n = len(ds)
    fa = Counter(abs(d) for d in ds)
    fp = Counter(abs(d) for d in ds if d > 0)
    cb = 0
    w2p = 0
    t3t = 0
    for ad in sorted(fa):
        ct = fa[ad]
        w2p += fp[ad] * (2 * cb + ct + 1)
        t3t += ct**3 - ct
        cb += ct
    d2w = 2 * w2p - n * (n + 1)
    varnum2 = 2 * (n * (n + 1) * (2 * n + 1) - t3t // 2)
    if varnum2 <= 0:
        z = 0
    else:
        q = (abs(d2w) * abs(d2w) * 3000) // varnum2
        z = q if d2w >= 0 else -q
    return n, w2p, d2w, z


def test_wilcoxon_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_wilcoxon_signed_rank

    (row,) = ev_wilcoxon_signed_rank(spark, SF).collect()
    hrs = dict(
        duck.execute(
            "SELECT epoch_us(ts) // 3600000000, count(*)"
            " FROM events GROUP BY 1"
        ).fetchall()
    )
    pairs = [
        (c, hrs[h + 24]) for h, c in hrs.items() if h + 24 in hrs
    ]
    n, w2p, d2w, z = _wilcoxon(pairs)
    assert row["n_pairs_nonzero"] == n
    assert row["w2_plus"] == w2p
    assert row["d2w"] == d2w
    assert row["z2_signed_milli"] == z
    # hand identities: all-positive differences maximize W+ ->
    # d2w = n(n+1), z positive; symmetric differences cancel
    np_, wp_, dp_, zp_ = _wilcoxon([(0, 1), (0, 2), (0, 3)])
    assert (np_, wp_) == (3, 12)  # ranks 1,2,3 doubled: 2+4+6
    assert dp_ == 12 and zp_ > 0
    nz, wz, dz, zz = _wilcoxon([(0, 1), (1, 0)])  # +1 and -1 tie on |d|
    assert wz == 3  # midrank 1.5 doubled for the positive one
    assert dz == 0 and zz == 0
    # zeros drop per the classical convention
    assert _wilcoxon([(5, 5), (0, 1)])[0] == 1
    # ANALYTIC_BOUNDS law (lattice_headroom overrides cite this node):
    # W2+ and |d2w| are bounded by n(n+1) — calendar-capped, never
    # data-grain — and the z^2 dividend by 3000*(n(n+1))^2
    assert 0 <= w2p <= n * (n + 1)
    assert abs(d2w) <= n * (n + 1)
    assert abs(d2w) ** 2 * 3000 <= 3000 * (n * (n + 1)) ** 2
    for ps in ([(0, 1), (0, 2)], [(3, 1), (9, 2), (4, 4)]):
        np2, wp2, dp2, _ = _wilcoxon(ps)
        assert 0 <= wp2 <= np2 * (np2 + 1)
        assert abs(dp2) <= np2 * (np2 + 1)


# ---------------------------------------------------------------------------
# Cox-Stuart


def _cox_stuart(counts: list):
    n = len(counts)
    lag = (n + 1) // 2
    sp = sm = 0
    for i in range(n - lag):
        if counts[i + lag] > counts[i]:
            sp += 1
        elif counts[i + lag] < counts[i]:
            sm += 1
    if sp + sm == 0:
        z = 0
    else:
        d = max(abs(sp - sm) - 1, 0)
        q = d * d * 1000 // (sp + sm)
        z = q if sp >= sm else -q
    return sp, sm, z


def test_cox_stuart_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_cox_stuart_trend

    (row,) = ev_cox_stuart_trend(spark, SF).collect()
    hrs = duck.execute(
        "SELECT epoch_us(ts) // 3600000000 AS hr, count(*)"
        " FROM events GROUP BY 1 ORDER BY hr"
    ).fetchall()
    counts = [c for _, c in hrs]
    sp, sm, z = _cox_stuart(counts)
    assert row["n_hours"] == len(counts)
    assert (row["s_plus"], row["s_minus"]) == (sp, sm)
    assert row["n_pairs_used"] == sp + sm
    assert row["z2_signed_milli"] == z
    # hand identities: strictly increasing -> all up-moves, z > 0;
    # odd length drops the middle element
    assert _cox_stuart([1, 2, 3, 4]) == (2, 2 - 2, (2 - 1) ** 2 * 1000 // 2)
    assert _cox_stuart([1, 2, 3, 4, 5]) == (2, 0, 500)
    assert _cox_stuart([5, 4, 3, 2, 1])[2] == -500
    assert _cox_stuart([7, 7, 7, 7])[2] == 0  # all ties drop


# ---------------------------------------------------------------------------
# Kendall's W


def test_kendall_w_vs_friedman_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_friedman_test, ev_kendall_w

    (row,) = ev_kendall_w(spark, SF).collect()
    fr = ev_friedman_test(spark, SF).collect()[0]
    # shared-machinery law: identical chi2 on the identical design
    assert row["chi2_milli"] == fr["chi2_milli"]
    assert row["n_blocks"] == fr["n_blocks"]
    b = row["n_blocks"]
    assert row["w_micro"] == row["chi2_milli"] * 1000 // (b * 2)
    # range law: W in [0, 1e6] (floor-div keeps it under 1e6 even at
    # perfect concordance where chi2 = 2b exactly)
    assert 0 <= row["w_micro"] <= 10**6
    # hand: perfect concordance chi2_milli = 2000*b -> w = 1e6
    assert (2000 * b) * 1000 // (b * 2) == 10**6


# ---------------------------------------------------------------------------
# Experiment readout composite


def test_experiment_readout_composes_components(spark, duck):
    from xova_spark.queries.relext import (
        ev_srm_check,
        ev_tost_equivalence,
        pipeline_experiment_readout_e2e,
    )

    (row,) = pipeline_experiment_readout_e2e(spark, SF).collect()
    (srm,) = ev_srm_check(spark, SF).collect()
    (tost,) = ev_tost_equivalence(spark, SF).collect()
    assert row["n_users"] == srm["n_users"]
    assert row["srm_chi2_milli"] == srm["chi2_milli"]
    assert row["srm_flagged"] == srm["srm_flagged"]
    assert row["delta_micro"] == tost["delta_micro"]
    assert row["equivalent"] == tost["equivalent"]
    want = (
        "invalid_assignment"
        if srm["srm_flagged"]
        else "no_effect_certified"
        if tost["equivalent"]
        else "effect_beyond_margin"
        if abs(tost["delta_micro"]) > 50000
        else "inconclusive"
    )
    assert row["readout"] == want
    # on this fixture the user-clustered delta (~1.8 units) forces
    # the margin branch: not flagged, not equivalent, |d| > eps
    assert row["readout"] == "effect_beyond_margin"
