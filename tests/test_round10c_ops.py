"""Round-10 batch-7 law tests: SRM check, Mood's median, Cliff's
delta, Cramer-von Mises, turning points, Bartels von Neumann, RMST,
G-test.

Discipline (the jackknife s^2/n lesson): every formula gets BOTH a
fixture replica in plain Python big-int arithmetic AND at least one
hand-computed tiny-population identity — a shared algebra error
between the two SQL engines is invisible to the oracle gate.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from xova_spark.session import get_spark

    return get_spark("round10c-tests")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


# ---------------------------------------------------------------------------
# SRM check


def _srm_milli(n0: int, n1: int) -> int:
    n = n0 + n1
    return 0 if n == 0 else ((n0 - n1) ** 2 * 1000) // n


def test_srm_replica_and_hand_identity(spark, duck):
    from xova_spark.queries.relext import ev_srm_check

    (row,) = ev_srm_check(spark, SF).collect()
    users = [
        u
        for (u,) in duck.execute(
            "SELECT DISTINCT user_id FROM events"
        ).fetchall()
    ]
    arms = [
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        for u in users
    ]
    n0, n1 = arms.count(0), arms.count(1)
    assert (row["n_arm0"], row["n_arm1"]) == (n0, n1)
    assert row["chi2_milli"] == _srm_milli(n0, n1)
    assert row["srm_flagged"] == (_srm_milli(n0, n1) > 3841)
    # hand identities: balanced -> 0; (3,1) -> 4*1000//4 = 1000;
    # a gross 600-vs-400 mismatch crosses the 3.841 critical value
    # ((200^2*1000)//1000 = 40000 > 3841)
    assert _srm_milli(5, 5) == 0
    assert _srm_milli(3, 1) == 1000
    assert _srm_milli(600, 400) == 40000


# ---------------------------------------------------------------------------
# Mood's median test


def _mood(groups: dict) -> tuple[int, int]:
    """groups: {name: [vm, ...]}. Returns (grand_med, chi2_micro) on
    the declared lattice (lower median, per-group fixed-shape double
    term rounded to micro before the sum)."""
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    med = allv[(n - 1) // 2]  # lower median: min vm with cum*2 >= n
    a = sum(1 for vs in groups.values() for v in vs if v > med)
    chi2 = 0
    for vs in groups.values():
        ng, ag = len(vs), sum(1 for v in vs if v > med)
        if a == 0 or a == n:
            continue
        d = ag - ng * a / n
        chi2 += round(
            d * d * (1e6 * n / (ng * a) + 1e6 * n / (ng * (n - a)))
        )
    return med, chi2


def test_mood_replica_and_hand_identity(spark, duck):
    from xova_spark.queries.relext import ev_mood_median_test

    (row,) = ev_mood_median_test(spark, SF).collect()
    cells = duck.execute(
        "SELECT event_type, CAST(round(value * 1000) AS BIGINT)"
        " FROM events"
    ).fetchall()
    groups: dict = {}
    for t, vm in cells:
        groups.setdefault(t, []).append(vm)
    med, chi2 = _mood(groups)
    assert row["grand_med_vm"] == med
    assert row["chi2_micro"] == chi2
    assert row["k_groups"] == len(groups)
    assert row["dof"] == len(groups) - 1
    # hand identity: A all above the grand median, B all below ->
    # maximal 2x2 chi2 = n (here 4 obs -> 4.000000)
    m2, c2 = _mood({"A": [10, 20], "B": [1, 2]})
    assert m2 == 2  # lower median of [1,2,10,20]
    assert c2 == 4_000_000
    # no-signal identity: identical groups -> chi2 0
    m3, c3 = _mood({"A": [1, 9], "B": [1, 9]})
    assert c3 == 0


# ---------------------------------------------------------------------------
# Cliff's delta


def _cliff_micro(a: list, b: list) -> int:
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    d = gt - lt
    nm = len(a) * len(b)
    if nm == 0:
        return 0
    return (d * 10**6) // nm if d >= 0 else -((-d) * 10**6 // nm)


def test_cliff_delta_replica_and_hand_identity(spark, duck):
    from xova_spark.queries.relext import ev_cliff_delta

    (row,) = ev_cliff_delta(spark, SF).collect()
    vals = duck.execute(
        "SELECT event_type, CAST(round(value * 1000) AS BIGINT)"
        " FROM events WHERE event_type IN ('click', 'view')"
    ).fetchall()
    a = sorted(vm for t, vm in vals if t == "click")
    b = sorted(vm for t, vm in vals if t == "view")
    # O(n log n) dominance via bisect (the O(n^2) loop is too slow at
    # the fixture size but the algebra is the same pair count)
    import bisect

    gt = sum(bisect.bisect_left(b, x) for x in a)
    lt = sum(len(b) - bisect.bisect_right(b, x) for x in a)
    d = gt - lt
    nm = len(a) * len(b)
    want = (d * 10**6) // nm if d >= 0 else -((-d) * 10**6 // nm)
    assert (row["n_click"], row["n_view"]) == (len(a), len(b))
    assert row["delta_micro"] == want
    # hand identities: complete dominance -> +1.0; reverse -> -1.0;
    # all tied -> 0; the MWU relation delta = 2U/(nm) - 1 on a mixed
    # case (a=[1,3], b=[2]: gt=1, lt=1 -> delta 0; U = 1 + 0.5*0 = 1,
    # 2*1/2 - 1 = 0)
    assert _cliff_micro([5, 6], [1, 2]) == 1_000_000
    assert _cliff_micro([1, 2], [5, 6]) == -1_000_000
    assert _cliff_micro([7, 7], [7, 7]) == 0
    assert _cliff_micro([1, 3], [2]) == 0
    # floor-vs-truncate: negative dominance floors toward zero on both
    # engines (sign outside): d=-1, nm=3 -> -(1e6//3) = -333333
    assert _cliff_micro([1], [1, 1, 2]) == -333333


# ---------------------------------------------------------------------------
# Cramer-von Mises


def _cvm(a: list, b: list) -> tuple[int, int]:
    """Returns (s_milli2, t_micro) on the declared lattice."""
    n1, n2 = len(a), len(b)
    bins = sorted(set(a) | set(b))
    ca = cb = 0
    s = 0
    from collections import Counter

    fa, fb = Counter(a), Counter(b)
    for v in bins:
        ca += fa[v]
        cb += fb[v]
        num = n2 * ca - n1 * cb
        dm = (
            num * 1000 // (n1 * n2)
            if num >= 0
            else -((-num) * 1000 // (n1 * n2))
        )
        s += (fa[v] + fb[v]) * dm * dm
    t = round(n1 * n2 * float(s) / float((n1 + n2) * (n1 + n2)))
    return s, t


def test_cvm_replica_monotone_invariance_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_cramer_von_mises

    (row,) = ev_cramer_von_mises(spark, SF).collect()
    vals = duck.execute(
        "SELECT event_type, CAST(round(value * 1000) AS BIGINT)"
        " FROM events WHERE event_type IN ('click', 'view')"
    ).fetchall()
    a = [vm for t, vm in vals if t == "click"]
    b = [vm for t, vm in vals if t == "view"]
    s, t = _cvm(a, b)
    assert row["s_milli2"] == s
    assert row["t_micro"] == t
    # monotone invariance: the statistic only sees ranks — squaring
    # nonnegative lattice values preserves order, so S and T are
    # unchanged (test on a subsample to keep the replica fast)
    sa, sb = a[:500], b[:500]
    assert _cvm(sa, sb) == _cvm([x * x for x in sa], [y * y for y in sb])
    # hand identity: a=[1], b=[2]: bin1 gap = 1*1-1*0 = 1 over
    # n1*n2 = 1 -> dm = 1000; bin2 gap = 1-1 = 0 -> dm 0;
    # S = 1*1000^2 + 1*0 = 1000000; T = 1*1*1000000/2^2 = 250000
    # micro = 1/4, the exact integral of (F-G)^2 dH for two disjoint
    # singletons weighted nm/(n+m)^2
    assert _cvm([1], [2]) == (1_000_000, 250_000)
    # identical samples -> ECDF gap identically 0
    assert _cvm([1, 2, 3], [1, 2, 3]) == (0, 0)


# ---------------------------------------------------------------------------
# Turning points


def _turning(counts: list) -> tuple[int, int, int]:
    n = len(counts)
    t = sum(
        1
        for i in range(1, n - 1)
        if (counts[i] - counts[i - 1]) * (counts[i] - counts[i + 1]) > 0
    )
    d3 = 3 * t - 2 * (n - 2)
    if 16 * n - 29 <= 0:
        z = 0
    else:
        q = (d3 * d3 * 10000) // (9 * (16 * n - 29))
        z = q if d3 >= 0 else -q
    return t, d3, z


def test_turning_points_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_turning_points_test

    (row,) = ev_turning_points_test(spark, SF).collect()
    hrs = duck.execute(
        "SELECT epoch_us(ts) // 3600000000 AS hr, count(*)"
        " FROM events GROUP BY 1 ORDER BY hr"
    ).fetchall()
    counts = [c for _, c in hrs]
    t, d3, z = _turning(counts)
    assert row["n_hours"] == len(counts)
    assert row["turning_points"] == t
    assert row["d3"] == d3
    assert row["z2_signed_milli"] == z
    # hand identities: strictly monotone -> T=0 (z negative);
    # perfect alternation -> T = n-2 (z positive); a plateau breaks
    # the strict inequality so [1,2,2,1] has NO turning point
    assert _turning([1, 2, 3, 4, 5])[0] == 0
    assert _turning([1, 5, 2, 6, 3])[0] == 3
    assert _turning([1, 2, 2, 1])[0] == 0
    # E[T] identity: for n=5 a random series expects 2(n-2)/3 = 2;
    # T=2 lands d3 = 0 exactly on the cleared-denominator lattice
    assert _turning([1, 3, 2, 4, 3])[1] == 3 * 3 - 6  # T=3 here
    assert _turning([1, 3, 2, 3, 4])[1] == 3 * 2 - 6  # T=2 -> d3 0


# ---------------------------------------------------------------------------
# Bartels von Neumann rank ratio


def _bartels(counts: list) -> tuple[int, int, int]:
    n = len(counts)
    sv = sorted(counts)
    r2 = [
        2 * (1 + sum(1 for y in counts if y < x))
        + sum(1 for y in counts if y == x)
        - 1
        for x in counts
    ]
    num4 = sum((r2[i] - r2[i + 1]) ** 2 for i in range(n - 1))
    den4 = sum(x * x for x in r2) - n * (n + 1) * (n + 1)
    rvn = 0 if den4 <= 0 else (num4 * 1000) // den4
    return num4, den4, rvn


def test_bartels_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_bartels_rank_test

    (row,) = ev_bartels_rank_test(spark, SF).collect()
    hrs = duck.execute(
        "SELECT epoch_us(ts) // 3600000000 AS hr, count(*)"
        " FROM events GROUP BY 1 ORDER BY hr"
    ).fetchall()
    counts = [c for _, c in hrs]
    num4, den4, rvn = _bartels(counts)
    assert row["n_hours"] == len(counts)
    assert row["num4"] == num4
    assert row["den4"] == den4
    assert row["rvn_milli"] == rvn
    # hand identities: untied monotone series -> ranks = positions,
    # num4 = 4(n-1), den4 = n(n^2-1)/3, rvn = 12000/(n(n+1));
    # n=5 -> num4 16, den4 40, rvn 400 (far below E=2000: persistence)
    assert _bartels([10, 20, 30, 40, 50]) == (16, 40, 400)
    # perfect alternation maximizes the ratio (> 2000)
    assert _bartels([1, 5, 2, 6, 3])[2] > 2000
    # midrank tie lattice: sum R2 = n(n+1) invariant under ties
    for series in ([1, 1, 2], [3, 3, 3], [1, 2, 3]):
        n = len(series)
        r2 = [
            2 * (1 + sum(1 for y in series if y < x))
            + sum(1 for y in series if y == x)
            - 1
            for x in series
        ]
        assert sum(r2) == n * (n + 1)


# ---------------------------------------------------------------------------
# RMST


def _rmst(durs_churn: list) -> tuple[int, int, int]:
    """durs_churn: [(dur, churned)] per user. Returns
    (tau, n_steps, rmst_micro) on the declared KM ln/exp lattice."""
    from collections import Counter

    d = Counter()
    cn = Counter()
    for dur, ch in durs_churn:
        (d if ch else cn)[dur] += 1
    alldur = sorted(set(d) | set(cn))
    total = len(durs_churn)
    risk = {}
    seen = 0
    for t in sorted(alldur, reverse=True):
        seen += d[t] + cn[t]
        risk[t] = seen
    steps = [t for t in alldur if d[t] > 0]
    if not steps:
        return 0, 0, 0
    tau = max(steps)
    cum = 0
    dead = False
    s_at = {}
    for t in steps:
        if d[t] < risk[t]:
            cum += round(math.log((risk[t] - d[t]) / risk[t]) * 1e6)
        else:
            dead = True
        s_at[t] = 0 if dead else round(math.exp(cum / 1e6) * 1e6)
    rmst = steps[0] * 10**6
    for i in range(len(steps) - 1):
        rmst += s_at[steps[i]] * (steps[i + 1] - steps[i])
    return tau, len(steps), rmst


def test_rmst_replica_and_laws(spark, duck):
    from xova_spark.queries.relext import ev_rmst

    (row,) = ev_rmst(spark, SF).collect()
    spans = duck.execute(
        """
        WITH spans AS (
          SELECT user_id,
                 min(epoch_us(ts) // 3600000000) AS f,
                 max(epoch_us(ts) // 3600000000) AS l
          FROM events GROUP BY user_id
        ), h AS (SELECT max(l) AS m FROM spans)
        SELECT l - f, CASE WHEN l <= m - 12 THEN 1 ELSE 0 END
        FROM spans, h
        """
    ).fetchall()
    tau, n_steps, rmst = _rmst(spans)
    assert row["tau_hours"] == tau
    assert row["n_steps"] == n_steps
    assert row["rmst_micro_hours"] == rmst
    # law: RMST <= tau (area under a curve bounded by 1)
    assert rmst <= tau * 10**6
    # hand identities: everyone churns at t=5 -> S=1 until 5, RMST=5;
    assert _rmst([(5, 1), (5, 1)]) == (5, 1, 5_000_000)
    # two steps, no censoring: deaths at 2 (1 of 2) and 4 (1 of 1):
    # S(2) = exp(round(ln(0.5)*1e6)/1e6) ~ 0.5 -> RMST ~ 2 + 0.5*2 = 3
    tau2, ns2, r2 = _rmst([(2, 1), (4, 1)])
    assert (tau2, ns2) == (4, 2)
    assert abs(r2 - 3_000_000) <= 5  # ln/exp lattice slack


# ---------------------------------------------------------------------------
# G-test


def _gtest(cells: dict) -> tuple[int, int]:
    """cells: {(r_key, c_key): count}. Returns (dof, g2_milli)."""
    from collections import Counter

    r = Counter()
    c = Counter()
    n = 0
    for (rk, ck), o in cells.items():
        r[rk] += o
        c[ck] += o
        n += o
    s = 0
    for (rk, ck), o in cells.items():
        lr = round(math.log(o * n / (r[rk] * c[ck])) * 1e6)
        s += o * lr
    dof = (len(r) - 1) * (len(c) - 1)
    return dof, (2 * max(s, 0)) // 1000


def test_gtest_replica_and_laws(spark, duck):
    from xova_spark.queries.relext import ev_gtest_independence

    (row,) = ev_gtest_independence(spark, SF).collect()
    cells = {
        (t, h): o
        for t, h, o in duck.execute(
            "SELECT event_type, date_part('hour', ts), count(*)"
            " FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    dof, g2 = _gtest(cells)
    assert row["n_cells"] == len(cells)
    assert row["dof"] == dof
    assert row["g2_milli"] == g2
    # laws: exact independence (product table) -> every cell's
    # O*N == r*c -> ln term 0 -> G = 0
    prod = {("a", "x"): 10, ("a", "y"): 20, ("b", "x"): 30, ("b", "y"): 60}
    assert _gtest(prod) == (1, 0)
    # hand 2x2 with association: O=[[30,10],[10,30]], N=80,
    # G = 2*sum O ln(O*80/(40*40)) = 2*(30ln1.5+10ln0.5)*2
    d2, g = _gtest(
        {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 10, ("b", "y"): 30}
    )
    want = 2 * (
        30 * round(math.log(1.5) * 1e6) + 10 * round(math.log(0.5) * 1e6)
    ) * 2 // 1000
    assert (d2, g) == (1, want)
    # hand double-check: 4*(30*ln1.5 + 10*ln0.5) = 20.9299... ->
    # 20929 milli on the lattice (vs Pearson chi2 = 20 on the same
    # table — G runs slightly hot under association, as the theory
    # says)
    assert abs(g - 20929) <= 1
