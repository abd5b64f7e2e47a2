"""Round-10 batch-10 law tests: streaming SRM monitor, seasonal
Mann-Kendall, blocked Levenshtein join, Honore's R.
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

    return get_spark("round10f-tests")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "part", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


# ---------------------------------------------------------------------------
# Streaming SRM monitor


def test_stream_srm_matches_batch_windows(spark, duck):
    from xova_spark.queries.streamingq import stream_srm_monitor

    rows = {r["w6"]: r for r in stream_srm_monitor(spark, SF).collect()}
    vals = duck.execute(
        "SELECT epoch_us(ts) // 21600000000, user_id FROM events"
    ).fetchall()
    from collections import defaultdict

    wins = defaultdict(lambda: [0, 0])
    for w6, u in vals:
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        wins[w6][arm] += 1
    assert set(rows) == set(wins)
    for w6, (n0, n1) in wins.items():
        r = rows[w6]
        assert (r["n_arm0"], r["n_arm1"]) == (n0, n1)
        chi2 = (n0 - n1) ** 2 * 1000 // (n0 + n1)
        assert r["chi2_milli"] == chi2
        assert r["srm_flagged"] == (chi2 > 3841)
    # the monitor must cover the full event span contiguously in w6
    # index space EXCEPT genuinely empty windows
    assert len(rows) >= 1


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall


def _smk(cells: dict):
    """cells: {(hod, day): cnt}. Returns (s_total, var18, z2m)."""
    from collections import defaultdict

    series = defaultdict(dict)
    for (hod, d), c in cells.items():
        series[hod][d] = c
    s_total = 0
    var18 = 0
    for hod, by_day in series.items():
        days = sorted(by_day)
        n = len(days)
        sg = 0
        for i in range(n):
            for j in range(i + 1, n):
                a, b = by_day[days[i]], by_day[days[j]]
                sg += (b > a) - (b < a)
        ties = defaultdict(int)
        for d in days:
            ties[by_day[d]] += 1
        tsum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        s_total += sg
        var18 += n * (n - 1) * (2 * n + 5) - tsum
    if var18 <= 0 or s_total == 0:
        z = 0
    else:
        q = (max(abs(s_total) - 1, 0) ** 2 * 18000) // var18
        z = q if s_total > 0 else -q
    return s_total, var18, z


def test_seasonal_mk_replica_and_laws(spark, duck):
    from xova_spark.queries.relext import ev_seasonal_mann_kendall

    (row,) = ev_seasonal_mann_kendall(spark, SF).collect()
    cells = {
        (h, d): c
        for h, d, c in duck.execute(
            "SELECT CAST(extract(hour FROM ts) AS BIGINT),"
            " epoch_us(ts) // 86400000000, count(*)"
            " FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    s_total, var18, z = _smk(cells)
    assert row["s_total"] == s_total
    assert row["var18"] == var18
    assert row["z2_signed_milli"] == z
    assert row["n_seasons"] == len({h for h, _ in cells})
    # laws: a pure diurnal pattern with NO day-over-day trend has
    # s = 0 per season (each season is constant across days)
    flat = {(h, d): 100 + h for h in range(3) for d in range(4)}
    assert _smk(flat)[0] == 0
    # a monotone day trend shared by all seasons accumulates every
    # season's maximal S = n(n-1)/2
    trend = {(h, d): d * 10 + h for h in range(3) for d in range(4)}
    assert _smk(trend)[0] == 3 * (4 * 3 // 2)
    # seasonal additivity: var18 of k identical seasons = k * var18
    one = {(0, d): d for d in range(5)}
    two = {(h, d): d for h in range(2) for d in range(5)}
    assert _smk(two)[1] == 2 * _smk(one)[1]


# ---------------------------------------------------------------------------
# Blocked Levenshtein join


def test_levenshtein_join_replica_and_laws(spark, duck):
    from xova_spark.queries.relext import join_levenshtein_blocked

    rows = join_levenshtein_blocked(spark, SF).collect()
    assert len(rows) == 20
    names = dict(
        duck.execute("SELECT p_partkey, p_name FROM part").fetchall()
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    for r in rows:
        na, nb = names[r["pk_a"]], names[r["pk_b"]]
        # block contract: candidates share the 12-char prefix
        assert na[:12] == nb[:12]
        assert r["dist"] == lev(na, nb)
        assert r["dist"] <= 6
    # deterministic ranking: (dist, pk_a, pk_b) ascending
    keys = [(r["dist"], r["pk_a"], r["pk_b"]) for r in rows]
    assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# Honore's R


def test_honore_replica_and_boundary(spark, duck):
    from xova_spark.queries.textops import t_honore_r

    rows = {r["source"]: r for r in t_honore_r(spark, SF).collect()}
    wf = duck.execute(
        """
        SELECT source, word, count(*) FROM (
          SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents
        ) WHERE word != '' GROUP BY 1, 2
        """
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0])
    for src, _, c in wf:
        a = per[src]
        a[0] += 1
        a[1] += 1 if c == 1 else 0
        a[2] += c
    for src, (v, f1, n) in per.items():
        r = rows[src]
        if f1 == v:
            assert r["honore_r_milli"] == 0
        else:
            lnn = round(math.log(n) * 10**6)
            want = lnn * 100000 // (10**6 - f1 * 10**6 // v)
            assert r["honore_r_milli"] == want
        # monotone law: R grows with hapax share at fixed N (check
        # the formula, not the fixture): denom shrinks as f1/V grows
    lnn = round(math.log(1000) * 10**6)
    rs = [
        lnn * 100000 // (10**6 - f1 * 10**6 // 100)
        for f1 in (10, 50, 90)
    ]
    assert rs == sorted(rs)
