"""Round-10 batch-4 law tests: blocked nonparametrics (Friedman,
Cochran's Q), Fleiss' kappa, Pettitt changepoint, Wald-Wolfowitz runs,
gain/lift deciles, Chao1 richness, Good-Turing trigram counts, Fano
burstiness, Tukey IQR fences, sign-bit recall, sampled closeness.

Discipline (the jackknife s^2/n lesson): every formula gets BOTH a
fixture replica in plain Python big-int arithmetic AND at least one
hand-computed tiny-population identity — a shared algebra error
between the two SQL engines is invisible to the oracle gate.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from xova_spark.session import get_spark

    return get_spark("round10b-tests")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


# ---------------------------------------------------------------------------
# Friedman


def _friedman_lattice(blocks: dict) -> tuple[int, dict]:
    """blocks: {blk: {trt: cellv}} with all k=3 treatments present.
    Returns (chi2_milli, {trt: r2_sum}) on the exact doubled-midrank
    lattice the entry declares."""
    r2 = {}
    for cells in blocks.values():
        vals = sorted(cells.values())
        for trt, v in cells.items():
            rk = 1 + sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            r2[trt] = r2.get(trt, 0) + 2 * rk + ties - 1
    n = len(blocks)
    k = 3
    ssq = sum(v * v for v in r2.values())
    chi2 = (3000 * ssq - 3000 * n * n * k * (k + 1) * (k + 1)) // (
        n * k * (k + 1)
    )
    return chi2, r2


def test_friedman_replica_and_hand_identity(spark, duck):
    from xova_spark.queries.relext import ev_friedman_test

    rows = ev_friedman_test(spark, SF).collect()
    cells = duck.execute(
        """
        SELECT l_suppkey, l_returnflag,
               CAST(sum(CAST(l_quantity AS BIGINT)) * 1000000
                    // count(*) AS BIGINT)
        FROM lineitem GROUP BY 1, 2
        """
    ).fetchall()
    blocks: dict = {}
    for blk, trt, v in cells:
        blocks.setdefault(blk, {})[trt] = v
    blocks = {b: c for b, c in blocks.items() if len(c) == 3}
    chi2, r2 = _friedman_lattice(blocks)
    assert {r["l_returnflag"]: r["r2_sum"] for r in rows} == r2
    assert rows[0]["chi2_milli"] == chi2
    assert rows[0]["n_blocks"] == len(blocks)
    # hand identity: 3 blocks, perfect ordering A<N<R in every block ->
    # rank sums 3,6,9 (R2 6,12,18), chi2 = 12/(3*3*4)*126 - 36 = 6.000
    hand, hr2 = _friedman_lattice(
        {
            1: {"A": 10, "N": 20, "R": 30},
            2: {"A": 1, "N": 2, "R": 3},
            3: {"A": 5, "N": 6, "R": 7},
        }
    )
    assert hand == 6000
    assert hr2 == {"A": 6, "N": 12, "R": 18}
    # midrank lattice: an all-tied block contributes rank2 = 4 each
    # (midrank 2), keeping sum R2_j invariant at k(k+1) per block
    tied, tr2 = _friedman_lattice({1: {"A": 5, "N": 5, "R": 5}})
    assert tr2 == {"A": 4, "N": 4, "R": 4}
    assert tied == 0  # no treatment effect


# ---------------------------------------------------------------------------
# Cochran's Q


def _cochran_q_milli(rows_: list) -> int:
    """rows_: list of (s1, s2, s3) binary triples."""
    k = 3
    c = [sum(r[j] for r in rows_) for j in range(3)]
    n = sum(c)
    srsq = sum(sum(r) ** 2 for r in rows_)
    den = k * n - srsq
    if den <= 0:
        return 0
    return ((k - 1) * (k * sum(x * x for x in c) - n * n) * 1000) // den


def test_cochran_q_replica_and_hand_identity(spark, duck):
    from xova_spark.queries.relext import ev_cochran_q

    (row,) = ev_cochran_q(spark, SF).collect()
    cells = duck.execute(
        """
        WITH lines AS (
          SELECT l_orderkey AS blk, l_linenumber AS trt,
                 CASE WHEN CAST(l_quantity AS BIGINT) >= 25
                      THEN 1 ELSE 0 END AS s
          FROM lineitem WHERE l_linenumber <= 3
        ), ok AS (
          SELECT blk FROM lines GROUP BY blk
          HAVING count(*) = 3 AND count(DISTINCT trt) = 3
        )
        SELECT blk,
               max(CASE WHEN trt = 1 THEN s END),
               max(CASE WHEN trt = 2 THEN s END),
               max(CASE WHEN trt = 3 THEN s END)
        FROM lines JOIN ok USING (blk) GROUP BY blk
        """
    ).fetchall()
    triples = [(a, b, c) for _, a, b, c in cells]
    assert row["n_blocks"] == len(triples)
    assert row["q_milli"] == _cochran_q_milli(triples)
    assert row["c1"] == sum(t[0] for t in triples)
    # hand identity: blocks (1,1,0),(1,0,0),(1,0,1),(1,1,1): C=(4,2,2),
    # N=8, sum R^2 = 4+1+4+9 = 18, Q = 2*(3*24-64)/(24-18) = 16/6 ->
    # 2666 milli
    assert _cochran_q_milli([(1, 1, 0), (1, 0, 0), (1, 0, 1), (1, 1, 1)]) == 2666
    # all-agree blocks carry no information -> guard returns 0
    assert _cochran_q_milli([(1, 1, 1), (0, 0, 0)]) == 0


# ---------------------------------------------------------------------------
# Fleiss' kappa


def _fleiss_lattice(items: list) -> tuple[int, int, int]:
    """items: list of (n_i0, n_i1, n_i2) with sum = m = 4. Returns
    (pbar_nano, pe_nano, kappa_micro) on the declared nano lattice."""
    m = 4
    n = len(items)
    a_sq = sum(x * x for it in items for x in it)
    t = [sum(it[j] for it in items) for j in range(3)]
    pbar_nano = ((a_sq - n * m) * 1_000_000_000) // (n * m * (m - 1))
    pe_nano = (sum(x * x for x in t) * 1_000_000_000) // (
        (n * m) * (n * m)
    )
    den = 1_000_000_000 - pe_nano
    if den <= 0:
        return pbar_nano, pe_nano, 0
    kappa = (
        (pbar_nano - pe_nano) * 1_000_000 + 10_000_000 * den
    ) // den - 10_000_000
    return pbar_nano, pe_nano, kappa


def test_fleiss_kappa_replica_and_laws(spark, duck):
    from xova_spark.queries.relext import ev_fleiss_kappa

    (row,) = ev_fleiss_kappa(spark, SF).collect()
    cells = duck.execute(
        """
        WITH eligible AS (
          SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) >= 4
        ), raters AS (
          SELECT l_orderkey AS item,
                 least((CAST(l_quantity AS BIGINT) - 1) // 17, 2) AS cat,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_partkey,
                                             l_suppkey, l_quantity,
                                             l_extendedprice) AS rn
          FROM lineitem JOIN eligible USING (l_orderkey)
        )
        SELECT item,
               sum(CASE WHEN cat = 0 THEN 1 ELSE 0 END),
               sum(CASE WHEN cat = 1 THEN 1 ELSE 0 END),
               sum(CASE WHEN cat = 2 THEN 1 ELSE 0 END)
        FROM raters WHERE rn <= 4 GROUP BY item
        """
    ).fetchall()
    items = [(a, b, c) for _, a, b, c in cells]
    pbar, pe, kappa = _fleiss_lattice(items)
    assert row["pbar_nano"] == pbar
    assert row["pe_nano"] == pe
    assert row["kappa_micro"] == kappa
    assert row["n_items"] == len(items)
    # hand identities: perfect agreement -> kappa exactly 1e6
    _, _, k1 = _fleiss_lattice([(4, 0, 0), (0, 4, 0), (0, 0, 4)])
    assert k1 == 1_000_000
    # maximal disagreement on two balanced cats: every item 2-2 split
    # -> Pbar = (4+4-4)/12 = 1/3, Pe = 1/2, kappa = -1/3
    _, _, k2 = _fleiss_lattice([(2, 2, 0), (2, 2, 0)])
    assert k2 == -333_334  # floor on the shifted lattice
    # shift-safety law the docstring claims: kappa > -10 always
    assert kappa > -10_000_000


# ---------------------------------------------------------------------------
# Pettitt


def _pettitt(xs: list) -> tuple[int, int, int]:
    """xs in day order. Returns (t_star, k_stat, p_exp_micro)."""
    n = len(xs)
    svals = sorted(xs)
    r2 = []
    for v in xs:
        rk = 1 + sum(1 for x in svals if x < v)
        ties = sum(1 for x in svals if x == v)
        r2.append(2 * rk + ties - 1)
    best_t, best_u = None, None
    acc = 0
    for t in range(1, n):
        acc += r2[t - 1]
        u = acc - t * (n + 1)
        if best_u is None or abs(u) > abs(best_u):
            best_t, best_u = t, u
    k = abs(best_u)
    return best_t, k, (6 * k * k * 1_000_000) // (n**3 + n**2)


def test_pettitt_replica_and_hand_identity(spark, duck):
    from xova_spark.queries.relext import ev_pettitt_changepoint

    (row,) = ev_pettitt_changepoint(spark, SF).collect()
    daily = duck.execute(
        """
        SELECT epoch_us(ts) // 86400000000 AS d,
               sum(CAST(round(value * 1000) AS BIGINT)) AS xv
        FROM events GROUP BY 1 ORDER BY d
        """
    ).fetchall()
    xs = [xv for _, xv in daily]
    t_star, k_stat, p_exp = _pettitt(xs)
    assert row["n_days"] == len(xs)
    assert row["t_star"] == t_star
    assert row["k_stat"] == k_stat
    assert row["p_exp_micro"] == p_exp
    assert row["day_star"] == daily[t_star - 1][0]
    # hand identity: level shift after t=3 in [1,2,3,10,11,12]:
    # U = (-5,-8,-9,-8,-5), K = 9 at t = 3
    t, k, _ = _pettitt([1, 2, 3, 10, 11, 12])
    assert (t, k) == (3, 9)
    # antisymmetry: reversing the series keeps K, mirrors t
    t2, k2, _ = _pettitt([12, 11, 10, 3, 2, 1])
    assert (t2, k2) == (3, 9)


# ---------------------------------------------------------------------------
# Runs test


def _runs(xs: list) -> tuple[int, int, int, int, int]:
    """xs daily counts in day order. Returns (n_kept, n_above, n_below,
    n_runs, z2_milli)."""
    n = len(xs)
    svals = sorted(xs)
    m2 = svals[(n + 1) // 2 - 1] + svals[n // 2]
    kept = [1 if 2 * x > m2 else 0 for x in xs if 2 * x != m2]
    nk = len(kept)
    a = sum(kept)
    b = nk - a
    r = sum(
        1
        for i, s in enumerate(kept)
        if i == 0 or kept[i - 1] != s
    )
    num = r * nk - nk - 2 * a * b
    den = 2 * a * b * (2 * a * b - nk)
    z2 = 0 if (a == 0 or b == 0 or 2 * a * b - nk <= 0) else (
        num * num * (nk - 1) * 1000
    ) // den
    return nk, a, b, r, z2


def test_runs_replica_and_hand_identity(spark, duck):
    from xova_spark.queries.relext import ev_runs_test

    (row,) = ev_runs_test(spark, SF).collect()
    daily = duck.execute(
        """
        SELECT epoch_us(ts) // 86400000000 AS d, count(*) AS c
        FROM events GROUP BY 1 ORDER BY d
        """
    ).fetchall()
    nk, a, b, r, z2 = _runs([c for _, c in daily])
    assert (
        row["n_kept"],
        row["n_above"],
        row["n_below"],
        row["n_runs"],
        row["z2_milli"],
    ) == (nk, a, b, r, z2)
    # hand identities: perfect alternation vs single switch — same
    # |z| (R-mu = +-2 around mu = 3 at a=b=2), opposite direction:
    # z^2 = 4*3/(8*(8-4)/4) ... = (R*4-4-8)^2*3*1000 // 32 = 1500
    assert _runs([10, 1, 10, 1])[3:] == (4, 1500)
    assert _runs([10, 10, 1, 1])[3:] == (2, 1500)


# ---------------------------------------------------------------------------
# Gain / lift deciles


def test_lift_gain_laws(spark, duck):
    from xova_spark.queries.relext import ev_lift_gain_curve

    rows = sorted(
        ev_lift_gain_curve(spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    (tot_n, tot_pos) = duck.execute(
        "SELECT count(*), sum(CASE WHEN event_type = 'purchase'"
        " THEN 1 ELSE 0 END) FROM events"
    ).fetchone()
    assert sum(r["n_rows"] for r in rows) == tot_n
    assert sum(r["n_pos"] for r in rows) == tot_pos
    # cumulative laws: monotone capture; final decile closes the curve
    # at gain = 1e6 and lift = 1e6 exactly
    cum = [r["cum_pos"] for r in rows]
    assert cum == sorted(cum)
    assert cum[-1] == tot_pos
    assert rows[-1]["gain_micro"] == 1_000_000
    assert rows[-1]["lift_micro"] == 1_000_000
    # gain is the floored cumulative share
    for r in rows:
        assert r["gain_micro"] == r["cum_pos"] * 1_000_000 // tot_pos


# ---------------------------------------------------------------------------
# Chao1


def test_chao1_replica_and_laws(spark, duck):
    from xova_spark.queries.textops import t_chao1_vocab_richness

    rows = t_chao1_vocab_richness(spark, SF).collect()
    wf = duck.execute(
        """
        WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
                   FROM documents)
        SELECT source, word, count(*) FROM w WHERE word != ''
        GROUP BY 1, 2
        """
    ).fetchall()
    per: dict = {}
    for src, _w, c in wf:
        d = per.setdefault(src, [0, 0, 0])
        d[0] += 1
        d[1] += 1 if c == 1 else 0
        d[2] += 1 if c == 2 else 0
    for r in rows:
        dv, f1, f2 = per[r["source"]]
        assert (r["d_vocab"], r["f1"], r["f2"]) == (dv, f1, f2)
        corr = (
            f1 * f1 * 1_000_000 // (2 * f2)
            if f2 > 0
            else f1 * (f1 - 1) * 1_000_000 // 2
        )
        assert r["chao1_micro"] == dv * 1_000_000 + corr
        # estimator law: chao1 >= observed richness, always
        assert r["chao1_micro"] >= dv * 1_000_000


# ---------------------------------------------------------------------------
# Good-Turing (trigram types)


def test_good_turing_replica(spark, duck):
    from xova_spark.queries.textops import t_good_turing_counts

    rows = sorted(
        t_good_turing_counts(spark, SF).collect(), key=lambda r: r["r"]
    )
    texts = duck.execute("SELECT text FROM documents").fetchall()
    from collections import Counter

    tf: Counter = Counter()
    for (txt,) in texts:
        ws = txt.split(" ")
        for i in range(len(ws) - 2):
            tf[" ".join(ws[i : i + 3])] += 1
    fof = Counter(tf.values())
    assert rows, "trigram unit must populate r <= 8 (the unigram vocab"
    " is saturated — pinned here)"
    for r in rows:
        assert r["n_r"] == fof[r["r"]]
        n_r1 = fof.get(r["r"] + 1, 0)
        assert r["n_r_plus_1"] == n_r1
        assert r["r_star_micro"] == (r["r"] + 1) * n_r1 * 1_000_000 // fof[
            r["r"]
        ]
    # and the unigram degeneracy claim itself
    uf = Counter()
    for (txt,) in texts:
        for w in txt.split(" "):
            if w:
                uf[w] += 1
    assert min(uf.values()) > 8


# ---------------------------------------------------------------------------
# Fano burstiness


def test_burstiness_fano_replica_and_laws(spark, duck):
    from xova_spark.queries.textops import t_burstiness_fano

    rows = t_burstiness_fano(spark, SF).collect()
    assert len(rows) == 20
    (n_docs,) = duck.execute("SELECT count(*) FROM documents").fetchone()
    dc = duck.execute(
        """
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                   FROM documents)
        SELECT word, doc_id, count(*) FROM w WHERE word != ''
        GROUP BY 1, 2
        """
    ).fetchall()
    per: dict = {}
    for w, _d, c in dc:
        s = per.setdefault(w, [0, 0, 0])  # ssq, t, present
        s[0] += c * c
        s[1] += c
        s[2] += 1
    for r in rows:
        ssq, t, pres = per[r["word"]]
        assert r["total_count"] == t
        assert r["n_docs_present"] == pres
        fano = (n_docs * ssq - t * t) * 1_000_000 // (n_docs * t)
        assert r["fano_micro"] == fano
        # Cauchy-Schwarz law: the dividend is nonnegative
        assert r["fano_micro"] >= 0


# ---------------------------------------------------------------------------
# IQR fences


def test_iqr_replica_and_constructed_skew(spark, duck):
    from xova_spark.queries.dataqual import dq_outlier_iqr

    rows = dq_outlier_iqr(spark, SF).collect()
    data = duck.execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT)"
        " FROM lineitem"
    ).fetchall()
    per: dict = {}
    for f, v in data:
        per.setdefault(f, []).append(v)

    def fences(vs):
        vs = sorted(vs)
        n = len(vs)
        q1 = vs[(n + 3) // 4 - 1]
        q3 = vs[(3 * n + 3) // 4 - 1]
        lo = sum(1 for v in vs if 2 * v < 2 * q1 - 3 * (q3 - q1))
        hi = sum(1 for v in vs if 2 * v > 2 * q3 + 3 * (q3 - q1))
        return n, q1, q3, lo, hi

    for r in rows:
        assert fences(per[r["l_returnflag"]]) == (
            r["n_rows"],
            r["q1"],
            r["q3"],
            r["n_low_outliers"],
            r["n_high_outliers"],
        )
    # constructed skew through the same lattice formula: 1..9 plus a
    # 200 spike -> q1 = 3, q3 = 8, hi fence = 2*8 + 15 = 31 < 400
    assert fences(list(range(1, 10)) + [200]) == (10, 3, 8, 0, 1)
    # uniform fixture quantity has no Tukey outliers — the pinned zero
    for r in rows:
        assert r["n_low_outliers"] == 0 and r["n_high_outliers"] == 0


# ---------------------------------------------------------------------------
# Sign-bit recall


def test_signbit_recall_replica(spark, duck):
    from xova_spark.queries.similarity import ann_signbit_recall_at5

    rows = ann_signbit_recall_at5(spark, SF).collect()
    assert len(rows) == 10
    embs = dict(
        duck.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    )

    def word(e, off):
        return sum(1 << i for i in range(32) if e[off + i] > 0)

    import math

    packed = {v: (word(e, 0), word(e, 32)) for v, e in embs.items()}

    def cos_top5(q):
        qe = embs[q]
        qn = math.sqrt(sum(x * x for x in qe))
        sc = []
        for c, ce in embs.items():
            if c == q:
                continue
            dot = sum(float(a) * float(b) for a, b in zip(qe, ce))
            sc.append((-dot / (qn * math.sqrt(sum(x * x for x in ce))), c))
        return {c for _, c in sorted(sc)[:5]}

    def ham_top5(q):
        qw = packed[q]
        sc = sorted(
            (
                bin(qw[0] ^ w[0]).count("1") + bin(qw[1] ^ w[1]).count("1"),
                c,
            )
            for c, w in packed.items()
            if c != q
        )
        return {c for _, c in sc[:5]}

    for r in rows:
        hits = len(cos_top5(r["qid"]) & ham_top5(r["qid"]))
        assert r["n_hits"] == hits
        assert 0 <= r["n_hits"] <= 5


# ---------------------------------------------------------------------------
# Sampled closeness


def test_closeness_replica_and_laws(spark, duck):
    from xova_spark.queries.graphq import (
        BFS_ROUNDS,
        CLOSENESS_SOURCES,
        MIN_SUPPORT,
        graph_closeness_sampled,
    )

    rows = graph_closeness_sampled(spark, SF).collect()
    assert len(rows) == CLOSENESS_SOURCES
    edges = duck.execute(
        f"""
        WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM pp a JOIN pp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
        """
    ).fetchall()
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = sorted(adj)[:CLOSENESS_SOURCES]
    assert [r["src"] for r in rows] == seeds
    from collections import deque

    for r in rows:
        dist = {r["src"]: 0}
        dq = deque([r["src"]])
        while dq:
            u = dq.popleft()
            if dist[u] >= BFS_ROUNDS:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        assert r["n_reached"] == len(dist)
        assert r["sum_hops"] == sum(dist.values())
        assert r["harmonic_micro"] == sum(
            1_000_000 // h for h in dist.values() if h > 0
        )
        # harmonic law: each reached node contributes at most 1e6
        assert r["harmonic_micro"] <= (r["n_reached"] - 1) * 1_000_000


# ---------------------------------------------------------------------------
# Kendall tau-b


def _taub(pairs_xy: list) -> tuple:
    nc = nd = n1 = n2 = 0
    n = len(pairs_xy)
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = pairs_xy[i], pairs_xy[j]
            s = (x1 - x2) * (y1 - y2)
            nc += 1 if s > 0 else 0
            nd += 1 if s < 0 else 0
            n1 += 1 if x1 == x2 else 0
            n2 += 1 if y1 == y2 else 0
    n0 = n * (n - 1) // 2
    if n0 - n1 <= 0 or n0 - n2 <= 0:
        t2 = 0
    else:
        t2 = (1 if nc >= nd else -1) * (
            (nc - nd) * (nc - nd) * 1_000_000 // ((n0 - n1) * (n0 - n2))
        )
    return nc, nd, n0, n1, n2, t2


def test_kendall_tau_b_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_kendall_tau_b

    (row,) = ev_kendall_tau_b(spark, SF).collect()
    daily = duck.execute(
        """
        SELECT epoch_us(ts) // 86400000000 AS d, count(*),
               sum(CAST(round(value * 1000) AS BIGINT))
        FROM events GROUP BY 1 ORDER BY d
        """
    ).fetchall()
    nc, nd, n0, n1, n2, t2 = _taub([(x, y) for _, x, y in daily])
    assert (
        row["nc"],
        row["nd"],
        row["n0"],
        row["n1"],
        row["n2"],
        row["tau_b2_signed_micro"],
    ) == (nc, nd, n0, n1, n2, t2)
    # hand: perfect concordance -> +1e6; perfect discordance -> -1e6
    assert _taub([(1, 10), (2, 20), (3, 30)])[5] == 1_000_000
    assert _taub([(1, 30), (2, 20), (3, 10)])[5] == -1_000_000
    # all-tied x -> denominator guard
    assert _taub([(5, 1), (5, 2), (5, 3)])[5] == 0


# ---------------------------------------------------------------------------
# Capture-recapture


def test_capture_recapture_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_capture_recapture

    (row,) = ev_capture_recapture(spark, SF).collect()
    (mid,) = duck.execute(
        "SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 FROM events"
    ).fetchone()
    users = duck.execute(
        f"""
        SELECT max(CASE WHEN epoch_us(ts) < {mid} THEN 1 ELSE 0 END),
               max(CASE WHEN epoch_us(ts) >= {mid} THEN 1 ELSE 0 END)
        FROM events GROUP BY user_id
        """
    ).fetchall()
    n1 = sum(h1 for h1, _ in users)
    n2 = sum(h2 for _, h2 in users)
    m = sum(h1 * h2 for h1, h2 in users)
    assert (row["n1"], row["n2"], row["m_both"]) == (n1, n2, m)
    assert row["n_observed"] == len(users)
    nhat = (n1 + 1) * (n2 + 1) * 1_000_000 // (m + 1) - 1_000_000
    assert row["chapman_nhat_micro"] == nhat
    # estimator law: N-hat >= the observed population (n1 + n2 - m)
    assert nhat >= (n1 + n2 - m - 1) * 1_000_000
    # hand: n1=5, n2=4, m=2 -> (6*5)/3 - 1 = 9
    assert (5 + 1) * (4 + 1) * 1_000_000 // (2 + 1) - 1_000_000 == 9_000_000


# ---------------------------------------------------------------------------
# Odds ratio


def test_odds_ratio_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_odds_ratio

    (row,) = ev_odds_ratio(spark, SF).collect()
    cells = duck.execute(
        """
        WITH u AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS e,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS o
          FROM events GROUP BY user_id
        )
        SELECT sum(e * o), sum(e * (1 - o)), sum((1 - e) * o),
               sum((1 - e) * (1 - o))
        FROM u
        """
    ).fetchone()
    a, b, c, d = cells
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    if b * c:
        assert row["odds_ratio_micro"] == a * d * 1_000_000 // (b * c)
    if a and b and c and d:
        woolf = sum(1_000_000_000 // x for x in (a, b, c, d))
        assert row["woolf_se2_nano"] == woolf
    # hand: balanced 2x2 -> OR = RR = exactly 1
    # (a=b=c=d=10: 10*10*1e6//(10*10) = 1e6)
    assert 10 * 10 * 1_000_000 // (10 * 10) == 1_000_000


# ---------------------------------------------------------------------------
# Rich club


def test_rich_club_replica_and_laws(spark, duck):
    from xova_spark.queries.graphq import (
        MIN_SUPPORT,
        RICH_CLUB_KS,
        graph_rich_club,
    )

    rows = graph_rich_club(spark, SF).collect()
    edges = duck.execute(
        f"""
        WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM pp a JOIN pp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
        """
    ).fetchall()
    deg: dict = {}
    for x, y in edges:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    got = {r["k"]: r for r in rows}
    for k in RICH_CLUB_KS:
        n_k = sum(1 for v in deg.values() if v > k)
        e_k = sum(1 for x, y in edges if deg[x] > k and deg[y] > k)
        if n_k == 0:
            assert k not in got  # inner-agg semantics: no rich row
            continue
        r = got[k]
        assert (r["n_k"], r["e_k"]) == (n_k, e_k)
        phi = (
            0
            if n_k < 2
            else 2 * e_k * 1_000_000 // (n_k * (n_k - 1))
        )
        assert r["phi_micro"] == phi
        # density law: phi <= 1 and E_k <= C(N_k, 2)
        assert r["phi_micro"] <= 1_000_000
        assert e_k <= n_k * (n_k - 1) // 2


# ---------------------------------------------------------------------------
# Simpson diversity


def test_simpson_replica_and_laws(spark, duck):
    from xova_spark.queries.textops import t_simpson_diversity

    rows = t_simpson_diversity(spark, SF).collect()
    wf = duck.execute(
        """
        WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
                   FROM documents)
        SELECT source, count(*) FROM (
          SELECT source, word, count(*) AS c FROM w WHERE word != ''
          GROUP BY 1, 2) q
        GROUP BY source
        """
    ).fetchall()
    stats = duck.execute(
        """
        WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
                   FROM documents),
        wf AS (SELECT source, word, count(*) AS c FROM w WHERE word != ''
               GROUP BY 1, 2)
        SELECT source, sum(c), sum(c * (c - 1)) FROM wf GROUP BY source
        """
    ).fetchall()
    dv = dict(wf)
    st = {s: (t, ss) for s, t, ss in stats}
    for r in rows:
        t, ss = st[r["source"]]
        assert r["d_vocab"] == dv[r["source"]]
        assert r["t_tokens"] == t
        lam = ss * 1_000_000 // (t * (t - 1))
        assert r["simpson_lambda_micro"] == lam
        # complement law: the two readouts partition the micro lattice
        assert r["simpson_lambda_micro"] + r["gini_simpson_micro"] == 1_000_000
    # hand: single-type source -> lambda exactly 1 (T*(T-1)/(T*(T-1)))
    assert 6 * 1_000_000 // 6 == 1_000_000  # c=3: ss=6, T=3


# ---------------------------------------------------------------------------
# Flesch


def test_flesch_replica_and_fixture_contract(spark, duck):
    from xova_spark.queries.textops import t_flesch_readability

    rows = t_flesch_readability(spark, SF).collect()
    raw = duck.execute(
        """
        SELECT source,
               sum(len(list_filter(string_split(text, ' '),
                                   x -> x != ''))),
               sum(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)),
               sum(len(regexp_extract_all(lower(text), '[aeiou]+'))),
               count(*)
        FROM documents GROUP BY source
        """
    ).fetchall()
    per = {s: (w, sen, y, nd) for s, w, sen, y, nd in raw}
    for r in rows:
        w, sen, y, nd = per[r["source"]]
        assert (r["words"], r["sentences"], r["syllables"]) == (w, sen, y)
        assert r["flesch_milli"] == 206835 - 1015 * w // sen - 84600 * y // w
        # fixture contract the docstring pins: no terminal punctuation
        # -> every document reads as exactly one sentence
        assert sen == nd


# ---------------------------------------------------------------------------
# Log-rank


def test_logrank_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import (
        _KM_QUIET_HOURS,
        _US_PER_HOUR,
        ev_logrank_test,
    )

    (row,) = ev_logrank_test(spark, SF).collect()
    users = duck.execute(
        f"""
        SELECT min(epoch_us(ts) // {_US_PER_HOUR}),
               max(epoch_us(ts) // {_US_PER_HOUR}),
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        FROM events GROUP BY user_id
        """
    ).fetchall()
    horizon = max(l for _, l, _ in users)
    recs = [
        (l - f, g, 1 if l <= horizon - _KM_QUIET_HOURS else 0)
        for f, l, g in users
    ]
    # replicate the duration-grain suffix sums + two-stage lattice
    from collections import defaultdict

    durs = defaultdict(lambda: [0, 0, 0, 0])  # d_all, d1, c_all, c1
    for dur, g, ch in recs:
        e = durs[dur]
        e[0] += ch
        e[1] += ch * g
        e[2] += 1
        e[3] += g
    o1 = e1 = v = nt = 0
    n_all = n1 = 0
    for dur in sorted(durs, reverse=True):
        d_all, d1, c_all, c1 = durs[dur]
        n_all += c_all
        n1 += c1
        if d_all == 0:
            continue
        nt += 1
        o1 += d1
        e1 += d_all * n1 * 1_000_000 // n_all
        if n_all > 1:
            p = n1 * (n_all - n1) * 1_000_000 // (n_all * n_all)
            v += d_all * (n_all - d_all) * p // (n_all - 1)
    assert (
        row["n_event_times"],
        row["o1"],
        row["e1_micro"],
        row["v_micro"],
    ) == (nt, o1, e1, v)
    diff = o1 * 1_000_000 - e1
    chi2 = 0 if v == 0 else diff * diff // (v * 1000)
    assert row["logrank_chi2_milli"] == chi2
    # hand identity: one event time, groups at risk 2/2, 1 death in
    # group 1: E = 1*2/4 = 0.5, p = 2*2/16 = 0.25, V = 1*3*0.25/3
    # = 0.25, chi2 = 0.25/0.25 = 1.0 -> 1000 milli
    p = 2 * 2 * 1_000_000 // 16
    vv = 1 * 3 * p // 3
    d = 1 * 1_000_000 - 1 * 2 * 1_000_000 // 4
    assert d * d // (vv * 1000) == 1000


# ---------------------------------------------------------------------------
# MATTR


def test_mattr_replica_and_laws(spark, duck):
    from xova_spark.queries.textops import _MATTR_CHUNK, t_mattr_chunked

    rows = t_mattr_chunked(spark, SF).collect()
    docs = duck.execute(
        "SELECT source, text FROM documents"
    ).fetchall()
    per: dict = {}
    for src, txt in docs:
        toks = [w for w in txt.split(" ") if w]
        for i in range(0, len(toks) - _MATTR_CHUNK + 1, _MATTR_CHUNK):
            chunk = toks[i : i + _MATTR_CHUNK]
            if len(chunk) == _MATTR_CHUNK:
                e = per.setdefault(src, [0, 0])
                e[0] += 1
                e[1] += len(set(chunk))
    for r in rows:
        n_chunks, sum_types = per[r["source"]]
        assert (r["n_chunks"], r["sum_types"]) == (n_chunks, sum_types)
        assert r["mattr_micro"] == sum_types * 1_000_000 // (
            n_chunks * _MATTR_CHUNK
        )
        # TTR law: 1/chunk <= mattr <= 1
        assert 1_000_000 // _MATTR_CHUNK <= r["mattr_micro"] <= 1_000_000


# ---------------------------------------------------------------------------
# Yule's K


def test_yule_k_replica_and_hand(spark, duck):
    from xova_spark.queries.textops import t_yule_k

    rows = t_yule_k(spark, SF).collect()
    stats = duck.execute(
        """
        WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
                   FROM documents),
        wf AS (SELECT source, word, count(*) AS c FROM w WHERE word != ''
               GROUP BY 1, 2)
        SELECT source, sum(c), sum(c * c) FROM wf GROUP BY source
        """
    ).fetchall()
    st = {s: (t, s2) for s, t, s2 in stats}
    for r in rows:
        t, s2 = st[r["source"]]
        assert r["t_tokens"] == t
        # s2 is a 128-bit INTERNAL since the round-10 headroom fix —
        # only the bounded K quotient leaves the plan
        assert r["yule_k_milli"] == 10_000 * (s2 - t) * 1000 // (t * t)
    # hand: every type once (s2 = t) -> K = 0; one type t times ->
    # K = 1e4 (t^2 - t)/t^2 -> approaches 1e4: t=100 -> 9900.000
    assert 10_000 * (100 * 100 - 100) * 1000 // (100 * 100) == 9_900_000


# ---------------------------------------------------------------------------
# Corpus health gate


def test_corpus_health_gate_composes_components(spark):
    from xova_spark.queries.textops import (
        pipeline_corpus_health_gate,
        t_burstiness_fano,
        t_chao1_vocab_richness,
        t_flesch_readability,
        t_good_turing_counts,
        t_mattr_chunked,
        t_simpson_diversity,
    )

    (row,) = pipeline_corpus_health_gate(spark, SF).collect()
    chao = t_chao1_vocab_richness(spark, SF).collect()
    assert row["min_coverage_permille"] == min(
        r["d_vocab"] * 1_000_000_000 // r["chao1_micro"] for r in chao
    )
    assert row["max_lambda_micro"] == max(
        r["simpson_lambda_micro"]
        for r in t_simpson_diversity(spark, SF).collect()
    )
    assert row["max_fano_micro"] == max(
        r["fano_micro"] for r in t_burstiness_fano(spark, SF).collect()
    )
    gt1 = [
        r["r_star_micro"]
        for r in t_good_turing_counts(spark, SF).collect()
        if r["r"] == 1
    ]
    assert row["gt1_r_star_micro"] == (gt1[0] if gt1 else 0)
    assert row["min_flesch_milli"] == min(
        r["flesch_milli"] for r in t_flesch_readability(spark, SF).collect()
    )
    assert row["min_mattr_micro"] == min(
        r["mattr_micro"] for r in t_mattr_chunked(spark, SF).collect()
    )
    # the fixture corpus is healthy by construction (saturated vocab,
    # no template floods) — the PASS direction is pinned; the law tests
    # above each pin a FAIL direction for their component formula
    assert bool(row["healthy"]) is True


def test_trigram_projection_survives_short_docs(spark):
    """slice() throws on negative lengths, so the trigram projection
    must clamp: a 1- or 2-token document yields an empty gram list,
    matching the oracle's `i <= len(ws) - 2` series bound (which simply
    produces no rows). Driven on a constructed frame because the
    fixture happens to contain no short documents."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b",), ("x",), ("p q r s",)], "text string")
    ws = F.split("text", " ")
    n = F.greatest(F.size("ws") - 2, F.lit(0))
    grams = F.zip_with(
        F.zip_with(
            F.slice("ws", 1, n),
            F.slice("ws", 2, n),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
        F.slice("ws", 3, n),
        lambda xy, z: F.concat_ws(" ", xy, z),
    )
    out = [
        r["g"]
        for r in df.select(ws.alias("ws"))
        .select(F.explode(grams).alias("g"))
        .collect()
    ]
    assert out == ["p q r", "q r s"]
