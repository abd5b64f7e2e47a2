"""Round-10 batch-8 law tests: Page trend, Jonckheere-Terpstra, TOST,
code ratio, hapax/Guiraud, ARI, link-prediction panel, Katz
centrality, categorical drift.

Same discipline as batches 4-7: fixture replica in plain Python
big-int arithmetic plus hand-computed tiny-population identities.
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

    return get_spark("round10d-tests")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


# ---------------------------------------------------------------------------
# Page's trend test


def _page(blocks: dict) -> tuple[int, int, int]:
    """blocks: {blk: {trt: v}} complete k=3. Returns (b, l2, z2m)."""
    l2 = 0
    for cells in blocks.items():
        pass
    l2 = 0
    for cells in blocks.values():
        vals = sorted(cells.values())
        for trt, v in cells.items():
            rk = 1 + sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            j = {"A": 1, "N": 2, "R": 3}[trt]
            l2 += j * (2 * rk + ties - 1)
    b = len(blocks)
    d = l2 - 24 * b
    if b == 0:
        z = 0
    else:
        q = (abs(d) * abs(d) * 36000) // (288 * b)
        z = q if d >= 0 else -q
    return b, l2, z


def test_page_trend_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_page_trend_test

    (row,) = ev_page_trend_test(spark, SF).collect()
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
    b, l2, z = _page(blocks)
    assert row["n_blocks"] == b
    assert row["l2_sum"] == l2
    assert row["z2_signed_milli"] == z
    # hand law: perfect A<N<R in every block -> L = 14b (L2 = 28b),
    # d = 4b, z^2 = 2b exactly (3 blocks -> 6000 milli)
    hb, hl2, hz = _page(
        {1: {"A": 1, "N": 2, "R": 3}, 2: {"A": 4, "N": 5, "R": 6},
         3: {"A": 0, "N": 5, "R": 9}}
    )
    assert (hb, hl2, hz) == (3, 84, 6000)
    # reversed ordering -> L minimal, z negative with the same square
    rb, rl2, rz = _page(
        {1: {"A": 3, "N": 2, "R": 1}, 2: {"A": 6, "N": 5, "R": 4},
         3: {"A": 9, "N": 5, "R": 0}}
    )
    assert (rb, rl2, rz) == (3, 60, -6000)
    # all-tied blocks -> every rank2 = 4, L2 = 24b, d = 0
    tb, tl2, tz = _page({1: {"A": 7, "N": 7, "R": 7}})
    assert (tl2, tz) == (24, 0)


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra


_GI = {"click": 1, "error": 2, "purchase": 3, "signup": 4, "view": 5}


def _jt(groups: dict) -> tuple[int, int]:
    """groups: {name: [v...]}. Returns (jt_ratio_micro, z2m) on the
    declared lattice (doubled pair counts, no-tie variance, 1-row
    fixed-shape double z^2)."""
    names = sorted(groups, key=lambda g: _GI.get(g, 99))
    j2 = 0
    for i, g in enumerate(names):
        for h in names[i + 1 :]:
            for x in groups[g]:
                for y in groups[h]:
                    if x < y:
                        j2 += 2
                    elif x == y:
                        j2 += 1
    n = sum(len(v) for v in groups.values())
    sn2 = sum(len(v) ** 2 for v in groups.values())
    cross2 = n * n - sn2
    e2 = cross2 // 2
    d2 = j2 - e2
    sn23 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in groups.values())
    v72 = n * n * (2 * n + 3) - sn23
    ratio = 0 if cross2 == 0 else (j2 * 10**6) // cross2
    if v72 <= 0:
        z = 0
    else:
        q = round(18000.0 * float(abs(d2)) / float(v72) * float(abs(d2)))
        z = q if d2 >= 0 else -q
    return ratio, z


def test_jt_replica_and_hand(spark, duck):
    from xova_spark.queries.relext import ev_jonckheere_terpstra

    (row,) = ev_jonckheere_terpstra(spark, SF).collect()
    vals = duck.execute(
        "SELECT event_type, CAST(round(value * 1000) AS BIGINT)"
        " FROM events"
    ).fetchall()
    groups: dict = {}
    for t, vm in vals:
        groups.setdefault(t, []).append(vm)
    # the O(n^2) replica is too slow on the full fixture — replicate
    # via the same bin algebra instead, then hand-check the algebra
    # against the brute pair count on a small slice
    from collections import Counter

    names = sorted(groups, key=lambda g: _GI[g])
    j2 = 0
    for i, g in enumerate(names):
        fg = Counter(groups[g])
        gl = sorted(fg)
        cum = {}
        run = 0
        for v in gl:
            cum[v] = run
            run += fg[v]
        for h in names[i + 1 :]:
            fh = Counter(groups[h])
            for v, ch in fh.items():
                below = 0
                # binary search the cumulative below v
                import bisect

                k = bisect.bisect_left(gl, v)
                below = sum(fg[x] for x in gl[:k])
                j2 += ch * (2 * below + fg.get(v, 0))
    n = sum(len(v) for v in groups.values())
    sn2 = sum(len(v) ** 2 for v in groups.values())
    cross2 = n * n - sn2
    d2 = j2 - cross2 // 2
    sn23 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in groups.values())
    v72 = n * n * (2 * n + 3) - sn23
    assert row["jt_ratio_micro"] == (j2 * 10**6) // cross2
    q = round(18000.0 * float(abs(d2)) / float(v72) * float(abs(d2)))
    assert row["z2_signed_milli"] == (q if d2 >= 0 else -q)
    # brute-force pair-count law on tiny populations: perfect
    # ordering -> ratio 1e6; reversed -> 0; identical -> 500000
    assert _jt({"click": [1, 2], "view": [3, 4]})[0] == 1_000_000
    assert _jt({"click": [3, 4], "view": [1, 2]})[0] == 0
    assert _jt({"click": [1, 1], "view": [1, 1]})[0] == 500_000
    # half-credit ties keep J2 integral: one tie pair -> J2 odd-safe
    r, _ = _jt({"click": [1], "view": [1, 2]})
    assert r == (3 * 10**6) // 4  # J2 = 2*1 + 1 = 3 over cross2 = 4


# ---------------------------------------------------------------------------
# TOST equivalence


def test_tost_replica_and_laws(spark, duck):
    from xova_spark.queries.relext import ev_tost_equivalence

    (row,) = ev_tost_equivalence(spark, SF).collect()
    vals = duck.execute(
        "SELECT user_id, CAST(round(value * 1000) AS BIGINT) FROM events"
    ).fetchall()
    g: dict = {0: [], 1: []}
    for u, vm in vals:
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        g[arm].append(vm)
    stats = {}
    for arm, xs in g.items():
        ng, s, q2 = len(xs), sum(xs), sum(x * x for x in xs)
        mb = round(s * 1000 / ng)
        v2 = max(0, q2 * 10**6 - ng * mb * mb) // (ng - 1)
        stats[arm] = (ng, mb, v2)
    d = stats[0][1] - stats[1][1]
    se2 = stats[0][2] // stats[0][0] + stats[1][2] // stats[1][0]
    assert row["delta_micro"] == d

    def zsq(x):
        q = (abs(x) * abs(x) * 1000) // se2
        return q if x >= 0 else -q

    assert row["z_lo_sq_signed_milli"] == zsq(d + 50000)
    assert row["z_hi_sq_signed_milli"] == zsq(50000 - d)
    want_eq = (
        d + 50000 > 0
        and 50000 - d > 0
        and zsq(d + 50000) > 2706
        and zsq(50000 - d) > 2706
    )
    assert row["equivalent"] == want_eq
    # sign-structure law: |d| > eps forces the far-side z NEGATIVE, so
    # equivalence can never be certified however small the variance —
    # on this fixture the user-clustered metric puts |d| ~ 1.8 units
    # >> eps = 0.05, so TOST must refuse (z_hi < 0, equivalent False)
    if abs(d) > 50000:
        far = row["z_hi_sq_signed_milli"] if d > 0 else row[
            "z_lo_sq_signed_milli"
        ]
        assert far < 0
        assert not row["equivalent"]
    # and a d = 0 population is certified exactly when eps^2*1000/se2
    # clears 2706 (hand lattice values: 2.5e12, 2.5e6, 2500)
    for se2, ok in ((1, True), (10**6, True), (10**9, False)):
        assert ((50000 * 50000 * 1000) // se2 > 2706) is ok


# ---------------------------------------------------------------------------
# Corpus-composition trio


def test_code_ratio_replica(spark, duck):
    from xova_spark.queries.textops import t_code_ratio

    rows = {r["source"]: r for r in t_code_ratio(spark, SF).collect()}
    docs = duck.execute(
        "SELECT source, text FROM documents WHERE length(text) > 0"
    ).fetchall()
    import re
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, cc, len, codey
    for src, text in docs:
        cc = len(text) - len(re.sub(r"[{}();=<>]", "", text))
        a = agg[src]
        a[0] += 1
        a[1] += cc
        a[2] += len(text)
        a[3] += 1 if cc * 1000 // len(text) >= 20 else 0
    for src, (n, cc, ln, codey) in agg.items():
        r = rows[src]
        assert r["n_docs"] == n
        assert r["code_chars"] == cc
        assert r["density_permille"] == cc * 1000 // ln
        assert r["n_codey"] == codey
        assert r["codey_permille"] == codey * 1000 // n


def test_hapax_guiraud_replica_and_laws(spark, duck):
    from xova_spark.queries.textops import t_hapax_guiraud

    rows = {r["source"]: r for r in t_hapax_guiraud(spark, SF).collect()}
    wf = duck.execute(
        """
        SELECT source, word, count(*) FROM (
          SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents
        ) WHERE word != '' GROUP BY 1, 2
        """
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0])  # V, f1, N
    for src, _, c in wf:
        a = per[src]
        a[0] += 1
        a[1] += 1 if c == 1 else 0
        a[2] += c
    for src, (v, f1, n) in per.items():
        r = rows[src]
        assert (r["d_vocab"], r["f1"], r["n_tokens"]) == (v, f1, n)
        assert r["hapax_permille"] == f1 * 1000 // v
        assert r["guiraud2_micro"] == v * v * 10**6 // n
        # laws: hapax share <= 1; Guiraud R^2 <= V (since V <= N)
        assert r["hapax_permille"] <= 1000
        assert r["guiraud2_micro"] <= v * 10**6


def test_ari_replica_and_hand(spark, duck):
    from xova_spark.queries.textops import t_ari_readability

    rows = {r["source"]: r for r in t_ari_readability(spark, SF).collect()}
    docs = duck.execute(
        "SELECT source, text FROM documents WHERE length(text) > 0"
    ).fetchall()
    import re
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_ari, hard
    for src, text in docs:
        c = len(text)
        w = len([t for t in text.split(" ") if t != ""])
        if w == 0:
            continue
        s = max(1, len(re.findall(r"[.!?]", text)))
        ari = 4710 * c // w + 500 * w // s - 21430
        a = agg[src]
        a[0] += 1
        a[1] += ari
        a[2] += 1 if ari > 14000 else 0
    for src, (n, sa, hard) in agg.items():
        r = rows[src]
        assert r["n_docs"] == n
        want = sa // n if sa >= 0 else -((-sa) // n)
        assert r["mean_ari_milli"] == want
        assert r["hard_permille"] == hard * 1000 // n
    # hand identity: "Aa bb. Cc dd." -> C=13, W=4 (split on single
    # spaces keeps punctuation attached), S=2:
    # 4710*13//4 + 500*4//2 - 21430 = 15307 + 1000 - 21430 = -5123
    text = "Aa bb. Cc dd."
    c, w, s = len(text), 4, 2
    assert 4710 * c // w + 500 * w // s - 21430 == -5123


# ---------------------------------------------------------------------------
# Link prediction panel


def test_link_prediction_replica_and_laws(spark, duck):
    from xova_spark.queries.graphq import graph_link_prediction_scores

    rows = graph_link_prediction_scores(spark, SF).collect()
    assert len(rows) == 20
    # replicate the top row's scores from the raw edge list
    edges = duck.execute(
        """
        WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM pp a JOIN pp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    from collections import defaultdict

    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    top = rows[0]
    sa, sb = top["sa"], top["sb"]
    common = {
        n
        for n in nbrs[sa] & nbrs[sb]
        if 2 <= len(nbrs[n]) <= 8
    }
    assert top["common_capped"] == len(common)
    assert top["ra_micro"] == sum(10**6 // len(nbrs[n]) for n in common)
    assert top["pa_score"] == len(nbrs[sa]) * len(nbrs[sb])
    # law: RA <= CN * 5e5 (every capped middle has degree >= 2)
    for r in rows:
        assert r["ra_micro"] <= r["common_capped"] * 500_000
        assert r["ra_micro"] >= r["common_capped"] * (10**6 // 8)
    # deterministic ranking
    scores = [(r["ra_micro"], -r["sa"], -r["sb"]) for r in rows]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# Katz centrality


def test_katz_replica_and_star_law(spark, duck):
    from xova_spark.queries.graphq import graph_katz_centrality

    rows = graph_katz_centrality(spark, SF).collect()
    assert len(rows) == 20
    edges = duck.execute(
        """
        WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey
        FROM pp a JOIN pp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    from collections import defaultdict

    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    x = {n: 10**6 + len(v) * 10**5 for n, v in nbrs.items()}
    for _ in range(2):
        x = {
            n: 10**6 + sum(x[m] for m in v) // 10
            for n, v in nbrs.items()
        }
    want = sorted(((xv, n) for n, xv in x.items()), key=lambda t: (-t[0], t[1]))[:20]
    got = [(r["katz_micro"], r["node"]) for r in rows]
    assert got == want
    # star law: center of a k-star after 3 rounds is
    # 1 + k/10*(1 + 1/10 + k/100) on the exact lattice
    star = {0: [1, 2, 3], 1: [0], 2: [0], 3: [0]}
    sx = {n: 10**6 + len(v) * 10**5 for n, v in star.items()}
    for _ in range(2):
        sx = {
            n: 10**6 + sum(sx[m] for m in v) // 10
            for n, v in star.items()
        }
    # leaves saw the center at x1 = 1.3e6 -> x2_leaf = 1.13e6;
    # center sums 3 leaves at 1.1e6 -> x2 = 1.33e6; x3_center sums
    # 3 leaves at 1.13e6 -> 1 + 0.339 = 1.339e6
    assert sx[0] == 1_339_000
    assert sx[1] == 1_133_000


# ---------------------------------------------------------------------------
# Categorical drift


def test_categorical_drift_replica_and_laws(spark, duck):
    from xova_spark.queries.dataqual import dq_categorical_drift

    (row,) = dq_categorical_drift(spark, SF).collect()
    vals = duck.execute(
        "SELECT event_type, epoch_us(ts) // 3600000000 FROM events"
    ).fetchall()
    hrs = [h for _, h in vals]
    boundary = (min(hrs) + max(hrs)) // 2
    from collections import defaultdict

    ce = defaultdict(int)
    cl = defaultdict(int)
    for t, h in vals:
        (ce if h <= boundary else cl)[t] += 1
    types = sorted(set(ce) | set(cl))
    ne, nl = sum(ce.values()), sum(cl.values())
    assert row["boundary_hr"] == boundary
    assert (row["n_early"], row["n_late"]) == (ne, nl)
    assert row["n_types"] == len(types)
    chi2 = 0
    tvd_num = 0
    n = ne + nl
    for t in types:
        o_e, o_l = ce[t], cl[t]
        rt = o_e + o_l
        de = o_e - rt * ne / n
        chi2 += round(
            de * de * (1e6 * n / (rt * ne) + 1e6 * n / (rt * nl))
        )
        tvd_num += abs(o_e * nl - o_l * ne)
    assert row["chi2_micro"] == chi2
    assert row["tvd_micro"] == tvd_num * 10**6 // (2 * ne * nl)
    # laws: TVD in [0, 1e6]; identical halves -> both zero
    assert 0 <= row["tvd_micro"] <= 10**6
    same_num = sum(
        abs(c * 10 - c * 10) for c in (ce[t] for t in types)
    )
    assert same_num == 0
