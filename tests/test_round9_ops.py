"""Round-9 law tests.

Covers (a) the ANALYTIC_BOUNDS escape-hatch contract — every
lattice-headroom override must name a live pytest node (VERDICT r8
item 7) — and (b) the band-tuning pair-count law that override cites.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def spark():
    from xova_spark.session import get_spark

    return get_spark("round9-tests")


def test_band_tuning_candidates_are_pair_counts(spark):
    """dedup_band_tuning_report's n_candidates is a ROW-CARDINALITY
    counter over materialized candidate pairs: for every banding
    config it is bounded by C(n_docs, 2) — the all-pairs ceiling — and
    the verified count never exceeds the candidate count. This is the
    closed-form bound the lattice_headroom ANALYTIC_BOUNDS override
    cites: a BIGINT pair COUNT cannot overflow before the 9.2e18-row
    pair materialization itself is infeasible."""
    from xova_spark.queries.dedup import dedup_band_tuning_report

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    all_pairs = n_docs * (n_docs - 1) // 2
    rows = dedup_band_tuning_report(spark, SF).collect()
    assert rows, "band tuning report returned no configs"
    for r in rows:
        assert 0 <= r["n_candidates"] <= all_pairs, r
        assert 0 <= r["n_verified"] <= r["n_candidates"], r


def test_analytic_bounds_overrides_name_live_law_tests():
    """CONTRACT (VERDICT r8 item 7): every ANALYTIC_BOUNDS override in
    tools/lattice_headroom.py must be a (alpha, justification,
    law_test) triple whose law_test names an EXISTING pytest node —
    path exists, function defined in that file. The escape hatch
    accreted prose-only overrides in round 8; an override whose cited
    test was renamed, deleted, or never written is now a red test, so
    the hatch cannot silently grow."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "lattice_headroom", os.path.join(REPO, "tools", "lattice_headroom.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bounds = mod.ANALYTIC_BOUNDS
    assert bounds, "ANALYTIC_BOUNDS unexpectedly empty"
    live_entries = set()
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    live_entries = set(entry.queries())
    for (name, col), triple in bounds.items():
        assert len(triple) == 3, (
            f"override ({name},{col}) must be (alpha, why, law_test)"
        )
        alpha, why, law_test = triple
        assert isinstance(alpha, float) and alpha > 0, (name, col, alpha)
        assert len(why) > 40, f"({name},{col}) justification too thin"
        # an override may target a registry entry OR an internal-
        # accumulator probe (r10: the calendar-bounded Wilcoxon
        # dividend probe needed one) — but never a dead name
        assert name in live_entries or name in mod.PROBES, (
            f"override ({name},{col}) targets a dead registry entry"
            " / probe"
        )
        m = re.fullmatch(r"(tests/[\w/]+\.py)::(test_\w+)", law_test)
        assert m, f"({name},{col}) law_test not a pytest node: {law_test!r}"
        path, func = m.group(1), m.group(2)
        fpath = os.path.join(REPO, path)
        assert os.path.isfile(fpath), f"({name},{col}) cites missing {path}"
        src = open(fpath).read()
        assert f"def {func}(" in src, (
            f"({name},{col}) cites {func} absent from {path}"
        )


def test_hard_negative_ivf_recall_vs_brute_twin(spark):
    """ann_hard_negative_mining_ivf is the PRODUCTION twin of the
    brute-force mining oracle (VERDICT r8 item 5) — same mining
    semantics over the cell-probed candidate set. The ann_recall_at5
    discipline: measure top-5 overlap against the exact twin and pin
    the measured floor (0.76 at sf0.001 / 0.65 at sf0.01 with
    NPROBE=2 of K=8 cells — ~25% of the corpus probed; floor pinned
    at 0.5). Also: every mined negative must differ in label from its
    query, and ranks are dense 1..k per query."""
    from xova_spark.queries.similarity import (
        ann_hard_negative_mining,
        ann_hard_negative_mining_ivf,
    )

    brute = {
        (r["qid"], r["cid"])
        for r in ann_hard_negative_mining(spark, SF).collect()
    }
    rows = ann_hard_negative_mining_ivf(spark, SF).collect()
    ivf = {(r["qid"], r["cid"]) for r in rows}
    assert brute and ivf
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"cell-probe recall collapsed: {recall:.3f}"
    assert all(r["neg_label"] != r["qlabel"] for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hard_negative_ivf_plan_is_keyed_cell_join(spark):
    """The VERDICT r8 item-5 'done' criterion: the production twin's
    plan shows the keyed cell join and NO full-corpus broadcast. The
    only BroadcastNestedLoopJoin segments allowed are the K-centroid
    assignment pass (vec_id < 8 bounded); the mining join itself must
    be a keyed equi-join (hash or sort-merge), and the corpus-sized
    side must never sit under a BroadcastExchange without the centroid
    key bound."""
    import re

    from xova_spark.queries.similarity import ann_hard_negative_mining_ivf

    df = ann_hard_negative_mining_ivf(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[(cell|pcell)",
        plan,
    ), "mining join is not keyed on the cell id"
    # every BNLJ segment must carry the centroid key bound
    # (r11: ceiling restored 4 -> 2, matching
    # plancontract.BNLJ_SURVIVORS — the contract parser now counts each
    # distinct persisted stored plan once (split_stored_plans), so the
    # `_ivf_cells_shared` InMemoryTableScan re-exposures no longer
    # inflate the count; ADVICE r10 #3 additionally asks that every
    # counted segment itself carry the vec_id bound, not just the plan
    # somewhere.)
    from xova_spark.plancontract import bnlj_build_segments

    segs = bnlj_build_segments(plan)
    assert len(segs) <= 2, f"unexpected BNLJ growth: {len(segs)}"
    key_bound = re.compile(
        r"(PushedFilters: \[[^\]\n]*LessThan\(vec_id"
        r"|Filter [^\n]*vec_id#\d+L? < 8"
        r"|InMemoryTableScan [^\n]*vec_id)"
    )
    for i, seg in enumerate(segs):
        assert key_bound.search(seg), (
            f"BNLJ segment #{i} without the K-centroid key bound: {seg}"
        )


# ---------------------------------------------------------------------------
# Round-9 stats pack batch 2: python-replica law tests.
# ---------------------------------------------------------------------------


def _events_vm(spark, types=None):
    df = spark.read.parquet(f"{SF}/events.parquet")
    if types:
        df = df.filter(F.col("event_type").isin(*types))
    return [
        (r["event_type"], r["vm"])
        for r in df.select(
            "event_type", F.round(F.col("value") * 1000).cast("long").alias("vm")
        ).collect()
    ]


def _half_away(v: float) -> int:
    return int(v + 0.5) if v >= 0 else -int(-v + 0.5)


def test_anova_matches_python_replica(spark):
    """ev_anova_oneway vs a python replica of the exact integer form;
    eta2 in [0, 1e6]; F >= 0; and the SST identity holds on the
    lattice (SSB + SSW equals the total sum of squares computed the
    same way, by construction of the decomposition)."""
    from xova_spark.queries.relext import ev_anova_oneway

    row = ev_anova_oneway(spark, SF).collect()[0]
    per = {}
    for et, vm in _events_vm(spark):
        n, s, q = per.get(et, (0, 0, 0))
        per[et] = (n + 1, s + vm, q + vm * vm)
    n = sum(p[0] for p in per.values())
    st = sum(p[1] for p in per.values())
    k = len(per)
    gm = _half_away(st * 1000 / n)
    ssb = ssw = 0
    for ng, s, q2 in per.values():
        mb = _half_away(s * 1000 / ng)
        ssb += ng * (mb - gm) ** 2
        ssw += q2 * 1_000_000 - ng * mb * mb
    f = 0 if ssw <= 0 or n <= k else _half_away(ssb * (n - k) * 1000 / (ssw * (k - 1)))
    eta2 = 0 if ssb + ssw <= 0 else ssb * 1_000_000 // (ssb + ssw)
    assert (row["n_events"], row["k_groups"]) == (n, k)
    assert row["f_milli"] == f >= 0
    assert row["eta2_micro"] == eta2
    assert 0 <= row["eta2_micro"] <= 1_000_000


def test_welch_matches_python_replica(spark):
    """ev_welch_t2_effect vs a python replica; t2 and d2 nonnegative;
    means match the per-group micro lattice."""
    from xova_spark.queries.relext import ev_welch_t2_effect

    row = ev_welch_t2_effect(spark, SF).collect()[0]
    per = {}
    for et, vm in _events_vm(spark, ("click", "purchase")):
        n, s, q = per.get(et, (0, 0, 0))
        per[et] = (n + 1, s + vm, q + vm * vm)
    (n1, s1, q1), (n2, s2, q2) = per["click"], per["purchase"]
    m1 = _half_away(s1 * 1000 / n1)
    m2 = _half_away(s2 * 1000 / n2)
    v1 = max(0, q1 * 1_000_000 - n1 * m1 * m1) // (n1 - 1)
    v2 = max(0, q2 * 1_000_000 - n2 * m2 * m2) // (n2 - 1)
    sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) // (n1 + n2 - 2)
    d2 = 0 if sp2 <= 0 else (m1 - m2) ** 2 * 1_000_000 // sp2
    se2 = v1 // n1 + v2 // n2
    t2 = 0 if se2 <= 0 else (m1 - m2) ** 2 * 1000 // se2
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert (row["mean1_micro"], row["mean2_micro"]) == (m1, m2)
    assert row["delta_micro"] == m1 - m2
    assert row["d2_micro"] == d2 >= 0
    assert row["t2_milli"] == t2 >= 0


def test_holm_subset_of_bh_and_step_down_replica(spark):
    """Holm-rejected is a SUBSET of BH-rejected on the same residuals
    at the same alpha (FWER control is strictly more conservative than
    FDR control — the textbook dominance), and the rejected set equals
    the python step-down replica on the entry's own (p, rank) output."""
    from xova_spark.queries.relext import (
        ev_fdr_segment_residuals,
        ev_holm_bonferroni,
    )

    holm = ev_holm_bonferroni(spark, SF).collect()
    bh = {
        (r["event_type"], r["hr"]): r["rejected"]
        for r in ev_fdr_segment_residuals(spark, SF).collect()
    }
    m = len(holm)
    kf = m + 1
    for r in sorted(holm, key=lambda r: r["rk"]):
        if r["p_micro"] * (m - r["rk"] + 1) > 50000:
            kf = r["rk"]
            break
    for r in holm:
        assert r["rejected"] == (r["rk"] < kf), r
        if r["rejected"]:
            assert bh[(r["event_type"], r["hr"])], (
                "Holm rejected a cell BH kept — dominance violated"
            )


def test_mad_matches_python_replica(spark):
    """dq_anomaly_mad vs a python replica: exact lower medians, the
    44478-lattice fence, and the contamination-robustness property the
    entry exists for (outlier share is bounded by construction since
    the fence sits at 3 robust sigmas)."""
    from xova_spark.queries.relext import dq_anomaly_mad

    rows = {r["event_type"]: r for r in dq_anomaly_mad(spark, SF).collect()}
    per = {}
    for et, vm in _events_vm(spark):
        per.setdefault(et, []).append(vm)
    assert set(rows) == set(per)
    for et, vals in per.items():
        vals.sort()
        n = len(vals)
        med = vals[(n + 1) // 2 - 1]  # lower median
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(n + 1) // 2 - 1]
        n_out = sum(1 for v in vals if abs(v - med) * 10000 > 44478 * mad)
        r = rows[et]
        assert r["n_events"] == n
        assert r["med_vm"] == med, (et, r["med_vm"], med)
        assert r["mad_vm"] == mad, (et, r["mad_vm"], mad)
        assert r["n_outliers"] == n_out
        assert r["outlier_permille"] == n_out * 1000 // n


def test_doc_entropy_matches_python_replica(spark):
    """t_doc_entropy_filter vs a python replica of the micro-nat
    lattice; H >= 0 for every doc (Jensen, exact 0 at a
    single-distinct-token doc by lattice construction)."""
    import math
    from collections import Counter

    from xova_spark.queries.textops import (
        _ENTROPY_LOW_MICRO,
        t_doc_entropy_filter,
    )

    got = {r["source"]: r for r in t_doc_entropy_filter(spark, SF).collect()}
    per_source = {}
    for r in (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    ):
        c = Counter(r["text"].split(" "))
        n = sum(c.values())
        h = round(math.log(n) * 1e6) - sum(
            k * round(math.log(k) * 1e6) for k in c.values()
        ) // n
        assert h >= 0, (r["doc_id"], h)
        per_source.setdefault(r["source"], []).append(h)
    assert set(got) == set(per_source)
    for src, hs in per_source.items():
        r = got[src]
        assert r["n_docs"] == len(hs)
        assert r["mean_entropy_micro"] == sum(hs) // len(hs)
        assert r["min_entropy_micro"] == min(hs)
        n_low = sum(1 for h in hs if h < _ENTROPY_LOW_MICRO)
        assert r["n_low"] == n_low
        assert r["low_permille"] == n_low * 1000 // len(hs)


def test_vocab_oov_matches_python_replica(spark):
    """t_vocab_oov_rate vs a python replica: the vocab is the exact
    top-V under (count DESC, token ASC) on the train split, and OOV is
    pure membership on the eval split."""
    from collections import Counter

    from xova_spark.queries.textops import _VOCAB_TOP_V, t_vocab_oov_rate

    rows = {r["source"]: r for r in t_vocab_oov_rate(spark, SF).collect()}
    train = Counter()
    ev = []
    for r in (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    ):
        toks = r["text"].split(" ")
        if r["doc_id"] % 10 < 8:
            train.update(toks)
        else:
            ev.append((r["source"], toks))
    vocab = {
        w
        for w, _ in sorted(train.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_VOCAB_TOP_V
        ]
    }
    per = {}
    for src, toks in ev:
        n, oov = per.get(src, (0, 0))
        per[src] = (n + len(toks), oov + sum(1 for t in toks if t not in vocab))
    assert set(rows) == set(per)
    for src, (n, oov) in per.items():
        r = rows[src]
        assert (r["n_tokens"], r["n_oov"]) == (n, oov)
        assert r["oov_permille"] == oov * 1000 // n
        assert 0 <= r["oov_permille"] <= 1000


def test_nprobe_tuning_monotonicity(spark):
    """ann_nprobe_tuning_report: nprobe candidate sets are NESTED by
    construction (rn <= np), so candidates, candidate-contained hits,
    and recall must all be non-decreasing in nprobe; recall is
    permille-bounded; and the searched top-5 can never recover more
    exact neighbors than the candidate set contains."""
    from xova_spark.queries.similarity import ann_nprobe_tuning_report

    rows = sorted(
        ann_nprobe_tuning_report(spark, SF).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    for a, b in zip(rows, rows[1:]):
        assert b["n_candidates"] >= a["n_candidates"]
        assert b["n_hits_cand"] >= a["n_hits_cand"]
        assert b["recall_permille"] >= a["recall_permille"]
    for r in rows:
        assert 0 <= r["recall_permille"] <= 1000
        # 50 exact neighbors (10 queries x top-5): recall hits <= what
        # the candidate set even contains
        assert r["recall_permille"] * 50 <= r["n_hits_cand"] * 1000


def test_local_clustering_matches_python_replica(spark):
    """graph_local_clustering vs a python replica of the capped
    middle-counting triangle enumeration on the same supported edge
    list; cc in [0, 1000]; and on the UNCAPPED replica each reported
    (capped) triangle count is a lower bound."""
    from xova_spark.queries.graphq import (
        WEDGE_DEGREE_CAP,
        _edges_cached,
        graph_local_clustering,
    )

    edges = {
        (r["pa"], r["pb"])
        for r in _edges_cached(spark, SF).select("pa", "pb").collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    tri_capped = {}
    tri_exact = {}
    for v, ns in adj.items():
        t = sum(
            1
            for x in ns
            for y in ns
            if x < y and ((x, y) in edges or (y, x) in edges)
        )
        tri_exact[v] = t
        if deg[v] <= WEDGE_DEGREE_CAP:
            tri_capped[v] = t
        else:
            tri_capped[v] = 0  # hub middles are dropped by the light cap
    rows = graph_local_clustering(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        v = r["node"]
        assert r["degree"] == deg[v]
        assert r["triangles"] == tri_capped[v], (v, r["triangles"])
        assert r["triangles"] <= tri_exact[v]
        want_cc = (
            0
            if deg[v] < 2
            else tri_capped[v] * 2000 // (deg[v] * (deg[v] - 1))
        )
        assert r["cc_permille"] == want_cc
        assert 0 <= r["cc_permille"] <= 1000


def test_sort_advisor_picks_the_clustered_layout(spark):
    """layout_sort_advisor: exactly one recommended layout; it carries
    the minimum avg depth; ship_week (sorted by the probe key) must
    beat both natural and the wrong-key part_bucket layout — the
    measured, not assumed, advisor contract."""
    from xova_spark.queries.layoutq import layout_sort_advisor

    rows = layout_sort_advisor(spark, SF).collect()
    assert {r["layout"] for r in rows} == {
        "natural", "ship_week", "part_bucket",
    }
    rec = [r for r in rows if r["recommended"]]
    assert len(rec) == 1
    best = min(r["avg_depth_permille"] for r in rows)
    assert rec[0]["avg_depth_permille"] == best
    by = {r["layout"]: r for r in rows}
    assert rec[0]["layout"] == "ship_week"
    assert (
        by["ship_week"]["avg_depth_permille"]
        < by["natural"]["avg_depth_permille"]
    )
    assert (
        by["ship_week"]["avg_depth_permille"]
        < by["part_bucket"]["avg_depth_permille"]
    )
    for r in rows:
        assert r["max_depth"] <= r["n_groups"]


def test_assortativity_matches_python_replica_and_bounds(spark):
    """graph_degree_assortativity vs a python replica of the sqrt-free
    symmetric-marginal form; r in [-1e6, 1e6]; and the replica
    cross-checks against the classic Pearson on the same pairs."""
    from xova_spark.queries.graphq import (
        _edges_cached,
        graph_degree_assortativity,
    )

    row = graph_degree_assortativity(spark, SF).collect()[0]
    edges = [
        (r["pa"], r["pb"])
        for r in _edges_cached(spark, SF).select("pa", "pb").collect()
    ]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    arcs = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    n = len(arcs)
    sx = sum(deg[a] for a, _ in arcs)
    sxx = sum(deg[a] ** 2 for a, _ in arcs)
    sxy = sum(deg[a] * deg[b] for a, b in arcs)
    den = n * sxx - sx * sx
    want = (
        0
        if den == 0
        else ((n * sxy - sx * sx) + den) * 1_000_000 // den - 1_000_000
    )
    assert row["n_arcs"] == n
    assert row["assortativity_micro"] == want
    assert -1_000_000 <= row["assortativity_micro"] <= 1_000_000
    # classic Pearson cross-check (float tolerance): symmetric
    # marginals make the sqrt-free form algebraically identical
    mx = sx / n
    cov = sxy / n - mx * mx
    var = sxx / n - mx * mx
    assert abs(row["assortativity_micro"] / 1e6 - cov / var) < 2e-6


def test_seasonality_strength_is_eta2_on_calendar(spark):
    """ev_seasonality_strength vs a python replica of the ANOVA eta^2
    machinery on both calendar groupings, including the
    dayofweek-origin parity (Spark dayofweek-1 == DuckDB dow)."""
    from xova_spark.queries.relext import ev_seasonality_strength

    got = {
        r["component"]: r
        for r in ev_seasonality_strength(spark, SF).collect()
    }
    assert set(got) == {"hour_of_day", "day_of_week"}
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.hour("ts").cast("long").alias("hr"),
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.round(F.col("value") * 1000).cast("long").alias("vm"),
        )
        .collect()
    )
    for comp, key in (("hour_of_day", "hr"), ("day_of_week", "dow")):
        per = {}
        for r in rows:
            n, s, q = per.get(r[key], (0, 0, 0))
            per[r[key]] = (n + 1, s + r["vm"], q + r["vm"] * r["vm"])
        n = sum(p[0] for p in per.values())
        st = sum(p[1] for p in per.values())
        k = len(per)
        gm = _half_away(st * 1000 / n)
        ssb = ssw = 0
        for ng, s, q2 in per.values():
            mb = _half_away(s * 1000 / ng)
            ssb += ng * (mb - gm) ** 2
            ssw += q2 * 1_000_000 - ng * mb * mb
        r = got[comp]
        assert r["k_buckets"] == k
        assert r["strength_micro"] == ssb * 1_000_000 // (ssb + ssw)
        assert 0 <= r["strength_micro"] <= 1_000_000


def test_histogram_sketch_error_law(spark):
    """agg_histogram_quantile_sketch: the exact quantile lies inside
    the sketch's crossing bin, so |est - exact| <= W/2 ALWAYS — the
    accuracy contract the entry reports; estimates sit on bin
    midpoints; exact quantiles are monotone in q; and the sketch is
    mergeable by construction (python check: histogram of two halves
    added == histogram of the whole)."""
    from collections import Counter

    from xova_spark.queries.relext import (
        _HQS_BIN_W,
        agg_histogram_quantile_sketch,
    )

    rows = agg_histogram_quantile_sketch(spark, SF).collect()
    assert [r["q_permille"] for r in rows] == [500, 900, 990]
    for r in rows:
        assert r["abs_err"] <= r["err_bound"] == _HQS_BIN_W // 2
        assert r["est_vm"] % _HQS_BIN_W == _HQS_BIN_W // 2
    ex = [r["exact_vm"] for r in rows]
    assert ex == sorted(ex)
    vms = [
        r["vm"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select(F.round(F.col("value") * 1000).cast("long").alias("vm"))
        .collect()
    ]
    h1 = Counter(v // _HQS_BIN_W for v in vms[: len(vms) // 2])
    h2 = Counter(v // _HQS_BIN_W for v in vms[len(vms) // 2:])
    assert h1 + h2 == Counter(v // _HQS_BIN_W for v in vms)
    # replica of the exact quantile rule
    vms.sort()
    n = len(vms)
    for r in rows:
        # smallest vm with cum*1000 >= n*q == order statistic at
        # rank ceil(n*q/1000)
        rank = -(-n * r["q_permille"] // 1000)
        assert r["exact_vm"] == vms[rank - 1]


def test_asof_tolerance_consistent_with_nearest_backward_arm(spark):
    """join_asof_tolerance law: a pandas merge_asof replica with the
    same tolerance reproduces every row; within_tolerance <=> lag is
    non-null and <= the window; and every matched (event, lag) agrees
    with the backward arm of join_asof_nearest when that arm chose
    backward within tolerance."""
    import pandas as pd

    from xova_spark.queries.relext import (
        _ASOF_TOL_US,
        join_asof_tolerance,
    )

    got = {
        r["event_id"]: r for r in join_asof_tolerance(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).toPandas()
    clicks = (
        ev[ev.event_type == "click"]
        .sort_values(["ts", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    purchases = (
        ev[ev.event_type == "purchase"]
        .sort_values(["ts", "value"], kind="mergesort")
        .reset_index(drop=True)
    )
    m = pd.merge_asof(
        clicks,
        purchases[["user_id", "ts", "value"]].rename(
            columns={"value": "p_value", "ts": "p_ts"}
        ),
        left_on="ts",
        right_on="p_ts",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(microseconds=_ASOF_TOL_US),
    )
    assert len(m) == len(got)
    for r in m.itertuples():
        g = got[r.event_id]
        if pd.isna(r.p_ts):
            assert g["lag_us"] is None and not g["within_tolerance"], r
        else:
            lag = (r.ts - r.p_ts) // pd.Timedelta(microseconds=1)
            assert g["within_tolerance"]
            assert g["lag_us"] == lag, (r.event_id, g["lag_us"], lag)
            assert g["matched_value"] == round(r.p_value, 6)


def test_er_conflict_audit_laws(spark):
    """er_cluster_conflict_rate: segment conflicts are structurally
    IMPOSSIBLE (market segment is part of the blocking key and
    equality is transitive through the closure) — the audit must
    report exactly 0; nation conflicts match a python replica over the
    entity clusters; permille bounded."""
    from xova_spark.queries.erq import (
        er_cluster_conflict_rate,
        er_entity_clusters,
    )

    row = er_cluster_conflict_rate(spark, SF).collect()[0]
    assert row["n_segment_conflicts"] == 0
    cust = {
        r["c_custkey"]: (r["c_nationkey"], r["c_mktsegment"])
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey", "c_nationkey", "c_mktsegment")
        .collect()
    }
    ents = {}
    for r in er_entity_clusters(spark, SF).collect():
        ents.setdefault(r["entity_id"], []).append(r["c_custkey"])
    multi = {e: ms for e, ms in ents.items() if len(ms) >= 2}
    n_conf = sum(
        1
        for ms in multi.values()
        if len({cust[m][0] for m in ms}) > 1
    )
    assert row["n_entities"] == len(multi)
    assert row["n_nation_conflicts"] == n_conf
    assert row["nation_conflict_permille"] == n_conf * 1000 // len(multi)
    assert row["max_entity_size"] == max(len(ms) for ms in multi.values())
    for ms in multi.values():
        assert len({cust[m][1] for m in ms}) == 1  # the structural law


def test_stream_histogram_quantiles_equal_batch_sketch(spark):
    """The streaming histogram's converged quantile estimates equal
    the batch sketch's est_vm column exactly — mergeability exercised
    by the engine (update-mode keyed counts across micro-batches)
    rather than asserted in python."""
    from xova_spark.queries.relext import agg_histogram_quantile_sketch
    from xova_spark.queries.streamingq import stream_histogram_quantiles

    batch = {
        r["q_permille"]: r["est_vm"]
        for r in agg_histogram_quantile_sketch(spark, SF).collect()
    }
    stream = {
        r["q_permille"]: r["est_vm"]
        for r in stream_histogram_quantiles(spark, SF).collect()
    }
    assert stream == batch


def test_cuped_matches_python_replica_and_bounds(spark):
    """ev_cuped_adjustment vs a python replica on the same 128-bit
    moments; rho^2 in [0, 1e6] (Cauchy-Schwarz); and the defining CUPED
    property on the actual data: adjusting y by theta*x reduces sample
    variance by exactly rho^2 (checked in floats to 1e-9)."""
    from xova_spark.queries.relext import ev_cuped_adjustment

    row = ev_cuped_adjustment(spark, SF).collect()[0]
    per = {}
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 1000).cast("long").alias("vm"),
        )
        .collect()
    ):
        x, y = per.get(r["user_id"], (0, 0))
        if r["event_type"] == "view":
            x += 1
        elif r["event_type"] == "purchase":
            y += r["vm"]
        per[r["user_id"]] = (x, y)
    n = len(per)
    sx = sum(x for x, _ in per.values())
    sy = sum(y for _, y in per.values())
    sxx = sum(x * x for x, _ in per.values())
    sxy = sum(x * y for x, y in per.values())
    syy = sum(y * y for _, y in per.values())
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    assert row["n_users"] == n
    assert row["theta_micro"] == _half_away(num / vx * 1e6)
    want_rho2 = _half_away(num / vx * num / vy * 1e6)
    assert row["var_reduction_micro"] == want_rho2
    assert 0 <= row["var_reduction_micro"] <= 1_000_000
    # the CUPED identity: var(y - theta*x) = var(y) * (1 - rho^2)
    theta = num / vx
    mx, my = sx / n, sy / n
    var_y = sum((y - my) ** 2 for _, y in per.values()) / n
    var_adj = sum(
        (y - theta * x - (my - theta * mx)) ** 2 for x, y in per.values()
    ) / n
    rho2 = num / vx * num / vy
    assert abs(var_adj / var_y - (1 - rho2)) < 1e-9


def test_power_sample_size_replica_and_cuped_dominance(spark):
    """ev_power_sample_size vs a python replica on the same moments;
    the CUPED-adjusted requirement never exceeds the raw one (rho^2 >=
    0) and equals n_required * (1 - rho^2) on the integer lattice; and
    the classic formula sanity-checks in floats."""
    from xova_spark.queries.relext import (
        _Z_ALPHA_MICRO,
        _Z_POWER_MICRO,
        ev_power_sample_size,
    )

    row = ev_power_sample_size(spark, SF).collect()[0]
    per = {}
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 1000).cast("long").alias("vm"),
        )
        .collect()
    ):
        x, y = per.get(r["user_id"], (0, 0))
        if r["event_type"] == "view":
            x += 1
        elif r["event_type"] == "purchase":
            y += r["vm"]
        per[r["user_id"]] = (x, y)
    n = len(per)
    sx = sum(x for x, _ in per.values())
    sy = sum(y for _, y in per.values())
    sxx = sum(x * x for x, _ in per.values())
    sxy = sum(x * y for x, y in per.values())
    syy = sum(y * y for _, y in per.values())
    vy = (n * syy - sy * sy) // (n * (n - 1))
    num, vx_, vy_ = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    rho2 = 0 if vx_ == 0 or vy_ == 0 else _half_away(num / vx_ * num / vy_ * 1e6)
    delta = max(sy // n // 100, 1)
    zs = _Z_ALPHA_MICRO + _Z_POWER_MICRO
    n_req = 2 * zs * zs * vy // (delta * delta * 10**12)
    n_req_c = 2 * zs * zs * vy * (1_000_000 - rho2) // (
        delta * delta * 10**18
    )
    assert row["n_users"] == n
    assert row["metric_var_p2"] == vy
    assert row["cuped_rho2_micro"] == rho2
    assert row["n_required"] == n_req
    assert row["n_required_cuped"] == n_req_c
    assert row["n_required_cuped"] <= row["n_required"]
    # float sanity: n = 2*(1.96+0.84)^2 * var/delta^2 within 1%
    approx = 2 * (zs / 1e6) ** 2 * vy / delta**2
    assert abs(n_req - approx) <= max(2, 0.01 * approx)


def test_cluster_size_profile_conservation(spark):
    """dedup_cluster_size_profile: sum(cluster_size * n_clusters)
    equals the number of clustered documents (conservation), every
    cluster has size >= 2 (cc runs on verified PAIRS), and n_docs is
    the product column it claims to be."""
    from xova_spark.queries.dedup import (
        dedup_cc_clusters,
        dedup_cluster_size_profile,
    )

    rows = dedup_cluster_size_profile(spark, SF).collect()
    clustered = dedup_cc_clusters(spark, SF).count()
    assert sum(r["n_docs"] for r in rows) == clustered
    for r in rows:
        assert r["cluster_size"] >= 2
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_dedup_mix_shift_books_balance(spark):
    """t_dedup_mix_shift: per-source counts reconcile with a python
    replica of keep-lowest exact dedup; shares sum to ~1000 permille
    (floor slack < n_sources); shifts sum to ~0."""
    from collections import Counter

    from xova_spark.queries.dedup import t_dedup_mix_shift

    rows = {r["source"]: r for r in t_dedup_mix_shift(spark, SF).collect()}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    before = Counter(r["source"] for r in docs)
    keep = {}
    for r in docs:
        k = r["text"]
        if k not in keep or r["doc_id"] < keep[k][0]:
            keep[k] = (r["doc_id"], r["source"])
    after = Counter(src for _, src in keep.values())
    assert set(rows) == set(before)
    tb, ta = sum(before.values()), sum(after.values())
    for src, r in rows.items():
        assert r["n_before"] == before[src]
        assert r["n_after"] == after.get(src, 0)
        assert r["shift_pm"] == (
            after.get(src, 0) * 1000 // ta - before[src] * 1000 // tb
        )
    assert 1000 - len(rows) <= sum(r["share_after_pm"] for r in rows.values()) <= 1000
