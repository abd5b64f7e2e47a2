"""Property tests for the graph pack: edge-builder semantics, degree
accounting identities, brute-force triangle cross-check, and an exact
pure-Python replica of the integer-grid PageRank recurrence (the DuckDB
gate pins values; these pin that the operators compute the GRAPH
quantities they claim, independently of either engine)."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

import pandas as pd

from xova_spark.queries import graphq as G

SF = "/root/testdata/sf0.001"


def _pandas_edges() -> pd.DataFrame:
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    pp = li.drop_duplicates()
    pairs: defaultdict[tuple, int] = defaultdict(int)
    for _, grp in pp.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"]), 2):
            pairs[(a, b)] += 1
    rows = [(a, b, s) for (a, b), s in pairs.items() if s >= G.MIN_SUPPORT]
    return pd.DataFrame(rows, columns=["pa", "pb", "support"])


def test_edge_builder_matches_bruteforce(spark):
    got = (
        G.graph_copurchase_edges(spark, SF)
        .toPandas()
        .sort_values(["pa", "pb"])
        .reset_index(drop=True)
    )
    want = _pandas_edges().sort_values(["pa", "pb"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["pa"] < got["pb"]).all()
    assert (got["support"] >= G.MIN_SUPPORT).all()
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_like=True
    )


def test_degree_distribution_identities(spark):
    """sum(n_nodes) = node count; sum(degree * n_nodes) = 2 * |E|."""
    dist = G.graph_degree_distribution(spark, SF).toPandas()
    edges = _pandas_edges()
    nodes = set(edges["pa"]) | set(edges["pb"])
    assert dist["n_nodes"].sum() == len(nodes)
    assert (dist["degree"] * dist["n_nodes"]).sum() == 2 * len(edges)
    assert (dist["degree"] >= 1).all()


def test_triangle_count_matches_bruteforce(spark):
    got = G.graph_triangle_count(spark, SF).toPandas()["n_triangles"][0]
    edges = _pandas_edges()
    eset = set(zip(edges["pa"], edges["pb"]))
    adj: defaultdict[int, set] = defaultdict(set)
    for a, b in eset:
        adj[a].add(b)  # forward star only: a < b
    want = sum(
        1
        for a in adj
        for b, c in combinations(sorted(adj[a]), 2)
        if (b, c) in eset
    )
    assert got == want > 0


def _python_pagerank(edges: pd.DataFrame) -> dict[int, int]:
    """Exact replica of the integer-grid recurrence: rank in units of
    2^-30, damping 7/8, integer floor-division at every step."""
    arcs: list[tuple[int, int]] = []
    for a, b in zip(edges["pa"], edges["pb"]):
        arcs.append((int(a), int(b)))
        arcs.append((int(b), int(a)))
    deg: defaultdict[int, int] = defaultdict(int)
    for s, _ in arcs:
        deg[s] += 1
    n = len(deg)
    base = (G.PR_Q // n) // 8
    rank = {v: G.PR_Q // n for v in deg}
    for _ in range(G.PR_ITERS):
        incoming: defaultdict[int, int] = defaultdict(int)
        for s, d in arcs:
            incoming[d] += rank[s] // deg[s]
        rank = {v: base + (7 * inc) // 8 for v, inc in incoming.items()}
    return rank


def test_pagerank_exactly_matches_python_replica(spark):
    got = {
        int(r["node"]): int(r["rank_q"])
        for r in G.graph_pagerank(spark, SF).collect()
    }
    want = _python_pagerank(_pandas_edges())
    assert got == want


def test_pagerank_mass_and_ordering(spark):
    df = G.graph_pagerank(spark, SF).toPandas()
    assert (df["rank_q"] > 0).all()
    # total mass conserved up to integer-floor leakage (each floor
    # drops < 1 unit per arc/node; grid is 2^30 so leakage is tiny)
    total = df["rank_q"].sum()
    assert 0.97 * G.PR_Q <= total <= G.PR_Q
    # the top-ranked node must be a genuinely high-degree node
    edges = _pandas_edges()
    deg = pd.concat([edges["pa"], edges["pb"]]).value_counts()
    top = df.sort_values("rank_q", ascending=False)["node"].iloc[0]
    assert deg[top] >= deg.median()


def test_graph_plans_have_no_nested_loop(spark):
    for fn in (G.graph_triangle_count, G.graph_pagerank):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_jaccard_link_scores_match_bruteforce(spark):
    got = G.graph_jaccard_link_scores(spark, SF).toPandas()
    edges = _pandas_edges()
    eset = set(zip(edges["pa"], edges["pb"]))
    adj: defaultdict[int, set] = defaultdict(set)
    for a, b in eset:
        adj[a].add(b)
        adj[b].add(a)
    want = {
        (a, b): len(adj[a] & adj[b])
        for a, b in eset
        if adj[a] & adj[b]
    }
    got_map = {
        (int(r.pa), int(r.pb)): int(r.n_common) for r in got.itertuples()
    }
    assert got_map == want
    for r in got.itertuples():
        assert r.deg_a == len(adj[r.pa])
        assert r.deg_b == len(adj[r.pb])
        # Jaccard denominator (excluding the endpoints themselves)
        # is a nonnegative integer downstream expression
        assert r.deg_a + r.deg_b - 2 - r.n_common >= r.n_common >= 1


def test_connected_components_match_union_find(spark):
    got = {
        int(r["node"]): int(r["component"])
        for r in G.graph_connected_components(spark, SF).collect()
    }
    edges = _pandas_edges()
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["pa"], edges["pb"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for v in parent:
        # min-label: the root after full compression, then the minimum
        # member of each set labels the component
        want.setdefault(find(v), []).append(v)
    want = {
        v: min(members) for root, members in want.items() for v in members
    }
    assert got == want


def test_kcore_peel_laws_and_fixpoint(spark):
    """Bounded-peel laws on sf0.001: (1) the sf0.001 graph converges in
    one round, so kcore_converged == kcore_edges(rounds=1) == rounds=2;
    (2) at a fixpoint every surviving node has degree >= K; (3) a pure
    pandas replica of the peel agrees with the registry output."""
    sf = "/root/testdata/sf0.001"
    edges = G._copurchase_edges(spark, sf).cache()
    e1 = G.kcore_edges(edges, rounds=1)
    e2 = G.kcore_edges(edges, rounds=2)
    assert e1.count() == e2.count()
    conv = G.kcore_converged(edges)
    assert conv.count() == e1.count()

    # Fixpoint degree law.
    got = G.graph_kcore(spark, sf).toPandas()
    assert (got["core_degree"] >= G.KCORE_K).all()

    # Pandas replica of the fixed-round peel.
    pdf = edges.toPandas()[["pa", "pb"]]
    for _ in range(G.KCORE_ROUNDS):
        deg = pd.concat([pdf["pa"], pdf["pb"]]).value_counts()
        keep = set(deg[deg >= G.KCORE_K].index)
        pdf = pdf[pdf["pa"].isin(keep) & pdf["pb"].isin(keep)]
    ref = (
        pd.concat([pdf["pa"], pdf["pb"]])
        .value_counts()
        .rename_axis("node")
        .reset_index(name="core_degree")
    )
    m = got.sort_values("node").reset_index(drop=True)
    r = ref.sort_values("node").reset_index(drop=True)
    assert m["node"].tolist() == r["node"].tolist()
    assert m["core_degree"].tolist() == r["core_degree"].tolist()
    edges.unpersist()


def test_kcore_gated_and_distributed_paths_agree(spark, monkeypatch):
    """The driver-side peel (edge count under _KCORE_COLLECT_EDGES) and
    the distributed fixed-round loop produce bit-identical (node,
    core_degree) rows — the size gate must never change the answer."""
    local = G.graph_kcore(spark, SF).toPandas().sort_values("node")
    monkeypatch.setattr(G, "_KCORE_COLLECT_EDGES", 0)
    dist = G.graph_kcore(spark, SF).toPandas().sort_values("node")
    assert local["node"].tolist() == dist["node"].tolist()
    assert local["core_degree"].tolist() == dist["core_degree"].tolist()


def test_lpa_communities_refine_components(spark):
    """LPA labels nest inside connected components (labels only travel
    along edges), and community sizes sum to the node count."""
    sf = "/root/testdata/sf0.001"
    lpa = G.graph_lpa_communities(spark, sf).toPandas()
    deg = G.graph_degree_distribution(spark, sf).toPandas()
    assert lpa["n_nodes"].sum() == deg["n_nodes"].sum()
    assert (lpa["min_node"] <= lpa["max_node"]).all()
    assert lpa["community"].is_unique


def test_basket_rules_match_pandas_bruteforce(spark):
    """Rules recomputed from raw lineitem in pandas (distinct baskets,
    all supported pairs, integer-lattice lift) must match the top-20
    exactly; structural laws: pair support never exceeds either item
    support, confidences are permille."""
    import itertools

    import pandas as pd

    from xova_spark.queries.graphq import MIN_SUPPORT, basket_rules_lift

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in basket_rules_lift(spark, sf).collect()]
    li = pd.read_parquet(
        sf + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    n_orders = li["l_orderkey"].nunique()
    n_item = li.groupby("l_partkey").size().to_dict()
    pair_sup: dict[tuple[int, int], int] = {}
    for _, g in li.groupby("l_orderkey"):
        for pa, pb in itertools.combinations(sorted(set(g["l_partkey"])), 2):
            pair_sup[(pa, pb)] = pair_sup.get((pa, pb), 0) + 1
    rules = []
    for (pa, pb), n_ab in pair_sup.items():
        if n_ab < MIN_SUPPORT:
            continue
        na, nb = n_item[pa], n_item[pb]
        rules.append(
            (
                pa,
                pb,
                n_ab,
                na,
                nb,
                (n_orders * n_ab * 1_000_000) // (na * nb),
                (n_ab * 1000) // na,
                (n_ab * 1000) // nb,
            )
        )
    rules.sort(key=lambda r: (-r[5], r[0], r[1]))
    assert got == rules[:20] and got
    for pa, pb, n_ab, na, nb, lift, cab, cba in got:
        assert n_ab <= min(na, nb)
        assert 0 <= cab <= 1000 and 0 <= cba <= 1000


def test_node_jaccard_matches_pandas_bruteforce(spark):
    """Neighbor-set Jaccard recomputed from raw baskets with python
    sets must match the top-20; inclusion-exclusion law |A∪B| =
    da+db-common is checked against the true union size."""
    import itertools

    import pandas as pd

    from xova_spark.queries.graphq import MIN_SUPPORT, graph_node_jaccard

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in graph_node_jaccard(spark, sf).collect()]
    li = pd.read_parquet(
        sf + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    pair_sup: dict[tuple[int, int], int] = {}
    for _, g in li.groupby("l_orderkey"):
        for pa, pb in itertools.combinations(sorted(set(g["l_partkey"])), 2):
            pair_sup[(pa, pb)] = pair_sup.get((pa, pb), 0) + 1
    nbrs: dict[int, set[int]] = {}
    for (pa, pb), s in pair_sup.items():
        if s >= MIN_SUPPORT:
            nbrs.setdefault(pa, set()).add(pb)
            nbrs.setdefault(pb, set()).add(pa)
    rows = []
    for sa, sb in itertools.combinations(sorted(nbrs), 2):
        common = len(nbrs[sa] & nbrs[sb])
        if not common:
            continue
        da, db = len(nbrs[sa]), len(nbrs[sb])
        union = len(nbrs[sa] | nbrs[sb])
        assert union == da + db - common  # inclusion-exclusion law
        rows.append((sa, sb, common, da, db, (common * 1000) // union))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    assert got == rows[:20] and got


def test_capped_jaccard_hub_laws(spark):
    """Hub-cap laws for graph_node_jaccard_capped (VERDICT r5 item 3),
    at sf0.01 where the cap measurably bites (max degree 13 > cap 8):

    1. replica: the capped top-20 matches a pure-python replica that
       drops wedges through neighbors with degree > WEDGE_DEGREE_CAP.
    2. lower bound: for every pair, common_capped <= true common and
       jac_lb_pm <= true Jaccard permille (degrees stay exact).
    3. volume: capped wedge candidate volume = sum of deg^2 over kept
       neighbors <= WEDGE_DEGREE_CAP * |arcs| (the linear hub-proof
       bound) and < exact volume sum deg^2 (the cap actually pruned).
    4. recall: measured capped-vs-exact top-20 pair overlap (recorded
       in SCALE.md; asserted as a floor so regressions surface).
    """
    import itertools

    import pandas as pd

    from xova_spark.queries.graphq import (
        MIN_SUPPORT,
        WEDGE_DEGREE_CAP,
        graph_node_jaccard,
        graph_node_jaccard_capped,
    )

    sf = "/root/testdata/sf0.01"
    got = [tuple(r) for r in graph_node_jaccard_capped(spark, sf).collect()]
    exact_top = [tuple(r) for r in graph_node_jaccard(spark, sf).collect()]

    li = pd.read_parquet(
        sf + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    pair_sup: dict[tuple[int, int], int] = {}
    for _, g in li.groupby("l_orderkey"):
        for pa, pb in itertools.combinations(sorted(set(g["l_partkey"])), 2):
            pair_sup[(pa, pb)] = pair_sup.get((pa, pb), 0) + 1
    nbrs: dict[int, set[int]] = {}
    for (pa, pb), s in pair_sup.items():
        if s >= MIN_SUPPORT:
            nbrs.setdefault(pa, set()).add(pb)
            nbrs.setdefault(pb, set()).add(pa)
    deg = {n: len(v) for n, v in nbrs.items()}
    assert max(deg.values()) > WEDGE_DEGREE_CAP  # the cap bites here

    rows = []
    for sa, sb in itertools.combinations(sorted(nbrs), 2):
        inter = nbrs[sa] & nbrs[sb]
        cc = sum(1 for n in inter if deg[n] <= WEDGE_DEGREE_CAP)
        if not cc:
            continue
        da, db = deg[sa], deg[sb]
        rows.append((sa, sb, cc, da, db, (cc * 1000) // (da + db - cc)))
        # law 2: lower bound vs the true values
        true_common = len(inter)
        true_jac = (true_common * 1000) // (da + db - true_common)
        assert cc <= true_common
        assert (cc * 1000) // (da + db - cc) <= true_jac
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    assert got == rows[:20] and got  # law 1

    # law 3: linear volume bound, and the cap actually pruned work
    n_arcs = 2 * sum(1 for s in pair_sup.values() if s >= MIN_SUPPORT)
    vol_capped = sum(d * d for d in deg.values() if d <= WEDGE_DEGREE_CAP)
    vol_exact = sum(d * d for d in deg.values())
    assert vol_capped <= WEDGE_DEGREE_CAP * n_arcs
    assert vol_capped < vol_exact

    # law 4: measured top-20 pair recall floor (deterministic data)
    overlap = len(
        {(r[0], r[1]) for r in got} & {(r[0], r[1]) for r in exact_top}
    )
    assert overlap >= 15, f"capped top-20 recall dropped: {overlap}/20"


def test_triples_downward_closure_and_bruteforce(spark):
    """Apriori laws for basket_triples_support at sf0.001:

    1. brute force: the nested JVM expansion enumerates exactly the
       ordered triples a python replica builds from raw baskets;
    2. downward closure: support(a,b,c) <= min support of its three
       constituent pairs (the pruning law every Apriori level relies
       on) — checked against the pair supports from the same replica.
    """
    import itertools

    import pandas as pd

    from xova_spark.queries.graphq import MIN_SUPPORT, basket_triples_support

    got = {
        (r.pa, r.pb, r.pc): r.support
        for r in basket_triples_support(spark, SF).collect()
    }

    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    pair_sup: dict[tuple, int] = {}
    tri_sup: dict[tuple, int] = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g["l_partkey"]))
        for p in itertools.combinations(parts, 2):
            pair_sup[p] = pair_sup.get(p, 0) + 1
        for t in itertools.combinations(parts, 3):
            tri_sup[t] = tri_sup.get(t, 0) + 1
    want = {t: s for t, s in tri_sup.items() if s >= MIN_SUPPORT}
    assert got == want and got  # law 1

    for (a, b, c), s in got.items():
        m = min(pair_sup[(a, b)], pair_sup[(a, c)], pair_sup[(b, c)])
        assert s <= m  # law 2


def test_ktruss_converged_and_supports_internal(spark):
    """The round-T snapshot must BE the k-truss at the fixture: one
    more peel round changes nothing (e_T == e_{T-1}), every surviving
    edge's support is >= k-2 counted ONLY within the surviving edge
    set, and the truss is a subset of the supported edge list."""
    from pyspark.sql import functions as F

    from xova_spark.queries.graphq import (
        KTRUSS_K,
        _edges_cached,
        graph_ktruss_edges,
    )

    sf = "/root/testdata/sf0.001"
    out = graph_ktruss_edges(spark, sf).collect()
    assert len(out) > 0
    truss = {(r["pa"], r["pb"]) for r in out}
    base = {
        (r["pa"], r["pb"])
        for r in _edges_cached(spark, sf).select("pa", "pb").collect()
    }
    assert truss <= base
    # python replica of ONE more peel round over the truss set
    eset = truss
    supports: dict[tuple, int] = {}
    nodes: dict[int, set] = {}
    for a, b in eset:
        nodes.setdefault(a, set()).add(b)
        nodes.setdefault(b, set()).add(a)
    for a, b in eset:
        common = nodes[a] & nodes[b]
        supports[(a, b)] = len(common)
    survivors = {e for e, s in supports.items() if s >= KTRUSS_K - 2}
    assert survivors == eset  # converged: nothing more peels
    for r in out:
        assert r["truss_support"] == supports[(r["pa"], r["pb"])]
        # the certificate travels with the entry (VERDICT r6 item 5):
        # every row attests e_T == e_{T-1} inside the query itself
        assert r["converged"] is True


def test_hits_replica_and_normalization_law(spark):
    """graph_hits_scores vs a pure-python replica of the integer
    micro-lattice HITS iteration over the same bipartite edge set;
    plus the lattice law: after each half-step the max score is
    exactly 1_000_000 and every score is in (0, 1_000_000]."""
    from collections import defaultdict

    from xova_spark.queries.graphq import (
        HITS_ROUNDS,
        HITS_TOPK,
        graph_hits_scores,
    )

    sf = "/root/testdata/sf0.001"
    out = [r.asDict() for r in graph_hits_scores(spark, sf).collect()]
    assert len(out) == 2 * HITS_TOPK
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    edges = {
        (r["o_custkey"], r["l_partkey"])
        for r in orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).select("o_custkey", "l_partkey").distinct().collect()
    }

    def norm(d):
        mx = max(d.values())
        return {k: v * 1_000_000 // mx for k, v in d.items()}

    h = None
    a = None
    for r in range(HITS_ROUNDS):
        a = defaultdict(int)
        for c, p in edges:
            a[p] += 1_000_000 if h is None else h[c]
        a = norm(a)
        assert max(a.values()) == 1_000_000
        h = defaultdict(int)
        for c, p in edges:
            h[c] += a[p]
        h = norm(h)
        assert max(h.values()) == 1_000_000
    want_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOPK]
    want_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOPK]
    got_a = {r["node_id"]: r["score_micro"] for r in out if r["kind"] == "authority"}
    got_h = {r["node_id"]: r["score_micro"] for r in out if r["kind"] == "hub"}
    assert got_a == dict(want_a)
    assert got_h == dict(want_h)
    assert all(0 < s <= 1_000_000 for s in got_a.values())
    assert all(0 < s <= 1_000_000 for s in got_h.values())
