"""Blocklist (taboo-word) filtering and multi-source BFS hop distance —
semantics laws pinned against brute-force Python replicas at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.queries.graphq import (
    BFS_ROUNDS,
    _arcs_and_degrees,
    _edges_cached,
    bfs_hops,
    graph_bfs_hops,
)
from xova_spark.queries.textops import (
    BLOCKLIST,
    BLOCKLIST_MAX_PERMILLE,
    t_blocklist_rate,
    t_blocklist_spans,
)
from xova_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def test_blocklist_rate_counting_laws(spark):
    """Per-source counts obey the containment chain
    n_flagged <= n_docs_with_hits <= n_docs, and the totals re-derive
    from a per-doc Python replica."""
    rows = {r["source"]: r for r in t_blocklist_rate(spark, SF).collect()}
    docs = load_tables(spark, SF, ("documents",))["documents"].collect()
    bl = set(BLOCKLIST)
    expect: dict[str, list] = {}
    for d in docs:
        ws = d["text"].split(" ")
        hits = sum(1 for w in ws if w in bl)
        e = expect.setdefault(d["source"], [0, 0, 0, 0, 0])
        e[0] += 1
        e[1] += 1 if hits > 0 else 0
        e[2] += 1 if hits * 1000 >= BLOCKLIST_MAX_PERMILLE * len(ws) else 0
        e[3] += hits
        e[4] += len(ws)
    assert set(rows) == set(expect)
    for src, r in rows.items():
        e = expect[src]
        assert (r["n_docs"], r["n_docs_with_hits"], r["n_flagged"]) == (
            e[0],
            e[1],
            e[2],
        )
        assert r["total_hits"] == e[3]
        assert r["hit_permille"] == e[3] * 1000 // e[4]
        assert r["n_flagged"] <= r["n_docs_with_hits"] <= r["n_docs"]


def test_blocklist_spans_first_hit_and_window(spark):
    """Every span row points at the TRUE first blocklist position, the
    context window is the +/-2 clip around it, and docs with zero hits
    emit no row."""
    spans = {r["doc_id"]: r for r in t_blocklist_spans(spark, SF).collect()}
    docs = load_tables(spark, SF, ("documents",))["documents"].collect()
    bl = set(BLOCKLIST)
    n_with_hits = 0
    for d in docs:
        ws = d["text"].split(" ")
        first = next((i for i, w in enumerate(ws) if w in bl), None)
        if first is None:
            assert d["doc_id"] not in spans
            continue
        n_with_hits += 1
        r = spans[d["doc_id"]]
        assert r["first_pos"] == first + 1  # 1-based
        assert r["first_hit_word"] == ws[first]
        lo, hi = max(0, first - 2), min(len(ws), first + 3)
        assert r["context"] == " ".join(ws[lo:hi])
    assert len(spans) == n_with_hits
    # the deliberately-absent word never fires on the fixture
    assert all(r["first_hit_word"] != "crash" for r in spans.values())


def test_bfs_hops_matches_python_bfs_and_converges(spark):
    """The fixed-round BFS equals a Python BFS from the same hub seeds,
    and one extra round changes nothing (fixpoint reached well inside
    BFS_ROUNDS on the fixture graph)."""
    edges = _edges_cached(spark, SF)
    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        adj.setdefault(r["pa"], set()).add(r["pb"])
        adj.setdefault(r["pb"], set()).add(r["pa"])
    assert adj, "fixture graph is non-empty"
    maxdeg = max(len(v) for v in adj.values())
    seeds = sorted(n for n, v in adj.items() if len(v) == maxdeg)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    assert max(dist.values()) <= BFS_ROUNDS, "fixture diameter fits the schedule"
    got = {r["node"]: r["hops"] for r in graph_bfs_hops(spark, SF).collect()}
    assert got == dist
    # idempotence past convergence: one more round, same table
    arcs, deg = _arcs_and_degrees(edges)
    hubs = deg.join(
        F.broadcast(deg.agg(F.max("degree").alias("degree"))),
        "degree",
        "left_semi",
    ).select("node")
    labels = hubs.select("node", F.lit(0).alias("hops"))
    extra = bfs_hops(labels, arcs, rounds=BFS_ROUNDS + 1)
    got2 = {r["node"]: r["hops"] for r in extra.collect()}
    assert got2 == dist


def test_sssp_cost_matches_python_bellman_ford(spark):
    """graph_sssp_cost equals an R-round Bellman-Ford replica (min cost
    over paths of <= BFS_ROUNDS hops from the hub set), and weighted
    dist dominates hops (cost >= 1 per edge => dist >= hops)."""
    from xova_spark.queries.graphq import graph_sssp_cost

    edges = _edges_cached(spark, SF)
    arcs: list[tuple[int, int, int]] = []
    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        c = 1000 // r["support"]
        arcs.append((r["pa"], r["pb"], c))
        arcs.append((r["pb"], r["pa"], c))
        adj.setdefault(r["pa"], set()).add(r["pb"])
        adj.setdefault(r["pb"], set()).add(r["pa"])
    maxdeg = max(len(v) for v in adj.values())
    dist = {n: 0 for n, v in adj.items() if len(v) == maxdeg}
    for _ in range(BFS_ROUNDS):
        nxt = dict(dist)
        for u, v, c in arcs:
            if u in dist and dist[u] + c < nxt.get(v, 1 << 60):
                nxt[v] = dist[u] + c
        dist = nxt
    got = {r["node"]: r["dist"] for r in graph_sssp_cost(spark, SF).collect()}
    assert got == dist
    hops = {r["node"]: r["hops"] for r in graph_bfs_hops(spark, SF).collect()}
    assert set(got) == set(hops)
    assert all(got[n] >= hops[n] for n in got)


def test_relax_gated_and_distributed_paths_agree(spark, monkeypatch):
    """Both _hub_relax execution paths (driver fixed-round relaxation
    vs distributed frontier join + keyed min) produce bit-identical
    tables for BFS and SSSP."""
    from xova_spark.queries import graphq as G

    gated_bfs = {r["node"]: r["hops"] for r in G.graph_bfs_hops(spark, SF).collect()}
    gated_sssp = {r["node"]: r["dist"] for r in G.graph_sssp_cost(spark, SF).collect()}
    monkeypatch.setattr(G, "_BFS_COLLECT_EDGES", 0)
    dist_bfs = {r["node"]: r["hops"] for r in G.graph_bfs_hops(spark, SF).collect()}
    dist_sssp = {r["node"]: r["dist"] for r in G.graph_sssp_cost(spark, SF).collect()}
    assert gated_bfs == dist_bfs
    assert gated_sssp == dist_sssp
