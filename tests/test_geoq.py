"""Spatial pack laws: the 3x3 cell probe must be COMPLETE for the
radius join (cell edge == radius), and the cell-bounded kNN must agree
with brute force wherever the neighborhood holds enough candidates."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.01"


def _brute_points(sf=SF):
    from xova_spark.queries.geoq import _GRID

    cust = pd.read_parquet(sf + "/customer.parquet", columns=["c_custkey"])
    k = cust["c_custkey"].to_numpy(dtype=np.int64)
    return k, (k * 2654435761) % _GRID, (k * 40503 + 7919) % _GRID


def test_radius_pairs_complete_vs_bruteforce(spark):
    from xova_spark.queries.geoq import _RADIUS, geo_radius_pairs

    got = {
        (r["id_a"], r["id_b"]): r["d2"]
        for r in geo_radius_pairs(spark, SF).collect()
    }
    ids, x, y = _brute_points()
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    ia, ib = np.where(d2 <= _RADIUS * _RADIUS)
    want = {
        (int(ids[a]), int(ids[b])): int(d2[a, b])
        for a, b in zip(ia, ib)
        if ids[a] < ids[b]
    }
    assert got == want and got  # complete AND exact, no extras


def test_knn_matches_bruteforce_within_ring(spark):
    """Wherever brute-force kNN's k-th neighbor lies within one cell
    ring (distance <= R guarantees ring membership), the cell-bounded
    answer must be identical — the approximation only ever truncates
    beyond the ring."""
    from xova_spark.queries.geoq import _KNN_K, _RADIUS, geo_knn_cell

    rows = geo_knn_cell(spark, SF).collect()
    got: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(rows, key=lambda r: (r["id_a"], r["rnk"])):
        got.setdefault(r["id_a"], []).append((r["id_b"], r["d2"]))
    ids, x, y = _brute_points()
    order = np.argsort(ids)
    ids, x, y = ids[order], x[order], y[order]
    for i in range(len(ids)):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        d2[i] = np.iinfo(np.int64).max
        near = sorted(zip(d2.tolist(), ids.tolist()))[:_KNN_K]
        if near[-1][0] <= _RADIUS * _RADIUS:
            # true top-k fully inside the guaranteed-complete zone
            want = [(int(b), int(d)) for d, b in near]
            assert got.get(int(ids[i])) == want, ids[i]
    # ranks are dense 1..k and distances non-decreasing per point
    for pid, lst in got.items():
        ds = [d for _, d in lst]
        assert ds == sorted(ds) and len(lst) <= _KNN_K


def test_density_guard_volume_identity_and_red_path(spark):
    """Laws for geo_cell_density_guard (VERDICT r5 item 8):

    1. exact pricing: candidate_rows equals the ACTUAL pre-filter row
       count of the radius join's (probe x cell) equi-join, measured by
       running that join without the distance/order filters;
    2. fixture envelope: sf0.01 sits within the envelope (recorded in
       SCALE.md alongside the sf1 tier);
    3. red path: injecting a hot cluster (CELL_MAX_POINTS+1 co-located
       points) through the production logic flips within_envelope and
       counts the overdense cell.
    """
    from pyspark.sql import functions as F

    from xova_spark.queries.geoq import (
        CELL_MAX_POINTS,
        _RADIUS,
        _pts,
        cell_density_guard,
    )

    guard = cell_density_guard(_pts(spark, SF)).collect()[0]
    assert guard.within_envelope and guard.n_overdense == 0

    # law 1: rebuild the radius join WITHOUT filters and count its rows
    pts = _pts(spark, SF)
    cells = pts.select(
        "id",
        F.expr(f"x div {_RADIUS}").alias("cx"),
        F.expr(f"y div {_RADIUS}").alias("cy"),
    )
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        (F.expr("id div 3") - 1).cast("long").alias("dy"),
    )
    probes = cells.crossJoin(F.broadcast(offsets)).select(
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    actual = probes.join(cells.drop("id"), ["cx", "cy"]).count()
    assert guard.candidate_rows == actual

    # law 3: hot-cell injection through the production logic
    hot = spark.range(CELL_MAX_POINTS + 1).select(
        (F.col("id") + 1_000_000).alias("id"),
        F.lit(5).cast("long").alias("x"),
        F.lit(5).cast("long").alias("y"),
    )
    flagged = cell_density_guard(pts.unionAll(hot)).collect()[0]
    assert not flagged.within_envelope
    assert flagged.n_overdense >= 1
    assert flagged.max_cell_n >= CELL_MAX_POINTS + 1


def test_adaptive_split_identity_and_dispatch(spark):
    """Auto-split laws (VERDICT r5 item 8, full form):

    1. grid-identity: the R/2+5x5 join returns EXACTLY the pair set of
       the R+3x3 join on real data (completeness at any edge dividing
       R — the shared-oracle premise);
    2. dispatch rule: coarse inside the envelope, split above it;
    3. dense path: on an injected hot cluster the adaptive join (which
       dispatches to the split grid) still returns exactly the
       brute-force pair set — correctness is resolution-independent;
    4. the split pays off where it should: on the hot cluster the
       fine grid's candidate volume is below the coarse grid's.
    """
    from pyspark.sql import functions as F

    from xova_spark.queries.geoq import (
        CELL_MAX_POINTS,
        _RADIUS,
        _pts,
        choose_edge,
        radius_pairs_adaptive,
        radius_pairs_at,
    )

    pts = _pts(spark, SF)
    coarse = {tuple(r) for r in radius_pairs_at(spark, pts, _RADIUS, 1).collect()}
    fine = {tuple(r) for r in radius_pairs_at(spark, pts, _RADIUS // 2, 2).collect()}
    assert coarse == fine and coarse  # law 1

    assert choose_edge(CELL_MAX_POINTS) == (_RADIUS, 1)  # law 2
    assert choose_edge(CELL_MAX_POINTS + 1) == (_RADIUS // 2, 2)

    # law 3: dense cluster spread over ~3x3 coarse cells so (a) at least
    # one coarse cell crosses the envelope (the dispatcher must split)
    # and (b) the cluster is wider than the fine ring, so ring exclusion
    # actually prunes candidates (a cluster inside ONE cell has volume
    # n^2 at every resolution).
    n_hot = 1200
    hot = spark.range(n_hot).select(
        (F.col("id") + 2_000_000).alias("id"),
        (F.col("id") * 97 % 700).cast("long").alias("x"),
        (F.col("id") * 131 % 700).cast("long").alias("y"),
    )
    maxn = (
        hot.groupBy(
            F.expr(f"x div {_RADIUS}"), F.expr(f"y div {_RADIUS}")
        )
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert maxn > CELL_MAX_POINTS  # the split path is what runs below
    got = {tuple(r) for r in radius_pairs_adaptive(spark, hot).collect()}
    rows = hot.collect()
    want = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            d2 = (a.x - b.x) ** 2 + (a.y - b.y) ** 2
            if d2 <= _RADIUS * _RADIUS:
                pa, pb = sorted((a.id, b.id))
                want.add((pa, pb, d2))
    assert got == want and got

    # law 4: candidate volume (pre-filter join rows) fine < coarse here
    def volume(edge, ring):
        cells = hot.select(
            F.expr(f"x div {edge}").alias("cx"),
            F.expr(f"y div {edge}").alias("cy"),
        )
        h = cells.groupBy("cx", "cy").agg(F.count("*").alias("n"))
        width = 2 * ring + 1
        offs = spark.range(width * width).select(
            (F.col("id") % width - ring).cast("long").alias("dx"),
            (F.expr(f"id div {width}") - ring).cast("long").alias("dy"),
        )
        probes = h.crossJoin(F.broadcast(offs)).select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            F.col("n").alias("na"),
        )
        return (
            probes.join(h, ["cx", "cy"])
            .agg(F.sum(F.col("na") * F.col("n")))
            .collect()[0][0]
        )

    assert volume(_RADIUS // 2, 2) < volume(_RADIUS, 1)


def test_point_in_polygon_replica_and_reflex(spark):
    """geo_point_in_polygon vs a pure-python ray cast over the same
    integer arithmetic; the fixture polygon is genuinely non-convex
    (some point crosses 3 edges), so the even-odd parity rule — not a
    convex half-plane AND — is what the entry computes."""
    from xova_spark.queries.geoq import _POLY_EDGES, geo_point_in_polygon

    rows = geo_point_in_polygon(spark, "/root/testdata/sf0.001").collect()
    assert rows

    def crossings(px, py):
        n = 0
        for x1, y1, x2, y2 in _POLY_EDGES:
            if (y1 > py) != (y2 > py):
                num = (x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)
                if num * (1 if y2 > y1 else -1) > 0:
                    n += 1
        return n

    from xova_spark.queries.geoq import _GRID

    pts = {
        r["id"]: ((r["id"] * 2654435761) % _GRID, (r["id"] * 40503 + 7919) % _GRID)
        for r in rows
    }
    for r in rows:
        px, py = pts[r["id"]]
        c = crossings(px, py)
        assert r["crossings"] == c
        assert r["inside"] == (c % 2 == 1)
    assert any(r["crossings"] >= 3 for r in rows)  # reflex wedge hit
    assert any(r["inside"] for r in rows)
    assert any(not r["inside"] for r in rows)
