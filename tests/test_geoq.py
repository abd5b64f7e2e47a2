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
