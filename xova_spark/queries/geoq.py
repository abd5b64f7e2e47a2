"""Spatial pack — cell-bucketed radius join and cell-bounded kNN.

The geohash/S2 pattern every spatial engine runs at scale: bucket
points into fixed cells sized to the query radius, equi-join each
point's cell against its 3x3 neighborhood, verify candidates with the
exact distance — the spatial twin of the LSH band join (dedup.py). A
naive radius join is all-pairs (corpus-quadratic); the cell join's
cost is sum of per-neighborhood products, i.e. linear in points times
local density.

Coordinates are deterministic integer grid positions derived from
customer keys (the harness ships no geo columns; key-derived columns
are the established idiom — see erq.py, graphq.py). Distances are
exact integer d^2 — no trig, so both engines hash identically (a
haversine twin would ride on libm-vs-JVM last-ulp drift, the latent
divergence class ADVICE r4 flags).

Cell size == radius guarantees completeness: two points within R can
sit at most one cell apart per axis, so the 3x3 neighborhood covers
every qualifying pair (pinned against brute force in
tests/test_geoq.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xova_spark.session import load_tables

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


_GRID = 10_000  # coordinate extent per axis
_RADIUS = 250  # query radius; also the cell edge
_KNN_K = 3

# x,y derive from the key via coprime multipliers (Knuth/Weyl-style
# scatter) — exact int64 arithmetic in both engines.
_PTS_SQL = f"""
      SELECT c_custkey AS id,
             (c_custkey * 2654435761) % {_GRID} AS x,
             (c_custkey * 40503 + 7919) % {_GRID} AS y
      FROM customer
"""


def _pts(spark, sf_dir):
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    return cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 2654435761) % _GRID).alias("x"),
        ((F.col("c_custkey") * 40503 + 7919) % _GRID).alias("y"),
    )


@q(
    "geo_radius_pairs",
    f"""
    WITH pts AS ({_PTS_SQL}),
    cells AS (
      SELECT id, x, y, x // {_RADIUS} AS cx, y // {_RADIUS} AS cy FROM pts
    ), probes AS (
      SELECT id, x, y, cx + dx AS cx, cy + dy AS cy
      FROM cells
      CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
    FROM probes a JOIN cells b ON b.cx = a.cx AND b.cy = a.cy
    WHERE a.id < b.id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {_RADIUS * _RADIUS}
    """,
)
def geo_radius_pairs(spark, sf_dir):
    """RADIUS JOIN: all point pairs within distance R, via the cell
    bucket + 3x3 neighbor-probe equi-join. One side explodes its 9
    probe cells (constant 9x fan-out), the join keys on (cx, cy) — a
    plain shuffled equi-join AQE can also skew-split — and only
    neighborhood-local candidates pay the exact d^2 check. id_a < id_b
    emits each pair once (the probe side covers both relative offsets,
    so ordering by id loses nothing — completeness pinned against
    brute force)."""
    pts = _pts(spark, sf_dir)
    cells = pts.withColumn("cx", F.expr(f"x div {_RADIUS}")).withColumn(
        "cy", F.expr(f"y div {_RADIUS}")
    )
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        (F.expr("id div 3") - 1).cast("long").alias("dy"),
    )
    probes = cells.crossJoin(F.broadcast(offsets)).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    a, b = probes.alias("a"), cells.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("a.id") < F.col("b.id")) & (d2 <= _RADIUS * _RADIUS))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            d2.cast("long").alias("d2"),
        )
    )


@q(
    "geo_knn_cell",
    f"""
    WITH pts AS ({_PTS_SQL}),
    cells AS (
      SELECT id, x, y, x // {_RADIUS} AS cx, y // {_RADIUS} AS cy FROM pts
    ), probes AS (
      SELECT id, x, y, cx + dx AS cx, cy + dy AS cy
      FROM cells
      CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
    ), cand AS (
      SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM probes a JOIN cells b ON b.cx = a.cx AND b.cy = a.cy
      WHERE a.id <> b.id
    ), ranked AS (
      SELECT id_a, id_b, d2,
             row_number() OVER (PARTITION BY id_a
                                ORDER BY d2, id_b) AS rnk
      FROM cand
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(rnk AS BIGINT) AS rnk,
           CAST(id_b AS BIGINT) AS id_b, CAST(d2 AS BIGINT) AS d2
    FROM ranked WHERE rnk <= {_KNN_K}
    """,
)
def geo_knn_cell(spark, sf_dir):
    """CELL-BOUNDED kNN: each point's {_KNN_K} nearest neighbors among
    its 3x3 cell neighborhood — the candidate-generation stage of every
    large-scale spatial kNN (a point whose true k-th neighbor lies
    beyond one ring needs an expanding search; within-ring results are
    exact, the brute-force subset law is pinned in test). The rank is a
    window PARTITIONED BY the query point — millions of tiny independent
    orderings, never a global sort. Ties break on (d2, id_b) so both
    engines rank identically."""
    pts = _pts(spark, sf_dir)
    cells = pts.withColumn("cx", F.expr(f"x div {_RADIUS}")).withColumn(
        "cy", F.expr(f"y div {_RADIUS}")
    )
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        (F.expr("id div 3") - 1).cast("long").alias("dy"),
    )
    probes = cells.crossJoin(F.broadcast(offsets)).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    a, b = probes.alias("a"), cells.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    cand = (
        a.join(b, ["cx", "cy"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            d2.alias("d2"),
        )
    )
    w = Window.partitionBy("id_a").orderBy("d2", "id_b")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_K)
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("rnk").cast("long").alias("rnk"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("d2").cast("long").alias("d2"),
        )
    )


# Operating envelope for the fixed-cell scheme (VERDICT r5 item 8):
# the radius join's candidate volume is sum over points of their 3x3
# neighborhood population — ~9 * density * N when mass is spread, but
# QUADRATIC in the densest cell (sum |cell|^2 over its self-pairs). The
# guard flags any cell above this population before the join is run;
# above it, the mitigation is a finer cell grid (R/2 cells + 5x5 probe
# rings preserve completeness) or density-aware splitting — outside
# this pack's fixture envelope (sf0.1: ~9 pts/cell; sf1 bench tier:
# ~94), both measured in tests/test_geoq.py and SCALE.md.
CELL_MAX_POINTS = 128


def cell_density_guard(pts):
    """Per-cell density audit + exact candidate-volume accounting for
    the radius join, as a 1-row frame. Takes the points frame directly
    so tests can feed synthetic dense clusters through the production
    logic (red path: an injected hot cell must flip within_envelope).

    candidate_rows is the EXACT number of (probe, point) rows the
    geo_radius_pairs join will evaluate before the distance filter —
    computed from the per-cell histogram alone (sum over cell pairs at
    Chebyshev distance <= 1 of n_a * n_b), so the guard costs one
    cell-grain aggregate, never the join itself."""
    cells = pts.select(
        F.expr(f"x div {_RADIUS}").alias("cx"),
        F.expr(f"y div {_RADIUS}").alias("cy"),
    )
    h = cells.groupBy("cx", "cy").agg(F.count("*").alias("n"))
    stats = h.agg(
        F.sum("n").cast("long").alias("n_points"),
        F.count("*").cast("long").alias("n_cells"),
        F.max("n").cast("long").alias("max_cell_n"),
        F.sum((F.col("n") > CELL_MAX_POINTS).cast("long"))
        .cast("long")
        .alias("n_overdense"),
    )
    # Chebyshev-<=1 cell pairs via the same 9-offset EQUI-join the
    # radius join itself uses (keyed shuffle; an abs-diff theta join
    # would plan as a nested loop, wrong once the grid is large).
    spark = pts.sparkSession
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        (F.expr("id div 3") - 1).cast("long").alias("dy"),
    )
    probes = h.crossJoin(F.broadcast(offsets)).select(
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
        F.col("n").alias("na"),
    )
    vol = probes.join(h, ["cx", "cy"]).agg(
        F.sum(F.col("na") * F.col("n")).cast("long").alias("candidate_rows")
    )
    return stats.crossJoin(F.broadcast(vol)).select(
        "n_points",
        "n_cells",
        "max_cell_n",
        "n_overdense",
        "candidate_rows",
        (F.col("max_cell_n") <= CELL_MAX_POINTS).alias("within_envelope"),
        F.lit(CELL_MAX_POINTS).cast("long").alias("envelope_max_cell"),
    )


@q(
    "geo_cell_density_guard",
    f"""
    WITH pts AS ({_PTS_SQL}),
    h AS (
      SELECT x // {_RADIUS} AS cx, y // {_RADIUS} AS cy, count(*) AS n
      FROM pts GROUP BY 1, 2
    ), stats AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_points,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(max(n) AS BIGINT) AS max_cell_n,
             CAST(sum(CASE WHEN n > {CELL_MAX_POINTS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_overdense
      FROM h
    ), vol AS (
      SELECT CAST(sum(a.n * b.n) AS BIGINT) AS candidate_rows
      FROM h a JOIN h b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
    )
    SELECT s.n_points, s.n_cells, s.max_cell_n, s.n_overdense,
           v.candidate_rows,
           s.max_cell_n <= {CELL_MAX_POINTS} AS within_envelope,
           CAST({CELL_MAX_POINTS} AS BIGINT) AS envelope_max_cell
    FROM stats s CROSS JOIN vol v
    """,
)
def geo_cell_density_guard(spark, sf_dir):
    """DENSITY GATE for the cell-bucketed spatial joins (VERDICT r5
    item 8): a cell-grain pre-flight that prices the radius join
    exactly — candidate_rows is the precise pre-filter row count the
    (probe x cell) join will produce, derived from the histogram alone
    — and flags cells whose population exceeds ``CELL_MAX_POINTS``
    (where per-cell self-candidates, |cell|^2, dominate and the fixed
    grid needs splitting). Runs before geo_radius_pairs at scale the
    way a cost-based optimizer consults statistics: one keyed
    aggregate over N points plus a cell-grain self-join (cells are
    ~N/density rows, vastly smaller than the data). The identity
    candidate_rows == actual join volume and the red path (injected
    hot cell flips within_envelope) are pinned in tests/test_geoq.py;
    the fixture envelope is recorded in SCALE.md."""
    return cell_density_guard(_pts(spark, sf_dir))


def radius_pairs_at(spark, pts, edge, ring):
    """Radius join at an arbitrary cell edge: all pairs within
    ``_RADIUS``, generated from cells of size ``edge`` probed over a
    (2*ring+1)^2 neighborhood. Completeness: with _RADIUS == ring*edge
    exactly, |x1-x2| <= _RADIUS implies the cell indices differ by at
    most ``ring`` per axis (floor(x1/e) <= floor(x2/e) + ring), so the
    ring covers every qualifying pair at ANY edge that divides the
    radius — the identity geo_radius_pairs_fine's law test pins.

    Finer cells trade probe fan-out ((2r+1)^2 per point) against
    per-cell candidate mass (sum n_a*n_b over adjacent cells): at high
    density the quadratic term dominates and halving the edge wins —
    the split the density guard's envelope triggers."""
    assert edge * ring == _RADIUS, "edge must divide the radius exactly"
    cells = pts.withColumn("cx", F.expr(f"x div {edge}")).withColumn(
        "cy", F.expr(f"y div {edge}")
    )
    width = 2 * ring + 1
    offsets = spark.range(width * width).select(
        (F.col("id") % width - ring).cast("long").alias("dx"),
        (F.expr(f"id div {width}") - ring).cast("long").alias("dy"),
    )
    probes = cells.crossJoin(F.broadcast(offsets)).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    a, b = probes.alias("a"), cells.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("a.id") < F.col("b.id")) & (d2 <= _RADIUS * _RADIUS))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            d2.cast("long").alias("d2"),
        )
    )


# geo_radius_pairs_fine / _adaptive return the SAME pair set as
# geo_radius_pairs, so all three share one oracle.
_RADIUS_PAIRS_SQL = f"""
    WITH pts AS ({_PTS_SQL}),
    cells AS (
      SELECT id, x, y, x // {_RADIUS} AS cx, y // {_RADIUS} AS cy FROM pts
    ), probes AS (
      SELECT id, x, y, cx + dx AS cx, cy + dy AS cy
      FROM cells
      CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
    FROM probes a JOIN cells b ON b.cx = a.cx AND b.cy = a.cy
    WHERE a.id < b.id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {_RADIUS * _RADIUS}
"""


@q("geo_radius_pairs_fine", _RADIUS_PAIRS_SQL)
def geo_radius_pairs_fine(spark, sf_dir):
    """The SPLIT grid: the same radius join at half the cell edge with
    a 5x5 probe ring — the mitigation the density guard's envelope
    prescribes, as a first-class entry. Output is IDENTICAL to
    geo_radius_pairs (completeness holds at any edge dividing R; the
    oracle is literally the coarse SQL), but candidate volume scales
    with sum n_a*n_b over QUARTER-size cells — on dense data the
    quadratic per-cell term drops ~4x against a fixed 25/9 probe
    overhead, the trade measured in tests/test_geoq.py."""
    return radius_pairs_at(spark, _pts(spark, sf_dir), _RADIUS // 2, 2)


def choose_edge(max_cell_n):
    """The density dispatch rule: stay on the coarse R-edge grid while
    the densest cell is inside the envelope; split to R/2 (5x5 ring)
    above it. Pure function so the law test can pin the rule without
    running a join."""
    if max_cell_n <= CELL_MAX_POINTS:
        return _RADIUS, 1
    return _RADIUS // 2, 2


def radius_pairs_adaptive(spark, pts):
    """Density-dispatched radius join over an arbitrary points frame:
    consult the cell histogram (ONE cell-grain aggregate collapsing to
    a single driver scalar — the optimizer-statistics pattern, same
    class as AQE consulting runtime stats), then run the join at the
    edge ``choose_edge`` picks."""
    maxn = (
        pts.select(
            F.expr(f"x div {_RADIUS}").alias("cx"),
            F.expr(f"y div {_RADIUS}").alias("cy"),
        )
        .groupBy("cx", "cy")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    edge, ring = choose_edge(maxn or 0)
    return radius_pairs_at(spark, pts, edge, ring)


@q("geo_radius_pairs_adaptive", _RADIUS_PAIRS_SQL)
def geo_radius_pairs_adaptive(spark, sf_dir):
    """AUTO-SPLIT radius join (VERDICT r5 item 8, the full form): the
    density guard's verdict now DRIVES the plan instead of only
    flagging it — under the envelope the coarse R-grid runs (3x3
    probes, minimal fan-out); above it the R/2 split grid runs (5x5
    ring, quartered per-cell quadratic mass). Either way the output is
    the exact pair set (shared oracle with geo_radius_pairs); the
    dispatch rule is the pure ``choose_edge`` and the dense path is
    exercised by the law test's injected hot cluster, where the fixture
    tier itself stays under the envelope."""
    return radius_pairs_adaptive(spark, _pts(spark, sf_dir))


# Point-in-polygon (round 7): a fixed NON-CONVEX polygon on the same
# integer grid; every point classified by the even-odd ray cast. The
# crossing test is division-free exact integer arithmetic — for a +x
# ray from (px, py), edge (x1,y1)-(x2,y2) crosses iff the edge spans
# py strictly in y AND the signed numerator
#     ((x1 - px) * dy + (x2 - x1) * (py - y1)) * sign(dy) > 0
# (the intersection-x minus px, cleared of the 1/dy division) — so both
# engines hash identically, the same no-libm discipline as d^2 above.
_POLY: tuple[tuple[int, int], ...] = (
    (2000, 2000),
    (8000, 1500),
    (7000, 5000),
    (8500, 8000),
    (5000, 6500),
    (1500, 8000),
    (3000, 4500),
)
_POLY_EDGES = tuple(
    (x1, y1, x2, y2)
    for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1])
)

_PIP_CROSS_SQL = """
          CASE WHEN (e.y1 > p.y) <> (e.y2 > p.y)
                AND ((e.x1 - p.x) * (e.y2 - e.y1)
                     + (e.x2 - e.x1) * (p.y - e.y1))
                    * (CASE WHEN e.y2 > e.y1 THEN 1 ELSE -1 END) > 0
               THEN 1 ELSE 0 END
"""


@q(
    "geo_point_in_polygon",
    f"""
    WITH pts AS ({_PTS_SQL}),
    edges(x1, y1, x2, y2) AS (
      VALUES {", ".join(f"({x1}, {y1}, {x2}, {y2})" for x1, y1, x2, y2 in _POLY_EDGES)}
    ),
    crossed AS (
      SELECT p.id, CAST(sum({_PIP_CROSS_SQL}) AS BIGINT) AS crossings
      FROM pts p CROSS JOIN edges e
      GROUP BY p.id
    )
    SELECT id, crossings, crossings % 2 = 1 AS inside
    FROM crossed
    """,
)
def geo_point_in_polygon(spark, sf_dir):
    """POINT-IN-POLYGON containment (even-odd ray cast) against a fixed
    non-convex polygon — the geofence/region-tag primitive between the
    cell joins (which find NEIGHBORS) and real GIS: every point gets
    its +x-ray edge-crossing count and the inside verdict. Non-convex
    matters: the reflex vertices produce points with crossings=3, so
    the parity rule (not a convex half-plane AND) is what the hash
    proves. The crossing predicate is the division-free integer form —
    no trig, no float slope — so DuckDB and Spark agree bit-exactly.

    Scale shape: ZERO joins on the Spark side — the 7-edge polygon is
    a LITERAL array column and the crossing count is one
    whole-stage-codegen ``aggregate`` HOF over it, i.e. a map-only
    scan (the oracle spells the same arithmetic as a 7-row cross join
    + groupBy). At 100 TB this is scan-bound and embarrassingly
    parallel; a polygon too large for a literal would ride the same
    broadcast-dim pattern as bda's bin params (operators/bda.py:91).
    Reference analogue: xova has no spatial ops; this extends the
    engine the way SURVEY 'beyond the reference' prescribes."""
    edges = F.array(
        *(
            F.struct(
                F.lit(x1).alias("x1"),
                F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"),
                F.lit(y2).alias("y2"),
            )
            for x1, y1, x2, y2 in _POLY_EDGES
        )
    )
    crossings = F.aggregate(
        edges,
        F.lit(0).cast("long"),
        lambda acc, e: acc
        + F.when(
            ((e.y1 > F.col("y")) != (e.y2 > F.col("y")))
            & (
                (
                    (e.x1 - F.col("x")) * (e.y2 - e.y1)
                    + (e.x2 - e.x1) * (F.col("y") - e.y1)
                )
                * F.when(e.y2 > e.y1, 1).otherwise(-1)
                > 0
            ),
            1,
        ).otherwise(0),
    )
    return _pts(spark, sf_dir).select(
        "id",
        crossings.alias("crossings"),
        (crossings % 2 == 1).alias("inside"),
    )


_DBSCAN_MINPTS = 2  # core point: >= MINPTS neighbors within _RADIUS


@q(
    "geo_dbscan_core_points",
    f"""
    WITH pts AS ({_PTS_SQL}),
    cells AS (
      SELECT id, x, y, x // {_RADIUS} AS cx, y // {_RADIUS} AS cy FROM pts
    ), probes AS (
      SELECT id, x, y, cx + dx AS cx, cy + dy AS cy
      FROM cells
      CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
    ), nbr AS (
      SELECT a.id, b.id AS nid
      FROM probes a JOIN cells b ON b.cx = a.cx AND b.cy = a.cy
      WHERE a.id != b.id
        AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {_RADIUS * _RADIUS}
    ), cnts AS (
      SELECT id, CAST(count(*) AS BIGINT) AS n_nbrs FROM nbr GROUP BY id
    ), lab AS (
      SELECT p.id, coalesce(c.n_nbrs, 0) AS n_nbrs,
             coalesce(c.n_nbrs, 0) >= {_DBSCAN_MINPTS} AS is_core
      FROM pts p LEFT JOIN cnts c USING (id)
    ), bord AS (
      SELECT DISTINCT n.id
      FROM nbr n JOIN lab lb ON lb.id = n.nid
      WHERE lb.is_core
    ), cls AS (
      SELECT l.id, l.n_nbrs,
             CASE WHEN l.is_core THEN 'core'
                  WHEN b.id IS NOT NULL THEN 'border'
                  ELSE 'noise' END AS cls
      FROM lab l LEFT JOIN bord b USING (id)
    )
    SELECT cls, CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(n_nbrs) AS BIGINT) AS total_nbrs,
           CAST(max(n_nbrs) AS BIGINT) AS max_nbrs
    FROM cls GROUP BY cls
    """,
)
def geo_dbscan_core_points(spark, sf_dir):
    """DBSCAN density classification — the first (and distributed-
    friendly) phase of the classic clustering algorithm: a CORE point
    has >= minPts neighbors within eps, a BORDER point is a non-core
    point with at least one core neighbor, everything else is NOISE.
    The per-class census (count, neighbor mass, max degree) is the
    density profile a curation pipeline reads before committing to a
    clustering pass; the full cluster extraction is exactly the
    connected components of core points — dedup.cc_components, already
    a shared engine.

    Exactness: neighborhoods come from the same cell-bucketed 3x3
    probe join as geo_radius_pairs (completeness pinned there against
    brute force); distances are exact integer d^2 (no trig, no
    floats); minPts is a literal integer compare, so both engines
    agree bit-exactly.

    Scale shape: the probe join is the pack's standard cell equi-join
    (cost ~ points x local density, never all-pairs); neighbor counts
    are ONE keyed aggregate; border detection is ONE semi-join of the
    directed neighbor list against the core flags (id-keyed, no new
    grain); the census is a 3-row rollup."""
    pts = _pts(spark, sf_dir)
    cells = pts.withColumn("cx", F.expr(f"x div {_RADIUS}")).withColumn(
        "cy", F.expr(f"y div {_RADIUS}")
    )
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("dx"),
        (F.expr("id div 3") - 1).cast("long").alias("dy"),
    )
    probes = cells.crossJoin(F.broadcast(offsets)).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    a, b = probes.alias("a"), cells.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    from pyspark.storagelevel import StorageLevel

    from xova_spark.sharedframes import pin

    # The neighbor relation feeds THREE consumers (counts, the border
    # semi-join, the census): persist it once instead of re-running
    # the probe join per branch — the sf1 bench showed the recompute
    # tripling a join whose candidate volume grows with density^2
    # (30x time at 10x data pre-fix). MEMORY_AND_DISK: pair grain is
    # points x local density — persistable at any scale the join
    # itself is feasible at. pin() releases it at gate exit.
    nbr = pin(
        a.join(b, ["cx", "cy"])
        .filter((F.col("a.id") != F.col("b.id")) & (d2 <= _RADIUS * _RADIUS))
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("nid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cnts = nbr.groupBy("id").agg(F.count("*").cast("long").alias("n_nbrs"))
    lab = pts.select("id").join(cnts, "id", "left").select(
        "id",
        F.coalesce(F.col("n_nbrs"), F.lit(0)).cast("long").alias("n_nbrs"),
        (F.coalesce(F.col("n_nbrs"), F.lit(0)) >= _DBSCAN_MINPTS).alias(
            "is_core"
        ),
    )
    bord = (
        nbr.join(
            lab.filter("is_core").select(F.col("id").alias("nid")), "nid"
        )
        .select("id")
        .distinct()
        .withColumn("has_core_nbr", F.lit(True))
    )
    cls = lab.join(bord, "id", "left").select(
        "n_nbrs",
        F.when(F.col("is_core"), "core")
        .when(F.col("has_core_nbr"), "border")
        .otherwise("noise")
        .alias("cls"),
    )
    return cls.groupBy("cls").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("n_nbrs").cast("long").alias("total_nbrs"),
        F.max("n_nbrs").cast("long").alias("max_nbrs"),
    )
