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
