"""Z-order layout: Morton arithmetic laws + the measurable pruning
property (written row groups cover narrow ranges in BOTH keys)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from xova_spark.functions.zorder import morton2, zorder_layout
from xova_spark.queries.layoutq import layout_zorder_cells
from xova_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def test_morton_matches_pure_python(spark):
    """Column arithmetic == the textbook bit-interleave on a key grid."""

    def py_morton(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    pts = [(x, y) for x in (0, 1, 2, 3, 255, 256, 65535) for y in (0, 1, 5, 65535)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton2(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == py_morton(x, y), (x, y)


def test_zorder_cells_extents_bounded(spark):
    """Every 32x32 Morton cell covers key ranges of extent < 32 in
    both dimensions — the locality law the layout relies on."""
    bad = (
        layout_zorder_cells(spark, SF)
        .where(
            (F.col("pk_max") - F.col("pk_min") >= 32)
            | (F.col("sk_max") - F.col("sk_min") >= 32)
        )
        .count()
    )
    assert bad == 0


@pytest.mark.parametrize("n_files", [4])
def test_zorder_layout_shrinks_rowgroup_extents(spark, tmp_path, n_files):
    """Write lineitem naturally ordered vs Z-laid-out and compare
    parquet footer min/max extents per row group: the Z layout must
    shrink the summed (partkey extent x suppkey extent) area — the
    quantity row-group pruning is proportional to."""
    li = load_tables(spark, SF, ("lineitem",))["lineitem"].select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    def rowgroup_area(path: str) -> float:
        total = 0.0
        n = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                pk = g.column(idx["l_partkey"]).statistics
                sk = g.column(idx["l_suppkey"]).statistics
                total += (pk.max - pk.min + 1) * (sk.max - sk.min + 1)
                n += 1
        assert n > 0
        return total / n

    nat = str(tmp_path / "natural")
    zo = str(tmp_path / "zordered")
    li.repartition(n_files).write.mode("overwrite").parquet(nat)
    zorder_layout(li, "l_partkey", "l_suppkey", n_files).write.mode(
        "overwrite"
    ).parquet(zo)

    # Same data back out.
    assert spark.read.parquet(zo).count() == li.count()

    area_nat = rowgroup_area(nat)
    area_zo = rowgroup_area(zo)
    # Natural order is key-uncorrelated -> each row group spans almost
    # the full key plane; the Z layout should cut the area many-fold.
    assert area_zo < area_nat / 3, (area_zo, area_nat)


def test_wide_keys_do_not_wrap(spark, tmp_path):
    """ADVICE r3: keys past 65535 used to wrap in spread_bits16's mask
    (0 and 65536 interleaved identically). The conditional 16-bit range
    bucket must separate them, and the layout writer must keep every
    row through the bucketed shuffle."""
    from xova_spark.functions.zorder import _bucket16_sql

    df = spark.createDataFrame(
        [(0, 0), (65536, 0), (131072, 0)], "x long, y long"
    ).crossJoin(
        F.broadcast(
            spark.createDataFrame([(131072,)], "xmx long")
        )
    )
    got = [
        r["z"]
        for r in df.select(
            morton2(
                F.expr(_bucket16_sql("x", "xmx", "div")), F.col("y")
            ).alias("z")
        ).collect()
    ]
    # raw morton would give z == 0 for ALL three (mask wrap); bucketed
    # morton keeps them strictly ordered and distinct
    assert got == sorted(got) and len(set(got)) == 3, got

    n = 4096
    wide = spark.range(n).select(
        (F.col("id") * 1000).alias("x"), (F.col("id") * 7 % 50000).alias("y")
    )
    assert zorder_layout(wide, "x", "y", 4).count() == n
