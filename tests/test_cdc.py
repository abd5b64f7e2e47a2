"""CDC pack laws — diff/merge/compact checked independently of the
DuckDB oracle gate (which separately proves merge ≡ direct NEW)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xova_spark.queries.cdcq import (
    _diff,
    _snapshots,
    cdc_changelog_compact,
    cdc_merge_upsert,
)

SF = "/root/testdata/sf0.001"


def test_diff_classifies_every_construction_predicate(spark):
    old, new = _snapshots(spark, SF)
    ops = {
        r["op"]: r["n"]
        for r in _diff(old, new).groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    # Independent expectations straight from the snapshot predicates.
    n_old = old.count()
    n_ins = new.join(old, "o_orderkey", "left_anti").count()
    n_del = old.where(F.col("o_orderkey") % 97 == 3).count()
    n_upd = (
        old.where((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 97 != 3))
        .count()
    )
    assert n_old > 0 and n_ins > 0 and n_del > 0 and n_upd > 0
    assert ops == {"I": n_ins, "D": n_del, "U": n_upd}


def test_merge_apply_equals_direct_new_snapshot(spark):
    """apply(old, diff(old, new)) == new — the merge law, asserted
    set-wise on Spark itself (the oracle gate re-proves it vs DuckDB)."""
    _old, new = _snapshots(spark, SF)
    merged = cdc_merge_upsert(spark, SF)
    assert merged.exceptAll(new).count() == 0
    assert new.exceptAll(merged).count() == 0


def test_compact_matches_window_formulation(spark):
    """The map-side-combinable max_by compactor equals the window
    row_number formulation on the same session."""
    got = cdc_changelog_compact(spark, SF)
    from xova_spark.session import load_tables

    ev = load_tables(spark, SF, ("events",))["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ref = (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).alias("rn"),
            F.count("*")
            .over(Window.partitionBy("user_id", "event_type"))
            .alias("n_versions"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").cast("long").alias("last_event_id"),
            F.round("value", 4).alias("last_value"),
            F.col("n_versions").cast("long").alias("n_versions"),
        )
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
