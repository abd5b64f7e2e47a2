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


def test_join_view_cross_term_is_exercised_and_matches_direct(spark):
    """cdc_join_view_maintenance's hash gate only proves the bilinear
    product rule if the dO x dC cross term is NON-EMPTY on the fixture
    (orders whose price changed while their customer was deleted or
    moved segments in the same batch). Pin that, and pin the entry
    against a direct recomputation in Spark itself (independent of the
    DuckDB gate)."""
    import duckdb

    from xova_spark.queries.cdcq import (
        _CUST_DEL_MOD,
        _CUST_DEL_RES,
        _CUST_MOVE_MOD,
        _NEW_CUT,
        _OLD_CUT,
        _OWNER_MOVE_MOD,
        cdc_join_view_maintenance,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    n_cross = con.execute(f"""
        WITH o_old AS (
          SELECT o_orderkey, o_custkey FROM read_parquet('{sf}/orders.parquet')
          WHERE o_orderdate < TIMESTAMP '{_OLD_CUT}'
        ), o_new AS (
          SELECT o_orderkey, o_custkey FROM read_parquet('{sf}/orders.parquet')
          WHERE o_orderdate < TIMESTAMP '{_NEW_CUT}' AND o_orderkey % 97 <> 3
        ), changed_orders AS (
          SELECT COALESCE(a.o_custkey, b.o_custkey) AS ck
          FROM o_old a FULL JOIN o_new b USING (o_orderkey)
          WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
             OR b.o_orderkey % 10 = 0
        )
        SELECT count(*) FROM changed_orders
        WHERE ck % {_CUST_DEL_MOD} = {_CUST_DEL_RES}
           OR ck % {_CUST_MOVE_MOD} = 0
    """).fetchone()[0]
    assert n_cross > 0, "fixture never hits the dO x dC cross term"

    got = {
        r.mktsegment: (r.n_orders, r.total_cents)
        for r in cdc_join_view_maintenance(spark, sf).collect()
    }
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(f"""
        WITH o_new AS (
          SELECT CASE WHEN o_orderkey % {_OWNER_MOVE_MOD} = 0
                      THEN o_custkey + 1 ELSE o_custkey END AS o_custkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   + CASE WHEN o_orderkey % 10 = 0 THEN 500 ELSE 0 END AS p
          FROM read_parquet('{sf}/orders.parquet')
          WHERE o_orderdate < TIMESTAMP '{_NEW_CUT}' AND o_orderkey % 97 <> 3
        ), c_new AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % {_CUST_MOVE_MOD} = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS seg
          FROM read_parquet('{sf}/customer.parquet')
          WHERE c_custkey % {_CUST_DEL_MOD} <> {_CUST_DEL_RES}
        )
        SELECT seg, CAST(count(*) AS BIGINT), CAST(sum(p) AS BIGINT)
        FROM o_new JOIN c_new ON c_custkey = o_custkey GROUP BY seg
        """).fetchall()
    }
    assert got == want and "MOVED" in got
