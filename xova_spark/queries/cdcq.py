"""CDC / incremental-maintenance pack.

The reference maintains its output MS by full rewrite (xova writes a
fresh averaged MS per run — xova/apps/xova/app.py:107-116); a 100 TB
pipeline cannot afford that, so this pack adds the change-data-capture
primitives that make maintenance incremental: snapshot diffing (derive
the changelog two table versions imply), merge/upsert (apply a
changelog to a base snapshot), and changelog compaction (collapse a
multi-version key history to its latest state).

Exactness discipline: the "price" payload is carried as integer cents
(``floor(x * 100 + 0.5)`` — identical in both engines, see ROADMAP
invariants); all counts are BIGINT; update deltas are integer adds.

The two snapshots are derived deterministically from ``orders``:

- OLD = orders with o_orderdate < 1997-07-01
- NEW = orders with o_orderdate < 1998-07-01 (the later year's orders
  are the INSERTs), minus keys with o_orderkey % 97 == 3 (DELETEs),
  with price_cents + 500 for o_orderkey % 10 == 0 (UPDATEs).

``cdc_merge_upsert`` is the strong gate: Spark derives the changelog
and REPLAYS it onto OLD; the DuckDB oracle computes NEW directly.
Hash equality proves merge-apply ≡ direct recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.session import load_tables

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


_OLD_CUT = "1997-07-01"
_NEW_CUT = "1998-07-01"

# Shared CTE text (DuckDB): the two snapshot definitions.
_SNAP_CTES = f"""
    old_snap AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM orders WHERE o_orderdate < TIMESTAMP '{_OLD_CUT}'
    ),
    new_snap AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   + CASE WHEN o_orderkey % 10 = 0 THEN 500 ELSE 0 END
                   AS price_cents
        FROM orders
        WHERE o_orderdate < TIMESTAMP '{_NEW_CUT}'
          AND o_orderkey % 97 <> 3
    )
"""


def _snapshots(spark, sf_dir):
    """The Spark twins of the old/new snapshot derivations."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    old = o.where(
        F.col("o_orderdate") < F.lit(_OLD_CUT).cast("timestamp")
    ).select("o_orderkey", cents.alias("price_cents"))
    new = (
        o.where(
            (F.col("o_orderdate") < F.lit(_NEW_CUT).cast("timestamp"))
            & (F.col("o_orderkey") % 97 != 3)
        ).select(
            "o_orderkey",
            (
                cents
                + F.when(F.col("o_orderkey") % 10 == 0, 500).otherwise(0)
            ).alias("price_cents"),
        )
    )
    return old, new


def _diff(old, new):
    """Changelog from two snapshots: one shuffled full-outer join on
    the key (both sides are fact-scale — shuffling both is the correct
    100 TB plan; AQE picks the strategy), then a row classifier."""
    o = old.select(
        F.col("o_orderkey").alias("k_old"),
        F.col("price_cents").alias("old_price_cents"),
    )
    n = new.select(
        F.col("o_orderkey").alias("k_new"),
        F.col("price_cents").alias("new_price_cents"),
    )
    j = o.join(n, o.k_old == n.k_new, "full_outer")
    op = (
        F.when(F.col("k_old").isNull(), F.lit("I"))
        .when(F.col("k_new").isNull(), F.lit("D"))
        .when(F.col("old_price_cents") != F.col("new_price_cents"), F.lit("U"))
    )
    return (
        j.select(
            F.coalesce("k_old", "k_new").alias("o_orderkey"),
            op.alias("op"),
            "old_price_cents",
            "new_price_cents",
        )
        .where(F.col("op").isNotNull())
    )


@q(
    "cdc_snapshot_diff",
    f"""
    WITH {_SNAP_CTES}
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'I'
                WHEN n.o_orderkey IS NULL THEN 'D'
                ELSE 'U' END AS op,
           o.price_cents AS old_price_cents,
           n.price_cents AS new_price_cents
    FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.price_cents <> n.price_cents
    """,
)
def cdc_snapshot_diff(spark, sf_dir):
    """Snapshot diff → changelog: classify every key of two table
    versions as INSERT / UPDATE / DELETE (unchanged rows drop out).
    This is the capture side of CDC — the changelog that downstream
    incremental maintenance replays."""
    old, new = _snapshots(spark, sf_dir)
    return _diff(old, new)


@q(
    "cdc_merge_upsert",
    f"""
    WITH {_SNAP_CTES}
    SELECT o_orderkey, price_cents FROM new_snap
    """,
)
def cdc_merge_upsert(spark, sf_dir):
    """MERGE / upsert: replay the changelog onto the OLD snapshot —
    deletes drop the base row, updates/inserts take the changelog
    payload, untouched base rows pass through. The oracle computes the
    NEW snapshot DIRECTLY, so the hash gate proves
    apply(old, diff(old, new)) ≡ new — the merge operator's defining
    law, checked end-to-end on real data.

    Plan: the changelog join keys on the same column as the diff join,
    so the merge is one more hash-partitioned join on o_orderkey; no
    broadcast (both sides fact-scale)."""
    old, new = _snapshots(spark, sf_dir)
    chg = _diff(old, new).select(
        F.col("o_orderkey").alias("k_chg"), "op", "new_price_cents"
    )
    j = old.join(chg, old.o_orderkey == chg.k_chg, "full_outer")
    return (
        j.where((F.col("op").isNull()) | (F.col("op") != "D"))
        .select(
            F.coalesce("o_orderkey", "k_chg").alias("o_orderkey"),
            F.when(F.col("op").isNotNull(), F.col("new_price_cents"))
            .otherwise(F.col("price_cents"))
            .alias("price_cents"),
        )
    )


@q(
    "cdc_changelog_compact",
    """
    WITH v AS (
        SELECT user_id, event_type, event_id, value, ts,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn,
               count(*) OVER (
                   PARTITION BY user_id, event_type
               ) AS n_versions
        FROM events
    )
    SELECT user_id, event_type,
           CAST(event_id AS BIGINT) AS last_event_id,
           round(value, 4) AS last_value,
           CAST(n_versions AS BIGINT) AS n_versions
    FROM v WHERE rn = 1
    """,
)
def cdc_changelog_compact(spark, sf_dir):
    """Changelog compaction: collapse each key's multi-version history
    (events as a changelog keyed on (user_id, event_type)) to its
    latest state + version count. Spark side uses max_by over the
    (ts, event_id) struct — a map-side-combinable aggregation, NOT a
    window sort: at 100 TB the compactor is one partial-aggregated
    shuffle with no per-partition total ordering. The oracle takes the
    row_number formulation; hash equality shows the two are the same
    operator."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max_by("event_id", ordk).cast("long").alias("last_event_id"),
            F.round(F.max_by("value", ordk), 4).alias("last_value"),
            F.count("*").cast("long").alias("n_versions"),
        )
    )


@q(
    "cdc_incremental_rollup",
    f"""
    WITH {_SNAP_CTES}
    SELECT o_orderkey % 64 AS grp,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(price_cents) AS BIGINT) AS total_cents
    FROM new_snap GROUP BY o_orderkey % 64
    """,
)
def cdc_incremental_rollup(spark, sf_dir):
    """Incremental materialized-aggregate maintenance (the warehouse
    IVM pattern): a per-group rollup of the OLD snapshot is brought to
    the NEW state by applying only the changelog's DELTAS — INSERT adds
    (+1, +new), DELETE adds (-1, -old), UPDATE adds (0, new-old) —
    never rescanning the base. The DuckDB oracle computes the NEW
    rollup directly; hash equality proves delta-apply ≡ recompute
    (integer cents, so the adds are exact).

    Scale shape: base rollup = one keyed shuffle over OLD; the delta
    table = one keyed shuffle over the (changelog-sized, i.e. small)
    diff; the final patch join runs at GROUP grain — at 100 TB the
    whole maintenance cost is O(changelog + groups), which is the
    point. Groups whose count reaches zero drop out, matching the
    direct recompute."""
    old, new = _snapshots(spark, sf_dir)
    grp = (F.col("o_orderkey") % 64).alias("grp")
    base = old.groupBy(grp).agg(
        F.count("*").cast("long").alias("n0"),
        F.sum("price_cents").cast("long").alias("s0"),
    )
    delta = (
        _diff(old, new)
        .select(
            grp,
            F.when(F.col("op") == "I", F.lit(1))
            .when(F.col("op") == "D", F.lit(-1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dn"),
            (
                F.coalesce("new_price_cents", F.lit(0))
                - F.coalesce("old_price_cents", F.lit(0))
            )
            .cast("long")
            .alias("ds"),
        )
        .groupBy("grp")
        .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
    )
    return (
        base.join(delta, "grp", "full_outer")
        .select(
            "grp",
            (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("long")
            .alias("n_orders"),
            (F.coalesce("s0", F.lit(0)) + F.coalesce("ds", F.lit(0)))
            .cast("long")
            .alias("total_cents"),
        )
        .where(F.col("n_orders") > 0)
    )


# --- Incremental JOIN-VIEW maintenance (round 6) -----------------------
#
# cdc_incremental_rollup maintains a single-table aggregate; production
# pipelines maintain JOIN views, where deltas arrive on BOTH inputs and
# the correct update is the bilinear product rule
#
#   delta(O JOIN C) = dO JOIN C_old  +  O_old JOIN dC  +  dO JOIN dC
#
# with signed multiplicities (insert = +1, delete = -1, update = -old
# +new). The customer side gets its own deterministic changelog:
# c_custkey % 89 == 7 rows are DELETEd, c_custkey % 13 == 0 rows move
# to the 'MOVED' segment (an UPDATE that shifts order mass between
# groups — the case a naive "re-aggregate changed orders only" scheme
# silently gets wrong).
_CUST_DEL_MOD, _CUST_DEL_RES = 89, 7
_CUST_MOVE_MOD = 13
# Order-side KEY churn (round 7, ADVICE r6): o_orderkey % 41 == 0
# orders are reassigned to custkey+1 in the new snapshot — an UPDATE
# that moves an order between join keys with its price unchanged. The
# delta builder must book the -1 row at the old key and the +1 row at
# the new one; a scheme that keys both rows on one coalesced custkey
# (or treats equal-price rows as unchanged) fails this fixture.
_OWNER_MOVE_MOD = 41

_JV_CTES = f"""
    o_old AS (
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM orders WHERE o_orderdate < TIMESTAMP '{_OLD_CUT}'
    ),
    o_new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % {_OWNER_MOVE_MOD} = 0
                    THEN o_custkey + 1 ELSE o_custkey END AS o_custkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   + CASE WHEN o_orderkey % 10 = 0 THEN 500 ELSE 0 END
                   AS price_cents
        FROM orders
        WHERE o_orderdate < TIMESTAMP '{_NEW_CUT}'
          AND o_orderkey % 97 <> 3
    ),
    c_new AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % {_CUST_MOVE_MOD} = 0 THEN 'MOVED'
                    ELSE c_mktsegment END AS seg
        FROM customer
        WHERE c_custkey % {_CUST_DEL_MOD} <> {_CUST_DEL_RES}
    )
"""


@q(
    "cdc_join_view_maintenance",
    f"""
    WITH {_JV_CTES}
    SELECT c.seg AS mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o.price_cents) AS BIGINT) AS total_cents
    FROM o_new o JOIN c_new c ON c.c_custkey = o.o_custkey
    GROUP BY c.seg
    """,
)
def cdc_join_view_maintenance(spark, sf_dir):
    """INCREMENTAL VIEW MAINTENANCE for a JOIN view — the strongest
    gate in the CDC pack: the view is per-segment (count, sum cents)
    over orders JOIN customer, deltas arrive on BOTH sides, and Spark
    maintains it with the bilinear product rule (dO x C_old +
    O_old x dC + dO x dC, all with signed multiplicities) applied to
    the OLD materialized state. The DuckDB oracle computes the NEW
    view directly from the new snapshots — hash equality proves
    delta-apply == recompute, including the subtle cross terms: an
    order whose price changed AND whose customer changed segment in
    the same batch is corrected exactly once (the dO x dC term exists
    precisely to cancel the double count the two single-side terms
    introduce), and an order REASSIGNED to a different custkey (the
    _OWNER_MOVE_MOD churn, price unchanged) books its -1 at the old
    key and its +1 at the new key — the fixture covers key churn
    explicitly, so the general rule is what the hash proves (ADVICE
    r6: a coalesced-key delta passed only because no key ever moved).

    Scale shape: every term is a keyed equi-join at CHANGE grain —
    dO is |changed orders|, dC is |changed customers|, and only
    O_old x dC touches base data, keyed on the changed customers
    (semi-join-sized, shuffles only matching orders under AQE); the
    final apply is a group-grain union + groupBy. Nothing rescans the
    full join — the whole point of IVM at 100 TB."""
    o = load_tables(spark, sf_dir, ("orders", "customer"))
    cust = o["customer"]
    orders = o["orders"]
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    o_old = orders.where(
        F.col("o_orderdate") < F.lit(_OLD_CUT).cast("timestamp")
    ).select("o_orderkey", "o_custkey", cents.alias("price_cents"))
    # (the o_new/c_new snapshot frames are no longer materialized
    # separately — the delta builds below fold both sides' predicates
    # into single scans; the oracle SQL keeps its snapshot CTEs)
    c_old = cust.select("c_custkey", F.col("c_mktsegment").alias("seg"))

    # Signed order delta: -old row and/or +new row per changed key.
    # o_orderkey is unique, and o_old/o_new are per-row predicates over
    # the SAME orders table — the old FULL OUTER self-join (two scans,
    # two sort exchanges) is therefore a single map-only scan: each row
    # carries its old-side columns when the old predicate holds and its
    # new-side columns when the new predicate holds, rows failing both
    # are dropped. Row-for-row identical to the join output.
    old_pred = F.col("o_orderdate") < F.lit(_OLD_CUT).cast("timestamp")
    new_pred = (
        F.col("o_orderdate") < F.lit(_NEW_CUT).cast("timestamp")
    ) & (F.col("o_orderkey") % 97 != 3)
    new_ck = F.when(
        F.col("o_orderkey") % _OWNER_MOVE_MOD == 0, F.col("o_custkey") + 1
    ).otherwise(F.col("o_custkey"))
    new_price = cents + F.when(
        F.col("o_orderkey") % 10 == 0, 500
    ).otherwise(0)
    oj = orders.where(old_pred | new_pred).select(
        F.col("o_orderkey").alias("k"),
        F.when(old_pred, F.col("o_custkey")).alias("ck"),
        F.when(old_pred, cents).alias("p_old"),
        F.when(new_pred, new_ck).alias("ck_new"),
        F.when(new_pred, new_price).alias("p_new"),
    )
    # A row is CHANGED when it appears/disappears, its price moved, or
    # its CUSTKEY moved (ADVICE r6: a custkey change with equal price
    # was silently dropped, and both signed rows were attributed to one
    # coalesced key). The -1 row books against the OLD custkey and the
    # +1 row against the NEW one — the general bilinear rule; a
    # same-key price change still yields the same -1/+1 pair as before.
    d_o = oj.where(
        F.col("ck").isNull()
        | F.col("ck_new").isNull()
        | (F.col("p_old") != F.col("p_new"))
        | (F.col("ck") != F.col("ck_new"))
    ).select(
        F.explode(
            F.filter(
                F.array(
                    F.when(
                        F.col("ck").isNotNull(),
                        F.struct(
                            F.col("ck").alias("c_custkey"),
                            F.lit(-1).alias("sign"),
                            F.col("p_old").alias("price"),
                        ),
                    ),
                    F.when(
                        F.col("ck_new").isNotNull(),
                        F.struct(
                            F.col("ck_new").alias("c_custkey"),
                            F.lit(1).alias("sign"),
                            F.col("p_new").alias("price"),
                        ),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("d"),
    ).select(
        F.col("d.c_custkey").alias("c_custkey"),
        F.col("d.sign").alias("so"),
        F.col("d.price").alias("price"),
    )

    # Signed customer delta: -old segment and/or +new segment per key.
    # Same single-scan collapse as oj: c_custkey is unique and c_new is
    # a predicate view of the same customer table (a strict subset of
    # c_old's keys, so the old FULL OUTER could never produce a
    # null-k row — the coalesce/isNotNull consumers below are kept
    # verbatim).
    keep_pred = F.col("c_custkey") % _CUST_DEL_MOD != _CUST_DEL_RES
    moved_seg = F.when(
        F.col("c_custkey") % _CUST_MOVE_MOD == 0, F.lit("MOVED")
    ).otherwise(F.col("c_mktsegment"))
    cj = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg_old"),
        F.when(keep_pred, F.col("c_custkey")).alias("k2"),
        F.when(keep_pred, moved_seg).alias("seg_new"),
    )
    d_c = cj.where(
        F.col("k2").isNull() | (F.col("seg_old") != F.col("seg_new"))
    ).select(
        F.coalesce("k", "k2").alias("c_custkey"),
        F.explode(
            F.filter(
                F.array(
                    F.when(
                        F.col("k").isNotNull(),
                        F.struct(
                            F.lit(-1).alias("sign"),
                            F.col("seg_old").alias("seg"),
                        ),
                    ),
                    F.when(
                        F.col("k2").isNotNull(),
                        F.struct(
                            F.lit(1).alias("sign"),
                            F.col("seg_new").alias("seg"),
                        ),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("d"),
    ).select("c_custkey", F.col("d.sign").alias("sc"), F.col("d.seg").alias("seg"))

    # The materialized OLD view.
    v_old = (
        o_old.join(c_old, o_old.o_custkey == c_old.c_custkey)
        .groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("dn"),
            F.sum("price_cents").cast("long").alias("ds"),
        )
    )
    # Product-rule terms, each reduced to (seg, dn, ds) contributions.
    t1 = (
        d_o.join(c_old, "c_custkey")
        .groupBy("seg")
        .agg(
            F.sum("so").cast("long").alias("dn"),
            F.sum(F.col("so") * F.col("price")).cast("long").alias("ds"),
        )
    )
    t2 = (
        o_old.join(d_c, o_old.o_custkey == d_c.c_custkey)
        .groupBy("seg")
        .agg(
            F.sum("sc").cast("long").alias("dn"),
            F.sum(F.col("sc") * F.col("price_cents")).cast("long").alias("ds"),
        )
    )
    t3 = (
        d_o.join(d_c, "c_custkey")
        .groupBy("seg")
        .agg(
            F.sum(F.col("so") * F.col("sc")).cast("long").alias("dn"),
            F.sum(F.col("so") * F.col("sc") * F.col("price"))
            .cast("long")
            .alias("ds"),
        )
    )
    return (
        v_old.unionAll(t1).unionAll(t2).unionAll(t3)
        .groupBy(F.col("seg").alias("mktsegment"))
        .agg(
            F.sum("dn").cast("long").alias("n_orders"),
            F.sum("ds").cast("long").alias("total_cents"),
        )
        .where(F.col("n_orders") > 0)
    )


@q(
    "cdc_deletion_vector_audit",
    """
    WITH files AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey % 97 = 3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_deleted
      FROM orders GROUP BY 1
    )
    SELECT CAST(day AS BIGINT) AS day, n_rows, n_deleted,
           CAST(n_rows - n_deleted AS BIGINT) AS live_rows,
           CAST(n_deleted * 1000 // n_rows AS BIGINT) AS deleted_permille,
           n_deleted * 1000 // n_rows >= 100 AS rewrite_due,
           CAST(CASE WHEN n_deleted * 1000 // n_rows >= 100
                     THEN n_deleted ELSE 0 END AS BIGINT)
               AS scan_rows_saved_by_rewrite
    FROM files
    ORDER BY day
    """,
)
def cdc_deletion_vector_audit(spark, sf_dir):
    """DELETION-VECTOR (merge-on-read) REWRITE AUDIT — the lakehouse
    maintenance readout for tables that take deletes as bitmaps instead
    of rewrites (Delta deletion vectors / Iceberg position deletes):
    per file, how much of it is dead, and is the dead fraction past the
    rewrite threshold where compacting beats carrying the vector? Every
    read of a DV'd file still scans ALL its rows and filters — so the
    per-file `scan_rows_saved_by_rewrite` is exactly its deleted count
    once the 10% threshold (the Delta default neighborhood) is crossed.

    Fixture: daily order batches stand in for files (the
    layout_compaction_plan convention) and the CDC pack's deterministic
    delete predicate (o_orderkey % 97 = 3) stands in for the accumulated
    deletion vector. Pure integer arithmetic at MANIFEST grain (~2400
    day-files at any data scale — the audit never touches data rows
    except through ONE partial-aggregated count); nonnegative permille
    divisions, so floor and truncate agree.

    Scale shape: one map-side-combined keyed aggregate to day grain,
    then bounded per-row arithmetic. The decision table a nightly
    OPTIMIZE job consumes at 100 TB."""
    (orders,) = (
        load_tables(spark, sf_dir, ("orders",))[n] for n in ("orders",)
    )
    files = orders.groupBy(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey") % 97 == 3, 1).otherwise(0))
        .cast("long")
        .alias("n_deleted"),
    )
    dp = F.expr("n_deleted * 1000 div n_rows")
    return files.select(
        F.col("day").cast("long").alias("day"),
        "n_rows",
        "n_deleted",
        (F.col("n_rows") - F.col("n_deleted")).cast("long").alias("live_rows"),
        dp.cast("long").alias("deleted_permille"),
        (dp >= 100).alias("rewrite_due"),
        F.when(dp >= 100, F.col("n_deleted"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("scan_rows_saved_by_rewrite"),
    ).orderBy("day")
