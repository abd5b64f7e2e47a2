"""Relational operator pack — SURVEY.md §2 inventory over the harness tables.

Each entry is ``name -> (spark_fn, oracle_sql)`` where ``spark_fn(spark,
sf_dir) -> DataFrame`` and ``oracle_sql`` is the ANSI-SQL twin DuckDB runs
on the same parquet. Column names are aliased identically on both sides
(the driver's compare sorts columns by name before hashing).

Mapping to the reference operator inventory is cited per entry
(reference paths relative to /root/reference).

Float discipline: any aggregate whose value depends on floating-point
accumulation order is wrapped in ``round(x, N)`` on BOTH sides so the
value-hash is stable across engines and thread counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xova_spark.session import load_tables

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, names)
    return [tables[n] for n in names]


# ---------------------------------------------------------------------------
# Scans / projections / filters (S1-S7, P1-P7)
# ---------------------------------------------------------------------------


@q(
    "s2_column_pruned_scan",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def s2_column_pruned_scan(spark, sf_dir):
    """Column-pruned scan (ref: app.py:163 columns=[TIME,INTERVAL,UVW])."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity")


@q(
    "s3_predicate_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2024-06-01'
    """,
)
def s3_predicate_pushdown(spark, sf_dir):
    """Pushed-down filter scan (ref: taql_where, arguments.py:219-220)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45) & (F.col("l_shipdate") >= F.lit("2024-06-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@q(
    "s4_computed_column",
    """
    SELECT p_partkey, length(p_name) AS name_len,
           upper(p_brand) AS brand_uc
    FROM part
    """,
)
def s4_computed_column(spark, sf_dir):
    """SELECT *, computed column (ref: check.py:25-26 SHAPE(DATA))."""
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_uc"),
    )


@q(
    "p1_isin_filter",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def p1_isin_filter(spark, sf_dir):
    """Partition-value semi-join vs literal list (ref: averaging.py:218-221)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@q(
    "p4_constant_columns",
    """
    SELECT c_custkey, 0 AS array_id, 0 AS observation_id, 1 AS processor_id
    FROM customer
    """,
)
def p4_constant_columns(spark, sf_dir):
    """Constant/ID column generation (ref: averaging.py:117-136, utils.py:7-14)."""
    (cust,) = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.lit(0).alias("array_id"),
        F.lit(0).alias("observation_id"),
        F.lit(1).alias("processor_id"),
    )


@q(
    "p6_computed_key",
    """
    SELECT c_custkey,
           (c_nationkey * (2 * 25 - c_nationkey + 1)) // 2
             + abs(c_custkey % 25 - c_nationkey) AS baseline_idx
    FROM customer
    """,
)
def p6_computed_key(spark, sf_dir):
    """Baseline-index arithmetic from two id columns (ref: fixvis.py:39-71)."""
    (cust,) = _t(spark, sf_dir, "customer")
    return cust.selectExpr(
        "c_custkey",
        "(c_nationkey * (2 * 25 - c_nationkey + 1)) div 2"
        " + abs(c_custkey % 25 - c_nationkey) AS baseline_idx",
    )


@q(
    "p7_range_selection",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_linenumber BETWEEN 2 AND 4
    """,
)
def p7_range_selection(spark, sf_dir):
    """Channel-range selection "3~100" → between (ref: arguments.py:42-74)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber").between(2, 4)).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# Joins (J1-J4 + general surface)
# ---------------------------------------------------------------------------


@q(
    "j1_broadcast_dim_join",
    """
    SELECT l_orderkey, l_linenumber, p_brand,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def j1_broadcast_dim_join(spark, sf_dir):
    """Broadcast equi-join to a dimension (ref: averaging.py:306-308 SPW lookup)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey",
        "l_linenumber",
        "p_brand",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@q(
    "j1_snowflake_chain",
    """
    SELECT s_suppkey, s_name, n_name, r_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def j1_snowflake_chain(spark, sf_dir):
    """Two-hop dimension chain (ref: DDID→SPW_ID→SPW, check.py:43-46)."""
    sup, nat, reg = _t(spark, sf_dir, "supplier", "nation", "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@q(
    "j2_composite_key_join",
    """
    SELECT a.l_orderkey, a.l_linenumber, b.l_quantity AS qty_b
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                   AND a.l_linenumber = b.l_linenumber
    WHERE a.l_quantity > 40
    """,
)
def j2_composite_key_join(spark, sf_dir):
    """Equi-join on composite key (ref: fixvis.py:74-102 (time, bl) lookup)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
        )
        .filter(F.col("a.l_quantity") > 40)
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            F.col("a.l_linenumber").alias("l_linenumber"),
            F.col("b.l_quantity").alias("qty_b"),
        )
    )


@q(
    "join_left_outer",
    """
    SELECT c_custkey, coalesce(o_orderkey, -1) AS o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", F.coalesce("o_orderkey", F.lit(-1)).alias("o_orderkey")
    )


@q(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 300000)
    """,
)
def join_semi(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@q(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "join_full_outer",
    """
    SELECT coalesce(n_nationkey, -1) AS n_key,
           coalesce(s_suppkey, -1) AS s_key
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    nat, sup = _t(spark, sf_dir, "nation", "supplier")
    return nat.join(sup, nat.n_nationkey == sup.s_nationkey, "full").select(
        F.coalesce("n_nationkey", F.lit(-1)).alias("n_key"),
        F.coalesce("s_suppkey", F.lit(-1)).alias("s_key"),
    )


@q(
    "join_range_theta",
    """
    SELECT a.event_id, count(*) AS n_follow
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.event_id
    """,
)
def join_range_theta(spark, sf_dir):
    """Range/theta join: events within 1h window of another event."""
    (ev,) = _t(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count("*").alias("n_follow"))
    )


@q(
    "join_asof",
    """
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id,
           coalesce(round(p.value, 6), -1.0) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join via union + last(ignoreNulls) window (no native Spark asof).

    For each click, the most recent prior-or-equal purchase value of the
    same user. Scale note: this is a single shuffle by user_id + ordered
    window scan — no cross product, skew-safe for bounded per-user rows.
    """
    (ev,) = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("value").alias("p_value"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_click"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("p_value"),
        "event_id",
        F.lit(1).alias("is_click"),
    )
    # Order purchases before clicks at identical ts so "<=" semantics match.
    merged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_p", F.last("p_value", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            F.coalesce(F.round("last_p", 6), F.lit(-1.0)).alias("last_purchase_value"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A10)
# ---------------------------------------------------------------------------


@q(
    "a1_time_binned_agg",
    """
    SELECT event_type,
           CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS time_bin,
           count(*) AS n,
           round(sum(value), 6) AS sum_value,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY event_type, time_bin
    """,
)
def a1_time_binned_agg(spark, sf_dir):
    """Fixed time-bin aggregation — the timechannel core shape
    (ref: averaging.py:251-255, time_bin_secs arguments.py:127-129)."""
    (ev,) = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "time_bin",
            F.floor(F.unix_timestamp("ts") / F.lit(3600.0)).cast("long"),
        )
        .groupBy("event_type", "time_bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@q(
    "a1a_weighted_flagged_mean",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_discount > 0.02
                          THEN l_quantity * l_extendedprice END)
                 / sum(CASE WHEN l_discount > 0.02 THEN l_quantity END),
                 6) AS wmean_price,
           count(CASE WHEN l_discount <= 0.02 THEN 1 END) AS n_flagged
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a1a_weighted_flagged_mean(spark, sf_dir):
    """Weighted mean over unflagged samples (ref: A1a averaging semantics,
    codex-africanus kernel contract; flag saturation averaging.py:225)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    unflagged = F.col("l_discount") > 0.02
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(unflagged, F.col("l_quantity") * F.col("l_extendedprice")))
            / F.sum(F.when(unflagged, F.col("l_quantity"))),
            6,
        ).alias("wmean_price"),
        F.count(F.when(~unflagged, F.lit(1))).alias("n_flagged"),
    )


@q(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """Pricing summary — flagship multi-aggregate groupBy (one shuffle,
    partial aggregation map-side; the Spark analogue of the reference's
    single-kernel multi-column aggregation, averaging.py:251-255)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "tpch_q3",
    """
    SELECT o_orderkey, round(revenue, 4) AS revenue, o_orderdate
    FROM (
      SELECT l_orderkey AS o_orderkey,
             sum(l_extendedprice * (1 - l_discount)) AS revenue,
             any_value(o_orderdate) AS o_orderdate
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey
    )
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """Shipping-priority top-k: join + agg + deterministic top-10."""
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(li.l_orderkey.alias("o_orderkey"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_raw"),
            F.any_value(F.col("o_orderdate")).alias("o_orderdate"),
        )
        .orderBy(F.desc("rev_raw"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", F.round("rev_raw", 4).alias("revenue"), "o_orderdate")
    )


@q(
    "tpch_q5",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """Local-supplier volume: 6-way join, broadcast dims, one agg shuffle."""
    cust, orders, li, sup, nat, reg = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@q(
    "a4_distinct_multicol",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def a4_distinct_multicol(spark, sf_dir):
    """Multi-column distinct (ref: averaging.py:409-415 np.unique(axis=0))."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


@q(
    "a5_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def a5_union_distinct(spark, sf_dir):
    """Tree-reduce distinct-union (ref: averaging.py:422-433; Spark's
    partial aggregation does the combine tree automatically)."""
    cust, sup = _t(spark, sf_dir, "customer", "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(sup.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@q(
    "a6_group_count_sum_maxby",
    """
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 6) AS sum_value,
           arg_max(event_type, event_id) AS latest_type,
           round(max(value), 6) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def a6_group_count_sum_maxby(spark, sf_dir):
    """Grouped count + scatter-add + argmax (ref: chunking.py:13-65 unique
    times / interval sums / max-uvw per chunk with partial+final combine)."""
    (ev,) = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.max_by("event_type", "event_id").alias("latest_type"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


@q(
    "a8_bool_reduce",
    """
    SELECT user_id, bool_and(value > 0.5) AS all_above,
           bool_or(event_type = 'error') AS any_error
    FROM events GROUP BY user_id
    """,
)
def a8_bool_reduce(spark, sf_dir):
    """Boolean all/any reduce (ref: FLAG.all(axis=(1,2)), averaging.py:225)."""
    (ev,) = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.bool_and(F.col("value") > 0.5).alias("all_above"),
        F.bool_or(F.col("event_type") == "error").alias("any_error"),
    )


@q(
    "a9_monotonic_check",
    """
    SELECT count(*) AS n_violations FROM (
      SELECT ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ) WHERE prev_ts IS NOT NULL AND ts < prev_ts
    """,
)
def a9_monotonic_check(spark, sf_dir):
    """Monotonicity assertion via lag (ref: chunking.py:267 da.diff >= 0)."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts")))
        .agg(F.count("*").alias("n_violations"))
    )


@q(
    "agg_rollup",
    """
    SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
           coalesce(l_linestatus, '<all>') AS l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


@q(
    "agg_cube",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS o_orderstatus,
           coalesce(o_orderpriority, '<all>') AS o_orderpriority,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("o_orderpriority"),
            "n",
        )
    )


@q(
    "agg_count_distinct",
    """
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@q(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price,
           round(median(l_quantity), 4) AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """Statistical aggregate surface (stddev/variance/median/min/max)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
    )


# ---------------------------------------------------------------------------
# Windows (W1-W3 + ranking/analytic surface)
# ---------------------------------------------------------------------------


@q(
    "w1_cumulative_binning",
    """
    SELECT event_id,
           CAST(floor(round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING), 6) / 10.0) AS BIGINT) AS bin_id
    FROM events
    """,
)
def w1_cumulative_binning(spark, sf_dir):
    """Ordered cumulative sum → bin assignment (ref: chunking.py:125-157
    greedy interval accumulation; this is the SQL analogue)."""
    (ev,) = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.floor(F.round(F.sum("value").over(w), 6) / 10.0).cast("long").alias("bin_id"),
    )


@q(
    "w_rank_topk_per_group",
    """
    SELECT event_type, event_id, rn FROM (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def w_rank_topk_per_group(spark, sf_dir):
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "rn")
    )


@q(
    "w_ranking_functions",
    """
    SELECT o_orderkey,
           rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rnk,
           dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus, o_orderkey) AS drnk,
           CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS INTEGER) AS quartile
    FROM orders
    """,
)
def w_ranking_functions(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    wk = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    wd = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.rank().over(wk).alias("rnk"),
        F.dense_rank().over(wd).alias("drnk"),
        F.ntile(4).over(wk).alias("quartile"),
    )


@q(
    "w_moving_avg",
    """
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mov_avg
    FROM events
    """,
)
def w_moving_avg(spark, sf_dir):
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return ev.select("event_id", F.round(F.avg("value").over(w), 6).alias("mov_avg"))


@q(
    "w_lag_lead",
    """
    SELECT event_id,
           round(coalesce(lag(value) OVER w, -1.0), 6) AS prev_value,
           round(coalesce(lead(value) OVER w, -1.0), 6) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w_lag_lead(spark, sf_dir):
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.round(F.coalesce(F.lag("value").over(w), F.lit(-1.0)), 6).alias("prev_value"),
        F.round(F.coalesce(F.lead("value").over(w), F.lit(-1.0)), 6).alias("next_value"),
    )


@q(
    "w_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    OR epoch_us(ts)
                       - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))
                       > 3600000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, event_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def w_sessionize(spark, sf_dir):
    """Sessionization: gap>1h starts a new session (the batch analogue of
    session windows; BDA's variable-width binning is the same pattern)."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Microsecond-exact gap compare: load_tables normalizes the parquet
    # NTZ micros column to TIMESTAMP (UTC-preserving), so unix_micros and
    # DuckDB's epoch_us() compare the same integers.
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    return (
        ev.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 3_600_000_000), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("new_sess").over(wc))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops (§2.6)
# ---------------------------------------------------------------------------


@q(
    "sort_limit_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def sort_limit_topk(spark, sf_dir):
    """Top-k by expression (ref: argmax of |uvw|², chunking.py:21,54-58).
    Spark plans this as TakeOrderedAndProject — no full sort at scale."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


@q(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    cust, sup = _t(spark, sf_dir, "customer", "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).intersect(
        sup.select(F.col("s_nationkey").alias("nationkey"))
    )


@q(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark, sf_dir):
    cust, sup = _t(spark, sf_dir, "customer", "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).subtract(
        sup.select(F.col("s_nationkey").alias("nationkey"))
    )


@q(
    "pivot_returnflag",
    """
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS qty_A,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 4) AS qty_N,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS qty_R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def pivot_returnflag(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 4))
        .withColumnRenamed("A", "qty_A")
        .withColumnRenamed("N", "qty_N")
        .withColumnRenamed("R", "qty_R")
    )


# ---------------------------------------------------------------------------
# Scalar function surface (§2.7)
# ---------------------------------------------------------------------------


@q(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           upper(p_name) AS name_uc,
           substr(p_name, 1, 5) AS name_pfx,
           replace(p_type, ' ', '_') AS type_us,
           length(p_name) AS name_len,
           strpos(p_name, 'a') AS a_pos,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
)
def scalar_string_funcs(spark, sf_dir):
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), "a").alias("a_pos"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@q(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           date_trunc('month', o_orderdate) AS month_start,
           datediff('day', TIMESTAMP '2024-01-01', o_orderdate) AS days_since
    FROM orders
    """,
)
def scalar_date_funcs(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
    )


@q(
    "scalar_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(pow(l_quantity, 2), 6) AS qty_sq,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           abs(l_quantity - 25) AS qty_dev
    FROM lineitem
    """,
)
def scalar_math_funcs(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
    )


@q(
    "scalar_complex_arith",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_discount * l_quantity - l_tax * 1.0, 6) AS vis_re,
           round(l_discount * 1.0 + l_tax * l_quantity, 6) AS vis_im,
           round(sqrt((l_discount * l_quantity - l_tax * 1.0) ^ 2
                 + (l_discount * 1.0 + l_tax * l_quantity) ^ 2), 6) AS vis_abs
    FROM lineitem
    """,
)
def scalar_complex_arith(spark, sf_dir):
    """Complex multiply/abs on (re, im) pairs — the engine's encoding of the
    reference's complex64 visibilities (ref: averaging.py:150-157)."""
    from xova_spark.functions.complex_ops import c_abs, c_mul

    (li,) = _t(spark, sf_dir, "lineitem")
    re1, im1 = F.col("l_discount"), F.col("l_tax")
    re2, im2 = F.col("l_quantity"), F.lit(1.0)
    mre, mim = c_mul(re1, im1, re2, im2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(mre, 6).alias("vis_re"),
        F.round(mim, 6).alias("vis_im"),
        F.round(c_abs(mre, mim), 6).alias("vis_abs"),
    )


@q(
    "scalar_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def scalar_json_extract(spark, sf_dir):
    (ev,) = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@q(
    "array_hof_norm",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def array_hof_norm(spark, sf_dir):
    """Higher-order array functions: per-row L2 norm of an embedding."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sumsq), 6).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )
