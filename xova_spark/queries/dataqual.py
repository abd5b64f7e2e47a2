"""Data-quality / pipeline-hygiene pack.

The reference ships a shape/consistency validator (``xova check``,
reference xova/apps/xova/check.py) — this pack generalizes that idea
to the validations a 100 TB training-data pipeline runs before and
after every transform: column profiling, candidate-key uniqueness,
referential-integrity orphan counts, SCD2 effective-dating of
dimension history, and distribution-drift measurement between data
slices.

Exactness discipline: counts/mins/maxes are exact; the only
order-dependent aggregate (the profile mean) is round(x, 4) on both
engines; drift is computed on the integer cross-multiplied lattice
(|c_a*T_b - c_b*T_a|) so no float division ever happens.
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


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_sql() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count({c}) AS BIGINT) AS n_nonnull,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               min({c}) AS min_val,
               max({c}) AS max_val,
               round(avg({c}), 4) AS mean_val
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@q("dq_profile_columns", _profile_sql())
def dq_profile_columns(spark, sf_dir):
    """Per-column profile (rows/nulls/distinct/min/max/mean) in ONE
    scan with NO Expand: unpivot the 4 measures to (col_name, val)
    long form via stack (a Generate, not an Expand), partial-aggregate
    onto the (col_name, val) DISTINCT LATTICE with per-value counts,
    then derive every statistic per column from the lattice — distinct
    count is the lattice row count, n_rows/n_nonnull are count sums,
    min/max pass through, and the mean is the count-weighted
    sum(val*cnt)/sum(cnt).

    Why not 4x count_distinct in one agg: mixed distinct + plain
    aggregates force an Expand that duplicates every input row per
    aggregate group (~5x rows through the first shuffle — the exact
    anti-pattern relext.agg_sketch_accuracy documents). Here the first
    shuffle carries at most the distinct lattice (bounded by the
    column cardinalities, heavily map-side combined), never a
    multiple of the input — the property that matters at 100 TB."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    stack_args = ", ".join(f"'{c}', {c}" for c in _PROFILE_COLS)
    long = li.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col_name, val)"
        )
    )
    lattice = long.groupBy("col_name", "val").agg(
        F.count("*").cast("long").alias("cnt")
    )
    nn = F.col("val").isNotNull()
    return (
        lattice.groupBy("col_name")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.sum(F.when(nn, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_nonnull"),
            F.count(F.when(nn, True)).cast("long").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
            F.round(
                F.sum(F.col("val") * F.col("cnt"))
                / F.sum(F.when(nn, F.col("cnt"))),
                4,
            ).alias("mean_val"),
        )
        .select(
            "col_name", "n_rows", "n_nonnull", "n_distinct",
            "min_val", "max_val", "mean_val",
        )
    )


_KEYS = (
    ("orders", "o_orderkey", "o_orderkey"),
    ("customer", "c_custkey", "c_custkey"),
    ("part", "p_partkey", "p_partkey"),
    ("lineitem", "l_orderkey,l_linenumber", "l_orderkey, l_linenumber"),
)


def _uniq_sql() -> str:
    parts = [
        f"""
        SELECT '{t}' AS table_name, '{label}' AS key_cols,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT ({expr})) AS BIGINT) AS n_keys,
               count(*) = count(DISTINCT ({expr})) AS is_unique
        FROM {t}
        """
        for t, label, expr in _KEYS
    ]
    return " UNION ALL ".join(parts)


@q("dq_key_uniqueness", _uniq_sql())
def dq_key_uniqueness(spark, sf_dir):
    """Candidate-key uniqueness check across four tables — per table
    one partial-aggregated count + distinct-count (struct key for the
    composite), unioned into a 4-row report."""
    tabs = load_tables(
        spark, sf_dir, ("orders", "customer", "part", "lineitem")
    )
    outs = []
    for t, label, _expr in _KEYS:
        cols = [c.strip() for c in label.split(",")]
        key = F.struct(*cols) if len(cols) > 1 else F.col(cols[0])
        outs.append(
            tabs[t].agg(
                F.count("*").cast("long").alias("n_rows"),
                F.count_distinct(key).cast("long").alias("n_keys"),
            ).select(
                F.lit(t).alias("table_name"),
                F.lit(label).alias("key_cols"),
                "n_rows",
                "n_keys",
                (F.col("n_rows") == F.col("n_keys")).alias("is_unique"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


_FKS = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
)


def _orphan_sql() -> str:
    parts = [
        f"""
        SELECT '{rel}' AS relationship,
               CAST(count(*) AS BIGINT) AS n_orphans
        FROM {child} WHERE {fk} NOT IN (SELECT {pk} FROM {parent})
        """
        for rel, child, fk, parent, pk in _FKS
    ]
    return " UNION ALL ".join(parts)


@q("dq_referential_orphans", _orphan_sql())
def dq_referential_orphans(spark, sf_dir):
    """Foreign-key orphan counts via LEFT ANTI joins — the
    distributed form of `NOT IN`: each check is one shuffled (or
    AQE-broadcast, for the small parents) anti join, never a
    per-row subquery. Keys in these tables are never NULL, so anti
    join and NOT IN agree."""
    tabs = load_tables(
        spark, sf_dir, ("lineitem", "orders", "part", "supplier", "customer")
    )
    outs = []
    for rel, child, fk, parent, pk in _FKS:
        orphans = tabs[child].join(
            tabs[parent], F.col(fk) == F.col(pk), "left_anti"
        )
        outs.append(
            orphans.agg(F.count("*").cast("long").alias("n_orphans")).select(
                F.lit(rel).alias("relationship"), "n_orphans"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@q(
    "scd2_order_versions",
    """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS version_n,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           lead(o_orderdate) OVER w IS NULL AS is_current,
           o_totalprice
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_order_versions(spark, sf_dir):
    """SCD type-2 effective-dating of each customer's order history:
    contiguous [valid_from, valid_to) intervals with an is_current
    flag — the merge/upsert primitive behind dimension maintenance.
    One window shuffle partitioned by the dimension key; ordering tie
    broken by the surrogate key so versions are deterministic."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    vt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("version_n"),
        F.col("o_orderdate").alias("valid_from"),
        vt.alias("valid_to"),
        vt.isNull().alias("is_current"),
        "o_totalprice",
    )


# Integerized lineitem measures for the exact-moment correlation
# lattice: quantity is integer-valued, discount/tax live on the 0.01
# grid, price is floored to whole dollars (coarse enough that the
# sum-of-squares stays far below int64 at any relevant SF, fine
# enough that Pearson r is meaningful).
_CORR_COLS = (
    ("qty", "CAST(l_quantity AS BIGINT)", "l_quantity"),
    ("disc100", "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)", "l_discount"),
    ("tax100", "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)", "l_tax"),
    ("price_usd", "CAST(floor(l_extendedprice) AS BIGINT)", "l_extendedprice"),
)


def _corr_sql() -> str:
    proj = ", ".join(f"{expr} AS {nm}" for nm, expr, _src in _CORR_COLS)
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    names = [nm for nm, _e, _s in _CORR_COLS]
    for nm in names:
        aggs.append(f"sum({nm}) AS s_{nm}")
    for i, a in enumerate(names):
        for b in names[i:]:
            aggs.append(f"sum({a} * {b}) AS s_{a}_{b}")
    pair_rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            pair_rows.append(
                f"""
                SELECT '{a}' AS col_a, '{b}' AS col_b, n,
                       round((CAST(n AS DOUBLE) * CAST(s_{a}_{b} AS DOUBLE)
                              - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
                             / sqrt((CAST(n AS DOUBLE) * CAST(s_{a}_{a} AS DOUBLE)
                                     - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                                    * (CAST(n AS DOUBLE) * CAST(s_{b}_{b} AS DOUBLE)
                                       - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))),
                             6) AS pearson_r
                FROM m
                """
            )
    return (
        f"WITH i AS (SELECT {proj} FROM lineitem), "
        f"m AS (SELECT {', '.join(aggs)} FROM i) "
        + " UNION ALL ".join(pair_rows)
    )


@q("dq_corr_matrix", _corr_sql())
def dq_corr_matrix(spark, sf_dir):
    """Pearson correlation matrix of the four lineitem measures in ONE
    scan: integerize each column, aggregate ALL first and second
    moments (4 sums + 10 products) in a single agg node, then expand
    the 6 upper-triangle pairs from that one moment row. Every moment
    is an exact BIGINT sum (order-independent); the n·Sab − Sa·Sb
    products move to DOUBLE first (n·Spp overflows int64 past ~sf0.01
    — both engines do the identical IEEE sequence from identical
    integer moments, so round(6) still hashes), the same exactness
    trick as the drift lattice and the anomaly z-scores.

    At 100 TB: one partial-aggregated shuffle of a 15-number state;
    compare F.corr, which is pairwise, float-accumulated, and
    order-dependent across partitions."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    names = [nm for nm, _e, _s in _CORR_COLS]
    ints = li.select(
        *[F.expr(expr).alias(nm) for nm, expr, _src in _CORR_COLS]
    )
    aggs = [F.count("*").cast("long").alias("n")]
    for nm in names:
        aggs.append(F.sum(nm).alias(f"s_{nm}"))
    for i, a in enumerate(names):
        for b in names[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}"))
    m = ints.agg(*aggs)
    outs = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            nd = F.col("n").cast("double")

            def dd(c):
                return F.col(c).cast("double")

            num = nd * dd(f"s_{a}_{b}") - dd(f"s_{a}") * dd(f"s_{b}")
            va = nd * dd(f"s_{a}_{a}") - dd(f"s_{a}") * dd(f"s_{a}")
            vb = nd * dd(f"s_{b}_{b}") - dd(f"s_{b}") * dd(f"s_{b}")
            outs.append(
                m.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    "n",
                    F.round(num / F.sqrt(va * vb), 6).alias("pearson_r"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@q(
    "join_pit_scd2",
    """
    WITH v AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER w AS version_n,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER w AS valid_to
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(v.version_n AS BIGINT) AS version_n,
           v.valid_from,
           CAST(l.l_shipdate >= v.valid_from AS INTEGER) AS shipped_in_or_after
    FROM lineitem l
    JOIN v ON v.o_orderkey = l.l_orderkey
          AND l.l_shipdate >= v.valid_from
          AND (v.valid_to IS NULL OR l.l_shipdate < v.valid_to)
    """,
)
def join_pit_scd2(spark, sf_dir):
    """POINT-IN-TIME join — every lineitem matched to the SCD2 version
    of its customer's order history (scd2_order_versions' intervals)
    that was CURRENT at ship time: the temporal-join pattern behind
    "which dimension attributes were true when this fact happened"
    (feature-store point-in-time correctness, slowly-changing price
    lookups). Equi-join on the natural key carries the volume; the
    [valid_from, valid_to) containment is a residual predicate on the
    few versions per key — never a range-only join.

    Inner-join semantics: a lineitem matches only if it shipped while
    its order's version was still current (before the customer's next
    order) — on this fixture that keeps ~9% of lineitems, i.e. the
    PIT filter does real work, which is exactly what the gate
    verifies."""
    from pyspark.sql import Window

    tabs = load_tables(spark, sf_dir, ("orders", "lineitem"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = tabs["orders"].select(
        "o_orderkey",
        F.row_number().over(w).alias("version_n"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    li = tabs["lineitem"]
    return (
        li.join(
            v,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") >= F.col("valid_from"))
            & (
                F.col("valid_to").isNull()
                | (F.col("l_shipdate") < F.col("valid_to"))
            ),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("version_n").cast("long").alias("version_n"),
            "valid_from",
            (F.col("l_shipdate") >= F.col("valid_from"))
            .cast("int")
            .alias("shipped_in_or_after"),
        )
    )


@q(
    "dq_freshness",
    """
    WITH m AS (
      SELECT max(ts) AS max_ts, min(ts) AS min_ts, count(*) AS n
      FROM events
    )
    SELECT CAST(datediff('day', DATE '2024-01-01', CAST(max_ts AS DATE))
                AS BIGINT) AS latest_day,
           CAST(datediff('day', CAST(min_ts AS DATE), CAST(max_ts AS DATE))
                AS BIGINT) AS span_days,
           CAST((SELECT count(*) FROM events e, m
                 WHERE e.ts >= max_ts - INTERVAL 24 HOUR) AS BIGINT)
               AS rows_last_24h,
           CAST(n AS BIGINT) AS n_rows
    FROM m
    """,
)
def dq_freshness(spark, sf_dir):
    """Data FRESHNESS check — the first thing a pipeline monitor asks
    of an event table: latest event day, covered span, and volume in
    the trailing 24 h relative to the data's own high-water mark (so
    the check is reproducible — an absolute now() would drift). Two
    scans: the 1-row extremes, then one filtered count against the
    broadcast high-water mark."""
    (ev,) = [load_tables(spark, sf_dir, ("events",))["events"]]
    m = ev.agg(
        F.max("ts").alias("max_ts"),
        F.min("ts").alias("min_ts"),
        F.count("*").cast("long").alias("n"),
    )
    last24 = (
        ev.crossJoin(F.broadcast(m.select("max_ts")))
        .where(F.col("ts") >= F.col("max_ts") - F.expr("interval 24 hours"))
        .agg(F.count("*").cast("long").alias("rows_last_24h"))
    )
    return (
        m.crossJoin(F.broadcast(last24))
        .select(
            F.datediff(
                F.col("max_ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).cast("long").alias("latest_day"),
            F.datediff(
                F.col("max_ts").cast("date"), F.col("min_ts").cast("date")
            ).cast("long").alias("span_days"),
            "rows_last_24h",
            F.col("n").alias("n_rows"),
        )
    )


_DRIFT_SPLIT = "1998-01-01"


@q(
    "dq_histogram_drift",
    f"""
    WITH b AS (
        SELECT CAST(floor(l_discount * 20) AS BIGINT) AS bin,
               l_shipdate < TIMESTAMP '{_DRIFT_SPLIT}' AS early
        FROM lineitem
    ),
    h AS (
        SELECT bin,
               CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS c_early,
               CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS c_late
        FROM b GROUP BY bin
    ),
    t AS (SELECT sum(c_early) AS t_early, sum(c_late) AS t_late FROM h)
    SELECT CAST(t.t_early AS BIGINT) AS n_early,
           CAST(t.t_late AS BIGINT) AS n_late,
           CAST(sum(abs(h.c_early * t.t_late - h.c_late * t.t_early))
                AS BIGINT) AS l1_cross
    FROM h CROSS JOIN t
    GROUP BY t.t_early, t.t_late
    """,
)
def dq_histogram_drift(spark, sf_dir):
    """Distribution drift of l_discount between the pre/post-{split}
    slices: histogram L1 distance on the integer cross-multiplied
    lattice (|c_e*T_l - c_l*T_e| sums — no float division, exact in
    both engines; divide by T_e*T_l downstream if a normalized
    distance is wanted).

    Plan: one conditional-count groupBy(bin) shuffle (~20 groups),
    then the 1-row totals re-enter via broadcast cross join — the
    whole drift check is one scan + one tiny shuffle at any scale."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    early = F.col("l_shipdate") < F.lit(_DRIFT_SPLIT).cast("timestamp")
    h = (
        li.select(
            F.floor(F.col("l_discount") * 20).cast("long").alias("bin"),
            early.alias("early"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("early"), 1).otherwise(0)).cast("long").alias("c_early"),
            F.sum(F.when(F.col("early"), 0).otherwise(1)).cast("long").alias("c_late"),
        )
    )
    t = h.agg(
        F.sum("c_early").cast("long").alias("t_early"),
        F.sum("c_late").cast("long").alias("t_late"),
    )
    return (
        h.crossJoin(F.broadcast(t))
        .groupBy("t_early", "t_late")
        .agg(
            F.sum(
                F.abs(
                    F.col("c_early") * F.col("t_late")
                    - F.col("c_late") * F.col("t_early")
                )
            ).cast("long").alias("l1_cross")
        )
        .select(
            F.col("t_early").alias("n_early"),
            F.col("t_late").alias("n_late"),
            "l1_cross",
        )
    )


# Declarative expectations: (name, SQL predicate over lineitem rows that
# marks a VIOLATION). The Spark side builds the same predicates with
# F.expr — one shared spec, one scan, one report.
_EXPECTATIONS = (
    ("quantity_in_1_50", "l_quantity < 1 OR l_quantity > 50"),
    ("discount_in_0_0.1", "l_discount < 0 OR l_discount > 0.1"),
    ("tax_nonnegative", "l_tax < 0"),
    ("price_positive", "l_extendedprice <= 0"),
    ("returnflag_enum", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("linestatus_enum", "l_linestatus NOT IN ('O', 'F')"),
    ("shipdate_in_range", "l_shipdate < TIMESTAMP '2023-01-01' "
                          "OR l_shipdate >= TIMESTAMP '2026-01-01'"),
)


def _expect_sql() -> str:
    cases = ", ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS v_{i}"
        for i, (_n, pred) in enumerate(_EXPECTATIONS)
    )
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS expectation, n_rows, v_{i} AS n_violations, "
        f"CASE WHEN v_{i} = 0 THEN 1 ELSE 0 END AS passed FROM m"
        for i, (name, _p) in enumerate(_EXPECTATIONS)
    )
    return (
        f"WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, {cases}"
        f" FROM lineitem) {rows}"
    )


@q("dq_expectations", _expect_sql())
def dq_expectations(spark, sf_dir):
    """Declarative EXPECTATIONS SUITE (the great-expectations pattern):
    a table of named row-level predicates — range bounds, enum
    membership, date windows — evaluated as conditional counts in ONE
    scan / one agg node, reported as (expectation, n_rows,
    n_violations, passed). Both engines evaluate the identical SQL
    predicate text (Spark via F.expr), so the suite definition IS the
    cross-engine contract. Adding an expectation is one tuple; the
    scan count stays 1 regardless of suite size — the property that
    matters when the table is 100 TB."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for i, (_name, pred) in enumerate(_EXPECTATIONS):
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0))
            .cast("long")
            .alias(f"v_{i}")
        )
    m = li.agg(*aggs)
    outs = []
    for i, (name, _pred) in enumerate(_EXPECTATIONS):
        outs.append(
            m.select(
                F.lit(name).alias("expectation"),
                "n_rows",
                F.col(f"v_{i}").alias("n_violations"),
                F.when(F.col(f"v_{i}") == 0, 1).otherwise(0).alias("passed"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@q(
    "dq_shape_moments",
    """
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s4
      FROM lineitem
    )
    SELECT n, s1, s2,
           round((CAST(n AS DOUBLE) * s3 - 3.0 * s1 * s2
                  + 2.0 * s1 * s1 * s1 / n)
                 / (n * pow((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                            / n, 1.5)) / n, 6) AS skewness,
           round((CAST(n AS DOUBLE) * s4 - 4.0 * s1 * s3
                  + 6.0 * s1 * s1 * s2 / n - 3.0 * s1 * s1 * s1 * s1 / (n * CAST(n AS DOUBLE)))
                 / (n * pow((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                            / n, 2)) / n - 3.0, 6) AS excess_kurtosis
    FROM m
    """,
)
def dq_shape_moments(spark, sf_dir):
    """Distribution SHAPE profile — skewness and excess kurtosis of
    l_quantity from exact integer power sums S1..S4 (one scan, one agg
    node; qty <= 50 keeps S4 far inside int64 at any relevant SF). The
    central-moment formulas evaluate as ONE double expression from the
    exact sums, round(6) — the same moments discipline as the
    correlation matrix and the anomaly z-scores; compare F.skewness /
    F.kurtosis, whose float partials are summation-order-dependent
    across partitions."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    qv = F.col("l_quantity").cast("long")
    m = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(qv).cast("long").alias("s1"),
        F.sum(qv * qv).cast("long").alias("s2"),
        F.sum(qv * qv * qv).cast("long").alias("s3"),
        F.sum(qv * qv * qv * qv).cast("long").alias("s4"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    var = (s2 - s1 * s1 / n) / n
    skew = (n * s3 - F.lit(3.0) * s1 * s2 + F.lit(2.0) * s1 * s1 * s1 / n) / (
        n * F.pow(var, 1.5)
    ) / n
    kurt = (
        n * s4
        - F.lit(4.0) * s1 * s3
        + F.lit(6.0) * s1 * s1 * s2 / n
        - F.lit(3.0) * s1 * s1 * s1 * s1 / (n * n)
    ) / (n * F.pow(var, 2)) / n - F.lit(3.0)
    return m.select(
        "n",
        "s1",
        "s2",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    )


# Benford expected first-digit fractions, inlined as IDENTICAL literal
# doubles on both engines (computing log10 in each engine risks ULP
# divergence; a shared literal cannot drift).
_BENFORD = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}


@q(
    "dq_benford",
    f"""
    WITH v AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
    ), obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM v GROUP BY digit
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    exp AS (
      {' UNION ALL '.join(
          f"SELECT {d} AS digit, CAST({frac} AS DOUBLE) AS frac"
          for d, frac in _BENFORD.items()
      )}
    )
    SELECT e.digit, coalesce(o.n_obs, 0) AS n_obs,
           CAST(coalesce(o.n_obs, 0) * 1000 // t.n AS BIGINT)
               AS obs_permille,
           CAST(round(e.frac * 1000) AS BIGINT) AS benford_permille,
           round(power(coalesce(o.n_obs, 0) - e.frac * t.n, 2)
                 / (e.frac * t.n), 6) AS chi2_contrib
    FROM exp e
    LEFT JOIN obs o ON o.digit = e.digit
    CROSS JOIN tot t
    """,
)
def dq_benford(spark, sf_dir):
    """Benford first-significant-digit screening of order totals — the
    classic fabricated-data / broken-generator tripwire: natural
    multi-magnitude amounts follow log10(1+1/d); a synthetic or
    truncated column shows up as a large chi-square. One row per digit
    1-9 with observed count, observed vs Benford permille, and the
    chi-square contribution.

    Exactness: the digit comes from the DECIMAL-CENTS string (never the
    float's repr — both engines stringify the same bigint); counts are
    exact; the two float expressions evaluate identical literal
    constants against identical integers, then round(6).

    Plan: one map-side digit projection + a 9-group aggregate; the
    9-row expected table and 1-row total broadcast back. Event-grain
    work is a single scan at any scale."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    v = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    obs = v.groupBy("digit").agg(F.count("*").cast("long").alias("n_obs"))
    tot = v.agg(F.count("*").cast("long").alias("n"))
    spark_exp = spark.createDataFrame(
        [(d, float(frac)) for d, frac in _BENFORD.items()],
        "digit int, frac double",
    )
    n_obs = F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
    expn = F.col("frac") * F.col("n")
    return (
        spark_exp.join(F.broadcast(obs), "digit", "left_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            n_obs.alias("n_obs"),
            F.expr("coalesce(n_obs, 0) * 1000 div n").alias("obs_permille"),
            F.round(F.col("frac") * 1000).cast("long").alias(
                "benford_permille"
            ),
            F.round(F.pow(n_obs - expn, F.lit(2)) / expn, 6).alias(
                "chi2_contrib"
            ),
        )
    )


_FD_CANDIDATES = (
    # (name, table, determinant, dependent) — mix of FDs that must HOLD
    # (keys, derived columns) and ones that must FAIL (correlations a
    # profiler should refuse to promote to constraints)
    ("customer: c_custkey -> c_name", "customer", "c_custkey", "c_name"),
    ("customer: c_nationkey -> c_mktsegment", "customer", "c_nationkey",
     "c_mktsegment"),
    ("orders: o_orderkey -> o_custkey", "orders", "o_orderkey", "o_custkey"),
    ("orders: o_custkey -> o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
    ("lineitem: l_orderkey -> l_shipdate", "lineitem", "l_orderkey",
     "l_shipdate"),
    ("lineitem: l_partkey -> l_suppkey", "lineitem", "l_partkey",
     "l_suppkey"),
)


def _fd_oracle_sql() -> str:
    parts = []
    for name, table, det, dep in _FD_CANDIDATES:
        parts.append(f"""
          SELECT '{name}' AS fd,
                 CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_violating_groups,
                 CAST(max(nd) AS BIGINT) AS max_branching,
                 sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
          FROM (SELECT {det}, count(DISTINCT {dep}) AS nd
                FROM {table} GROUP BY {det})""")
        # noqa: the determinant/dependent names are compile-time constants
    return " UNION ALL ".join(parts)


@q("dq_fd_profile", _fd_oracle_sql())
def dq_fd_profile(spark, sf_dir):
    """FUNCTIONAL-DEPENDENCY discovery (the Metanome/profiling op that
    decides which constraints a dataset actually obeys): for each
    candidate A -> B, group by the determinant and count distinct
    dependents — the FD holds iff no group branches. The candidate set
    mixes true keys/derivations (must hold) with plausible-looking
    correlations (must fail — a profiler that promotes those to
    constraints corrupts downstream dedup/merge logic). Each check is
    one partial-agged shuffle on the determinant + a 1-row summary;
    checks union into one report. At 100 TB the groupBy-distinct is the
    exact path; the HLL variant (approx_count_distinct per group) is
    the screening pass — agg_sketch_accuracy is the standing proof of
    its error bound."""
    out = None
    for name, table, det, dep in _FD_CANDIDATES:
        t = load_tables(spark, sf_dir, (table,))[table]
        grp = t.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        rep = grp.agg(
            F.count("*").cast("long").alias("n_groups"),
            viol.cast("long").alias("n_violating_groups"),
            F.max("nd").cast("long").alias("max_branching"),
            (viol == 0).alias("holds"),
        ).select(F.lit(name).alias("fd"), "*")
        out = rep if out is None else out.unionByName(rep)
    return out


@q(
    "dq_outlier_iqr",
    """
    WITH qv AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem
    ), rk AS (
      SELECT flag, q,
             row_number() OVER (PARTITION BY flag ORDER BY q) AS rn,
             CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n
      FROM qv
    ), quart AS (
      SELECT flag, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(CASE WHEN rn = (n + 3) // 4 THEN q ELSE 0 END)
                  AS BIGINT) AS q1,
             CAST(sum(CASE WHEN rn = (3 * n + 3) // 4 THEN q ELSE 0 END)
                  AS BIGINT) AS q3
      FROM rk GROUP BY flag
    )
    SELECT qv.flag AS l_returnflag, max(quart.n) AS n_rows,
           max(q1) AS q1, max(q3) AS q3,
           CAST(sum(CASE WHEN 2 * q < 2 * q1 - 3 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(sum(CASE WHEN 2 * q > 2 * q3 + 3 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM qv JOIN quart ON qv.flag = quart.flag
    GROUP BY qv.flag
    ORDER BY l_returnflag
    """,
)
def dq_outlier_iqr(spark, sf_dir):
    """TUKEY IQR FENCE audit per return-flag population — the
    complement of dq_anomaly_mad (MAD catches level outliers robustly;
    the 1.5*IQR fence is the boxplot rule every profiling report
    quotes). Quartiles are exact type-1 order statistics (the value at
    rank ceil(n/4) / ceil(3n/4)); the fences ride a 2x integer lattice
    (2q <> 2q1 - 3*IQR) so the 1.5 multiplier never becomes a float.

    Scale shape: ranks come from a window PARTITIONED by the flag (the
    population key — no global sort); quartile extraction is one
    flag-grain aggregate; the fence count is one keyed equi-join of the
    3-row quartile table back onto the scan plus one flag-grain
    aggregate. On the uniform fixture quantity (1..50) the fences
    exclude nothing — the zero rows are themselves the oracle-pinned
    expectation; the law test drives a constructed skew through the
    same plan."""
    (li,) = load_tables(spark, sf_dir, ("lineitem",)).values()
    qv = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
    )
    # HISTOGRAM-GRAIN order statistics (same results, data-grain window
    # removed): the rank-rn value in a sorted population equals the
    # smallest value whose cumulative frequency reaches rn, so the
    # quartiles come from the (flag, q) value histogram — ONE map-side
    # partial-agged shuffle collapsing the scan to distinct-value grain
    # — instead of row_number over every row shuffled into 3 flag
    # partitions (the window sort was this query's entire cost: a
    # 3-task sort of the full table, unboundable at scale). The fence
    # counts aggregate histogram weights against the broadcast quartile
    # row. Both consumers reuse the SAME cells exchange (scan+partial
    # agg dedup via ReuseExchange). Measured 2.11 s -> see
    # OPTIMIZATION_r10.md; oracle unchanged and EXACT.
    cells = qv.groupBy("flag", "q").agg(F.count("*").cast("long").alias("c"))
    wf = Window.partitionBy("flag")
    cum = cells.select(
        "flag",
        "q",
        "c",
        F.sum("c")
        .over(
            wf.orderBy("q").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long")
        .alias("cum"),
        F.sum("c").over(wf).cast("long").alias("n"),
    )
    quart = cum.groupBy("flag").agg(
        F.max("n").cast("long").alias("n"),
        F.expr(
            "CAST(min(CASE WHEN cum >= (n + 3) div 4 THEN q END)"
            " AS BIGINT)"
        ).alias("q1"),
        F.expr(
            "CAST(min(CASE WHEN cum >= (3 * n + 3) div 4 THEN q END)"
            " AS BIGINT)"
        ).alias("q3"),
    )
    return (
        cells.join(F.broadcast(quart), "flag")
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.max("n").alias("n_rows"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.sum(
                F.expr(
                    "CASE WHEN 2 * q < 2 * q1 - 3 * (q3 - q1)"
                    " THEN c ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(
                F.expr(
                    "CASE WHEN 2 * q > 2 * q3 + 3 * (q3 - q1)"
                    " THEN c ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_high_outliers"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Round-10 batch 8: categorical drift between time halves.
# ---------------------------------------------------------------------------


@q(
    "dq_categorical_drift",
    """
    WITH h AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hr
      FROM events
    ), b AS (
      SELECT (min(hr) + max(hr)) // 2 AS boundary FROM h
    ), cell AS (
      SELECT event_type,
             CAST(sum(CASE WHEN hr <= boundary THEN 1 ELSE 0 END)
                  AS BIGINT) AS ce,
             CAST(sum(CASE WHEN hr > boundary THEN 1 ELSE 0 END)
                  AS BIGINT) AS cl
      FROM h, b GROUP BY event_type
    ), m AS (
      SELECT CAST(sum(ce) AS BIGINT) AS ne, CAST(sum(cl) AS BIGINT) AS nl,
             CAST(count(*) AS BIGINT) AS k
      FROM cell
    ), term AS (
      SELECT ne, nl, k,
             CASE WHEN ne = 0 OR nl = 0 THEN 0
                  ELSE CAST(round(
                    (CAST(ce AS DOUBLE) - CAST(ce + cl AS DOUBLE) * ne
                       / (ne + nl))
                    * (CAST(ce AS DOUBLE) - CAST(ce + cl AS DOUBLE) * ne
                       / (ne + nl))
                    * (1000000.0 * (ne + nl)
                       / (CAST(ce + cl AS DOUBLE) * ne)
                       + 1000000.0 * (ne + nl)
                       / (CAST(ce + cl AS DOUBLE) * nl)))
                    AS BIGINT) END AS tm,
             abs(CAST(ce AS HUGEINT) * nl - CAST(cl AS HUGEINT) * ne)
                 AS tvd_num
      FROM cell, m
    )
    SELECT max(ne) AS n_early, max(nl) AS n_late,
           (SELECT boundary FROM b) AS boundary_hr,
           CAST(max(k) AS BIGINT) AS n_types,
           CAST(sum(tm) AS BIGINT) AS chi2_micro,
           CAST(CASE WHEN max(ne) = 0 OR max(nl) = 0 THEN 0
                ELSE sum(tvd_num) * 1000000
                     // (2 * CAST(max(ne) AS HUGEINT) * max(nl)) END
               AS BIGINT) AS tvd_micro
    FROM term
    """,
)
def dq_categorical_drift(spark, sf_dir):
    """CATEGORICAL DRIFT between the first and second half of the
    event stream (split at the calendar midpoint hour — a fixed
    integer boundary, not a data quantile): the event-type mix of
    early vs late halves compared two ways — the 2 x k chi-square
    (statistical: is the drift bigger than sampling noise) and the
    TOTAL VARIATION DISTANCE (operational: how much probability mass
    actually moved, the dial dq_histogram_drift reads for numeric
    columns, here for a categorical one). The pair is the categorical
    companion to ev_psi_drift's binned numeric PSI.

    Integer form: the boundary is one positive floor-div of exact
    hour bounds (post-epoch contract, test-pinned); all 2k cell
    counts are exact; each chi-square term is the fixed-shape-double
    micro idiom of ev_chisq_independence; TVD avoids division
    entirely until the last step — sum |ce*nl - cl*ne| on the
    128-bit cross-multiplied lattice (the dq_histogram_drift
    discipline; headroom probe tvd__dividend), ONE positive floor-div
    to micro.

    Scale shape: one per-row hour projection, a 1-row bounds
    broadcast back over the typed scan (one_row_agg BNLJ, declared),
    one k-row keyed aggregate, k-row arithmetic."""
    (ev,) = load_tables(spark, sf_dir, ("events",)).values()
    h = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
    )
    b = h.agg(
        F.expr("CAST((min(hr) + max(hr)) div 2 AS BIGINT)").alias(
            "boundary"
        )
    )
    cell = (
        h.crossJoin(F.broadcast(b))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("hr") <= F.col("boundary"), 1).otherwise(0))
            .cast("long")
            .alias("ce"),
            F.sum(F.when(F.col("hr") > F.col("boundary"), 1).otherwise(0))
            .cast("long")
            .alias("cl"),
        )
    )
    m = cell.agg(
        F.sum("ce").cast("long").alias("ne"),
        F.sum("cl").cast("long").alias("nl"),
        F.count("*").cast("long").alias("k"),
    )
    term = cell.crossJoin(F.broadcast(m)).selectExpr(
        "ne",
        "nl",
        "k",
        "CASE WHEN ne = 0 OR nl = 0 THEN 0"
        " ELSE CAST(round("
        " (CAST(ce AS DOUBLE) - CAST(ce + cl AS DOUBLE) * ne / (ne + nl))"
        " * (CAST(ce AS DOUBLE) - CAST(ce + cl AS DOUBLE) * ne"
        "    / (ne + nl))"
        " * (1000000.0 * (ne + nl) / (CAST(ce + cl AS DOUBLE) * ne)"
        "    + 1000000.0 * (ne + nl) / (CAST(ce + cl AS DOUBLE) * nl)))"
        " AS BIGINT) END AS tm",
        "abs(CAST(ce AS DECIMAL(38,0)) * nl - CAST(cl AS DECIMAL(38,0))"
        " * ne) AS tvd_num",
    )
    return (
        term.agg(
            F.max("ne").alias("n_early"),
            F.max("nl").alias("n_late"),
            F.max("k").cast("long").alias("n_types"),
            F.sum("tm").cast("long").alias("chi2_micro"),
            F.expr(
                "CAST(CASE WHEN max(ne) = 0 OR max(nl) = 0 THEN 0"
                " ELSE sum(tvd_num) * 1000000"
                " div (2 * CAST(max(ne) AS DECIMAL(38,0)) * max(nl)) END"
                " AS BIGINT)"
            ).alias("tvd_micro"),
        )
        .crossJoin(F.broadcast(b))
        .select(
            "n_early",
            "n_late",
            F.col("boundary").alias("boundary_hr"),
            "n_types",
            "chi2_micro",
            "tvd_micro",
        )
    )
