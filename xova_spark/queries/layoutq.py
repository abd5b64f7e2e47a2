"""Data-layout pack — Z-order clustering as a queryable transform.

The reference re-groups averaged chunks before writing purely for
write-batch size (xova/apps/xova/averaging.py:39-77); at 100 TB the
layout of written data decides whether later scans prune or read
everything, so layout itself becomes an operator. See
``functions/zorder.py`` for the layout writer; this pack puts the
Morton-key arithmetic and its locality property under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.functions.zorder import (
    _bucket16_sql,
    morton2_sql,
    with_morton2,
)
from xova_spark.session import load_tables

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


_ZBUCKET_SHIFT = 10  # 32x32 key blocks per bucket


@q(
    "layout_zorder_cells",
    f"""
    WITH mx AS (
        SELECT CAST(max(l_partkey) AS BIGINT) AS pk_mx,
               CAST(max(l_suppkey) AS BIGINT) AS sk_mx
        FROM lineitem
    ), z AS (
        SELECT l_partkey, l_suppkey,
               {morton2_sql(_bucket16_sql('l_partkey', 'pk_mx', '//'),
                            _bucket16_sql('l_suppkey', 'sk_mx', '//'))}
                   >> {_ZBUCKET_SHIFT} AS zbucket
        FROM lineitem CROSS JOIN mx
    )
    SELECT zbucket, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_partkey) AS BIGINT) AS pk_min,
           CAST(max(l_partkey) AS BIGINT) AS pk_max,
           CAST(min(l_suppkey) AS BIGINT) AS sk_min,
           CAST(max(l_suppkey) AS BIGINT) AS sk_max
    FROM z GROUP BY zbucket
    """,
)
def layout_zorder_cells(spark, sf_dir):
    """Morton-cell summary of lineitem on (l_partkey, l_suppkey):
    keys already inside the 16-bit grid interleave raw; wider keys
    range-bucket via floor(key·65536/(max+1)) — no silent wrap past
    65535 at any SF. Rows bucket by the
    top bits of their Z-value, and report each cell's key ranges. The
    per-cell extents are bounded by the 32×32 block geometry IN BUCKETED
    SPACE, i.e. ≤ 32·(max+1)/65536 in raw keys — the measurable locality
    property Z-layout buys: every written file covers a narrow range in
    BOTH keys, so min/max pruning works for filters on either. Pure
    integer column arithmetic (whole-stage codegen, bit-identical to the
    SQL twin); the maxes are one broadcast 1-row aggregate; one
    partial-aggregated shuffle on the cell id."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    mx = F.broadcast(
        li.agg(
            F.max("l_partkey").cast("long").alias("pk_mx"),
            F.max("l_suppkey").cast("long").alias("sk_mx"),
        )
    )
    bp = F.expr(_bucket16_sql("l_partkey", "pk_mx", "div"))
    bs = F.expr(_bucket16_sql("l_suppkey", "sk_mx", "div"))
    return (
        with_morton2(li.crossJoin(mx), bp, bs, "__z")
        .select(
            F.shiftright(F.col("__z"), _ZBUCKET_SHIFT).alias("zbucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_partkey").cast("long").alias("pk_min"),
            F.max("l_partkey").cast("long").alias("pk_max"),
            F.min("l_suppkey").cast("long").alias("sk_min"),
            F.max("l_suppkey").cast("long").alias("sk_max"),
        )
    )
