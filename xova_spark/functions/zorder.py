"""Z-order (Morton) curve helpers for multi-dimensional data layout.

At 100 TB, a table sorted on ONE key prunes scans on that key only;
interleaving the bits of two keys (the Morton/Z-order curve) gives
row-group min/max statistics that are narrow in BOTH dimensions, so
parquet row-group pruning works for filters on either key or both.
This is the layout trick behind Delta/Iceberg ``ZORDER BY`` — here as
plain Column arithmetic (shiftleft/AND/OR, whole-stage codegen; no
UDF), plus the DuckDB-SQL twin generator used by the oracle gate.

The classic 16-bit spread uses the magic-mask doubling network; both
engines evaluate it on BIGINT with identical two's-complement
semantics, so z-values are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) doubling network spreading 16 bits over 32.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` so bit k lands at bit 2k."""
    x = col.bitwiseAND(F.lit(0xFFFF)).cast("long")
    for sh, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def morton2(x: Column, y: Column) -> Column:
    """Morton/Z-order interleave of two 16-bit keys (x even bits,
    y odd bits). Wider keys should be range-bucketed to 16 bits first.

    NOTE: the single-Column form duplicates each input 2^4 = 16x in the
    expression tree (each doubling step references its operand twice);
    prefer :func:`with_morton2` in plans — it stages the steps through
    named columns so the physical plan carries ONE copy of each input
    expression (measured ~10% on layout_zorder_cells, 32 -> 2 copies of
    the range-bucket CASE in the plan)."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def with_morton2(df: DataFrame, x: Column, y: Column, out: str) -> DataFrame:
    """Add Morton-interleave column ``out`` of two 16-bit keys, staging
    the doubling network through intermediate named columns (one
    projection per step). CollapseProject declines to inline a
    projection whose references would duplicate, so each input
    expression is evaluated once — flat codegen instead of the 16x
    expression blow-up of the inline form."""
    d = df.withColumn(
        "__mx", x.bitwiseAND(F.lit(0xFFFF)).cast("long")
    ).withColumn("__my", y.bitwiseAND(F.lit(0xFFFF)).cast("long"))
    for sh, mask in _SPREAD:
        for c in ("__mx", "__my"):
            v = F.col(c)
            d = d.withColumn(
                c, (v.bitwiseOR(F.shiftleft(v, sh))).bitwiseAND(F.lit(mask))
            )
    return d.withColumn(
        out, F.col("__mx").bitwiseOR(F.shiftleft(F.col("__my"), 1))
    ).drop("__mx", "__my")


def spread_bits16_sql(expr: str) -> str:
    """DuckDB-SQL twin of :func:`spread_bits16` (unrolled text)."""
    s = f"(({expr}) & 65535)"
    for sh, mask in _SPREAD:
        s = f"(({s} | ({s} << {sh})) & {mask})"
    return s


def morton2_sql(x_expr: str, y_expr: str) -> str:
    return f"({spread_bits16_sql(x_expr)} | ({spread_bits16_sql(y_expr)} << 1))"


def _bucket16_sql(key: str, mx: str, intdiv: str) -> str:
    """16-bit range bucket, conditional: keys already inside the grid
    pass through raw (best curve resolution); wider keys scale by
    floor(key·65536/(max+1)) ∈ [0, 65535]. ``intdiv`` is the engine's
    integer-division operator ('div' Spark, '//' DuckDB) — exact
    integer arithmetic, identical cross-engine."""
    k = f"CAST({key} AS BIGINT)"
    m = f"CAST({mx} AS BIGINT)"
    return (
        f"(CASE WHEN {m} <= 65535 THEN {k} "
        f"ELSE ({k} * 65536) {intdiv} ({m} + 1) END)"
    )


def zorder_layout(df: DataFrame, x: str, y: str, n_files: int) -> DataFrame:
    """Lay a table out along the Z-curve: range-partition on the
    Morton key (one skew-balanced range shuffle — Spark samples the
    key distribution), then sort within each partition so every
    output file covers a compact Z-range. Downstream parquet scans
    prune row groups on min/max stats of BOTH x and y.

    Keys that fit 16 bits interleave RAW; wider keys are range-bucketed
    onto the 16-bit grid first (floor(key·65536/(max+1))) via a
    lazily-computed broadcast 1-row max — never the silent wrap past
    65535 that spread_bits16's mask would otherwise apply (keys 0 and
    65536 in one cell). The bucketing is order-preserving, so locality
    in bucketed space is locality in key space."""
    mx = F.broadcast(
        df.agg(
            F.max(x).cast("long").alias("__xmx"),
            F.max(y).cast("long").alias("__ymx"),
        )
    )
    bx = F.expr(_bucket16_sql(x, "__xmx", "div"))
    by = F.expr(_bucket16_sql(y, "__ymx", "div"))
    return (
        with_morton2(df.crossJoin(mx), bx, by, "__z")
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__xmx", "__ymx")
    )
