"""Distributed exact global ranking — the scale-safe replacement for
unpartitioned ranking windows.

``row_number()/ntile() OVER (ORDER BY ...)`` with no PARTITION BY is
correct but moves the ENTIRE input through one partition (Spark's
WindowExec warns exactly this). Fine on a 10-row decile table; a
cluster-killer on a user- or vocabulary-grain table at 100 TB.

This module computes the identical rank with no single-partition
stage, using the classic two-pass range-partitioned scheme every
distributed sort implements:

1. ``repartitionByRange`` on the order keys (Spark range-partitions by
   sampling split points; ascending partition ids hold ascending key
   ranges, under the SAME sort expressions the rank is defined by),
   then ``sortWithinPartitions`` — a normal distributed sort, persisted
   so both passes see one physical ordering.
2. A K-row aggregate (K = number of range partitions) of per-partition
   row counts, collected on the driver and prefix-summed into offsets.
3. One ``mapInPandas`` pass that adds ``offset[pid] + position`` —
   Arrow batches arrive in partition order, so a running counter per
   partition is exact.

The result is bit-identical to the global window (the order keys must
be a TOTAL order — same requirement the oracle-parity rule already
imposes) while every stage stays at shuffle-partition granularity.

``ntile_from_rank`` reproduces SQL NTILE(k) semantics from the exact
rank: n = total rows, q = n div k, r = n mod k; the first r buckets get
q+1 rows. Pure integer column arithmetic — no second window.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Frames pinned by global_rank: the persist is load-bearing (both the
# offset pass and the output pass must see ONE physical range
# partitioning — recomputation could resample boundaries), so release
# happens via release_pins(), wired into sharedframes.clear_shared()
# (the hook gate/tool drivers already call at exit).
_PINNED: list[DataFrame] = []


def release_pins() -> None:
    """Unpersist every frame global_rank pinned (gate-exit hygiene)."""
    for df in _PINNED:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    _PINNED.clear()


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    _out: dict | None = None,
) -> DataFrame:
    """Append an exact 1-based ``row_number() OVER (ORDER BY
    *order_by)`` column without a single-partition window.

    ``order_by`` must define a total order (unique tiebreak) for the
    rank to be deterministic — the same contract the unpartitioned
    window it replaces already had.

    Cost: one range shuffle + sort (same as the global window's sort),
    a K-row count aggregate, and a streaming Arrow pass. The ranged
    frame is persisted between the two passes so the sampled range
    boundaries cannot drift; pins are released by release_pins()
    (called from sharedframes.clear_shared(), the gate-exit hook).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    _PINNED.append(ranged)
    counts = dict(
        (r["_pid"], r["n"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if _out is not None:
        _out["n_total"] = acc

    out_schema = ranged.drop("_pid").schema.add(rank_col, "long")
    out_cols = [f.name for f in out_schema.fields]

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[rank_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf[out_cols]

    return ranged.mapInPandas(add_rank, out_schema)


def ntile_from_rank(rank: Column, n_total: int, k: int) -> Column:
    """SQL NTILE(k) bucket from an exact 1-based global rank.

    NTILE semantics: q = n div k, r = n mod k; buckets 1..r have q+1
    rows, buckets r+1..k have q. ``n_total`` is the (driver-known)
    row count — a literal, so this is pure JVM column arithmetic.
    """
    q, r = divmod(int(n_total), int(k))
    pivot = r * (q + 1)
    big = F.ceil(rank / F.lit(q + 1))
    small = F.lit(r) + F.ceil((rank - F.lit(pivot)) / F.lit(q)) if q else F.lit(r)
    return (
        F.when(F.lit(r > 0) & (rank <= F.lit(pivot)), big)
        .otherwise(small)
        .cast("int")
    )


# Below this input size the plain unpartitioned-window NTILE is used:
# one partition of <=100k rows is bounded work, and the distributed
# path's extra job barriers (persist + offset collect + Arrow pass,
# per call) dominate at that scale. Both paths are bit-identical
# (tests/test_ranking.py::test_global_ntile_paths_agree).
NTILE_WINDOW_MAX_ROWS = 100_000


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    ntile_col: str,
    num_partitions: int | None = None,
    window_max_rows: int = NTILE_WINDOW_MAX_ROWS,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY *order_by)`` that never single-
    partitions an unbounded input: a count gate picks the plain window
    for small frames (bounded single-partition work) and the
    distributed exact rank + NTILE bucket formula otherwise. The
    distributed path's total count comes from the rank pass's own
    per-partition counts — no extra job beyond the gate count. The gate
    itself is a bounded probe (count of ``limit(max+1)``), not a full
    count: same decision, but a huge input stops scanning at max+1 rows
    instead of materializing once just to pick a path."""
    if df.limit(window_max_rows + 1).count() <= window_max_rows:
        from pyspark.sql import Window

        return df.withColumn(
            ntile_col,
            F.ntile(k).over(Window.orderBy(*order_by)).cast("int"),
        )
    meta: dict = {}
    ranked = global_rank(
        df, order_by, rank_col="_gnt_rank", num_partitions=num_partitions,
        _out=meta,
    )
    return ranked.withColumn(
        ntile_col, ntile_from_rank(F.col("_gnt_rank"), meta["n_total"], k)
    ).drop("_gnt_rank")


# Same rationale as NTILE_WINDOW_MAX_ROWS: below this input size the
# plain unpartitioned running-sum window is bounded work and the
# distributed path's job barriers dominate. Both paths bit-identical
# (tests/test_ranking.py::test_global_cumsum_paths_agree).
CUMSUM_WINDOW_MAX_ROWS = 100_000


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str | Sequence[str],
    cumsum_col: str | Sequence[str],
    num_partitions: int | None = None,
    window_max_rows: int = CUMSUM_WINDOW_MAX_ROWS,
) -> DataFrame:
    """Exact inclusive running sum of integral ``value_col`` over a
    TOTAL order — ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING
    TO CURRENT ROW)`` without an unbounded single-partition window.
    ``value_col``/``cumsum_col`` may be parallel sequences: every
    running sum shares the ONE range shuffle and Arrow pass.

    Gate: small frames take the plain window (bounded single-partition
    work); above ``window_max_rows`` the two-pass range-partitioned
    scheme runs — range shuffle + sort, a K-row per-partition SUM
    collected into driver prefix offsets, then one streaming Arrow pass
    adding ``offset[pid] + running``. Values must be integral (the
    oracle-lattice discipline) so partial-sum order cannot drift the
    result; output columns are ``long``.
    """
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    cumsum_cols = (
        [cumsum_col] if isinstance(cumsum_col, str) else list(cumsum_col)
    )
    if len(value_cols) != len(cumsum_cols):
        raise ValueError("value_col and cumsum_col lengths differ")
    # Bounded gate probe: limit(max+1).count() decides identically to a
    # full count but stops scanning at max+1 rows (ADVICE r6).
    if df.limit(window_max_rows + 1).count() <= window_max_rows:
        from pyspark.sql import Window

        w = Window.orderBy(*order_by).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        for vc, cc in zip(value_cols, cumsum_cols):
            df = df.withColumn(cc, F.sum(F.col(vc)).over(w).cast("long"))
        return df
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    _PINNED.append(ranged)
    # coalesce: a partition whose value column is all-NULL sums to NULL;
    # int(None) would crash the offset build (ADVICE r6). SQL SUM skips
    # NULLs, so 0 is the offset identity — but SUM over a frame with NO
    # non-null value is NULL, so the per-partition NON-NULL COUNT rides
    # along: a row's running sum is NULL exactly while the global
    # non-null count up to it is 0 (matching the window path bit-exact).
    sums = dict(
        (
            r["_pid"],
            (
                [int(r[f"s{i}"]) for i in range(len(value_cols))],
                [int(r[f"c{i}"]) for i in range(len(value_cols))],
            ),
        )
        for r in ranged.groupBy("_pid")
        .agg(
            *(
                F.coalesce(F.sum(F.col(vc)), F.lit(0)).alias(f"s{i}")
                for i, vc in enumerate(value_cols)
            ),
            *(
                F.count(F.col(vc)).alias(f"c{i}")
                for i, vc in enumerate(value_cols)
            ),
        )
        .collect()
    )
    offsets: dict[int, tuple[list[int], list[int]]] = {}
    acc = [0] * len(value_cols)
    cnt = [0] * len(value_cols)
    for pid in sorted(sums):
        offsets[pid] = (list(acc), list(cnt))
        acc = [a + s for a, s in zip(acc, sums[pid][0])]
        cnt = [c + k for c, k in zip(cnt, sums[pid][1])]

    out_schema = ranged.drop("_pid").schema
    for cc in cumsum_cols:
        out_schema = out_schema.add(cc, "long")
    out_cols = [f.name for f in out_schema.fields]

    def add_cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = [0] * len(value_cols)
        seen = [0] * len(value_cols)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base, base_cnt = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            for i, (vc, cc) in enumerate(zip(value_cols, cumsum_cols)):
                notna = pdf[vc].notna()
                # NULL contributes 0 to the sum, matching SQL SUM ...
                vals = pdf[vc].fillna(0).astype("int64")
                cs = (vals.cumsum() + (base[i] + running[i])).astype("int64")
                # ... but the result is NULL while the frame has no
                # non-null value yet (leading all-NULL prefix). nn_cum
                # is non-decreasing, so masking can only matter when
                # the batch STARTS at zero non-nulls seen.
                if base_cnt[i] + seen[i] == 0 and not bool(notna.iloc[0]):
                    nn_cum = notna.cumsum()
                    pdf[cc] = cs.astype("object").where(nn_cum > 0, None)
                else:
                    pdf[cc] = cs
                running[i] += int(vals.sum())
                seen[i] += int(notna.sum())
            yield pdf[out_cols]

    return ranged.mapInPandas(add_cumsum, out_schema)
