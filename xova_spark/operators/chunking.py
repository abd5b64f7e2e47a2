"""Exact greedy time-binning — the reference's chunk planner (A7/W1).

The reference plans row chunks with an eager pre-pass (reference:
xova/apps/xova/chunking.py:217-314): per partition, aggregate unique
TIMEs (counts + interval sums, :13-65), then greedily accumulate
average intervals until >= time_bin_secs (closing the bin,
:107-166) and re-merge bins up to max_row_chunks rows (:168-214). The
invariant: a unique timestamp NEVER splits across bins (:125-157).

In Spark the chunk-*planning* purpose disappears (shuffle partitioning
is automatic — SURVEY §2.4/A7), but the greedy *bin-assignment*
semantics is still the bit-exact alternative to the default
floor((TIME-t0)/bin) binning. Greedy accumulate-and-reset is not
expressible with plain window functions (the reset makes it
non-associative), so this is one of the three legitimate UDF sites
(SURVEY §2.9): a per-partition applyInPandas over the UNIQUE-TIME
table — #partitions x #times rows, orders of magnitude smaller than
the row table — whose output joins back to the row table (join
strategy left to AQE: broadcast when measured small, shuffle join
when the unique-time table itself is large).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xova_spark.operators.timechannel import PART_KEYS


def unique_time_stats(rows: DataFrame) -> DataFrame:
    """A6 planning aggregate (chunking.py:13-65): per (partition,
    unique TIME): row count + mean interval. One shuffle, partial aggs
    map-side."""
    return rows.groupBy(*PART_KEYS, "TIME").agg(
        F.count("*").alias("n_rows"),
        F.avg("INTERVAL").alias("avg_interval"),
    )


def greedy_bins(
    stats: DataFrame,
    time_bin_secs: float = 4.0,
    max_rows_per_bin: int | None = None,
) -> DataFrame:
    """Greedy closure over ordered unique times (chunking.py:107-214):
    accumulate avg_interval until the bin reaches time_bin_secs, then
    close; optionally re-split when a bin exceeds max_rows_per_bin
    rows. Returns (PART_KEYS, TIME, time_bin).

    Physical shape: ONE mapInPandas pass over the stats table hash-
    repartitioned on PART_KEYS (each partition's unique times co-located
    by construction), group boundaries detected vectorized — not
    groupBy().applyInPandas, whose per-group pandas construction cost
    dominates on small groups (see operators/bda.greedy_bda_map, same
    measured trade). The accumulate-reset walk is unchanged."""
    schema = (
        ", ".join(f"{k} int" for k in PART_KEYS)
        + ", TIME double, time_bin int"
    )

    def assign_part(batches):
        pdfs = [b for b in batches if len(b)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf = pdf.sort_values([*PART_KEYS, "TIME"], kind="mergesort")
        kmat = pdf[PART_KEYS].to_numpy()
        n = len(pdf)
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = (kmat[1:] != kmat[:-1]).any(axis=1)
        nr = pdf["n_rows"].to_numpy(dtype=np.int64)
        ai = pdf["avg_interval"].to_numpy(dtype=np.float64)
        bins = np.empty(n, dtype=np.int32)
        bin_id, acc, rows_acc = 0, 0.0, 0
        for i in range(n):
            if new_grp[i]:
                bin_id, acc, rows_acc = 0, 0.0, 0
            elif acc >= time_bin_secs or (
                max_rows_per_bin and rows_acc + nr[i] > max_rows_per_bin
            ):
                bin_id += 1
                acc, rows_acc = 0.0, 0
            bins[i] = bin_id
            acc += ai[i]
            rows_acc += nr[i]
        out = pdf[[*PART_KEYS, "TIME"]].copy()
        out["time_bin"] = bins
        yield out

    return stats.repartition(*PART_KEYS).mapInPandas(assign_part, schema)


def assign_greedy_bins(
    rows: DataFrame,
    time_bin_secs: float = 4.0,
    max_rows_per_bin: int | None = None,
) -> DataFrame:
    """Attach the greedy time_bin to every row: plan on the unique-time
    table, join the (partition, TIME) -> bin map back (the Spark shape
    of the reference's plan-then-reopen lifecycle, app.py:161-195).
    Un-hinted join: AQE broadcasts the plan when it is measured small."""
    plan = greedy_bins(unique_time_stats(rows), time_bin_secs, max_rows_per_bin)
    return rows.join(plan, [*PART_KEYS, "TIME"])
