"""Schema-conformance validator — the ``xova check`` subcommand.

Re-expresses the reference's TAQL shape check (reference:
xova/apps/xova/check.py:22-76 — ``SELECT *, SHAPE(DATA) AS DATA_SHAPE``,
then per-row comparison against DDID→SPW/POL joined dimensions) as one
validation DataFrame query: count actual (chan, corr) samples per row,
broadcast-join the expected NUM_CHAN/NUM_CORR through DATA_DESCRIPTION,
and keep only violations. An empty result == a conformant MS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_ms(tables: dict) -> DataFrame:
    """Return rows whose visibility cube shape violates the
    DDID -> (SPW.NUM_CHAN, POL.NUM_CORR) contract (ref check.py:38-52)."""
    shapes = tables["ms_vis"].groupBy("row_id").agg(
        (F.max("chan") + 1).alias("actual_nchan"),
        (F.max("corr") + 1).alias("actual_ncorr"),
        F.count("*").alias("n_samples"),
    )
    expected = (
        tables["ddid"]
        .join(F.broadcast(tables["spw_meta"]), "SPECTRAL_WINDOW_ID")
        .join(F.broadcast(tables["pol"]), "POLARIZATION_ID")
        .select("DATA_DESC_ID", "NUM_CHAN", "NUM_CORR")
    )
    joined = (
        tables["ms_rows"]
        .select("row_id", "DATA_DESC_ID")
        .join(shapes, "row_id")
        .join(F.broadcast(expected), "DATA_DESC_ID")
    )
    return joined.filter(
        (F.col("actual_nchan") != F.col("NUM_CHAN"))
        | (F.col("actual_ncorr") != F.col("NUM_CORR"))
        | (F.col("n_samples") != F.col("NUM_CHAN") * F.col("NUM_CORR"))
    )


def check_spw(tables: dict) -> DataFrame:
    """Subtable invariants (ref averaging.py:488-493 + check.py:54-76):
    CHAN_FREQ strictly increasing, non-empty SPWs, array length == NUM_CHAN.
    Returns one row per violating SPW."""
    from pyspark.sql import Window

    w = Window.partitionBy("SPECTRAL_WINDOW_ID").orderBy("chan")
    chans = tables["spw_chans"].withColumn(
        "prev_freq", F.lag("CHAN_FREQ").over(w)
    )
    per_spw = chans.groupBy("SPECTRAL_WINDOW_ID").agg(
        F.count("*").alias("n_chans"),
        F.max(
            F.when(
                F.col("prev_freq").isNotNull()
                & (F.col("CHAN_FREQ") <= F.col("prev_freq")),
                1,
            ).otherwise(0)
        ).alias("non_increasing"),
    )
    meta = tables["spw_meta"].select("SPECTRAL_WINDOW_ID", "NUM_CHAN")
    return (
        per_spw.join(F.broadcast(meta), "SPECTRAL_WINDOW_ID")
        .filter(
            (F.col("n_chans") != F.col("NUM_CHAN"))
            | (F.col("n_chans") == 0)
            | (F.col("non_increasing") == 1)
        )
    )
