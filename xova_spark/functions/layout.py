"""Layout adapters: normalized long form ⇄ MS-shaped nested arrays.

SURVEY §1.4 picks the long layout for the averaging core and promises
"array-form import/export adapters at the edges to mirror the MS
shape" — these are those adapters. The array form is one row per MS
row with (chan, corr)-indexed nested arrays: DATA as
array<array<struct<re,im>>> (the complex64 cube as re/im pairs,
reference: xova/apps/xova/averaging.py:150-157), FLAG / WEIGHT_SPECTRUM
/ SIGMA_SPECTRUM as matching array<array<...>>.

Both directions are pure Catalyst (sort_array/collect_list out,
posexplode back) — deterministic element order by construction, so
to_long_form(to_array_form(x)) == x exactly.

Scale note: the array form concentrates a row's whole cube in one
record (fine: MS rows are KB-sized); the explode back multiplies rows
before any shuffle, exactly like the multimodal frame explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIS_FIELDS = ("vis_re", "vis_im", "flag", "weight_sp", "sigma_sp")


def to_array_form(vis: DataFrame) -> DataFrame:
    """Long (row_id, chan, corr, ...) -> one row per row_id with nested
    [chan][corr] arrays. Two aggregations, both keyed on row_id
    prefixes (a single shuffle when the input is already row_id-
    clustered, e.g. bucketed storage)."""
    cell = F.struct(
        F.col("corr"),
        F.struct(F.col("vis_re").alias("re"), F.col("vis_im").alias("im")).alias(
            "v"
        ),
        F.col("flag"),
        F.col("weight_sp"),
        F.col("sigma_sp"),
    )
    per_chan = vis.groupBy("row_id", "chan").agg(
        F.sort_array(F.collect_list(cell)).alias("cells")
    )
    chan_row = per_chan.select(
        "row_id",
        F.struct(
            F.col("chan"),
            F.transform("cells", lambda c: c["v"]).alias("data"),
            F.transform("cells", lambda c: c["flag"]).alias("flag"),
            F.transform("cells", lambda c: c["weight_sp"]).alias("weight_sp"),
            F.transform("cells", lambda c: c["sigma_sp"]).alias("sigma_sp"),
        ).alias("chan_cells"),
    )
    rows = chan_row.groupBy("row_id").agg(
        F.sort_array(F.collect_list("chan_cells")).alias("chans")
    )
    return rows.select(
        "row_id",
        F.transform("chans", lambda c: c["data"]).alias("DATA"),
        F.transform("chans", lambda c: c["flag"]).alias("FLAG"),
        F.transform("chans", lambda c: c["weight_sp"]).alias("WEIGHT_SPECTRUM"),
        F.transform("chans", lambda c: c["sigma_sp"]).alias("SIGMA_SPECTRUM"),
    )


def to_long_form(arrayed: DataFrame) -> DataFrame:
    """Inverse adapter: nested [chan][corr] arrays -> one row per
    (row_id, chan, corr) sample."""
    chans = arrayed.select(
        "row_id",
        F.posexplode(
            F.arrays_zip("DATA", "FLAG", "WEIGHT_SPECTRUM", "SIGMA_SPECTRUM")
        ).alias("chan", "c"),
    )
    cells = chans.select(
        "row_id",
        "chan",
        F.posexplode(
            F.arrays_zip(
                F.col("c.DATA").alias("v"),
                F.col("c.FLAG").alias("flag"),
                F.col("c.WEIGHT_SPECTRUM").alias("weight_sp"),
                F.col("c.SIGMA_SPECTRUM").alias("sigma_sp"),
            )
        ).alias("corr", "s"),
    )
    return cells.select(
        "row_id",
        F.col("chan").cast("int").alias("chan"),
        F.col("corr").cast("int").alias("corr"),
        F.col("s.v.re").alias("vis_re"),
        F.col("s.v.im").alias("vis_im"),
        F.col("s.flag").alias("flag"),
        F.col("s.weight_sp").alias("weight_sp"),
        F.col("s.sigma_sp").alias("sigma_sp"),
    )
