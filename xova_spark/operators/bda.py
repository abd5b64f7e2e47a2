"""Baseline-dependent averaging (BDA) — the reference's second pipeline.

Re-expresses ``xova bda`` (reference: xova/apps/xova/averaging.py:270-354
— kernel call :338-342, SPW/DDID regeneration :436-722; CLI defaults
arguments.py:135-146) as the two-phase Spark plan SURVEY §2.4/A2
prescribes:

  phase 1 — deterministic per-baseline bin parameters from the standard
  interferometric smearing model (public formulas: Bridle & Schwab 1999,
  "Bandwidth and Time-Average Smearing"; Thompson/Moran/Swenson ch. 6):

    time decorrelation      R_t = sinc(omega_E * |b_uv| * (nu/c) * sin(fov) * dt)
    bandwidth decorrelation R_f = sinc(dnu * |b_uv| * sin(fov) / c)

  holding R >= `decorrelation` gives per-baseline caps

    dt_max  = KT / (|b_uv| * nu_max)   with KT = x_max * C_LIGHT / (OMEGA_E * sin_fov)
    dnu_max = KF /  |b_uv|             with KF = x_max * C_LIGHT / sin_fov

  where x_max = sinc^-1(decorrelation) is solved ONCE driver-side by
  bisection. KT/KF are embedded as exact repr() literals in both the
  Spark expression and the DuckDB oracle SQL, so ALL query-time
  arithmetic is IEEE *, /, sqrt, floor — bit-identical across engines
  (no transcendental libm calls whose last ulp could differ).

  Long baselines therefore average few integrations / few channels, and
  short baselines many — the defining BDA behavior. The time cap becomes
  an integration count n_int = clamp(floor(dt_max / interval), 1,
  floor(time_bin_secs / interval)) (the reference's optional
  --time-bin-secs cap, arguments.py:135-137); the channel cap becomes
  the largest divisor of NUM_CHAN whose merged width fits dnu_max while
  keeping >= min_nchan output channels (the reference's "factorization
  of nchan >= min_nchan", arguments.py:142-146).

  phase 2 — plain groupBy().agg() with the A1a per-column semantics on
  the derived (baseline, time_bin) / (baseline, time_bin, chan_bin)
  keys. Ragged output (different baselines -> different output channel
  counts, averaging.py:317 'ragged') is natural in the long layout: the
  per-row NUM_CHAN / DECORR_CHAN_WIDTH columns (averaging.py:159-164)
  ride along as group constants.

Scale design: phase 1 is one narrow aggregation over (partition,
baseline) — output cardinality #partitions x #baselines, tiny versus the
row table, so the params join back to rows/vis is a broadcast. Phase 2
is one shuffle each for rows and vis, both keyed on the (partition,
baseline) prefix. The SPW/DDID regeneration operates on the distinct
channelisation set (A4/A5) — driver-scale data, broadcast back (J3).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xova_spark.operators.timechannel import BIN_KEYS, BL_KEYS, PART_KEYS, _fallback

C_LIGHT = 299792458.0  # m/s
OMEGA_E = 7.292115e-5  # Earth sidereal rotation rate, rad/s


def sinc_inverse(decorr: float) -> float:
    """Solve sinc(x) = sin(pi x)/(pi x) = decorr for x in (0, 1) by
    bisection (sinc is monotone decreasing there). Driver-side only."""
    if not 0.0 < decorr < 1.0:
        raise ValueError("decorrelation must be in (0, 1)")
    lo, hi = 0.0, 1.0
    for _ in range(200):
        mid = (lo + hi) / 2
        val = math.sin(math.pi * mid) / (math.pi * mid) if mid > 0 else 1.0
        if val > decorr:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def bda_constants(
    decorrelation: float = 0.95, max_fov: float = 1.0
) -> tuple[float, float]:
    """(KT, KF) smearing constants; max_fov in degrees (the reference's
    --max-fov, arguments.py:140-141), radius = fov/2."""
    x_max = sinc_inverse(decorrelation)
    sin_fov = math.sin(math.radians(max_fov) / 2.0)
    kt = x_max * C_LIGHT / (OMEGA_E * sin_fov)
    kf = x_max * C_LIGHT / sin_fov
    return kt, kf


def ddid_dims(tables: dict) -> DataFrame:
    """Per-DDID spectral facts needed by the decorrelation model:
    nu_max (top channel edge — worst-case smearing), chan_width,
    NUM_CHAN. Reference joins the same columns at averaging.py:306-308."""
    spw = tables["spw_chans"].groupBy("SPECTRAL_WINDOW_ID").agg(
        F.max(F.col("CHAN_FREQ") + F.col("CHAN_WIDTH") / 2).alias("nu_max"),
        F.max("CHAN_WIDTH").alias("chan_width"),
    )
    return (
        tables["ddid"]
        .join(F.broadcast(spw), "SPECTRAL_WINDOW_ID")
        .join(
            F.broadcast(tables["spw_meta"].select("SPECTRAL_WINDOW_ID", "NUM_CHAN")),
            "SPECTRAL_WINDOW_ID",
        )
        .select("DATA_DESC_ID", "SPECTRAL_WINDOW_ID", "nu_max", "chan_width", "NUM_CHAN")
    )


def bin_params(
    rows: DataFrame,
    dims: DataFrame,
    decorrelation: float = 0.95,
    max_fov: float = 1.0,
    time_bin_secs: float = 16.0,
    min_nchan: int = 1,
) -> DataFrame:
    """Phase 1: per (partition, baseline) BDA bin parameters.

    Columns out: PART_KEYS + BL_KEYS, bl_uv (max projected baseline),
    t0, interval_nom, n_int (integrations per time bin), chan_fac
    (channels merged per output channel), out_nchan, decorr_chan_width.
    """
    kt, kf = bda_constants(decorrelation, max_fov)
    per_bl = rows.groupBy(*PART_KEYS, *BL_KEYS).agg(
        F.max(F.sqrt(F.col("u") * F.col("u") + F.col("v") * F.col("v"))).alias(
            "bl_uv"
        ),
        F.min("TIME").alias("t0"),
        F.min("INTERVAL").alias("interval_nom"),
    )
    p = per_bl.join(F.broadcast(dims), "DATA_DESC_ID")
    dt_max = F.lit(kt) / (F.col("bl_uv") * F.col("nu_max"))
    cap_n = F.floor(F.lit(time_bin_secs) / F.col("interval_nom"))
    n_int = F.greatest(
        F.lit(1).cast("long"),
        F.least(cap_n, F.floor(dt_max / F.col("interval_nom"))),
    )
    dnu_max = F.lit(kf) / F.col("bl_uv")
    nchan, width = F.col("NUM_CHAN"), F.col("chan_width")
    # Largest divisor d of NUM_CHAN with d*width <= dnu_max and
    # NUM_CHAN/d >= min_nchan; d=1 always admissible (no averaging).
    chan_fac = F.coalesce(
        F.array_max(
            F.filter(
                F.sequence(F.lit(1), nchan),
                lambda d: (nchan % d == 0)
                & ((d == 1) | (d.cast("double") * width <= dnu_max))
                & (nchan / d >= F.lit(min_nchan)),
            )
        ),
        F.lit(1),
    )
    return (
        p.withColumn("n_int", n_int)
        .withColumn("chan_fac", chan_fac)
        .withColumn("out_nchan", (nchan / F.col("chan_fac")).cast("int"))
        .withColumn("decorr_chan_width", F.col("chan_fac").cast("double") * width)
        .select(
            *PART_KEYS,
            *BL_KEYS,
            "bl_uv",
            "t0",
            "interval_nom",
            "n_int",
            "chan_fac",
            "out_nchan",
            "decorr_chan_width",
        )
    )


def assign_bins(rows: DataFrame, params: DataFrame) -> DataFrame:
    """Attach the per-baseline time_bin (floor of the time offset over
    the baseline-dependent bin length) plus the channelisation columns.
    The params side is broadcast — it is #partitions x #baselines rows."""
    j = rows.join(F.broadcast(params), PART_KEYS + BL_KEYS)
    return j.withColumn(
        "time_bin",
        F.floor(
            (F.col("TIME") - F.col("t0"))
            / (F.col("n_int").cast("double") * F.col("interval_nom"))
        ).cast("int"),
    )


def average_rows(binned: DataFrame, with_row_id: bool = False) -> DataFrame:
    """Phase 2a: A1a row-level aggregation on BDA bins + the ragged
    NUM_CHAN / DECORR_CHAN_WIDTH outputs (averaging.py:159-164).

    ``with_row_id`` adds row_id = min(input row_id) per bin (the rep
    surrogate) so written BDA output satisfies the load_ms row-identity
    contract and is check-able/re-openable."""
    fr = F.col("FLAG_ROW")
    unfl = ~fr
    extra = [F.min("row_id").alias("row_id")] if with_row_id else []
    return binned.groupBy(*BIN_KEYS).agg(
        *extra,
        F.avg("TIME").alias("TIME"),
        F.sum("INTERVAL").alias("INTERVAL"),
        _fallback(F.sum(F.when(unfl, F.col("EXPOSURE"))), F.sum("EXPOSURE")).alias(
            "EXPOSURE"
        ),
        _fallback(
            F.sum(F.when(unfl, F.col("EXPOSURE") * F.col("TIME_CENTROID")))
            / F.sum(F.when(unfl, F.col("EXPOSURE"))),
            F.sum(F.col("EXPOSURE") * F.col("TIME_CENTROID")) / F.sum("EXPOSURE"),
        ).alias("TIME_CENTROID"),
        *[
            _fallback(F.avg(F.when(unfl, F.col(c))), F.avg(F.col(c))).alias(c)
            for c in ("u", "v", "w")
        ],
        F.bool_and(fr).alias("FLAG_ROW"),
        F.count("*").alias("n_rows"),
        F.any_value("out_nchan").alias("NUM_CHAN"),
        F.any_value("decorr_chan_width").alias("DECORR_CHAN_WIDTH"),
    )


def bin_map(binned: DataFrame) -> DataFrame:
    """row_id -> BDA bin key + chan_fac + row flag, the join map for the
    visibility aggregation (analogue of timechannel.bin_map).

    Also carries ``rep`` — min(row_id) within the bin — a SINGLE-column
    surrogate for the 6-column bin key. The visibility aggregation
    groups on (rep, chan_bin, corr) instead of 8 wide columns: ~3x
    faster at bench scale (narrower hash keys + narrower shuffle rows;
    the wide keys are re-attached afterwards by joining the rep -> keys
    dim — join strategy left to AQE). The window below runs on the ROW
    table, not the visibility table — cheap."""
    w = Window.partitionBy(*BIN_KEYS)
    return binned.withColumn("rep", F.min("row_id").over(w)).select(
        "row_id", "rep", *BIN_KEYS, "chan_fac", "FLAG_ROW"
    )


def average_vis(
    vis: DataFrame,
    bins: DataFrame,
    keep_rep: bool = False,
    map_broadcast_rows: int | None = None,
) -> DataFrame:
    """Phase 2b: ragged visibility averaging — chan_bin width varies per
    baseline (chan_fac), A1a weighted-mean semantics with fully-flagged
    fallback. One shuffle of the big table, keyed on the compact
    (rep, chan_bin, corr) surrogate."""
    # Both the row -> bin map (one entry per MS row) and the rep -> keys
    # dim (one entry per output bin) scale with the input: the broadcast
    # hint is SIZE-GATED by one planning count (the reference's eager
    # plan-pass analogue, chunking.py:281-285). Small -> hinted
    # single-shuffle plan; at 100 TB -> plain joins, AQE decides.
    from xova_spark.operators.timechannel import map_fits_broadcast

    fits = map_fits_broadcast(bins, map_broadcast_rows)
    narrow = bins.select("row_id", "rep", "chan_fac")
    dim = bins.select("rep", *BIN_KEYS).distinct()
    if fits:
        narrow, dim = F.broadcast(narrow), F.broadcast(dim)
    j = vis.join(narrow, "row_id").withColumn(
        "chan_bin", F.floor(F.col("chan") / F.col("chan_fac")).cast("int")
    )
    fl, w = F.col("flag"), F.col("weight_sp")
    s = F.col("sigma_sp")
    n_unfl = F.count(F.when(~fl, F.lit(1)))

    def wmean(x):
        return F.when(
            n_unfl > 0, F.sum(F.when(~fl, w * x)) / F.sum(F.when(~fl, w))
        ).otherwise(F.sum(w * x) / F.sum(w))

    sum_w = F.when(n_unfl > 0, F.sum(F.when(~fl, w))).otherwise(F.sum(w))
    sum_w2s2 = F.when(n_unfl > 0, F.sum(F.when(~fl, w * w * s * s))).otherwise(
        F.sum(w * w * s * s)
    )
    agg = j.groupBy("rep", "chan_bin", "corr").agg(
        wmean(F.col("vis_re")).alias("vis_re"),
        wmean(F.col("vis_im")).alias("vis_im"),
        F.bool_and(fl).alias("flag"),
        sum_w.alias("weight_sp"),
        (F.sqrt(sum_w2s2) / sum_w).alias("sigma_sp"),
        F.count("*").alias("n_samples"),
    )
    head = ["rep", *BIN_KEYS] if keep_rep else BIN_KEYS
    return agg.join(dim, "rep").select(  # dim already hint-wrapped above
        *head,
        "chan_bin",
        "corr",
        "vis_re",
        "vis_im",
        "flag",
        "weight_sp",
        "sigma_sp",
        "n_samples",
    )


def spw_grid(params: DataFrame, tables: dict) -> DataFrame:
    """V3: regenerate SPECTRAL_WINDOW rows for the ragged output — one
    new SPW per distinct (original SPW, out_nchan) channelisation, its
    channel grid a uniform linspace over the original band
    (averaging.py:504-523). NEW_SPW_ID = dense_rank over the distinct
    set (deterministic). Driver-scale data: the distinct set has at most
    #SPWs x #divisors rows."""
    from pyspark.sql import Window

    band = tables["spw_chans"].groupBy("SPECTRAL_WINDOW_ID").agg(
        F.min(F.col("CHAN_FREQ") - F.col("CHAN_WIDTH") / 2).alias("f_start"),
        F.sum("CHAN_WIDTH").alias("band"),
    )
    ddid = tables["ddid"].select("DATA_DESC_ID", "SPECTRAL_WINDOW_ID")
    distinct = (
        params.join(F.broadcast(ddid), "DATA_DESC_ID")
        .select("SPECTRAL_WINDOW_ID", "out_nchan")
        .distinct()
    )
    w = Window.orderBy("SPECTRAL_WINDOW_ID", "out_nchan")
    keyed = distinct.withColumn(
        "NEW_SPW_ID", (F.dense_rank().over(w) - 1).cast("int")
    ).join(F.broadcast(band), "SPECTRAL_WINDOW_ID")
    new_width = F.col("band") / F.col("out_nchan").cast("double")
    return (
        keyed.withColumn("chan", F.explode(F.sequence(F.lit(0), F.col("out_nchan") - 1)))
        .select(
            "NEW_SPW_ID",
            "SPECTRAL_WINDOW_ID",
            F.col("out_nchan").alias("NUM_CHAN"),
            F.col("chan").cast("int").alias("chan"),
            (
                F.col("f_start")
                + (F.col("chan").cast("double") + 0.5) * new_width
            ).alias("CHAN_FREQ"),
            new_width.alias("CHAN_WIDTH"),
            F.col("band").alias("TOTAL_BANDWIDTH"),
        )
    )


def ddid_map(params: DataFrame, tables: dict) -> DataFrame:
    """J3: old (DATA_DESC_ID, out_nchan) -> NEW_DATA_DESC_ID /
    NEW_SPW_ID broadcast remap (averaging.py:527-547,693-698).
    POLARIZATION_ID carries over unchanged."""
    from pyspark.sql import Window

    ddid = tables["ddid"]
    distinct = (
        params.join(F.broadcast(ddid), "DATA_DESC_ID")
        .select("DATA_DESC_ID", "SPECTRAL_WINDOW_ID", "POLARIZATION_ID", "out_nchan")
        .distinct()
    )
    wd = Window.orderBy("DATA_DESC_ID", "out_nchan")
    ws = Window.orderBy("SPECTRAL_WINDOW_ID", "out_nchan")
    return (
        distinct.withColumn(
            "NEW_DATA_DESC_ID", (F.dense_rank().over(wd) - 1).cast("int")
        )
        .withColumn("NEW_SPW_ID", (F.dense_rank().over(ws) - 1).cast("int"))
        .select(
            "DATA_DESC_ID",
            "out_nchan",
            "NEW_DATA_DESC_ID",
            "NEW_SPW_ID",
            "POLARIZATION_ID",
        )
    )


def bda(
    tables: dict,
    decorrelation: float = 0.95,
    max_fov: float = 1.0,
    time_bin_secs: float = 16.0,
    min_nchan: int = 1,
    fields: list[int] | None = None,
    scans: list[int] | None = None,
) -> dict:
    """Full BDA pipeline (ref averaging.py:270-354 + 550-722): averaged
    main-table parts with remapped DATA_DESC_ID, regenerated SPW/DDID.

    Like timechannel(), the output satisfies the load_ms contract so a
    written BDA MS re-opens and `check`-validates: main tables carry
    row_id (the bin's rep surrogate), ms_rows.DATA_DESC_ID points at the
    REMINTED ddid table (one row per distinct channelisation,
    averaging.py:527-547), and spw_chans/spw_meta describe the new
    uniform grids. The ragged-specific ``spw``/``ddid_map`` views are
    kept alongside for lineage. Unknown subtables pass through
    (subtables.py:9-37)."""
    rows = tables["ms_rows"]
    if fields:
        rows = rows.filter(F.col("FIELD_ID").isin(fields))
    if scans:
        rows = rows.filter(F.col("SCAN_NUMBER").isin(scans))
    params = bin_params(
        rows, ddid_dims(tables), decorrelation, max_fov, time_bin_secs, min_nchan
    )
    binned = assign_bins(rows, params)
    dmap = ddid_map(params, tables)
    grid = spw_grid(params, tables)
    bins = bin_map(binned)
    remapped = _remap_rows(average_rows(binned, with_row_id=True), dmap)
    rewritten = {
        "ms_rows", "ms_weights", "ms_vis", "spw_chans", "spw_meta", "ddid"
    }
    from xova_spark.operators.timechannel import average_weights

    out_weights = None
    if "ms_weights" in tables:
        out_weights = (
            average_weights(tables["ms_weights"], bins, keep_rep=True)
            .withColumnRenamed("rep", "row_id")
        )
    return {
        "ms_rows": remap_main(remapped),
        **({"ms_weights": out_weights} if out_weights is not None else {}),
        "ms_vis": (
            average_vis(tables["ms_vis"], bins, keep_rep=True)
            .withColumnRenamed("rep", "row_id")
            .withColumnRenamed("chan_bin", "chan")
        ),
        "spw": grid,
        "ddid_map": dmap,
        **conformant_subtables(dmap, grid),
        **{k: v for k, v in tables.items() if k not in rewritten},
    }


def remap_main(remapped: DataFrame) -> DataFrame:
    """Point the averaged rows' DATA_DESC_ID at the REMINTED ddid table
    (averaging.py:693-705): the original id is kept as ORIG_DATA_DESC_ID
    for lineage; rows whose channelisation had no remint (none in
    practice — the map is built from the same distinct set) keep the
    original."""
    return (
        remapped.withColumn("ORIG_DATA_DESC_ID", F.col("DATA_DESC_ID"))
        .withColumn(
            "DATA_DESC_ID", F.coalesce("NEW_DATA_DESC_ID", "DATA_DESC_ID")
        )
        .drop("NEW_DATA_DESC_ID")
    )


def conformant_subtables(dmap: DataFrame, grid: DataFrame) -> dict:
    """DDID / SPW subtables under the standard names and schemas so a
    written BDA output re-opens through load_ms and passes `check`
    (V3 wiring, averaging.py:707-720). EFFECTIVE_BW/RESOLUTION equal
    CHAN_WIDTH on the regenerated uniform grid."""
    return {
        "ddid": dmap.select(
            F.col("NEW_DATA_DESC_ID").alias("DATA_DESC_ID"),
            F.col("NEW_SPW_ID").alias("SPECTRAL_WINDOW_ID"),
            "POLARIZATION_ID",
        ).distinct(),
        "spw_chans": grid.select(
            F.col("NEW_SPW_ID").alias("SPECTRAL_WINDOW_ID"),
            "chan",
            "CHAN_FREQ",
            "CHAN_WIDTH",
            F.col("CHAN_WIDTH").alias("EFFECTIVE_BW"),
            F.col("CHAN_WIDTH").alias("RESOLUTION"),
        ),
        "spw_meta": grid.groupBy(
            F.col("NEW_SPW_ID").alias("SPECTRAL_WINDOW_ID")
        ).agg(
            F.any_value("NUM_CHAN").alias("NUM_CHAN"),
            F.any_value("TOTAL_BANDWIDTH").alias("TOTAL_BANDWIDTH"),
            F.min("CHAN_FREQ").alias("REF_FREQUENCY"),
        ),
    }


def _remap_rows(avg_rows: DataFrame, dmap: DataFrame) -> DataFrame:
    """Apply the J3 DDID remap to the averaged rows: the output NUM_CHAN
    selects which reminted DDID a row points at."""
    m = dmap.select(
        "DATA_DESC_ID", F.col("out_nchan").alias("NUM_CHAN"), "NEW_DATA_DESC_ID"
    )
    return avg_rows.join(F.broadcast(m), ["DATA_DESC_ID", "NUM_CHAN"], "left")


def greedy_bda_map(rows: DataFrame, params: DataFrame) -> DataFrame:
    """Bit-greedy BDA time binning (A2 x A7): per (partition, baseline),
    walk rows in TIME order accumulating each row's ACTUAL INTERVAL and
    close the bin when adding the next integration would exceed the
    baseline's decorrelation budget (n_int * interval_nom — the same
    quantized cap assign_bins uses).

    This is the accumulate-and-reset closure of the reference's
    chunking.py:125-157 applied per baseline, i.e. the greedy semantics
    of africanus's bda kernel (averaging.py:338-342): the reset makes
    it non-associative, hence not window-expressible — one of SURVEY
    §2.9's legitimate applyInPandas sites. On uniform cadence it
    coincides with assign_bins' floor binning (the oracle gate); on
    irregular cadence (dropped integrations, mixed dump times) it
    adapts where the floor grid would mis-bin.

    Scale: runs on the ROW table joined to the broadcast params —
    #rows per group = #times (thousands), never visibility-sized.
    Returns the (row_id -> time_bin) map; broadcast it back onto
    assign_bins' output to swap binning disciplines.

    Physical shape: ONE mapInPandas pass over the row table hash-
    repartitioned on the group keys (all rows of a baseline co-located
    by construction), with group boundaries detected vectorized inside
    the batch — NOT groupBy().applyInPandas, whose per-group pandas
    construction cost dominates when groups are small (measured on the
    960-group fixture: 3.4 s -> 0.6 s for the identical map). The
    accumulate-reset walk itself is the same non-associative closure.
    """
    import numpy as np
    import pandas as pd

    keys = PART_KEYS + BL_KEYS
    j = (
        rows.join(
            F.broadcast(params.select(*keys, "n_int", "interval_nom")),
            keys,
        )
        .select(*keys, "row_id", "TIME", "INTERVAL", "n_int", "interval_nom")
        .repartition(*keys)
    )

    def assign_part(batches):
        pdfs = [b for b in batches if len(b)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf = pdf.sort_values([*keys, "TIME", "row_id"], kind="mergesort")
        kmat = pdf[keys].to_numpy()
        n = len(pdf)
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = (kmat[1:] != kmat[:-1]).any(axis=1)
        iv = pdf["INTERVAL"].to_numpy(dtype=np.float64)
        # n_int/interval_nom are group-constant (joined on the group
        # keys), so the per-row product is the group budget everywhere.
        budget = pdf["n_int"].to_numpy(dtype=np.float64) * pdf[
            "interval_nom"
        ].to_numpy(dtype=np.float64)
        bins = np.empty(n, dtype=np.int32)
        bin_id, acc = 0, 0.0
        for i in range(n):
            if new_grp[i]:
                bin_id, acc = 0, 0.0
            elif acc + iv[i] > budget[i]:
                bin_id += 1
                acc = 0.0
            bins[i] = bin_id
            acc += iv[i]
        yield pd.DataFrame(
            {"row_id": pdf["row_id"].to_numpy(), "time_bin": bins}
        )

    return j.mapInPandas(assign_part, "row_id long, time_bin int")
