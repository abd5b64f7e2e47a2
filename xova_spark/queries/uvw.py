"""UVW synthesis query pack — the fixvis surface under the oracle gate.

Hash-exactness note: sin/cos are the one place Spark (Java Math) and
DuckDB (libm) may differ in the last ulp, so every trigonometric output
is ``round(x, 5) + 0.0`` on BOTH sides (the +0.0 folds -0.0 to 0.0).
All inputs to the trig calls are exact IEEE arithmetic (the ERA
fractional-turn trick keeps angles identical across engines), so the
rounded values agree.

``uvw_apply_pandas_synthesis`` is registered WITHOUT an oracle — the
per-group pandas kernel is the reference's irreducibly-procedural path
(fixvis.py:105-193) and is instead cross-checked against the
column-expression variant in tests/test_uvw.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.operators import timechannel as tc
from xova_spark.operators import uvw as U
from xova_spark.queries.msdomain import TIME_BIN_SECS, _BIN_CTE, _TC_ROWS_SELECT
from xova_spark.sources.ms_fixture import load_ms, ms_fixture_dir

REGISTRY: dict[str, tuple] = {}

_DIR = ms_fixture_dir()


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _ms(spark):
    return load_ms(spark, _DIR)


# The exact expression text mirrored by the Spark column builder.
_ERA = (
    f"2.0 * pi() * (({U.ERA_0!r} + {U.ERA_RATE!r} * (TIME / 86400.0 - {U.MJD_EPOCH!r}))"
    f" - floor({U.ERA_0!r} + {U.ERA_RATE!r} * (TIME / 86400.0 - {U.MJD_EPOCH!r})))"
)

_SYNTH_CTE = f"""
WITH j AS (
    SELECT r.row_id, r.TIME, r.FIELD_ID, r.ANTENNA1, r.ANTENNA2,
        a2.pos_x - a1.pos_x AS bx,
        a2.pos_y - a1.pos_y AS by,
        a2.pos_z - a1.pos_z AS bz,
        f.PHASE_DIR_RA AS ra, f.PHASE_DIR_DEC AS dec
    FROM read_parquet('{_DIR}/ms_rows.parquet') r
    JOIN read_parquet('{_DIR}/antenna.parquet') a1
        ON a1.ANTENNA_ID = r.ANTENNA1
    JOIN read_parquet('{_DIR}/antenna.parquet') a2
        ON a2.ANTENNA_ID = r.ANTENNA2
    JOIN read_parquet('{_DIR}/field.parquet') f USING (FIELD_ID)
), s AS (
    SELECT row_id, bx, by, bz, dec,
        {_ERA} - ra AS h
    FROM j
)
SELECT row_id,
    round(sin(h) * bx + cos(h) * by, 5) + 0.0 AS u2,
    round(-sin(dec) * cos(h) * bx + sin(dec) * sin(h) * by
          + cos(dec) * bz, 5) + 0.0 AS v2,
    round(cos(dec) * cos(h) * bx - cos(dec) * sin(h) * by
          + sin(dec) * bz, 5) + 0.0 AS w2
FROM s
"""


def _rounded(df):
    return df.select(
        "row_id",
        *[
            (F.round(F.col(c), 5) + F.lit(0.0)).alias(c)
            for c in ("u2", "v2", "w2")
        ],
    )


@q("uvw_synthesis", _SYNTH_CTE)
def uvw_synthesis(spark, sf_dir):
    """V4 column-expression UVW synthesis (fixvis.py:105-193 as pure
    whole-stage-codegen trigonometry + broadcast joins)."""
    t = _ms(spark)
    return _rounded(U.uvw_columns(t["ms_rows"], t["antenna"], t["field"]))


@q(
    "uvw_dense_sparse_join",
    f"""
SELECT count(*) AS n_rows, 0 AS n_mismatch
FROM read_parquet('{_DIR}/ms_rows.parquet')
""",
)
def uvw_dense_sparse_join(spark, sf_dir):
    """J2: dense (time, baseline) synthesis joined back sparsely must
    reproduce the per-row computation row-for-row (the reference's
    dense-lookup invariant, tests/test_fixvis.py:118-131)."""
    t = _ms(spark)
    direct = U.uvw_columns(t["ms_rows"], t["antenna"], t["field"])
    via_join = U.uvw_dense_sparse(t["ms_rows"], t["antenna"], t["field"])
    d = direct.select("row_id", "u2", "v2", "w2")
    v = via_join.select(
        "row_id",
        F.col("u2").alias("ju"),
        F.col("v2").alias("jv"),
        F.col("w2").alias("jw"),
    )
    j = d.join(v, "row_id")
    mismatch = (
        (F.abs(F.col("u2") - F.col("ju")) > 1e-9)
        | (F.abs(F.col("v2") - F.col("jv")) > 1e-9)
        | (F.abs(F.col("w2") - F.col("jw")) > 1e-9)
    )
    return j.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(mismatch, 1)).cast("int").alias("n_mismatch"),
    )


@q(
    "uvw_fixms_rows",
    _BIN_CTE
    + f""", avg AS (
{_TC_ROWS_SELECT.format(where="")}
), j AS (
    SELECT avg.*, a2.pos_x - a1.pos_x AS bx, a2.pos_y - a1.pos_y AS by,
        a2.pos_z - a1.pos_z AS bz,
        f.PHASE_DIR_RA AS ra, f.PHASE_DIR_DEC AS dec
    FROM avg
    JOIN read_parquet('{_DIR}/antenna.parquet') a1
        ON a1.ANTENNA_ID = avg.ANTENNA1
    JOIN read_parquet('{_DIR}/antenna.parquet') a2
        ON a2.ANTENNA_ID = avg.ANTENNA2
    JOIN read_parquet('{_DIR}/field.parquet') f USING (FIELD_ID)
), s AS (
    SELECT FIELD_ID, DATA_DESC_ID, SCAN_NUMBER, ANTENNA1, ANTENNA2, time_bin,
        TIME, bx, by, bz, dec, {_ERA} - ra AS h
    FROM j
)
SELECT FIELD_ID, DATA_DESC_ID, SCAN_NUMBER, ANTENNA1, ANTENNA2, time_bin,
    TIME,
    round(sin(h) * bx + cos(h) * by, 5) + 0.0 AS u,
    round(-sin(dec) * cos(h) * bx + sin(dec) * sin(h) * by
          + cos(dec) * bz, 5) + 0.0 AS v,
    round(cos(dec) * cos(h) * bx - cos(dec) * sin(h) * by
          + sin(dec) * bz, 5) + 0.0 AS w
FROM s
""",
)
def uvw_fixms_rows(spark, sf_dir):
    """V4 composed with A1: time-averaged rows with UVW re-synthesized
    at the averaged TIME, joined before the single final write (the
    idiomatic restructuring of the reference's post-write in-place
    update, fixvis.py:262-265 / app.py:123-128)."""
    t = _ms(spark)
    avg = tc.average_rows(t["ms_rows"], TIME_BIN_SECS)
    fixed = U.fixms(avg, t["antenna"], t["field"])
    return fixed.select(
        *tc.BIN_KEYS,
        "TIME",
        *[(F.round(F.col(c), 5) + F.lit(0.0)).alias(c) for c in ("u", "v", "w")],
    )


@q("uvw_apply_pandas_synthesis", None)
def uvw_apply_pandas_synthesis(spark, sf_dir):
    """J4: per-FIELD applyInPandas synthesis (fixvis.py:240-258) — the
    Arrow-batched procedural path; equality with the column-expression
    variant is asserted in tests/test_uvw.py (no SQL oracle)."""
    t = _ms(spark)
    return _rounded(U.uvw_apply_pandas(t["ms_rows"], t["antenna"], t["field"]))
