"""UVW synthesis tests — ports the reference's property suite
(reference: xova/tests/test_fixvis.py:70-131): synthesis must be
invariant to row deletion and shuffling, the dense->sparse join must
reproduce per-row values, and the three implementation variants
(column-expression, applyInPandas, dense-join) must agree."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from xova_spark.operators import uvw as U
from xova_spark.queries import uvw as Q
from xova_spark.testing import assert_frames_match


@pytest.fixture(scope="module")
def ducon():
    return duckdb.connect()


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_uvw_oracle(spark, ducon, name):
    fn, sql = Q.REGISTRY[name]
    sdf = fn(spark, "").toPandas()
    if sql is None:
        assert len(sdf) > 0
        return
    odf = ducon.execute(sql).df()
    assert_frames_match(sdf, odf)


def _direct(ms):
    return (
        U.uvw_columns(ms["ms_rows"], ms["antenna"], ms["field"])
        .select("row_id", "u2", "v2", "w2")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )


def test_deletion_shuffle_invariance(spark, ms):
    """Synthesis for surviving rows is unchanged when 20% of rows are
    dropped and order is scrambled (test_fixvis.py:91-111)."""
    base = _direct(ms)
    subset = (
        ms["ms_rows"]
        .filter(F.col("row_id") % 5 != 0)  # deterministic 20% deletion
        .orderBy(F.col("ANTENNA2"), F.col("TIME").desc())  # scramble
    )
    sub = (
        U.uvw_columns(subset, ms["antenna"], ms["field"])
        .select("row_id", "u2", "v2", "w2")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    np.testing.assert_array_equal(
        sub.to_numpy(), base.loc[sub.index].to_numpy()
    )


def test_pandas_variant_matches_columns(spark, ms):
    """J4 applyInPandas kernel == column-expression synthesis (same
    math, different execution path)."""
    base = _direct(ms)
    pand = (
        U.uvw_apply_pandas(ms["ms_rows"], ms["antenna"], ms["field"])
        .select("row_id", "u2", "v2", "w2")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    np.testing.assert_allclose(
        pand.to_numpy(), base.to_numpy(), rtol=0, atol=1e-9
    )


def test_dense_sparse_reproduces_direct(spark, ms):
    """J2 dense-join lookup reproduces the per-row computation
    (test_fixvis.py:118-131)."""
    base = _direct(ms)
    dense = (
        U.uvw_dense_sparse(ms["ms_rows"], ms["antenna"], ms["field"])
        .select("row_id", "u2", "v2", "w2")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    np.testing.assert_array_equal(dense.to_numpy(), base.to_numpy())


def test_w_term_geometry(spark, ms):
    """|uvw| is invariant under the rotation: u²+v²+w² == |B|² exactly
    (up to fp) — a physical sanity check on the transform matrix."""
    t = ms
    j = U.uvw_columns(t["ms_rows"], t["antenna"], t["field"])
    a = t["antenna"]
    a1 = a.select(
        F.col("ANTENNA_ID").alias("ANTENNA1"),
        *[F.col(f"pos_{c}").alias(f"{c}1") for c in "xyz"],
    )
    a2 = a.select(
        F.col("ANTENNA_ID").alias("ANTENNA2"),
        *[F.col(f"pos_{c}").alias(f"{c}2") for c in "xyz"],
    )
    withb = j.join(F.broadcast(a1), "ANTENNA1").join(F.broadcast(a2), "ANTENNA2")
    bad = withb.filter(
        F.abs(
            (F.col("u2") ** 2 + F.col("v2") ** 2 + F.col("w2") ** 2)
            - (
                (F.col("x2") - F.col("x1")) ** 2
                + (F.col("y2") - F.col("y1")) ** 2
                + (F.col("z2") - F.col("z1")) ** 2
            )
        )
        > 1e-4
    ).count()
    assert bad == 0


def test_fixms_keeps_averaged_uvw_for_polynomial_centres(spark, ms):
    """The reference refuses UVW resynthesis when any field's phase
    centre is a time polynomial (NUM_POLY > 0, fixvis.py:213-218) and
    keeps the averaged coordinates; fixms must mirror that guard."""
    poly_field = ms["field"].withColumn(
        "NUM_POLY",
        F.when(F.col("FIELD_ID") == 0, F.lit(1)).otherwise(F.col("NUM_POLY")),
    )
    rows = ms["ms_rows"]
    out = U.fixms(rows, ms["antenna"], poly_field)
    base = rows.select("row_id", "u", "v", "w").toPandas().set_index("row_id")
    got = out.select("row_id", "u", "v", "w").toPandas().set_index("row_id")
    assert (got.sort_index() == base.sort_index()).all().all()
    # and with all-zero NUM_POLY the synthesis DOES replace them
    replaced = U.fixms(rows, ms["antenna"], ms["field"])
    got2 = replaced.select("row_id", "u", "v", "w").toPandas().set_index("row_id")
    assert (got2.sort_index() != base.sort_index()).any().any()
