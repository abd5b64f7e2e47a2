"""Layout adapter tests: the array form must mirror the MS shape
contract (§1.3 — DATA is [NUM_CHAN][NUM_CORR] per the row's DDID) and
the roundtrip must be the identity (also oracle-gated as
ms_layout_roundtrip)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.functions.layout import to_array_form, to_long_form


def test_array_form_shape_contract(spark, ms):
    arr = to_array_form(ms["ms_vis"])
    dims = (
        ms["ddid"]
        .join(ms["spw_meta"].select("SPECTRAL_WINDOW_ID", "NUM_CHAN"),
              "SPECTRAL_WINDOW_ID")
        .join(ms["pol"].select("POLARIZATION_ID", "NUM_CORR"), "POLARIZATION_ID")
        .select("DATA_DESC_ID", "NUM_CHAN", "NUM_CORR")
    )
    j = (
        arr.join(ms["ms_rows"].select("row_id", "DATA_DESC_ID"), "row_id")
        .join(F.broadcast(dims), "DATA_DESC_ID")
    )
    bad = j.filter(
        (F.size("DATA") != F.col("NUM_CHAN"))
        | (F.size(F.element_at("DATA", 1)) != F.col("NUM_CORR"))
    ).count()
    assert bad == 0
    assert arr.count() == ms["ms_rows"].count()


def test_roundtrip_identity(spark, ms):
    back = to_long_form(to_array_form(ms["ms_vis"]))
    orig = ms["ms_vis"]
    assert back.count() == orig.count()
    # exact anti-join emptiness in both directions
    cols = orig.columns
    assert back.select(cols).exceptAll(orig.select(cols)).count() == 0
    assert orig.select(cols).exceptAll(back.select(cols)).count() == 0
