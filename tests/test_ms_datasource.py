"""Custom MS DataSource tests: equality with the native parquet read,
row-group partitioning, and filter pushdown semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xova_spark.sources.ms_datasource import MSDataSource, MSReader


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(MSDataSource)
    return spark


def test_source_matches_parquet(registered, ms_dir, ms):
    via_source = (
        registered.read.format("xova_ms").load(ms_dir).toPandas().sort_values("row_id")
    )
    via_parquet = ms["ms_rows"].toPandas().sort_values("row_id")
    assert (
        via_source.reset_index(drop=True)
        .eq(via_parquet.reset_index(drop=True))
        .all()
        .all()
    )


def test_source_other_table(registered, ms_dir, ms):
    w = registered.read.format("xova_ms").option("table", "ms_weights").load(ms_dir)
    assert w.count() == ms["ms_weights"].count()


def test_pushed_filter_semantics(registered, ms_dir, ms):
    got = (
        registered.read.format("xova_ms")
        .load(ms_dir)
        .filter((F.col("FIELD_ID") == 0) & (F.col("ANTENNA1") == 3))
        .count()
    )
    want = (
        ms["ms_rows"].filter((F.col("FIELD_ID") == 0) & (F.col("ANTENNA1") == 3)).count()
    )
    assert got == want > 0


def test_unsupported_filters_returned_to_spark(registered, ms_dir, ms):
    """Non-EqualTo predicates are evaluated by Spark post-scan — results
    must still be correct."""
    got = (
        registered.read.format("xova_ms")
        .load(ms_dir)
        .filter((F.col("TIME") > 5.03e9) & (F.col("SCAN_NUMBER") == 1))
        .count()
    )
    want = (
        ms["ms_rows"]
        .filter((F.col("TIME") > 5.03e9) & (F.col("SCAN_NUMBER") == 1))
        .count()
    )
    assert got == want > 0


def test_row_group_stats_skipping():
    """A pushed equality outside a row group's [min, max] skips the
    group entirely."""

    class FakeStats:
        has_min_max = True
        min, max = 2, 5

    class FakeCol:
        path_in_schema = "FIELD_ID"
        statistics = FakeStats()

    class FakeRG:
        num_columns = 1

        def column(self, i):
            return FakeCol()

    class FakeMeta:
        def row_group(self, i):
            return FakeRG()

    r = MSReader("/nonexistent")
    r.eq_filters = [("FIELD_ID", 7)]
    assert not r._row_group_can_match(FakeMeta(), 0)
    r.eq_filters = [("FIELD_ID", 3)]
    assert r._row_group_can_match(FakeMeta(), 0)


# -- CASA MS bridge (sources/casa_ms) ---------------------------------------

def test_load_ms_auto_falls_back_to_parquet(spark, ms_dir):
    """Without python-casacore, a parquet-layout directory loads through
    the fixture loader — the bridge must never be on that path."""
    from xova_spark.sources.casa_ms import is_casa_ms, load_ms_auto

    assert not is_casa_ms(ms_dir)
    tables = load_ms_auto(spark, ms_dir)
    assert tables["ms_rows"].count() > 0


def test_casa_ms_path_raises_clearly_without_codec(spark, tmp_path):
    """A REAL .ms directory (marker: table.dat) without python-casacore
    is a clear NotImplementedError, not a confusing parquet failure."""
    import pytest

    from xova_spark.sources import casa_ms

    if casa_ms.HAVE_CASACORE:
        pytest.skip("python-casacore installed; the gated path is live")
    fake_ms = tmp_path / "real.ms"
    fake_ms.mkdir()
    (fake_ms / "table.dat").write_bytes(b"\xbe\xbe")
    assert casa_ms.is_casa_ms(str(fake_ms))
    with pytest.raises(NotImplementedError):
        casa_ms.load_ms_auto(spark, str(fake_ms))


def test_casa_bridge_parity_with_parquet_path(spark, tmp_path):
    """ACTIVATES WHEN python-casacore SHIPS: generate a small real MS
    (mirroring the reference's xova/testing_data.py:9-166 synthetic MS),
    ingest it through the casacore bridge, and the timechannel pipeline
    must agree with the same data pushed through the parquet path."""
    import pytest

    from xova_spark.sources import casa_ms

    if not casa_ms.HAVE_CASACORE:
        pytest.skip("python-casacore not installed in this container")
    # Sketch (runs only with the codec): build an MS with casacore's
    # default_ms + putcol of the fixture arrays, then:
    #   t1 = timechannel(casa_ms.read_casa_ms(spark, path), 4.0, 8)
    #   t2 = timechannel(load_ms(spark, parquet_twin), 4.0, 8)
    # and assert frame equality on ms_rows/ms_vis.
    raise AssertionError("implement MS generation now that casacore is present")
