"""Round-9 law tests.

Covers (a) the ANALYTIC_BOUNDS escape-hatch contract — every
lattice-headroom override must name a live pytest node (VERDICT r8
item 7) — and (b) the band-tuning pair-count law that override cites.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def spark():
    from xova_spark.session import get_spark

    return get_spark("round9-tests")


def test_band_tuning_candidates_are_pair_counts(spark):
    """dedup_band_tuning_report's n_candidates is a ROW-CARDINALITY
    counter over materialized candidate pairs: for every banding
    config it is bounded by C(n_docs, 2) — the all-pairs ceiling — and
    the verified count never exceeds the candidate count. This is the
    closed-form bound the lattice_headroom ANALYTIC_BOUNDS override
    cites: a BIGINT pair COUNT cannot overflow before the 9.2e18-row
    pair materialization itself is infeasible."""
    from xova_spark.queries.dedup import dedup_band_tuning_report

    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    all_pairs = n_docs * (n_docs - 1) // 2
    rows = dedup_band_tuning_report(spark, SF).collect()
    assert rows, "band tuning report returned no configs"
    for r in rows:
        assert 0 <= r["n_candidates"] <= all_pairs, r
        assert 0 <= r["n_verified"] <= r["n_candidates"], r


def test_analytic_bounds_overrides_name_live_law_tests():
    """CONTRACT (VERDICT r8 item 7): every ANALYTIC_BOUNDS override in
    tools/lattice_headroom.py must be a (alpha, justification,
    law_test) triple whose law_test names an EXISTING pytest node —
    path exists, function defined in that file. The escape hatch
    accreted prose-only overrides in round 8; an override whose cited
    test was renamed, deleted, or never written is now a red test, so
    the hatch cannot silently grow."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "lattice_headroom", os.path.join(REPO, "tools", "lattice_headroom.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bounds = mod.ANALYTIC_BOUNDS
    assert bounds, "ANALYTIC_BOUNDS unexpectedly empty"
    live_entries = set()
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    live_entries = set(entry.queries())
    for (name, col), triple in bounds.items():
        assert len(triple) == 3, (
            f"override ({name},{col}) must be (alpha, why, law_test)"
        )
        alpha, why, law_test = triple
        assert isinstance(alpha, float) and alpha > 0, (name, col, alpha)
        assert len(why) > 40, f"({name},{col}) justification too thin"
        assert name in live_entries, (
            f"override ({name},{col}) targets a dead registry entry"
        )
        m = re.fullmatch(r"(tests/[\w/]+\.py)::(test_\w+)", law_test)
        assert m, f"({name},{col}) law_test not a pytest node: {law_test!r}"
        path, func = m.group(1), m.group(2)
        fpath = os.path.join(REPO, path)
        assert os.path.isfile(fpath), f"({name},{col}) cites missing {path}"
        src = open(fpath).read()
        assert f"def {func}(" in src, (
            f"({name},{col}) cites {func} absent from {path}"
        )
