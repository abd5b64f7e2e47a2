"""The unpartitioned-window survivor CONTRACT (VERDICT r5 item 2).

tools/plan_audit.py lists survivors; this pins them. Three directions:

1. accuracy — every frozen survivor still HAS an unpartitioned window
   (no stale names rotting in the list) and its declared bound marker
   is present below the window (limit / dimension agg / size gate);
2. fail-closed on new entries — an injected data-grain global-window
   plan is detected and rejected (not in the list => violation);
3. fail-closed on bound removal — a listed name checked against an
   unbounded plan is a violation (membership is not a waiver).

Reference analogue: xova/apps/xova/chunking.py:287-289 — assert the
invariant, don't assume it.
"""

from __future__ import annotations

import inspect

from pyspark.sql import Window
from pyspark.sql import functions as F

from xova_spark.plancontract import (
    WINDOW_SURVIVORS,
    has_unpartitioned_window,
    survivor_violations,
    unpartitioned_window_segments,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_frozen_survivors_accurate_and_bounded(spark):
    import __spark_entry__ as em

    qs = em.queries()
    missing = sorted(set(WINDOW_SURVIVORS) - set(qs))
    assert not missing, f"frozen survivors not in registry: {missing}"
    for name in WINDOW_SURVIVORS:
        fn = qs[name]
        plan = _plan(fn(spark, SF))
        assert has_unpartitioned_window(plan), (
            f"{name} no longer has an unpartitioned window — remove it"
            " from the frozen list"
        )
        probs = survivor_violations(name, plan, inspect.getsource(fn))
        assert not probs, probs


def test_injected_unbounded_window_is_violation(spark):
    """A data-grain global rank — the exact shape the contract exists
    to keep out — must be flagged both by the detector and as a
    non-listed violation."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bad = docs.select(
        "doc_id",
        F.row_number().over(Window.orderBy("doc_id")).alias("rnk"),
    )
    plan = _plan(bad)
    assert has_unpartitioned_window(plan)
    segs = unpartitioned_window_segments(plan)
    assert segs and "FileScan" in segs[0]  # window input is the raw scan
    probs = survivor_violations("some_new_entry", plan)
    assert probs and "not in the frozen survivor list" in probs[0]


def test_listed_name_with_vanished_bound_is_violation(spark):
    """Membership alone is not a waiver: t_zipf_slope's spec requires a
    TakeOrderedAndProject below the window; an unbounded plan under its
    name must still be red."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bad = docs.select(
        "doc_id",
        F.row_number().over(Window.orderBy("doc_id")).alias("rnk"),
    )
    probs = survivor_violations("t_zipf_slope", _plan(bad))
    assert probs and "lost its declared bound" in probs[0]


def test_size_gate_source_route_is_checked():
    """The two gated ntile entries must keep routing through
    operators/ranking.global_ntile; a source that drops the call is a
    violation even if the (under-gate) plan looks the same."""
    import __spark_entry__ as em

    qs = em.queries()
    for name in ("ev_rfm_segments", "ev_user_concentration"):
        src = inspect.getsource(qs[name])
        assert "global_ntile" in src
    # simulate the gate route being removed: source without the call
    fake_plan = (
        "+- Window [ntile(4) windowspecdefinition(f#1 ASC NULLS FIRST,"
        " specifiedwindowframe(RowFrame, unboundedpreceding$(),"
        " currentrow$())) AS s#2], [f#1 ASC NULLS FIRST]\n"
        "   +- HashAggregate(keys=[user_id#3], functions=[count(1)])\n"
    )
    probs = survivor_violations(
        "ev_rfm_segments", fake_plan, "def ev_rfm_segments(...): pass"
    )
    assert any("size-gate route" in p for p in probs)
