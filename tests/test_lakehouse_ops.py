"""Lakehouse/ops additions: compaction planning, zone-map pruning
audit, sweep-line peak concurrency — semantics replicas and the laws
each operator exists to guarantee."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def test_compaction_plan_matches_pandas_replica(spark):
    """The plan must equal a straight pandas re-derivation of the
    streaming rule bin = floor(preceding_bytes / target) over day-ordered
    files, and conserve bytes exactly."""
    from xova_spark.queries.layoutq import (
        _COMPACT_PART_DAYS,
        _COMPACT_TARGET,
        _US_PER_DAY,
        layout_compaction_plan,
    )

    got = layout_compaction_plan(spark, SF).toPandas()
    li = pd.read_parquet(SF + "/orders.parquet", columns=["o_orderdate"])
    us = li["o_orderdate"].astype("datetime64[us]").astype("int64")
    days = (us // _US_PER_DAY).value_counts().sort_index()
    files = pd.DataFrame({"day": days.index, "bytes": days.values * 100})
    files["part"] = files["day"] // _COMPACT_PART_DAYS
    files = files.sort_values(["part", "day"])
    cum = files.groupby("part")["bytes"].cumsum() - files["bytes"]
    files["bin"] = cum // _COMPACT_TARGET
    want = (
        files.groupby(["part", "bin"])
        .agg(
            n_files=("day", "size"),
            total_bytes=("bytes", "sum"),
            day_min=("day", "min"),
            day_max=("day", "max"),
        )
        .reset_index()
    )
    got = got.sort_values(["part", "bin"]).reset_index(drop=True)
    want = want.sort_values(["part", "bin"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_like=True
    )
    # conservation: every input byte lands in exactly one bin
    assert int(got["total_bytes"].sum()) == 100 * len(li)
    # contiguity: within a partition, bins cover disjoint increasing
    # day ranges in bin order (a rewrite can run them independently)
    for _, g in got.sort_values("bin").groupby("part"):
        prev_end = -1
        for _, r in g.iterrows():
            assert r["day_min"] > prev_end
            prev_end = r["day_max"]


def test_zonemap_skip_laws(spark):
    """Soundness: a skipped row group never contains a row the predicate
    wants (rows_skipped <= exact below-cutoff count, within one boundary
    group for the clustered layout). Value: clustering by the filter
    column must skip strictly more than insertion order."""
    import duckdb

    from xova_spark.queries.layoutq import (
        _US_PER_DAY,
        _ZM_SHIP_CUTOFF_DAY,
        layout_zonemap_skip,
    )

    rows = {
        r["layout"]: r for r in layout_zonemap_skip(spark, SF).collect()
    }
    exact_below, total = duckdb.sql(
        f"""
        SELECT sum(CASE WHEN epoch_us(l_shipdate) // {_US_PER_DAY}
                             < {_ZM_SHIP_CUTOFF_DAY} THEN 1 ELSE 0 END),
               count(*)
        FROM '{SF}/lineitem.parquet'
        """
    ).fetchone()
    for lay in ("natural", "ship_week"):
        r = rows[lay]
        assert r["rows_total"] == total
        assert r["rows_skipped"] <= exact_below  # soundness
        assert r["n_skipped"] <= r["n_groups"]
    # clustered layout skips everything except (at most) the one week
    # group straddling the cutoff
    wk = rows["ship_week"]
    boundary_rows = duckdb.sql(
        f"""
        SELECT count(*) FROM '{SF}/lineitem.parquet'
        WHERE epoch_us(l_shipdate) // {_US_PER_DAY}
              // 7 = {_ZM_SHIP_CUTOFF_DAY} // 7
        """
    ).fetchone()[0]
    assert wk["rows_skipped"] >= exact_below - boundary_rows
    # the layout story: clustering must beat insertion order outright
    assert wk["rows_skipped"] > rows["natural"]["rows_skipped"]


def test_peak_concurrency_matches_bruteforce(spark):
    """Exact replica: sessionize in pandas (same 30-min gap), then
    brute-force the sweep per day from the unclipped intervals — the
    day-clipped distributed form must give identical peaks."""
    from xova_spark.queries.relext import (
        _SESSION_GAP_US,
        _US_PER_DAY,
        ev_peak_concurrency,
    )

    got = {
        r["day"]: (r["peak_concurrency"], r["n_sessions"])
        for r in ev_peak_concurrency(spark, SF_SMALL).collect()
    }
    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["user_id", "ts"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    sessions = []
    for _, g in ev.sort_values("us").groupby("user_id"):
        start = prev = None
        for us in g["us"]:
            if prev is None or us - prev > _SESSION_GAP_US:
                if start is not None:
                    sessions.append((start, prev))
                start = us
            prev = us
        sessions.append((start, prev))
    days = sorted(
        {d for s, e in sessions for d in range(s // _US_PER_DAY, e // _US_PER_DAY + 1)}
    )
    for d in days:
        lo, hi = d * _US_PER_DAY, (d + 1) * _US_PER_DAY
        touching = [(s, e) for s, e in sessions if s < hi and e >= lo]
        # sweep the clipped endpoint multiset, starts before ends on ties
        pts = sorted(
            [(max(s, lo), 0) for s, e in touching]
            + [(min(e, hi - 1), 1) for s, e in touching]
        )
        peak = cur = 0
        for _, kind in pts:
            cur += 1 if kind == 0 else -1
            peak = max(peak, cur)
        assert got[d] == (peak, len(touching)), d
    assert set(got) == set(days)


def test_skyline_matches_bruteforce_dominance(spark):
    """The block-decomposed skyline must equal the quadratic NOT EXISTS
    dominance definition (a later-or-equal-day order with >= price,
    strict somewhere) on the small tier — the definition the distributed
    form exists to avoid computing."""
    import duckdb

    from xova_spark.queries.relext import _US_PER_DAY, agg_skyline_pareto

    got = sorted(
        (r["day"], r["price_cents"], r["n_orders"])
        for r in agg_skyline_pareto(spark, SF_SMALL).collect()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            WITH pts AS (
              SELECT epoch_us(o_orderdate) // {_US_PER_DAY} AS day,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
              FROM '{SF_SMALL}/orders.parquet'
            ), sky AS (
              SELECT day, pc FROM pts a
              WHERE NOT EXISTS (
                SELECT 1 FROM pts b
                WHERE b.day >= a.day AND b.pc >= a.pc
                  AND (b.day > a.day OR b.pc > a.pc)
              )
            )
            SELECT day, pc, count(*) FROM sky GROUP BY day, pc
            """
        ).fetchall()
    )
    assert got == want and got
    # Pareto law: along increasing day, surviving prices strictly fall
    prices = [p for _, p, _ in got]
    assert prices == sorted(prices, reverse=True)
    assert len(set(prices)) == len(prices)
