"""Entity-resolution laws: blocked candidate generation vs a brute-force
replica, and merge-group assignment vs a union-find replica."""

from __future__ import annotations

import pandas as pd

from xova_spark.queries.erq import (
    BLOCK_PREFIX_LEN,
    MAX_NAME_DIST,
    er_blocked_candidates,
    er_entity_clusters,
)

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute_pairs(cust: pd.DataFrame) -> dict[tuple[int, int], int]:
    rows = cust.to_dict("records")
    out = {}
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            lo, hi = sorted((a, b), key=lambda r: r["c_custkey"])
            if (
                a["c_name"][:BLOCK_PREFIX_LEN] == b["c_name"][:BLOCK_PREFIX_LEN]
                and a["c_mktsegment"] == b["c_mktsegment"]
            ):
                d = _lev(a["c_name"], b["c_name"])
                if d <= MAX_NAME_DIST:
                    out[(lo["c_custkey"], hi["c_custkey"])] = d
    return out


def test_blocked_candidates_match_bruteforce(spark):
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    expect = _brute_pairs(cust)
    got = {
        (r["cust_a"], r["cust_b"]): r
        for r in er_blocked_candidates(spark, SF).collect()
    }
    assert set(got) == set(expect)
    assert expect, "fixture yields candidate pairs"
    nat = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    bal = dict(
        zip(cust["c_custkey"], (cust["c_acctbal"] * 100).round().astype(int))
    )
    for (a, b), r in got.items():
        assert r["name_dist"] == expect[(a, b)]
        assert r["same_nation"] == int(nat[a] == nat[b])
        assert r["bal_diff_cents"] == abs(bal[a] - bal[b])
        assert a < b


def test_entity_clusters_match_union_find(spark):
    """entity_id is the component-min custkey under transitive closure
    of the candidate pairs, and entity_size counts its members."""
    pairs = [
        (r["cust_a"], r["cust_b"])
        for r in er_blocked_candidates(spark, SF).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {x: find(x) for x in parent}
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    got = er_entity_clusters(spark, SF).collect()
    assert {r["c_custkey"]: r["entity_id"] for r in got} == comp
    for r in got:
        assert r["entity_size"] == sizes[r["entity_id"]]
        assert r["entity_id"] <= r["c_custkey"]


def test_survivorship_golden_record_rule(spark):
    """Survivor = highest balance, tie -> lowest key; rollups exact."""
    from xova_spark.queries.erq import er_survivorship

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    bal = dict(
        zip(cust["c_custkey"], (cust["c_acctbal"] * 100).round().astype(int))
    )
    asg = {
        r["c_custkey"]: r["entity_id"]
        for r in __import__(
            "xova_spark.queries.erq", fromlist=["er_entity_clusters"]
        ).er_entity_clusters(spark, SF).collect()
    }
    groups: dict[int, list[int]] = {}
    for k, e in asg.items():
        groups.setdefault(e, []).append(k)
    got = {r["entity_id"]: r for r in er_survivorship(spark, SF).collect()}
    assert set(got) == set(groups)
    for e, members in groups.items():
        r = got[e]
        mx = max(bal[m] for m in members)
        assert r["max_bal_cents"] == mx
        assert r["survivor_key"] == min(m for m in members if bal[m] == mx)
        assert r["n_members"] == len(members)
        assert r["total_bal_cents"] == sum(bal[m] for m in members)


def test_blocking_recall_pigeonhole_completeness(spark):
    """The pigeonhole truth set equals the brute-force distance<=1
    same-segment pair set (fixed-length names: one edit is one
    substitution, so agreeing on one suffix half is guaranteed), and
    the blocked candidates are a subset of it."""
    from xova_spark.queries.erq import er_blocking_recall

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    rows = cust.to_dict("records")
    brute = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if a["c_mktsegment"] == b["c_mktsegment"] and _lev(
                a["c_name"], b["c_name"]
            ) <= MAX_NAME_DIST:
                brute.add(
                    tuple(sorted((a["c_custkey"], b["c_custkey"])))
                )
    r = er_blocking_recall(spark, SF).collect()[0]
    assert r["n_true_pairs"] == len(brute)
    blocked = {
        (p["cust_a"], p["cust_b"])
        for p in er_blocked_candidates(spark, SF).collect()
    }
    assert blocked <= brute
    assert r["n_blocked_pairs"] == len(blocked)
    assert r["recall_permille"] == len(blocked) * 1000 // max(len(brute), 1)


def test_er_and_series_plans_are_keyed_joins(spark):
    """The candidate-generation joins plan as keyed hash/merge joins —
    never CartesianProduct, and only er_blocking_recall's final 1-row x
    1-row stitch may nest-loop."""
    from xova_spark.queries.erq import er_entity_clusters  # noqa: F401
    from xova_spark.queries.relext import ev_series_similarity

    for fn in (er_blocked_candidates, ev_series_similarity):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
