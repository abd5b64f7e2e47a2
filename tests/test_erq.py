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


def test_grouped_candidates_linear_under_exact_duplicates(spark):
    """The duplicate-heavy-block law (VERDICT r5 item 4), measured on a
    synthetic k-copies blow-up of sf0.001 customers THROUGH the
    production logic (grouped_candidate_pairs):

    - ungrouped record-grain join: candidate count grows >= k^2 (the
      79x sf1 hazard round 5 exposed);
    - grouped rep-grain join: the (rep_a, rep_b, name_dist) pair set is
      BIT-IDENTICAL for k=1 and k=3 — copy multiplicity never reaches
      the fuzzy join;
    - accounting identity: sum(pair_multiplicity) scales exactly k^2,
      preserving the record-pair count without materializing it.
    """
    from pyspark.sql import functions as F

    from xova_spark.queries.erq import (
        BLOCK_PREFIX_LEN,
        MAX_NAME_DIST,
        grouped_candidate_pairs,
    )
    from xova_spark.session import load_tables

    base = load_tables(spark, SF, ("customer",))["customer"].select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    k = 3
    offset = 10_000_000
    copies = base
    for i in range(1, k):
        copies = copies.unionAll(
            base.select(
                (F.col("c_custkey") + i * offset).alias("c_custkey"),
                "c_name",
                "c_mktsegment",
            )
        )

    def ungrouped_count(cust):
        c = cust.withColumn(
            "bkey", F.substring("c_name", 1, BLOCK_PREFIX_LEN)
        )
        a, b = c.alias("a"), c.alias("b")
        return (
            a.join(
                b,
                (F.col("a.bkey") == F.col("b.bkey"))
                & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .where(
                F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
                <= MAX_NAME_DIST
            )
            .count()
        )

    n_rec_1, n_rec_k = ungrouped_count(base), ungrouped_count(copies)
    assert n_rec_k >= k * k * n_rec_1  # quadratic blowup, measured

    g1 = grouped_candidate_pairs(base).collect()
    gk = grouped_candidate_pairs(copies).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r.rep_a, r.rep_b, r.name_dist) for r in rows
    )
    assert key(g1) == key(gk) and g1  # rep-grain set invariant under k
    mult1 = sum(r.pair_multiplicity for r in g1)
    multk = sum(r.pair_multiplicity for r in gk)
    assert multk == k * k * mult1  # exact record-pair accounting
