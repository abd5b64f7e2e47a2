"""Round-7 operator laws: trigram stupid-backoff replica (all three
branches), plus structural laws the oracle hash can't see."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F  # noqa: F401 (fixture style)

SF = "/root/testdata/sf0.001"


def test_trigram_backoff_replica_all_branches(spark):
    """t_trigram_backoff_score vs a pure-python stupid-backoff replica
    over the same train/eval split; at sf0.01 every branch (trigram
    hit, bigram backoff, unigram backoff) must fire."""
    from xova_spark.queries.textops import (
        _TRIGRAM_EVAL_MOD,
        t_trigram_backoff_score,
    )

    sf = "/root/testdata/sf0.01"
    out = {r["doc_id"]: r.asDict() for r in
           t_trigram_backoff_score(spark, sf).collect()}
    assert out
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    c3: Counter = Counter()
    c2: Counter = Counter()
    c1: Counter = Counter()
    n_tot = 0
    for d, ws in docs.items():
        if d % _TRIGRAM_EVAL_MOD == 0:
            continue
        n_tot += len(ws)
        c1.update(ws)
        c2.update(zip(ws, ws[1:]))
        c3.update(zip(ws, ws[1:], ws[2:]))
    any_b1 = any_b2 = any_hit = False
    for d, ws in docs.items():
        if d % _TRIGRAM_EVAL_MOD != 0 or len(ws) < 3:
            continue
        s = 0
        nb1 = nb2 = n = 0
        for w1, w2, w3 in zip(ws, ws[1:], ws[2:]):
            n += 1
            if c3[(w1, w2, w3)] > 0:
                p = c3[(w1, w2, w3)] / c2[(w1, w2)]
                any_hit = True
            elif c2[(w2, w3)] > 0:
                p = 0.4 * (c2[(w2, w3)] / c1[w2])
                nb1 += 1
                any_b1 = True
            else:
                p = 0.16 * (c1[w3] / n_tot)
                nb2 += 1
                any_b2 = True
            # engines round ties AWAY from zero (Spark HALF_UP, DuckDB
            # away-on-double); python round() is half-even — match the
            # engines, not python
            s += int(p * 1_000_000 + 0.5)
        r = out[d]
        assert r["n_trigrams"] == n
        assert r["n_backoff_bigram"] == nb1
        assert r["n_backoff_unigram"] == nb2
        assert r["score_micro_sum"] == s
        assert r["avg_p_micro"] == s // n
    assert any_hit and any_b1 and any_b2


def test_bloom_skip_audit_laws(spark):
    """Bloom-zone laws: the bloom can only SHRINK the min/max candidate
    set, it never loses a true match (cand_bloom >= true_files,
    false positives >= 0), and on the 'time' layout — where min/max
    prunes nothing — the bloom must genuinely cut candidates for at
    least one probe (the reason Parquet blooms exist)."""
    from xova_spark.queries.layoutq import layout_bloom_skip_audit

    rows = [
        r.asDict()
        for r in layout_bloom_skip_audit(spark, "/root/testdata/sf0.01").collect()
    ]
    assert rows
    cut = False
    for r in rows:
        assert r["cand_bloom_files"] <= r["cand_minmax_files"]
        assert r["cand_bloom_files"] >= r["true_files"]
        assert r["bloom_false_positives"] >= 0
        if r["layout"] == "time" and r["cand_bloom_files"] < r["cand_minmax_files"]:
            cut = True
    assert cut


def test_gini_replica_and_bounds(spark):
    """ev_gini_coefficient vs the textbook formula in python; Gini laws:
    0 <= G < 1000, and injecting a perfectly equal population yields
    exactly 0."""
    from xova_spark.queries.relext import ev_gini_coefficient
    from xova_spark.operators.ranking import global_rank

    sf = "/root/testdata/sf0.01"
    row = ev_gini_coefficient(spark, sf).collect()[0]
    counts = sorted(
        (r["user_id"], r["c"])
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    xs = [c for _, c in sorted(counts, key=lambda t: (t[1], t[0]))]
    n, s0 = len(xs), sum(xs)
    s1 = sum(i * x for i, x in enumerate(xs, start=1))
    want = (2000 * s1 - 1000 * (n + 1) * s0) // (n * s0)
    assert row["n_users"] == n
    assert row["total_events"] == s0
    assert row["gini_permille"] == want
    assert 0 <= row["gini_permille"] < 1000

    # equal population -> exactly 0 through the same distributed path
    eq = spark.range(64).select(
        F.col("id").alias("user_id"), F.lit(5).cast("long").alias("x")
    )
    ranked = global_rank(eq, [F.col("x"), F.col("user_id")], rank_col="i",
                         num_partitions=8)
    g = ranked.agg(
        F.expr(
            "CAST((2000 * sum(i * x) - 1000 * (count(*) + 1) * sum(x))"
            " div (count(*) * sum(x)) AS BIGINT)"
        ).alias("g")
    ).collect()[0]["g"]
    assert g == 0


def test_gini_dividend_survives_bigint_overflow(spark):
    """Round-8 overflow fix law: a population whose Gini dividend
    2000*sum(i*x) exceeds BIGINT range (>9.2e18) must still produce the
    exact python-bignum answer through the production DECIMAL(38,0)
    path. x_i = 1000*i over n=200_000 users makes 2000*sum(i*x) ~
    5.3e21 — the pre-fix BIGINT lattice wraps (or nulls) here while
    DuckDB's silent HUGEINT promotion stays right; the fix keeps both
    engines on the same 128-bit lattice. (Materialising 1000*i events
    per user is infeasible, so this exercises the production aggregate
    expression on a pre-ranked frame exactly as ev_gini_coefficient
    composes it.)"""
    from xova_spark.queries.relext import ev_gini_coefficient
    from xova_spark.operators.ranking import global_rank

    n = 200_000

    ux = spark.range(1, n + 1).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 1000).cast("long").alias("x"),
    )
    ranked = global_rank(ux, [F.col("x"), F.col("user_id")], rank_col="i",
                         num_partitions=16)
    row = ranked.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total_events"),
        F.expr(
            "CAST((CAST(2000 AS DECIMAL(38,0))"
            "        * sum(CAST(i AS DECIMAL(38,0)) * x)"
            "      - CAST(1000 AS DECIMAL(38,0))"
            "        * CAST(count(*) + 1 AS DECIMAL(38,0))"
            "        * CAST(sum(x) AS DECIMAL(38,0)))"
            " div (CAST(count(*) AS DECIMAL(38,0))"
            "      * CAST(sum(x) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("gini_permille"),
    ).collect()[0]
    s1 = sum(i * (1000 * i) for i in range(1, n + 1))
    s0 = sum(1000 * i for i in range(1, n + 1))
    assert 2000 * s1 > 2**63 - 1  # the scenario genuinely overflows BIGINT
    want = (2000 * s1 - 1000 * (n + 1) * s0) // (n * s0)
    assert row["gini_permille"] == want
    assert row["n_users"] == n and row["total_events"] == s0
    # and the production query function itself still runs green on real
    # data (regression guard that the DECIMAL rewrite kept the wiring)
    assert ev_gini_coefficient(spark, SF).collect()[0]["gini_permille"] >= 0
