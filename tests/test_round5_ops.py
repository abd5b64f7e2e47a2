"""Round-5 operators: SemDeDup cluster-then-prune, PMI collocations,
feature hashing — semantics and scale-shape pins."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_semantic_prune_misses_only_cross_cluster_pairs(spark):
    """SemDeDup's known trade: every near-dup pair it misses (vs the
    exhaustive all-pairs verifier) must be a pair split ACROSS clusters
    — within a cluster the scan is exhaustive, so an intra-cluster miss
    would be a bug, not a recall trade."""
    from xova_spark.queries.pipelineq import (
        _SEMDEDUP_T,
        dedup_semantic_prune,
        emb_kmeans_assign,
    )
    from xova_spark.queries.similarity import dedup_embedding_cosine

    assert _SEMDEDUP_T == 0.45  # same threshold as the verifier pair table
    pruned = dedup_semantic_prune(spark, SF)
    asg = {
        r["vec_id"]: r["cluster"]
        for r in emb_kmeans_assign(spark, SF).select("vec_id", "cluster").collect()
    }
    exact = dedup_embedding_cosine(spark, SF).collect()
    assert exact  # fixture has near-dup vector pairs
    dropped = {
        r["vec_id"] for r in pruned.filter(~F.col("keep")).collect()
    }
    for r in exact:
        a, b = r["vec_a"], r["vec_b"]
        if asg[a] == asg[b]:
            # intra-cluster near-dup: the later id MUST be pruned
            assert b in dropped, (a, b, asg[a])
    # and pruning is sound: every dropped vector has a real earlier
    # near-dup in its cluster per the op's own audit column
    audit = {
        r["vec_id"]: r["max_cos_earlier"]
        for r in pruned.collect()
    }
    for v in dropped:
        assert audit[v] >= _SEMDEDUP_T - 1e-9, (v, audit[v])


def test_semantic_prune_joins_on_cluster_not_cartesian(spark):
    """The candidate self-join must key on the cluster id (SemDeDup's
    entire point); a cartesian pair scan would be corpus-quadratic."""
    from xova_spark.queries.pipelineq import dedup_semantic_prune

    plan = (
        dedup_semantic_prune(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan[:2000]


def test_feature_hashing_shape_and_mass(spark):
    """Buckets stay in [0, 16); the signed-count total mass per doc is
    bounded by its token count; and the vectorizer is reproducible
    (vocabulary-free determinism is the operator's contract)."""
    from xova_spark.queries.textops import _FH_BUCKETS, t_feature_hashing

    fh = t_feature_hashing(spark, SF)
    mm = fh.agg(
        F.min("bucket"), F.max("bucket"), F.count("*"), F.sum(F.abs("val"))
    ).first()
    assert 0 <= mm[0] and mm[1] < _FH_BUCKETS
    assert mm[2] > 0
    n_tokens = (
        t_docs(spark)
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert mm[3] <= n_tokens  # signed collisions only ever cancel mass
    a = sorted(map(tuple, fh.collect()))
    b = sorted(map(tuple, t_feature_hashing(spark, SF).collect()))
    assert a == b


def t_docs(spark):
    from xova_spark.session import load_tables

    return load_tables(spark, SF, ("documents",))["documents"]


def test_pmi_ranks_collocations_above_chance(spark):
    """PMI permille > 1000 means the bigram occurs MORE often than
    independent unigram draws predict — every reported top-k entry must
    clear that bar on this corpus, ranks must be 1..k, and counts must
    respect the min-count floor."""
    from xova_spark.queries.textops import (
        _PMI_MIN_COUNT,
        _PMI_TOPK,
        t_bigram_pmi_topk,
    )

    rows = t_bigram_pmi_topk(spark, SF).collect()
    assert 0 < len(rows) <= _PMI_TOPK
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["c"] >= _PMI_MIN_COUNT
        assert r["pmi_ratio_permille"] > 1000, r


def test_quality_classifier_is_exact_dot_of_features(spark):
    """The classifier score must equal the integer dot product of the
    sparse hashed features with the weight table, computed independently
    driver-side — and the keep rate must be non-degenerate."""
    from xova_spark.queries.textops import (
        _QC_WEIGHTS,
        t_feature_hashing,
        t_quality_classifier_score,
    )

    feats = {}
    for r in t_feature_hashing(spark, SF).collect():
        feats.setdefault(r["doc_id"], {})[r["bucket"]] = r["val"]
    got = {
        r["doc_id"]: (r["score"], r["keep"])
        for r in t_quality_classifier_score(spark, SF).collect()
    }
    assert set(got) == set(feats)
    kept = 0
    for doc, fv in feats.items():
        want = sum(v * _QC_WEIGHTS[b] for b, v in fv.items())
        assert got[doc] == (want, want >= 0), doc
        kept += got[doc][1]
    assert 0 < kept < len(feats)  # the filter actually separates


def test_semantic_rate_curve_is_monotone_and_consistent(spark):
    """Higher threshold prunes fewer vectors, and the 0.45 arm must
    agree with dedup_semantic_prune's keep column."""
    from xova_spark.queries.pipelineq import (
        dedup_semantic_prune,
        dedup_semantic_rate_curve,
    )

    row = dedup_semantic_rate_curve(spark, SF).first()
    assert row["pruned_t35"] >= row["pruned_t45"] >= row["pruned_t55"]
    n_dropped = dedup_semantic_prune(spark, SF).filter(~F.col("keep")).count()
    assert row["pruned_t45"] == n_dropped
    assert row["n_vectors"] > 0


def test_outlier_flags_rule_is_exact_integer(spark):
    """is_outlier must equal dist_q > 2 * (cluster-sum // cluster-count)
    recomputed driver-side from the emitted integers — and dist_q must
    be the exact 2^20 lattice value of the assignment distance."""
    from xova_spark.queries.pipelineq import emb_outlier_flags

    rows = emb_outlier_flags(spark, SF).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cl, rs in by_cluster.items():
        mean_q = sum(r["dist_q"] for r in rs) // len(rs)
        for r in rs:
            assert r["mean_q"] == mean_q, (cl, r)
            assert r["is_outlier"] == (r["dist_q"] > 2 * mean_q), r


def test_lsh_recall_vs_exact_is_high_and_consistent(spark):
    """The measured 4x4-banding recall on the real corpus: found <=
    both sides, and recall at the 0.5 threshold should be near the
    1-(1-s^4)^4 theory curve (>= 900 permille — at s >= 0.5 theory
    gives >= 0.97; 0.9 leaves slack for tiny-n noise)."""
    from xova_spark.queries.dedup import dedup_lsh_recall_vs_exact

    r = dedup_lsh_recall_vs_exact(spark, SF).first()
    assert r["n_exact"] > 0
    assert r["n_found"] <= min(r["n_exact"], r["n_lsh"])
    assert r["recall_permille"] >= 900, dict(r.asDict())


def test_streaming_quality_filter_matches_batch_classifier(spark):
    """The streaming per-row fold score must reproduce the batch
    classifier's keep decisions exactly (same integers), modulo the
    all-cancel-docs edge the batch entry drops."""
    from xova_spark.queries.streamingq import stream_quality_filter_audit
    from xova_spark.queries.textops import t_quality_classifier_score

    audit = {
        r["keep"]: r["n_docs"]
        for r in stream_quality_filter_audit(spark, SF).collect()
    }
    batch = t_quality_classifier_score(spark, SF)
    n_docs = 500
    n_keep_batch = batch.filter(F.col("keep")).count()
    n_scored_batch = batch.count()
    # batch drops all-cancel docs (score would be 0 -> keep); the stream
    # scores every doc, so stream-keep = batch-keep + dropped docs
    assert audit.get(True, 0) == n_keep_batch + (n_docs - n_scored_batch)
    assert sum(audit.values()) == n_docs


def test_dup_span_coverage_laws(spark):
    """Span laws: every span covers >= one window length, coverage never
    exceeds the document, and the total dup-window count equals the
    total occurrence count t_repeated_substring_windows reports for the
    same hashes (each occurrence of a duplicated hash IS one window)."""
    from xova_spark.queries.textops import (
        _WIN_LEN,
        t_dup_span_coverage,
        t_repeated_substring_windows,
    )

    rows = t_dup_span_coverage(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_spans"] <= r["n_dup_windows"], r
        assert r["dup_chars"] >= r["n_spans"] * _WIN_LEN, r
        assert r["dup_chars"] <= r["n_chars"] + _WIN_LEN, r
        assert 0 <= r["coverage_permille"], r
    total_windows = sum(r["n_dup_windows"] for r in rows)
    total_occurrences = (
        t_repeated_substring_windows(spark, SF)
        .agg(F.sum("n_occurrences"))
        .first()[0]
    )
    assert total_windows == total_occurrences


def test_importance_weights_laws(spark):
    """DSIR law: the average importance of TARGET-domain docs
    (src0/src1) must exceed the non-target average (the weights exist
    to up-sample the target lookalikes), every weight is positive, and
    n_tokens matches the whitespace token count."""
    from xova_spark.queries.textops import t_importance_weights

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("nt")
    )
    w = t_importance_weights(spark, SF)
    j = w.join(docs, "doc_id").collect()
    assert len(j) == 500
    tgt = [r for r in j if r["source"] in ("src0", "src1")]
    rest = [r for r in j if r["source"] not in ("src0", "src1")]
    assert all(r["importance"] > 0 for r in j)
    assert all(r["n_tokens"] == r["nt"] for r in j)
    avg = lambda xs: sum(x["importance"] for x in xs) / len(xs)  # noqa: E731
    assert avg(tgt) > avg(rest), (avg(tgt), avg(rest))


def test_incremental_rollup_equals_recompute(spark):
    """IVM law, checked Spark-side too (the oracle already proves it
    cross-engine): delta-apply onto the OLD rollup == direct NEW
    rollup, group for group."""
    from xova_spark.queries.cdcq import _snapshots, cdc_incremental_rollup

    got = cdc_incremental_rollup(spark, SF)
    _, new = _snapshots(spark, SF)
    want = new.groupBy((F.col("o_orderkey") % 64).alias("grp")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("price_cents").cast("long").alias("total_cents"),
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
