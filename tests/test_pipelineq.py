"""Invariant tests for the training-pipeline composite operators
(queries/pipelineq.py). The DuckDB hash gate lives in check_oracle /
the driver; these pin semantic invariants the hash can't express."""

from __future__ import annotations

import pytest

from xova_spark.queries.pipelineq import (
    _K,
    emb_kmeans_assign,
    pipeline_corpus_e2e,
    t_decontam_overlap,
    t_domain_mix_sample,
    t_repetition_signals,
)

SF = "/root/testdata/sf0.001"


def test_repetition_signals_bounds(spark):
    rows = t_repetition_signals(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 < r["top_word_frac"] <= 1
        assert 0 <= r["dup_word_frac"] < 1
        assert 0 <= r["dup_2gram_frac"] <= 1
        # keep flag consistent with its own thresholds (rounded cols)
        if r["top_word_frac"] > 0.201 or r["dup_2gram_frac"] > 0.601:
            assert r["repetition_keep"] == 0


def test_decontam_excludes_eval_split(spark):
    rows = t_decontam_overlap(spark, SF).collect()
    assert rows, "synthetic corpus must have some n-gram overlap"
    for r in rows:
        assert r["doc_id"] % 20 != 0, "eval docs must never be flagged"
        assert 0 < r["n_hits"] <= r["n_grams"]


def test_domain_mix_deterministic_and_rate_keyed(spark):
    a = {r["source"]: r for r in t_domain_mix_sample(spark, SF).collect()}
    b = {r["source"]: r for r in t_domain_mix_sample(spark, SF).collect()}
    assert a.keys() == b.keys() and len(a) == 20
    for src, r in a.items():
        # reruns bit-identical (hash sampling, not sample())
        assert r["n_kept"] == b[src]["n_kept"]
        assert r["target_rate"] == pytest.approx(
            0.25 + 0.05 * (int(src[3:]) % 10)
        )
        assert 0 <= r["n_kept"] <= r["n_total"]


def test_corpus_pipeline_funnel_is_realistic(spark):
    """The composite must drop SOME docs at each class of filter but
    never collapse the corpus (the 3-gram decontam over-flag bug)."""
    rows = pipeline_corpus_e2e(spark, SF).collect()
    total = sum(r["n_docs"] for r in rows)
    assert 0.3 * 500 < total < 500, total
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}
    langs = {r["lang"] for r in rows}
    assert langs == {"de", "en", "es", "fr", "zh"}
    for r in rows:
        assert r["sum_tokens"] >= 20 * r["n_docs"]  # quality floor held


def test_kmeans_assignment_is_nearest_seeded_centroid(spark):
    out = emb_kmeans_assign(spark, SF)
    rows = out.collect()
    assert len(rows) == 500
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(_K)) and len(clusters) > 1
    # deterministic across reruns (fixed seeds + dyadic-exact arithmetic)
    again = {r["vec_id"]: r["cluster"] for r in emb_kmeans_assign(spark, SF).collect()}
    assert {r["vec_id"]: r["cluster"] for r in rows} == again
    # seeds end up in the cluster they named while centroids stay near them
    for r in rows:
        assert r["dist_sq"] >= 0


def test_countmin_estimates_dominate_exact(spark):
    """CMS guarantee: est >= exact for every queried word; with w=64
    and this vocabulary, the heavy hitters should rarely be inflated
    by more than the corpus/w bound."""
    from xova_spark.queries.pipelineq import t_countmin_heavy_hitters

    rows = t_countmin_heavy_hitters(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["est_n"] >= r["exact_n"], r


def test_stream_corpus_audit_matches_batch(spark):
    """The streaming ingest audit must converge to the batch
    quality+dedup aggregation."""
    from pyspark.sql import functions as F

    from xova_spark.queries.streamingq import stream_corpus_audit
    from xova_spark.session import load_tables

    got = {
        r["lang"]: (r["n_docs"], r["sum_tokens"])
        for r in stream_corpus_audit(spark, SF).collect()
    }
    docs = load_tables(spark, SF, ("documents",))["documents"]
    toks = F.size(F.split("text", " "))
    want = {
        r["lang"]: (r["n_docs"], r["sum_tokens"])
        for r in (
            docs.filter(toks >= 20)
            .select("lang", F.md5("text").alias("h"), toks.alias("n"))
            .groupBy("lang", "h")
            .agg(F.min("n").alias("n"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"), F.sum("n").alias("sum_tokens"))
            .collect()
        )
    }
    assert got == want


def test_quantize_int8_codes_bounded(spark):
    """Absmax quantization: codes fit int8 (|q| <= 127 => q_l1 <= 127*64)
    and reconstruction error is bounded by dims * scale/2."""
    from xova_spark.queries.pipelineq import emb_quantize_int8

    rows = emb_quantize_int8(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 < r["q_l1"] <= 127 * 64
        assert 0 <= r["recon_err"] <= 64 * r["scale"] / 2 + 1e-6


def test_composites_partition_count_invariant(spark):
    """Shuffle-partition count must not change results (the engine-side
    analogue of the reference's chunk-count invariance) — guards against
    accidental order dependence in the funnel and the iterative k-means."""
    from xova_spark.queries.pipelineq import pipeline_corpus_e2e

    def snap(fn):
        return sorted(tuple(r) for r in fn(spark, SF).collect())

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a_pipe = snap(pipeline_corpus_e2e)
        a_km = snap(emb_kmeans_assign)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b_pipe = snap(pipeline_corpus_e2e)
        b_km = snap(emb_kmeans_assign)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a_pipe == b_pipe
    assert a_km == b_km


def test_funnel_duplicate_insertion_invariant(spark):
    """Inserting an exact duplicate (higher doc_id, non-eval, same text)
    must leave the funnel's kept set unchanged — the dedup stage keeps
    the min-doc_id copy before sampling/splitting ever sees the dup."""
    from pyspark.sql import functions as F

    from xova_spark.queries.pipelineq import corpus_funnel
    from xova_spark.session import load_tables

    docs = load_tables(spark, SF, ("documents",))["documents"]
    base = {tuple(r) for r in corpus_funnel(docs).collect()}

    # duplicate an arbitrary kept-eligible doc under a fresh high id
    # that is not divisible by 20 (stays out of the eval split)
    src = docs.filter((F.col("doc_id") % 20 != 0)).limit(1)
    dup = src.select(
        (F.lit(100001)).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    with_dup = docs.unionByName(dup)
    again = {tuple(r) for r in corpus_funnel(with_dup).collect()}
    assert again == base


def test_empty_selection_pipelines_stay_well_formed(spark, ms):
    """Empty selections must flow through every major pipeline as empty
    DataFrames with intact schemas — no driver-side collect assumes
    non-empty input (the classic distributed-pipeline edge case)."""
    from pyspark.sql import functions as F

    from xova_spark.operators.bda import bda
    from xova_spark.operators.timechannel import timechannel
    from xova_spark.queries.pipelineq import corpus_funnel

    tc_out = timechannel(ms, time_bin_secs=4.0, chan_bin_size=8, fields=[999])
    assert tc_out["ms_vis"].count() == 0 and tc_out["ms_rows"].count() == 0
    assert "vis_re" in tc_out["ms_vis"].columns

    bda_out = bda(ms, scans=[999])
    assert bda_out["ms_vis"].count() == 0 and bda_out["spw"].count() == 0

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 0)
    empty = corpus_funnel(docs)
    assert empty.count() == 0
    assert set(empty.columns) == {"doc_id", "lang", "source", "n_tokens", "split"}


def test_bpe_paths_agree_and_merges_are_valid(spark, monkeypatch):
    """The size-gated BPE trainer: the driver-side union of rounds and
    the distributed per-round loop must learn the IDENTICAL merge
    table; ranks are 1..k and each merged token is its pair joined."""
    from xova_spark.queries import textops as T

    sf = "/root/testdata/sf0.001"
    local = T.t_bpe_train_merges(spark, sf).toPandas()
    monkeypatch.setattr(T, "_BPE_COLLECT_TYPES", -1)  # force distributed
    dist = T.t_bpe_train_merges(spark, sf).toPandas()
    assert local.equals(dist)
    assert list(local["merge_rank"]) == list(range(1, len(local) + 1))
    for _, row in local.iterrows():
        assert row["merged"] == row["pair"].replace(" ", "")
        assert row["pair_count"] > 0


def test_pq_fit_paths_agree(spark, monkeypatch):
    """The size-gated PQ trainer: the driver-side numpy Lloyd chain and
    the distributed one-job-per-iteration plan must produce bit-identical
    codebooks AND codes (dyadic inputs + sequential-fold distances make
    both IEEE sequences equal)."""
    from xova_spark.queries import pipelineq as P
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = P._emb(spark, sf).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1024) / 1024
        ).alias("emb"),
    )
    codes_drv, cents_drv = P._pq_fit_frame(spark, ("test", "drv"), emb)
    monkeypatch.setattr(P, "_PQ_TRAIN_COLLECT_VECS", -1)  # force distributed
    codes_dist, cents_dist = P._pq_fit_frame(spark, ("test", "dist"), emb)
    assert cents_drv.keys() == cents_dist.keys()
    for k in cents_drv:
        assert cents_drv[k] == cents_dist[k], k
    pd_drv = codes_drv.toPandas().sort_values("vec_id").reset_index(drop=True)
    pd_dist = codes_dist.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert pd_drv.astype("int64").equals(pd_dist.astype("int64"))
