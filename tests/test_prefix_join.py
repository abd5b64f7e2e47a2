"""Prefix-filtering set-similarity join: completeness law (== the
exhaustive shingle join) and candidate-volume sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.queries.dedup import (
    SPARK_SHINGLES,
    dedup_ngram_jaccard,
    dedup_prefix_filter_join,
)
from xova_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def test_prefix_join_equals_exhaustive_join(spark):
    """The AllPairs completeness theorem in practice: the prefix-filter
    join returns EXACTLY the exhaustive join's pairs and Jaccards."""
    exhaustive = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, SF).collect()
    }
    prefix = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_prefix_filter_join(spark, SF).collect()
    }
    assert prefix == exhaustive
    assert exhaustive, "fixture has near-dup pairs at threshold 0.5"


def test_prefix_shrinks_the_joinable_token_set(spark):
    """The prefix projection drops a meaningful share of (doc, shingle)
    rows before the candidate join — the volume reduction that makes
    the algorithm a scale path, not a rewrite."""
    docs = load_tables(spark, SF, ("documents",))["documents"]
    sh = docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", F.expr(SPARK_SHINGLES).alias("shingles")
    )
    total = sh.select(F.sum(F.size("shingles"))).collect()[0][0]
    prefix_rows = sh.select(
        F.sum(F.expr("size(shingles) div 2 + 1"))
    ).collect()[0][0]
    # floor(n/2)+1 of n rows: strictly about half at n >= 3
    assert prefix_rows < total * 0.6
