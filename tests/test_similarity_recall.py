"""ANN recall: multi-probe must dominate single-bucket recall (it
searches a strict superset of candidates)."""

from __future__ import annotations

from xova_spark.queries import similarity as S

SF_DIR = "/root/testdata/sf0.001"


def test_multiprobe_dominates_single_bucket(spark):
    single = (
        S.REGISTRY["ann_recall_at5"][0](spark, SF_DIR)
        .toPandas()
        .set_index("qid")["recall_at_5"]
        .sort_index()
    )
    multi = (
        S.REGISTRY["ann_multiprobe_recall_at5"][0](spark, SF_DIR)
        .toPandas()
        .set_index("qid")["recall_at_5"]
        .sort_index()
    )
    assert (multi >= single).all()
    assert multi.mean() >= single.mean()
    assert multi.mean() > 0.2  # probing 5/16 of the corpus finds real hits


def test_embedding_lsh_neardup_subset_and_recall(spark):
    """The LSH near-dup pairs are a SUBSET of the exact all-pairs result
    (bucketing can only miss, never invent: every candidate is exactly
    verified), and the measured recall clears a useful floor at sf0.01."""
    import pandas as pd

    sf = "/root/testdata/sf0.01"
    exact = (
        S.REGISTRY["dedup_embedding_cosine"][0](spark, sf)
        .toPandas().set_index(["vec_a", "vec_b"]).sort_index()
    )
    lsh = (
        S.REGISTRY["dedup_embedding_lsh_pairs"][0](spark, sf)
        .toPandas().set_index(["vec_a", "vec_b"]).sort_index()
    )
    assert lsh.index.isin(exact.index).all()
    joined = lsh.join(exact, lsuffix="_lsh")
    pd.testing.assert_series_equal(
        joined["cos_lsh"], joined["cos"], check_names=False
    )
    rec = (
        S.REGISTRY["dedup_embedding_lsh_recall"][0](spark, sf)
        .toPandas().iloc[0]
    )
    assert rec["n_exact"] == len(exact)
    assert rec["n_found"] == len(lsh)
    assert rec["recall"] >= 0.85
