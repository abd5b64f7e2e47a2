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
