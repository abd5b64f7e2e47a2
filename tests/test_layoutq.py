

def test_clustering_depth_layout_lesson(spark):
    """The OPTIMIZE-trigger semantics: the insertion-order layout's
    overlap depth equals its group count (every group spans the whole
    calendar — fully unclustered), the shipdate-clustered layout is
    depth <= 1 everywhere (point lookups touch at most ONE group; the avg
    dips under 1000 only through empty-week gaps, never overlap)."""
    from xova_spark.queries.layoutq import layout_clustering_depth

    rows = {
        r["layout"]: r.asDict()
        for r in layout_clustering_depth(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    nat, wk = rows["natural"], rows["ship_week"]
    assert nat["max_depth"] == nat["n_groups"] > 1
    assert wk["max_depth"] == 1
    assert 900 <= wk["avg_depth_permille"] <= 1000
    assert nat["avg_depth_permille"] > 3 * wk["avg_depth_permille"]
    assert nat["span_days"] == wk["span_days"] > 0
