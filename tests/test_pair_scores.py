"""dedup_pair_scores: the Levenshtein permille must match a pure-Python
edit-distance replica, and containment must dominate Jaccard."""

from __future__ import annotations

import pandas as pd

from xova_spark.queries import dedup as D

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_pair_scores_semantics(spark):
    df = D.dedup_pair_scores(spark, SF).toPandas()
    assert len(df) > 0
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")["text"]
    for r in df.itertuples():
        ta, tb = docs[r.doc_a][:120], docs[r.doc_b][:120]
        lev = _lev(ta, tb)
        assert r.lev_permille == lev * 1000 // max(len(ta), len(tb))
        # containment >= jaccard always (|A∩B|/min >= |A∩B|/union)
        assert r.containment_permille / 1000 >= r.jaccard - 1e-3
        assert 0 <= r.containment_permille <= 1000
        assert r.jaccard >= 0.5
