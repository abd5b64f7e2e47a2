"""Connected-components dedup clustering — multi-round propagation unit test.

The oracle gate (tools/check_oracle.py, DuckDB recursive CTE) covers the
harness corpus; this test hand-builds a shingle-overlap CHAIN (A~B, B~C,
A!~C) so the min-label has to propagate across two hops — exercising the
iterative loop beyond a single round — plus an exact-duplicate pair and
an edgeless singleton (which must be absent from the output).
"""

from __future__ import annotations

import pandas as pd
import pytest

from xova_spark.queries.dedup import dedup_cc_clusters


@pytest.mark.parametrize("path", ["unionfind", "distributed"])
def test_cc_chain_propagates_across_rounds(spark, tmp_path, monkeypatch, path):
    words = [f"w{i}" for i in range(20)]
    texts = {
        1: " ".join(words[0:10]),   # shingles s0..s7
        2: " ".join(words[2:12]),   # s2..s9: J(1,2)=6/10=0.6 >= 0.5
        3: " ".join(words[4:14]),   # s4..s11: J(2,3)=0.6, J(1,3)=4/12 < 0.5
        4: "alpha beta gamma delta",
        5: "alpha beta gamma delta",  # J(4,5)=1.0
        6: "zulu yankee xray whiskey victor",  # no edges
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "unit",
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    if path == "distributed":
        # Close the size gate so the iterative propagation loop runs —
        # both executions must produce the identical labeling.
        from xova_spark.queries import dedup

        monkeypatch.setattr(dedup, "_CC_COLLECT_EDGES", -1)
    out = (
        dedup_cc_clusters(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")["component"]
        .to_dict()
    )
    # the chain collapses to min label 1 even though 1-3 share no edge
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_cc_edges_use_banded_lsh_not_quadratic(spark, tmp_path, ms_dir):
    """The cluster op's scale path: edge generation must key on the LSH
    (band, bucket) join, not the quadratic all-shingle self-join (which
    survives only inside the DuckDB oracle)."""
    from xova_spark.queries.dedup import BANDS_16x1, _lsh_verified_pairs

    pairs = _lsh_verified_pairs(spark, "/root/testdata/sf0.001", BANDS_16x1)
    plan = pairs._jdf.queryExecution().analyzed().toString()
    assert "bkey" in plan and "band" in plan, plan[:2000]
