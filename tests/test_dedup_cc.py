"""Connected-components dedup clustering — multi-round propagation unit test.

The oracle gate (tools/check_oracle.py, DuckDB recursive CTE) covers the
harness corpus; this test hand-builds a shingle-overlap CHAIN (A~B, B~C,
A!~C) so the min-label has to propagate across two hops — exercising the
iterative loop beyond a single round — plus an exact-duplicate pair and
an edgeless singleton (which must be absent from the output).
"""

from __future__ import annotations

import pandas as pd

from xova_spark.queries.dedup import dedup_cc_clusters


def test_cc_chain_propagates_across_rounds(spark, tmp_path):
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

    out = (
        dedup_cc_clusters(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")["component"]
        .to_dict()
    )
    # the chain collapses to min label 1 even though 1-3 share no edge
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
