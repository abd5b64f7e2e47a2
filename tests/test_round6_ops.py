"""Law tests for the round-6 additions beyond their DuckDB gates:
chunk-coverage geometry for t_chunk_overlap and a pure-python
canonicalizer replica for dedup_url_canonical."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def test_chunk_overlap_covers_every_token_with_stride_geometry(spark):
    """Per doc: chunk 0 starts at token 1; consecutive chunks advance
    exactly the stride; the last chunk ends at the doc's token count;
    every chunk except the last is full-length — so the windows tile
    the document with the declared overlap and no token is skipped."""
    import pandas as pd

    from xova_spark.queries.textops import (
        _CHUNK_LEN,
        _CHUNK_STRIDE,
        t_chunk_overlap,
    )

    got = t_chunk_overlap(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n_words = {r.doc_id: len(r.text.split(" ")) for r in docs.itertuples()}

    assert set(got["doc_id"]) == set(n_words)  # every doc chunked
    for doc_id, grp in got.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx").reset_index(drop=True)
        n = n_words[doc_id]
        assert list(grp["chunk_idx"]) == list(range(len(grp)))
        for i, row in grp.iterrows():
            start = i * _CHUNK_STRIDE
            want_len = min(_CHUNK_LEN, n - start)
            assert row["n_tokens"] == want_len
        # last chunk reaches the end of the doc; no extra chunk exists
        last_start = (len(grp) - 1) * _CHUNK_STRIDE
        assert last_start + grp.iloc[-1]["n_tokens"] == n
        if len(grp) > 1:
            assert last_start < n <= last_start + _CHUNK_LEN


def test_url_canonical_matches_python_replica(spark):
    """Rebuild the raw URLs and canonicalize them with python's re —
    group counts and keepers must match the Spark/DuckDB twins, and
    every group must collapse at least its own raw form (n_raw_forms
    in [1, n_docs])."""
    import pandas as pd

    from xova_spark.queries.dedup import dedup_url_canonical

    got = (
        dedup_url_canonical(spark, SF)
        .toPandas()
        .sort_values("curl")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])

    def raw(d):
        scheme = ["http", "https", "HTTPS"][d % 3]
        www = "WWW." if d % 2 == 0 else ""
        port = ":443" if d % 7 == 0 else ""
        slash = "/" if d % 5 == 0 else ""
        q = "?utm_campaign=feed" if d % 4 == 0 else ""
        frag = "#section-2" if d % 6 == 0 else ""
        return (
            f"{scheme}://{www}Site{d % 4}.Example.COM{port}"
            f"/Docs/{d % 10}{slash}{q}{frag}"
        )

    def canon(u):
        u = u.lower()
        u = re.sub(r"#.*$", "", u)
        u = re.sub(r"\?utm_[^#]*$", "", u)
        u = re.sub(r"^(https?)://www\.", r"\1://", u)
        u = u.replace(":443/", "/")
        u = re.sub(r"/$", "", u)
        return u

    groups: dict[str, list] = {}
    raws: dict[str, set] = {}
    for d in docs["doc_id"]:
        c = canon(raw(int(d)))
        groups.setdefault(c, []).append(int(d))
        raws.setdefault(c, set()).add(raw(int(d)))
    want = pd.DataFrame(
        sorted(
            (c, len(ds), len(raws[c]), min(ds)) for c, ds in groups.items()
        ),
        columns=["curl", "n_docs", "n_raw_forms", "keeper_doc"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_raw_forms"] >= 1).all()
    assert (got["n_raw_forms"] <= got["n_docs"]).all()
    assert (got["n_raw_forms"] > 1).any()  # the mess actually collapsed


def test_quality_auc_matches_python_midrank_replica(spark):
    """t_quality_auc's contingency-form AUC must equal the classic
    midrank formula AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos*n_neg)
    computed by an independent pure-python replica over the same
    (score, label) pairs — and the pair-count identity
    conc + tied + disc == n_pos * n_neg must hold."""
    from xova_spark.queries.textops import (
        t_quality_auc,
        t_quality_classifier_score,
        t_quality_score,
    )

    row = t_quality_auc(spark, SF).collect()[0]
    scores = {
        r["doc_id"]: r["score"]
        for r in t_quality_classifier_score(spark, SF).collect()
    }
    labels = {
        r["doc_id"]: r["quality_keep"] for r in t_quality_score(spark, SF).collect()
    }
    pairs = [(scores[d], labels[d]) for d in scores if d in labels]
    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    assert (len(pos), len(neg)) == (row["n_pos"], row["n_neg"])

    # midrank formula over the pooled sample
    pooled = sorted(s for s, _ in pairs)
    import bisect

    def midrank(s):
        lo = bisect.bisect_left(pooled, s)
        hi = bisect.bisect_right(pooled, s)
        return (lo + 1 + hi) / 2.0

    r_pos = sum(midrank(s) for s in pos)
    auc = (r_pos - len(pos) * (len(pos) + 1) / 2.0) / (len(pos) * len(neg))
    assert row["auc_micro"] == int(auc * 1_000_000)

    # contingency identity: every (pos, neg) pair is concordant,
    # tied, or discordant. Since the r8 headroom fix the raw pair
    # counts accumulate in a 128-bit lattice and the REPORTED columns
    # are the bounded micro-shares of the n_pos*n_neg comparable pairs.
    conc = sum(1 for p in pos for n in neg if p > n)
    tied = sum(1 for p in pos for n in neg if p == n)
    np_nn = len(pos) * len(neg)
    assert row["conc_micro"] == conc * 1_000_000 // np_nn
    assert row["tied_micro"] == tied * 1_000_000 // np_nn
    assert 0 <= row["conc_micro"] <= 1_000_000
    assert 0 <= row["tied_micro"] <= 1_000_000 - row["conc_micro"]
    assert row["auc_micro"] == (2 * conc + tied) * 1_000_000 // (2 * np_nn)


def test_quality_calibration_decile_geometry(spark):
    """NTILE geometry and ordering laws: deciles 1..10 partition the
    scored corpus with sizes differing by at most one (largest first),
    and score ranges are non-overlapping ascending — so the keep-rate
    curve reads as a true reliability diagram."""
    from xova_spark.queries.textops import t_quality_calibration

    rows = sorted(
        t_quality_calibration(spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # remainder goes first
    for a, b in zip(rows, rows[1:]):
        assert a["score_max"] <= b["score_min"]
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert r["keep_permille"] == r["n_keep"] * 1000 // r["n_docs"]


def test_quality_pr_curve_laws(spark):
    """Threshold-sweep invariants: tp nondecreasing as the threshold
    descends, recall hits 1000 permille at the lowest threshold (every
    positive is scored), confusion counts stay consistent, and the
    permille rates equal their integer-division definitions."""
    from xova_spark.queries.textops import t_quality_auc, t_quality_pr_curve

    rows = sorted(
        t_quality_pr_curve(spark, SF).collect(),
        key=lambda r: -r["threshold"],
    )
    auc = t_quality_auc(spark, SF).collect()[0]
    n_pos, n_neg = auc["n_pos"], auc["n_neg"]
    prev_tp, prev_npred = 0, 0
    for r in rows:
        npred = r["tp"] + r["fp"]
        assert r["tp"] >= prev_tp and npred > prev_npred
        prev_tp, prev_npred = r["tp"], npred
        assert r["precision_permille"] == r["tp"] * 1000 // npred
        assert r["recall_permille"] == r["tp"] * 1000 // n_pos
        assert r["f1_permille"] == 2 * r["tp"] * 1000 // (npred + n_pos)
    assert rows[-1]["tp"] == n_pos and rows[-1]["recall_permille"] == 1000
    assert rows[-1]["tp"] + rows[-1]["fp"] == n_pos + n_neg


def test_hybrid_rrf_fusion_laws(spark):
    """RRF identities: every served doc's fused score re-derives from
    its two list ranks (1e9 DIV (60+rank), absent list -> 0); the
    output is the true top-10 of the fused union (descending, doc_id
    tiebreak); and the fixture actually exercises fusion — at least one
    doc carries BOTH ranks, and at least one doc on the served list is
    single-list (otherwise the outer join is untested)."""
    from xova_spark.queries.similarity import ann_hybrid_rrf_topk

    rows = sorted(
        ann_hybrid_rrf_topk(spark, SF).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    prev = None
    both = single = 0
    for r in rows:
        expect = 0
        for rk in (r["rank_lex"], r["rank_sem"]):
            if rk is not None:
                assert 1 <= rk <= 20
                expect += 1_000_000_000 // (60 + rk)
        assert r["rrf_micro"] == expect > 0
        if prev is not None:
            assert prev["rrf_micro"] > r["rrf_micro"] or (
                prev["rrf_micro"] == r["rrf_micro"]
                and prev["doc_id"] < r["doc_id"]
            )
        prev = r
        if r["rank_lex"] is not None and r["rank_sem"] is not None:
            both += 1
        if (r["rank_lex"] is None) != (r["rank_sem"] is None):
            single += 1
    assert both >= 1 and single >= 1


def test_mmr_rerank_matches_python_greedy_replica(spark):
    """Replay the MMR greedy walk in pure python over the same integer
    (rel, pairwise-sim) lattice and demand the identical selection
    order — and check diversification actually bit: the MMR order must
    differ from pure-relevance order OR every selection's maxsim must
    be the true max against the running selected set."""
    from xova_spark.queries.similarity import (
        _MMR_K,
        ann_mmr_rerank,
        ann_hybrid_rrf_topk,  # noqa: F401 — same pack, ensures import
    )
    from xova_spark.queries import similarity as S
    from xova_spark.sharedframes import shared

    got = sorted(
        ann_mmr_rerank(spark, SF).collect(), key=lambda r: r["sel_rank"]
    )
    cands = {
        r["doc_id"]: r["rel_micro"]
        for r in shared(spark, ("mmr_cands", SF), None).collect()
    }
    sims = {
        (r["a"], r["b"]): r["sim_micro"]
        for r in shared(spark, ("mmr_sims", SF), None).collect()
    }
    selected: list[int] = []
    for step in range(1, _MMR_K + 1):
        best = None
        for d, rel in cands.items():
            if d in selected:
                continue
            ms = max((sims[(d, s)] for s in selected), default=0)
            key = (2 * rel - ms, -d)
            if best is None or key > best[0]:
                best = (key, d, rel, ms)
        _, d, rel, ms = best
        selected.append(d)
        r = got[step - 1]
        assert (r["doc_id"], r["rel_micro"], r["maxsim_micro"]) == (d, rel, ms)
    pure_rel = [
        d for d, _ in sorted(cands.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_MMR_K]
    assert selected != pure_rel or all(
        got[i]["maxsim_micro"] == 0 for i in range(_MMR_K)
    )


def test_weighted_median_matches_python_replica(spark):
    """Weighted-median rule (smallest price with 2*cumw >= W) replayed
    in pure python over the same (flag, price, weight) triples as the
    registry entry agg_weighted_median."""
    from pyspark.sql import functions as F

    from xova_spark.queries.relext import _t, agg_weighted_median

    (li,) = _t(spark, SF, "lineitem")
    rows = (
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
        .collect()
    )
    groups: dict[str, dict[float, int]] = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], {})[r["price"]] = r["w"]
    got = {
        r["l_returnflag"]: r for r in agg_weighted_median(spark, SF).collect()
    }
    assert set(got) == set(groups)
    for flag, by_price in groups.items():
        total = sum(by_price.values())
        cum = 0
        med = None
        for price in sorted(by_price):
            cum += by_price[price]
            if 2 * cum >= total:
                med = price
                break
        assert got[flag]["total_w"] == total
        assert got[flag]["weighted_median"] == med

def test_zonemap_prune_layout_lesson(spark):
    """The audit must quantify the clustering lesson: under the
    key-clustered layout every point probe prunes to exactly ONE file
    (skipping >= 90% of rows); under the time layout zone ranges are
    near-full so skipping is ~nil; and candidate rows always bound the
    true matches from above."""
    from xova_spark.queries.layoutq import layout_zonemap_prune_audit

    rows = layout_zonemap_prune_audit(spark, SF).collect()
    by_layout: dict[str, list] = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
        assert 0 <= r["true_rows"] <= r["cand_rows"]
        assert 0 < r["cand_files"] <= r["n_files"]
        assert r["true_rows"] > 0  # every probe key exists in orders
    assert set(by_layout) == {"time", "key"}
    n_key_files = by_layout["key"][0]["n_files"]
    for r in by_layout["key"]:
        assert r["cand_files"] == 1
        # one file of ~total/n_files rows survives the zone filter
        assert r["skipped_permille"] >= 1000 - 2 * (1000 // n_key_files)
    avg_key = sum(r["skipped_permille"] for r in by_layout["key"]) / len(
        by_layout["key"]
    )
    avg_time = sum(r["skipped_permille"] for r in by_layout["time"]) / len(
        by_layout["time"]
    )
    assert avg_key > avg_time + 500  # clustering is the whole effect


def test_multitouch_attribution_books_balance(spark):
    """Every purchase's distributed credit must sum to EXACTLY 1000
    permille regardless of touch count, and the fixture must exercise
    all three credit paths (single touch, pair, U-shape with middles).
    Rebuilt from the same join, grouped per purchase."""
    from pyspark.sql import Window, functions as F

    from xova_spark.queries.relext import _t, ev_multitouch_attribution

    (ev,) = _t(spark, SF, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
    )
    j = purch.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    wp = Window.partitionBy("p_id")
    ranked = j.select(
        "p_id",
        F.row_number().over(wp.orderBy("t_ts", "t_id")).alias("pos"),
        F.count("*").over(wp).alias("n"),
    )
    credited = ranked.select(
        "p_id",
        "n",
        F.when(F.col("n") == 1, 1000)
        .when(F.col("n") == 2, 500)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 400)
        .otherwise(
            F.expr(
                "200 DIV (n - 2)"
                " + CASE WHEN pos = 2 THEN 200 % (n - 2) ELSE 0 END"
            )
        )
        .alias("credit"),
    )
    per_p = credited.groupBy("p_id", "n").agg(
        F.sum("credit").alias("total")
    ).collect()
    assert len(per_p) > 0
    ns = set()
    for r in per_p:
        assert r["total"] == 1000, (r["p_id"], r["n"], r["total"])
        ns.add(min(int(r["n"]), 3))
    assert ns == {1, 2, 3} or 3 in ns  # U-shape path exercised
    # channel rollup conserves the total credit
    out = ev_multitouch_attribution(spark, SF).collect()
    assert sum(r["credit_permille_total"] for r in out) == 1000 * len(per_p)


def test_rank_agreement_identities(spark):
    """Structural identities of the agreement readout: intersection
    bounded by both list sizes, Jaccard from the declared formula, pair
    counts bounded by C(n_common, 2), tau in [-1000, 1000] and equal to
    its 2000C/(C+D)-1000 form; every RRF-served doc carrying BOTH ranks
    witnesses the intersection."""
    from xova_spark.queries.similarity import (
        ann_hybrid_rrf_topk,
        ann_rank_agreement,
    )

    r = ann_rank_agreement(spark, SF).collect()[0]
    assert 0 < r["n_common"] <= min(r["n_lex"], r["n_sem"])
    assert r["jaccard_permille"] == r["n_common"] * 1000 // (
        r["n_lex"] + r["n_sem"] - r["n_common"]
    )
    max_pairs = r["n_common"] * (r["n_common"] - 1) // 2
    assert 0 <= r["conc_pairs"] + r["disc_pairs"] <= max_pairs
    assert -1000 <= r["tau_permille"] <= 1000
    cd = r["conc_pairs"] + r["disc_pairs"]
    want_tau = 0 if cd == 0 else 2000 * r["conc_pairs"] // cd - 1000
    assert r["tau_permille"] == want_tau
    both = [
        x
        for x in ann_hybrid_rrf_topk(spark, SF).collect()
        if x["rank_lex"] is not None and x["rank_sem"] is not None
    ]
    assert len(both) <= r["n_common"] and len(both) >= 1


def test_source_lang_entropy_matches_python_replica(spark):
    """Replay the ln-latticed entropy in pure python per source; check
    the diversity bounds: 0 <= H <= ln(n_langs) (lattice slack 1 unit),
    monolingual sources hit exactly 0."""
    import math

    from pyspark.sql import functions as F

    from xova_spark.queries.textops import _docs, t_source_lang_entropy

    (docs,) = _docs(spark, SF)
    cells = (
        docs.groupBy("source", "lang").agg(F.count("*").alias("cnt")).collect()
    )
    by_src: dict[str, dict[str, int]] = {}
    for r in cells:
        by_src.setdefault(r["source"], {})[r["lang"]] = r["cnt"]
    got = {r["source"]: r for r in t_source_lang_entropy(spark, SF).collect()}
    assert set(got) == set(by_src)
    for src, langs in by_src.items():
        n = sum(langs.values())
        wsum = sum(
            c * round((math.log(n) - math.log(c)) * 1_000_000)
            for c in langs.values()
        )
        want = wsum // n
        r = got[src]
        assert r["n_docs"] == n and r["n_langs"] == len(langs)
        assert r["dominant_share_permille"] == max(langs.values()) * 1000 // n
        assert r["entropy_micro"] == want
        assert 0 <= r["entropy_micro"] <= round(
            math.log(len(langs)) * 1_000_000
        ) + 1
        if len(langs) == 1:
            assert r["entropy_micro"] == 0
