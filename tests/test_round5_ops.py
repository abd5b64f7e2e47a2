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
    # r8 headroom law: the reported quotient is bounded by
    # 1000*nb/c_min (because n1, n2 >= c >= c_min) — LINEAR in corpus
    # size, the analytic bound the lattice headroom audit relies on
    # (SCALE.md; the dividend itself is quadratic and now runs on the
    # 128-bit lattice in both engines).
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    nb = docs.agg(
        F.sum(F.size(F.split("text", " ")) - 1).alias("nb")
    ).collect()[0]["nb"]
    for r in rows:
        assert r["pmi_ratio_permille"] <= 1000 * nb // _PMI_MIN_COUNT, r


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


# ---------------------------------------------------------------------------
# Round-5 continuation: UniMax budget, Heaps fit, Gopher rules, clip stats
# ---------------------------------------------------------------------------


def test_unimax_budget_waterfill_laws(spark):
    """UniMax allocation invariants: allocations sum exactly to the
    budget (floor remainder included), no language exceeds its E-epoch
    capacity, capped languages get exactly their capacity (2000
    epoch-permille), and uncapped languages share evenly (the largest
    may carry the +remainder)."""
    from xova_spark.queries.pipelineq import (
        _UNIMAX_EPOCHS,
        t_unimax_language_budget,
    )

    out = t_unimax_language_budget(spark, SF).toPandas()
    total_toks = int(out["toks"].sum())
    budget = total_toks // 2
    assert int(out["alloc_tokens"].sum()) == budget
    assert (out["alloc_tokens"] <= out["cap"]).all()
    assert (out["cap"] == out["toks"] * _UNIMAX_EPOCHS).all()
    capped = out[out["capped"] == 1]
    uncapped = out[out["capped"] == 0]
    assert (capped["alloc_tokens"] == capped["cap"]).all()
    assert (capped["epochs_permille"] == 1000 * _UNIMAX_EPOCHS).all()
    if len(uncapped) > 1:
        allocs = sorted(uncapped["alloc_tokens"])
        rem = budget - int(capped["cap"].sum())
        # uniform floor share for every uncapped language, the mod
        # remainder on exactly the largest one
        assert allocs[:-1] == [rem // len(uncapped)] * (len(uncapped) - 1)
        assert allocs[-1] == rem // len(uncapped) + rem % len(uncapped)
    # a sequential pure-Python waterfill replica (exact rational test,
    # uniform tail share) must agree exactly with the closed form
    rows = sorted(out.itertuples(), key=lambda r: (int(r.cap), r.lang))
    remaining, want, tail_at = budget, {}, len(rows)
    for idx, r in enumerate(rows):
        if int(r.cap) * (len(rows) - idx) <= remaining:
            want[r.lang] = int(r.cap)
            remaining -= int(r.cap)
        else:
            tail_at = idx
            break
    tail = rows[tail_at:]
    if tail:
        share = remaining // len(tail)
        for r in tail:
            want[r.lang] = share
        want[tail[-1].lang] += remaining - share * len(tail)
    got = dict(zip(out["lang"], out["alloc_tokens"]))
    assert {k: int(v) for k, v in got.items()} == want


def test_heaps_law_fit_matches_numpy_replica(spark):
    """The dyadic-anchor Heaps fit must equal a pandas/numpy replica of
    the same anchors to 6 decimals, and the fitted exponent must be in
    (0, 1] (vocabulary grows, sublinearly or at worst linearly)."""
    import numpy as np
    import pandas as pd

    from xova_spark.queries.textops import _HEAPS_ANCHORS, t_heaps_law_fit

    got = t_heaps_law_fit(spark, SF).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = docs["text"].str.split(" ")
    tok_n = toks.str.len()
    first = {}
    for did, ws in zip(docs["doc_id"], toks):
        for w in ws:
            if w not in first or first[w] > did:
                first[w] = did
    maxd = int(docs["doc_id"].max())
    fds = np.array(sorted(first.values()))
    pts = []
    for a in _HEAPS_ANCHORS:
        if a >= maxd:
            continue
        t = int(tok_n[docs["doc_id"] <= a].sum())
        v = int((fds <= a).sum())
        if t > 0 and v > 0:
            pts.append((t, v))
    pts.append((int(tok_n.sum()), len(first)))
    assert int(got["n_points"]) == len(pts)
    assert int(got["total_tokens"]) == pts[-1][0]
    assert int(got["vocab_size"]) == pts[-1][1]
    x = np.log([p[0] for p in pts])
    y = np.log([p[1] for p in pts])
    k = len(pts)
    beta = (k * (x * y).sum() - x.sum() * y.sum()) / (
        k * (x * x).sum() - x.sum() ** 2
    )
    assert abs(got["heaps_beta"] - beta) < 1e-5
    # the fixture's closed word-soup vocabulary saturates at the first
    # anchor, so the slope is exactly 0 there; natural corpora sit ~0.5
    assert 0 <= got["heaps_beta"] <= 1


def test_gopher_rules_match_pandas_replica(spark):
    """Every per-language rule-failure count must equal a pandas replica
    of the published thresholds, and counts must be internally
    consistent (pass_all <= n_docs - max(fail_*))."""
    import pandas as pd

    from xova_spark.queries import textops as T

    got = (
        T.t_gopher_quality_rules(spark, SF)
        .toPandas()
        .set_index("lang")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ws = docs["text"].str.split(" ")
    n = ws.str.len()
    nd = ws.map(lambda w: len(set(w)))
    nc = docs["text"].str.replace(" ", "", regex=False).str.len()
    nstop = ws.map(lambda w: len(set(w) & set(T.EN_STOP)))
    nalpha = ws.map(lambda w: sum(1 for x in w if x.isalpha() and x.isascii()))
    ok = pd.DataFrame(
        {
            "lang": docs["lang"],
            "wc": (n >= T._GOPHER_MIN_WORDS) & (n <= T._GOPHER_MAX_WORDS),
            "mwl": (T._GOPHER_MIN_MWL * n <= nc)
            & (nc <= T._GOPHER_MAX_MWL * n),
            "stop": nstop >= T._GOPHER_MIN_STOPWORDS,
            "alpha": nalpha * 100 >= n * T._GOPHER_ALPHA_PCT,
            "rep": nd * 100 >= n * T._GOPHER_DISTINCT_PCT,
        }
    )
    by = ok.groupby("lang")
    assert got["n_docs"].tolist() == by.size().sort_index().tolist()
    assert (
        got["fail_word_count"].tolist()
        == (~ok["wc"]).groupby(ok["lang"]).sum().sort_index().tolist()
    )
    assert (
        got["fail_stopword"].tolist()
        == (~ok["stop"]).groupby(ok["lang"]).sum().sort_index().tolist()
    )
    assert (
        got["pass_all"].tolist()
        == ok.assign(
            all=ok[["wc", "mwl", "stop", "alpha", "rep"]].all(axis=1)
        )
        .groupby("lang")["all"]
        .sum()
        .sort_index()
        .tolist()
    )
    # discriminative on the fixture: at least one rule fails somewhere
    assert (got["n_docs"] - got["pass_all"]).sum() > 0


def test_emb_dim_clip_stats_matches_numpy(spark):
    """Clip bounds are exact order statistics (ANSI percentile_disc) and
    the winsorized quantized sum matches numpy bit-exactly; the fixture
    embedding width pins _DIM."""
    import math

    import numpy as np
    import pandas as pd

    from xova_spark.queries.pipelineq import _DIM, emb_dim_clip_stats

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    assert mat.shape[1] == _DIM
    got = emb_dim_clip_stats(spark, SF).toPandas().set_index("dim").sort_index()
    n = mat.shape[0]
    k_lo = math.ceil(0.05 * n) - 1  # ANSI: smallest k with k/n >= f
    k_hi = math.ceil(0.95 * n) - 1
    for d in range(_DIM):
        col = np.sort(mat[:, d])
        lo, hi = col[k_lo], col[k_hi]
        row = got.loc[d]
        assert row["lo_cut"] == lo and row["hi_cut"] == hi
        assert row["n_below_lo"] == int((mat[:, d] < lo).sum())
        assert row["n_above_hi"] == int((mat[:, d] > hi).sum())
        wq = np.floor(np.clip(mat[:, d], lo, hi) * 1048576).astype(np.int64)
        assert row["winsor_sum_q"] == int(wq.sum())


def test_ccnet_buckets_match_replica_cuts(spark):
    """The per-lang tercile cuts must equal the ANSI discrete-percentile
    order statistic of the (gate-proven) bigram scores, and bucket
    counts must replicate a pandas classification against them."""
    import math

    from xova_spark.queries.textops import (
        t_bigram_lm_score,
        t_ccnet_perplexity_buckets,
    )

    got = t_ccnet_perplexity_buckets(spark, SF).toPandas()
    scored = (
        t_bigram_lm_score(spark, SF)
        .select("doc_id", "avg_bigram_prob")
        .toPandas()
    )
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    sl = scored.merge(docs, on="doc_id")
    for lang, grp in sl.groupby("lang"):
        s = sorted(grp["avg_bigram_prob"])
        n = len(s)
        q_tail = s[math.ceil(n / 3) - 1]
        q_head = s[math.ceil(2 * n / 3) - 1]
        rows = got[got["lang"] == lang].set_index("bucket")
        assert float(rows["q_tail"].iloc[0]) == q_tail
        assert float(rows["q_head"].iloc[0]) == q_head
        want = {
            "tail": sum(1 for x in s if x <= q_tail),
            "middle": sum(1 for x in s if q_tail < x <= q_head),
            "head": sum(1 for x in s if x > q_head),
        }
        want = {k: v for k, v in want.items() if v}
        assert dict(zip(rows.index, rows["n_docs"])) == want
        assert int(rows["n_docs"].sum()) == n


def test_boundary_overlap_matches_pandas(spark):
    """Directed seam pairs equal a brute-force pandas replica, and every
    reported seam really is A's tail == B's head."""
    import pandas as pd

    from xova_spark.queries.dedup import _BOUNDARY_K, dedup_boundary_overlap

    got = dedup_boundary_overlap(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ws = docs["text"].str.split(" ")
    k = _BOUNDARY_K
    ok = ws.str.len() >= 2 * k
    firstk = ws[ok].map(lambda w: " ".join(w[:k]))
    lastk = ws[ok].map(lambda w: " ".join(w[-k:]))
    ids = docs["doc_id"][ok].tolist()
    heads = {}
    for did, f in zip(ids, firstk):
        heads.setdefault(f, []).append(did)
    want = set()
    for did, l in zip(ids, lastk):
        for other in heads.get(l, []):
            if other != did:
                want.add((did, other, l))
    assert (
        set(zip(got["doc_a"], got["doc_b"], got["boundary_ngram"])) == want
    )
    assert len(got) == len(want) > 0


def test_asof_forward_matches_bruteforce(spark):
    """Every click's (next_purchase_value, wait_s) must equal a brute
    -force pandas scan: the earliest same-user purchase at-or-after the
    click (ties by value), sentineled when beyond the whole-second
    tolerance."""
    import pandas as pd

    from xova_spark.queries.relext import _ASOF_FWD_TOL_S, join_asof_forward

    got = (
        join_asof_forward(spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    p = ev[ev["event_type"] == "purchase"]
    want_v, want_w = {}, {}
    by_user = {u: g.sort_values(["ts", "value"]) for u, g in p.groupby("user_id")}
    for r in ev[ev["event_type"] == "click"].itertuples():
        g = by_user.get(r.user_id)
        cand = g[g["ts"] >= r.ts] if g is not None else None
        if cand is None or not len(cand):
            want_v[r.event_id], want_w[r.event_id] = -1.0, -1
            continue
        nxt = cand.iloc[0]
        wait = int(
            nxt["ts"].value // 10**9 - pd.Timestamp(r.ts).value // 10**9
        )
        if wait <= _ASOF_FWD_TOL_S:
            want_v[r.event_id] = round(float(nxt["value"]), 6)
            want_w[r.event_id] = wait
        else:
            want_v[r.event_id], want_w[r.event_id] = -1.0, -1
    assert got["wait_s"].to_dict() == want_w
    assert got["next_purchase_value"].to_dict() == {
        k: v for k, v in want_v.items()
    }
    # the tolerance actually bites on the fixture (some -1 and some hits)
    assert (got["wait_s"] == -1).any() and (got["wait_s"] >= 0).any()


def test_weighted_median_matches_numpy(spark):
    """The weighted lower median must equal the first value whose
    cumulative integer weight reaches half the total, recomputed in
    pandas per group."""
    import pandas as pd

    from xova_spark.queries.relext import agg_weighted_median

    got = (
        agg_weighted_median(spark, SF)
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    li["w"] = li["l_quantity"].astype("int64")
    for flag, g in li.groupby("l_returnflag"):
        s = g.groupby("l_extendedprice")["w"].sum().sort_index()
        total = int(s.sum())
        cum = s.cumsum()
        median = cum[cum * 2 >= total].index[0]
        assert int(got.loc[flag, "total_w"]) == total
        assert float(got.loc[flag, "weighted_median"]) == float(median)


def test_pii_scan_precision_and_planted_counts(spark):
    """The PII enrichment is deterministic from doc_id, so expected
    per-doc counts are computable exactly: %4==0 docs carry one email
    (two when %8==0), %4==1 one IPv4, %4==2 one phone, %4==3 only the
    dotted-version DECOY — which must yield all-zero counts (the IPv4
    regex must not fire on `2.5` / `build 17`)."""
    from xova_spark.queries.textops import t_pii_scan

    rows = t_pii_scan(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        d = r["doc_id"]
        exp_em = (1 if d % 4 == 0 else 0) + (1 if d % 8 == 0 else 0)
        assert r["n_emails"] == exp_em, (d, r)
        assert r["n_ipv4"] == (1 if d % 4 == 1 else 0), (d, r)
        assert r["n_phones"] == (1 if d % 4 == 2 else 0), (d, r)
        assert r["has_pii"] == (1 if d % 4 != 3 else 0), (d, r)


def test_pii_redact_scrubs_everything(spark):
    """Redaction law: re-scanning the redacted text finds ZERO entities
    (the scrub is complete), placeholder counts equal the audit column,
    and non-PII docs pass through byte-identical to the enriched text."""
    from pyspark.sql import functions as F

    from xova_spark.queries.textops import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        t_pii_redact,
    )

    red = t_pii_redact(spark, SF)
    residual = red.select(
        *[
            F.sum(
                F.size(F.regexp_extract_all("redacted", F.lit(p), F.lit(0)))
            ).alias(n)
            for n, p in [
                ("em", PII_EMAIL_RE),
                ("ip", PII_IPV4_RE),
                ("ph", PII_PHONE_RE),
            ]
        ]
    ).collect()[0]
    assert residual["em"] == residual["ip"] == residual["ph"] == 0
    rows = red.collect()
    for r in rows:
        placeholders = sum(
            r["redacted"].count(tok) for tok in ("[EMAIL]", "[IP]", "[PHONE]")
        )
        assert placeholders == r["n_redactions"], r["doc_id"]
        if r["doc_id"] % 4 == 3:
            assert "version 2.5 build 17" in r["redacted"]


def test_bm25_matches_python_replica(spark):
    """BM25 law pin: the distributed integer-lattice scoring equals an
    independent driver-side replica (pure Python over the raw texts,
    same k1/b/lattice), including the tie-broken top-k order."""
    import math

    from xova_spark.queries.textops import (
        BM25_QUERY_TERMS,
        BM25_TOPK,
        t_bm25_topk,
    )
    from xova_spark.session import load_tables

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_tables(spark, SF, ("documents",))["documents"].collect()
    }
    n_docs = len(docs)
    sum_dl = sum(len(ws) for ws in docs.values())
    tf = {
        (d, t): ws.count(t)
        for d, ws in docs.items()
        for t in BM25_QUERY_TERMS
        if t in ws
    }
    df = {t: sum(1 for (_, t2) in tf if t2 == t) for t in BM25_QUERY_TERMS}
    idf_micro = {
        t: round(math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1) * 1000000)
        for t in df
        if df[t] > 0
    }
    scores: dict[int, int] = {}
    hits: dict[int, int] = {}
    for (d, t), f in tf.items():
        dl = len(docs[d])
        c = round(
            idf_micro[t]
            * ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * ((dl * n_docs) / sum_dl))))
        )
        scores[d] = scores.get(d, 0) + c
        hits[d] = hits.get(d, 0) + 1
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOPK]
    got = t_bm25_topk(spark, SF).orderBy("rank").collect()
    assert len(got) == len(want) == BM25_TOPK
    for rank, (r, (d, s)) in enumerate(zip(got, want), start=1):
        assert (r["rank"], r["doc_id"], r["score_micro"], r["n_terms_hit"]) == (
            rank, d, s, hits[d]
        )
