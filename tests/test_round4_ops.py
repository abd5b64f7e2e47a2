"""Law tests for the round-4 operator additions."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_repeated_substring_windows_laws(spark):
    from xova_spark.queries.textops import (
        _WIN_LEN,
        _WIN_STRIDE,
        t_repeated_substring_windows,
    )

    out = t_repeated_substring_windows(spark, SF).toPandas()
    assert len(out) > 0
    assert (out["n_docs"] >= 2).all()
    assert (out["n_occurrences"] >= out["n_docs"]).all()
    # stride guarantee: 50% overlap — windows tile every STRIDE chars
    assert _WIN_LEN == 2 * _WIN_STRIDE


def test_repeated_substring_windows_finds_planted_dup(spark):
    """A >= 1.5x-window-length span shared by two docs MUST produce at
    least one aligned shared window at 50% overlap."""
    from xova_spark.queries import textops as T

    span = "x" * 48 + "unique-marker-payload-of-the-span"
    docs = spark.createDataFrame(
        [
            (1, "aaaa " + span + " tail one", "en", "s1", len("aaaa " + span + " tail one")),
            (2, "bbbbbbbbb " + span + " other", "en", "s2", len("bbbbbbbbb " + span + " other")),
            (3, "completely unrelated text of enough length to window over", "en", "s3", 58),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import xova_spark.session as S

    orig = S.load_tables
    try:
        S.load_tables = lambda spark, sf, names: {"documents": docs}
        T.load_tables = S.load_tables
        out = T.t_repeated_substring_windows(spark, "ignored").toPandas()
    finally:
        S.load_tables = orig
        T.load_tables = orig
    assert len(out) >= 1
    assert set(out["first_doc"]) <= {1, 2}


def test_shard_assignment_partitions_corpus(spark):
    from xova_spark.queries.textops import _N_SHARDS, t_shard_assignment
    from xova_spark.session import load_tables

    out = t_shard_assignment(spark, SF).toPandas()
    n_docs = load_tables(spark, SF, ("documents",))["documents"].count()
    assert out["n_docs"].sum() == n_docs
    assert out["shard"].between(0, _N_SHARDS - 1).all()
    # determinism: identical on re-run
    again = t_shard_assignment(spark, SF).toPandas()
    k = ["lang", "shard"]
    assert out.sort_values(k).reset_index(drop=True).equals(
        again.sort_values(k).reset_index(drop=True)
    )


def test_cross_split_contamination_is_subset_of_lsh_pairs(spark):
    from xova_spark.queries.dedup import (
        dedup_cross_split_contamination,
        dedup_minhash_lsh,
    )

    cont = dedup_cross_split_contamination(spark, SF).toPandas()
    pairs = dedup_minhash_lsh(spark, SF).toPandas()
    allp = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert len(cont) > 0
    assert set(zip(cont["doc_a"], cont["doc_b"])) <= allp
    assert (cont["split_a"] != cont["split_b"]).all()


def test_phash_topk_laws(spark):
    """Top-k integer-Hamming retrieval: ranks are 1..5 per query,
    distances are non-decreasing in rank, and any neardup-pair partner
    of a query (threshold search) must appear among its top-k whenever
    the query has < k partners at or below the pair threshold."""
    from xova_spark.queries.multimodalq import (
        mm_phash_hamming_topk,
        mm_phash_neardup_pairs,
    )

    topk = mm_phash_hamming_topk(spark, SF).toPandas()
    for qid, g in topk.groupby("qid"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert g["hamming"].is_monotonic_increasing
    pairs = mm_phash_neardup_pairs(spark, SF).toPandas()
    qids = set(topk["qid"])
    got = {(r.qid, r.cid) for r in topk.itertuples()}
    for r in pairs.itertuples():
        for q, c in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            if q in qids:
                n_better = (
                    (topk[topk["qid"] == q]["hamming"] <= r.hamming).sum()
                )
                if n_better < 5:
                    assert (q, c) in got, (q, c, r.hamming)


def test_empty_selection_flows_through(spark, ms, tmp_path):
    """100 TB robustness: a selection matching nothing (field id that
    does not exist) must flow through averaging, greedy binning, write,
    and re-read as a 0-row result with the correct schema — never a
    crash (empty partitions are routine at scale)."""
    import os

    from xova_spark.operators import bda as B
    from xova_spark.operators.timechannel import timechannel
    from xova_spark.sources.ms_fixture import load_ms
    from xova_spark.sources.ms_writer import write_ms

    out = timechannel(ms, time_bin_secs=4.0, chan_bin_size=8, fields=[99])
    assert out["ms_rows"].count() == 0
    assert out["ms_vis"].count() == 0
    assert "TIME" in out["ms_rows"].columns

    bout = B.bda(ms, decorrelation=0.99, max_fov=15.0, time_bin_secs=1e9,
                 fields=[99])
    assert bout["ms_rows"].count() == 0

    path = os.path.join(str(tmp_path), "empty.ms")
    write_ms(out, path, force=True)
    back = load_ms(spark, path)
    assert back["ms_rows"].count() == 0


def test_bpe_roundtrip_all_ok(spark):
    from xova_spark.queries.textops import t_bpe_roundtrip

    row = t_bpe_roundtrip(spark, SF).collect()[0]
    assert row["all_ok"] is True
    assert row["n_roundtrip_ok"] == row["n_word_types"] > 0
    assert 0 < row["n_multi_token"] <= row["n_word_types"]


def test_tokenizer_fertility_laws(spark):
    from xova_spark.queries.textops import t_tokenizer_fertility_by_lang

    out = t_tokenizer_fertility_by_lang(spark, SF).toPandas()
    assert len(out) == 5  # one row per fixture language
    assert (out["n_subwords"] >= out["n_tokens"]).all()  # >= 1 subword/word
    assert (out["fertility_permille"] >= 1000).all()


def test_scene_segments_laws(spark):
    """Scenes tile each video's frames exactly: scene ids are 1..K,
    lengths sum to n_frames, starts are strictly increasing, and the
    number of scenes equals mm_keyframe_select's keyframe count (every
    boundary opens a scene)."""
    from xova_spark.queries.multimodalq import (
        mm_keyframe_select,
        mm_scene_segments,
    )

    seg = mm_scene_segments(spark, SF).toPandas()
    kf = (
        mm_keyframe_select(spark, SF).toPandas().set_index("doc_id")
    )
    for doc_id, g in seg.groupby("doc_id"):
        g = g.sort_values("scene_id")
        assert list(g["scene_id"]) == list(range(1, len(g) + 1))
        assert g["start_frame"].is_monotonic_increasing
        assert g["n_frames"].sum() == kf.loc[doc_id, "n_frames"]
        assert len(g) == kf.loc[doc_id, "n_keyframes"]


def test_scene_dedup_matches_exact_doc_dups(spark):
    """Exact duplicate documents (dedup_exact groups) share ALL their
    scenes — every exact text-dup pair must surface in the scene-dedup
    fingerprint groups."""
    from xova_spark.queries.dedup import dedup_exact
    from xova_spark.queries.multimodalq import mm_scene_dedup

    scenes = mm_scene_dedup(spark, SF).toPandas()
    assert len(scenes) > 0
    assert (scenes["n_videos"] >= 2).all()
    assert (scenes["n_occurrences"] >= scenes["n_videos"]).all()
    dups = dedup_exact(spark, SF).toPandas()
    multi = dups[dups["n_copies"] >= 2] if "n_copies" in dups else None
    if multi is not None and len(multi):
        assert len(scenes) >= 1  # dup docs guarantee shared scene content


def test_audio_fingerprint_offset_robust(spark):
    """Shazam-property law: a clip embedded at a frame-aligned offset
    inside another recording must still match (the shingle join keys on
    landmark VALUES, not positions)."""
    import random

    from xova_spark.queries import multimodalq as MQ

    rng = random.Random(7)
    clip = "".join(chr(rng.randrange(32, 127)) for _ in range(64 * 8))
    pad = "".join(chr(rng.randrange(32, 127)) for _ in range(64 * 2))
    other = "".join(chr(rng.randrange(32, 127)) for _ in range(64 * 8))
    docs = spark.createDataFrame(
        [
            (1, clip, "en", "s", len(clip)),
            (2, pad + clip, "en", "s", len(pad + clip)),  # 2-frame offset
            (3, other, "en", "s", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = MQ.load_tables
    try:
        MQ.load_tables = lambda spark, sf, names: {"documents": docs}
        out = MQ.mm_audio_fingerprint_matches(spark, "ignored").toPandas()
    finally:
        MQ.load_tables = orig
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs, pairs  # offset copy matches
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated doesn't


def test_containment_pairs_finds_planted_excerpt(spark):
    """The word-soup corpus has no excerpt relations (the gate rows are
    legitimately zero) — plant one: a short document fully contained in
    a much larger one must surface with containment >= 0.8 while its
    Jaccard stays < 0.5 (union-dominated), and a symmetric near-dup
    pair must NOT appear (its Jaccard is high)."""
    import random

    from xova_spark.queries import dedup as D

    rng = random.Random(11)
    words = [f"w{rng.randrange(400)}" for _ in range(40)]
    small = " ".join(words)
    big = " ".join(
        [f"x{rng.randrange(4000)}" for _ in range(140)] + words
    )
    twin = small + " zzz"  # symmetric near-dup of `small`
    docs = spark.createDataFrame(
        [
            (1, small, "en", "s", len(small)),
            (2, big, "en", "s", len(big)),
            (3, twin, "en", "s", len(twin)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = D._docs
    try:
        D._docs = lambda spark, sf: (docs,)
        out = D.dedup_containment_pairs(spark, "ignored").toPandas()
    finally:
        D._docs = orig
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs, out
    row = out[(out["doc_a"] == 1) & (out["doc_b"] == 2)].iloc[0]
    assert row["containment_permille"] >= 800
    assert row["jaccard"] < 0.5
    assert (1, 3) not in pairs  # symmetric near-dup excluded by design


def test_langid_confusion_laws(spark):
    """Confusion rows per true language sum to that language's doc
    count and to 1000 permille (up to integer-division truncation)."""
    from xova_spark.queries.textops import t_langid_confusion
    from xova_spark.session import load_tables

    out = t_langid_confusion(spark, SF).toPandas()
    docs = load_tables(spark, SF, ("documents",))["documents"].toPandas()
    by_lang = docs.groupby("lang").size()
    for lang, g in out.groupby("true_lang"):
        assert g["n_docs"].sum() == by_lang[lang]
        assert 1000 - len(g) < g["rate_permille"].sum() <= 1000


def test_equidepth_histogram_laws(spark):
    """Equi-depth law: within each group, bucket counts differ by at
    most 1, ranges are non-overlapping and ordered, and counts sum to
    the group size."""
    from xova_spark.queries.relext import REGISTRY as RE
    from xova_spark.session import load_tables

    out = RE["agg_equidepth_histogram"][0](spark, SF).toPandas()
    li = load_tables(spark, SF, ("lineitem",))["lineitem"].toPandas()
    sizes = li.groupby("l_returnflag").size()
    for flag, g in out.groupby("l_returnflag"):
        g = g.sort_values("bucket")
        assert g["n_rows"].max() - g["n_rows"].min() <= 1
        assert g["n_rows"].sum() == sizes[flag]
        assert (g["lo"] <= g["hi"]).all()
        assert (g["hi"].values[:-1] <= g["lo"].values[1:]).all()
