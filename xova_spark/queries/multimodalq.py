"""Multimodal query pack — mapInPandas media plumbing under the hash gate.

The deterministic fake decode (payload bytes = intensity samples; see
operators/multimodal.py) makes every media transform ALSO expressible
in ANSI SQL over characters (the corpus is ASCII, so byte == char):
the driver's value-hash therefore verifies the Arrow batch iteration,
multi-row frame explode, and metadata propagation — the parts that stay
when a real codec replaces the fake kernel.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xova_spark.operators import multimodal as MM
from xova_spark.queries.relational import load_tables

REGISTRY: dict[str, tuple] = {}

_STRIDE = 4
_FRAME = 64
_EVERY = 4
_BINS = 8

# Upper bound on document text length assumed by every mm_* oracle's
# generate_series character walk. Parity silently depends on the fixture
# invariant that no document exceeds this many chars — pinned against
# max(n_chars) of every sf tier in tests/test_multimodal.py, so a
# longer-text fixture fails loudly instead of diverging.
ORACLE_TEXT_CAP = 600


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _media(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return MM.media_table(docs)


def _scene_marks(spark, sf_dir):
    """Frame-grain shot-boundary frame (doc_id, k, fh, is_b, scene_id),
    JVM-only, persisted once per (session, sf_dir) and shared by the
    scene family (mm_keyframe_select / mm_scene_segments /
    mm_scene_dedup) — r11, the mm_audio_fingerprint_matches lever
    (r10 #16) applied to the video path.

    Each of the three entries ran its OWN ArrowEvalPython
    frame-histogram stage (and mm_scene_dedup a second Python
    frame_sample stage plus a frame x scene range join). With every_n=1
    the frame split is fixed-offset byte slices, so the histogram is
    computable straight from the payload bytes:
    ascii(substr(payload, k*F+i, 1)) % BINS is byte-for-byte the
    Python kernel's ``px % n_bins`` (ASCII corpus, byte == char), and
    md5(substr(payload, k*F+1, F)) is exactly the old per-frame md5.
    The L1 boundary test folds element-wise against lag(array) on the
    one doc-partitioned window; the running boundary count assigns
    scene ids AT FRAME GRAIN, so the dedup entry's range join
    (frame_id BETWEEN start AND end) disappears outright. Frames per
    doc are text_len/64 <= ~10 (ORACLE_TEXT_CAP), so the persisted
    frame is corpus-linear and narrow."""
    from pyspark.sql import Window

    from xova_spark.sharedframes import shared

    def build():
        media = _media(spark, sf_dir)
        b = media.filter(
            F.expr(f"length(payload) >= {_FRAME}")
        ).select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(length(payload)"
                    f" div {_FRAME} as int) - 1), k -> struct("
                    f"transform(sequence(0, {_BINS - 1}), c -> "
                    f"size(filter(transform(sequence(1, {_FRAME}),"
                    f" i -> ascii(substr(payload, k * {_FRAME} + i, 1))"
                    f" % {_BINS}), v -> v = c))) AS hs, "
                    f"md5(substr(payload, k * {_FRAME} + 1, {_FRAME}))"
                    f" AS fh))"
                )
            ).alias("k", "s"),
        )
        w = Window.partitionBy("doc_id").orderBy("k")
        marks = (
            b.select(
                "doc_id",
                "k",
                F.col("s.hs").alias("hs"),
                F.col("s.fh").alias("fh"),
            )
            .withColumn("prev", F.lag("hs").over(w))
            .withColumn(
                "is_b",
                (
                    F.col("prev").isNull()
                    | (
                        F.expr(
                            f"aggregate(sequence(0, {_BINS - 1}), 0,"
                            " (acc, j) -> acc + abs(hs[j] - prev[j]))"
                        )
                        > _KF_THRESH
                    )
                ).cast("int"),
            )
        )
        return (
            marks.withColumn(
                "scene_id",
                F.sum("is_b")
                .over(
                    w.rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                .cast("int"),
            )
            .select("doc_id", "k", "fh", "is_b", "scene_id")
        )

    return shared(spark, ("scene_marks", sf_dir), build)


@q(
    "mm_media_schema",
    f"""
SELECT doc_id,
    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
    length(text) AS n_bytes,
    CAST(ceil(sqrt(length(text))) AS INTEGER) AS width,
    CAST(ceil(length(text) / ceil(sqrt(length(text)))) AS INTEGER) AS height,
    CAST(floor(length(text) / 64) AS INTEGER) AS n_frames
FROM documents
""",
)
def mm_media_schema(spark, sf_dir):
    """The typed media table: opaque payload + metadata struct; the
    query projects ONLY metadata — at scale, column pruning must skip
    the payload bytes entirely (verified in tests via ReadSchema)."""
    m = _media(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )


@q(
    "mm_decode_stats",
    f"""
SELECT d.doc_id,
    CAST(count(*) AS INTEGER) AS n_samples,
    sum(ascii(substring(d.text, g.i, 1))) / count(*) AS mean_intensity,
    CAST(min(ascii(substring(d.text, g.i, 1))) AS INTEGER) AS min_intensity,
    CAST(max(ascii(substring(d.text, g.i, 1))) AS INTEGER) AS max_intensity
FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
WHERE g.i <= length(d.text)
GROUP BY d.doc_id
""",
)
def mm_decode_stats(spark, sf_dir):
    """decode -> per-item sample stats via Arrow-batched mapInPandas."""
    return MM.decode_stats(_media(spark, sf_dir))


@q(
    "mm_audio_stats",
    f"""
SELECT d.doc_id,
    CAST(count(*) AS INTEGER) AS n_frames,
    CAST(1 AS INTEGER) AS n_channels,
    CAST(16000 AS INTEGER) AS sample_rate,
    round(count(*) / 16000.0, 9) AS duration_s,
    round(sqrt(sum(ascii(substring(d.text, g.i, 1))
                   * ascii(substring(d.text, g.i, 1))) * 1.0 / count(*)), 6)
        AS rms
FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
WHERE g.i <= length(d.text)
GROUP BY d.doc_id
""",
)
def mm_audio_stats(spark, sf_dir):
    """Audio twin of mm_decode_stats: decode -> per-clip frame count /
    channel count / rate / duration / RMS via the same Arrow-batched
    mapInPandas stage (operators.multimodal.audio_stats). The fake
    kernel reads payload bytes as mono 16 kHz samples, so the SQL twin
    is exact: integer sums of squared byte values are representable in
    doubles, making both engines' mean and sqrt bit-identical (rounding
    is belt-and-braces)."""
    out = MM.audio_stats(_media(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_frames",
        "n_channels",
        "sample_rate",
        F.round("duration_s", 9).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
    )


@q(
    "mm_feature_extract",
    "SELECT d.doc_id, "
    + ", ".join(
        f"CAST(count(*) FILTER (WHERE ascii(substring(d.text, g.i, 1)) % {_BINS}"
        f" = {i}) AS INTEGER) AS f{i}"
        for i in range(_BINS)
    )
    + f"""
FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
WHERE g.i <= length(d.text)
GROUP BY d.doc_id
""",
)
def mm_feature_extract(spark, sf_dir):
    """decode -> fixed-width histogram feature vector (the embedding
    stage of a media pipeline)."""
    return MM.extract_features(_media(spark, sf_dir), _BINS)


@q(
    "mm_resize_stride",
    f"""
SELECT d.doc_id,
    md5(string_agg(substring(d.text, g.i, 1), '' ORDER BY g.i))
        AS payload_hash,
    CAST(count(*) AS INTEGER) AS n_samples
FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
WHERE g.i <= length(d.text) AND (g.i - 1) % {_STRIDE} = 0
GROUP BY d.doc_id
""",
)
def mm_resize_stride(spark, sf_dir):
    """resize (stride-downsample): payload in -> smaller payload out;
    hashes compared so the oracle checks the exact output BYTES."""
    out = MM.resize(_media(spark, sf_dir), _STRIDE)
    return out.select(
        "doc_id", F.md5(F.col("payload")).alias("payload_hash"), "n_samples"
    )


@q(
    "mm_frame_sample",
    f"""
SELECT d.doc_id,
    CAST(g.k AS INTEGER) AS frame_id,
    md5(substring(d.text, g.k * {_FRAME} + 1, {_FRAME})) AS frame_hash
FROM documents d, generate_series(0, 63) g(k)
WHERE g.k < floor(length(d.text) / {_FRAME})
  AND g.k % {_EVERY} = 0
""",
)
def mm_frame_sample(spark, sf_dir):
    """frame-sample: one payload -> many frame rows (multi-row
    mapInPandas output), every n-th fixed-size frame kept."""
    out = MM.frame_sample(_media(spark, sf_dir), _FRAME, _EVERY)
    return out.select(
        "doc_id", "frame_id", F.md5(F.col("frame")).alias("frame_hash")
    )


_KF_THRESH = 16


@q(
    "mm_keyframe_select",
    f"""
WITH counts AS (
  SELECT d.doc_id, CAST(f.k AS INTEGER) AS frame_id, b.c AS class,
         count(*) FILTER (WHERE
             ascii(substring(d.text, f.k * {_FRAME} + g.i, 1)) % {_BINS} = b.c
         ) AS n
  FROM documents d,
       generate_series(0, 63) f(k),
       generate_series(1, {_FRAME}) g(i),
       generate_series(0, {_BINS - 1}) b(c)
  WHERE f.k < floor(length(d.text) / {_FRAME})
  GROUP BY d.doc_id, f.k, b.c
), dist AS (
  SELECT a.doc_id, a.frame_id, sum(abs(a.n - p.n)) AS l1_prev
  FROM counts a JOIN counts p
    ON a.doc_id = p.doc_id AND a.class = p.class
   AND p.frame_id = a.frame_id - 1
  GROUP BY a.doc_id, a.frame_id
), frames AS (
  SELECT doc_id, frame_id FROM counts GROUP BY doc_id, frame_id
)
SELECT f.doc_id,
       count(*) AS n_frames,
       CAST(sum(CASE WHEN d.l1_prev IS NULL OR d.l1_prev > {_KF_THRESH}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keyframes
FROM frames f LEFT JOIN dist d USING (doc_id, frame_id)
GROUP BY f.doc_id
""",
)
def mm_keyframe_select(spark, sf_dir):
    """Content-aware keyframe selection (shot-boundary heuristic): a
    frame is kept when its intensity histogram moves more than the
    threshold from the previous frame (L1), frame 0 always kept.
    Reads the shared JVM-only frame-grain boundary frame (_scene_marks,
    r11 — no Python stage) and rolls it up per video; is_b IS the
    keyframe criterion."""
    return _scene_marks(spark, sf_dir).groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("is_b").alias("n_keyframes"),
    )


@q(
    "mm_image_phash",
    f"""
WITH s AS (
  SELECT d.doc_id, g.i - 1 AS i,
         ascii(substring(d.text, g.i, 1)) AS v,
         length(d.text) AS n
  FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
  WHERE g.i <= length(d.text)
), b AS (
  SELECT doc_id, (i * 64) // n AS blk,
         sum(v) AS bs, count(*) AS bn, max(n) AS n
  FROM s GROUP BY doc_id, (i * 64) // n
), t AS (
  SELECT doc_id, sum(bs) AS ts, max(n) AS n FROM b GROUP BY doc_id
), h AS (
  SELECT b.doc_id,
         CAST(max(t.n) AS BIGINT) AS n_samples,
         CAST(sum(CASE WHEN b.blk >= 32 AND b.bs * t.n > t.ts * b.bn
                       THEN 1 << (b.blk - 32) ELSE 0 END) AS BIGINT) AS hash_hi,
         CAST(sum(CASE WHEN b.blk < 32 AND b.bs * t.n > t.ts * b.bn
                       THEN 1 << b.blk ELSE 0 END) AS BIGINT) AS hash_lo
  FROM b JOIN t USING (doc_id)
  GROUP BY b.doc_id
)
SELECT h.doc_id, h.n_samples, h.hash_hi, h.hash_lo,
       CAST(count(*) OVER (PARTITION BY h.hash_hi, h.hash_lo) - 1 AS BIGINT)
           AS n_same_hash
FROM h
""",
)
def mm_image_phash(spark, sf_dir):
    """Perceptual image hash (64-bit block-mean aHash) over the media
    payloads via Arrow-batched mapInPandas, plus the near-dup signal:
    how many OTHER payloads share the exact hash. Bits are decided on
    the integer cross-multiplied lattice (no float division), so the
    hash — and therefore the oracle — is bit-identical cross-engine;
    with the real PNG/JPEG kernels (decode_auto) the same operator
    hashes real images.

    Scale: hashing is embarrassingly parallel (one mapInPandas pass);
    grouping is ONE shuffle on the 64-bit hash — the image twin of
    dedup_exact, and the first stage of a banded Hamming-distance
    near-dup search (split halves = 2 bands of 32 bits)."""
    from pyspark.sql import Window

    from xova_spark.operators.multimodal import image_phash

    h = image_phash(_media(spark, sf_dir))
    w = Window.partitionBy("hash_hi", "hash_lo")
    return h.select(
        "doc_id",
        "n_samples",
        "hash_hi",
        "hash_lo",
        (F.count("*").over(w) - 1).cast("long").alias("n_same_hash"),
    )


@q(
    "pipeline_media_e2e",
    f"""
WITH s AS (
  SELECT d.doc_id,
         count(*) AS n_samples,
         min(ascii(substring(d.text, g.i, 1))) AS mn,
         max(ascii(substring(d.text, g.i, 1))) AS mx
  FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
  WHERE g.i <= length(d.text)
  GROUP BY d.doc_id
), sb AS (
  SELECT d.doc_id, g.i - 1 AS i,
         ascii(substring(d.text, g.i, 1)) AS v,
         length(d.text) AS n
  FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
  WHERE g.i <= length(d.text)
), bb AS (
  SELECT doc_id, (i * 64) // n AS blk,
         sum(v) AS bs, count(*) AS bn
  FROM sb GROUP BY doc_id, (i * 64) // n
), tt AS (
  SELECT doc_id, sum(bs) AS ts, sum(bn) AS n FROM bb GROUP BY doc_id
), h AS (
  SELECT bb.doc_id,
         CAST(sum(CASE WHEN bb.blk >= 32 AND bb.bs * tt.n > tt.ts * bb.bn
                       THEN 1 << (bb.blk - 32) ELSE 0 END) AS BIGINT)
             AS hash_hi,
         CAST(sum(CASE WHEN bb.blk < 32 AND bb.bs * tt.n > tt.ts * bb.bn
                       THEN 1 << bb.blk ELSE 0 END) AS BIGINT) AS hash_lo
  FROM bb JOIN tt USING (doc_id)
  GROUP BY bb.doc_id
), q AS (
  SELECT doc_id, n_samples FROM s
  WHERE n_samples >= 64 AND mx - mn >= 16
), kept AS (
  SELECT doc_id, n_samples FROM (
    SELECT q.doc_id, q.n_samples,
           row_number() OVER (
             PARTITION BY h.hash_hi, h.hash_lo ORDER BY q.doc_id) AS rn
    FROM q JOIN h USING (doc_id)
  ) WHERE rn = 1
)
SELECT ['image', 'audio', 'video'][CAST(d.doc_id % 3 AS INTEGER) + 1]
           AS media_type,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(q.doc_id) AS BIGINT) AS n_quality,
       CAST(count(k.doc_id) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(k.n_samples), 0) AS BIGINT) AS samples_kept
FROM documents d
LEFT JOIN q ON q.doc_id = d.doc_id
LEFT JOIN kept k ON k.doc_id = d.doc_id
GROUP BY 1
""",
)
def pipeline_media_e2e(spark, sf_dir):
    """MEDIA CURATION FUNNEL — the third e2e flagship (corpus and
    embedding funnels are its siblings): decode-stats quality gate
    (payload long enough, non-blank dynamic range) → perceptual-hash
    exact-dedup (one representative per 64-bit aHash, smallest id
    wins) → per-media-type audit of items / quality survivors / kept
    after dedup / surviving samples. BOTH Arrow mapInPandas stages
    (decode_stats, image_phash) run inside the funnel, so the gate
    hashes the full decode→score→dedup pipeline, not single stages.

    Plan: two embarrassingly-parallel mapInPandas passes over the
    payload column, one hash shuffle for the dedup representative, a
    3-row audit aggregate. At 100 TB the payload scans dominate and
    parallelize linearly; nothing else touches payload bytes."""
    from pyspark.sql import Window

    from xova_spark.operators.multimodal import decode_stats, image_phash

    media = _media(spark, sf_dir)
    s = decode_stats(media)
    h = image_phash(media)
    q_ = s.where(
        (F.col("n_samples") >= 64)
        & (F.col("max_intensity") - F.col("min_intensity") >= 16)
    ).select("doc_id", "n_samples")
    w = Window.partitionBy("hash_hi", "hash_lo").orderBy("doc_id")
    kept = (
        q_.join(h.select("doc_id", "hash_hi", "hash_lo"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_samples")
    )
    return (
        media.select("doc_id", "media_type")
        .join(q_.select("doc_id", F.lit(1).alias("is_q")), "doc_id", "left")
        .join(
            kept.select(
                "doc_id", F.lit(1).alias("is_k"),
                F.col("n_samples").alias("k_samples"),
            ),
            "doc_id",
            "left",
        )
        .groupBy("media_type")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.count("is_q").cast("long").alias("n_quality"),
            F.count("is_k").cast("long").alias("n_kept"),
            F.coalesce(F.sum("k_samples"), F.lit(0))
            .cast("long")
            .alias("samples_kept"),
        )
    )


_PHASH_HAM_T = 8


@q(
    "mm_phash_neardup_pairs",
    f"""
WITH sb AS (
  SELECT d.doc_id, g.i - 1 AS i,
         ascii(substring(d.text, g.i, 1)) AS v,
         length(d.text) AS n
  FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
  WHERE g.i <= length(d.text)
), bb AS (
  SELECT doc_id, (i * 64) // n AS blk,
         sum(v) AS bs, count(*) AS bn
  FROM sb GROUP BY doc_id, (i * 64) // n
), tt AS (
  SELECT doc_id, sum(bs) AS ts, sum(bn) AS n FROM bb GROUP BY doc_id
), h AS (
  SELECT bb.doc_id,
         CAST(sum(CASE WHEN bb.blk >= 32 AND bb.bs * tt.n > tt.ts * bb.bn
                       THEN 1 << (bb.blk - 32) ELSE 0 END) AS BIGINT)
             AS hash_hi,
         CAST(sum(CASE WHEN bb.blk < 32 AND bb.bs * tt.n > tt.ts * bb.bn
                       THEN 1 << bb.blk ELSE 0 END) AS BIGINT) AS hash_lo
  FROM bb JOIN tt USING (doc_id)
  GROUP BY bb.doc_id
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.hash_hi, b.hash_hi))
              + bit_count(xor(a.hash_lo, b.hash_lo)) AS INTEGER) AS hamming
  FROM h a JOIN h b
    ON a.doc_id < b.doc_id
   AND (a.hash_hi = b.hash_hi OR a.hash_lo = b.hash_lo)
)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {_PHASH_HAM_T}
""",
)
def mm_phash_neardup_pairs(spark, sf_dir):
    """Perceptual-hash NEAR-dup pairs via 2-band Hamming blocking: the
    64-bit aHash splits into two 32-bit bands; candidates share at
    least one exact band (two equi-joins — never an all-pairs
    comparison), then the full Hamming distance (bit_count of the
    XOR, both engines) verifies <= {_PHASH_HAM_T}. Banded-candidate
    semantics by declaration, exactly like the minhash-LSH entries:
    the oracle mirrors the banding, and the pigeonhole guarantee is
    distance <= 0 per band — wider recall comes from more/narrower
    bands (the 16-band variant of the same plan). This is the image
    twin of dedup_minhash_lsh: one shuffle per band keyed on the band
    value, verification only on candidates."""
    from xova_spark.operators.multimodal import image_phash

    h = image_phash(_media(spark, sf_dir)).select(
        "doc_id", "hash_hi", "hash_lo"
    )
    a = h.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hash_hi").alias("hi_a"),
        F.col("hash_lo").alias("lo_a"),
    )
    b = h.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hash_hi").alias("hi_b"),
        F.col("hash_lo").alias("lo_b"),
    )
    ham = (
        F.bit_count(F.expr("hi_a ^ hi_b")) + F.bit_count(F.expr("lo_a ^ lo_b"))
    ).cast("int")
    # ONE equi-join PER BAND, unioned and deduped — never an OR-band
    # predicate: Catalyst cannot plan `hi_a = hi_b OR lo_a = lo_b` as a
    # hash join, so the OR form silently becomes a BroadcastNestedLoop
    # (all-pairs) scan — quadratic at scale. The union form is two
    # shuffled hash joins keyed on the band value, i.e. the actual
    # banded-LSH plan the docstring promises (found by the round-4
    # full-registry plan audit).
    by_band = [
        a.join(
            b,
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col(f"{side}_a") == F.col(f"{side}_b")),
        )
        for side in ("hi", "lo")
    ]
    cand = by_band[0].unionByName(by_band[1]).dropDuplicates(
        ["doc_a", "doc_b"]
    )
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= _PHASH_HAM_T)
        .select("doc_a", "doc_b", "hamming")
    )


_PHASH_TOPK_QUERIES = 5


@q(
    "mm_phash_hamming_topk",
    f"""
WITH sb AS (
  SELECT d.doc_id, g.i - 1 AS i,
         ascii(substring(d.text, g.i, 1)) AS v,
         length(d.text) AS n
  FROM documents d, generate_series(1, {ORACLE_TEXT_CAP}) g(i)
  WHERE g.i <= length(d.text)
), bb AS (
  SELECT doc_id, (i * 64) // n AS blk,
         sum(v) AS bs, count(*) AS bn
  FROM sb GROUP BY doc_id, (i * 64) // n
), tt AS (
  SELECT doc_id, sum(bs) AS ts, sum(bn) AS n FROM bb GROUP BY doc_id
), h AS (
  SELECT bb.doc_id,
         CAST(sum(CASE WHEN bb.blk >= 32 AND bb.bs * tt.n > tt.ts * bb.bn
                       THEN 1 << (bb.blk - 32) ELSE 0 END) AS BIGINT)
             AS hash_hi,
         CAST(sum(CASE WHEN bb.blk < 32 AND bb.bs * tt.n > tt.ts * bb.bn
                       THEN 1 << bb.blk ELSE 0 END) AS BIGINT) AS hash_lo
  FROM bb JOIN tt USING (doc_id)
  GROUP BY bb.doc_id
), scored AS (
  SELECT q.doc_id AS qid, c.doc_id AS cid,
         CAST(bit_count(xor(q.hash_hi, c.hash_hi))
              + bit_count(xor(q.hash_lo, c.hash_lo)) AS INTEGER) AS hamming
  FROM h q JOIN h c ON c.doc_id != q.doc_id
  WHERE q.doc_id < {_PHASH_TOPK_QUERIES}
), ranked AS (
  SELECT qid, cid, hamming,
         row_number() OVER (PARTITION BY qid ORDER BY hamming, cid) AS rank
  FROM scored
)
SELECT qid, cid, hamming, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
""",
)
def mm_phash_hamming_topk(spark, sf_dir):
    """IMAGE SIMILARITY SEARCH — top-5 nearest payloads per query image
    by perceptual-hash Hamming distance: the retrieval twin of the
    threshold search (mm_phash_neardup_pairs). This brute-force form is
    the declared RECALL ORACLE for phash retrieval, exactly like
    ann_cosine_topk for embeddings: at 100 TB the serving path is the
    2-band blocked join (candidates share a 32-bit band) with this
    ranking applied to candidates only — the integer-Hamming analogue
    of PQ fetch-and-rerank.

    Plan: one mapInPandas hash pass, then the {_PHASH_TOPK_QUERIES}
    query hashes broadcast over the hash table (scored rows =
    queries x corpus, never corpus²) into one top-k window."""
    from pyspark.sql import Window

    from xova_spark.operators.multimodal import image_phash

    h = image_phash(_media(spark, sf_dir)).select(
        "doc_id", "hash_hi", "hash_lo"
    )
    q_side = h.filter(F.col("doc_id") < _PHASH_TOPK_QUERIES).select(
        F.col("doc_id").alias("qid"),
        F.col("hash_hi").alias("q_hi"),
        F.col("hash_lo").alias("q_lo"),
    )
    ham = (
        F.bit_count(F.expr("q_hi ^ hash_hi"))
        + F.bit_count(F.expr("q_lo ^ hash_lo"))
    ).cast("int")
    w = Window.partitionBy("qid").orderBy("hamming", "cid")
    return (
        h.crossJoin(F.broadcast(q_side))
        .filter(F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            F.col("doc_id").alias("cid"),
            ham.alias("hamming"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
    )


@q(
    "mm_scene_segments",
    f"""
WITH counts AS (
  SELECT d.doc_id, CAST(f.k AS INTEGER) AS frame_id, b.c AS class,
         count(*) FILTER (WHERE
             ascii(substring(d.text, f.k * {_FRAME} + g.i, 1)) % {_BINS} = b.c
         ) AS n
  FROM documents d,
       generate_series(0, 63) f(k),
       generate_series(1, {_FRAME}) g(i),
       generate_series(0, {_BINS - 1}) b(c)
  WHERE f.k < floor(length(d.text) / {_FRAME})
  GROUP BY d.doc_id, f.k, b.c
), dist AS (
  SELECT a.doc_id, a.frame_id, sum(abs(a.n - p.n)) AS l1_prev
  FROM counts a JOIN counts p
    ON a.doc_id = p.doc_id AND a.class = p.class
   AND p.frame_id = a.frame_id - 1
  GROUP BY a.doc_id, a.frame_id
), frames AS (
  SELECT doc_id, frame_id FROM counts GROUP BY doc_id, frame_id
), marks AS (
  SELECT f.doc_id, f.frame_id,
         CASE WHEN d.l1_prev IS NULL OR d.l1_prev > {_KF_THRESH}
              THEN 1 ELSE 0 END AS is_b
  FROM frames f LEFT JOIN dist d USING (doc_id, frame_id)
), scenes AS (
  SELECT doc_id, frame_id,
         sum(is_b) OVER (PARTITION BY doc_id ORDER BY frame_id) AS scene_id
  FROM marks
)
SELECT doc_id, CAST(scene_id AS INTEGER) AS scene_id,
       CAST(min(frame_id) AS INTEGER) AS start_frame,
       CAST(count(*) AS BIGINT) AS n_frames
FROM scenes GROUP BY doc_id, scene_id
""",
)
def mm_scene_segments(spark, sf_dir):
    """VIDEO SCENE SEGMENTATION — consecutive frames grouped into shots
    at the keyframe boundaries (histogram-L1 > threshold opens a new
    scene; frame 0 always does): one row per (video, scene) with start
    frame and length — the structure a frame-sampling curriculum or a
    clip-level dedup keys on. Reads the shared JVM-only frame-grain
    scene assignment (_scene_marks, r11 — no Python stage; boundary
    lag, running scene counter ride ONE doc-partitioned window) and
    rolls it up per (video, scene)."""
    return _scene_marks(spark, sf_dir).groupBy("doc_id", "scene_id").agg(
        F.min("k").cast("int").alias("start_frame"),
        F.count("*").cast("long").alias("n_frames"),
    )


@q(
    "mm_scene_dedup",
    f"""
WITH counts AS (
  SELECT d.doc_id, CAST(f.k AS INTEGER) AS frame_id, b.c AS class,
         count(*) FILTER (WHERE
             ascii(substring(d.text, f.k * {_FRAME} + g.i, 1)) % {_BINS} = b.c
         ) AS n
  FROM documents d,
       generate_series(0, 63) f(k),
       generate_series(1, {_FRAME}) g(i),
       generate_series(0, {_BINS - 1}) b(c)
  WHERE f.k < floor(length(d.text) / {_FRAME})
  GROUP BY d.doc_id, f.k, b.c
), dist AS (
  SELECT a.doc_id, a.frame_id, sum(abs(a.n - p.n)) AS l1_prev
  FROM counts a JOIN counts p
    ON a.doc_id = p.doc_id AND a.class = p.class
   AND p.frame_id = a.frame_id - 1
  GROUP BY a.doc_id, a.frame_id
), frames AS (
  SELECT doc_id, frame_id FROM counts GROUP BY doc_id, frame_id
), marks AS (
  SELECT f.doc_id, f.frame_id,
         CASE WHEN d.l1_prev IS NULL OR d.l1_prev > {_KF_THRESH}
              THEN 1 ELSE 0 END AS is_b
  FROM frames f LEFT JOIN dist d USING (doc_id, frame_id)
), scenes AS (
  SELECT doc_id, frame_id,
         sum(is_b) OVER (PARTITION BY doc_id ORDER BY frame_id) AS scene_id
  FROM marks
), fp AS (
  SELECT s.doc_id, s.scene_id,
         md5(string_agg(
             md5(substring(d.text, s.frame_id * {_FRAME} + 1, {_FRAME})),
             '' ORDER BY s.frame_id)) AS scene_fp,
         count(*) AS n_frames
  FROM scenes s JOIN documents d ON d.doc_id = s.doc_id
  GROUP BY s.doc_id, s.scene_id
)
SELECT scene_fp,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(n_frames) AS BIGINT) AS n_frames
FROM fp
GROUP BY scene_fp
HAVING count(DISTINCT doc_id) >= 2
""",
)
def mm_scene_dedup(spark, sf_dir):
    """CLIP-LEVEL DEDUP — duplicated scenes ACROSS videos: fingerprint
    each scene as the hash of its ordered frame hashes, group by
    fingerprint, and report every scene content that appears in >= 2
    distinct videos. This is the shot-grain dedup a video corpus runs
    after scene segmentation (re-used intros/outros/stock footage),
    keyed exactly like exact text dedup — one shuffle on the
    fingerprint, no pair expansion.

    Plan (r11): the shared frame-grain scene assignment (_scene_marks —
    JVM-only, no Python stage) already carries each frame's md5 AND its
    scene id, so the old frame x scene range join (plus the second
    Python frame_sample pass it joined) disappears; the fingerprint is
    a per-(video, scene) ordered aggregation of frame hashes; the dedup
    is one partial-aggregated groupBy on the 128-bit fingerprint."""
    fp = (
        _scene_marks(spark, sf_dir)
        .groupBy("doc_id", "scene_id")
        .agg(
            F.md5(F.concat_ws("", F.array_sort(
                F.collect_list(
                    F.struct(F.col("k").alias("frame_id"), "fh")
                )
            ).getField("fh"))).alias("scene_fp"),
            F.count("*").alias("n_frames"),
        )
    )
    per_doc = fp.groupBy("scene_fp", "doc_id").agg(
        F.count("*").alias("cnt"), F.max("n_frames").alias("nf")
    )
    return (
        per_doc.groupBy("scene_fp")
        .agg(
            F.sum("cnt").cast("long").alias("n_occurrences"),
            F.count("*").cast("long").alias("n_videos"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("nf").cast("long").alias("n_frames"),
        )
        .filter(F.col("n_videos") >= 2)
    )


_AB_BANDS = 4     # sub-bands per frame (16 samples each at _FRAME=64)
_AB_SHINGLE = 3   # consecutive delta-codes per shingle
_AB_MIN_SHARED = 2  # distinct shared shingles to call a match
_AB_MAX_DF = 32   # stop-landmark cap: shingles in more clips are dropped


@q(
    "mm_audio_fingerprint_matches",
    f"""
WITH e AS (
  SELECT d.doc_id, CAST(f.k AS INTEGER) AS k, b.j AS j,
         sum(CASE WHEN (g.i - 1) // 16 = b.j
                  THEN ascii(substring(d.text, f.k * {_FRAME} + g.i, 1))
                       * ascii(substring(d.text, f.k * {_FRAME} + g.i, 1))
                  ELSE 0 END) AS energy
  FROM documents d,
       generate_series(0, 63) f(k),
       generate_series(1, {_FRAME}) g(i),
       generate_series(0, {_AB_BANDS - 1}) b(j)
  WHERE f.k < floor(length(d.text) / {_FRAME})
  GROUP BY d.doc_id, f.k, b.j
), code AS (
  SELECT a.doc_id, a.k,
         CAST(sum(CASE WHEN a.energy > p.energy THEN 1 << a.j ELSE 0 END)
              AS INTEGER) AS c
  FROM e a JOIN e p ON p.doc_id = a.doc_id AND p.j = a.j AND p.k = a.k - 1
  GROUP BY a.doc_id, a.k
), sh AS (
  SELECT c0.doc_id,
         c0.c * 256 + c1.c * 16 + c2.c AS shingle
  FROM code c0
  JOIN code c1 ON c1.doc_id = c0.doc_id AND c1.k = c0.k + 1
  JOIN code c2 ON c2.doc_id = c0.doc_id AND c2.k = c0.k + 2
), ds AS (SELECT DISTINCT doc_id, shingle FROM sh)
, keep AS (
  SELECT shingle FROM ds GROUP BY shingle HAVING count(*) <= {_AB_MAX_DF}
), dk AS (SELECT ds.doc_id, ds.shingle FROM ds JOIN keep USING (shingle))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_shingles
FROM dk a JOIN dk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {_AB_MIN_SHARED}
""",
)
def mm_audio_fingerprint_matches(spark, sf_dir):
    """AUDIO MATCHING — the Shazam-architecture skeleton over the fake
    codec: per frame, {_AB_BANDS} sub-band energies; per consecutive
    frame pair, a {_AB_BANDS}-bit ENERGY-DELTA SIGN code (robust to
    level changes); consecutive codes roll into {_AB_SHINGLE}-gram
    shingles; clips sharing >= {_AB_MIN_SHARED} distinct shingles are
    matches (shingles in more than {_AB_MAX_DF} clips are dropped —
    stop-landmark removal). Offset-robust by construction: the join
    keys on shingle VALUES, not positions, so a clip embedded later in another still
    collides on its landmark sequence — the inverted-index probe
    pattern of production audio search.

    Plan: one Python decode stage (the shared frame-histogram shape),
    then band energies / delta codes / shingles as per-clip Catalyst
    windows — the only corpus-wide shuffle keys on the shingle value
    (bounded symbol space, heavy map-side combine), candidates only
    ever join through the inverted index — never clip x clip."""
    from pyspark.sql import Window

    media = _media(spark, sf_dir)
    # band energies: one ARRAY of {_AB_BANDS} energies per frame,
    # computed STRAIGHT from the payload bytes — with every_n=1 the
    # frame split is fixed-offset byte slices, so the Python
    # frame_sample stage (ArrowEvalPython over every payload) is pure
    # overhead here; substr(payload, k*F + j*W + i, 1) is byte-for-byte
    # the old substr(frame, j*W + i, 1). Array form instead of a
    # band-grain explode: the old shape shuffled (doc, frame, band)-
    # grain rows through a per-(doc, band) lag window and re-aggregated
    # them back to frame grain — two exchanges over 4x the rows; the
    # delta-sign code now folds element-wise against lag(array) on the
    # SAME doc-partitioned window the shingle leads use, so one
    # exchange carries the whole frame chain.
    band_width = _FRAME // _AB_BANDS
    b = media.filter(F.expr(f"length(payload) >= {_FRAME}")).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(length(payload) div {_FRAME}"
                f" as int) - 1), k -> "
                f"transform(sequence(0, {_AB_BANDS - 1}), j -> "
                f"aggregate(transform(sequence(1, {band_width}),"
                f" i -> cast(ascii(substr(payload,"
                f" k * {_FRAME} + j * {band_width} + i, 1)) as bigint)),"
                " 0L, (acc, v) -> acc + v * v)))"
            )
        ).alias("k", "es"),
    )
    wc = Window.partitionBy("doc_id").orderBy("k")
    code = (
        b.withColumn("prev", F.lag("es").over(wc))
        .filter(F.col("prev").isNotNull())
        .select(
            "doc_id",
            "k",
            F.expr(
                f"cast(aggregate(sequence(0, {_AB_BANDS - 1}), 0,"
                " (acc, j) -> acc +"
                " IF(es[j] > prev[j], shiftleft(1, j), 0)) AS int)"
            ).alias("c"),
        )
    )
    sh = (
        code.withColumn("c1", F.lead("c", 1).over(wc))
        .withColumn("c2", F.lead("c", 2).over(wc))
        .filter(F.col("c2").isNotNull())
        .select(
            "doc_id",
            (F.col("c") * 256 + F.col("c1") * 16 + F.col("c2")).alias("shingle"),
        )
        .distinct()
        # doc x distinct-shingle grain (bounded by frames per clip);
        # consumed three times below (stop-landmark census + both
        # inverted-index sides) — each re-run repeats the Python decode
        # stage. Materialize once.
        .localCheckpoint()
    )
    # STOP-LANDMARK removal: a shingle appearing in many clips would
    # fan out quadratically inside its bucket (the classic inverted-
    # index hot term); production audio search drops over-common
    # landmarks, and so do both engines here — the pair join is then
    # bounded by _AB_MAX_DF^2/2 per shingle.
    keep = sh.groupBy("shingle").count().filter(
        F.col("count") <= _AB_MAX_DF
    ).select("shingle")
    dk = sh.join(keep, "shingle")
    a, bb = dk.alias("a"), dk.alias("b")
    return (
        a.join(
            bb,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared_shingles"))
        .filter(F.col("n_shared_shingles") >= _AB_MIN_SHARED)
    )
