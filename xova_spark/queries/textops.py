"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting over the ``documents`` table — all pure Catalyst
expressions (split / higher-order array functions / md5), no Python UDFs,
so the hot path stays JVM-side and scales to 100 TB document corpora.

Each entry has a DuckDB oracle twin (same registry shape as
``relational.REGISTRY``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xova_spark.session import load_tables

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# Shared stopword sets for the language-ID heuristic (deterministic,
# vocabulary-based — the harness corpus is synthetic word soup, so the
# heuristic keys on function words that real corpora separate by language).
EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "it")
DATA_WORDS = ("join", "merge", "filter", "window", "table", "query")


@q(
    "t_token_count",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_actual,
           n_chars
    FROM documents
    """,
)
def t_token_count(spark, sf_dir):
    """Whitespace token counting + char-length validation."""
    (docs,) = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        "n_chars",
    )


@q(
    "t_quality_score",
    """
    WITH w AS (
      SELECT doc_id,
             string_split(text, ' ') AS words,
             length(text) AS nc
      FROM documents
    )
    SELECT doc_id,
           len(words) AS n_tokens,
           round(len(list_distinct(words)) * 1.0 / len(words), 6) AS uniq_ratio,
           round(nc * 1.0 / len(words), 6) AS avg_token_len,
           round(len(list_filter(words, x -> x IN ('the','a','of','and','to','in','is','it')))
                 * 1.0 / len(words), 6) AS stopword_ratio,
           CASE WHEN len(words) BETWEEN 20 AND 1000
                 AND len(list_distinct(words)) * 1.0 / len(words) > 0.2
                THEN 1 ELSE 0 END AS quality_keep
    FROM w
    """,
)
def t_quality_score(spark, sf_dir):
    """Quality scoring: length, lexical diversity, stopword ratio, keep flag
    (the filter a pretraining pipeline applies before dedup)."""
    (docs,) = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n = F.size(words)
    uniq = F.size(F.array_distinct(words)) * F.lit(1.0) / n
    stop_ratio = (
        F.size(F.filter(words, lambda x: x.isin(*EN_STOP))) * F.lit(1.0) / n
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(uniq, 6).alias("uniq_ratio"),
        F.round(F.length("text") * F.lit(1.0) / n, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.when(n.between(20, 1000) & (uniq > 0.2), 1).otherwise(0).alias("quality_keep"),
    )


@q(
    "t_lang_id",
    """
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
    ), feat AS (
      SELECT doc_id, lang,
             len(list_filter(words, x -> x IN ('the','a','of','and','to','in','is','it')))
               * 1.0 / len(words) AS stop_r,
             len(list_filter(words, x -> x IN ('join','merge','filter','window','table','query')))
               * 1.0 / len(words) AS data_r
      FROM w
    )
    SELECT doc_id, lang,
           CASE WHEN stop_r >= 0.08 THEN 'en'
                WHEN data_r >= 0.15 THEN 'tech'
                ELSE 'other' END AS pred_lang,
           round(stop_r, 6) AS stop_r
    FROM feat
    """,
)
def t_lang_id(spark, sf_dir):
    """N-gram/stopword language-ID heuristic (vocabulary-ratio features →
    classification). The harness corpus is synthetic; the operator shape —
    per-doc feature extraction + threshold classifier, zero UDFs — is what
    scales."""
    (docs,) = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n = F.size(words)
    stop_r = F.size(F.filter(words, lambda x: x.isin(*EN_STOP))) * F.lit(1.0) / n
    data_r = F.size(F.filter(words, lambda x: x.isin(*DATA_WORDS))) * F.lit(1.0) / n
    return docs.select(
        "doc_id",
        "lang",
        F.when(stop_r >= 0.08, "en")
        .when(data_r >= 0.15, "tech")
        .otherwise("other")
        .alias("pred_lang"),
        F.round(stop_r, 6).alias("stop_r"),
    )


@q(
    "t_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS content_hash,
           md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_hash
    FROM documents
    """,
)
def t_fingerprint(spark, sf_dir):
    """Document fingerprinting: full-content hash + prefix hash (the cheap
    first-pass key for exact/near-prefix dedup)."""
    (docs,) = _docs(spark, sf_dir)
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
        F.md5(F.array_join(F.slice(words, 1, 8), " ")).alias("prefix_hash"),
    )


@q(
    "t_word_freq_topk",
    """
    SELECT word, n FROM (
      SELECT word, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, word) AS rn
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ) WHERE rn <= 20
    """,
)
def t_word_freq_topk(spark, sf_dir):
    """Corpus vocabulary: explode → count → top-k. The explode shuffles by
    word; at 100 TB this is the map-side-combine-friendly shape (partial
    counts per partition before the shuffle — Spark does this for free).
    Top-k is orderBy+limit (TakeOrderedAndProject: per-partition partial
    top-k merged on the driver), NOT a global row_number window — the
    vocabulary table never funnels through one partition."""
    (docs,) = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
        .select("word", "n")
    )


@q(
    "mm_binary_plumbing",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS blob_hash
    FROM documents
    """,
)
def mm_binary_plumbing(spark, sf_dir):
    """Opaque-binary column plumbing — the multimodal data model: payloads
    as ``binary`` columns with typed metadata alongside. Here the binary is
    utf-8 text (the container has no image/audio codecs); the schema /
    hashing / length plumbing is exactly what image-bytes columns use.
    Decode/feature-extraction stubs live in operators/multimodal.py."""
    (docs,) = _docs(spark, sf_dir)
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("blob_hash"),
    )


def _docs(spark, sf_dir):
    tables = load_tables(spark, sf_dir, ("documents",))
    return [tables["documents"]]


_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@q(
    "t_bpe_token_count",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_subword_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def t_bpe_token_count(spark, sf_dir):
    """BPE-ish regex tokenization (letter runs / digit runs / single
    punctuation — the pre-tokenizer split GPT-style BPE applies before
    merges) vs whitespace tokens; the training-data token-budget
    estimator."""
    (docs,) = _docs(spark, sf_dir)
    # F.lit keeps the raw regex (an F.expr SQL literal would eat the \s)
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
        ).alias("n_subword_tokens"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


from xova_spark.queries.dedup import P31  # noqa: E402  (31-bit hash universe)


@q(
    "t_rolling_fingerprint",
    f"""
    WITH h AS (
      SELECT doc_id,
             (('0x' || substr(md5(substring(text, g.i, 16)), 1, 15))::BIGINT)
               % {P31} AS hv
      FROM documents, generate_series(1, 600) g(i)
      WHERE g.i <= length(text) - 15
    ), sk AS (
      SELECT doc_id, list_sort(list(hv)) AS hs FROM h GROUP BY doc_id
    )
    SELECT doc_id, hs[1] AS f1, hs[2] AS f2, hs[3] AS f3, hs[4] AS f4
    FROM sk
    """,
)
def t_rolling_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (winnowing/MOSS style): hash
    every 16-char sliding window, keep the bottom-4 sketch — documents
    sharing ANY long substring share sketch entries, the basis for
    plagiarism-style near-dup at corpus scale (one explode + one
    aggregation; sketch size is constant per doc)."""
    (docs,) = _docs(spark, sf_dir)
    h = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - 15)
        ).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        F.expr(
            f"cast(conv(substring(md5(substring(text, i, 16)), 1, 15), 16, 10)"
            f" as bigint) % {P31}"
        ).alias("hv"),
    )
    sk = h.groupBy("doc_id").agg(F.sort_array(F.collect_list("hv")).alias("hs"))
    return sk.select(
        "doc_id",
        *[F.element_at("hs", k + 1).alias(f"f{k + 1}") for k in range(4)],
    )


@q(
    "t_pack_sequences",
    """
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT lang, n_tokens,
             (sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS pack_id
      FROM toks
    )
    SELECT lang, CAST(pack_id AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM packed GROUP BY lang, pack_id
    """,
)
def t_pack_sequences(spark, sf_dir):
    """Sequence packing for training: assign documents to fixed token-budget
    packs (512) per language stream by cumulative-fill — pack_id =
    floor(tokens_before / budget). One window per lang partition + one
    groupBy; no Python. At 100 TB the window partitions by (lang, shard)
    so no single partition serializes the corpus — packing is per-shard
    by construction in real pipelines."""
    from pyspark.sql import Window

    (docs,) = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(512)),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


@q(
    "t_split_deterministic",
    """
    WITH r AS (
      SELECT n_chars,
             (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT) % 100 AS h
      FROM documents
    )
    SELECT CASE WHEN h < 80 THEN 'train'
                WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM r GROUP BY 1
    """,
)
def t_split_deterministic(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by content-independent
    key hash (md5 of doc_id) — reproducible across engines and runs,
    unlike sample()/TABLESAMPLE. Embarrassingly parallel: the split is a
    per-row projection, no shuffle until the audit aggregate; at 100 TB
    the split column is written as a partition column so downstream
    readers prune to their split for free."""
    (docs,) = _docs(spark, sf_dir)
    h = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
        " as bigint) % 100"
    )
    r = docs.select(F.col("n_chars"), h.alias("h"))
    split = (
        F.when(F.col("h") < 80, "train")
        .when(F.col("h") < 90, "val")
        .otherwise("test")
    )
    return r.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# BPE merge training (the Sennrich word-frequency formulation)
# ---------------------------------------------------------------------------

_BPE_VOCAB = 100  # top word types by corpus frequency (ties: word asc)
_BPE_MERGES = 6
_BPE_COLLECT_TYPES = 2_000_000  # vocab rows that comfortably fit the driver


def _bpe_train_local(
    wordfreq: list[tuple[str, int]], k: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side BPE rounds over a collected word-frequency table —
    the below-gate twin of the distributed loop (same counting and
    left-to-right non-overlapping merge semantics)."""
    state = [(list(w), f) for w, f in wordfreq]
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for toks, f in state:
            for i in range(len(toks) - 1):
                pr = (toks[i], toks[i + 1])
                counts[pr] = counts.get(pr, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, f"{a} {b}", a + b, c))
        for idx, (toks, f) in enumerate(state):
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            state[idx] = (out, f)
    return merges


def _bpe_oracle_sql(vocab: int, k: int) -> str:
    """DuckDB twin of the iterative trainer: k chained CTE rounds, each
    (adjacent-pair count -> deterministic top-1 -> boundary-aligned
    replace). Both engines count EVERY adjacent index (overlaps included)
    and replace left-to-right non-overlapping — the classic BPE
    semantics — so the learned merge table is hash-EXACT."""
    parts = [
        f"""
WITH w0 AS (
  SELECT word, freq,
         ' ' || array_to_string(regexp_split_to_array(word, ''), ' ') || ' '
             AS toks
  FROM (
    SELECT word, count(*) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) WHERE word != '' GROUP BY word
    ORDER BY freq DESC, word LIMIT {vocab}
  )
)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f"""
, p{r} AS (
  SELECT l[i] || ' ' || l[i+1] AS pair, sum(freq) AS c
  FROM (SELECT freq, string_split(trim(toks), ' ') AS l FROM w{r-1}),
       generate_series(1, 200) g(i)
  WHERE i <= len(l) - 1
  GROUP BY pair
), b{r} AS (SELECT pair, c FROM p{r} ORDER BY c DESC, pair LIMIT 1)
, w{r} AS (
  SELECT word, freq,
         replace(toks, ' ' || (SELECT pair FROM b{r}) || ' ',
                 ' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' ')
             AS toks
  FROM w{r-1}
)"""
        )
    selects = [
        f"SELECT {r} AS merge_rank, pair, replace(pair, ' ', '') AS merged,"
        f" CAST(c AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, k + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@q("t_bpe_train_merges", _bpe_oracle_sql(_BPE_VOCAB, _BPE_MERGES))
def t_bpe_train_merges(spark, sf_dir, vocab=None, k=None):
    """Distributed BPE tokenizer training — learn the top-k merge rules
    over the corpus vocabulary (Sennrich-style: operate on the
    word-frequency table, never the raw corpus).

    Iterative like emb_kmeans_assign: per round, ONE small job counts
    adjacent token pairs over the vocab table (weighted by word
    frequency) and takes the deterministic top-1 (count desc, pair asc)
    driver-side; the merge is then applied as a literal boundary-aligned
    string replace — broadcast in the plan, no shuffle. State is
    persisted per round and unpersisted after (the CC-loop pattern).

    Scale shape (100 TB): corpus -> word-frequency is the only
    corpus-sized shuffle; every round after that touches the vocabulary
    table only (~1M types at web scale, kilobytes here). The merge
    table output is rank-ordered and hash-EXACT against the chained-CTE
    DuckDB twin."""
    merges = _bpe_merge_rules(spark, sf_dir, vocab, k)
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, merged string, pair_count bigint"
    )


def _bpe_merge_rules(
    spark, sf_dir, vocab: int | None = None, k: int | None = None
) -> list:
    """Learn the merge rules (shared by the train and encode queries and
    the ``xova-spark tokenize`` CLI); returns [(rank, pair, merged,
    count)]."""
    vocab = _BPE_VOCAB if vocab is None else vocab
    k = _BPE_MERGES if k is None else k
    (docs,) = _docs(spark, sf_dir)
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(vocab)
    )
    # SIZE-GATED like dedup_cc_clusters: the truncated vocabulary is
    # small by construction (even ~1M web-scale types x a few tokens is
    # tens of MB), so below the gate the k rounds run driver-side on the
    # collected word-frequency table — identical semantics, zero
    # per-round Spark jobs. Above it, the distributed rounds below.
    if vocab <= _BPE_COLLECT_TYPES:
        rows = wf.collect()
        return _bpe_train_local(
            [(r.word, int(r.freq)) for r in rows], k
        )
    cur = wf.select(
        "word",
        "freq",
        F.concat(
            F.lit(" "), F.concat_ws(" ", F.split("word", "")), F.lit(" ")
        ).alias("toks"),
    ).persist()
    merges = []
    _l = "split(trim(toks), ' ')"
    pair_expr = (
        f"explode(zip_with(slice({_l}, 1, size({_l}) - 1),"
        f" slice({_l}, 2, size({_l}) - 1),"
        " (x, y) -> concat(x, ' ', y))) AS pair"
    )
    for r in range(1, k + 1):
        top = (
            cur.selectExpr("freq", pair_expr)
            .groupBy("pair")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        bp, c = top[0].pair, int(top[0].c)
        merged = bp.replace(" ", "")
        merges.append((r, bp, merged, c))
        nxt = cur.withColumn(
            "toks",
            F.replace(
                F.col("toks"), F.lit(f" {bp} "), F.lit(f" {merged} ")
            ),
        ).persist()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def _bpe_encode_oracle_sql(vocab: int, k: int) -> str:
    """Oracle for the encode side: re-derive b1..bk via the training
    CTEs, then apply the merges IN RANK ORDER (innermost replace first)
    to every distinct word type, and roll token counts up per doc."""
    train = _bpe_oracle_sql(vocab, k)
    cte_block = train[: train.rindex("\nSELECT 1 AS merge_rank")]
    enc = "' ' || array_to_string(regexp_split_to_array(word, ''), ' ') || ' '"
    for r in range(1, k + 1):
        enc = (
            f"replace({enc}, ' ' || (SELECT pair FROM b{r}) || ' ', "
            f"' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' ')"
        )
    return (
        cte_block
        + f"""
, corpus_words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), cw AS (SELECT doc_id, word FROM corpus_words WHERE word != '')
, enc AS (
  SELECT word, len(string_split(trim({enc}), ' ')) AS n_sub
  FROM (SELECT DISTINCT word FROM cw)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_ws_tokens,
       CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
FROM cw JOIN enc USING (word)
GROUP BY doc_id
"""
    )


@q("t_bpe_encode_tokens", _bpe_encode_oracle_sql(_BPE_VOCAB, _BPE_MERGES))
def t_bpe_encode_tokens(spark, sf_dir, vocab=None, k=None):
    """BPE ENCODE — the inference side of t_bpe_train_merges: apply the
    learned merge rules (in rank order) to every word and report
    whitespace vs BPE token counts per document.

    Scale shape: the learned rules are a driver-side list (k literals);
    encoding is a chain of k boundary-aligned literal replaces over the
    DISTINCT word-type table (types << corpus tokens), then a broadcast
    join back onto the exploded corpus and one per-doc aggregation —
    the corpus is touched by exactly one explode + one keyed shuffle,
    same as any token-count query. Hash-EXACT against a DuckDB twin
    that re-derives the same merges via the training CTEs."""
    merges = _bpe_merge_rules(spark, sf_dir, vocab, k)
    (docs,) = _docs(spark, sf_dir)
    cw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    types = cw.select("word").distinct()
    toks = F.concat(
        F.lit(" "), F.concat_ws(" ", F.split("word", "")), F.lit(" ")
    )
    for _rank, pair, merged, _c in merges:
        toks = F.replace(toks, F.lit(f" {pair} "), F.lit(f" {merged} "))
    enc = types.select(
        "word", F.size(F.split(F.trim(toks), " ")).alias("n_sub")
    )
    return (
        cw.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ws_tokens"),
            F.sum("n_sub").alias("n_bpe_tokens"),
        )
    )


@q(
    "t_bigram_lm_score",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), bi AS (
      SELECT doc_id, l[i] AS w1, l[i+1] AS w2
      FROM toks, generate_series(1, 400) g(i)
      WHERE i <= len(l) - 1
    ), c2 AS (
      SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY w1, w2
    ), c1 AS (
      SELECT word AS w1, count(*) AS n1 FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) GROUP BY word
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(n2 * 1.0 / n1) / count(*), 6) AS avg_bigram_prob
    FROM bi b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY b.doc_id
    """,
)
def t_bigram_lm_score(spark, sf_dir):
    """Language-model quality scoring (the KenLM-filter analogue): train
    a word-bigram model ON the corpus itself and score each document by
    its average conditional bigram probability p(w2|w1) = c(w1,w2) /
    c(w1) — low scores flag incoherent/outlier documents, the classic
    perplexity-based quality gate of training-data pipelines.

    Probability RATIOS instead of log-probs keep the oracle exact: both
    engines divide the same integers, so no libm (ln) 1-ulp divergence
    enters; the order-dependent sum is round(6) on both sides.

    Scale shape (100 TB): the bigram count table is vocabulary-bounded
    (<< corpus); scoring joins the per-doc bigram stream to it on
    (w1, w2) — a keyed shuffle with map-side partial counts, then one
    per-doc aggregation. Nothing quadratic, nothing driver-side."""
    (docs,) = _docs(spark, sf_dir)
    l = "split(text, ' ')"
    bi = docs.selectExpr(
        "doc_id",
        f"explode(zip_with(slice({l}, 1, size({l}) - 1),"
        f" slice({l}, 2, size({l}) - 1),"
        " (x, y) -> struct(x AS w1, y AS w2))) AS b",
    ).select("doc_id", "b.w1", "b.w2")
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = (
        docs.select(F.explode(F.split("text", " ")).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("n1"))
    )
    return (
        bi.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(F.col("n2") * 1.0 / F.col("n1")) / F.count("*"), 6
            ).alias("avg_bigram_prob"),
        )
    )


# CCNet bucket cut fractions — identical decimal literals in both
# engines so the doubles parse bit-equal; discrete percentiles so the
# cuts are actual score values (the proven percentile_disc pairing).
_CCNET_Q_TAIL = "0.3333333333333333"
_CCNET_Q_HEAD = "0.6666666666666666"


@q(
    "t_ccnet_perplexity_buckets",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), bi AS (
      SELECT doc_id, l[i] AS w1, l[i+1] AS w2
      FROM toks, generate_series(1, 400) g(i)
      WHERE i <= len(l) - 1
    ), c2 AS (
      SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY w1, w2
    ), c1 AS (
      SELECT word AS w1, count(*) AS n1 FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) GROUP BY word
    ), scored AS (
      SELECT b.doc_id,
             round(sum(n2 * 1.0 / n1) / count(*), 6) AS score
      FROM bi b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      GROUP BY b.doc_id
    ), sl AS (
      SELECT s.doc_id, s.score, d.lang
      FROM scored s JOIN documents d USING (doc_id)
    ), cuts AS (
      SELECT lang,
             quantile_disc(score, {_CCNET_Q_TAIL}) AS q_tail,
             quantile_disc(score, {_CCNET_Q_HEAD}) AS q_head
      FROM sl GROUP BY lang
    )
    SELECT sl.lang,
           CASE WHEN sl.score <= c.q_tail THEN 'tail'
                WHEN sl.score <= c.q_head THEN 'middle'
                ELSE 'head' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           c.q_tail, c.q_head
    FROM sl JOIN cuts c USING (lang)
    GROUP BY sl.lang, bucket, c.q_tail, c.q_head
    """,
)
def t_ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail corpus partitioning (Wenzek et al.
    2020): per-language TERCILE cuts of the self-trained bigram-LM
    document score (t_bigram_lm_score — the KenLM-perplexity analogue;
    here HIGHER score = better, so 'head' is the top third), with
    per-bucket document counts and the cut values — the bucketing CCNet
    uses to keep head+middle and drop tail for pretraining.

    Exactness: the score is the established round(6) integer-ratio sum;
    the cuts are DISCRETE per-lang percentiles of those rounded doubles
    (actual elements, no interpolation — the percentile_disc/
    quantile_disc proven pairing with bit-identical fraction literals);
    classification is plain comparisons against them. Plan/scale shape:
    the scoring joins are vocabulary-bounded keyed shuffles (see
    t_bigram_lm_score); the cuts aggregate on the bounded lang key
    (percentile_disc is an aggregate buffer, not a window) and
    broadcast back; final count groups on (lang, bucket)."""
    (docs,) = _docs(spark, sf_dir)
    scored = t_bigram_lm_score(spark, sf_dir).select(
        "doc_id", F.col("avg_bigram_prob").alias("score")
    )
    sl = scored.join(docs.select("doc_id", "lang"), "doc_id")
    cuts = sl.groupBy("lang").agg(
        F.expr(
            f"percentile_disc({_CCNET_Q_TAIL}) WITHIN GROUP (ORDER BY score)"
        ).alias("q_tail"),
        F.expr(
            f"percentile_disc({_CCNET_Q_HEAD}) WITHIN GROUP (ORDER BY score)"
        ).alias("q_head"),
    )
    bucket = (
        F.when(F.col("score") <= F.col("q_tail"), "tail")
        .when(F.col("score") <= F.col("q_head"), "middle")
        .otherwise("head")
    )
    return (
        sl.join(F.broadcast(cuts), "lang")
        .groupBy("lang", bucket.alias("bucket"), "q_tail", "q_head")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select("lang", "bucket", "n_docs", "q_tail", "q_head")
    )


@q(
    "t_importance_weights",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), tgt AS (
      SELECT doc_id FROM documents WHERE source IN ('src0', 'src1')
    ), ct AS (
      SELECT w, count(*) AS ctn FROM tok JOIN tgt USING (doc_id) GROUP BY w
    ), cg AS (
      SELECT w, count(*) AS cgn FROM tok GROUP BY w
    ), tot AS (
      SELECT (SELECT count(*) FROM tok JOIN tgt USING (doc_id)) AS nt,
             (SELECT count(*) FROM tok) AS ng,
             (SELECT count(DISTINCT w) FROM tok) AS v
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum((coalesce(ctn, 0) + 1) * (ng + v) * 1.0
                     / ((cgn + 1) * (nt + v))) / count(*), 6) AS importance
    FROM tok t
    JOIN cg USING (w)
    LEFT JOIN ct USING (w)
    CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def t_importance_weights(spark, sf_dir):
    """DSIR-style importance weights for data selection (Xie et al.'s
    Data Selection with Importance Resampling, unigram form): weight
    each document by its average target-vs-general likelihood ratio —
    train a TARGET language model on the in-domain slice (sources
    src0/src1 here) and a GENERAL one on the whole corpus, then score
    every document by avg over tokens of p_t(w)/p_g(w) (add-one
    smoothed). Documents that look like the target domain get weight
    > 1 and are up-sampled when building the training mix.

    Ratio form instead of the paper's log-likelihood difference keeps
    the oracle exact: every term is a division of identical exact
    integers in both engines ((ct+1)(Ng+V) / (cg+1)(Nt+V), all products
    << 2^53), no libm; the order-dependent sum is round(6) both sides
    (same discipline as t_bigram_lm_score).

    Scale shape (100 TB): both count tables are vocabulary-bounded;
    scoring is the token stream keyed-joined to them on the word, then
    one per-doc aggregation — map-side-combined shuffles only, the
    totals a broadcast 1-row cross join. Nothing quadratic, nothing
    driver-side."""
    (docs,) = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tgt_tok = tok.join(
        docs.where(F.col("source").isin("src0", "src1")).select("doc_id"),
        "doc_id",
    )
    ct = tgt_tok.groupBy("w").agg(F.count("*").alias("ctn"))
    cg = tok.groupBy("w").agg(F.count("*").alias("cgn"))
    tot = (
        tok.agg(
            F.count("*").alias("ng"),
            F.count_distinct("w").alias("v"),
        )
        .crossJoin(F.broadcast(tgt_tok.agg(F.count("*").alias("nt"))))
    )
    ratio = (
        (F.coalesce("ctn", F.lit(0)) + 1)
        * (F.col("ng") + F.col("v"))
        * F.lit(1.0)
        / ((F.col("cgn") + 1) * (F.col("nt") + F.col("v")))
    )
    return (
        tok.join(cg, "w")
        .join(ct, "w", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(ratio) / F.count("*"), 6).alias("importance"),
        )
    )


@q(
    "t_tfidf_topterms",
    """
    WITH doc_terms AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), n_docs AS (
      SELECT count(DISTINCT doc_id) AS n FROM doc_terms
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM doc_terms GROUP BY term
    ), tf AS (
      SELECT lang, term, count(*) AS tf FROM doc_terms GROUP BY lang, term
    ), scored AS (
      SELECT tf.lang, tf.term, tf.tf, df.df,
             tf.tf * round(ln(n.n * 1.0 / df.df), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n_docs n
    )
    SELECT lang, term, tf, df, round(score, 6) AS tfidf, rank
    FROM (
      SELECT lang, term, tf, df, score,
             row_number() OVER (
               PARTITION BY lang ORDER BY round(score, 6) DESC, term) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
)
def t_tfidf_topterms(spark, sf_dir):
    """TF-IDF TOP TERMS per language — the classic corpus-characterization
    query (what distinguishes each language stream): term frequency per
    (lang, term) x inverse document frequency over the whole corpus,
    top 5 per language.

    Cross-engine float discipline: idf = round(ln(N/df), 6) BEFORE the
    multiply — ln differs by <= 1 ulp between JVM and libm, and rounding
    to a fixed decimal first makes the product tf x idf bit-identical in
    both engines (tf is an integer); the rank also orders by the rounded
    score so ties resolve on the term in both.

    Scale shape: one explode of the corpus feeding TWO aggregations that
    share the shuffle key prefix (term): df is a distinct-count keyed on
    term, tf keys on (lang, term); the df table (vocabulary-sized) joins
    back broadcast-or-shuffle by Catalyst's size estimate, and N is a
    driver scalar. Top-5 is a per-lang window over the vocabulary-scale
    scored table — nothing corpus-scale crosses a second shuffle."""
    (docs,) = _docs(spark, sf_dir)
    doc_terms = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    n_docs = docs.select("doc_id").distinct().count()
    df = doc_terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    tf = doc_terms.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    scored = tf.join(df, "term").select(
        "lang",
        "term",
        "tf",
        "df",
        (
            F.col("tf") * F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6)
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc(F.round("score", 6)), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "term", "tf", "df", F.round("score", 6).alias("tfidf"), "rank")
    )


@q(
    "t_sample_weighted",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS w,
             ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_wsample'),
                 1, 15))::BIGINT) % 1000000 + 1) / 1000001.0 AS u
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, w,
             round(-ln(u) / w, 6) AS key
      FROM keyed
    )
    SELECT doc_id, lang, w, key, rank FROM (
      SELECT doc_id, lang, w, key,
             row_number() OVER (
               PARTITION BY lang ORDER BY key, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def t_sample_weighted(spark, sf_dir):
    """DETERMINISTIC WEIGHTED SAMPLING (A-Res / exponential-races): each
    doc draws a reproducible pseudo-uniform u from a salted md5 of its
    id and competes with key = -ln(u)/w (w = token count — longer docs
    proportionally likelier); the k smallest keys per language are the
    weighted sample. This is THE distributed one-pass weighted-
    sampling-without-replacement construction (Efraimidis-Spirakis):
    no global sort of the corpus is needed at scale — per-partition
    top-k then merge (Spark's window-over-rank optimizes to partial
    top-k; at extreme scale swap the window for a groupBy(min_k)
    two-phase agg, same keys).

    Cross-engine float discipline: u is an exact rational from integer
    hash arithmetic; -ln(u)/w differs by <= 1 ulp between engines, so
    the rank orders by round(key, 6) with doc_id tiebreak — same
    discipline as TF-IDF's rounded scores."""
    docs = _docs(spark, sf_dir)[0]
    w = F.size(F.split("text", " "))
    h31 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_wsample"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    u = ((h31 % 1000000) + 1) / F.lit(1000001.0)
    key = F.round(-F.log(u) / w, 6)
    from pyspark.sql import Window

    win = Window.partitionBy("lang").orderBy("key", "doc_id")
    return (
        docs.select("doc_id", "lang", w.alias("w"), key.alias("key"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "lang", "w", "key", "rank")
    )


_VOCAB_K = 256


@q(
    "t_oov_rate",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), freq AS (
      SELECT word, count(*) AS c FROM tok GROUP BY word
    ), vocab AS (
      SELECT word FROM (
        SELECT word, row_number() OVER (ORDER BY c DESC, word) AS rn FROM freq
      ) WHERE rn <= {_VOCAB_K}
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS oov_permille
    FROM tok t LEFT JOIN vocab v ON v.word = t.word
    GROUP BY t.doc_id
    """,
)
def t_oov_rate(spark, sf_dir):
    """Vocabulary-coverage diagnostic: build the top-{_VOCAB_K} corpus
    vocabulary (frequency desc, word asc — total order), then score
    every document's out-of-vocabulary token rate in integer permille.
    The tokenizer-health signal a pipeline watches when the corpus mix
    shifts (rising OOV = vocab no longer fits the data).

    Plan: one token-count shuffle builds the frequency table; the
    top-K vocab is broadcast (K rows) into a left join on the token
    stream; per-doc rates are one more keyed shuffle. The top-K vocab
    select is orderBy+limit (TakeOrderedAndProject — per-partition
    partial top-k, no single-partition window) on the (distinct words)
    table, not the token stream."""
    (docs,) = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    freq = tok.groupBy("word").agg(F.count("*").alias("c"))
    vocab = (
        freq.orderBy(F.desc("c"), "word")
        .limit(_VOCAB_K)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.expr(
                "sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) * 1000"
                " div count(*)"
            ).cast("long").alias("oov_permille"),
        )
    )


@q(
    "udtf_word_bigrams",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bg AS (
      SELECT doc_id,
             ws[g.i] || ' ' || ws[g.i + 1] AS bigram
      FROM w, generate_series(1, 600) g(i)
      WHERE g.i <= len(ws) - 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(count(DISTINCT bigram) AS BIGINT) AS n_distinct_bigrams
    FROM bg GROUP BY doc_id
    """,
)
def udtf_word_bigrams(spark, sf_dir):
    """Python UDTF surface (SURVEY §2.9 — the 5th UDF shape Spark 4
    adds): a table function exploding word bigrams per document,
    applied via the SQL LATERAL join, then aggregated to per-doc
    bigram counts. DEMONSTRATION of the arbitrary-fanout UDF surface:
    the same result is expressible (and faster) with JVM-side
    transform/explode — see t_repetition_signals — so the UDTF seam
    is for logic that genuinely needs Python row fanout (custom
    tokenizers, parsers); the gate verifies the lateral plumbing, not
    a recommendation to route hot paths through Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class WordBigrams:
        def eval(self, text: str):
            ws = text.split(" ")
            for i in range(len(ws) - 1):
                yield (ws[i] + " " + ws[i + 1],)

    spark.udtf.register("word_bigrams_udtf", WordBigrams)
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(count(DISTINCT t.bigram) AS BIGINT) AS n_distinct_bigrams
        FROM documents d, LATERAL word_bigrams_udtf(d.text) t
        GROUP BY d.doc_id
        """
    )


_ZIPF_K = 200


@q(
    "t_zipf_slope",
    f"""
    WITH freq AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ), top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rank
      FROM freq ORDER BY rank LIMIT {_ZIPF_K}
    ), l AS (
      SELECT list(CAST(c AS DOUBLE) ORDER BY rank) AS fs FROM top
    ), sums AS (
      SELECT len(fs) AS k,
             list_sum(list_transform(generate_series(1, len(fs)),
                      i -> ln(CAST(i AS DOUBLE)))) AS sx,
             list_sum(list_transform(generate_series(1, len(fs)),
                      i -> ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE))))
                 AS sxx,
             list_sum(list_transform(fs, f -> ln(f))) AS sy,
             list_sum(list_transform(generate_series(1, len(fs)),
                      i -> ln(CAST(i AS DOUBLE)) * ln(fs[i]))) AS sxy
      FROM l
    )
    SELECT CAST(k AS BIGINT) AS n_words,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k,
                 6) AS intercept
    FROM sums
    """,
)
def t_zipf_slope(spark, sf_dir):
    """Zipf's-law fit over the corpus word-frequency curve: least-
    squares slope of ln(freq) on ln(rank) for the top {_ZIPF_K} words
    (natural text sits near −1; word-soup or boilerplate corpora
    deviate — a one-number corpus-health diagnostic).

    Exactness: float sums over the 200 (rank, freq) points are
    summation-ORDER-dependent, so neither engine may use a parallel
    aggregate — both fold the rank-ordered array SEQUENTIALLY
    (F.aggregate over sort_array vs list_sum over an ORDER BY list),
    making every intermediate bit-identical; round(6) on the two
    outputs. Plan: one token-count shuffle, a top-K orderBy+limit of the
    distinct-word table (TakeOrderedAndProject — distributed partial
    top-k, no global window), a rank window over only the K surviving
    rows (bounded at _ZIPF_K regardless of corpus size), then one
    driver-sized row."""
    from pyspark.sql import Window

    (docs,) = _docs(spark, sf_dir)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    top = (
        freq.orderBy(F.desc("c"), "word")
        .limit(_ZIPF_K)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("c"), "word"))
        )
        .select("rank", F.col("c").cast("double").alias("f"))
    )
    arr = top.agg(
        F.sort_array(F.collect_list(F.struct("rank", "f"))).alias("a")
    )
    lnr = "ln(cast(x.rank as double))"
    fold = lambda expr: F.expr(  # noqa: E731 — sequential fold helper
        f"aggregate(a, cast(0.0 as double), (acc, x) -> acc + ({expr}))"
    )
    sums = arr.select(
        F.size("a").alias("k"),
        fold(lnr).alias("sx"),
        fold(f"{lnr} * {lnr}").alias("sxx"),
        fold("ln(x.f)").alias("sy"),
        fold(f"{lnr} * ln(x.f)").alias("sxy"),
    )
    k = F.col("k").cast("double")
    slope = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("k").cast("long").alias("n_words"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / k, 6).alias("intercept"),
    )


# Heaps'-law anchors: vocabulary size is sampled where the document-id
# prefix crosses 2^k - 1 — a FIXED dyadic ladder, so the number of fit
# points is O(log corpus) at any scale and both engines pick identical
# prefixes. Anchors beyond max(doc_id) collapse to the full-corpus sums
# and are filtered out; the true full-corpus point is appended last.
_HEAPS_ANCHORS = tuple(2**k - 1 for k in range(4, 41))


def _heaps_sql() -> str:
    t_cases = ", ".join(
        f"CAST(sum(CASE WHEN doc_id <= {a} THEN t ELSE 0 END) AS BIGINT)"
        f" AS t{k}"
        for k, a in enumerate(_HEAPS_ANCHORS)
    )
    v_cases = ", ".join(
        f"CAST(sum(CASE WHEN fd <= {a} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS v{k}"
        for k, a in enumerate(_HEAPS_ANCHORS)
    )
    structs = ", ".join(
        f"{{'a': CAST({a} AS BIGINT), 't': t{k}, 'v': v{k}}}"
        for k, a in enumerate(_HEAPS_ANCHORS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS t FROM documents
    ), ts AS (
      SELECT {t_cases},
             CAST(sum(t) AS BIGINT) AS t_all,
             CAST(max(doc_id) AS BIGINT) AS maxd
      FROM tok
    ), fo AS (
      SELECT word, min(doc_id) AS fd
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      GROUP BY word
    ), vs AS (
      SELECT {v_cases}, CAST(count(*) AS BIGINT) AS v_all FROM fo
    ), pt AS (
      SELECT list_concat(
               list_filter([{structs}],
                           p -> p.a < maxd AND p.t > 0 AND p.v > 0),
               [{{'a': maxd, 't': t_all, 'v': v_all}}]) AS pts,
             t_all, v_all
      FROM ts, vs
    ), sums AS (
      SELECT len(pts) AS k,
             list_sum(list_transform(pts,
                 p -> ln(CAST(p.t AS DOUBLE)))) AS sx,
             list_sum(list_transform(pts,
                 p -> ln(CAST(p.t AS DOUBLE)) * ln(CAST(p.t AS DOUBLE))))
                 AS sxx,
             list_sum(list_transform(pts,
                 p -> ln(CAST(p.v AS DOUBLE)))) AS sy,
             list_sum(list_transform(pts,
                 p -> ln(CAST(p.t AS DOUBLE)) * ln(CAST(p.v AS DOUBLE))))
                 AS sxy,
             t_all, v_all
      FROM pt
    )
    SELECT CAST(k AS BIGINT) AS n_points,
           t_all AS total_tokens,
           v_all AS vocab_size,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS heaps_beta,
           round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k,
                 6) AS heaps_lnk
    FROM sums
    """


@q("t_heaps_law_fit", _heaps_sql())
def t_heaps_law_fit(spark, sf_dir):
    """Heaps'-law fit of vocabulary growth: V(T) ~ K * T^beta, the
    least-squares slope of ln(vocab size) on ln(cumulative tokens)
    sampled at dyadic document-prefix anchors (natural text sits near
    beta ~ 0.5; heavily-duplicated or templated corpora flatten early —
    a corpus-health companion to t_zipf_slope).

    Exactness: the anchor sums are pure integers (conditional sums —
    NO global-order window and no per-doc cumulative state); all float
    work happens on the bounded O(log n) anchor array, folded
    SEQUENTIALLY on both engines (the t_zipf_slope discipline), then
    round(6). Plan/scale shape: one pass over per-doc token counts
    (map-side combinable conditional sums), one token-explode shuffle
    for word first-occurrence, a broadcast cross join of two 1-row
    aggregates, and a single-row array fold — at 100 TB the anchor
    ladder grows only logarithmically."""
    (docs,) = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.size(F.split("text", " ")).alias("t"))
    tsum = tok.agg(
        *[
            F.sum(F.when(F.col("doc_id") <= a, F.col("t")).otherwise(0))
            .cast("long")
            .alias(f"t{k}")
            for k, a in enumerate(_HEAPS_ANCHORS)
        ],
        F.sum("t").cast("long").alias("t_all"),
        F.max("doc_id").cast("long").alias("maxd"),
    )
    first = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fd"))
    )
    vsum = first.agg(
        *[
            F.sum(F.when(F.col("fd") <= a, 1).otherwise(0))
            .cast("long")
            .alias(f"v{k}")
            for k, a in enumerate(_HEAPS_ANCHORS)
        ],
        F.count("*").cast("long").alias("v_all"),
    )
    structs = ", ".join(
        f"named_struct('a', {a}L, 't', t{k}, 'v', v{k})"
        for k, a in enumerate(_HEAPS_ANCHORS)
    )
    one = tsum.crossJoin(F.broadcast(vsum)).withColumn(
        "pts",
        F.expr(
            f"concat(filter(array({structs}),"
            " p -> p.a < maxd and p.t > 0 and p.v > 0),"
            " array(named_struct('a', maxd, 't', t_all, 'v', v_all)))"
        ),
    )
    fold = lambda expr: F.expr(  # noqa: E731 — sequential fold helper
        f"aggregate(pts, cast(0.0 as double), (acc, p) -> acc + ({expr}))"
    )
    lnt = "ln(cast(p.t as double))"
    lnv = "ln(cast(p.v as double))"
    sums = one.select(
        F.size("pts").alias("k"),
        fold(lnt).alias("sx"),
        fold(f"{lnt} * {lnt}").alias("sxx"),
        fold(lnv).alias("sy"),
        fold(f"{lnt} * {lnv}").alias("sxy"),
        "t_all",
        "v_all",
    )
    k = F.col("k").cast("double")
    beta = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        k * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("k").cast("long").alias("n_points"),
        F.col("t_all").alias("total_tokens"),
        F.col("v_all").alias("vocab_size"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round((F.col("sy") - beta * F.col("sx")) / k, 6).alias("heaps_lnk"),
    )


# Gopher document-level filter thresholds (Rae et al. 2021, table A1 —
# the non-repetition rules; the repetition family lives in
# t_repetition_signals). Ratios are enforced by integer
# cross-multiplication so both engines compare exact integers.
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MWL = 3   # mean word length lower bound (chars)
_GOPHER_MAX_MWL = 10  # upper bound
_GOPHER_MIN_STOPWORDS = 2     # distinct stopwords required
_GOPHER_ALPHA_PCT = 80        # >= 80% of words purely alphabetic
_GOPHER_DISTINCT_PCT = 30     # >= 30% distinct tokens


def _gopher_sql() -> str:
    stoplist = ", ".join(f"'{s}'" for s in EN_STOP)
    return f"""
    WITH d AS (
      SELECT lang,
             string_split(text, ' ') AS ws,
             length(replace(text, ' ', '')) AS nc
      FROM documents
    ), r AS (
      SELECT lang,
             len(ws) AS n,
             len(list_distinct(ws)) AS nd,
             nc,
             len(list_intersect(list_distinct(ws), [{stoplist}])) AS nstop,
             len(list_filter(ws,
                 x -> regexp_full_match(x, '[A-Za-z]+'))) AS nalpha
      FROM d
    ), f AS (
      SELECT lang,
             (n BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
                 AS ok_wc,
             ({_GOPHER_MIN_MWL} * n <= nc AND nc <= {_GOPHER_MAX_MWL} * n)
                 AS ok_mwl,
             (nstop >= {_GOPHER_MIN_STOPWORDS}) AS ok_stop,
             (nalpha * 100 >= n * {_GOPHER_ALPHA_PCT}) AS ok_alpha,
             (nd * 100 >= n * {_GOPHER_DISTINCT_PCT}) AS ok_rep
      FROM r
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ok_wc AND ok_mwl AND ok_stop AND ok_alpha
                         AND ok_rep THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_all,
           CAST(sum(CASE WHEN ok_wc THEN 0 ELSE 1 END) AS BIGINT)
               AS fail_word_count,
           CAST(sum(CASE WHEN ok_mwl THEN 0 ELSE 1 END) AS BIGINT)
               AS fail_mean_word_len,
           CAST(sum(CASE WHEN ok_stop THEN 0 ELSE 1 END) AS BIGINT)
               AS fail_stopword,
           CAST(sum(CASE WHEN ok_alpha THEN 0 ELSE 1 END) AS BIGINT)
               AS fail_alpha_frac,
           CAST(sum(CASE WHEN ok_rep THEN 0 ELSE 1 END) AS BIGINT)
               AS fail_repetition
    FROM f GROUP BY lang
    """


@q("t_gopher_quality_rules", _gopher_sql())
def t_gopher_quality_rules(spark, sf_dir):
    """Gopher-style document-filter rule report (Rae et al. 2021, the
    published pretraining filter repertoire): word-count bounds, mean
    word length bounds, minimum distinct stopwords, alphabetic-word
    fraction, and distinct-token fraction — aggregated per language
    into pass/fail counts per rule (the dashboard a pipeline watches to
    see WHICH rule is rejecting a new crawl; the repetition-family
    rules live in t_repetition_signals).

    Exactness: every ratio threshold is an integer cross-multiplication
    (3*n <= chars, nalpha*100 >= n*80, ...) — no float division
    anywhere. Plan/scale shape: pure per-row array projections (split /
    array_distinct / array_intersect / filter — all JVM higher-order
    functions, zero Python), then one groupBy(lang) with map-side
    combine. The EN-centric stopword rule failing on non-EN languages
    is the published behavior, not a bug."""
    (docs,) = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    stoparr = F.array(*[F.lit(s) for s in EN_STOP])
    r = docs.select(
        "lang",
        F.size(ws).alias("n"),
        F.size(F.array_distinct(ws)).alias("nd"),
        F.length(F.regexp_replace("text", " ", "")).alias("nc"),
        F.size(F.array_intersect(F.array_distinct(ws), stoparr)).alias(
            "nstop"
        ),
        # \z (absolute end-of-input), not $: Java's $ also matches before
        # a trailing newline, DuckDB's regexp_full_match does not — \z
        # pins both engines to identical full-token semantics even if a
        # fixture ever carries a token with a trailing newline.
        F.size(F.filter(ws, lambda x: x.rlike("^[A-Za-z]+\\z"))).alias(
            "nalpha"
        ),
    )
    ok_wc = (F.col("n") >= _GOPHER_MIN_WORDS) & (
        F.col("n") <= _GOPHER_MAX_WORDS
    )
    ok_mwl = (_GOPHER_MIN_MWL * F.col("n") <= F.col("nc")) & (
        F.col("nc") <= _GOPHER_MAX_MWL * F.col("n")
    )
    ok_stop = F.col("nstop") >= _GOPHER_MIN_STOPWORDS
    ok_alpha = F.col("nalpha") * 100 >= F.col("n") * _GOPHER_ALPHA_PCT
    ok_rep = F.col("nd") * 100 >= F.col("n") * _GOPHER_DISTINCT_PCT
    fail = lambda c: F.sum(F.when(c, 0).otherwise(1)).cast("long")  # noqa: E731
    return r.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.when(ok_wc & ok_mwl & ok_stop & ok_alpha & ok_rep, 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("pass_all"),
        fail(ok_wc).alias("fail_word_count"),
        fail(ok_mwl).alias("fail_mean_word_len"),
        fail(ok_stop).alias("fail_stopword"),
        fail(ok_alpha).alias("fail_alpha_frac"),
        fail(ok_rep).alias("fail_repetition"),
    )


@q(
    "t_dataset_card",
    """
    WITH base AS (
      SELECT doc_id, source, lang,
             len(string_split(text, ' ')) AS n_tokens,
             n_chars, md5(text) AS h
      FROM documents
    ), dup AS (
      SELECT h, count(*) AS n_copies FROM base GROUP BY h
    ), lc AS (
      SELECT source, lang, count(*) AS c FROM base GROUP BY source, lang
    ), toplang AS (
      SELECT source, lang AS top_lang FROM (
        SELECT source, lang,
               row_number() OVER (
                 PARTITION BY source ORDER BY c DESC, lang) AS rn
        FROM lc
      ) WHERE rn = 1
    )
    SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.n_tokens) AS BIGINT) AS sum_tokens,
           CAST(count(DISTINCT b.lang) AS BIGINT) AS n_langs,
           any_value(t.top_lang) AS top_lang,
           CAST(sum(CASE WHEN d.n_copies > 1 THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS dup_permille,
           CAST(sum(b.n_chars) // count(*) AS BIGINT) AS avg_chars
    FROM base b
    JOIN dup d USING (h)
    JOIN toplang t ON t.source = b.source
    GROUP BY b.source
    """,
)
def t_dataset_card(spark, sf_dir):
    """DATASET CARD — the per-source datasheet a corpus release ships:
    document and token counts, language spread with the dominant
    language, corpus-wide exact-duplicate participation (integer
    permille), and mean document length (integer floor). Every number
    derives from exact integer counts, so the card is hash-identical
    cross-engine.

    Plan: one doc-grain projection feeds (a) the md5 duplicate count
    (one hash shuffle), (b) per-(source, lang) counts (tiny), (c) the
    per-source rollup — the corpus crosses the network once for the
    dup signal and once for the final groupBy."""
    from pyspark.sql import Window

    (docs,) = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        "n_chars",
        F.md5("text").alias("h"),
    )
    dup = base.groupBy("h").agg(F.count("*").alias("n_copies"))
    lc = base.groupBy("source", "lang").agg(F.count("*").alias("c"))
    toplang = (
        lc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("c"), "lang")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return (
        base.join(dup, "h")
        .join(F.broadcast(toplang), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.any_value("top_lang").alias("top_lang"),
            F.expr(
                "sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) * 1000"
                " div count(*)"
            ).cast("long").alias("dup_permille"),
            F.expr("sum(n_chars) div count(*)").cast("long").alias("avg_chars"),
        )
    )


@q(
    "t_source_similarity",
    """
    WITH sw AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_words FROM sw GROUP BY source
    ), common AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT c.src_a, c.src_b, c.n_common,
           sa.n_words AS words_a, sb.n_words AS words_b,
           CAST(c.n_common * 1000
                // (sa.n_words + sb.n_words - c.n_common) AS BIGINT)
               AS jaccard_permille
    FROM common c
    JOIN sizes sa ON sa.source = c.src_a
    JOIN sizes sb ON sb.source = c.src_b
    """,
)
def t_source_similarity(spark, sf_dir):
    """Source-to-source VOCABULARY similarity matrix: pairwise Jaccard
    (integer permille) of the distinct-word sets of every provenance
    pair — the corpus-mix diagnostic that shows which sources are
    near-redundant before a mixture weight is spent on both.

    Plan: the INVERTED-INDEX join — distinct (source, word) pairs
    self-join on the word (per-word source lists are at most
    #sources long, so the join fans out by source count, never corpus
    size), one pair aggregation, broadcast size lookups. The same
    shape scales to thousands of sources because the word index, not
    the document volume, drives the join."""
    (docs,) = _docs(spark, sf_dir)
    sw = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    sizes = sw.groupBy("source").agg(
        F.count("*").cast("long").alias("n_words")
    )
    a = sw.select(F.col("source").alias("src_a"), "word")
    b = sw.select(F.col("source").alias("src_b"), "word")
    common = (
        a.join(b, "word")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("n_words").alias("words_a")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("n_words").alias("words_b")
    )
    return (
        common.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "words_a",
            "words_b",
            F.expr("n_common * 1000 div (words_a + words_b - n_common)")
            .cast("long")
            .alias("jaccard_permille"),
        )
    )


@q(
    "t_template_prefix_groups",
    """
    WITH p AS (
      SELECT doc_id, source,
             md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS pfx
      FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ), g AS (
      SELECT pfx, count(*) AS n_docs,
             count(DISTINCT source) AS n_sources,
             min(doc_id) AS example_doc
      FROM p GROUP BY pfx HAVING count(*) >= 2
    )
    SELECT pfx AS prefix_hash,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_sources AS BIGINT) AS n_sources,
           CAST(example_doc AS BIGINT) AS example_doc
    FROM g
    """,
)
def t_template_prefix_groups(spark, sf_dir):
    """TEMPLATE-INTRO detection: documents sharing their first 8 words
    (hashed prefix) grouped — the boilerplate signal chunk-level dedup
    misses when templates only share openings ("Welcome to...",
    license headers). Cross-source groups (n_sources > 1) are the
    strongest template evidence. One prefix projection + one hash
    shuffle; the prefix hash is the dedup key a cleaning pass strips
    on."""
    (docs,) = _docs(spark, sf_dir)
    p = docs.where(F.size(F.split("text", " ")) >= 8).select(
        "doc_id",
        "source",
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
        ).alias("pfx"),
    )
    return (
        p.groupBy("pfx")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("example_doc"),
        )
        .where(F.col("n_docs") >= 2)
        .select(
            F.col("pfx").alias("prefix_hash"),
            "n_docs",
            "n_sources",
            "example_doc",
        )
    )


@q(
    "t_length_quantiles_by_lang",
    """
    WITH t AS (
      SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS p0,
           CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(n_tokens, 0.9) AS BIGINT) AS p90,
           CAST(max(n_tokens) AS BIGINT) AS p100
    FROM t GROUP BY lang
    """,
)
def t_length_quantiles_by_lang(spark, sf_dir):
    """Per-language document-length distribution (discrete quantiles —
    exact order statistics, integer-identical cross-engine): the
    packing/truncation planning table (sequence budgets per language
    come straight from p90/p100). One shuffle to language grain."""
    (docs,) = _docs(spark, sf_dir)
    t = docs.select("lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    return t.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_tokens").cast("long").alias("p0"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)")
        .cast("long")
        .alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_tokens)")
        .cast("long")
        .alias("p90"),
        F.max("n_tokens").cast("long").alias("p100"),
    )


@q(
    "t_length_outliers_by_lang",
    """
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), med AS (
      SELECT lang, quantile_disc(n_tokens, 0.5) AS med FROM t GROUP BY lang
    ), mad AS (
      SELECT t.lang, quantile_disc(abs(t.n_tokens - m.med), 0.5) AS mad,
             any_value(m.med) AS med
      FROM t JOIN med m USING (lang) GROUP BY t.lang
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(any_value(d.med) AS BIGINT) AS median_tokens,
           CAST(any_value(d.mad) AS BIGINT) AS mad_tokens,
           CAST(sum(CASE WHEN abs(t.n_tokens - d.med) > 3 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM t JOIN mad d USING (lang)
    GROUP BY t.lang
    """,
)
def t_length_outliers_by_lang(spark, sf_dir):
    """Robust LENGTH-OUTLIER detection per language: median/MAD of the
    token count (discrete quantiles — exact integers) and the count of
    documents beyond 3 MADs — the curation rule that catches truncated
    fragments and concatenation blobs without a distribution
    assumption (the documents twin of agg_median_mad_outliers). Two
    grouped exact-quantile passes over the doc-grain table, then the
    per-language flag count with the tiny (lang, med, mad) table
    broadcast back."""
    from pyspark.sql import functions as FF

    (docs,) = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    med = t.groupBy("lang").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)")
        .alias("med")
    )
    mad = (
        t.join(FF.broadcast(med), "lang")
        .groupBy("lang")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP "
                "(ORDER BY abs(n_tokens - med))"
            ).alias("mad"),
            F.any_value("med").alias("med"),
        )
    )
    return (
        t.join(FF.broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.any_value("med").cast("long").alias("median_tokens"),
            F.any_value("mad").cast("long").alias("mad_tokens"),
            F.sum(
                F.when(
                    F.abs(F.col("n_tokens") - F.col("med")) > 3 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 additions: exact-substring dup windows, stratified sharding
# ---------------------------------------------------------------------------

_WIN_LEN = 32   # window length in chars
_WIN_STRIDE = 16  # stride — 50% overlap so a duplicated span is never missed


@q(
    "t_repeated_substring_windows",
    f"""
    WITH idx AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
                 CAST((n_chars - {_WIN_LEN}) AS BIGINT) // {_WIN_STRIDE})) AS i
      FROM documents
      WHERE n_chars >= {_WIN_LEN}
    ), w AS (
      SELECT doc_id,
             substr(text, 1 + {_WIN_STRIDE} * CAST(i AS BIGINT), {_WIN_LEN}) AS win
      FROM idx
    ), per_doc AS (
      SELECT md5(win) AS win_hash, doc_id, count(*) AS cnt
      FROM w GROUP BY 1, 2
    )
    SELECT win_hash,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM per_doc
    GROUP BY win_hash
    HAVING count(*) >= 2
    """,
)
def t_repeated_substring_windows(spark, sf_dir):
    """EXACT-SUBSTRING duplication detector — the windowed form of the
    Lee et al. "Deduplicating Training Data" exact-substring method:
    slide a {_WIN_LEN}-char window at 50% overlap over every document,
    group windows by content hash, and report every window text that
    appears in >= 2 DISTINCT documents (with its total occurrence
    count and an example doc). A duplicated span of >= 1.5x the window
    length is guaranteed to produce at least one aligned shared window
    at this stride.

    Scale shape: the window explode multiplies rows by ~n_chars/stride
    (the method's inherent cost; production runs raise the stride),
    then TWO partial-aggregated shuffles — (win_hash, doc_id) then
    win_hash — both map-side combined; no pair expansion ever happens
    (the blowup of a popular substring is capped at its doc count, not
    doc-count-squared). Pure Catalyst: sequence/explode/substr/md5."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = (
        docs.filter(F.col("n_chars") >= _WIN_LEN)
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    ((F.col("n_chars") - _WIN_LEN) / _WIN_STRIDE).cast("long"),
                )
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.expr(f"substr(text, 1 + {_WIN_STRIDE} * i, {_WIN_LEN})").alias("win"),
        )
    )
    per_doc = w.groupBy(F.md5("win").alias("win_hash"), "doc_id").agg(
        F.count("*").alias("cnt")
    )
    return (
        per_doc.groupBy("win_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("cnt").cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


_N_SHARDS = 8


@q(
    "t_shard_assignment",
    f"""
    WITH s AS (
      SELECT lang,
             (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)
                 % {_N_SHARDS} AS shard,
             n_chars
      FROM documents
    )
    SELECT lang, CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY lang, shard
    """,
)
def t_shard_assignment(spark, sf_dir):
    """STRATIFIED SHARD assignment — the writer layout for training
    shards: within each language stratum, documents spread over
    {_N_SHARDS} shards by content-independent key hash (reproducible,
    engine-independent — never sample()/round-robin, whose assignment
    depends on partitioning). The report is the per-(lang, shard) doc
    and byte balance a dataloader needs to plan epochs.

    Scale shape: the shard id is a per-row projection (no shuffle);
    the audit is one partial-aggregated groupBy. At 100 TB the real
    writer is write.partitionBy(lang, shard) — the assignment column
    IS the directory layout, and this report is its manifest."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    shard = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
        f" as bigint) % {_N_SHARDS}"
    )
    return (
        docs.select("lang", shard.cast("long").alias("shard"), "n_chars")
        .groupBy("lang", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


def _bpe_roundtrip_oracle_sql(vocab: int, k: int) -> str:
    """Round-trip twin: the encode chain's spaced-token string, with
    separators stripped, must reproduce every word type exactly."""
    train = _bpe_oracle_sql(vocab, k)
    cte_block = train[: train.rindex("\nSELECT 1 AS merge_rank")]
    enc = "' ' || array_to_string(regexp_split_to_array(word, ''), ' ') || ' '"
    for r in range(1, k + 1):
        enc = (
            f"replace({enc}, ' ' || (SELECT pair FROM b{r}) || ' ', "
            f"' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' ')"
        )
    return (
        cte_block
        + f"""
, types AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents
), t2 AS (SELECT word FROM types WHERE word != '')
, rt AS (
  SELECT word,
         replace(trim({enc}), ' ', '') = word AS ok,
         len(string_split(trim({enc}), ' ')) AS n_sub
  FROM t2
)
SELECT CAST(count(*) AS BIGINT) AS n_word_types,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
       CAST(sum(CASE WHEN n_sub > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi_token,
       count(*) = sum(CASE WHEN ok THEN 1 ELSE 0 END) AS all_ok
FROM rt
"""
    )


@q("t_bpe_roundtrip", _bpe_roundtrip_oracle_sql(_BPE_VOCAB, _BPE_MERGES))
def t_bpe_roundtrip(spark, sf_dir, vocab=None, k=None):
    """TOKENIZER INTEGRITY — decode(encode(word)) == word for EVERY
    word type in the corpus: apply the learned merge chain, strip the
    subword separators, and demand the original word back. A merge
    rule that ever crossed the word-boundary guards (the ' ' sentinels
    in the replace chain) or corrupted a subword would fail here — the
    audit every tokenizer deployment runs before a training job is
    allowed to consume its output. Also reports how many types encode
    to >1 subword (the compression the merges actually bought).

    Scale shape: runs on the DISTINCT word-type table only (types <<
    corpus tokens); the corpus is never re-scanned past the type
    dedup. One shuffle, one 1-row aggregate."""
    merges = _bpe_merge_rules(spark, sf_dir, vocab, k)
    (docs,) = _docs(spark, sf_dir)
    types = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    toks = F.concat(
        F.lit(" "), F.concat_ws(" ", F.split("word", "")), F.lit(" ")
    )
    for _rank, pair, merged, _c in merges:
        toks = F.replace(toks, F.lit(f" {pair} "), F.lit(f" {merged} "))
    rt = types.select(
        "word",
        (F.replace(F.trim(toks), F.lit(" "), F.lit("")) == F.col("word")).alias("ok"),
        F.size(F.split(F.trim(toks), " ")).alias("n_sub"),
    )
    return rt.agg(
        F.count("*").cast("long").alias("n_word_types"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_roundtrip_ok"),
        F.sum(F.when(F.col("n_sub") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_multi_token"),
        (
            F.count("*")
            == F.sum(F.when(F.col("ok"), 1).otherwise(0))
        ).alias("all_ok"),
    )


def _bpe_fertility_oracle_sql(vocab: int, k: int) -> str:
    train = _bpe_oracle_sql(vocab, k)
    cte_block = train[: train.rindex("\nSELECT 1 AS merge_rank")]
    enc = "' ' || array_to_string(regexp_split_to_array(word, ''), ' ') || ' '"
    for r in range(1, k + 1):
        enc = (
            f"replace({enc}, ' ' || (SELECT pair FROM b{r}) || ' ', "
            f"' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' ')"
        )
    return (
        cte_block
        + f"""
, cw AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
  FROM documents
), cw2 AS (SELECT doc_id, lang, word FROM cw WHERE word != '')
, enc AS (
  SELECT word, len(string_split(trim({enc}), ' ')) AS n_sub
  FROM (SELECT DISTINCT word FROM cw2)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       CAST(sum(n_sub) * 1000 // count(*) AS BIGINT) AS fertility_permille
FROM cw2 JOIN enc USING (word)
GROUP BY lang
"""
    )


@q("t_tokenizer_fertility_by_lang", _bpe_fertility_oracle_sql(_BPE_VOCAB, _BPE_MERGES))
def t_tokenizer_fertility_by_lang(spark, sf_dir, vocab=None, k=None):
    """TOKENIZER FERTILITY per language — subwords emitted per
    whitespace word, the standard multilingual-bias report: a tokenizer
    trained on a skewed mix over-fragments under-represented languages,
    inflating their compute cost and truncation rate. Integer permille
    (exact // arithmetic) keeps the ratio hash-safe.

    Scale shape: the merge chain applies to the DISTINCT type table
    (types << corpus tokens), broadcast back onto the exploded corpus;
    one keyed shuffle + one per-language aggregate — identical skeleton
    to t_bpe_encode_tokens with lang carried through."""
    merges = _bpe_merge_rules(spark, sf_dir, vocab, k)
    (docs,) = _docs(spark, sf_dir)
    cw = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    types = cw.select("word").distinct()
    toks = F.concat(
        F.lit(" "), F.concat_ws(" ", F.split("word", "")), F.lit(" ")
    )
    for _rank, pair, merged, _c in merges:
        toks = F.replace(toks, F.lit(f" {pair} "), F.lit(f" {merged} "))
    enc = types.select(
        "word", F.size(F.split(F.trim(toks), " ")).alias("n_sub")
    )
    return (
        cw.join(F.broadcast(enc), "word")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
            F.expr("sum(n_sub) * 1000 div count(*)")
            .cast("long")
            .alias("fertility_permille"),
        )
    )


@q(
    "t_langid_confusion",
    """
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
    ), feat AS (
      SELECT doc_id, lang,
             len(list_filter(words, x -> x IN ('the','a','of','and','to','in','is','it')))
               * 1.0 / len(words) AS stop_r,
             len(list_filter(words, x -> x IN ('join','merge','filter','window','table','query')))
               * 1.0 / len(words) AS data_r
      FROM w
    ), pred AS (
      SELECT lang AS true_lang,
             CASE WHEN stop_r >= 0.08 THEN 'en'
                  WHEN data_r >= 0.15 THEN 'tech'
                  ELSE 'other' END AS pred_lang
      FROM feat
    ), tot AS (SELECT true_lang, count(*) AS n_lang FROM pred GROUP BY true_lang)
    SELECT p.true_lang, p.pred_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 1000 // max(t.n_lang) AS BIGINT) AS rate_permille
    FROM pred p JOIN tot t USING (true_lang)
    GROUP BY p.true_lang, p.pred_lang
    """,
)
def t_langid_confusion(spark, sf_dir):
    """CLASSIFIER AUDIT for the language-ID heuristic: the confusion
    matrix of predicted vs stored language, with integer-permille
    per-true-language rates — the evaluation every classification
    filter in a curation pipeline ships next to its predictions
    (deploying a lang filter without its confusion matrix is how a
    corpus silently loses a language).

    Plan: the same per-row feature projection as t_lang_id, one
    (true, pred) groupBy, and the per-language totals re-entering via
    a broadcast-sized join — two small shuffles, nothing corpus-scale
    beyond the single scan."""
    (docs,) = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n = F.size(words)
    stop_r = F.size(F.filter(words, lambda x: x.isin(*EN_STOP))) * F.lit(1.0) / n
    data_r = F.size(F.filter(words, lambda x: x.isin(*DATA_WORDS))) * F.lit(1.0) / n
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        F.when(stop_r >= 0.08, "en")
        .when(data_r >= 0.15, "tech")
        .otherwise("other")
        .alias("pred_lang"),
    )
    tot = pred.groupBy("true_lang").agg(F.count("*").alias("n_lang"))
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .join(F.broadcast(tot), "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n_docs",
            F.expr("n_docs * 1000 div n_lang").cast("long").alias("rate_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Collocation mining: top-k bigrams by pointwise mutual information
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 20


@q(
    "t_bigram_pmi_topk",
    f"""
    WITH w AS (
      SELECT string_split(text, ' ') AS ws FROM documents
    ), bi AS (
      -- series bound inherits the fixture text cap (ORACLE_TEXT_CAP,
      -- multimodalq): words <= chars <= 600, pinned in test_multimodal
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM w, generate_series(1, 600) g(i)
      WHERE i <= len(ws) - 1
    ), cxy AS (
      SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2
    ), cx AS (
      SELECT w1 AS word, count(*) AS n1 FROM bi GROUP BY w1
    ), cy AS (
      SELECT w2 AS word, count(*) AS n2 FROM bi GROUP BY w2
    ), n AS (
      SELECT count(*) AS nb FROM bi
    ), scored AS (
      -- 128-bit lattice (r8 headroom audit): c*nb*1000 is quadratic in
      -- corpus size (both factors linear) and n1*n2 likewise — HUGEINT
      -- here, DECIMAL(38,0) on the Spark side; the QUOTIENT is bounded
      -- by 1000*nb/c_min (n1,n2 >= c >= c_min), linear, BIGINT-safe
      SELECT cxy.w1, cxy.w2, cxy.c,
             CAST(cxy.c AS HUGEINT) * (SELECT nb FROM n) * 1000
                 // (CAST(cx.n1 AS HUGEINT) * cy.n2) AS pmi_ratio_permille
      FROM cxy
      JOIN cx ON cx.word = cxy.w1
      JOIN cy ON cy.word = cxy.w2
      WHERE cxy.c >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c AS BIGINT) AS c,
           CAST(pmi_ratio_permille AS BIGINT) AS pmi_ratio_permille,
           CAST(row_number() OVER (
             ORDER BY pmi_ratio_permille DESC, w1, w2) AS BIGINT) AS rank
    FROM scored
    ORDER BY pmi_ratio_permille DESC, w1, w2
    LIMIT {_PMI_TOPK}
    """,
)
def t_bigram_pmi_topk(spark, sf_dir):
    """COLLOCATION MINING — top-{_PMI_TOPK} adjacent word bigrams by
    pointwise mutual information (count >= {_PMI_MIN_COUNT}): the phrase
    detector a tokenizer/curation pipeline runs to promote multi-word
    units ("new york") before vocabulary training. PMI is reported on
    an exact integer lattice — p(xy)/(p(x)p(y)) = c_xy·N/(c_x·c_y), in
    permille via integer division — so ranking carries no float/log
    summation-order hazard cross-engine (the log is monotone; rank by
    the ratio).

    Scale shape: one per-row zip_with bigram projection (no token
    explode until the count), (w1,w2)- and word-keyed count shuffles
    with map-side combine, two keyed equi-joins of the bigram counts to
    the marginals, one 1-row bigram-total broadcast, global top-k. At
    100 TB identical — the join keys are words (bounded vocabulary),
    and top-k is Spark's TakeOrdered."""
    (docs,) = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    n = F.size("ws")
    grams = F.zip_with(
        F.slice("ws", 1, n - 1),
        F.slice("ws", 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bi = (
        docs.select(ws.alias("ws"))
        .select(F.explode(grams).alias("g"))
        .select("g.w1", "g.w2")
    )
    cxy = bi.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    cx = bi.groupBy(F.col("w1").alias("word")).agg(F.count("*").alias("n1"))
    cy = bi.groupBy(F.col("w2").alias("word")).agg(F.count("*").alias("n2"))
    nb = bi.agg(F.count("*").alias("nb"))
    scored = (
        cxy.filter(F.col("c") >= _PMI_MIN_COUNT)
        .join(cx, cxy.w1 == cx.word)
        .drop("word")
        .join(cy, cxy.w2 == cy.word)
        .drop("word")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c",
            # 128-bit dividend/divisor (r8 headroom audit — the gini
            # class): c*nb*1000 and n1*n2 are both quadratic in corpus
            # size; the quotient (<= 1000*nb/c_min) stays BIGINT-safe
            F.expr(
                "CAST(CAST(c AS DECIMAL(38,0)) * nb * 1000"
                " div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
            ).alias("pmi_ratio_permille"),
        )
    )
    # Top-k via orderBy+limit (TakeOrderedAndProject — distributed
    # partial top-k over the bigram table), then rank over only the
    # _PMI_TOPK survivors; the bigram-pair table never single-partitions.
    w = Window.orderBy(F.desc("pmi_ratio_permille"), "w1", "w2")
    return (
        scored.orderBy(F.desc("pmi_ratio_permille"), "w1", "w2")
        .limit(_PMI_TOPK)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "w1", "w2", "c",
            F.col("pmi_ratio_permille").cast("long").alias("pmi_ratio_permille"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick): per-document sparse signed vectors
# ---------------------------------------------------------------------------

_FH_BUCKETS = 16
# 31-bit deterministic word hash from md5 (identical in both engines;
# same construction as the dedup/CMS hashes).
_FH_DUCK_H = "(('0x' || substr(md5(word), 1, 15))::BIGINT) % 2147483647"
_FH_SPARK_H = (
    "cast(conv(substring(md5(word), 1, 15), 16, 10) as bigint) % 2147483647"
)


@q(
    "t_feature_hashing",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), h AS (
      SELECT doc_id,
             ({_FH_DUCK_H}) % {_FH_BUCKETS} AS bucket,
             CASE WHEN (({_FH_DUCK_H}) // {_FH_BUCKETS}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok WHERE word != ''
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(sum(sgn) AS BIGINT) AS val
    FROM h GROUP BY doc_id, bucket
    HAVING sum(sgn) != 0
    """,
)
def t_feature_hashing(spark, sf_dir):
    """FEATURE HASHING (Weinberger et al. 2009) — the hashing-trick
    vectorizer: each word maps to one of {_FH_BUCKETS} buckets by a
    deterministic hash, with a second hash bit supplying a +/-1 sign so
    collisions cancel in expectation (the unbiased variant). Output is
    the SPARSE representation (doc_id, bucket, signed count; zero
    entries dropped) — the fixed-width featurizer that feeds linear
    quality classifiers without a vocabulary pass, which is the whole
    point at 100 TB: no dictionary to build, broadcast, or keep
    consistent across epochs.

    Scale shape: a per-row explode + one (doc_id, bucket)-keyed count
    shuffle with map-side combine; integer-exact everywhere (the md5
    hash construction is the same engine-portable one the dedup/CMS
    pack uses)."""
    (docs,) = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    h = F.expr(_FH_SPARK_H)
    bucketed = tok.select(
        "doc_id",
        (h % _FH_BUCKETS).cast("long").alias("bucket"),
        F.when((F.expr(f"({_FH_SPARK_H}) div {_FH_BUCKETS}") % 2) == 0, 1)
        .otherwise(-1)
        .alias("sgn"),
    )
    return (
        bucketed.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )


_QC_WEIGHTS = tuple(((7 * b + 3) % 11) - 5 for b in range(_FH_BUCKETS))
_QC_THRESH = 0


@q(
    "t_quality_classifier_score",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), h AS (
      SELECT doc_id,
             ({_FH_DUCK_H}) % {_FH_BUCKETS} AS bucket,
             CASE WHEN (({_FH_DUCK_H}) // {_FH_BUCKETS}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok WHERE word != ''
    ), fv AS (
      -- sparse like t_feature_hashing (val != 0): a doc whose buckets
      -- ALL cancel is absent in BOTH engines, not score-0 in one
      SELECT doc_id, bucket, sum(sgn) AS val
      FROM h GROUP BY doc_id, bucket
      HAVING sum(sgn) != 0
    ), wt(bucket, w) AS (
      VALUES {', '.join(f'({b}, {w})' for b, w in enumerate(_QC_WEIGHTS))}
    )
    SELECT fv.doc_id,
           CAST(sum(fv.val * wt.w) AS BIGINT) AS score,
           sum(fv.val * wt.w) >= {_QC_THRESH} AS keep
    FROM fv JOIN wt USING (bucket)
    GROUP BY fv.doc_id
    """,
)
def t_quality_classifier_score(spark, sf_dir):
    """LINEAR QUALITY CLASSIFIER over the hashing-trick features — the
    fastText-style keep/drop filter every curation pipeline runs, as a
    pure Catalyst plan: the trained weight vector (here a fixed
    deterministic stand-in; in production the broadcast artifact of an
    offline fit) dots the sparse hashed features per document. Integer
    weights x integer counts → the score is exact, so the keep decision
    carries no float-threshold hazard.

    Scale shape: composes t_feature_hashing's explode + (doc, bucket)
    count with a broadcast join to the {_FH_BUCKETS}-row weight table
    and a per-doc sum — at 100 TB the weights stay a broadcast literal
    and the only data-sized shuffles are the two doc-keyed partial
    aggregations."""
    fh = t_feature_hashing(spark, sf_dir)
    wt = F.broadcast(
        spark.createDataFrame(
            list(enumerate(_QC_WEIGHTS)), "bucket long, w long"
        )
    )
    return (
        fh.join(wt, "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("val") * F.col("w")).cast("long").alias("score"))
        .select(
            "doc_id", "score", (F.col("score") >= _QC_THRESH).alias("keep")
        )
    )


@q(
    "t_dup_span_coverage",
    f"""
    WITH idx AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
                 CAST((n_chars - {_WIN_LEN}) AS BIGINT) // {_WIN_STRIDE})) AS i
      FROM documents
      WHERE n_chars >= {_WIN_LEN}
    ), w AS (
      SELECT doc_id, CAST({_WIN_STRIDE} * CAST(i AS BIGINT) AS BIGINT) AS s,
             md5(substr(text, 1 + {_WIN_STRIDE} * CAST(i AS BIGINT), {_WIN_LEN}))
                 AS win_hash
      FROM idx
    ), dup AS (
      SELECT win_hash
      FROM (SELECT win_hash, doc_id FROM w GROUP BY 1, 2)
      GROUP BY win_hash HAVING count(*) >= 2
    ), dw AS (
      SELECT w.doc_id, w.s, w.s + {_WIN_LEN} AS e
      FROM w JOIN dup USING (win_hash)
    ), marked AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                 PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS ni
      FROM dw
    ), isl AS (
      SELECT doc_id, s, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), spans AS (
      SELECT doc_id, island, min(s) AS s0, max(e) AS e1, count(*) AS nw
      FROM isl GROUP BY doc_id, island
    )
    SELECT d.doc_id,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(sum(sp.nw) AS BIGINT) AS n_dup_windows,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(sp.e1 - sp.s0) AS BIGINT) AS dup_chars,
           CAST(sum(sp.e1 - sp.s0) * 1000 // d.n_chars AS BIGINT)
               AS coverage_permille
    FROM spans sp JOIN documents d USING (doc_id)
    GROUP BY d.doc_id, d.n_chars
    """,
)
def t_dup_span_coverage(spark, sf_dir):
    """PER-DOCUMENT duplicated-span coverage — the actionable readout of
    the Lee et al. exact-substring method that t_repeated_substring_windows
    detects globally: for each document, merge its cross-doc-duplicated
    {_WIN_LEN}-char windows (stride {_WIN_STRIDE}) into maximal spans
    (classic interval islands) and report how many characters — and what
    permille of the document — duplicated text covers. This is the number
    a curation run thresholds to decide drop-the-doc vs cut-the-spans.

    Exactness: starts/ends are integers on the stride lattice and the
    island merge is pure integer window arithmetic — identical in both
    engines; coverage is integer permille (1000*chars div n_chars).

    Scale shape: the window explode is the method's inherent cost
    (~n_chars/stride rows, production raises the stride); dup-hash
    filtering is one partial-aggregated shuffle on win_hash plus a keyed
    hash join; the island merge is a doc_id-partitioned window (the
    natural partitioning of per-doc audits — no skew beyond doc length,
    which the explode already bounded). No pair expansion anywhere."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = (
        docs.filter(F.col("n_chars") >= _WIN_LEN)
        .select(
            "doc_id",
            "n_chars",
            F.explode(
                F.sequence(
                    F.lit(0),
                    ((F.col("n_chars") - _WIN_LEN) / _WIN_STRIDE).cast("long"),
                )
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            (F.col("i") * _WIN_STRIDE).cast("long").alias("s"),
            F.md5(
                F.expr(f"substr(text, 1 + {_WIN_STRIDE} * i, {_WIN_LEN})")
            ).alias("win_hash"),
        )
    )
    dup = (
        w.select("win_hash", "doc_id")
        .distinct()
        .groupBy("win_hash")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("win_hash")
    )
    dw = w.join(dup, "win_hash").select(
        "doc_id", "s", (F.col("s") + _WIN_LEN).alias("e")
    )
    by_start = Window.partitionBy("doc_id").orderBy("s")
    prev_end = F.max("e").over(
        by_start.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dw.select(
        "doc_id",
        "s",
        "e",
        F.when(F.col("s") > F.coalesce(prev_end, F.lit(-1)), 1)
        .otherwise(0)
        .alias("ni"),
    )
    isl = marked.select(
        "doc_id",
        "s",
        "e",
        F.sum("ni")
        .over(by_start.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1"), F.count("*").alias("nw")
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.sum("nw").cast("long").alias("n_dup_windows"),
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.col("e1") - F.col("s0")).cast("long").alias("dup_chars"),
        )
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            "n_dup_windows",
            "n_spans",
            "dup_chars",
            F.expr("dup_chars * 1000 div n_chars").cast("long")
            .alias("coverage_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Taboo-word (blocklist) filtering — the CCNet/Dolma-style lexical safety
# pass: per-document blocklist hit counting, a rate threshold that flags
# documents for removal, and first-hit context extraction for audit review.
# The blocklist is a tiny constant array, so every operator below is a pure
# per-row Catalyst expression (split + higher-order filter) — no join, no
# shuffle until the final per-source rollup; at 100 TB the pass is
# embarrassingly parallel over the document scan.
# ---------------------------------------------------------------------------

# Deliberately includes one word absent from every fixture tier ("crash")
# so the zero-hit path stays exercised.
BLOCKLIST = ("slow", "dup", "crash")
BLOCKLIST_MAX_PERMILLE = 60

_DUCK_BL = "['" + "', '".join(BLOCKLIST) + "']"


@q(
    "t_blocklist_rate",
    f"""
    WITH d AS (
      SELECT source, string_split(text, ' ') AS ws FROM documents
    ), h AS (
      SELECT source,
             len(list_filter(ws, w -> list_contains({_DUCK_BL}, w))) AS hits,
             len(ws) AS n
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_with_hits,
           CAST(sum(CASE WHEN hits * 1000 >= {BLOCKLIST_MAX_PERMILLE} * n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(hits) AS BIGINT) AS total_hits,
           CAST(sum(hits) * 1000 // sum(n) AS BIGINT) AS hit_permille
    FROM h GROUP BY source
    """,
)
def t_blocklist_rate(spark, sf_dir):
    """Per-source taboo-word audit: documents whose blocklist-token rate
    exceeds ``BLOCKLIST_MAX_PERMILLE`` are flagged for removal, and the
    per-source hit volume localizes which ingest feeds carry the
    problem (the curation action is per-source, not per-doc).

    Scale shape: hits/n are per-row array expressions over the document
    scan (whole-stage codegen — the constant blocklist never joins);
    the only shuffle is the per-source rollup. Flag semantics follow the
    CCNet/Dolma lexical filters: rate-based, not absolute count, so long
    documents are not over-penalized."""
    (docs,) = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    hits = F.size(F.filter(ws, lambda w: w.isin(*BLOCKLIST)))
    n = F.size(ws)
    h = docs.select(
        "source", hits.alias("hits"), n.alias("n")
    )
    return h.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("hits") > 0).cast("long")).alias("n_docs_with_hits"),
        F.sum(
            (F.col("hits") * 1000 >= BLOCKLIST_MAX_PERMILLE * F.col("n"))
            .cast("long")
        ).alias("n_flagged"),
        F.sum("hits").cast("long").alias("total_hits"),
        F.expr("sum(hits) * 1000 div sum(n)").alias("hit_permille"),
    )


@q(
    "t_blocklist_spans",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), pos AS (
      SELECT doc_id, ws, len(ws) AS n,
             least(
               {', '.join(
                   f"coalesce(nullif(list_position(ws, '{w}'), 0), 2147483647)"
                   for w in BLOCKLIST
               )}
             ) AS p
      FROM d
    )
    SELECT doc_id,
           ws[p] AS first_hit_word,
           CAST(p AS BIGINT) AS first_pos,
           array_to_string(
             list_slice(ws, greatest(1, p - 2), least(n, p + 2)), ' '
           ) AS context
    FROM pos
    WHERE p != 2147483647
    """,
)
def t_blocklist_spans(spark, sf_dir):
    """First-hit audit spans: for every document containing a blocklist
    word, the earliest hit position and its +/-2-word context window —
    the reviewer-facing artifact a lexical filter emits alongside the
    drop decision.

    Scale shape: pure per-row expressions (indexed transform to find
    the first matching position, slice + concat_ws for the window);
    zero shuffles — the output is a row-filtered projection of the
    scan."""
    (docs,) = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    # Earliest blocklist position, 1-based: min over per-word first
    # positions (array_position is 0 when absent -> replaced by "inf").
    inf = F.lit(2147483647)
    pos = F.least(
        *[
            F.coalesce(
                F.nullif(F.array_position(ws, F.lit(w)), F.lit(0)), inf
            )
            for w in BLOCKLIST
        ]
    )
    p = F.col("p")
    start = F.greatest(F.lit(1), p - 2)
    end = F.least(F.col("n"), p + 2)
    return (
        docs.select("doc_id", ws.alias("ws"), F.size(ws).alias("n"), pos.alias("p"))
        .where(p != inf)
        .select(
            "doc_id",
            F.element_at("ws", p.cast("int")).alias("first_hit_word"),
            p.cast("long").alias("first_pos"),
            F.concat_ws(
                " ", F.slice("ws", start.cast("int"), (end - start + 1).cast("int"))
            ).alias("context"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (the pre-training privacy-scrub pass).
#
# The harness corpus is synthetic word soup with no PII, so each entry
# first ENRICHES the text deterministically from doc_id (both the Spark
# plan and the DuckDB oracle build the byte-identical enriched string):
# doc_id%4==0 gains an email, ==1 an IPv4, ==2 a phone number, ==3 a
# dotted-version DECOY that the IPv4 regex must NOT match; doc_id%8==0
# additionally gains a second email so multi-match counting and global
# replacement are exercised. The regexes stay in the Java/RE2 common
# subset (character classes, bounded repetition, \b) so one pattern
# string drives both engines.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

_PII_ENRICH_SQL = """
    text
    || CASE doc_id % 4
         WHEN 0 THEN ' contact user' || doc_id::VARCHAR || '@mail.example.com for details'
         WHEN 1 THEN ' origin host 10.' || (doc_id % 256)::VARCHAR || '.0.'
                     || (doc_id % 100)::VARCHAR || ' logged'
         WHEN 2 THEN ' call +1-555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
                     || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') || ' now'
         ELSE ' version 2.5 build 17'
       END
    || CASE WHEN doc_id % 8 = 0
            THEN ' cc admin' || doc_id::VARCHAR || '@example.org'
            ELSE '' END
"""


def _pii_enrich_col():
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 4 == 0, F.concat(F.lit(" contact user"), d.cast("string"),
                                    F.lit("@mail.example.com for details")))
        .when(d % 4 == 1, F.concat(F.lit(" origin host 10."),
                                   (d % 256).cast("string"), F.lit(".0."),
                                   (d % 100).cast("string"), F.lit(" logged")))
        .when(d % 4 == 2, F.concat(F.lit(" call +1-555-"),
                                   F.lpad((d % 1000).cast("string"), 3, "0"),
                                   F.lit("-"),
                                   F.lpad(((d * 7) % 10000).cast("string"), 4, "0"),
                                   F.lit(" now")))
        .otherwise(F.lit(" version 2.5 build 17")),
        F.when(d % 8 == 0, F.concat(F.lit(" cc admin"), d.cast("string"),
                                    F.lit("@example.org"))).otherwise(F.lit("")),
    )


def _pii_count(col, pat):
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long")


@q(
    "t_pii_scan",
    f"""
    WITH e AS (
      SELECT doc_id, source, {_PII_ENRICH_SQL} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PII_IPV4_RE}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(CASE WHEN len(regexp_extract_all(t, '{PII_EMAIL_RE}'))
                        + len(regexp_extract_all(t, '{PII_IPV4_RE}'))
                        + len(regexp_extract_all(t, '{PII_PHONE_RE}')) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS has_pii
    FROM e
    """,
)
def t_pii_scan(spark, sf_dir):
    """Per-document PII entity scan — emails / IPv4 / phone numbers via
    regex extraction, the detection half of the pre-training privacy
    scrub (the Dolma/CCNet PII pass). The dotted-version decoy docs
    (doc_id%4==3) pin precision: `2.5` must not count as an address.

    Scale shape: pure per-row ``regexp_extract_all`` projections over
    the document scan — whole-stage codegen, zero shuffles, zero UDFs;
    at 100 TB this is scan-bound and embarrassingly parallel."""
    (docs,) = _docs(spark, sf_dir)
    t = _pii_enrich_col()
    n = (_pii_count(t, PII_EMAIL_RE) + _pii_count(t, PII_IPV4_RE)
         + _pii_count(t, PII_PHONE_RE))
    return docs.select(
        "doc_id",
        _pii_count(t, PII_EMAIL_RE).alias("n_emails"),
        _pii_count(t, PII_IPV4_RE).alias("n_ipv4"),
        _pii_count(t, PII_PHONE_RE).alias("n_phones"),
        F.when(n > 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("has_pii"),
    )


@q(
    "t_pii_redact",
    f"""
    WITH e AS (
      SELECT doc_id, {_PII_ENRICH_SQL} AS t FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
               t, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                  '{PII_PHONE_RE}', '[PHONE]', 'g'),
                  '{PII_IPV4_RE}', '[IP]', 'g') AS redacted,
           CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}'))
                + len(regexp_extract_all(t, '{PII_IPV4_RE}'))
                + len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT)
               AS n_redactions
    FROM e
    """,
)
def t_pii_redact(spark, sf_dir):
    """PII redaction — replace every detected entity with a typed
    placeholder token, emitting the full scrubbed text plus an audit
    count. The value-hash covers the entire redacted string, so the
    parity evidence is byte-level (replacement order email→phone→IP is
    fixed on both engines; the patterns are disjoint by construction,
    order is pinned anyway).

    Scale shape: chained ``regexp_replace`` in one projection — the
    100 TB scrub is a map-only rewrite of the corpus, no shuffle."""
    (docs,) = _docs(spark, sf_dir)
    t = _pii_enrich_col()
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE, "[PHONE]"),
        PII_IPV4_RE, "[IP]")
    n = (_pii_count(t, PII_EMAIL_RE) + _pii_count(t, PII_IPV4_RE)
         + _pii_count(t, PII_PHONE_RE))
    return docs.select("doc_id", red.alias("redacted"), n.alias("n_redactions"))


@q(
    "t_pii_rate_by_source",
    f"""
    WITH e AS (
      SELECT doc_id, source, {_PII_ENRICH_SQL} AS t FROM documents
    ), c AS (
      SELECT source,
             len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS ne,
             len(regexp_extract_all(t, '{PII_IPV4_RE}')) AS ni,
             len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS np
      FROM e
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_with_pii,
           CAST(sum(ne) AS BIGINT) AS total_emails,
           CAST(sum(ni) AS BIGINT) AS total_ipv4,
           CAST(sum(np) AS BIGINT) AS total_phones,
           CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS pii_doc_permille
    FROM c GROUP BY source
    """,
)
def t_pii_rate_by_source(spark, sf_dir):
    """Per-ingest-source PII audit rollup — which feeds carry PII and at
    what document rate (the curation action is per-source policy, same
    rationale as ``t_blocklist_rate``). Integer permille keeps the
    rollup on the exact lattice.

    Scale shape: per-row regex counts under a single per-source
    partial-aggregated rollup — one small shuffle keyed on source."""
    (docs,) = _docs(spark, sf_dir)
    t = _pii_enrich_col()
    ne = _pii_count(t, PII_EMAIL_RE)
    ni = _pii_count(t, PII_IPV4_RE)
    np_ = _pii_count(t, PII_PHONE_RE)
    anyp = F.when(ne + ni + np_ > 0, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select("source", ne.alias("ne"), ni.alias("ni"), np_.alias("np"),
                    anyp.alias("anyp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("anyp").cast("long").alias("n_docs_with_pii"),
            F.sum("ne").alias("total_emails"),
            F.sum("ni").alias("total_ipv4"),
            F.sum("np").alias("total_phones"),
            F.expr("sum(anyp) * 1000 div count(*)").cast("long")
            .alias("pii_doc_permille"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring — the inverted-index ranking pattern.

BM25_QUERY_TERMS = ("spark", "window", "merge", "vector", "customer")
BM25_TOPK = 20
# k1=1.2, b=0.75 (the classic Robertson defaults); expressions below use
# the folded literals 2.2 (=k1+1) and 0.25/0.75 (=1-b / b) so the Spark
# and DuckDB float expressions are token-identical.


def _bm25_base_shared(spark, sf_dir):
    """Doc-grain BM25 base (doc_id, dl, query-term hits) persisted ONCE
    per (session, sf_dir) via the sharedframes registry.

    ONE corpus scan + split: the pre-r10 shape re-ran split(text) over
    the whole corpus three times (the stats pass, and the tf subtree
    embedded under BOTH df and contrib); r10 cut that with an eager
    ``.localCheckpoint()``, but that taxed every CONSUMER of
    t_bm25_topk (ann_rank_agreement −21%, ann_hybrid_rrf_topk −5% in
    the r10 driver bench) with a serialized materialization at plan
    CONSTRUCTION time. The lazy shared persist keeps the single-scan
    dedup (in-plan InMemoryTableScan reuse) without the eager cut, and
    the two ANN consumers share the same frame instead of rebuilding
    it (guide §2.4/§5; VERDICT r10 next-round #1)."""
    from xova_spark.sharedframes import shared

    terms_sql = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

    def build():
        (docs,) = _docs(spark, sf_dir)
        ws = F.split("text", " ")
        return docs.select(
            "doc_id",
            F.size(ws).alias("dl"),
            F.expr(
                f"filter(split(text, ' '), t -> t IN ({terms_sql}))"
            ).alias("qt"),
        )

    return shared(spark, ("bm25_base", sf_dir), build)


@q(
    "t_bm25_topk",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), dl AS (
      SELECT doc_id, len(ws) AS dl FROM d
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
      FROM dl
    ), tok AS (
      SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM d
    ), tf AS (
      SELECT doc_id, term, min(dl) AS dl, CAST(count(*) AS BIGINT) AS tf
      FROM tok
      WHERE term IN {BM25_QUERY_TERMS!r}
      GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), idf AS (
      SELECT term,
             CAST(round(ln((s.n_docs - df + 0.5) / (df + 0.5) + 1) * 1000000)
                  AS BIGINT) AS idf_micro
      FROM df CROSS JOIN stats s
    ), contrib AS (
      SELECT t.doc_id,
             CAST(round(i.idf_micro
                        * ((t.tf * 2.2)
                           / (t.tf + 1.2 * (0.25 + 0.75 * ((t.dl * s.n_docs) / s.sum_dl)))))
                  AS BIGINT) AS c_micro
      FROM tf t JOIN idf i USING (term) CROSS JOIN stats s
    ), scored AS (
      SELECT doc_id,
             CAST(sum(c_micro) AS BIGINT) AS score_micro,
             CAST(count(*) AS BIGINT) AS n_terms_hit
      FROM contrib GROUP BY doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT)
               AS rank,
           doc_id, score_micro, n_terms_hit
    FROM scored
    ORDER BY score_micro DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
)
def t_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval over the corpus for a fixed query — the
    inverted-index scoring pattern (Robertson k1=1.2, b=0.75): posting
    lists (doc, term, tf) from a token explode FILTERED to the query
    terms (a constant-list filter, never a join), document frequencies
    and corpus stats as K-row broadcast sides, and the classic
    saturating tf * idf contribution.

    Determinism: each (doc, term) contribution is rounded onto the
    integer MICRO lattice before the per-doc sum, so 100 TB partial-sum
    order cannot drift the hash; `ln` (the only transcendental) is
    evaluated once per TERM and immediately latticed. Norm term is
    written (dl * n_docs) / sum_dl so both engines round the same
    single division.

    Scale shape: explode+filter is map-side; tf is one keyed shuffle at
    (doc, term) grain; df/stats are tiny broadcast joins; top-k is
    TakeOrderedAndProject (no global sort materialized); the final
    row_number window runs on the BOUNDED 20-row frame only."""
    base = _bm25_base_shared(spark, sf_dir)
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    tok = base.select("doc_id", "dl", F.explode("qt").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(
        F.min("dl").alias("dl"), F.count("*").cast("long").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
            )
            * 1000000
        )
        .cast("long")
        .alias("idf_micro"),
    )
    x = (F.col("dl") * F.col("n_docs")) / F.col("sum_dl")
    tfpart = (F.col("tf") * 2.2) / (F.col("tf") + 1.2 * (0.25 + 0.75 * x))
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(F.col("idf_micro") * tfpart).cast("long").alias("c_micro"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum("c_micro").cast("long").alias("score_micro"),
        F.count("*").cast("long").alias("n_terms_hit"),
    )
    topk = scored.orderBy(F.desc("score_micro"), "doc_id").limit(BM25_TOPK)
    w = Window.orderBy(F.desc("score_micro"), "doc_id")
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "score_micro",
        "n_terms_hit",
    )


# RAG-prep chunking: fixed-size token windows with stride overlap —
# distinct from t_pack_sequences (which CONCATENATES docs to fill
# training sequences; chunking SPLITS each doc into overlapping
# retrieval units). 32-token chunks, stride 24 (8-token overlap).
_CHUNK_LEN = 32
_CHUNK_STRIDE = 24


@q(
    "t_chunk_overlap",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), chunks AS (
      SELECT doc_id, n, c.chunk_idx,
             c.chunk_idx * {_CHUNK_STRIDE} AS start0
      FROM d, LATERAL (
        SELECT unnest(generate_series(0,
          CASE WHEN n <= {_CHUNK_LEN} THEN 0
               ELSE (n - {_CHUNK_LEN} + {_CHUNK_STRIDE} - 1)
                    // {_CHUNK_STRIDE} END)) AS chunk_idx
      ) c
    ), toks AS (
      SELECT ch.doc_id, ch.chunk_idx,
             j.j, d.words[ch.start0 + j.j] AS w
      FROM chunks ch
      JOIN d ON d.doc_id = ch.doc_id
      , LATERAL (
        SELECT unnest(generate_series(1,
          least({_CHUNK_LEN}, ch.n - ch.start0))) AS j
      ) j
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(j * (length(w) * 131 + ascii(w))) AS BIGINT)
               AS chunk_hash
    FROM toks
    GROUP BY doc_id, chunk_idx
    """,
)
def t_chunk_overlap(spark, sf_dir):
    """SLIDING-WINDOW CHUNKING for retrieval corpora: each document
    splits into {_CHUNK_LEN}-token chunks advancing {_CHUNK_STRIDE}
    tokens (8-token overlap so no boundary context is lost — the
    standard RAG ingestion shape). Emits one row per (doc, chunk) with
    its token count and an order-sensitive integer fingerprint
    (sum over positions j of j * (131*len(w) + ascii(w)) — pure
    integer, position-weighted so reordered chunks never collide, and
    both engines compute it on BIGINTs with no float anywhere).

    Plan/scale shape: chunk indices come from a JVM-side sequence()
    explode (fan-out = n/stride per doc, ~1.33x the token count with
    this overlap), token rows from a second bounded explode
    (<= {_CHUNK_LEN} per chunk), then ONE groupBy(doc, chunk) with
    map-side combine. Zero Python, zero joins — the whole chain is a
    scan-projection pipeline, embarrassingly parallel at 100 TB; the
    (doc_id, chunk_idx) output key is also the natural downstream
    embedding-job partitioning."""
    (docs,) = _docs(spark, sf_dir)
    d = docs.select(
        "doc_id",
        F.split("text", " ").alias("words"),
        F.size(F.split("text", " ")).alias("n"),
    )
    n_chunks_last = F.when(F.col("n") <= _CHUNK_LEN, F.lit(0)).otherwise(
        F.expr(
            f"(n - {_CHUNK_LEN} + {_CHUNK_STRIDE} - 1) div {_CHUNK_STRIDE}"
        )
    )
    chunks = d.select(
        "doc_id",
        "n",
        "words",
        F.explode(F.sequence(F.lit(0), n_chunks_last)).alias("chunk_idx"),
    ).withColumn("start0", F.col("chunk_idx") * _CHUNK_STRIDE)
    toks = chunks.select(
        "doc_id",
        "chunk_idx",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(
                    F.lit(_CHUNK_LEN), F.col("n") - F.col("start0")
                ),
            )
        ).alias("j"),
        F.col("words"),
        F.col("start0"),
    ).select(
        "doc_id",
        "chunk_idx",
        "j",
        F.element_at("words", (F.col("start0") + F.col("j")).cast("int")).alias(
            "w"
        ),
    )
    return toks.groupBy("doc_id", F.col("chunk_idx").cast("long").alias("chunk_idx")).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(
            F.col("j")
            * (F.length("w") * 131 + F.ascii("w"))
        )
        .cast("long")
        .alias("chunk_hash"),
    )


def _qc_scored(spark, sf_dir):
    """Shared (doc_id, score, y) frame for the classifier-evaluation
    trilogy (t_quality_auc / t_quality_calibration / t_quality_pr_curve):
    the hashed-feature score joined to the rule label, built once per
    session via the sharedframes registry — a full gate run evaluates
    all three entries, and the corpus-sized derivation should run once,
    not three times (the 100 TB argument is the same: one scored table
    feeds every evaluation readout)."""
    from xova_spark.sharedframes import shared

    def _build():
        scores = t_quality_classifier_score(spark, sf_dir).select(
            "doc_id", "score"
        )
        labels = t_quality_score(spark, sf_dir).select(
            "doc_id", F.col("quality_keep").cast("long").alias("y")
        )
        return scores.join(labels, "doc_id")

    return shared(spark, ("qc_scored", sf_dir), _build)


@q(
    "t_quality_auc",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), h AS (
      SELECT doc_id,
             ({_FH_DUCK_H}) % {_FH_BUCKETS} AS bucket,
             CASE WHEN (({_FH_DUCK_H}) // {_FH_BUCKETS}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok WHERE word != ''
    ), fv AS (
      SELECT doc_id, bucket, sum(sgn) AS val
      FROM h GROUP BY doc_id, bucket
      HAVING sum(sgn) != 0
    ), wt(bucket, w) AS (
      VALUES {', '.join(f'({b}, {w})' for b, w in enumerate(_QC_WEIGHTS))}
    ), score AS (
      SELECT fv.doc_id, CAST(sum(fv.val * wt.w) AS BIGINT) AS score
      FROM fv JOIN wt USING (bucket)
      GROUP BY fv.doc_id
    ), lab AS (
      SELECT doc_id,
             CASE WHEN len(words) BETWEEN 20 AND 1000
                   AND len(list_distinct(words)) * 1.0 / len(words) > 0.2
                  THEN 1 ELSE 0 END AS y
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    ), j AS (
      SELECT s.score, l.y FROM score s JOIN lab l USING (doc_id)
    ), g AS (
      SELECT score,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(1 - y) AS BIGINT) AS neg
      FROM j GROUP BY score
    ), c AS (
      SELECT pos, neg,
             CAST(coalesce(sum(neg) OVER (
                 ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cn
      FROM g
    ), t AS (
      -- 128-bit pair-count lattice (r8 headroom audit): conc/tied are
      -- sums of pos*cumneg products, quadratic in document count —
      -- BIGINT holds them only to ~3e9 docs/class. HUGEINT here,
      -- DECIMAL(38,0) on the Spark side; the REPORTED columns are the
      -- bounded micro-shares of comparable pairs (<= 1e6 always).
      SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(neg) AS BIGINT) AS n_neg,
             sum(CAST(pos AS HUGEINT) * cn) AS conc_h,
             sum(CAST(pos AS HUGEINT) * neg) AS tied_h
      FROM c
    )
    SELECT n_pos, n_neg,
           CAST(conc_h * 1000000
                // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS conc_micro,
           CAST(tied_h * 1000000
                // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS tied_micro,
           CAST((2 * conc_h + tied_h) * 1000000
                // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS auc_micro
    FROM t
    """,
)
def t_quality_auc(spark, sf_dir):
    """EXACT DISTRIBUTED AUC — the Mann-Whitney ranking evaluation of
    the linear quality classifier (t_quality_classifier_score) against
    the independent rule-based label (t_quality_score.quality_keep):
    does the cheap hashed-feature score rank rule-kept documents above
    rule-dropped ones?  AUC = P(score_pos > score_neg) + 0.5 *
    P(score_pos == score_neg), computed exactly from the per-distinct-
    score (pos, neg) contingency: concordant pairs are sum(pos(s) *
    cumneg(<s)) and ties sum(pos(s) * neg(s)) — integer pair counts, so
    the final micro-unit AUC is a single integer division with no
    float-aggregation-order hazard.

    Scale shape: the only data-sized work is the doc-keyed score/label
    join and one groupBy(score) — the cumulative-negatives pass runs at
    DISTINCT-SCORE grain through ``operators/ranking.global_cumsum``
    (size-gated: plain bounded window under 100k distinct scores, the
    two-pass range-partitioned running sum above — the same discipline
    as global_rank/global_ntile, so no data-grain unpartitioned
    WindowExec can appear).

    128-BIT PAIR LATTICE (round-8 headroom audit — the gini class): the
    raw pair counts are quadratic in document count and leave BIGINT
    around ~3e9 docs/class, far below 100 TB. Both engines now
    accumulate them in their native 128-bit integer type (Spark
    DECIMAL(38,0) with each pos*cn term cast wide BEFORE the sum,
    DuckDB HUGEINT) and the REPORTED columns are the bounded
    micro-shares conc_micro / tied_micro (fraction of the n_pos*n_neg
    comparable pairs, <= 1e6 at any scale) — every output column is
    BIGINT-safe at the 100 TB extrapolation (see SCALE.md lattice
    headroom table; the internal dividend has its own audit probe).

    The evaluation metric every fastText-style curation filter ships
    with (classifier-vs-rule agreement audit, compare
    t_langid_confusion)."""
    from xova_spark.operators.ranking import global_cumsum

    g = (
        _qc_scored(spark, sf_dir)
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
        )
    )
    c = global_cumsum(g, [F.col("score").asc()], "neg", "cneg_incl")
    return (
        c.withColumn("cn", F.col("cneg_incl") - F.col("neg"))
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("neg").cast("long").alias("n_neg"),
            F.expr("sum(CAST(pos AS DECIMAL(38,0)) * cn)").alias("conc_d"),
            F.expr("sum(CAST(pos AS DECIMAL(38,0)) * neg)").alias("tied_d"),
        )
        .selectExpr(
            "n_pos",
            "n_neg",
            "CAST(conc_d * 1000000"
            " DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
            " AS conc_micro",
            "CAST(tied_d * 1000000"
            " DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
            " AS tied_micro",
            "CAST((2 * conc_d + tied_d) * 1000000"
            " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
            " AS auc_micro",
        )
    )


@q(
    "t_quality_calibration",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), h AS (
      SELECT doc_id,
             ({_FH_DUCK_H}) % {_FH_BUCKETS} AS bucket,
             CASE WHEN (({_FH_DUCK_H}) // {_FH_BUCKETS}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok WHERE word != ''
    ), fv AS (
      SELECT doc_id, bucket, sum(sgn) AS val
      FROM h GROUP BY doc_id, bucket
      HAVING sum(sgn) != 0
    ), wt(bucket, w) AS (
      VALUES {', '.join(f'({b}, {w})' for b, w in enumerate(_QC_WEIGHTS))}
    ), score AS (
      SELECT fv.doc_id, CAST(sum(fv.val * wt.w) AS BIGINT) AS score
      FROM fv JOIN wt USING (bucket)
      GROUP BY fv.doc_id
    ), lab AS (
      SELECT doc_id,
             CASE WHEN len(words) BETWEEN 20 AND 1000
                   AND len(list_distinct(words)) * 1.0 / len(words) > 0.2
                  THEN 1 ELSE 0 END AS y
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    ), j AS (
      SELECT s.doc_id, s.score, l.y FROM score s JOIN lab l USING (doc_id)
    ), d AS (
      SELECT score, y,
             CAST(ntile(10) OVER (ORDER BY score, doc_id) AS BIGINT) AS decile
      FROM j
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(y) AS BIGINT) AS n_keep,
           CAST(min(score) AS BIGINT) AS score_min,
           CAST(max(score) AS BIGINT) AS score_max,
           CAST(CAST(sum(y) AS BIGINT) * 1000 // count(*) AS BIGINT)
               AS keep_permille
    FROM d GROUP BY decile
    """,
)
def t_quality_calibration(spark, sf_dir):
    """CLASSIFIER CALIBRATION AUDIT — the reliability-diagram companion
    to t_quality_auc: documents bucketed into exact score DECILES
    (NTILE(10) over the total order (score, doc_id)), each decile
    reporting its size, rule-based keep count, score range, and
    empirical keep rate in integer permille. A well-ordered classifier
    shows keep_permille rising monotonically with the decile — the
    curve a curation team reads before picking the keep threshold
    (t_quality_quantile_cut's cousin, evaluated against the
    INDEPENDENT rule label rather than the score itself).

    Scale shape: doc-keyed score/label join, then the decile assignment
    routes through ``operators/ranking.global_ntile`` — plain bounded
    window under the 100k gate, the two-pass range-partitioned exact
    rank above it — so no data-grain unpartitioned WindowExec exists on
    either path; the readout is a 10-row groupBy."""
    from xova_spark.operators.ranking import global_ntile

    j = _qc_scored(spark, sf_dir)
    d = global_ntile(j, [F.col("score"), F.col("doc_id")], 10, "decile")
    return (
        d.groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_keep"),
            F.min("score").cast("long").alias("score_min"),
            F.max("score").cast("long").alias("score_max"),
        )
        .withColumn(
            "keep_permille",
            F.expr("CAST(n_keep * 1000 DIV n_docs AS BIGINT)"),
        )
    )


@q(
    "t_quality_pr_curve",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), h AS (
      SELECT doc_id,
             ({_FH_DUCK_H}) % {_FH_BUCKETS} AS bucket,
             CASE WHEN (({_FH_DUCK_H}) // {_FH_BUCKETS}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok WHERE word != ''
    ), fv AS (
      SELECT doc_id, bucket, sum(sgn) AS val
      FROM h GROUP BY doc_id, bucket
      HAVING sum(sgn) != 0
    ), wt(bucket, w) AS (
      VALUES {', '.join(f'({b}, {w})' for b, w in enumerate(_QC_WEIGHTS))}
    ), score AS (
      SELECT fv.doc_id, CAST(sum(fv.val * wt.w) AS BIGINT) AS score
      FROM fv JOIN wt USING (bucket)
      GROUP BY fv.doc_id
    ), lab AS (
      SELECT doc_id,
             CASE WHEN len(words) BETWEEN 20 AND 1000
                   AND len(list_distinct(words)) * 1.0 / len(words) > 0.2
                  THEN 1 ELSE 0 END AS y
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    ), j AS (
      SELECT s.score, l.y FROM score s JOIN lab l USING (doc_id)
    ), g AS (
      SELECT score,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(count(*) AS BIGINT) AS tot
      FROM j GROUP BY score
    ), c AS (
      SELECT score,
             CAST(sum(pos) OVER (
                 ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS tp,
             CAST(sum(tot) OVER (
                 ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS npred
      FROM g
    ), p AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos FROM j)
    SELECT c.score AS threshold, c.tp, c.npred - c.tp AS fp,
           CAST(c.tp * 1000 // c.npred AS BIGINT) AS precision_permille,
           CAST(c.tp * 1000 // p.n_pos AS BIGINT) AS recall_permille,
           CAST(2 * c.tp * 1000 // (c.npred + p.n_pos) AS BIGINT)
               AS f1_permille
    FROM c, p
    """,
)
def t_quality_pr_curve(spark, sf_dir):
    """EXACT PRECISION/RECALL CURVE — the threshold-sweep readout of
    the quality classifier against the rule-based label: one row per
    DISTINCT score, giving the confusion counts and permille
    precision/recall/F1 of the filter "keep iff score >= threshold".
    Completes the classifier-audit trilogy (t_quality_auc ranks,
    t_quality_calibration checks monotone keep rates, this picks the
    operating point). All counts are integers and every rate is a
    single integer division, so the whole curve is hash-exact.

    Scale shape: doc-keyed join + one groupBy(score); BOTH cumulative
    counts (true positives, predicted positives) ride ONE size-gated
    ``operators/ranking.global_cumsum`` pass over the distinct-score
    grain (multi-column form — one range shuffle, one Arrow pass); the
    recall denominator is a 1-row broadcast aggregate."""
    from xova_spark.operators.ranking import global_cumsum

    j = _qc_scored(spark, sf_dir)
    g = j.groupBy("score").agg(
        F.sum("y").cast("long").alias("pos"),
        F.count("*").cast("long").alias("tot"),
    )
    c = global_cumsum(
        g, [F.col("score").desc()], ["pos", "tot"], ["tp", "npred"]
    )
    p = j.agg(F.sum("y").cast("long").alias("n_pos"))
    return (
        c.crossJoin(F.broadcast(p))
        .selectExpr(
            "score AS threshold",
            "tp",
            "npred - tp AS fp",
            "CAST(tp * 1000 DIV npred AS BIGINT) AS precision_permille",
            "CAST(tp * 1000 DIV n_pos AS BIGINT) AS recall_permille",
            "CAST(2 * tp * 1000 DIV (npred + n_pos) AS BIGINT)"
            " AS f1_permille",
        )
    )


@q(
    "t_source_lang_entropy",
    """
    WITH cl AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2
    ), st AS (
      SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(max(cnt) AS BIGINT) AS max_cnt
      FROM cl GROUP BY 1
    ), term AS (
      SELECT cl.source, cl.cnt,
             CAST(round((ln(st.n_docs) - ln(cl.cnt)) * 1000000) AS BIGINT)
                 AS t_micro
      FROM cl JOIN st USING (source)
    )
    SELECT s.source, s.n_docs, s.n_langs,
           CAST(s.max_cnt * 1000 // s.n_docs AS BIGINT)
               AS dominant_share_permille,
           CAST(sum(t.cnt * t.t_micro) // s.n_docs AS BIGINT)
               AS entropy_micro
    FROM term t JOIN st s USING (source)
    GROUP BY 1, 2, 3, 4
    """,
)
def t_source_lang_entropy(spark, sf_dir):
    """SOURCE DIVERSITY AUDIT — Shannon entropy of each ingest feed's
    language mix (micro-nats): H = sum p_l * ln(1/p_l) with
    p_l = cnt_l / n, computed as sum(cnt * round((ln n - ln cnt)*1e6))
    DIV n — the ln is evaluated ONCE per (source, lang) cell and
    immediately latticed (the BM25 idf_micro discipline), so partial-
    sum order cannot drift the integer result. Alongside: language
    count and the dominant language's share. The corpus-mix readout a
    curation team reads next to t_source_similarity: a feed with
    entropy ~ 0 is monolingual (its mixture weight buys no diversity);
    max-entropy feeds carry ln(n_langs).

    Scale shape: two keyed aggregates — (source, lang) cells then
    source rollup; the cell table is dimension-grain (sources x
    languages), never data grain. Counts and the final division are
    integers; nonnegative dividends keep DuckDB floor and Spark DIV
    identical."""
    (docs,) = _docs(spark, sf_dir)
    cl = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("cnt")
    )
    st = cl.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_langs"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    term = cl.join(st, "source").select(
        "source",
        "cnt",
        "n_docs",
        "n_langs",
        "max_cnt",
        F.round((F.log(F.col("n_docs")) - F.log(F.col("cnt"))) * 1000000)
        .cast("long")
        .alias("t_micro"),
    )
    return (
        term.groupBy("source", "n_docs", "n_langs", "max_cnt")
        .agg(F.sum(F.col("cnt") * F.col("t_micro")).alias("wsum"))
        .selectExpr(
            "source",
            "n_docs",
            "n_langs",
            "CAST(max_cnt * 1000 DIV n_docs AS BIGINT)"
            " AS dominant_share_permille",
            "CAST(wsum DIV n_docs AS BIGINT) AS entropy_micro",
        )
    )


# Trigram stupid-backoff (round 7): the LM trains on the TRAIN split
# (doc_id % 5 != 0) and scores the EVAL split (doc_id % 5 == 0), so
# unseen-context backoff genuinely fires — a same-corpus trigram model
# would never back off. Backoff weight 0.4 (the classic stupid-backoff
# constant); per-position probabilities round to integer micro-units
# BEFORE summing, so the per-doc aggregate is an exact integer in both
# engines (no order-dependent float sum at all).
_TRIGRAM_EVAL_MOD = 5


@q(
    "t_trigram_backoff_score",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), train AS (
      SELECT l FROM toks WHERE doc_id % {_TRIGRAM_EVAL_MOD} <> 0
    ), tri_train AS (
      SELECT l[i] AS w1, l[i+1] AS w2, l[i+2] AS w3
      FROM train, generate_series(1, 400) g(i) WHERE i <= len(l) - 2
    ), c3 AS (
      SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS n3
      FROM tri_train GROUP BY w1, w2, w3
    ), bi_train AS (
      SELECT l[i] AS w1, l[i+1] AS w2
      FROM train, generate_series(1, 400) g(i) WHERE i <= len(l) - 1
    ), c2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n2
      FROM bi_train GROUP BY w1, w2
    ), uni AS (
      SELECT unnest(l) AS w FROM train
    ), c1 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n1 FROM uni GROUP BY w
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM uni
    ), tri_eval AS (
      SELECT doc_id, l[i] AS w1, l[i+1] AS w2, l[i+2] AS w3
      FROM toks, generate_series(1, 400) g(i)
      WHERE doc_id % {_TRIGRAM_EVAL_MOD} = 0 AND i <= len(l) - 2
    ), scored AS (
      SELECT e.doc_id,
             CASE
               WHEN coalesce(t3.n3, 0) > 0 THEN 0
               WHEN coalesce(b23.n2, 0) > 0 THEN 1
               ELSE 2 END AS backoff_level,
             CAST(round(CASE
               WHEN coalesce(t3.n3, 0) > 0
                 THEN t3.n3 * 1.0 / ctx.n2
               WHEN coalesce(b23.n2, 0) > 0
                 THEN 0.4 * (b23.n2 * 1.0 / u2.n1)
               ELSE 0.16 * (coalesce(u3.n1, 0) * 1.0 / tot.n)
             END * 1000000) AS BIGINT) AS p_micro
      FROM tri_eval e
      LEFT JOIN c3 t3 ON t3.w1 = e.w1 AND t3.w2 = e.w2 AND t3.w3 = e.w3
      LEFT JOIN c2 ctx ON ctx.w1 = e.w1 AND ctx.w2 = e.w2
      LEFT JOIN c2 b23 ON b23.w1 = e.w2 AND b23.w2 = e.w3
      LEFT JOIN c1 u2 ON u2.w = e.w2
      LEFT JOIN c1 u3 ON u3.w = e.w3
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN backoff_level = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_backoff_bigram,
           CAST(sum(CASE WHEN backoff_level = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_backoff_unigram,
           CAST(sum(p_micro) AS BIGINT) AS score_micro_sum,
           CAST(sum(p_micro) // count(*) AS BIGINT) AS avg_p_micro
    FROM scored GROUP BY doc_id
    """,
)
def t_trigram_backoff_score(spark, sf_dir):
    """TRIGRAM STUPID-BACKOFF scoring — the KenLM-style quality gate
    one order above t_bigram_lm_score, with a REAL train/eval split so
    the backoff chain actually executes: p(w3|w1 w2) = c3/c2 when the
    trigram was seen in training, else 0.4 * c(w2 w3)/c(w2), else
    0.4^2 * c(w3)/N (unseen words score 0). Each position's probability
    is latticed to integer micro-units BEFORE the per-doc sum, so the
    aggregate is exact integer arithmetic — no order-dependent float
    sum survives; the per-doc backoff-level counts expose HOW a
    document was scored (heavy unigram-backoff = out-of-domain text).

    Scale shape: all model tables are vocabulary-bounded aggregates
    (map-side partial counts); scoring is a chain of keyed equi-joins
    (broadcast-eligible under AQE at real vocab/corpus ratios) + one
    per-doc aggregation; the train-token total is a 1-row broadcast.
    The train/eval split is the deterministic doc_id residue — the
    same hash-split discipline as t_split_deterministic."""
    (docs,) = _docs(spark, sf_dir)
    l = "split(text, ' ')"
    tri = (
        "explode(zip_with(zip_with(slice({l}, 1, size({l}) - 2),"
        " slice({l}, 2, size({l}) - 2), (x, y) -> struct(x AS w1, y AS w2)),"
        " slice({l}, 3, size({l}) - 2),"
        " (xy, z) -> struct(xy.w1 AS w1, xy.w2 AS w2, z AS w3))) AS t"
    ).format(l=l)
    train = docs.where(F.col("doc_id") % _TRIGRAM_EVAL_MOD != 0)
    tri_train = train.selectExpr(tri).select("t.w1", "t.w2", "t.w3")
    c3 = tri_train.groupBy("w1", "w2", "w3").agg(
        F.count("*").cast("long").alias("n3")
    )
    bi_train = train.selectExpr(
        f"explode(zip_with(slice({l}, 1, size({l}) - 1),"
        f" slice({l}, 2, size({l}) - 1),"
        " (x, y) -> struct(x AS w1, y AS w2))) AS b"
    ).select("b.w1", "b.w2")
    c2 = bi_train.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("n2")
    )
    uni = train.select(F.explode(F.split("text", " ")).alias("w"))
    c1 = uni.groupBy("w").agg(F.count("*").cast("long").alias("n1"))
    tot = uni.agg(F.count("*").cast("long").alias("n"))
    tri_eval = (
        docs.where(F.col("doc_id") % _TRIGRAM_EVAL_MOD == 0)
        .selectExpr("doc_id", tri)
        .select("doc_id", "t.w1", "t.w2", "t.w3")
    )
    e = tri_eval
    t3 = c3.select(
        F.col("w1").alias("a1"), F.col("w2").alias("a2"),
        F.col("w3").alias("a3"), "n3",
    )
    ctx = c2.select(
        F.col("w1").alias("b1"), F.col("w2").alias("b2"),
        F.col("n2").alias("n2_ctx"),
    )
    b23 = c2.select(
        F.col("w1").alias("d1"), F.col("w2").alias("d2"),
        F.col("n2").alias("n2_back"),
    )
    u2 = c1.select(F.col("w").alias("u2w"), F.col("n1").alias("n1_w2"))
    u3 = c1.select(F.col("w").alias("u3w"), F.col("n1").alias("n1_w3"))
    scored = (
        e.join(
            t3,
            (F.col("a1") == F.col("w1"))
            & (F.col("a2") == F.col("w2"))
            & (F.col("a3") == F.col("w3")),
            "left",
        )
        .join(
            ctx,
            (F.col("b1") == F.col("w1")) & (F.col("b2") == F.col("w2")),
            "left",
        )
        .join(
            b23,
            (F.col("d1") == F.col("w2")) & (F.col("d2") == F.col("w3")),
            "left",
        )
        .join(u2, F.col("u2w") == F.col("w2"), "left")
        .join(u3, F.col("u3w") == F.col("w3"), "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(F.coalesce("n3", F.lit(0)) > 0, 0)
            .when(F.coalesce("n2_back", F.lit(0)) > 0, 1)
            .otherwise(2)
            .alias("backoff_level"),
            F.round(
                F.when(
                    F.coalesce("n3", F.lit(0)) > 0,
                    F.col("n3") * 1.0 / F.col("n2_ctx"),
                )
                .when(
                    F.coalesce("n2_back", F.lit(0)) > 0,
                    0.4 * (F.col("n2_back") * 1.0 / F.col("n1_w2")),
                )
                .otherwise(
                    0.16
                    * (F.coalesce("n1_w3", F.lit(0)) * 1.0 / F.col("n"))
                )
                * 1000000
            )
            .cast("long")
            .alias("p_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.sum(F.when(F.col("backoff_level") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_backoff_bigram"),
        F.sum(F.when(F.col("backoff_level") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_backoff_unigram"),
        F.sum("p_micro").cast("long").alias("score_micro_sum"),
        F.expr("CAST(sum(p_micro) div count(*) AS BIGINT)").alias(
            "avg_p_micro"
        ),
    )


# ---------------------------------------------------------------------------
# Round-9 text-quality additions: per-document token entropy (the
# repetitiveness/boilerplate filter) and vocabulary OOV coverage (the
# tokenizer-fit audit between a train-split vocab and the eval split).
# ---------------------------------------------------------------------------

_ENTROPY_LOW_MICRO = 2_500_000  # 2.5 nats: the fixture's ~5th percentile

_VOCAB_TOP_V = 20


@q(
    "t_doc_entropy_filter",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), c AS (
      SELECT doc_id, source, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2, 3
    ), h AS (
      SELECT doc_id, any_value(source) AS source,
             CAST(round(ln(sum(c)) * 1000000) AS BIGINT)
             - CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT))
                    // sum(c) AS BIGINT) AS h_micro
      FROM c GROUP BY doc_id
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(h_micro) // count(*) AS BIGINT) AS mean_entropy_micro,
           CAST(min(h_micro) AS BIGINT) AS min_entropy_micro,
           CAST(sum(CASE WHEN h_micro < {_ENTROPY_LOW_MICRO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN h_micro < {_ENTROPY_LOW_MICRO}
                    THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
               AS low_permille
    FROM h GROUP BY source ORDER BY source
    """,
)
def t_doc_entropy_filter(spark, sf_dir):
    """PER-DOCUMENT TOKEN ENTROPY filter — the repetitiveness quality
    signal (templated/boilerplate/spam pages reuse a tiny vocabulary,
    so their unigram entropy collapses; a perplexity filter's cheap
    sibling that needs no trained LM): per doc H = ln(n) - (1/n) * sum
    c_i*ln(c_i) over its token counts, latticed to micro-nats, rolled
    up per source as mean/min entropy and the share of docs under the
    2.5-nat boilerplate fence (the fixture's ~5th percentile).

    Lattice discipline: ln evaluated ONCE per (doc, token) cell on the
    integer count and immediately rounded to micro-nats (the BM25 idf
    / lang-entropy discipline), ln(n) once per doc — so every per-doc
    entropy is an exact integer and the source rollup sums integers;
    partial-sum order cannot drift the hash. H >= 0 by Jensen (exactly
    0 for a single-distinct-token doc, where both terms coincide on
    the lattice by construction).

    Scale shape: one explode to token grain (map-side), one keyed
    aggregate to (doc, token) cells, one to doc grain, one to source
    grain — a strictly shrinking aggregation chain, no windows, no
    joins."""
    (docs,) = _docs(spark, sf_dir)
    c = (
        docs.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("doc_id", "source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    h = (
        c.select(
            "doc_id",
            "source",
            "c",
            F.round(F.log("c") * 1000000).cast("long").alias("lnc_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.sum("c").cast("long").alias("n"),
            # 128-bit accumulator discipline: the oracle's sum promotes
            # to HUGEINT; a plain BIGINT product can silently wrap
            # under non-ANSI Spark on very large documents.
            F.expr("sum(CAST(c AS DECIMAL(38,0)) * lnc_micro)").alias("s"),
        )
        .selectExpr(
            "source",
            "CAST(round(ln(n) * 1000000) AS BIGINT)"
            " - CAST(s div n AS BIGINT) AS h_micro",
        )
    )
    return (
        h.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("h_micro").alias("hsum"),
            F.min("h_micro").cast("long").alias("min_entropy_micro"),
            F.sum(
                F.when(F.col("h_micro") < _ENTROPY_LOW_MICRO, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_low"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "CAST(hsum div n_docs AS BIGINT) AS mean_entropy_micro",
            "min_entropy_micro",
            "n_low",
            "CAST(n_low * 1000 div n_docs AS BIGINT) AS low_permille",
        )
        .orderBy("source")
    )


@q(
    "t_vocab_oov_rate",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS cnt FROM tok WHERE doc_id % 10 < 8
        GROUP BY w ORDER BY cnt DESC, w LIMIT {_VOCAB_TOP_V}
      )
    ), ev AS (
      SELECT t.source, t.w, v.w IS NOT NULL AS known
      FROM tok t LEFT JOIN vocab v ON t.w = v.w
      WHERE t.doc_id % 10 >= 8
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN known THEN 0 ELSE 1 END) AS BIGINT)
               AS n_oov,
           CAST(sum(CASE WHEN known THEN 0 ELSE 1 END) * 1000
                // count(*) AS BIGINT) AS oov_permille
    FROM ev GROUP BY source ORDER BY source
    """,
)
def t_vocab_oov_rate(spark, sf_dir):
    """VOCABULARY OOV-RATE audit — the tokenizer-fit readout: build the
    top-{_VOCAB_TOP_V} token vocabulary from the TRAIN split (doc_id %
    10 < 8, the deterministic split idiom) and measure the
    out-of-vocabulary token share on the EVAL split per source. The
    number a tokenizer/vocab decision is made on: a source whose OOV
    rate spikes is drifting away from the vocabulary the model was
    built for (new language, new domain, encoding rot).

    Determinism: the vocab is a top-k under the TOTAL order (count
    DESC, token ASC) — TakeOrderedAndProject semantics, identical in
    both engines at every count tie; OOV is a pure membership test
    (left join against the K-row vocab, broadcast), and the rates are
    integer permille.

    Scale shape: one explode, one keyed aggregate to token grain
    (vocab candidates are bounded by the vocabulary, not the corpus),
    a K-row top-k, then one map-side broadcast join over the eval
    tokens and a source-grain rollup. No data-grain windows."""
    (docs,) = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        tok.filter(F.col("doc_id") % 10 < 8)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(_VOCAB_TOP_V)
        .select("w", F.lit(True).alias("known"))
    )
    ev = (
        tok.filter(F.col("doc_id") % 10 >= 8)
        .join(F.broadcast(vocab), "w", "left")
    )
    return (
        ev.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("known"), 0).otherwise(1))
            .cast("long")
            .alias("n_oov"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "n_oov",
            "CAST(n_oov * 1000 div n_tokens AS BIGINT) AS oov_permille",
        )
        .orderBy("source")
    )


_WATERFILL_QCHARS = 280  # quality proxy: doc passes if n_chars >= this


@q(
    "t_mixture_waterfill",
    f"""
    WITH src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
             CAST(sum(CASE WHEN n_chars >= {_WATERFILL_QCHARS}
                           THEN 1 ELSE 0 END) * 1000
                  // count(*) AS BIGINT) AS quality_permille
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(tokens) // 2 AS BIGINT) AS budget FROM src
    ), ord AS (
      SELECT source, n_docs, tokens, quality_permille, budget,
             CAST(coalesce(sum(tokens) OVER (
                 ORDER BY quality_permille DESC, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
      FROM src, tot
    )
    SELECT source, n_docs, tokens, quality_permille,
           CAST(least(tokens, greatest(budget - cum_before, 0))
                AS BIGINT) AS taken_tokens,
           least(tokens, greatest(budget - cum_before, 0)) < tokens
               AS truncated
    FROM ord
    """,
)
def t_mixture_waterfill(spark, sf_dir):
    """GREEDY QUALITY WATER-FILL mixture allocation — the training-
    data budgeting step after per-source quality scoring: given a
    global token budget (here 50% of the corpus — the literal every
    data-constrained pretraining run picks first), fill from the
    highest-quality source down, truncating the source that crosses
    the budget and zeroing everything below it. The per-source readout
    (tokens, quality, taken, truncated flag) IS the mixture spec a
    sampler consumes; t_unimax_language_budget is the LANGUAGE-axis
    sibling (epoch-capped fairness), this is the QUALITY-axis greedy.

    Exactness: quality is an integer permille pass rate on the doc
    count (pass = n_chars >= literal); the fill order is total
    (quality DESC, source ASC); cum_before is an exclusive prefix sum
    of exact token counts; take = least/greatest integer arithmetic.
    Law (test-pinned): sum(taken) == min(budget, total_tokens), and
    the truncated set is a suffix of the fill order.

    Scale shape: ONE doc-grain keyed aggregate to source grain
    (bounded dimension, ~tens at any corpus size), a 1-row budget
    broadcast, one bounded window over sources. The explode-free
    token count (len(split)) keeps the scan single-pass."""
    (docs,) = _docs(spark, sf_dir)
    src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens"),
        F.expr(
            f"CAST(sum(CASE WHEN n_chars >= {_WATERFILL_QCHARS}"
            " THEN 1 ELSE 0 END) * 1000 div count(*) AS BIGINT)"
        ).alias("quality_permille"),
    )
    tot = src.agg(
        F.expr("CAST(sum(tokens) div 2 AS BIGINT)").alias("budget")
    )
    w = Window.orderBy(F.desc("quality_permille"), "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordd = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        "quality_permille",
        "budget",
        (F.sum("tokens").over(w) - F.col("tokens"))
        .cast("long")
        .alias("cum_before"),
    )
    return ordd.selectExpr(
        "source",
        "n_docs",
        "tokens",
        "quality_permille",
        "CAST(least(tokens, greatest(budget - cum_before, 0)) AS BIGINT)"
        " AS taken_tokens",
        "least(tokens, greatest(budget - cum_before, 0)) < tokens"
        " AS truncated",
    )


_COVERAGE_TOPK = 1000  # deepest checkpoint; the global sort stops here


@q(
    "t_ngram_coverage_curve",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS vocab
      FROM freq
    ), top AS (
      SELECT w, c FROM freq ORDER BY c DESC, w LIMIT {_COVERAGE_TOPK}
    ), ranked AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, w) AS rk,
             CAST(sum(c) OVER (ORDER BY c DESC, w
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM top
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(least(k, vocab) AS BIGINT) AS vocab_at_k,
           CAST(max(CASE WHEN rk <= k THEN cum END) * 1000
                // total_tokens AS BIGINT) AS coverage_permille,
           total_tokens, vocab
    FROM ranked, tot, (VALUES (10), (100), (1000)) AS ks(k)
    GROUP BY k, vocab, total_tokens
    ORDER BY k
    """,
)
def t_ngram_coverage_curve(spark, sf_dir):
    """VOCABULARY COVERAGE CURVE — the tokenizer-design readout: what
    fraction of all token OCCURRENCES do the top-K types cover, at
    K = 10/100/1000? (Zipf's law says ~K^(1-1/s) — t_zipf_slope fits
    the exponent; this entry reads the curve directly, which is what a
    vocab-size decision actually consumes. The OOV-rate entries are
    the same curve evaluated from the other side.)

    Exactness: frequencies are exact counts; the top-K order is total
    (count DESC, token ASC); the cumulative rides a window over the
    ALREADY-LIMITED frame (<= {_COVERAGE_TOPK} rows by the literal);
    coverage is a positive integer permille division. Law
    (test-pinned): coverage is monotone nondecreasing in K and
    vocab_at_k == min(K, vocab).

    Scale shape: one token-grain keyed aggregate (map-side combine),
    ONE distributed TakeOrderedAndProject top-K (the t_bm25_topk
    survivor class — never a global sort), a bounded window over the
    K-row frame, a 3-row checkpoint spine, 1-row totals broadcast."""
    (docs,) = _docs(spark, sf_dir)
    tok = docs.select(F.explode(F.split("text", " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    tot = freq.agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("vocab"),
    )
    top = freq.orderBy(F.desc("c"), "w").limit(_COVERAGE_TOPK)
    w_rk = Window.orderBy(F.desc("c"), "w")
    ranked = top.select(
        "c",
        F.row_number().over(w_rk).alias("rk"),
        F.sum("c")
        .over(
            w_rk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("cum"),
    )
    ks = spark.range(3).select(
        F.expr("CAST(pow(10, id + 1) AS BIGINT)").alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "vocab", "total_tokens")
        .agg(
            F.expr(
                "CAST(max(CASE WHEN rk <= k THEN cum END) * 1000"
                " div total_tokens AS BIGINT)"
            ).alias("coverage_permille")
        )
        .selectExpr(
            "k",
            "CAST(least(k, vocab) AS BIGINT) AS vocab_at_k",
            "coverage_permille",
            "total_tokens",
            "vocab",
        )
        .orderBy("k")
    )


@q(
    "t_kl_vocab_divergence",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), sw AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
      FROM tok GROUP BY source, w
    ), cw AS (
      SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w
    ), st AS (
      SELECT source, CAST(sum(c_sw) AS BIGINT) AS t_s,
             CAST(count(*) AS BIGINT) AS vocab_s
      FROM sw GROUP BY source
    ), tot AS (
      SELECT CAST(sum(c_w) AS BIGINT) AS t FROM cw
    ), terms AS (
      SELECT sw.source,
             CAST(sw.c_sw AS HUGEINT)
             * CAST(round(ln((CAST(sw.c_sw AS DOUBLE) * t)
                             / (CAST(t_s AS DOUBLE) * c_w)) * 1000000)
                    AS BIGINT) AS term
      FROM sw JOIN cw USING (w) JOIN st USING (source), tot
    )
    SELECT s.source, s.t_s AS total_tokens, s.vocab_s,
           CAST(greatest(coalesce(sum(t.term), 0), 0) // s.t_s
                AS BIGINT) AS kl_micro
    FROM st s JOIN terms t USING (source)
    GROUP BY s.source, s.t_s, s.vocab_s
    """,
)
def t_kl_vocab_divergence(spark, sf_dir):
    """KL DIVERGENCE of each source's unigram distribution from the
    corpus distribution — the domain-shift readout a mixture designer
    reads next to t_mixture_waterfill's quality ordering (a source can
    be high-quality AND redundant — low KL — or low-quality but
    distributionally novel — high KL; the DoReMi/domain-reweighting
    literature optimizes exactly this trade-off). Unsmoothed and
    EXACT: the source distribution's support is a subset of the
    corpus's by construction, so KL(p_s || p_corpus) =
    sum_{w in s} p ln(p/q) is the complete divergence, no epsilon.

    Integer form: the per-(source, token) log ratio
    (c_sw * T) / (T_s * c_w) enters as ONE fixed-shape double of exact
    counts and lands on the micro-nat lattice before the c_sw-weighted
    128-bit sum (the entropy discipline); KL >= 0 analytically, so the
    greatest(., 0) clamp converts sub-micro lattice noise at the
    one-source boundary into a clean 0 on both engines rather than a
    floor-vs-truncate divergence. Law (test-pinned): kl_micro >= 0,
    and a single-source corpus gives exactly 0.

    Scale shape: one token-grain keyed aggregate to (source, token)
    cells, one to token grain, one to source grain (strictly shrinking
    chain), ONE keyed equi-join back on the token (data-grain keyed —
    no broadcast of the unbounded vocabulary), a 1-row corpus-total
    broadcast, one source-grain aggregate."""
    (docs,) = _docs(spark, sf_dir)
    sw = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c_sw"))
    )
    cw = sw.groupBy("w").agg(F.sum("c_sw").cast("long").alias("c_w"))
    st = sw.groupBy("source").agg(
        F.sum("c_sw").cast("long").alias("t_s"),
        F.count("*").cast("long").alias("vocab_s"),
    )
    tot = cw.agg(F.sum("c_w").cast("long").alias("t"))
    terms = (
        sw.join(cw, "w")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "CAST(c_sw AS DECIMAL(38,0))"
            " * CAST(round(ln((CAST(c_sw AS DOUBLE) * t)"
            " / (CAST(t_s AS DOUBLE) * c_w)) * 1000000)"
            " AS BIGINT) AS term",
        )
    )
    return (
        terms.groupBy("source")
        .agg(F.sum("term").alias("s"))
        .join(F.broadcast(st), "source")
        .selectExpr(
            "source",
            "t_s AS total_tokens",
            "vocab_s",
            "CAST(greatest(coalesce(s, CAST(0 AS DECIMAL(38,0))),"
            " CAST(0 AS DECIMAL(38,0))) div t_s AS BIGINT) AS kl_micro",
        )
    )


# ---------------------------------------------------------------------------
# Round-10 batch 4: vocabulary-richness estimation (Chao1), Good-Turing
# frequency re-estimation, and per-word burstiness (Fano factor) — the
# corpus-statistics trio for LLM-data curation (how much vocabulary is
# unseen; what a count of r is really worth; which words clump).
# ---------------------------------------------------------------------------


def _source_word_counts(spark, sf_dir):
    """The (source, word, c) frequency frame, persisted once per
    (session, sf_dir) and shared by the richness dashboard entries
    (Chao1 / Simpson / Yule / the health gate) — the er_* shared
    cluster-frame discipline applied to the word-count scan: four
    consumers, ONE explode + keyed count."""
    from xova_spark.sharedframes import shared

    (docs,) = _docs(spark, sf_dir)

    def build():
        return (
            docs.select(
                "source", F.explode(F.split("text", " ")).alias("word")
            )
            .filter(F.col("word") != "")
            .groupBy("source", "word")
            .agg(F.count("*").cast("long").alias("c"))
        )

    return shared(spark, ("source_word_counts", sf_dir), build)


@q(
    "t_chao1_vocab_richness",
    """
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), wf AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word != '' GROUP BY source, word
    ), s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS d_vocab,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM wf GROUP BY source
    )
    SELECT source, d_vocab, f1, f2,
           CAST(d_vocab * 1000000
                + CASE WHEN f2 > 0
                       THEN CAST(f1 AS HUGEINT) * f1 * 1000000 // (2 * f2)
                       ELSE CAST(f1 AS HUGEINT) * (f1 - 1) * 1000000 // 2
                  END AS BIGINT) AS chao1_micro
    FROM s ORDER BY source
    """,
)
def t_chao1_vocab_richness(spark, sf_dir):
    """CHAO1 RICHNESS ESTIMATOR per source — the lower bound on TRUE
    vocabulary size from the observed frequency-of-frequencies:
    chao1 = D + f1^2/(2 f2) (singletons^2 over twice the doubletons),
    with the bias-corrected f1(f1-1)/2 form when no doubleton exists.
    For corpus curation this is the "how much of this source's
    vocabulary have we NOT seen yet" dial — a source whose chao1 far
    exceeds its observed D is undersampled; one where they agree is
    exhausted.

    Integer form: all inputs are exact counts; the correction term is a
    single positive floor-div on the micro lattice with a 128-bit
    dividend (f1^2 is quadratic in vocabulary size). Scale shape: one
    explode + one (source, word) keyed aggregate (map-side combined),
    one source-grain rollup — the word table is touched once."""
    wf = _source_word_counts(spark, sf_dir)
    s = wf.groupBy("source").agg(
        F.count("*").cast("long").alias("d_vocab"),
        F.sum(F.expr("CASE WHEN c = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("f1"),
        F.sum(F.expr("CASE WHEN c = 2 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("f2"),
    )
    return s.selectExpr(
        "source",
        "d_vocab",
        "f1",
        "f2",
        "CAST(d_vocab * 1000000"
        " + CASE WHEN f2 > 0"
        " THEN CAST(f1 AS DECIMAL(38,0)) * f1 * 1000000 div (2 * f2)"
        " ELSE CAST(f1 AS DECIMAL(38,0)) * (f1 - 1) * 1000000 div 2"
        " END AS BIGINT) AS chao1_micro",
    ).orderBy("source")


@q(
    "t_good_turing_counts",
    """
    WITH w AS (
      SELECT string_split(text, ' ') AS ws FROM documents
    ), tg AS (
      -- series bound inherits the fixture text cap (ORACLE_TEXT_CAP)
      SELECT ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram
      FROM w, generate_series(1, 600) g(i)
      WHERE i <= len(ws) - 2
    ), gf AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY gram
    ), fof AS (
      SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r
      FROM gf GROUP BY c
    )
    SELECT CAST(a.r AS BIGINT) AS r, a.n_r,
           CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r_plus_1,
           CAST((a.r + 1) * CAST(coalesce(b.n_r, 0) AS HUGEINT)
                * 1000000 // a.n_r AS BIGINT) AS r_star_micro
    FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
    WHERE a.r <= 8 ORDER BY a.r
    """,
)
def t_good_turing_counts(spark, sf_dir):
    """GOOD-TURING ADJUSTED COUNTS over TRIGRAM types: r* =
    (r+1) N_{r+1} / N_r for r = 1..8 — the smoothing estimate of what
    an n-gram observed r times is really worth, the foundation of
    count-based LM backoff (Katz) and of the "mass of the unseen"
    estimate (N_1 / N). Trigrams are the unit because that is where the
    low-count regime lives (the fixture's unigram vocabulary is tiny
    and saturated — r <= 8 is empty there; pinned in the law test); a
    corpus whose singleton r* is far below 1 is dominated by hapax
    noise (OCR junk, boilerplate shards).

    Integer form: frequency-of-frequencies are exact counts; r* leaves
    on the micro lattice via one positive floor-div (dividend 128-bit:
    N_{r+1} is type-table-sized). Scale shape: per-row zip_with trigram
    projection (explode only into the count), one gram-keyed count
    (map-side combined), one count-keyed re-aggregate (the
    frequency-of-frequencies table is ~#distinct-counts rows), then a
    self-join at that tiny grain."""
    (docs,) = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    # greatest(n-2, 0): slice() throws on a negative length, so a
    # sub-3-token document must yield an empty gram list, not an error
    n = F.greatest(F.size("ws") - 2, F.lit(0))
    grams = F.zip_with(
        F.zip_with(
            F.slice("ws", 1, n),
            F.slice("ws", 2, n),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
        F.slice("ws", 3, n),
        lambda xy, z: F.concat_ws(" ", xy, z),
    )
    gf = (
        docs.select(ws.alias("ws"))
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # r11: N_r and N_{r+1} in ONE pass over the gram-count table — the
    # old fof self-join embedded the whole trigram explode + count
    # subtree TWICE in the plan (2 scans, 2 Generates; ReuseExchange
    # did not fire across the shifted projection). A gram counted c
    # times contributes to N_r at r = c AND to N_{r+1} at r = c - 1,
    # so exploding each gram-type row into those two tallies and
    # re-aggregating by r yields both columns from one subtree. A tally
    # row with zero self-contributions (an r present only as some
    # gram's c - 1) is an r absent from the frequency-of-frequencies
    # table and is dropped — exactly the old inner-side filter; the
    # old LEFT join's missing-neighbor case is sum(plus) = 0.
    fof2 = (
        gf.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("c").alias("r"),
                        F.lit(1).alias("self_"),
                        F.lit(0).alias("plus"),
                    ),
                    F.struct(
                        (F.col("c") - 1).alias("r"),
                        F.lit(0).alias("self_"),
                        F.lit(1).alias("plus"),
                    ),
                )
            ).alias("t")
        )
        .select("t.r", "t.self_", "t.plus")
        .filter((F.col("r") >= 1) & (F.col("r") <= 8))
        .groupBy("r")
        .agg(
            F.sum("self_").cast("long").alias("n_r"),
            F.sum("plus").cast("long").alias("n_r1"),
        )
        .filter(F.col("n_r") > 0)
    )
    return (
        fof2.selectExpr(
            "CAST(r AS BIGINT) AS r",
            "n_r",
            "CAST(n_r1 AS BIGINT) AS n_r_plus_1",
            "CAST((r + 1) * CAST(n_r1 AS DECIMAL(38,0))"
            " * 1000000 div n_r AS BIGINT) AS r_star_micro",
        )
        .orderBy("r")
    )


@q(
    "t_burstiness_fano",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), cw AS (SELECT doc_id, word FROM w WHERE word != ''),
    top AS (
      SELECT word, CAST(count(*) AS BIGINT) AS t
      FROM cw GROUP BY word ORDER BY count(*) DESC, word LIMIT 20
    ), dc AS (
      SELECT cw.word, cw.doc_id, CAST(count(*) AS BIGINT) AS c
      FROM cw JOIN top ON cw.word = top.word
      GROUP BY cw.word, cw.doc_id
    ), nd AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), agg AS (
      SELECT word, CAST(sum(c * c) AS BIGINT) AS ssq,
             CAST(sum(c) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS n_docs_present
      FROM dc GROUP BY word
    )
    SELECT word, t AS total_count, n_docs_present,
           CAST((CAST(n_docs AS HUGEINT) * ssq - CAST(t AS HUGEINT) * t)
                * 1000000 // (CAST(n_docs AS HUGEINT) * t)
                AS BIGINT) AS fano_micro
    FROM agg CROSS JOIN nd
    ORDER BY total_count DESC, word
    """,
)
def t_burstiness_fano(spark, sf_dir):
    """WORD BURSTINESS via the FANO FACTOR (variance-to-mean ratio of
    per-document counts, zeros included) for the 20 highest-frequency
    words: Fano ~ 1 is Poisson scatter (function words), >> 1 is
    bursty/topical clumping (content words, and — the curation case —
    boilerplate injected wholesale into a subset of documents). The
    population-moment identity Fano = (D*sum c^2 - T^2) / (D*T) needs
    only the present-doc counts (zeros drop out of both sums), so the
    zero rows are never materialized.

    Integer form: counts exact; the dividend is Cauchy-Schwarz
    nonnegative and accumulates 128-bit; one positive micro floor-div.
    Scale shape: one explode feeding BOTH the top-k
    (TakeOrderedAndProject) and, semi-joined down to 20 words, the
    (word, doc) keyed count; the doc-count is a 1-row broadcast."""
    (docs,) = _docs(spark, sf_dir)
    cw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    top = (
        cw.groupBy("word")
        .agg(F.count("*").cast("long").alias("t"))
        .orderBy(F.desc("t"), "word")
        .limit(20)
    )
    dc = (
        cw.join(F.broadcast(top.select("word")), "word")
        .groupBy("word", "doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    nd = docs.agg(F.count("*").cast("long").alias("n_docs"))
    agg = dc.groupBy("word").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ssq"),
        F.sum("c").cast("long").alias("t"),
        F.count("*").cast("long").alias("n_docs_present"),
    )
    return (
        agg.crossJoin(F.broadcast(nd))
        .selectExpr(
            "word",
            "t AS total_count",
            "n_docs_present",
            "CAST((CAST(n_docs AS DECIMAL(38,0)) * ssq"
            " - CAST(t AS DECIMAL(38,0)) * t) * 1000000"
            " div (CAST(n_docs AS DECIMAL(38,0)) * t)"
            " AS BIGINT) AS fano_micro",
        )
        .orderBy(F.desc("total_count"), "word")
    )


@q(
    "t_simpson_diversity",
    """
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), wf AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word != '' GROUP BY source, word
    ), s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS d_vocab,
             CAST(sum(c) AS BIGINT) AS t_tokens,
             CAST(sum(c * (c - 1)) AS BIGINT) AS ss
      FROM wf GROUP BY source
    )
    SELECT source, d_vocab, t_tokens,
           CAST(CASE WHEN t_tokens < 2 THEN 0
                ELSE CAST(ss AS HUGEINT) * 1000000
                     // (CAST(t_tokens AS HUGEINT) * (t_tokens - 1)) END
                AS BIGINT) AS simpson_lambda_micro,
           CAST(1000000 - CASE WHEN t_tokens < 2 THEN 0
                ELSE CAST(ss AS HUGEINT) * 1000000
                     // (CAST(t_tokens AS HUGEINT) * (t_tokens - 1)) END
                AS BIGINT) AS gini_simpson_micro
    FROM s ORDER BY source
    """,
)
def t_simpson_diversity(spark, sf_dir):
    """SIMPSON DIVERSITY per source — lambda = sum c(c-1) / T(T-1),
    the probability two tokens drawn WITHOUT replacement are the same
    type (the unbiased finite-sample form), and its Gini-Simpson
    complement 1 - lambda. The entropy pack (t_source_lang_entropy,
    t_doc_entropy_filter) weights rare types logarithmically; Simpson
    weights DOMINANT types quadratically — a source whose lambda rises
    while entropy holds is being flooded by one template, the drift
    mode ln lattices are least sensitive to.

    Integer form: c(c-1) sums are exact; lambda leaves as one positive
    128-bit-dividend micro floor-div; the complement is lattice
    subtraction. Scale shape: one explode + (source, word) keyed count
    (map-side combined), one source-grain rollup — identical to the
    Chao1 plan, different readout."""
    wf = _source_word_counts(spark, sf_dir)
    s = wf.groupBy("source").agg(
        F.count("*").cast("long").alias("d_vocab"),
        F.sum("c").cast("long").alias("t_tokens"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("ss"),
    )
    lam = (
        "CASE WHEN t_tokens < 2 THEN 0"
        " ELSE CAST(ss AS DECIMAL(38,0)) * 1000000"
        " div (CAST(t_tokens AS DECIMAL(38,0)) * (t_tokens - 1)) END"
    )
    return s.selectExpr(
        "source",
        "d_vocab",
        "t_tokens",
        f"CAST({lam} AS BIGINT) AS simpson_lambda_micro",
        f"CAST(1000000 - {lam} AS BIGINT) AS gini_simpson_micro",
    ).orderBy("source")


@q(
    "t_flesch_readability",
    """
    WITH per_doc AS (
      SELECT source,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x != '')) AS BIGINT) AS w,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
                  AS BIGINT) AS y
      FROM documents
    ), agg AS (
      SELECT source, CAST(sum(w) AS BIGINT) AS words,
             CAST(sum(s) AS BIGINT) AS sentences,
             CAST(sum(y) AS BIGINT) AS syllables
      FROM per_doc GROUP BY source
    )
    SELECT source, words, sentences, syllables,
           CAST(206835
                - CAST(1015 AS HUGEINT) * words // sentences
                - CAST(84600 AS HUGEINT) * syllables // words
                AS BIGINT) AS flesch_milli
    FROM agg ORDER BY source
    """,
)
def t_flesch_readability(spark, sf_dir):
    """FLESCH READING-EASE per source on the milli lattice:
    206.835 - 1.015 (words/sentence) - 84.6 (syllables/word) — the
    classic curation readability feature (Gopher and friends gate on
    cousins of it). Sentences are counted as terminal-punctuation runs
    with a floor of ONE PER DOCUMENT (the fixture corpus carries no
    punctuation — pinned in the law test — so each document reads as
    one sentence, which is also the honest parse); syllables are the
    standard vowel-group proxy ([aeiou]+ runs).

    Integer form: words/sentences/vowel-group counts are exact; the
    two ratio terms are separate positive floor-divs off the 128-bit
    lattice (the subtraction happens after flooring — deterministic,
    identical both engines; no signed division). Scale shape: per-row
    regexp counting (codegen'd, no explode), one source-grain keyed
    aggregate."""
    (docs,) = _docs(spark, sf_dir)
    per_doc = docs.select(
        "source",
        F.expr(
            "CAST(size(filter(split(text, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("w"),
        F.expr(
            "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)),"
            " 1) AS BIGINT)"
        ).alias("s"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiou]+', 0))"
            " AS BIGINT)"
        ).alias("y"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("w").cast("long").alias("words"),
        F.sum("s").cast("long").alias("sentences"),
        F.sum("y").cast("long").alias("syllables"),
    )
    return agg.selectExpr(
        "source",
        "words",
        "sentences",
        "syllables",
        "CAST(206835"
        " - CAST(1015 AS DECIMAL(38,0)) * words div sentences"
        " - CAST(84600 AS DECIMAL(38,0)) * syllables div words"
        " AS BIGINT) AS flesch_milli",
    ).orderBy("source")


_MATTR_CHUNK = 50


@q(
    "t_mattr_chunked",
    f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents
    ), tok AS (
      -- series bound inherits the fixture text cap (ORACLE_TEXT_CAP)
      SELECT doc_id, source, (i - 1) // {_MATTR_CHUNK} AS chunk,
             ws[i] AS word
      FROM w, generate_series(1, 600) g(i)
      WHERE i <= len(ws) AND ws[i] != ''
    ), ch AS (
      SELECT doc_id, source, chunk,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT word) AS BIGINT) AS n_types
      FROM tok GROUP BY doc_id, source, chunk
    ), full_ch AS (
      SELECT source, n_types FROM ch WHERE n_tokens = {_MATTR_CHUNK}
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_types) AS BIGINT) AS sum_types,
           CAST(sum(n_types) * 1000000
                // (count(*) * {_MATTR_CHUNK}) AS BIGINT)
             AS mattr_micro
    FROM full_ch GROUP BY source ORDER BY source
    """,
)
def t_mattr_chunked(spark, sf_dir):
    """CHUNKED TYPE-TOKEN RATIO (the non-overlapping-window MATTR
    variant) per source: mean distinct-type share over fixed
    {_MATTR_CHUNK}-token chunks. Raw TTR is length-confounded (longer
    docs always score lower); fixing the window removes that, making
    sources comparable — the lexical-diversity dial that complements
    Simpson (dominance) and Chao1 (unseen mass). Partial trailing
    chunks are excluded (the standard treatment), so every chunk's
    denominator is the same constant.

    Integer form: chunk ids are positional floor-divs; type counts are
    exact; the mean leaves as one positive micro floor-div. Scale
    shape: one positional explode (per-row, codegen'd), one
    (doc, chunk, word)-implicit distinct via the (doc, chunk) keyed
    count-distinct aggregate, one source rollup."""
    (docs,) = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos0", "word"),
    ).filter(F.col("word") != "").select(
        "doc_id",
        "source",
        F.expr(f"pos0 div {_MATTR_CHUNK}").alias("chunk"),
        "word",
    )
    ch = tok.groupBy("doc_id", "source", "chunk").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("word").cast("long").alias("n_types"),
    )
    full_ch = ch.filter(F.col("n_tokens") == _MATTR_CHUNK)
    return (
        full_ch.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("n_types").cast("long").alias("sum_types"),
        )
        .selectExpr(
            "source",
            "n_chunks",
            "sum_types",
            f"CAST(sum_types * 1000000 div (n_chunks * {_MATTR_CHUNK})"
            " AS BIGINT) AS mattr_micro",
        )
        .orderBy("source")
    )


@q(
    "t_yule_k",
    """
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), wf AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word != '' GROUP BY source, word
    ), s AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS t_tokens,
             sum(CAST(c AS HUGEINT) * c) AS s2
      FROM wf GROUP BY source
    )
    SELECT source, t_tokens,
           CAST(CASE WHEN t_tokens = 0 THEN 0
                ELSE CAST(10000 AS HUGEINT) * (s2 - t_tokens) * 1000
                     // (CAST(t_tokens AS HUGEINT) * t_tokens) END
                AS BIGINT) AS yule_k_milli
    FROM s ORDER BY source
    """,
)
def t_yule_k(spark, sf_dir):
    """YULE'S CHARACTERISTIC K per source — the classical
    length-invariant repetitiveness constant 10^4 (S2 - T) / T^2 with
    S2 = sum c^2 (Yule 1944; the lexicometric ancestor of Simpson's
    lambda, scaled to be readable: human prose sits ~100-200, template
    spam rockets). K rises exactly when a source's token mass
    concentrates on few types — with Simpson (probability form), MATTR
    (windowed form), and Chao1 (unseen mass) this completes the
    richness dashboard.

    Integer form: S2/T are exact; K leaves as one positive milli
    floor-div with a quadratic 128-bit dividend. S2 itself is a
    quadratic-in-corpus 128-bit INTERNAL (sum c^2 crosses BIGINT at
    ~3e9 occurrences of one type — the round-10 headroom sweep
    flagged the old BIGINT output column at 3.65x; it now accumulates
    HUGEINT/DECIMAL(38,0) and only the bounded K quotient leaves,
    probed as t_yule_k__s2). Same single (source, word)-keyed plan as
    Chao1/Simpson — one scan, one explode, two keyed aggregates."""
    wf = _source_word_counts(spark, sf_dir)
    s = wf.groupBy("source").agg(
        F.sum("c").cast("long").alias("t_tokens"),
        F.expr("sum(CAST(c AS DECIMAL(38,0)) * c)").alias("s2"),
    )
    return s.selectExpr(
        "source",
        "t_tokens",
        "CAST(CASE WHEN t_tokens = 0 THEN 0"
        " ELSE CAST(10000 AS DECIMAL(38,0)) * (s2 - t_tokens) * 1000"
        " div (CAST(t_tokens AS DECIMAL(38,0)) * t_tokens) END"
        " AS BIGINT) AS yule_k_milli",
    ).orderBy("source")


def _corpus_health_sql() -> str:
    """Compose the round-10 corpus-statistics oracles (verbatim, as
    derived tables) into the one-row corpus-health certificate — the
    pipeline_eval_gate_e2e idiom applied to curation."""
    chao = REGISTRY["t_chao1_vocab_richness"][1]
    simp = REGISTRY["t_simpson_diversity"][1]
    fano = REGISTRY["t_burstiness_fano"][1]
    gt = REGISTRY["t_good_turing_counts"][1]
    fl = REGISTRY["t_flesch_readability"][1]
    mattr = REGISTRY["t_mattr_chunked"][1]
    return f"""
    SELECT c.min_coverage_permille, s.max_lambda_micro, b.max_fano_micro,
           g.gt1_r_star_micro, f.min_flesch_milli, m.min_mattr_micro,
           c.min_coverage_permille >= 900
             AND s.max_lambda_micro <= 100000
             AND b.max_fano_micro <= 3000000
             AND g.gt1_r_star_micro >= 500000
             AND f.min_flesch_milli >= 0
             AND m.min_mattr_micro >= 300000 AS healthy
    FROM (SELECT CAST(min(d_vocab * 1000000000 // chao1_micro) AS BIGINT)
              AS min_coverage_permille FROM ({chao})) c,
         (SELECT CAST(max(simpson_lambda_micro) AS BIGINT)
              AS max_lambda_micro FROM ({simp})) s,
         (SELECT CAST(max(fano_micro) AS BIGINT) AS max_fano_micro
          FROM ({fano})) b,
         (SELECT CAST(coalesce(max(CASE WHEN r = 1 THEN r_star_micro END),
                               0) AS BIGINT) AS gt1_r_star_micro
          FROM ({gt})) g,
         (SELECT CAST(min(flesch_milli) AS BIGINT) AS min_flesch_milli
          FROM ({fl})) f,
         (SELECT CAST(min(mattr_micro) AS BIGINT) AS min_mattr_micro
          FROM ({mattr})) m
    """


@q("pipeline_corpus_health_gate", _corpus_health_sql())
def pipeline_corpus_health_gate(spark, sf_dir):
    """CORPUS-HEALTH GATE — the one-row ship/block certificate a
    curation pipeline stamps on a corpus snapshot, composing the
    round-10 richness dashboard: sample coverage (observed vocabulary
    as a share of the Chao1 estimate — undersampled corpora fail),
    Simpson dominance (template floods fail), top-word burstiness
    (wholesale boilerplate injection fails), Good-Turing singleton
    value (hapax-noise-dominated corpora fail), Flesch floor
    (unreadable shards fail), and the chunked-TTR floor (repetition
    fails). The DuckDB oracle embeds the six component oracles
    VERBATIM as derived tables (the pipeline_eval_gate_e2e discipline),
    so the composed twin can never drift from its parts.

    Scale shape: six independent source-grain aggregates (each reusing
    its component's single-scan plan) reduced to 1-row frames and
    cross-joined — at 100 TB this is six passes that a production
    variant would fuse into two (the word-frequency scan is shared by
    four components); the gate itself is constant-size."""
    chao = t_chao1_vocab_richness(spark, sf_dir)
    simp = t_simpson_diversity(spark, sf_dir)
    fano = t_burstiness_fano(spark, sf_dir)
    gt = t_good_turing_counts(spark, sf_dir)
    fl = t_flesch_readability(spark, sf_dir)
    mattr = t_mattr_chunked(spark, sf_dir)
    c = chao.agg(
        F.expr(
            "CAST(min(d_vocab * 1000000000 div chao1_micro) AS BIGINT)"
        ).alias("min_coverage_permille")
    )
    s = simp.agg(
        F.max("simpson_lambda_micro").cast("long").alias(
            "max_lambda_micro"
        )
    )
    b = fano.agg(
        F.max("fano_micro").cast("long").alias("max_fano_micro")
    )
    g = gt.agg(
        F.expr(
            "CAST(coalesce(max(CASE WHEN r = 1 THEN r_star_micro END), 0)"
            " AS BIGINT)"
        ).alias("gt1_r_star_micro")
    )
    f = fl.agg(
        F.min("flesch_milli").cast("long").alias("min_flesch_milli")
    )
    m = mattr.agg(
        F.min("mattr_micro").cast("long").alias("min_mattr_micro")
    )
    out = (
        c.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(f))
        .crossJoin(F.broadcast(m))
    )
    return out.selectExpr(
        "min_coverage_permille",
        "max_lambda_micro",
        "max_fano_micro",
        "gt1_r_star_micro",
        "min_flesch_milli",
        "min_mattr_micro",
        "min_coverage_permille >= 900"
        " AND max_lambda_micro <= 100000"
        " AND max_fano_micro <= 3000000"
        " AND gt1_r_star_micro >= 500000"
        " AND min_flesch_milli >= 0"
        " AND min_mattr_micro >= 300000 AS healthy",
    )


# ---------------------------------------------------------------------------
# Round-10 batch 8: corpus-composition signals — code-likeness, hapax/
# Guiraud richness ratios, ARI readability.
# ---------------------------------------------------------------------------


@q(
    "t_code_ratio",
    """
    WITH d AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS len,
             CAST(length(text)
                  - length(regexp_replace(text, '[{}();=<>]', '', 'g'))
                  AS BIGINT) AS cc
      FROM documents WHERE length(text) > 0
    ), scored AS (
      SELECT source, len, cc,
             CASE WHEN cc * 1000 // len >= 20 THEN 1 ELSE 0 END AS codey
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(cc) AS BIGINT) AS code_chars,
           CAST(sum(cc) * 1000 // sum(len) AS BIGINT)
               AS density_permille,
           CAST(sum(codey) AS BIGINT) AS n_codey,
           CAST(sum(codey) * 1000 // count(*) AS BIGINT)
               AS codey_permille
    FROM scored GROUP BY source ORDER BY source
    """,
)
def t_code_ratio(spark, sf_dir):
    """CODE-LIKENESS profile per source — the prose-vs-code mix dial
    every LLM data recipe needs (code is upweighted or routed to its
    own mixture bucket; prose pipelines treat high-symbol docs as
    boilerplate): per document the density of code-signal characters
    {}();=<> over total length, a doc flagged codey at >= 2% density
    (fixed literal), rolled up to per-source density and codey rate.

    Integer form: character counts via ONE regexp_replace strip per
    doc (a fixed character class — identical RE semantics on both
    engines); every ratio is a positive floor-div on the permille
    lattice. Scale shape: embarrassingly parallel per-row projection,
    one source-grain keyed aggregate (5 groups) — the t_quality_score
    class."""
    (docs,) = _docs(spark, sf_dir)
    d = docs.where(F.length("text") > 0).select(
        "source",
        F.length("text").cast("long").alias("len"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[{}();=<>]", ""))
        )
        .cast("long")
        .alias("cc"),
    )
    scored = d.selectExpr(
        "source",
        "len",
        "cc",
        "CASE WHEN cc * 1000 div len >= 20 THEN 1 ELSE 0 END AS codey",
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("cc").cast("long").alias("code_chars"),
            F.expr("CAST(sum(cc) * 1000 div sum(len) AS BIGINT)").alias(
                "density_permille"
            ),
            F.sum("codey").cast("long").alias("n_codey"),
            F.expr(
                "CAST(sum(codey) * 1000 div count(*) AS BIGINT)"
            ).alias("codey_permille"),
        )
        .orderBy("source")
    )


@q(
    "t_hapax_guiraud",
    """
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), wf AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word != '' GROUP BY source, word
    ), s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS d_vocab,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(c) AS BIGINT) AS n_tokens
      FROM wf GROUP BY source
    )
    SELECT source, n_tokens, d_vocab, f1,
           CAST(f1 * 1000 // d_vocab AS BIGINT) AS hapax_permille,
           CAST(CAST(d_vocab AS HUGEINT) * d_vocab * 1000000 // n_tokens
                AS BIGINT) AS guiraud2_micro
    FROM s ORDER BY source
    """,
)
def t_hapax_guiraud(spark, sf_dir):
    """HAPAX RATIO and (squared) GUIRAUD'S R per source — the two
    classic vocabulary-richness RATIOS next to t_chao1_vocab_richness's
    unseen-mass estimate: hapax share f1/V (how much of the vocabulary
    is one-shot — high in fresh crawl, low in boilerplate farms) and
    Guiraud's R = V/sqrt(N), the length-robust richness index,
    reported SQRT-FREE as R^2 = V^2/N in micro units (the Welch
    discipline: comparisons square too).

    Integer form: rides the SHARED (source, word, c) frequency frame
    (_source_word_counts — one explode + keyed count for the whole
    richness dashboard); both ratios are single positive floor-divs;
    V^2 is quadratic in vocabulary size (~1e24 at a 1e12-type corpus)
    so it rides the 128-bit lattice (headroom probe guiraud__v2).

    Scale shape: the Chao1 shape exactly — word-grain keyed aggregate
    (map-side combined), source-grain rollup."""
    wf = _source_word_counts(spark, sf_dir)
    s = wf.groupBy("source").agg(
        F.count("*").cast("long").alias("d_vocab"),
        F.sum(F.expr("CASE WHEN c = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("f1"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    return s.selectExpr(
        "source",
        "n_tokens",
        "d_vocab",
        "f1",
        "CAST(f1 * 1000 div d_vocab AS BIGINT) AS hapax_permille",
        "CAST(CAST(d_vocab AS DECIMAL(38,0)) * d_vocab * 1000000"
        " div n_tokens AS BIGINT) AS guiraud2_micro",
    ).orderBy("source")


@q(
    "t_ari_readability",
    """
    WITH d AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS c,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x != '')) AS BIGINT) AS w,
             greatest(CAST(1 AS BIGINT),
                      CAST(length(text)
                           - length(regexp_replace(text, '[.!?]', '', 'g'))
                           AS BIGINT)) AS s
      FROM documents WHERE length(text) > 0
    ), scored AS (
      SELECT source,
             4710 * c // w + 500 * w // s - 21430 AS ari_milli
      FROM d WHERE w > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN sum(ari_milli) >= 0
                THEN sum(ari_milli) // count(*)
                ELSE -((-sum(ari_milli)) // count(*)) END AS BIGINT)
               AS mean_ari_milli,
           CAST(sum(CASE WHEN ari_milli > 14000 THEN 1 ELSE 0 END)
                * 1000 // count(*) AS BIGINT) AS hard_permille
    FROM scored GROUP BY source ORDER BY source
    """,
)
def t_ari_readability(spark, sf_dir):
    """AUTOMATED READABILITY INDEX per source — the character-based
    grade-level formula next to t_flesch_readability's syllable proxy
    (ARI needs only chars/words/sentences, so it is the readability
    score that stays EXACT on the integer lattice with no vowel-run
    heuristic): ARI = 4.71*chars/words + 0.5*words/sentences - 21.43,
    per doc in milli, averaged per source, with the share of docs
    above grade 14 (college — the 'too dense for general pretraining'
    flag).

    Integer form: chars/words/sentences are exact counts (words =
    nonempty space tokens, the corpus-wide idiom; sentences = .!?
    characters floored at 1); each doc's ARI is two positive
    floor-divs on the milli lattice minus the literal; the source
    MEAN divides the signed sum with the sign OUTSIDE (ARI goes
    negative on telegraphic text — floor-vs-truncate discipline).

    Scale shape: per-row projection, one source-grain keyed
    aggregate."""
    (docs,) = _docs(spark, sf_dir)
    d = docs.where(F.length("text") > 0).select(
        "source",
        F.length("text").cast("long").alias("c"),
        F.expr(
            "CAST(size(filter(split(text, ' '), x -> x != ''))"
            " AS BIGINT)"
        ).alias("w"),
        F.expr(
            "greatest(CAST(1 AS BIGINT),"
            " CAST(length(text)"
            " - length(regexp_replace(text, '[.!?]', '')) AS BIGINT))"
        ).alias("s"),
    )
    scored = d.where(F.col("w") > 0).selectExpr(
        "source",
        "4710 * c div w + 500 * w div s - 21430 AS ari_milli",
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr(
                "CAST(CASE WHEN sum(ari_milli) >= 0"
                " THEN sum(ari_milli) div count(*)"
                " ELSE -((-sum(ari_milli)) div count(*)) END AS BIGINT)"
            ).alias("mean_ari_milli"),
            F.expr(
                "CAST(sum(CASE WHEN ari_milli > 14000 THEN 1 ELSE 0 END)"
                " * 1000 div count(*) AS BIGINT)"
            ).alias("hard_permille"),
        )
        .orderBy("source")
    )


@q(
    "t_honore_r",
    """
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ), wf AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word != '' GROUP BY source, word
    ), s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS d_vocab,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(c) AS BIGINT) AS n_tokens
      FROM wf GROUP BY source
    )
    SELECT source, n_tokens, d_vocab, f1,
           CAST(CASE WHEN f1 = d_vocab THEN 0
                ELSE CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000)
                          AS BIGINT) * 100000
                     // (1000000 - f1 * 1000000 // d_vocab) END
               AS BIGINT) AS honore_r_milli
    FROM s ORDER BY source
    """,
)
def t_honore_r(spark, sf_dir):
    """HONORE'S R vocabulary-richness statistic per source —
    R = 100 * ln(N) / (1 - V1/V), the hapax-weighted richness index
    that grows when one-shot vocabulary dominates (completing the
    richness dashboard next to t_chao1_vocab_richness's unseen-mass
    bound and t_hapax_guiraud's plain ratios): high R = productive,
    fresh text; low R = closed, repetitive vocabulary.

    Integer form: rides the SHARED (source, word, c) frequency frame;
    ln(N) lands on the micro-nat lattice via ONE fixed-shape double of
    an exact count (the KM/BM25 discipline); the hapax fraction is a
    positive floor-div to micro; one more positive floor-div lands R
    in milli. The all-hapax pole (V1 = V, R undefined) reports the 0
    certificate rather than a division by zero — documented boundary,
    pinned in the law test.

    Scale shape: the Chao1 shape — word-grain keyed aggregate
    (map-side combined), source-grain rollup, per-row arithmetic."""
    wf = _source_word_counts(spark, sf_dir)
    s = wf.groupBy("source").agg(
        F.count("*").cast("long").alias("d_vocab"),
        F.sum(F.expr("CASE WHEN c = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("f1"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    return s.selectExpr(
        "source",
        "n_tokens",
        "d_vocab",
        "f1",
        "CAST(CASE WHEN f1 = d_vocab THEN 0"
        " ELSE CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000)"
        " AS BIGINT) * 100000"
        " div (1000000 - f1 * 1000000 div d_vocab) END"
        " AS BIGINT) AS honore_r_milli",
    ).orderBy("source")
