"""Entity resolution (record linkage) over the customer dimension —
blocking-key candidate generation, string-similarity scoring
(Levenshtein), and transitive merge-group assignment.

The classic ER pipeline shape: an all-pairs name comparison is
O(n^2) and impossible at scale, so candidates come from an equi-join
on a BLOCKING KEY whose bucket size is bounded by construction (here:
the name minus its last two digits — at most 100 names per bucket, so
per-bucket pair fanout is a constant <= C(100,2) regardless of table
size). Scoring is Spark's built-in ``levenshtein`` (JVM codegen, same
semantics as DuckDB's) — the one string-similarity join family the
rest of the registry lacks. Merge groups reuse the shared
connected-components engine (``dedup.cc_components``: driver union-find
under the size gate, iterative min-label propagation above it).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xova_spark.queries.dedup import cc_components
from xova_spark.session import load_tables
from xova_spark.sharedframes import shared

REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# Last two name digits vary within a block: bucket size <= 100 always.
BLOCK_PREFIX_LEN = 16
MAX_NAME_DIST = 1

# Cents integerization idiom (ADVICE r5): this pack uses round(x*100) on
# both engines, while agg_skyline_pareto uses floor(x*100+0.5). round()
# is safe HERE because both engines round DOUBLES half-away-from-zero
# (Spark F.round = HALF_UP on the double path; DuckDB round(double)
# likewise), including negative c_acctbal — and the ER entries only
# DIFFERENCE the cents values pairwise, so even a shared representation
# error cancels. The skyline entry avoids round() because it feeds the
# integerized value into a cross-row dominance comparison where a single
# half-mode disagreement flips a Pareto verdict; floor(x*100+0.5) there
# is a belt-and-braces choice for positive-only values, not evidence
# that round() diverges. One idiom per risk profile, both documented.

_DUCK_PAIRS = f"""
    c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
             substr(c_name, 1, {BLOCK_PREFIX_LEN}) AS bkey
      FROM customer
    ), cand AS (
      SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
             levenshtein(a.c_name, b.c_name) AS name_dist,
             CAST(a.c_nationkey = b.c_nationkey AS INTEGER) AS same_nation,
             abs(a.bal_cents - b.bal_cents) AS bal_diff_cents
      FROM c a JOIN c b
        ON a.bkey = b.bkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= {MAX_NAME_DIST}
    )
"""


@q(
    "er_blocked_candidates",
    f"""
    WITH {_DUCK_PAIRS}
    SELECT cust_a, cust_b, CAST(name_dist AS BIGINT) AS name_dist,
           CAST(same_nation AS BIGINT) AS same_nation,
           CAST(bal_diff_cents AS BIGINT) AS bal_diff_cents
    FROM cand
    """,
)
def er_blocked_candidates(spark, sf_dir):
    """Candidate duplicate-customer pairs: same blocking key (name
    prefix) and market segment, Levenshtein name distance <=
    ``MAX_NAME_DIST``, scored with nation agreement and the exact
    account-balance delta in cents (integer — no float in the output).

    Scale shape: ONE equi-join on (bkey, mktsegment) — the shuffle is
    keyed, never all-pairs; within-bucket fanout is capped at C(100,2)
    by the key design, so candidate volume grows linearly with
    customers. The Levenshtein filter runs inside the join's codegen
    stage. Duplicate-heavy caveat (measured: the round-5 sf1 fixture
    accidentally carried 10 copies of every name and this join went
    79x for 10x data): blocking caps DISTINCT-name bucket width, not
    exact-duplicate multiplicity — a corpus with heavy exact dupes
    needs the standard MDM pre-pass (group identical (name, segment)
    records first, fuzzy-match the representatives; dedup_exact is
    that pass on the document side)."""
    # COMMON-PREFIX STRIPPING (the join_levenshtein_blocked lever):
    # every candidate pair shares its exact BLOCK_PREFIX_LEN-char name
    # prefix (the join key IS that prefix; a shorter name makes the
    # block the whole name, and equal blocks then force equal
    # prefixes), and Levenshtein is invariant under a shared prefix —
    # lev(P+s1, P+s2) == lev(s1, s2) — so the join carries only the
    # suffix beyond the block and the per-pair DP runs on ~2 chars
    # instead of ~18. Same name_dist for every input, bit-for-bit.
    c = load_tables(spark, sf_dir, ("customer",))["customer"].select(
        "c_custkey",
        F.expr(f"substr(c_name, {BLOCK_PREFIX_LEN + 1})").alias("sfx"),
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        F.substring("c_name", 1, BLOCK_PREFIX_LEN).alias("bkey"),
    )
    a = c.alias("a")
    b = c.alias("b")
    dist = F.levenshtein(F.col("a.sfx"), F.col("b.sfx"))
    return (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(dist <= MAX_NAME_DIST)
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            dist.cast("long").alias("name_dist"),
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            .cast("long")
            .alias("same_nation"),
            F.abs(F.col("a.bal_cents") - F.col("b.bal_cents")).alias(
                "bal_diff_cents"
            ),
        )
    )


def _entity_assignment(spark, sf_dir):
    """The resolved (c_custkey, entity_id) cluster assignment, built
    ONCE per (session, sf_dir) and persisted via the sharedframes
    registry (VERDICT r9 item 5): er_entity_clusters, er_survivorship,
    and er_cluster_conflict_rate all consume the same union-find
    closure, and each used to rebuild candidate generation + CC from
    scratch — three identical collects in one gate run. Same lifecycle
    as the dedup CC path: clear_shared() releases it at gate exit."""

    def build():
        pairs = er_blocked_candidates(spark, sf_dir).select(
            F.col("cust_a").alias("doc_a"), F.col("cust_b").alias("doc_b")
        )
        return cc_components(
            spark, pairs, id_col="c_custkey"
        ).withColumnRenamed("component", "entity_id")

    return shared(spark, ("er_asg", os.path.abspath(sf_dir)), build)


@q(
    "er_entity_clusters",
    f"""
    WITH RECURSIVE {_DUCK_PAIRS},
    edges AS (
      SELECT cust_a AS src, cust_b AS dst FROM cand
      UNION
      SELECT cust_b AS src, cust_a AS dst FROM cand
    ), reach AS (
      SELECT DISTINCT src AS c_custkey, src AS comp FROM edges
      UNION
      SELECT e.dst AS c_custkey, r.comp
      FROM reach r JOIN edges e ON e.src = r.c_custkey
    ), asg AS (
      SELECT c_custkey, min(comp) AS entity_id
      FROM reach GROUP BY c_custkey
    )
    SELECT a.c_custkey, a.entity_id,
           CAST(count(*) OVER (PARTITION BY a.entity_id) AS BIGINT)
               AS entity_size
    FROM asg a
    """,
)
def er_entity_clusters(spark, sf_dir):
    """Transitive merge groups over the candidate pairs: every matched
    customer mapped to its entity (min custkey of the connected
    component) plus the component size — the survivorship input (keep
    one golden record per entity).

    Scale shape: candidate generation as in er_blocked_candidates;
    components via the shared size-gated CC engine (driver union-find
    here, min-label propagation at scale); the size column is a window
    count PARTITIONED on entity_id — one keyed shuffle, no broadcast of
    the unbounded entity table."""
    from pyspark.sql import Window

    asg = _entity_assignment(spark, sf_dir)
    return asg.select(
        "c_custkey",
        "entity_id",
        F.count("*")
        .over(Window.partitionBy("entity_id"))
        .cast("long")
        .alias("entity_size"),
    )


@q(
    "er_survivorship",
    f"""
    WITH RECURSIVE {_DUCK_PAIRS},
    edges AS (
      SELECT cust_a AS src, cust_b AS dst FROM cand
      UNION
      SELECT cust_b AS src, cust_a AS dst FROM cand
    ), reach AS (
      SELECT DISTINCT src AS c_custkey, src AS comp FROM edges
      UNION
      SELECT e.dst AS c_custkey, r.comp
      FROM reach r JOIN edges e ON e.src = r.c_custkey
    ), asg AS (
      SELECT c_custkey, min(comp) AS entity_id
      FROM reach GROUP BY c_custkey
    ), members AS (
      SELECT a.entity_id, c.c_custkey, c.bal_cents
      FROM asg a JOIN c ON c.c_custkey = a.c_custkey
    ), best AS (
      SELECT entity_id, max(bal_cents) AS max_bal_cents,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
      FROM members GROUP BY entity_id
    )
    SELECT b.entity_id, min(m.c_custkey) AS survivor_key,
           b.n_members, b.max_bal_cents, b.total_bal_cents
    FROM best b
    JOIN members m
      ON m.entity_id = b.entity_id AND m.bal_cents = b.max_bal_cents
    GROUP BY b.entity_id, b.n_members, b.max_bal_cents, b.total_bal_cents
    """,
)
def er_survivorship(spark, sf_dir):
    """Golden-record selection per merged entity: the survivor is the
    member with the highest account balance (ties broken by lowest
    custkey — a fully deterministic rule expressed as max-then-min so
    both engines agree without relying on engine-specific arg_max tie
    semantics), alongside member count and the exact balance rollup in
    cents.

    Scale shape: everything after candidate generation is entity-grain;
    the survivor pick is one keyed max + one keyed min — no windows, no
    sorts over the full dimension."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"].select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    asg = _entity_assignment(spark, sf_dir)
    members = asg.join(c, "c_custkey")
    best = members.groupBy("entity_id").agg(
        F.max("bal_cents").alias("max_bal_cents"),
        F.count("*").cast("long").alias("n_members"),
        F.sum("bal_cents").cast("long").alias("total_bal_cents"),
    )
    return (
        best.join(
            members.select(
                "entity_id", "c_custkey", F.col("bal_cents").alias("mb")
            ),
            (F.col("mb") == F.col("max_bal_cents"))
            & (members["entity_id"] == best["entity_id"]),
        )
        .drop(members["entity_id"])
        .groupBy("entity_id", "n_members", "max_bal_cents", "total_bal_cents")
        .agg(F.min("c_custkey").alias("survivor_key"))
        .select(
            "entity_id",
            "survivor_key",
            "n_members",
            "max_bal_cents",
            "total_bal_cents",
        )
    )


@q(
    "er_blocking_recall",
    f"""
    WITH {_DUCK_PAIRS},
    ph AS (
      SELECT c_custkey, c_name, c_mktsegment,
             substr(c_name, 10, 4) AS h1, substr(c_name, 14, 5) AS h2
      FROM customer
    ), pa AS (
      SELECT a.c_custkey AS x, b.c_custkey AS y
      FROM ph a JOIN ph b
        ON a.h1 = b.h1 AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= {MAX_NAME_DIST}
    ), pb AS (
      SELECT a.c_custkey AS x, b.c_custkey AS y
      FROM ph a JOIN ph b
        ON a.h2 = b.h2 AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= {MAX_NAME_DIST}
    ), truth AS (
      SELECT DISTINCT x, y FROM (SELECT * FROM pa UNION SELECT * FROM pb)
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_blocked_pairs,
           CAST((SELECT count(*) FROM cand) * 1000
                // greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
               AS recall_permille
    """,
)
def er_blocking_recall(spark, sf_dir):
    """HONEST RECALL of the prefix blocking strategy, measured against
    the EXACT distance<=1 same-segment pair set — computed scalably, not
    by brute force: names are fixed-length, so a Levenshtein-1 pair is
    exactly one substitution and must agree on at least ONE of the two
    suffix halves (pigeonhole). Two blocking passes (first-half key,
    second-half key) therefore enumerate the complete truth set with
    equi-joins only; their union is deduplicated and the single-prefix
    candidate count is ratioed against it.

    This is the dedup pack's recall-law discipline
    (dedup_lsh_recall_vs_exact) applied to ER: every bucketed candidate
    generator ships with a measured, exactly-computed recall — here
    exposing that one-pass prefix blocking misses the pairs whose edit
    falls inside the block key.

    Scale note: the first-half key is coarse (10^4 buckets over a dense
    9-digit key space caps buckets at 10^5 names); a production pass
    over wider tables uses more, narrower halves (k+1 pieces for
    distance k) — the pigeonhole guarantee is the same."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"].select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.substring("c_name", 10, 4).alias("h1"),
        F.substring("c_name", 14, 5).alias("h2"),
    )

    def pass_pairs(key: str):
        a, b = c.alias("a"), c.alias("b")
        return (
            a.join(
                b,
                (F.col(f"a.{key}") == F.col(f"b.{key}"))
                & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .where(
                F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
                <= MAX_NAME_DIST
            )
            .select(
                F.col("a.c_custkey").alias("x"), F.col("b.c_custkey").alias("y")
            )
        )

    truth = pass_pairs("h1").union(pass_pairs("h2")).distinct()
    n_true = truth.agg(F.count("*").cast("long").alias("n_true_pairs"))
    n_blocked = er_blocked_candidates(spark, sf_dir).agg(
        F.count("*").cast("long").alias("n_blocked_pairs")
    )
    return (
        n_true.crossJoin(n_blocked)
        .select(
            "n_true_pairs",
            "n_blocked_pairs",
            F.expr(
                "n_blocked_pairs * 1000 div greatest(n_true_pairs, 1)"
            ).alias("recall_permille"),
        )
    )


def grouped_candidate_pairs(cust):
    """Exact-match pre-grouping pass (the MDM mitigation measured in
    SCALE.md): collapse records sharing (c_name, c_mktsegment) to ONE
    representative (min custkey) carrying the group size, then run the
    same blocked fuzzy join at REPRESENTATIVE grain. Candidate volume
    is now a function of DISTINCT names only — exact-duplicate
    multiplicity k contributes a k-free rep-pair count (the ungrouped
    join contributes k^2 record pairs per matching name pair; the sf1
    generator artifact that went 79x in round 5 was exactly this).
    pair_multiplicity = n_rec_a * n_rec_b preserves the record-pair
    accounting without materializing it.

    Takes the raw customer frame so the duplicate-heavy law test
    (tests/test_erq.py) can feed a synthetic k-copies blow-up through
    the PRODUCTION logic, not a replica."""
    # Same common-prefix strip as er_blocked_candidates: joined pairs
    # share the bkey prefix exactly, so the DP runs on the suffixes.
    g = (
        cust.groupBy("c_name", "c_mktsegment")
        .agg(
            F.min("c_custkey").alias("rep_key"),
            F.count("*").alias("n_records"),
        )
        .withColumn("bkey", F.substring("c_name", 1, BLOCK_PREFIX_LEN))
        .withColumn("sfx", F.expr(f"substr(c_name, {BLOCK_PREFIX_LEN + 1})"))
        .drop("c_name")
    )
    a, b = g.alias("a"), g.alias("b")
    dist = F.levenshtein(F.col("a.sfx"), F.col("b.sfx"))
    return (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.rep_key") < F.col("b.rep_key")),
        )
        .where(dist <= MAX_NAME_DIST)
        .select(
            F.col("a.rep_key").alias("rep_a"),
            F.col("b.rep_key").alias("rep_b"),
            dist.cast("long").alias("name_dist"),
            F.col("a.n_records").cast("long").alias("n_rec_a"),
            F.col("b.n_records").cast("long").alias("n_rec_b"),
            (F.col("a.n_records") * F.col("b.n_records"))
            .cast("long")
            .alias("pair_multiplicity"),
        )
    )


@q(
    "er_blocked_candidates_grouped",
    f"""
    WITH g AS (
      SELECT c_name, c_mktsegment,
             min(c_custkey) AS rep_key,
             count(*) AS n_records,
             substr(c_name, 1, {BLOCK_PREFIX_LEN}) AS bkey
      FROM customer
      GROUP BY c_name, c_mktsegment
    )
    SELECT a.rep_key AS rep_a, b.rep_key AS rep_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist,
           CAST(a.n_records AS BIGINT) AS n_rec_a,
           CAST(b.n_records AS BIGINT) AS n_rec_b,
           CAST(a.n_records * b.n_records AS BIGINT) AS pair_multiplicity
    FROM g a JOIN g b
      ON a.bkey = b.bkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.rep_key < b.rep_key
    WHERE levenshtein(a.c_name, b.c_name) <= {MAX_NAME_DIST}
    """,
)
def er_blocked_candidates_grouped(spark, sf_dir):
    """er_blocked_candidates with the EXACT-MATCH PRE-GROUPING pass
    (VERDICT r5 item 4) — the standard MDM mitigation for the
    duplicate-heavy-block hazard the round-5 sf1 run proved: blocking
    caps DISTINCT-name bucket width, but k exact copies of every name
    still multiply record-pair volume by k^2 inside each block. Here
    records sharing (c_name, c_mktsegment) collapse to one
    representative first, so the fuzzy Levenshtein join runs at
    DISTINCT-name grain — candidate count is invariant under copy
    multiplicity (measured law in tests/test_erq.py: k=3 copies leave
    the rep-pair count bit-identical while the ungrouped join grows
    >= k^2) — and pair_multiplicity carries the exact record-pair
    accounting. One extra keyed shuffle (the pre-group) buys a
    hub-proof candidate stage; at 100 TB the pre-group is the same
    groupBy the dedup_exact pass already runs."""
    cust = load_tables(spark, sf_dir, ("customer",))["customer"]
    return grouped_candidate_pairs(cust)


@q(
    "er_cluster_conflict_rate",
    f"""
    WITH RECURSIVE {_DUCK_PAIRS},
    edges AS (
      SELECT cust_a AS src, cust_b AS dst FROM cand
      UNION
      SELECT cust_b AS src, cust_a AS dst FROM cand
    ), reach AS (
      SELECT DISTINCT src AS c_custkey, src AS comp FROM edges
      UNION
      SELECT e.dst AS c_custkey, r.comp
      FROM reach r JOIN edges e ON e.src = r.c_custkey
    ), asg AS (
      SELECT c_custkey, min(comp) AS entity_id
      FROM reach GROUP BY c_custkey
    ), ent AS (
      SELECT a.entity_id,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(count(DISTINCT c.c_nationkey) AS BIGINT) AS n_nations,
             CAST(count(DISTINCT c.c_mktsegment) AS BIGINT) AS n_segments
      FROM asg a JOIN c ON c.c_custkey = a.c_custkey
      GROUP BY a.entity_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_entities,
           CAST(sum(CASE WHEN n_nations > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nation_conflicts,
           CAST(sum(CASE WHEN n_segments > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_segment_conflicts,
           CAST(sum(CASE WHEN n_nations > 1 THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS nation_conflict_permille,
           CAST(max(n_members) AS BIGINT) AS max_entity_size
    FROM ent WHERE n_members >= 2
    """,
)
def er_cluster_conflict_rate(spark, sf_dir):
    """MERGE-QUALITY audit over the resolved entities — the QA table an
    MDM pipeline reads before trusting survivorship: for every
    multi-member entity, do the merged records AGREE on the fields the
    match rule did not enforce? Nation was only SCORED (same_nation is
    a feature, not a blocking predicate), so nation conflicts measure
    real over-merging; market segment was part of the blocking key and
    equality is transitive, so segment conflicts are IMPOSSIBLE by
    construction — reported anyway as the structural zero that proves
    the closure respected the key (law-tested).

    Scale shape: everything after candidate generation is entity-grain
    (keyed count-distincts over cluster members, a 1-row rollup);
    count(DISTINCT) over two low-cardinality fields rides the same
    keyed aggregate — no windows, no broadcasts of unbounded tables."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"].select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    asg = _entity_assignment(spark, sf_dir)
    # size(collect_set(...)), not countDistinct x2: two count-distincts
    # in one aggregate plan an Expand (row multiplication at member
    # grain — the dq_profile lesson); the sets here are bounded by the
    # 25-nation / 5-segment dimensions, so collect_set is O(1) state
    # per group and the plan stays a plain keyed aggregate.
    ent = (
        asg.join(c, "c_custkey")
        .groupBy("entity_id")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.size(F.collect_set("c_nationkey"))
            .cast("long")
            .alias("n_nations"),
            F.size(F.collect_set("c_mktsegment"))
            .cast("long")
            .alias("n_segments"),
        )
    )
    return (
        ent.filter(F.col("n_members") >= 2)
        .agg(
            F.count("*").cast("long").alias("n_entities"),
            F.sum(F.when(F.col("n_nations") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_nation_conflicts"),
            F.sum(F.when(F.col("n_segments") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_segment_conflicts"),
        )
        .selectExpr(
            "n_entities",
            "n_nation_conflicts",
            "n_segment_conflicts",
            "CAST(n_nation_conflicts * 1000 div n_entities AS BIGINT)"
            " AS nation_conflict_permille",
        )
        .crossJoin(
            F.broadcast(
                ent.filter(F.col("n_members") >= 2).agg(
                    F.max("n_members").cast("long").alias("max_entity_size")
                )
            )
        )
    )
