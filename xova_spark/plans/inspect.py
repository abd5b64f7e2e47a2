"""Physical-plan introspection — the engine's ".explain and iterate"
discipline as testable assertions.

The reference hand-builds its dataflow graphs, so its "plan" is the
code itself; here Catalyst owns the plan, and what we own is VERIFYING
the plan has the shape a 100 TB run needs: filters pushed into the
parquet scan, dimension joins broadcast (never sort-merge), column
pruning reaching the reader, aggregation pipelines inside whole-stage
codegen, and no more exchanges than the shuffle structure demands.
tests/test_plans.py pins these properties for the headline queries so a
regression in plan shape fails CI exactly like a wrong result would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    # Scan metadata (PushedFilters/ReadSchema lists) is truncated at 100
    # chars by default, which can swallow the closing bracket.
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


def _current_plan(df: DataFrame) -> str:
    """The current/final plan only: an executed AdaptiveSparkPlan's
    toString appends an '== Initial Plan ==' section — counting node
    names over the whole string would double-count and see pre-AQE
    shapes (e.g. a shuffle join AQE already converted to broadcast)."""
    return executed_plan(df).split("== Initial Plan ==")[0]


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges (SinglePartition collects excluded)."""
    return len(re.findall(r"Exchange hashpartitioning", _current_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    text = _current_plan(df)
    return text.count("BroadcastHashJoin") + text.count("BroadcastNestedLoopJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return _current_plan(df).count("SortMergeJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the parquet reader (S3's TAQL-pushdown
    analogue — free from Catalyst when the plan is declarative)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read per scan (S2 column pruning)."""
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        scans.append(cols)
    return scans


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage codegen regions — fewer, wider spans mean
    more of the pipeline runs as generated JVM loops. Uses the codegen
    explain mode (which actually generates the code, independent of
    AQE finalization)."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")  # AQE wraps the plan; codegen explain
    try:  # needs the raw physical tree, so re-plan without it
        from pyspark.sql import functions as F

        replanned = df.where(F.lit(True))
        text = spark._jvm.PythonSQLUtils.explainString(
            replanned._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set(key, old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of EXPLICIT broadcast hints in the analyzed logical plan.

    A forced hint overrides AQE's size-based strategy choice, so a hint
    on anything that scales with the input (row -> bin maps, per-output-
    bin dims) is a 100 TB OOM, not a slow plan. Tests pin the row-scale
    joins to zero hints; only genuinely bounded dims may carry one."""
    text = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", text))


def plan_stats(df: DataFrame) -> dict:
    return {
        "exchanges": exchange_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "sortmerge_joins": sortmerge_join_count(df),
        "codegen_spans": wholestage_codegen_spans(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schema_columns(df),
    }
