"""Full-registry executed-plan audit — the anti-pattern sweep.

Builds every ``__spark_entry__.queries()`` entry's physical plan at
sf0.001 and reports queries whose plans contain scale anti-patterns.
Mostly plan-build only, but NOT side-effect free: entries whose query
function trains driver-side models (the PQ/IVF family runs counts and a
size-gated training collect while constructing the plan) and the
streaming entries (which run their availableNow trigger to a memory
sink) do execute real Spark jobs during the sweep.

- ``Expand``             multi-distinct / grouping-set row multiplication
- ``CartesianProduct``   unkeyed all-pairs join
- ``BroadcastNestedLoopJoin``  non-equi or OR-keyed join fallback
- ``BatchEvalPython``    row-at-a-time (non-Arrow) Python evaluation

Round-4 findings (both fixed): mm_phash_neardup_pairs' OR-band join
planned as an all-pairs BNLJ; ev_active_users_rolling's three mixed
countDistincts planned an Expand over the 30x-replicated user-day rows.

DECLARED survivors (legitimate, do not "fix"):
- Expand in agg_rollup/agg_cube/agg_grouping_sets (inherent to the op)
  and agg_count_distinct (the named multi-distinct demonstration).
- BNLJ rows that are broadcast cross joins against 1-row aggregates or
  K-row model dims, plus the declared brute-force recall oracles
  (ann_cosine_topk et al.).
- BatchEvalPython in udtf_word_bigrams (the declared Python-UDTF
  surface).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

PATTERNS = (
    "Expand",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
)


def main() -> int:
    from xova_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    hits: dict[str, list[str]] = {p: [] for p in PATTERNS}
    errors: list[tuple[str, str]] = []
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors.append((name, f"{type(e).__name__}: {e}"))
            continue
        for pat in PATTERNS:
            if pat in plan:
                hits[pat].append(name)
    for pat in PATTERNS:
        print(f"{pat}: {len(hits[pat])}")
        for n in hits[pat]:
            print(f"  {n}")
    if errors:
        print(f"plan errors: {len(errors)}")
        for n, e in errors[:20]:
            print(f"  {n}: {e}")
    from xova_spark.sharedframes import clear_shared

    clear_shared()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
