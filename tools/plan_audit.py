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
- unpartitioned ``Window``  global-sort single-partition window (the
  WindowExec "No Partition Defined" hazard) — detected structurally: a
  Window operator line whose spec has no partition bracket group.
  Survivors must operate on BOUNDED-row inputs (top-K-limited frames,
  decile/SPW-grain aggregates), never a data-grain table; the
  user/vocab-grain sites were rewritten round 5 onto orderBy+limit
  (TakeOrderedAndProject) or operators/ranking.global_ntile.

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
- UnpartitionedWindow survivors, every one over a BOUNDED-row frame
  (round-5 sweep; anything new here is a regression):
  bda_rows_remapped / bda_spw_grid / bda_ddid_map (dense_rank over the
  DISTINCT (DDID|SPW, out_nchan) dimension table — K = #spectral
  windows x #binnings); t_zipf_slope / t_bigram_pmi_topk (rank over an
  already-limit(K)ed frame — the top-k itself is TakeOrderedAndProject);
  ev_user_concentration (cumsum over the 10-row decile aggregate);
  agg_contingency_chi2cells (grand-total window over the flag x status
  contingency cells); ev_rfm_segments / ev_user_concentration at audit
  SF (global_ntile's size gate: the window path only ever sees
  <= NTILE_WINDOW_MAX_ROWS rows — above the gate the plan switches to
  the distributed rank, both paths parity-pinned in test_ranking).
  The vocab-grain top-k sites (t_word_freq_topk, t_oov_rate,
  t_countmin_heavy_hitters probes) were rewritten round 5 onto
  orderBy+limit (TakeOrderedAndProject); agg_skyline_pareto (suffix max
  over the K 90-day block maxima — K grows with calendar span, not data
  volume; the data-grain suffix max is partitioned by block).

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

UNPARTITIONED_WINDOW = "UnpartitionedWindow"


def _has_unpartitioned_window(plan: str) -> bool:
    """True if any Window operator line lacks a partition-spec group.

    Plan text is ``Window [exprs], [partition], [order]``; either of
    the last two groups may be absent. Two-group lines are ambiguous —
    ``[exprs], [partition]`` (per-group total, fine) vs ``[exprs],
    [order]`` (global sort, the hazard) — disambiguated by the sort
    markers (``ASC``/``DESC``) only an order spec carries. One-group
    lines are global unordered windows (grand totals)."""
    for line in plan.splitlines():
        idx = line.find("Window [")
        if idx < 0:
            continue
        depth = 0
        groups: list[str] = []
        start = None
        for i, ch in enumerate(line[idx + len("Window ") :]):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(line[idx + len("Window ") :][start : i + 1])
        if len(groups) >= 3:
            continue
        if len(groups) == 1:
            return True
        last = groups[-1]
        if " ASC" in last or " DESC" in last:
            return True
    return False


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
        if _has_unpartitioned_window(plan):
            hits.setdefault(UNPARTITIONED_WINDOW, []).append(name)
    for pat in (*PATTERNS, UNPARTITIONED_WINDOW):
        print(f"{pat}: {len(hits.get(pat, []))}")
        for n in hits.get(pat, []):
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
