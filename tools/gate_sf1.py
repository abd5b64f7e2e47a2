"""Sampled sf1 oracle gate — scale-dependent-divergence watch.

VERDICT r7 item 2: correctness had only ever been PROVEN at
sf0.01/sf0.001 (the sf1 tier under ``.cache/sf1`` was bench-only), yet
the failure classes that matter at 100 TB — integer overflow (the
ev_gini_coefficient dividend), regex catastrophic cases, plan-size
blowups (the k-truss persist OOM) — only manifest as the data grows.
This gate runs ``tools/check_oracle.py`` (the driver-identical
Spark-vs-DuckDB hash compare) against the sf1 tier for a rotating
~20-entry sample each round, weighted toward integer-lattice and
iterative entries, and writes the committed ``GATE_SF1.md`` log.

Round-close ritual: regenerate the tier if absent
(``python tools/gen_sf1.py``), then ``python tools/gate_sf1.py``;
commit GATE_SF1.md. All sampled entries must be EXACT. Rotate
``SF1_SAMPLE`` each round alongside the driver-slot rotation and
record the round in the log header.

Usage: python tools/gate_sf1.py [sf1_dir] [name ...]
       (defaults: /root/repo/.cache/sf1 and the pinned SF1_SAMPLE)
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Round-8 sample: every integer-lattice accumulator family (gini's
# 128-bit dividend, the ln-lattices, permille bookkeeping), the three
# iterative graph entries (lineage/OOM class), the heaviest regex
# entries, one streaming entry, and the newest audits.
SF1_SAMPLE: tuple[str, ...] = (
    "ev_gini_coefficient",       # 128-bit dividend (the r7 defect, post-fix)
    "ev_kaplan_meier",           # ln micro-nat lattice, suffix window
    "graph_ktruss_edges",        # iterative + localCheckpoint lineage
    "graph_hits_scores",         # iterative renorm lattice
    "graph_pagerank",            # iterative
    "t_bm25_topk",               # ln-lattice + doc-grain sums
    "t_source_lang_entropy",     # ln-lattice entropy
    "t_trigram_backoff_score",   # LM lattice + train/eval split
    "basket_triples_support",    # combinatorial expansion
    "agg_weighted_median",       # crossing-point integer arithmetic
    "ev_max_drawdown",           # running-peak lattice
    "ev_multitouch_attribution", # permille bookkeeping sums
    "ev_peak_concurrency",       # +1/-1 prefix sums
    "ev_hll_mergeable_rollup",   # sketch booleans
    "dedup_minhash_lsh",         # banded signatures at 10x docs
    "ann_ivfpq_topk",            # trained-model artifact path
    "layout_bloom_skip_audit",   # bit_or integer lattice
    "layout_zonemap_prune_audit",# manifest-grain pruning
    "t_pii_redact",              # Java-vs-RE2 regex at 10x text
    "agg_exact_median_rank",     # exact rank arithmetic at 10x rows
    # late-r8 additions: the statistical-testing pack's three steepest
    # internal dividends (cubic Spearman, quadratic KS / Mann-Whitney)
    "ev_spearman_rho",
    "ev_ks_test",
    "ev_mann_whitney_u",
)


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".cache", "sf1")
    names = sys.argv[2:] or list(SF1_SAMPLE)
    if not os.path.isdir(sf1):
        print(f"sf1 tier missing at {sf1} — run: python tools/gen_sf1.py")
        return 2
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracle.py"),
            sf1,
            *names,
        ],
        capture_output=True,
        text=True,
    )
    lines = [
        ln
        for ln in proc.stdout.splitlines()
        if ln.startswith(("EXACT", "CLOSE", "FAIL", "NOOR", "=="))
    ]
    summary = next((ln for ln in lines if ln.startswith("==")), "== (no summary)")
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC"
    )
    with open(os.path.join(REPO, "GATE_SF1.md"), "w") as f:
        f.write(
            f"# Sampled sf1 oracle gate — {stamp}, sf1_dir={sf1}\n\n"
            "Driver-identical Spark-vs-DuckDB hash compare at the 10x\n"
            "bench tier (VERDICT r7 item 2): scale-dependent divergence\n"
            "— overflow, regex blowup, plan-size growth — surfaces here\n"
            "a round before it could bite bigger. Sample rotates each\n"
            "round (see tools/gate_sf1.py SF1_SAMPLE).\n\n"
            f"Summary: `{summary.lstrip('= ')}`\n\n```\n"
            + "\n".join(lines)
            + "\n```\n"
        )
    print(summary)
    for ln in lines:
        if ln.startswith(("FAIL", "CLOSE")):
            print(ln)
    return 1 if proc.returncode else 0


if __name__ == "__main__":
    raise SystemExit(main())
