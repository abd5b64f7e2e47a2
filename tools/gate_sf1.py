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

# Round-9 sample (VERDICT r8 item 3): rotate toward never-sf1-gated
# lattice/iterative entries — the contingency lattices, the two
# round-8 128-bit dividend fixes (prove them at 10x like gini was),
# this round's jackknife divisor fix, the chained stream-stream
# funnel, the graph iteratives not yet gated, and the
# integer-bookkeeping tail. The 23 round-8-proven names rotate out
# (GATE_SF1.md history keeps their EXACT rows).
SF1_SAMPLE: tuple[str, ...] = (
    "ev_chisq_independence",      # contingency micro lattice at 10x
    "ev_cramers_v",               # effect size on the same grain
    "dq_mutual_information",      # micro-nat contingency lattice
    "t_bigram_pmi_topk",          # r8 128-bit dividend fix — prove at 10x
    "t_quality_auc",              # r8 128-bit pair-sum fix — prove at 10x
    "ev_jackknife_ci",            # r9 B^2 divisor fix — prove at 10x
    "stream_funnel_conversion",   # chained stream-stream at 10x events
    "er_survivorship",            # prefer-latest tie rules at 10x
    "graph_adamic_adar",          # wedge spine + ln-lattice weights
    "graph_kcore",                # bounded peel, never sf1-gated
    "ev_theil_index",             # ln lattice + 128-bit weighted sum
    "ev_hoover_index",            # integer end-to-end
    "ev_fdr_segment_residuals",   # z->p staircase + BH sweep at 10x
    "ev_sprt_ab_test",            # LLR lattice + div/floor hour bins
    "agg_trimmed_mean",           # rank-window overlap at bin grain
    "dq_benford",                 # leading-digit lattice, never gated
    "t_quality_calibration",      # global_ntile tie semantics at 10x
    "t_quality_pr_curve",         # full threshold sweep at 10x scores
    "join_asof_nearest",          # union + one shuffle + window frames
    "emb_silhouette_centroid",    # shared k-means + IEEE sqrt ratio
    "cdc_deletion_vector_audit",  # manifest-grain day bins
    "pipeline_eval_gate_e2e",     # composition of the stats pack at 10x
    # late-r9 additions: the new 128-bit lattice forms at 10x
    "ev_anova_oneway",            # ssb/ssw 128-bit decomposition
    "ev_cuped_adjustment",        # five 128-bit moments + 1-row doubles
    "graph_degree_assortativity", # shifted-negative quotient at 10x edges
    "agg_histogram_quantile_sketch",  # dual cumsum + W/2 error law
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
