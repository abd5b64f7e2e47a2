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

# Round-10 sample (VERDICT r9 item 4): rotate toward the round-9 and
# round-10 lattice/iterative entries never sf1-gated — the Welch
# 128-bit pooled forms (ANOVA proved last round, keep Welch), the
# CUPED moments, the assortativity shifted-negative quotient, the
# doc-entropy ln lattice (post its r10 DECIMAL(38,0) accumulator
# fix), the hub-capped local clustering, the nprobe frontier, the
# entity-grain conflict rate (post the r10 shared-assignment change),
# plus ALL 14 round-10 entries (rank lattices, trend pairs, the
# deterministic Poisson bootstrap, survival hazard, density census).
# The 26 round-9-proven names rotate out (GATE_SF1.md history keeps
# their EXACT rows).
SF1_SAMPLE: tuple[str, ...] = (
    # round-10 batches 7-9 at 10x for the first time: value-bin
    # cumsum lattices (Mood/Cliff/CvM), KM exp lattice (RMST),
    # ln lattice (G-test), Welch forms (TOST/SRM), quartic hour
    # internals (Wilcoxon/Bartels), 128-bit trend dividends
    # (Page/JT), iterative lattice (Katz), cross-multiplied TVD
    "ev_srm_check",
    "ev_mood_median_test",
    "ev_cliff_delta",
    "ev_cramer_von_mises",
    "ev_turning_points_test",
    "ev_bartels_rank_test",
    "ev_rmst",
    "ev_gtest_independence",
    "ev_page_trend_test",
    "ev_jonckheere_terpstra",
    "ev_tost_equivalence",
    "t_code_ratio",
    "t_hapax_guiraud",
    "t_ari_readability",
    "graph_link_prediction_scores",
    "graph_katz_centrality",
    "dq_categorical_drift",
    "ev_mood_dispersion_test",
    "ev_wilcoxon_signed_rank",
    "ev_cox_stuart_trend",
    "ev_kendall_w",
    "pipeline_experiment_readout_e2e",
    "stream_srm_monitor",
    "ev_seasonal_mann_kendall",
    "join_levenshtein_blocked",
    "t_honore_r",
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
