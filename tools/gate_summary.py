"""Run the FULL oracle gate and persist log + summary — the pre-claim check.

Round-2 lesson: COVERAGE.md shipped a "153 oracle-gated" header while one
query threw. This script is the fix: run it before editing COVERAGE.md /
ROADMAP.md / SCALE.md, commit the refreshed GATE_LOG.md alongside, and the
claims always match a fresh gate run.

Usage: python tools/gate_summary.py [sf_dir]

Writes GATE_LOG.md at the repo root (summary + one line per query) and
exits nonzero if any query FAILs.
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), sf_dir],
        capture_output=True,
        text=True,
    )
    lines = [
        ln
        for ln in proc.stdout.splitlines()
        if ln.startswith(("EXACT", "CLOSE", "FAIL", "NOOR", "=="))
    ]
    summary = next((ln for ln in lines if ln.startswith("==")), "== (no summary)")
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "GATE_LOG.md"), "w") as f:
        f.write(f"# Oracle gate log — {stamp}, sf_dir={sf_dir}\n\n")
        f.write(f"Summary: `{summary.lstrip('= ')}`\n\n```\n")
        f.write("\n".join(lines))
        f.write("\n```\n")
    print(summary)
    n_fail = proc.returncode
    if n_fail:
        for ln in lines:
            if ln.startswith("FAIL"):
                print(ln)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
