"""Compare two bench.py JSON payloads per query with a noise band.

Usage: python tools/bench_compare.py [OLD.json] NEW.json [--band 0.2]
       (OLD defaults to the committed BENCH_BASELINE.json — the
        round-10 126-query median re-baseline)

Reads either a raw ``{"metric": ...}`` payload or a driver
``BENCH_r{N}.json`` wrapper (takes the ``parsed`` field). Prints a
per-query delta table and flags queries outside the ±band fraction —
the round-over-round regression check ROADMAP's perf policy calls for
(compare per-query medians, never single totals; the sf0.1 noise band
is ±20% same-code same-day, so the default band is 0.2).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' field (and no parsed payload)")
    return d


def main() -> int:
    # Accept both '--band=0.2' and '--band 0.2' (the documented form):
    # consume the value following a bare '--band' from the arg stream.
    argv = sys.argv[1:]
    args: list[str] = []
    band = 0.2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--band"):
            if "=" in a:
                band = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                band = float(argv[i])
            else:
                raise SystemExit("--band needs a value")
        else:
            args.append(a)
        i += 1
    if len(args) == 1:
        # Default comparator: the committed round-8 median re-baseline
        # (VERDICT r7 item 4 — per-query medians at the FULL headline,
        # so regressions in post-round-5 queries are no longer
        # invisible to this discipline).
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        args.insert(0, os.path.join(repo, "BENCH_BASELINE.json"))
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    names = sorted(set(oq) | set(nq))
    flagged = []
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for n in names:
        a, b = oq.get(n), nq.get(n)
        if a is None or b is None:
            tag = "ADDED" if a is None else "REMOVED"
            print(f"{n:34s} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8} {tag:>7s}")
            continue
        ratio = b / a if a else float("inf")
        mark = ""
        if ratio > 1 + band:
            mark = " REGRESSED"
            flagged.append((n, ratio))
        elif ratio < 1 - band:
            mark = " improved"
        print(f"{n:34s} {a:8.3f} {b:8.3f} {ratio:7.2f}{mark}")
    co = sum(oq[n] for n in names if n in oq and n in nq)
    cn = sum(nq[n] for n in names if n in oq and n in nq)
    print(f"\ncomparable-set total: {co:.3f} -> {cn:.3f} "
          f"({cn / co:.2f}x)" if co else "")
    if flagged:
        print(f"{len(flagged)} queries regressed beyond ±{band:.0%}:")
        for n, r in flagged:
            print(f"  {n}: {r:.2f}x")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
