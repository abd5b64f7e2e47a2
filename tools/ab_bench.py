"""Targeted same-session A/B timing for individual registry queries.

Usage: python tools/ab_bench.py [--sf SF_DIR] [--runs N] [--plan] query [query ...]

Runs each named query through the same methodology as bench.py (warmup,
then median of N noop-sink runs) in ONE session and prints per-query
medians plus all raw samples — the round-9/10 discipline for measuring
an optimization without full-bench noise. ``--plan`` additionally dumps
``explain("formatted")`` for each query to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--plan", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from xova_spark.session import get_spark

    spark = get_spark("xova-ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        spark.sparkContext.setJobDescription(f"ab:{name}")
        if args.plan:
            print(f"===== PLAN {name} =====")
            qs[name](spark, args.sf).explain("formatted")
        samples = []
        try:
            for i in range(args.runs + 1):
                t0 = time.perf_counter()
                qs[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                if i > 0:  # drop warmup
                    samples.append(dt)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        med = sorted(samples)[len(samples) // 2]
        raw = " ".join(f"{s:.3f}" for s in samples)
        print(f"{name}: median={med:.3f}s  raw=[{raw}]")


if __name__ == "__main__":
    main()
