"""Opt-in run profiling — the Spark analogue of the reference's dask
profiler hooks (reference: xova/apps/xova/app.py:35-40 imports
Profiler/CacheProfiler/ResourceProfiler + bokeh `visualize`, app.py:130-150
wraps compute when ``--boring`` is off).

A dask task-stream HTML makes no sense for a Catalyst engine; the
artifacts that DO are the query plans Catalyst actually chose and the
wall-clock of the one action. ``write_profile`` dumps, per output table,
the full queryExecution chain (parsed -> analyzed -> optimized ->
physical, including AQE's final plan markers) plus a ``profile.json``
with the write timing — enough to audit shuffle/broadcast decisions
after any run, with zero overhead when not requested.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def write_profile(tables: dict, path: str, write_secs: float) -> None:
    """Dump ``<path>/<table>.plan.txt`` for every DataFrame in
    ``tables`` plus ``<path>/profile.json``."""
    os.makedirs(path, exist_ok=True)
    names = []
    for name, df in tables.items():
        if not isinstance(df, DataFrame):
            continue
        try:
            plan = df._jdf.queryExecution().toString()
        except Exception as e:  # noqa: BLE001 — profiling must never fail a run
            plan = f"<plan unavailable: {type(e).__name__}: {e}>"
        with open(os.path.join(path, f"{name}.plan.txt"), "w") as fh:
            fh.write(plan)
        names.append(name)
    with open(os.path.join(path, "profile.json"), "w") as fh:
        json.dump(
            {"write_secs": round(write_secs, 3), "tables": sorted(names)},
            fh,
            indent=1,
            sort_keys=True,
        )
