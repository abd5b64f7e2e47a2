"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as views),
then compares row count, column names, and values (columns sorted by name,
rows sorted by all columns). Reports both an exact match (what a value-hash
needs) and a tolerance match (float aggregation order).

Usage: python tools/check_oracle.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs the queries on a BARE SparkSession pinned to a
hostile non-UTC timezone instead of ``get_spark`` — the driver's
environment: no engine confs, no Arrow flags, America/New_York. Every
entry must stay EXACT there too (load_tables owns tz/NTZ hygiene).
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from xova_spark.plancontract import plan_contract_violations  # noqa: E402
from xova_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def keyify(col: pd.Series):
        if col.dtype == object:
            return col.map(lambda v: str(v))
        return col

    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), key=keyify, kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, bool, str]:
    if len(sdf) != len(odf):
        return False, False, f"rowcount spark={len(sdf)} oracle={len(odf)}"
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return False, False, f"columns spark={scols} oracle={ocols}"
    sdf, odf = normalize(sdf), normalize(odf)
    exact = True
    close = True
    detail = []
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        # Dtype-parity guard (round-4 verdict): DuckDB HUGEINT fetches as
        # float64, so `405.0` vs Spark's int64 `405` is numerically equal
        # but repr-different — the driver's value-hash FAILS while a pure
        # value compare says EXACT. Treat int-vs-float dtype skew as FAIL.
        if pd.api.types.is_integer_dtype(a) and pd.api.types.is_float_dtype(b):
            exact = close = False
            detail.append(
                f"col {c} dtype skew: spark {a.dtype} vs oracle {b.dtype}"
                " (HUGEINT? cast the oracle sum to BIGINT)"
            )
            continue
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_integer_dtype(b):
            exact = close = False
            detail.append(
                f"col {c} dtype skew: spark {a.dtype} vs oracle {b.dtype}"
            )
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            eq = (af == bf) | both_nan
            if not eq.all():
                exact = False
                ok = np.isclose(af, bf, rtol=1e-9, atol=1e-12) | both_nan
                if not ok.all():
                    close = False
                    i = int(np.argmin(ok))
                    detail.append(f"col {c} row {i}: {af[i]!r} vs {bf[i]!r}")
                else:
                    md = np.nanmax(np.abs(af - bf))
                    detail.append(f"col {c} float drift max {md:.3e}")
        else:
            av = a.map(lambda v: str(v)).to_numpy()
            bv = b.map(lambda v: str(v)).to_numpy()
            if not (av == bv).all():
                exact = close = False
                i = int(np.argmin(av == bv))
                detail.append(f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}")
    return exact, close, "; ".join(detail)


BAD_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def oracle_schema_hazards(con, oracles) -> dict[str, list[str]]:
    """DESCRIBE every oracle SQL (plan-only — DuckDB derives the result
    schema without executing) and return {name: ["col:TYPE", ...]} for any
    result column typed HUGEINT/UHUGEINT.

    Why: DuckDB types sum(BIGINT) as HUGEINT, and ``fetchdf`` renders
    HUGEINT as float64 — numerically equal to Spark's int64 but
    repr-different, so the driver's value-hash fails while a value compare
    passes (round-4 verdict, the only driver FAIL in 4 rounds). The fix is
    CAST(... AS BIGINT) at the oracle's final projection; this sweep makes
    the class structurally dead.
    """
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:  # noqa: BLE001 — execution errors surface in the main loop
            continue
        hazards = [
            f"{r[0]}:{r[1]}"
            for r in rows
            if any(t in str(r[1]).upper() for t in BAD_DUCK_TYPES)
        ]
        if hazards:
            bad[name] = hazards
    return bad


def main():
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    from xova_spark.sharedframes import clear_shared

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_exact = n_close = n_fail = n_noor = 0
    n_run = 0
    hazards = oracle_schema_hazards(
        con, {k: v for k, v in oracles.items() if not only or k in only}
    )
    for name, cols in hazards.items():
        print(f"FAIL  {name}: oracle schema hazard {cols} (driver hash-unsafe)")
    n_fail += len(hazards)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Bound the cache footprint over a ~300-entry run on one session:
        # a few entries persist frames they never unpersist (bounded-size,
        # but they accumulate). Every 60 entries drop ALL cached data and
        # reset the shared-frame registry so shared() re-persists cleanly
        # on next use (clearCache alone would leave _REG holding silently
        # unpersisted frames that recompute per consumer).
        n_run += 1
        if n_run % 60 == 0:
            spark.catalog.clearCache()
            clear_shared()
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            # Land-time plan-contract enforcement (VERDICT r6 item 2):
            # the full plan_audit sweep is ~25 min and only runs
            # manually, so an entry landing after the last sweep once
            # shipped with an unlisted unpartitioned window. The gate
            # IS rerun at every close (tools/gate_summary.py), so check
            # the frozen window/BNLJ contracts on each entry's executed
            # plan here — the plan is already built for toPandas, the
            # check is a string scan.
            probs = plan_contract_violations(name, df, fn)
            if probs:
                print(f"FAIL  {name}: plan contract: {'; '.join(probs)}")
                n_fail += 1
                continue
            sdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"NOOR  {name}: rows={len(sdf)} (rows-only check) [{dt:.1f}s]")
            n_noor += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        exact, close, detail = compare(name, sdf, odf)
        if exact:
            print(f"EXACT {name}: rows={len(sdf)} [{dt:.1f}s]")
            n_exact += 1
        elif close:
            print(f"CLOSE {name}: rows={len(sdf)} ({detail}) [{dt:.1f}s]")
            n_close += 1
        else:
            print(f"FAIL  {name}: {detail} [{dt:.1f}s]")
            n_fail += 1
    print(
        f"\n== exact={n_exact} close={n_close} fail={n_fail} rows_only={n_noor} "
        f"total={n_exact + n_close + n_fail + n_noor}"
    )
    spark.catalog.clearCache()
    clear_shared()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
