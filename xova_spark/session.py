"""SparkSession factory tuned for this engine.

Design notes (100 TB target, tested on local[32]):
- AQE on: runtime coalesce of post-shuffle partitions replaces the
  reference's manual "group ≥4 row chunks before write" compaction
  (reference: xova/apps/xova/averaging.py:39-77) and its hand-rolled
  reduction fan-in (chunking.py:256 split_every=16).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled for the few pandas-UDF operators (UVW synthesis, exact
  greedy binning); everything else stays JVM-side.
- shuffle.partitions defaults to the local core count; on a real cluster
  AQE's coalesce makes the initial number a ceiling, not a commitment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "xova_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python UDTFs evaluate via Arrow batches too (verified working
        # in this container) — with this, NO query path row-at-a-time
        # serializes through Python (plan_audit.py's BatchEvalPython
        # sweep comes back empty).
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Runtime bloom-filter join reduction: a selective dim-side
        # filter injects a might_contain() pre-filter on the fact scan
        # before the shuffle. Inert at local test sizes (the 10 GB
        # application-side scan threshold keeps it off) and exactly the
        # semi-join reduction a 100 TB fact-dim join wants; injection +
        # result-identity pinned in tests/test_plans.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # File-split sizing is max(openCostInBytes, bytes/parallelism)
        # capped by maxPartitionBytes; the 4 MB default left the 56 MB
        # bench-scale visibility table at 14 splits on 32 cores (the
        # scan + map-side partial aggregate is the whole hot stage of
        # timechannel_avg/bda_avg). 1 MB is scale-adaptive by the
        # formula itself: at 8 cores bytes/parallelism (7 MB) already
        # dominates (split count unchanged), and at cluster scale
        # maxPartitionBytes governs — the open cost only prices
        # per-file open overhead, which is page-cache cheap here.
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# Legacy: if a parquet TIMESTAMP(NANOS) column is read as long nanos (the
# spark.sql.legacy.parquet.nanosAsLong path), truncate to micros exactly as
# DuckDB does. The driver fixture's events.ts is actually INT64
# Timestamp(isAdjustedToUTC=false, unit=MICROS) — Spark 4's TIMESTAMP_NTZ
# inference reads it as timestamp_ntz, handled generically below.
NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


# One registry gate runs ~150 queries against the SAME sf_dir on the SAME
# session; re-reading footers and re-registering ten views per query is pure
# fixed overhead. Memoize per (session, dir): DataFrames are lazy plans,
# valid for the session's lifetime, so sharing them across queries is free.
_LOAD_CACHE: dict[tuple[int, str, tuple[str, ...]], dict] = {}


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the driver's parquet tables and register them as temp views.

    Returns a dict name -> DataFrame. Mirrors the reference's table-open
    step (xova/apps/xova/app.py:162-195) for the TPC-H-ish harness tables.
    Cached per (session, sf_dir): repeat calls (one per registry query in
    the oracle gate) return the already-registered views.
    """
    # The driver runs queries on ITS OWN SparkSession — pin the dynamic
    # confs the oracle comparison depends on here, not only in get_spark().
    # Pinned BEFORE the cache lookup: the tz must hold for every query,
    # not just the first load of a given dir.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001 — immutable conf in foreign session
        pass
    # Timestamp semantics vs the DuckDB oracle depend on a UTC session tz
    # (date_trunc/hour/... on TIMESTAMP render in session tz; DuckDB's
    # timestamps are naive). Fail loudly rather than let every hash
    # silently diverge in a non-UTC immutable session.
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise RuntimeError(
            f"xova_spark requires spark.sql.session.timeZone=UTC for oracle "
            f"parity; session has immutable tz={tz!r}"
        )
    # applicationId, not id(spark): CPython reuses object addresses, so
    # a stopped session's id can alias a new one and serve dead frames.
    cache_key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        names or (),
    )
    hit = _LOAD_CACHE.get(cache_key)
    if hit is not None:
        return hit
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        for c, dt in df.dtypes:
            if dt == "bigint" and c in NANO_TS_COLS.get(n, ()):
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
            elif dt == "timestamp_ntz":
                # Normalize NTZ -> TIMESTAMP so epoch extraction
                # (unix_micros et al.) analyzes everywhere. to_utc_timestamp
                # on an NTZ input interprets the wall time as UTC regardless
                # of session tz — value-preserving and tz-independent, unlike
                # a bare cast("timestamp").
                df = df.withColumn(c, F.to_utc_timestamp(F.col(c), "UTC"))
        df.createOrReplaceTempView(n)
        out[n] = df
    _LOAD_CACHE[cache_key] = out
    return out
