"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` aggregates the REGISTRY of every query pack in
``xova_spark.queries``; ``oracle_sql()`` returns their DuckDB twins.
``entry(spark)`` runs the flagship TPC-H Q1-style pricing summary —
the Spark analogue of the reference's single-kernel multi-column
aggregation (reference: xova/apps/xova/averaging.py:251-255).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registries() -> dict[str, tuple]:
    from xova_spark.queries import relational

    merged: dict[str, tuple] = {}
    merged.update(relational.REGISTRY)
    for modname in (
        "textops",
        "dedup",
        "similarity",
        "msdomain",
        "bda",
        "uvw",
        "streamingq",
        "benchdomain",
        "multimodalq",
        "relext",
        "pipelineq",
        "tpchx",
        "graphq",
        "dataqual",
        "cdcq",
        "layoutq",
    ):
        try:
            mod = __import__(f"xova_spark.queries.{modname}", fromlist=["REGISTRY"])
            merged.update(mod.REGISTRY)
        except ImportError:
            pass
    return merged


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from xova_spark.queries.relational import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registries().items() if sql is not None
    }
