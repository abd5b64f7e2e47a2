"""xova_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MS averager (ratt-ru/xova),
re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, Arrow, UTC, pushdown).
- ``functions``  : complex-number (re, im) column algebra, text/hash helpers.
- ``sources``    : parquet-backed MS-shaped table readers/writers; synthetic
                   MS fixture factory (mirrors reference ``testing_data.py``).
- ``operators``  : the reference's operator inventory (SURVEY.md §2) —
                   time+channel averaging, BDA, SPW regeneration, UVW
                   synthesis, check validator — plus large-scale
                   training-data ops (dedup, similarity, text analysis).
- ``queries``    : relational query pack exercised against the DuckDB oracle.
- ``streaming``  : Structured Streaming variants of the averaging core.
- ``plans``      : explain/plan-inspection helpers.
"""

__version__ = "0.1.0"
