"""Session-scoped memoized persisted DataFrames shared across registry
entries.

A full oracle-gate run executes all ~276 registry entries on ONE Spark
session. Several entries rebuild the same expensive derivation — the
co-purchase edge list (4 graph entries), the LPA label table (communities
+ modularity), the MinHash shingle/signature tables (every LSH dedup
entry), the all-pairs embedding-cosine verifier (near-dup + recall).
Spark's cache manager dedupes identical plans, but re-calling
``.cache()`` on a rebuilt twin of an already-cached plan logs "Asked to
cache already cached data" per call and relies on plan-equality being
exact; this registry makes the reuse explicit and guaranteed: one
persisted DataFrame per (applicationId, key), built on first use.

Keys include the Spark applicationId, so a stopped-and-restarted session
(every pytest module) never sees another session's stale frames.
``clear_shared()`` unpersists everything — gate drivers call it at exit;
inside one session the footprint is bounded by the number of distinct
derivations (~10), not the number of entries (~276).
"""

from __future__ import annotations

from typing import Callable

from pyspark.storagelevel import StorageLevel

_REG: dict[tuple, object] = {}


def shared(spark, key: tuple, builder: Callable):
    """Return the persisted DataFrame for ``key``, building it with
    ``builder()`` on first use in this Spark application."""
    k = (spark.sparkContext.applicationId,) + tuple(key)
    df = _REG.get(k)
    if df is None:
        df = builder().persist(StorageLevel.MEMORY_AND_DISK)
        _REG[k] = df
    return df


_PINS: list = []

# Module-level memo dicts (keyed by applicationId) registered by query
# modules so clear_shared() evicts them too — without registration,
# entries (including DataFrame references from stopped sessions)
# accumulate for the life of the process (ADVICE r10 #2).
_EXTERNAL_CACHES: list[dict] = []


def register_cache(cache: dict) -> dict:
    """Register a module-level memo dict for eviction by
    ``clear_shared()``; returns the dict so it can wrap the literal."""
    _EXTERNAL_CACHES.append(cache)
    return cache


def pin(df):
    """Track a persisted DataFrame that must outlive its builder (e.g.
    cc_components' returned label table, whose lineage feeds downstream
    consumers) so ``clear_shared()`` unpersists it at gate exit instead
    of it accumulating across a 327-entry run (VERDICT r5 item 7)."""
    _PINS.append(df)
    return df


def clear_shared() -> None:
    """Unpersist and forget every shared frame (all sessions), the
    per-call pins, plus the range-partitioned frames global_rank pinned
    (same lifecycle)."""
    for df in (*_REG.values(), *_PINS):
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    _REG.clear()
    _PINS.clear()
    for cache in _EXTERNAL_CACHES:
        cache.clear()
    from xova_spark.operators.ranking import release_pins

    release_pins()
