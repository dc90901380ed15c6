"""Shared registry of persisted relations (ADVICE r9: the ANN/bulk
plans used to import operators/dedup's private ``_register_cache``,
turning a module-internal list into a cross-module lifecycle contract
under a leading-underscore name — this module is that contract, public).

Operators that persist intermediate relations (signature caches,
fingerprint indexes, candidate derivations) register them here; the
relations are deliberately left cached while the returned plans are
alive — the plans reference them — but repeated calls in one long
session would otherwise accumulate executor storage (ADVICE r6).
Callers (the sweep tools, bench, tests) release everything between
queries with ``unpersist_caches()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Track a persisted/cached relation for later bulk release; returns
    the same DataFrame so call sites can wrap the ``.persist()`` chain."""
    _LIVE_CACHES.append(df)
    return df


def unpersist_caches(blocking: bool = False) -> int:
    """Release every registered relation. Call after the DataFrames
    returned by the operators have been materialized (written or
    collected); plans still holding a released cache recompute it
    lazily, so this is always safe, never wrong — just possibly
    slower. Returns the number of relations released."""
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session already stopped: nothing to free
            pass
    return n
