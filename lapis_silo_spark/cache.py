"""Result-scoped persistence for intermediate DataFrames.

Operators like ``minhash_lsh_pairs`` persist an intermediate (the signature
sketch) that both sides of a downstream self-join read; the cache must stay
alive as long as the *returned* lazy DataFrame might be executed, which the
operator itself cannot know. ``scoped_persist`` ties the intermediate's
lifetime to the result object: when the caller drops the result (CPython
refcount → immediately; otherwise at GC), the intermediate is unpersisted.
A long-lived server therefore holds no net-new persisted RDDs once a query's
result goes out of scope, instead of accumulating LRU-evictable registry
entries for the application lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class _CacheGuard:
    def __init__(self, df: DataFrame):
        self._df = df

    def release(self) -> None:
        df, self._df = self._df, None
        if df is not None:
            try:
                df.unpersist()
            except Exception:  # session already stopped / interpreter exit
                pass

    def __del__(self):
        self.release()


def scoped_persist(
    intermediate: DataFrame,
    result: DataFrame,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER,
) -> DataFrame:
    """Persist ``intermediate`` for exactly the lifetime of ``result``.

    Returns ``result`` with the guard attached (also reachable for explicit
    release via ``result._silo_cache_guard.release()``).

    An already-persisted ``intermediate`` (e.g. the propagation loop's final
    label table) is adopted as-is — re-persisting would only log a
    CacheManager warning; the guard still unpersists it on release.
    """
    if not intermediate.is_cached:
        intermediate.persist(storage_level)
    result._silo_cache_guard = _CacheGuard(intermediate)
    return result
