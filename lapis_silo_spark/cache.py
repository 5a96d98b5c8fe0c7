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


class _RddGuard:
    """Unpersist a JVM-side RDD (a localCheckpoint's storage) when the
    guarded result dies — PySpark never reclaims checkpoint RDDs on its
    own, even after the DataFrame is garbage-collected and the JVM GCs."""

    def __init__(self, jrdd):
        self._jrdd = jrdd

    def release(self) -> None:
        jrdd, self._jrdd = self._jrdd, None
        if jrdd is not None:
            try:
                jrdd.unpersist(False)
            except Exception:  # session already stopped / interpreter exit
                pass

    def __del__(self):
        self.release()


def checkpoint_tracked(df: DataFrame):
    """``df.localCheckpoint()`` plus a handle to the persisted JVM RDD so
    the caller can release the storage deterministically.

    localCheckpoint is the device for TRUNCATING LINEAGE in driver-side
    iterative loops — a plain ``persist`` leaves the logical plan intact,
    and a loop whose round references the previous round twice (union +
    join, as min-label propagation does) doubles the plan per round:
    exponential analysis memory (measured: OOMs an 8 GB driver at ~20
    rounds). The cost is that Spark never reclaims the checkpoint's
    persisted RDD, hence the handle: release superseded rounds as the loop
    advances and scope the final one to the result
    (:func:`scoped_rdd_release`).
    """
    cp = df.localCheckpoint()
    try:
        # the analyzed plan of a checkpointed Dataset is a LogicalRDD whose
        # rdd() IS the persisted RDD
        jrdd = cp._jdf.queryExecution().analyzed().rdd()
    except Exception:  # plan shape changed in a future Spark: degrade to
        jrdd = None    # the (small, bounded) leak instead of crashing
    return cp, _RddGuard(jrdd)


def scoped_rdd_release(result: DataFrame, guard: "_RddGuard") -> DataFrame:
    """Tie a checkpoint RDD's storage to ``result``'s lifetime (the RDD
    analog of :func:`scoped_persist`).

    IMPORTANT difference from :func:`scoped_persist`: a released CACHE
    recomputes transparently, a released CHECKPOINT cannot (its lineage is
    truncated) — so a plan derived from ``result`` (``.select()``,
    ``.filter()``, …) must keep ``result`` (or the guard) referenced while
    it may still execute. Use :func:`adopt_guards` on derived frames.
    """
    result._silo_rdd_guard = guard
    return result


def adopt_guards(derived: DataFrame, source: DataFrame) -> DataFrame:
    """Carry ``source``'s cache/checkpoint guards onto a DataFrame derived
    from it, so dropping the source doesn't release storage the derived
    plan still reads."""
    derived._silo_guard_src = source
    return derived


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
    # stack-safe: a second scoped_persist on the same result must not drop
    # the first guard (attribute overwrite would unpersist the earlier
    # intermediate immediately via _CacheGuard.__del__)
    existing = getattr(result, "_silo_cache_guard", None)
    if existing is not None:
        stacked = getattr(result, "_silo_cache_guards", [])
        stacked.append(existing)
        result._silo_cache_guards = stacked
    result._silo_cache_guard = _CacheGuard(intermediate)
    return result
