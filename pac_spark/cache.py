"""Persist/checkpoint lifecycle for multi-use intermediate frames.

Operators cache a frame when the same expensive stage feeds two
downstream consumers (fuzzy-scored pairs → edges + confidence banding;
shingle rows → pair join + rescore). Spark's ``persist`` has no scope:
without explicit release, a 61-query driver session accumulates every
query's cached blocks until LRU eviction starts thrashing — acceptable
on one laptop JVM, memory pressure on a shared cluster (VERDICT r2 #4).

Every cache goes through this registry:

- :func:`pin` — persist + register, for frames whose lineage must stay
  recomputable (plain persist; unpersisting early just recomputes).
- :func:`checkpoint` — ``localCheckpoint(eager=True)`` + register, for
  iterative plans that need lineage truncation (connected components).
  Checkpointed blocks ARE the data — they must only be released after
  the consuming result has been collected.
- :func:`release_caches` — unpersist everything registered. The query
  registry calls this at the START of each query, so query N's caches
  live exactly until query N+1 begins (N's result is collected by
  then); bench calls it between the warm-up and timed phases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pin", "checkpoint", "release_caches"]

_LIVE_DFS: list[DataFrame] = []
_LIVE_JRDDS: list = []  # JavaRDD handles backing localCheckpoints


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for the next release sweep."""
    df.persist()
    _LIVE_DFS.append(df)
    return df


def checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint with tracked block lifecycle.

    ``localCheckpoint`` caches the materialized partitions but offers
    no public handle to free them; they normally live until the JVM
    garbage-collects the RDD. The persistent-RDD id diff around the
    call captures exactly the block this checkpoint created so
    :func:`release_caches` can free it deterministically.
    """
    sc = df.sparkSession.sparkContext
    jmap = sc._jsc.getPersistentRDDs()
    before = set(jmap.keys())
    out = df.localCheckpoint(eager=True)
    jmap = sc._jsc.getPersistentRDDs()
    for rid in jmap.keys():
        if rid not in before:
            _LIVE_JRDDS.append(jmap[rid])
    return out


def _jvm_alive() -> bool:
    """One liveness probe for both handle kinds: the active session's
    JVM context exists and is not stopped. A dead gateway raises on
    the probe itself, which also means 'not alive'."""
    from pyspark.sql import SparkSession

    try:
        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        jsc = spark.sparkContext._jsc
        return jsc is not None and not jsc.sc().isStopped()
    except Exception:
        return False


def release_caches() -> int:
    """Unpersist every registered frame/checkpoint; returns the count
    attempted. Safe to call at any point where no previously returned
    (and not yet collected) DataFrame is still pending — released
    persists recompute, but released checkpoints do not.

    Failure semantics: if the JVM/session is gone (test teardown,
    crashed gateway) the blocks died with it — handles are dropped
    silently. If the JVM is alive and an unpersist still fails, the
    handle is KEPT for the next sweep to retry and the first error is
    re-raised, so a broken release path surfaces instead of silently
    leaving blocks resident."""
    n = len(_LIVE_DFS) + len(_LIVE_JRDDS)
    if not _jvm_alive():
        _LIVE_DFS.clear()
        _LIVE_JRDDS.clear()
        return n

    errors: list[Exception] = []
    for live in (_LIVE_DFS, _LIVE_JRDDS):
        kept = []
        while live:
            handle = live.pop()
            try:
                handle.unpersist()
            except Exception as exc:
                if _jvm_alive():
                    kept.append(handle)  # retryable at the next sweep
                    errors.append(exc)
                # else: JVM died mid-sweep; blocks are gone, drop handle
        live.extend(kept)
    if errors:
        raise errors[0]
    return n
