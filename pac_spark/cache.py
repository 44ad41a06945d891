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


def _session_stopped(df_or_jrdd) -> bool:
    try:
        if isinstance(df_or_jrdd, DataFrame):
            return df_or_jrdd.sparkSession.sparkContext._jsc is None
        return False  # a live JavaRDD handle has no cheap liveness probe
    except Exception:
        return True


def release_caches() -> int:
    """Unpersist every registered frame/checkpoint; returns the count
    released. Safe to call at any point where no previously returned
    (and not yet collected) DataFrame is still pending — released
    persists recompute, but released checkpoints do not.

    Only stopped-session errors are swallowed (test teardown races);
    anything else means the release sweep is broken and must surface,
    not silently leave blocks resident."""
    n = len(_LIVE_DFS) + len(_LIVE_JRDDS)
    while _LIVE_DFS:
        df = _LIVE_DFS.pop()
        try:
            df.unpersist()
        except Exception:
            if not _session_stopped(df):
                raise
    while _LIVE_JRDDS:
        jrdd = _LIVE_JRDDS.pop()
        try:
            jrdd.unpersist()
        except Exception as exc:
            # JavaRDD handles outlive their session only at teardown;
            # a py4j connection error is the stopped-JVM signature
            if "Py4J" not in type(exc).__name__ and "py4j" not in str(
                type(exc).__module__
            ):
                raise
    return n
