"""Cache lifecycle contracts (ADVICE r3): checkpoint blocks survive
exactly one release generation (so a one-ahead-interleaving driver
never loses them), and the liveness probe works from threads that
never created a session.
"""

from __future__ import annotations

import threading


def test_checkpoint_release_deferred_one_generation(spark):
    from pac_spark import cache

    cache.release_caches(all_generations=True)  # clean slate
    out = cache.checkpoint(spark.range(100))
    assert out.count() == 100
    n_ck = len(cache._CKPT_CUR)
    assert n_ck >= 1, "checkpoint() must register its block handle"

    cache.release_caches()  # generation 1: block must SURVIVE
    assert len(cache._CKPT_PREV) == n_ck and not cache._CKPT_CUR
    assert out.count() == 100, "deferred checkpoint still collectible"

    cache.release_caches()  # generation 2: block freed
    assert not cache._CKPT_PREV and not cache._CKPT_CUR


def test_persists_release_immediately(spark):
    from pac_spark import cache

    cache.release_caches(all_generations=True)
    pinned = cache.pin(spark.range(50))
    assert pinned.count() == 50
    cache.release_caches()
    assert not cache._LIVE_DFS
    # persisted frames recompute after release — values unaffected
    assert pinned.count() == 50


class _FakeHandle:
    def __init__(self, fail: bool = False):
        self.fail = fail
        self.released = 0

    def unpersist(self):
        if self.fail:
            raise RuntimeError("unpersist broken")
        self.released += 1


def test_release_keeps_and_reraises_when_jvm_alive(spark, monkeypatch):
    """A failing unpersist with a LIVE JVM must re-raise (broken
    release paths surface) and keep the handle for a retry sweep."""
    from pac_spark import cache

    cache.release_caches(all_generations=True)
    good, bad = _FakeHandle(), _FakeHandle(fail=True)
    cache._LIVE_DFS.extend([good, bad])
    try:
        import pytest

        with pytest.raises(RuntimeError, match="unpersist broken"):
            cache.release_caches(all_generations=True)
        assert good.released == 1
        assert bad in cache._LIVE_DFS, "failed handle kept for retry"
    finally:
        cache._LIVE_DFS.clear()


def test_release_drops_handles_when_jvm_dies_mid_sweep(spark, monkeypatch):
    """Chaos branch (VERDICT r3 #8): the JVM dying between the entry
    probe and an unpersist must NOT raise — the blocks died with the
    JVM, so handles are dropped and the sweep completes."""
    from pac_spark import cache

    cache.release_caches(all_generations=True)
    probes = iter([True, False])  # alive at entry, dead at the failure probe
    monkeypatch.setattr(cache, "_jvm_alive", lambda: next(probes, False))
    dying = _FakeHandle(fail=True)
    cache._LIVE_DFS.append(dying)
    cache.release_caches(all_generations=True)  # must not raise
    assert not cache._LIVE_DFS


def test_jvm_alive_from_foreign_thread(spark):
    """The probe must use the process-global context: a driver pool
    thread that never created a session still sees the live JVM, so
    release sweeps there actually unpersist instead of silently
    dropping handles."""
    from pac_spark.cache import _jvm_alive

    results: list[bool] = []
    t = threading.Thread(target=lambda: results.append(_jvm_alive()))
    t.start()
    t.join()
    assert results == [True]


def test_stale_source_guard_raises_then_clears(spark, tmp_path):
    """The between-queries release contract, enforced (ADVICE r8):
    re-loading a path whose files changed IN PLACE while a pin is
    live raises loudly (Spark's plan-keyed cache would serve the old
    snapshot — the test_cramers_v_crafted trap); after the release
    sweep the rewrite is legal and the new data is served."""
    import pandas as pd
    import pytest

    from pac_spark import cache, catalog

    cache.release_caches(all_generations=True)
    p = tmp_path / "documents.parquet"
    pd.DataFrame({"doc_id": [1], "text": ["old"]}).to_parquet(p)
    df = cache.pin(catalog.load(spark, str(tmp_path), "documents"))
    assert df.count() == 1  # materialize the pin

    # an UNRELATED table rewritten in place is legal even with the pin
    # live — the guard only protects paths a live pin actually reads
    # (code-review r9)
    import os

    q = tmp_path / "orders.parquet"
    pd.DataFrame({"o_orderkey": [1]}).to_parquet(q)
    assert catalog.load(spark, str(tmp_path), "orders").count() == 1
    pd.DataFrame({"o_orderkey": [1, 2]}).to_parquet(q)
    os.utime(q, ns=(1, 1))
    assert catalog.load(spark, str(tmp_path), "orders").count() == 2

    # rewrite the PINNED table in place (force a distinct mtime even
    # on coarse clocks) -> loud failure
    pd.DataFrame({"doc_id": [1, 2], "text": ["new", "new2"]}).to_parquet(p)
    os.utime(p, ns=(1, 1))
    with pytest.raises(RuntimeError, match="changed on disk"):
        catalog.load(spark, str(tmp_path), "documents")

    cache.release_caches(all_generations=True)
    assert catalog.load(spark, str(tmp_path), "documents").count() == 2
