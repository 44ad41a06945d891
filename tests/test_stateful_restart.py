"""Restart-mid-stream chaos test for the custom-state lifetime
operator (VERDICT r4 optional-#8): the per-user GroupState must
survive a query restart from its checkpoint, and the folded totals
after the second run must equal the single-pass DuckDB window oracle
over the full table.

Shape: the events fixture is split at its global median timestamp into
two files; run 1 (``availableNow``) folds the early half and stops,
run 2 restarts from the same checkpoint and folds ONLY the late half
(exactly-once file tracking) on top of the recovered state. The
per-key event-time monotonicity the fold now asserts (ADVICE r4)
holds by construction — every run-1 timestamp < every run-2 one — so
a divergence here would be real state loss, not delivery order.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def _run_once(spark, src: str, ckpt: str, schema, sink_rows: list) -> None:
    from pac_spark.streaming.stateful import (
        _LIFETIME_STATE,
        LIFETIME_SCHEMA,
        _lifetime_fold,
    )

    out = (
        spark.readStream.schema(schema)
        .parquet(src)
        .groupBy("user_id")
        .applyInPandasWithState(
            _lifetime_fold,
            outputStructType=LIFETIME_SCHEMA,
            stateStructType=_LIFETIME_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def _collect(batch_df, _batch_id):
        sink_rows.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(_collect)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_lifetime_state_survives_restart(spark, sf_dir, duck, tmp_path):
    from pac_spark.streaming.stateful import LIFETIME_ORACLE

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "user_id", "event_id", "ts", "value"
    )
    ts_sorted = [r["ts"] for r in ev.select("ts").orderBy("ts").collect()]
    mid = ts_sorted[len(ts_sorted) // 2]
    early = ev.filter(F.col("ts") < F.lit(mid))
    late = ev.filter(F.col("ts") >= F.lit(mid))
    assert early.count() > 0 and late.count() > 0, "split is vacuous"

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows: list = []

    early.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, ev.schema, rows)
    n_after_run1 = len(rows)
    assert n_after_run1 > 0, "run 1 emitted nothing"

    late.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, ev.schema, rows)
    assert len(rows) > n_after_run1, "run 2 emitted nothing (no restart fold)"

    # finalize exactly as the operator does: totals are monotone in
    # n_events, keep each user's highest-count row
    best: dict[int, object] = {}
    for r in rows:
        cur = best.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            best[r["user_id"]] = r

    oracle = {
        r[0]: r[1:]
        for r in duck.sql(LIFETIME_ORACLE).fetchall()
    }
    got = {
        u: (
            r["n_events"],
            r["total_value"],
            r["n_anomalies"],
            r["first_ts"],
            r["last_ts"],
        )
        for u, r in best.items()
    }
    assert set(got) == set(oracle)
    mismatches = {u: (got[u], oracle[u]) for u in oracle if got[u] != oracle[u]}
    assert not mismatches, f"restart fold diverged: {list(mismatches.items())[:3]}"

    shutil.rmtree(ckpt, ignore_errors=True)


def _tie_rows(spark, eids: list[int]):
    """One user, four SAME-TIMESTAMP events whose anomaly verdicts are
    order-sensitive: folding by ascending event_id flags only the
    1000.0 spike, any reordered fold shifts which rows exceed 3x the
    prior running mean."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    value_by_eid = {1: 10.0, 2: 12.0, 3: 1000.0, 4: 11.0}
    return spark.createDataFrame(
        [(7, e, ts, value_by_eid[e]) for e in eids],
        "user_id long, event_id long, ts timestamp, value double",
    )


def test_lifetime_tie_split_in_order_folds_exactly(spark, tmp_path):
    """A same-timestamp run split across micro-batches in event_id
    order must fold to exactly the single-batch result (VERDICT r5
    wrong-#2: equal-ts ties are where timestamp-only order checking
    went blind)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = _tie_rows(spark, [1]).schema
    rows: list = []
    _tie_rows(spark, [1, 2]).coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, schema, rows)
    _tie_rows(spark, [3, 4]).coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, schema, rows)
    final = max(rows, key=lambda r: r["n_events"])
    assert final["n_events"] == 4
    assert final["total_value"] == 1033.0
    # ascending-eid fold: only eid=3 (1000.0 vs prior mean 11.0) spikes
    assert final["n_anomalies"] == 1
    shutil.rmtree(ckpt, ignore_errors=True)


def test_lifetime_tie_split_out_of_order_is_refused(spark, tmp_path):
    """Delivering the LATER event_ids of a same-timestamp run first
    must trip the (ts, event_id) regression assert — not silently
    fold a different anomaly count than the window oracle."""
    import pytest

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = _tie_rows(spark, [1]).schema
    rows: list = []
    _tie_rows(spark, [3, 4]).coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, schema, rows)
    _tie_rows(spark, [1, 2]).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="regression"):
        _run_once(spark, src, ckpt, schema, rows)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_user_accounting_merge_is_idempotent_under_replay(spark):
    """foreachBatch gives at-least-once delivery on restart edges: the
    growth-accounting fold's merge (distinct union) must absorb a
    REPLAYED batch without changing the view — and must not depend on
    batch order."""
    import pandas as pd

    from pac_spark.operators.relational import user_day_accounting

    def frame(rows):
        return spark.createDataFrame(
            pd.DataFrame({"user_id": [u for u, _ in rows],
                          "day": pd.to_datetime([d for _, d in rows]).date})
        )

    b1 = frame([(1, "2024-01-01"), (2, "2024-01-01")])
    b2 = frame([(1, "2024-01-02"), (3, "2024-01-03")])

    def merge(view, delta):
        return view.unionByName(delta).distinct()

    ordered = merge(b1, b2)
    replayed = merge(merge(b1, b2), b1)      # b1 delivered twice
    reordered = merge(b2, b1)
    want = sorted(map(tuple, user_day_accounting(ordered).collect()))
    assert sorted(map(tuple, user_day_accounting(replayed).collect())) == want
    assert sorted(map(tuple, user_day_accounting(reordered).collect())) == want
