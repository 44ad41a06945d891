"""Streaming file-sink semantics: exactly-once delivery across
restarts. The parquet sink's manifest plus the source checkpoint make
re-running a drained stream a no-op — the recovery contract a
production pipeline leans on after a crash."""

from __future__ import annotations


def _drain_to_parquet(spark, sf_dir, out_dir, ckpt_dir):
    from pac_spark.streaming.stream_exec import stream_events

    q = (
        stream_events(spark, sf_dir)
        .select("event_id", "user_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_file_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    _drain_to_parquet(spark, sf_dir, out, ckpt)
    first = spark.read.parquet(out).count()
    assert first == n_events

    # restart with the same checkpoint: the source offset log says
    # everything is processed — the sink must not grow
    _drain_to_parquet(spark, sf_dir, out, ckpt)
    assert spark.read.parquet(out).count() == n_events

    # distinct event_ids prove no duplicate delivery, not just no net
    # growth
    assert spark.read.parquet(out).select("event_id").distinct().count() == n_events


def test_upsert_table_batch_semantics_and_time_travel(spark, tmp_path):
    """Inserts + updates land last-wins per key; old snapshots stay
    readable (time travel); in-batch last-wins follows order_col."""
    from pac_spark.sources.sinks import UpsertTable

    t = UpsertTable(spark, str(tmp_path / "tbl"), key="k", order_col="ts")
    b0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (2, 11, "b2")], ["k", "ts", "v"]
    )
    assert t.upsert(b0, "batch-0") is True
    got0 = {r["k"]: r["v"] for r in t.read().collect()}
    assert got0 == {1: "a", 2: "b2"}  # last-wins inside the batch

    b1 = spark.createDataFrame([(2, 12, "b3"), (3, 12, "c")], ["k", "ts", "v"])
    assert t.upsert(b1, "batch-1") is True
    assert {r["k"]: r["v"] for r in t.read().collect()} == {
        1: "a",
        2: "b3",
        3: "c",
    }
    # time travel: v0 still serves the pre-merge snapshot
    assert {r["k"]: r["v"] for r in t.read(version=0).collect()} == got0
    assert t.versions() == [0, 1]


def test_upsert_table_replay_is_noop(spark, tmp_path):
    """The exactly-once contract: re-applying a committed batch_id
    (what foreachBatch does after a crash) changes nothing — no new
    version, identical rows."""
    from pac_spark.sources.sinks import UpsertTable

    t = UpsertTable(spark, str(tmp_path / "tbl"), key="k", order_col="ts")
    b0 = spark.createDataFrame([(1, 1, "a")], ["k", "ts", "v"])
    b1 = spark.createDataFrame([(1, 2, "a2"), (2, 2, "b")], ["k", "ts", "v"])
    t.upsert(b0, 0)
    t.upsert(b1, 1)
    before = sorted(map(tuple, t.read().collect()))
    assert t.upsert(b1, 1) is False
    assert t.upsert(b0, 0) is False
    assert t.versions() == [0, 1]
    assert sorted(map(tuple, t.read().collect())) == before


def test_upsert_table_orphan_snapshot_ignored(spark, tmp_path):
    """Crash simulation: a data directory without its commit marker
    (crash between data write and marker) is invisible to readers and
    recovery overwrites it cleanly."""
    import os

    from pac_spark.sources.sinks import UpsertTable

    t = UpsertTable(spark, str(tmp_path / "tbl"), key="k", order_col="ts")
    t.upsert(spark.createDataFrame([(1, 1, "a")], ["k", "ts", "v"]), 0)
    # fake a crashed v1: data written, marker missing
    spark.createDataFrame([(9, 9, "ghost")], ["k", "ts", "v"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path / "tbl"), "v1"))
    assert t.versions() == [0]
    assert {r["k"] for r in t.read().collect()} == {1}
    # recovery: the next real batch claims v1, overwriting the orphan
    t.upsert(spark.createDataFrame([(2, 2, "b")], ["k", "ts", "v"]), 1)
    assert {r["k"] for r in t.read().collect()} == {1, 2}
    assert "ghost" not in {r["v"] for r in t.read().collect()}


def test_upsert_table_streaming_foreach_batch(spark, sf_dir, tmp_path):
    """End to end under Structured Streaming: the foreachBatch-
    maintained table equals the batch last-event-per-user oracle, and
    a restart on the same checkpoint leaves it untouched."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from pac_spark.sources.sinks import UpsertTable
    from pac_spark.streaming.stream_exec import stream_events

    t = UpsertTable(spark, str(tmp_path / "tbl"), key="user_id", order_col="event_id")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            stream_events(spark, sf_dir)
            .select("user_id", "event_id", "event_type", "value")
            .writeStream.foreachBatch(t.foreach_batch())
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    versions = t.versions()
    got = {
        r["user_id"]: (r["event_id"], r["event_type"])
        for r in t.read().collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy(F.desc("event_id"), F.desc("user_id"))
    want = {
        r["user_id"]: (r["event_id"], r["event_type"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want
    # restart: offsets say done -> no new commits
    drain()
    assert t.versions() == versions


def test_upsert_table_duplicate_order_ties_break_deterministically(
    spark, tmp_path
):
    """Duplicate (key, order_col) rows elect the SAME winner no matter
    the input order or partitioning: the tie falls through to the
    remaining columns' values (ADVICE r6 #3 — inside a per-key window
    the key itself can never break a tie). The NULL-permuted pair
    pins why a hash tie-break was not enough: xxhash64 skips NULLs,
    so (None, 'q') and ('q', None) would have collided."""
    from pac_spark.sources.sinks import UpsertTable

    rows = [
        (1, 10, "x", "m"),
        (1, 10, "y", "n"),
        (1, 10, "z", "o"),
        (2, 5, "a", "p"),
        (3, 7, None, "q"),
        (3, 7, "q", None),
    ]
    winners = set()
    for i, perm in enumerate((rows, rows[::-1], rows[3:] + rows[:3])):
        t = UpsertTable(
            spark, str(tmp_path / f"tbl{i}"), key="k", order_col="ts"
        )
        df = spark.createDataFrame(
            perm, "k long, ts long, v string, w string"
        ).repartition(7)
        assert t.upsert(df, "b0") is True
        got = {r["k"]: (r["v"], r["w"]) for r in t.read().collect()}
        assert got[2] == ("a", "p")
        winners.add((got[1], got[3]))
    assert len(winners) == 1, f"nondeterministic tie winner: {winners}"
