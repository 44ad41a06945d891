"""Watermark semantics verified for real: a row arriving AFTER the
watermark has passed its window must be dropped from the stateful
aggregation — not just 'a watermark was declared'.

Shape: three incremental ``availableNow`` runs sharing one checkpoint
(the exactly-once restart pattern production file-sink jobs use; a
memory sink cannot recover a checkpoint). Run 1 advances the watermark
past the late row's window; run 2 delivers the late row (must be
dropped) plus an on-time row; run 3 advances the watermark far enough
to finalize every surviving window into the append-mode file sink. If
the late row had NOT been dropped, its window would finalize and
appear in the sink — the batch control shows exactly that window, so
its absence is streaming-time semantics, not data absence.

Observed while building this (Spark 4.1): within a SINGLE
``availableNow`` run split into micro-batches via ``maxFilesPerTrigger``,
late rows are NOT filtered even though the per-batch progress shows the
advanced watermark (``numRowsDroppedByWatermark`` stays 0) — the drop
engages when the watermark comes from the checkpoint, i.e. across
incremental runs, which is also the deployment shape that matters."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _write(spark, path: str, rows) -> None:
    df = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long")
    df.select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_once(spark, src: str, out: str, ckpt: str) -> None:
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .count()
        .select(
            F.date_format(F.col("window.start"), "HH:mm").alias("wstart"),
            F.col("count").alias("n"),
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermark_drops_late_rows_streaming_but_not_batch(spark, tmp_path):
    src = str(tmp_path / "late_events")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # run 1: watermark advances to 19:10
    _write(spark, src, [(1, "2024-01-01 20:00:00", 10), (2, "2024-01-01 20:10:00", 11)])
    _run_once(spark, src, out, ckpt)
    # run 2: a row 10+ hours behind the watermark + an on-time row
    _write(spark, src, [(3, "2024-01-01 09:00:00", 12), (4, "2024-01-01 20:30:00", 13)])
    _run_once(spark, src, out, ckpt)
    # run 3: push the watermark past 21:00 so surviving windows finalize
    _write(spark, src, [(5, "2024-01-01 22:30:00", 14)])
    _run_once(spark, src, out, ckpt)

    assert glob.glob(os.path.join(out, "*.parquet"))
    streamed = {
        r["wstart"]: r["n"] for r in spark.read.parquet(out).collect()
    }
    batched = {
        r["wstart"]: r["n"]
        for r in spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour"))
        .count()
        .select(
            F.date_format(F.col("window.start"), "HH:mm").alias("wstart"),
            F.col("count").alias("n"),
        )
        .collect()
    }
    # the batch control sees the late row's window...
    assert batched["09:00"] == 1
    # ...the stream dropped it: its window finalized empty = absent
    assert "09:00" not in streamed, streamed
    # on-time rows all survive and finalize
    assert streamed["20:00"] == 3 == batched["20:00"]


def _run_dedup_once(spark, src: str, out: str, ckpt: str) -> None:
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", F.date_format("ts", "HH:mm").alias("tss"))
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_dedup_horizon_contract(spark, sf_dir, tmp_path):
    """Decision record, SURVEY §2.9: streaming_dedup_events' stated
    semantics are 1-HOUR-HORIZON dedup, not global dedup. Two parts:

    (a) the registered oracle (global DISTINCT) is valid on the
        driver fixture because event_ids there are globally unique —
        assert that precondition on the real table;
    (b) the horizon boundary itself, on crafted multi-run data: a
        duplicate whose state the watermark has NOT yet evicted is
        dropped; a duplicate arriving after its state was evicted
        (its event time is more than the delay behind the watermark)
        is re-emitted — both survive in the sink.
    """
    # (a) fixture precondition the registered oracle relies on
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert ev.count() == ev.select("event_id").distinct().count()

    # (b) crafted horizon boundary across checkpointed incremental runs
    src = str(tmp_path / "dup_events")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # run 1: id=1 @10:00 and id=9 @13:00 -> watermark persists at 12:00
    _write(spark, src, [(1, "2024-01-01 10:00:00", 10), (9, "2024-01-01 13:00:00", 11)])
    _run_dedup_once(spark, src, out, ckpt)
    # run 2: a fresh later row ADVANCES the watermark 12:00 -> 13:30 —
    # the state store evicts only on watermark advance, so this is the
    # batch in which id=1 (expiry 11:00) is evicted while id=9
    # (expiry 14:00 > 13:30) stays live
    _write(spark, src, [(8, "2024-01-01 14:30:00", 12)])
    _run_dedup_once(spark, src, out, ckpt)
    # run 3: duplicates re-delivered with LATER event times (the
    # retry shape; a redelivery behind the watermark is dropped as
    # late data before dedup even sees it — verified while building
    # this). id=1 @15:00 — state evicted -> RE-EMITTED (the horizon);
    # id=9 @13:45 — state live until 14:00 -> DROPPED (dedup)
    _write(spark, src, [(1, "2024-01-01 15:00:00", 10), (9, "2024-01-01 13:45:00", 11)])
    _run_dedup_once(spark, src, out, ckpt)

    rows = [(r["event_id"], r["tss"]) for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == [
        (1, "10:00"),
        (1, "15:00"),
        (8, "14:30"),
        (9, "13:00"),
    ], rows
