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
