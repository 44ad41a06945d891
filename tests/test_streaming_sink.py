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
