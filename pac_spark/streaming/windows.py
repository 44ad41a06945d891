"""Event-time windowing over the ``events`` table.

The reference has no streaming at all (both pipelines are batch
run-to-completion scripts — SURVEY.md §2.9); this module supplies the
stream-shaped operator family the driver contract requires, in two
forms that share one logical definition:

- **batch equivalents** (these functions): the same window expressions
  evaluated over the parquet table, giving DuckDB-oracle-checkable
  semantics;
- **true streams** (``pac_spark.streaming.stream_exec``): the identical
  plan on ``readStream`` with watermarks, executed with an
  ``availableNow`` trigger. Streaming-vs-batch equivalence is asserted
  in tests — Structured Streaming's guarantee, used as a self-oracle.

Window start alignment is Spark's: epoch-aligned (1970-01-01 UTC), so a
"1 hour" tumbling window is ``date_trunc('hour')`` and a 1h/30m sliding
window family has starts at every multiple of 30 min. Outputs format
timestamps as strings for engine portability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.functions.exact import money_sum

__all__ = [
    "tumbling_1h_by_type",
    "sliding_1h_30m_by_type",
    "session_windows_10m",
    "with_session_ids",
    "SESSION_GAP_MIN",
    "SESSION_GAP_US",
    "windowed_agg",
    "TS_FMT",
]

TS_FMT = "yyyy-MM-dd HH:mm:ss"

# THE session-gap knob — temporal.SESSION_GAP_MIN re-exports this so
# the batch sessionizer, the interval-overlap attribution join, and
# every oracle interpolating the minutes form stay on one constant
SESSION_GAP_MIN = 10
SESSION_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


def with_session_ids(events: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """THE canonical 10-minute-gap sessionization, shared by every
    batch consumer (``session_windows_10m``, peak concurrency, path
    mining — code-review r6: three drifting copies collapsed to one):
    classic gaps-and-islands — a break is a gap > 10 min from the same
    user's previous event under the total (ts, event_id) order; the
    running break count is the session id. Output:
    (user_id, ts, event_id, *carry, sid). All integer-microsecond
    arithmetic — deterministic at any partitioning."""
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(order)
    is_break = F.when(
        prev_us.isNull() | ((us - prev_us) > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    return events.select(
        "user_id", "ts", "event_id", *carry, F.sum(is_break).over(run).alias("sid")
    )


def _window_bounds(win: Column) -> list[Column]:
    return [
        F.date_format(win.getField("start"), TS_FMT).alias("window_start"),
        F.date_format(win.getField("end"), TS_FMT).alias("window_end"),
    ]


def windowed_agg(events: DataFrame, duration: str, slide: str | None = None) -> DataFrame:
    """Shared logical plan for tumbling/sliding aggregation — used
    verbatim by both the batch and streaming paths."""
    win = F.window("ts", duration, slide) if slide else F.window("ts", duration)
    return (
        events.groupBy(win.alias("window"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            *_window_bounds(F.col("window")),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_1h_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: count + exact value sum per event type."""
    events = catalog.load(spark, sf_dir, "events")
    return windowed_agg(events, "1 hour").orderBy("window_start", "event_type")


def sliding_1h_30m_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30m — each event lands in exactly 2."""
    events = catalog.load(spark, sf_dir, "events")
    return windowed_agg(events, "1 hour", "30 minutes").orderBy(
        "window_start", "event_type"
    )


def session_windows_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 10-minute inactivity gap, batch form.

    Classic gaps-and-islands: a session break is a gap > 10 min from
    the previous event of the same user; the running count of breaks is
    the session id. All integer-microsecond arithmetic — deterministic.

    The streaming twin is ``F.session_window(ts, '10 minutes')`` (see
    stream_exec.session_stream) — same construction, incremental
    state, but NOT bit-identical semantics at the exact-gap boundary:
    this batch rule breaks on gap STRICTLY greater than 10 min while
    ``session_window`` splits at gap >= 10 min (half-open windows), so
    an event exactly 600s after its predecessor shares a session here
    and starts a new one there. The two oracles deliberately encode
    that difference ('>' vs '>='); do not "unify" one to the other
    (code-review r8 — the earlier 'same sessions' wording invited
    exactly that break).
    """
    events = catalog.load(spark, sf_dir, "events")
    with_session = with_session_ids(events, carry=("value",)).withColumnRenamed(
        "sid", "session_id"
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
            F.count("*").alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )
