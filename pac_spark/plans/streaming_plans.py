"""Registry entries + oracles for event-time windowing (batch and
true-streaming forms share oracles where the result is deterministic)."""

from __future__ import annotations

from pac_spark.functions.exact import money_sum_sql
from pac_spark.operators.relational import DAILY_USERS_SQL, GROWTH_SQL
from pac_spark.operators.sketch import BITMAP_DISTINCT_SQL, CMS_HH_SQL
from pac_spark.operators.stats import EWMA_SQL, HALFLIFE_SQL
from pac_spark.operators.temporal import OHLC_SQL, TWA_SQL
from pac_spark.plans.llm_plans import _INCREMENTAL
from pac_spark.plans.spec import QuerySpec
from pac_spark.streaming import stateful, stream_exec, windows

__all__ = ["SPECS"]

_FMT = "%Y-%m-%d %H:%M:%S"
_VAL = money_sum_sql("value")

_TUMBLING = f"""
WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
SELECT strftime(date_trunc('hour', ts), '{_FMT}') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '{_FMT}') AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_VAL} AS sum_value
FROM e
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""

# each event belongs to exactly 2 windows of the 1h-every-30m family:
# starts at floor(epoch/1800)*1800 and 1800s earlier
_SLIDING = f"""
WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
w AS (
    SELECT event_type, value,
           make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000) AS wstart
    FROM e
    UNION ALL
    SELECT event_type, value,
           make_timestamp((CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800) * 1000000) AS wstart
    FROM e
)
SELECT strftime(wstart, '{_FMT}') AS window_start,
       strftime(wstart + INTERVAL 1 HOUR, '{_FMT}') AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_VAL} AS sum_value
FROM w
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""

_SESSION_BATCH = f"""
WITH e AS (
    SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
), lagged AS (
    SELECT *, epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM e
), b AS (
    SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 600000000 THEN 1 ELSE 0 END AS brk
    FROM lagged
), s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM b
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       strftime(MIN(ts), '{_FMT}') AS session_start,
       strftime(MAX(ts), '{_FMT}') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_VAL} AS sum_value
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""

# session_window semantics: end = last event + gap; merge while the next
# event starts strictly before current end — so a gap-equal event
# (exactly 600s) SPLITS, the half-open-window rule the `>=` below
# encodes (windows.py docstring litigates this boundary; the batch
# sessionizer's `>` rule is the deliberately-different twin)
_SESSION_STREAM = f"""
WITH e AS (
    SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
), lagged AS (
    SELECT *, epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM e
), b AS (
    SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 600000000 THEN 1 ELSE 0 END AS brk
    FROM lagged
), s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM b
)
SELECT user_id,
       strftime(MIN(ts), '{_FMT}') AS session_start,
       strftime(MAX(ts) + INTERVAL 10 MINUTE, '{_FMT}') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_VAL} AS sum_value
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""

_STREAM_DEDUP = """
WITH d AS (SELECT DISTINCT event_id, event_type FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique_events
FROM d GROUP BY event_type ORDER BY event_type
"""

_TS6 = "%Y-%m-%d %H:%M:%S.%f"

_STREAM_PC_JOIN = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(CAST(p.ts AS TIMESTAMP), '{_TS6}') AS purchase_ts,
       c.event_id AS click_id,
       strftime(CAST(c.ts AS TIMESTAMP), '{_TS6}') AS click_ts
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""

_STREAM_ENRICHED = f"""
WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events),
j AS (
    SELECT e.ts, e.value, c.c_mktsegment AS segment
    FROM e JOIN customer c ON e.user_id = c.c_custkey
)
SELECT strftime(date_trunc('hour', ts), '{_FMT}') AS window_start,
       segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_VAL} AS sum_value
FROM j
GROUP BY 1, 2
ORDER BY window_start, segment
"""

SPECS = [
    QuerySpec("events_tumbling_1h", windows.tumbling_1h_by_type, _TUMBLING),
    QuerySpec("events_sliding_1h_30m", windows.sliding_1h_30m_by_type, _SLIDING),
    QuerySpec("events_sessions_10m", windows.session_windows_10m, _SESSION_BATCH),
    QuerySpec("streaming_tumbling_1h", stream_exec.streaming_tumbling_1h, _TUMBLING),
    QuerySpec("streaming_sliding_1h_30m", stream_exec.streaming_sliding_1h_30m, _SLIDING),
    QuerySpec("streaming_sessions_10m", stream_exec.streaming_sessions_10m, _SESSION_STREAM),
    QuerySpec("streaming_dedup_events", stream_exec.streaming_dedup_events, _STREAM_DEDUP),
    QuerySpec(
        "streaming_user_sessions_custom",
        stateful.streaming_user_sessions_custom,
        stateful.CUSTOM_SESSIONS_ORACLE,
    ),
    QuerySpec(
        "streaming_purchase_click_join",
        stream_exec.streaming_purchase_click_join,
        _STREAM_PC_JOIN,
    ),
    QuerySpec(
        "streaming_enriched_by_segment",
        stream_exec.streaming_enriched_by_segment,
        _STREAM_ENRICHED,
    ),
    QuerySpec(
        "streaming_neardup_admission",
        stream_exec.streaming_neardup_admission,
        # the streaming admission shares the batch incremental-dedup
        # oracle — Structured Streaming's exactly-once drain makes the
        # results identical
        _INCREMENTAL,
    ),
    # promoted from plans/queued.py in the r5 rotation (VERDICT r4 next-#1)
    QuerySpec(
        "streaming_user_lifetime_stats",
        stateful.streaming_user_lifetime_stats,
        stateful.LIFETIME_ORACLE,
    ),
    # the oracle is deliberately the BATCH sketch oracle: hash equality
    # proves the micro-batch-merged sketch is bit-identical to the
    # single-pass build
    QuerySpec(
        "streaming_cms_heavy_hitters",
        stream_exec.streaming_cms_heavy_hitters,
        CMS_HH_SQL(),
    ),
    # registered in the r7 rotation after a round staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "streaming_ivm_user_value",
        stateful.streaming_ivm_user_value,
        stateful.STREAMING_IVM_ORACLE,
    ),
    # the oracle is deliberately the BATCH candlestick oracle
    # (temporal.OHLC_SQL): hash equality proves the monoid-merged
    # micro-batch maintenance equals the one-shot window build
    QuerySpec(
        "streaming_ohlc_bars",
        stateful.streaming_ohlc_bars,
        OHLC_SQL(),
    ),
    # registered in the r8 rotation after a round staged behind the
    # identical local 3-SF oracle gate (tests/test_staged_specs.py).
    # The oracle is deliberately the BATCH growth-accounting oracle
    # (relational.DAILY_USERS_SQL): hash equality proves the per-micro-
    # batch state fold equals the one-shot day-over-day read-off
    QuerySpec(
        "streaming_user_accounting",
        stateful.streaming_user_accounting,
        DAILY_USERS_SQL,
    ),
    # registered in the r9 rotation after rounds staged behind the
    # identical local 3-SF oracle gate (tests/test_staged_specs.py).
    # The oracle is deliberately the BATCH lag-chain oracle
    # (stats.EWMA_SQL): hash equality proves the stream-maintained
    # per-user EWMA state read-off equals the one-shot batch recursion
    QuerySpec(
        "streaming_ewma_user_value",
        stateful.streaming_ewma_user_value,
        EWMA_SQL,
    ),
    # registered in the r10 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py).
    # streaming_bitmap's oracle is deliberately the batch tier's
    # INDEPENDENT plain COUNT(DISTINCT) formulation; streaming_kmv's
    # is the one-shot SQL sketch reconstruction — hash equality proves
    # the per-micro-batch monoid folds equal the batch read-offs
    QuerySpec(
        "streaming_bitmap_distinct_users",
        stateful.streaming_bitmap_distinct_users,
        BITMAP_DISTINCT_SQL,
    ),
    QuerySpec(
        "streaming_kmv_distinct_users",
        stateful.streaming_kmv_distinct_users,
        stateful.STREAMING_KMV_SQL,
    ),
    # registered in the r11 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py).
    # Each streaming twin's oracle is deliberately its BATCH
    # counterpart's formulation: hash equality proves the per-micro-
    # batch state fold equals the one-shot batch read-off
    QuerySpec(
        "streaming_growth_accounting",
        stateful.streaming_growth_accounting,
        GROWTH_SQL,
    ),
    QuerySpec(
        "streaming_purchase_click_left_join",
        stream_exec.streaming_purchase_click_left_join,
        stream_exec.STREAM_PC_LEFT_ORACLE,
    ),
    QuerySpec(
        "streaming_twa_user_value",
        stateful.streaming_twa_user_value,
        TWA_SQL(),
    ),
    QuerySpec(
        "streaming_halflife_user_value",
        stateful.streaming_halflife_user_value,
        HALFLIFE_SQL(),
    ),
]
