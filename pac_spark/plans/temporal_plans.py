"""Registry entries + DuckDB oracles for temporal joins and the
second relational wave (Q6/Q18-style, pivot, grouping sets)."""

from __future__ import annotations

from pac_spark.functions.exact import money_sum_sql
from pac_spark.operators import relational as R
from pac_spark.operators import temporal as T
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]

_Q6 = f"""
SELECT {money_sum_sql('l_extendedprice * l_discount', 4)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

_Q18 = f"""
WITH big AS (
    SELECT l_orderkey, {money_sum_sql('l_quantity')} AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING {money_sum_sql('l_quantity')} > 55
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

_PIVOT = """
SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY 1 ORDER BY day
"""

_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {money_sum_sql('o_totalprice')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""

_RANGE_BAND = f"""
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {money_sum_sql('l_quantity')} AS sum_qty,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN {T._bands_values_sql()}
  ON l_quantity >= lo AND l_quantity < hi
GROUP BY band ORDER BY band
"""

_TS6 = "%Y-%m-%d %H:%M:%S.%f"


def _sessions_cte(event_type: str, name: str, prefix: str) -> str:
    return f"""
{name}_flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                     - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                     > {T.SESSION_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events WHERE event_type = '{event_type}'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
{name} AS (
    SELECT user_id,
           MIN(ts) - INTERVAL {T.ATTRIBUTION_PAD_MIN} MINUTE AS {prefix}_start,
           MAX(ts) + INTERVAL {T.ATTRIBUTION_PAD_MIN} MINUTE AS {prefix}_end
    FROM (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess
        FROM {name}_flagged
    )
    GROUP BY user_id, sess
)"""


_INTERVAL_OVERLAP = f"""
WITH {_sessions_cte('view', 'views', 'a').strip()},
{_sessions_cte('click', 'clicks', 'b').strip()}
SELECT v.user_id,
       strftime(CAST(a_start AS TIMESTAMP), '{_TS6}') AS view_start,
       strftime(CAST(a_end AS TIMESTAMP), '{_TS6}') AS view_end,
       strftime(CAST(b_start AS TIMESTAMP), '{_TS6}') AS click_start,
       strftime(CAST(b_end AS TIMESTAMP), '{_TS6}') AS click_end,
       epoch_us(CAST(least(a_end, b_end) AS TIMESTAMP))
           - epoch_us(CAST(greatest(a_start, b_start) AS TIMESTAMP))
           AS overlap_micros
FROM views v
JOIN clicks c ON v.user_id = c.user_id
             AND a_start <= b_end AND b_start <= a_end
ORDER BY v.user_id, view_start, click_start
"""

_FUNNEL = f"""
WITH e AS (
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
v AS (
    SELECT user_id, MIN(ts) AS t_view FROM e
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT v.user_id,
       strftime(t_view, '{_TS6}') AS view_ts,
       strftime(t_click, '{_TS6}') AS click_ts,
       strftime(t_purchase, '{_TS6}') AS purchase_ts,
       t_click IS NOT NULL AS reached_click,
       t_purchase IS NOT NULL AS reached_purchase,
       epoch_us(t_purchase) - epoch_us(t_view) AS view_to_purchase_micros
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
"""

# the same dense grid (generate_series) + zero-fill + IGNORE NULLS
# forward-fill the Spark side builds with sequence/explode + last()
_GAPFILL = """
WITH h AS (
    SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
    FROM events GROUP BY 1, 2
),
s AS (SELECT user_id, MIN(hour) AS lo, MAX(hour) AS hi FROM h GROUP BY 1),
g AS (
    SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
    FROM s
),
j AS (
    SELECT g.user_id, g.hour, h.n, h.cents
    FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hour = h.hour
)
SELECT user_id,
       strftime(hour, '%Y-%m-%d %H:00') AS hour_str,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(cents, 0) / 100.0 AS DOUBLE) AS hour_value,
       CAST(last_value(cents IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) / 100.0 AS DOUBLE) AS carry_value
FROM j
ORDER BY user_id, hour_str
"""

SPECS = [
    QuerySpec("timeseries_gapfill_hourly", T.timeseries_gapfill_hourly, _GAPFILL),
    QuerySpec("interval_overlap_join", T.interval_overlap_join, _INTERVAL_OVERLAP),
    QuerySpec("q6_forecast_revenue", R.q6_forecast_revenue, _Q6),
    QuerySpec("q18_large_orders", R.q18_large_orders, _Q18),
    QuerySpec("pivot_daily_event_counts", R.pivot_daily_event_counts, _PIVOT),
    QuerySpec("grouping_sets_revenue", R.grouping_sets_revenue, _GROUPING_SETS),
    QuerySpec("asof_join_purchase_click", T.asof_join_purchase_click, T.ASOF_ORACLE),
    QuerySpec("range_band_join_quantity", T.range_band_join_quantity, _RANGE_BAND),
    # promoted from the r4 queue in the r5 rotation (VERDICT r4 next-#1)
    QuerySpec("funnel_view_click_purchase", T.funnel_view_click_purchase, _FUNNEL),
    # registered in the r7 rotation after a round staged behind the
    # identical local 3-SF oracle gate (tests/test_staged_specs.py)
    QuerySpec("ohlc_bars_hourly", T.ohlc_bars_hourly, T.OHLC_SQL()),
    # registered in the r8 rotation after two rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "peak_concurrent_sessions",
        T.peak_concurrent_sessions,
        T.PEAK_CONCURRENCY_SQL,
    ),
    QuerySpec("top_session_paths", T.top_session_paths, T.SESSION_PATHS_SQL),
    QuerySpec("user_activity_streaks", T.user_activity_streaks, T.STREAKS_SQL),
    QuerySpec(
        "funnel_within_1h_view_click_purchase",
        T.funnel_within_1h_view_click_purchase,
        T.FUNNEL_WITHIN_SQL,
    ),
    # registered in the r9 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("daily_coverage_us", T.daily_coverage_us, T.COVERAGE_SQL),
    QuerySpec(
        "attribution_last_touch", T.attribution_last_touch, T.ATTRIBUTION_SQL
    ),
    # registered in the r10 rotation after rounds staged behind the
    # identical local 3-SF oracle gate (tests/test_staged_specs.py)
    QuerySpec(
        "time_weighted_value_by_user",
        T.time_weighted_value_by_user,
        T.TWA_SQL(),
    ),
    QuerySpec(
        "pattern_runs_view_click_purchase",
        T.pattern_runs_view_click_purchase,
        T.PATTERN_RUNS_SQL(),
    ),
    QuerySpec(
        "conversion_latency_by_hour",
        T.conversion_latency_by_hour,
        T.CONVERSION_LATENCY_SQL(),
    ),
    # registered in the r11 rotation after rounds staged behind the
    # identical local 3-SF oracle gate (tests/test_staged_specs.py)
    QuerySpec(
        "user_daily_features", T.user_daily_features, T.FEATURES_SQL
    ),
]
