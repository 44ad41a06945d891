"""Specs QUEUED for the next driver rotation.

The registry's enforced tail policy (tests/test_registry_policy.py)
forbids a zero-driver-green spec riding past the 50-row cap, and the
current rotation's slots are fully claimed by new/under-verified
specs. Queued specs run the IDENTICAL local oracle gate now
(tests/test_oracle_parity.py appends them to the checked list) and
move into their home module's SPECS + the registry hoist list when a
rotation slot frees up (their code paths gain two driver greens).
"""

from __future__ import annotations

from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS_QUEUED"]


_COHORT = """
WITH e AS (
    SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS w FROM events
),
f AS (SELECT user_id, MIN(w) AS w0 FROM e GROUP BY user_id),
a AS (SELECT DISTINCT user_id, w FROM e)
SELECT strftime(f.w0, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.w0, a.w) // 7 AS INT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


_TRANSITIONS = """
WITH e AS (
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
    FROM events
),
lagged AS (
    SELECT event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM e
),
pairs AS (
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions
    FROM lagged WHERE next_type IS NOT NULL
    GROUP BY 1, 2
),
rt AS (SELECT from_type, SUM(n_transitions) AS row_total FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type,
       CAST(p.n_transitions AS BIGINT) AS n_transitions,
       CAST((p.n_transitions * 1000) // rt.row_total AS BIGINT) AS permille
FROM pairs p JOIN rt ON p.from_type = rt.from_type
ORDER BY p.from_type, p.to_type
"""


_BASKET = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders_together
FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= {min_count}
ORDER BY n_orders_together DESC, part_a, part_b
"""


_ROLLING = """
WITH e AS (
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_events_1h,
       CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS sum_value_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


_SKEW = """
WITH c AS (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1),
t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
SELECT user_id,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST((n_rows * 1000) // total AS BIGINT) AS share_permille,
       CAST((n_rows * 100) // (total // n_keys) AS BIGINT) AS uniform_ratio_pct
FROM c, t
ORDER BY n_rows DESC, user_id
LIMIT 10
"""


def _specs() -> list[QuerySpec]:
    from pac_spark.operators import graph as G
    from pac_spark.operators import profile as P
    from pac_spark.operators import relational as R
    from pac_spark.operators import scale as SC
    from pac_spark.operators import scd as SD
    from pac_spark.streaming import stateful as ST
    from pac_spark.plans import llm_plans, temporal_plans

    orders_cols = [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ]
    return (
        temporal_plans.SPECS_QUEUED
        + llm_plans.SPECS_QUEUED
        + [
            QuerySpec(
                "profile_orders",
                P.profile_orders,
                P.PROFILE_SQL("orders", orders_cols),
            ),
            QuerySpec(
                "pagerank_trade_graph",
                G.pagerank_trade_graph,
                G.PAGERANK_SQL(),
            ),
            QuerySpec("scd2_customer_diff", SD.scd2_customer_diff, SD.SCD2_SQL()),
            QuerySpec("cohort_retention", R.cohort_retention, _COHORT),
            QuerySpec("key_skew_report", SC.key_skew_report, _SKEW),
            QuerySpec("rolling_1h_user_stats", R.rolling_1h_user_stats, _ROLLING),
            QuerySpec(
                "referential_integrity_report",
                P.referential_integrity_report,
                P.RI_SQL(),
            ),
            QuerySpec(
                "event_transition_matrix", R.event_transition_matrix, _TRANSITIONS
            ),
            QuerySpec(
                "streaming_user_lifetime_stats",
                ST.streaming_user_lifetime_stats,
                ST.LIFETIME_ORACLE,
            ),
            QuerySpec(
                "basket_part_pairs",
                R.basket_part_pairs,
                _BASKET.format(min_count=R.BASKET_MIN_COUNT),
            ),
        ]
    )


SPECS_QUEUED = _specs()
