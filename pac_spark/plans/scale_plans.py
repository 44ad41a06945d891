"""Registry entries + DuckDB oracles for the scale-technique queries:
skew-salted join and bucketed-layout join. Each oracle states the
PLAIN semantics (ordinary join SQL) — hash equality is the proof that
the scale technique is invisible to results.
"""

from __future__ import annotations

from pac_spark.functions.exact import money_sum_sql
from pac_spark.operators import scale as SC
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]

_SALTED_EVENTS = """
WITH dim AS (
    SELECT DISTINCT event_type, upper(event_type) AS type_code FROM events
)
SELECT event_id, event_type, type_code, value
FROM events JOIN dim USING (event_type)
ORDER BY event_id
"""

_BUCKETED_ORDERS = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

SPECS = [
    QuerySpec("salted_events_join", SC.salted_events_join, _SALTED_EVENTS),
    QuerySpec("bucketed_orders_join", SC.bucketed_orders_join, _BUCKETED_ORDERS),
]
