"""Registry entries + DuckDB oracles for the scale-technique queries:
skew-salted join and bucketed-layout join. Each oracle states the
PLAIN semantics (ordinary join SQL) — hash equality is the proof that
the scale technique is invisible to results.
"""

from __future__ import annotations

from pac_spark.functions.exact import money_sum_sql
from pac_spark.operators import scale as SC
from pac_spark.operators import sketch as SK
from pac_spark.operators import spatial as SP
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

# plain aggregate over the ORIGINAL table: hash equality proves the
# fragment -> compact rewrite changed layout only, never content
_COMPACTION_ROUNDTRIP = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_events,
       {money_sum_sql('value')} AS total_value,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# promoted from plans/queued.py in the r5 rotation (VERDICT r4 next-#1)
_SKEW = f"""
WITH c AS (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1),
t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
SELECT user_id,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST((n_rows * 1000) // total AS BIGINT) AS share_permille,
       CAST((n_rows * 100) // (total // n_keys) AS BIGINT) AS uniform_ratio_pct
FROM c, t
ORDER BY n_rows DESC, user_id
LIMIT {SC.SKEW_TOP_N}
"""

# same proof shape as _COMPACTION_ROUNDTRIP, but selective on the 2-D
# box the Morton layout clusters for: the oracle reads the ORIGINAL
# table, so hash equality proves the curve rewrite is content-invisible
_ZORDER_ROUNDTRIP = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {money_sum_sql('value')} AS box_value,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
WHERE user_id BETWEEN {SC._ZBOX_USER_LO} AND {SC._ZBOX_USER_HI}
  AND value BETWEEN {SC._ZBOX_VALUE_LO} AND {SC._ZBOX_VALUE_HI}
GROUP BY event_type
ORDER BY event_type
"""

# plain join + aggregate over the ORIGINAL tables: hash equality
# proves the bloom pre-filter admitted every true match and the join
# removed every false positive
_BLOOM_PRUNED = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '{SC._BLOOM_PRIORITY}'
  AND o_totalprice > {SC._BLOOM_MIN_TOTAL}
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

SPECS = [
    QuerySpec("salted_events_join", SC.salted_events_join, _SALTED_EVENTS),
    QuerySpec("bloom_pruned_orders_join", SC.bloom_pruned_orders_join, _BLOOM_PRUNED),
    QuerySpec("bucketed_orders_join", SC.bucketed_orders_join, _BUCKETED_ORDERS),
    QuerySpec("compaction_roundtrip", SC.compaction_roundtrip, _COMPACTION_ROUNDTRIP),
    QuerySpec("zorder_roundtrip", SC.zorder_roundtrip, _ZORDER_ROUNDTRIP),
    QuerySpec("key_skew_report", SC.key_skew_report, _SKEW),
    QuerySpec("cms_user_heavy_hitters", SK.cms_user_heavy_hitters, SK.CMS_HH_SQL()),
    # registered in the r9 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "hll_distinct_customers_by_priority",
        SK.hll_distinct_customers_by_priority,
        SK.HLL_SQL,
    ),
    QuerySpec(
        "rolling_7d_distinct_users_hll",
        SK.rolling_7d_distinct_users_hll,
        SK.ROLLING_HLL_SQL,
    ),
    QuerySpec("kmv_nation_part_overlap", SK.kmv_nation_part_overlap, SK.KMV_SQL),
    # registered in the r10 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("ams_f2_user_activity", SK.ams_f2_user_activity, SK.AMS_SQL),
    QuerySpec(
        "ams_join_size_orders_events",
        SK.ams_join_size_orders_events,
        SK.AMS_JOIN_SQL,
    ),
    QuerySpec(
        "bitmap_distinct_users_daily",
        SK.bitmap_distinct_users_daily,
        SK.BITMAP_DISTINCT_SQL,
    ),
    QuerySpec(
        "spatial_customer_neighbors",
        SP.spatial_customer_neighbors,
        SP.SPATIAL_NEIGHBORS_SQL(),
    ),
]
