"""Registry entries + DuckDB oracles for the exact order-statistics
operators (``operators.stats``). Both oracles state the IDENTICAL
histogram + cumulative read-off construction the Spark side runs —
``cum * 100 >= p * n`` in pure integers — so hash equality proves the
discrete-percentile semantics engine-portably (no reliance on either
engine's built-in quantile interpolation flavor).
"""

from __future__ import annotations

from pac_spark.operators import stats as ST
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]

_PCT_COLS = ",\n       ".join(
    f"MIN(CASE WHEN cum * 100 >= {p} * n THEN v END) AS p{p}" for p in ST.PCTS
)

_PERCENTILES = f"""
WITH h AS (
    -- NULL measurements excluded in BOTH engines (the
    -- group_percentiles_disc contract): a counted-but-unselectable
    -- NULL would shift every threshold, and the engines disagree on
    -- NULL sort order
    SELECT l_returnflag, l_extendedprice AS v, COUNT(*) AS c
    FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
),
w AS (
    SELECT l_returnflag, v,
           SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER (PARTITION BY l_returnflag) AS n
    FROM h
)
SELECT l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n_values,
       {_PCT_COLS}
FROM w GROUP BY l_returnflag ORDER BY l_returnflag
"""


def _bounds_ctes(tag: str, metric: str) -> str:
    """The three-quartile-boundary CTE chain for one RFM metric."""
    return f"""
{tag}h AS (SELECT {metric} AS v, COUNT(*) AS c FROM pc GROUP BY 1),
{tag}w AS (
    SELECT v,
           SUM(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER () AS n
    FROM {tag}h
),
{tag}b AS (
    SELECT MIN(CASE WHEN cum * 100 >= 25 * n THEN v END) AS q1,
           MIN(CASE WHEN cum * 100 >= 50 * n THEN v END) AS q2,
           MIN(CASE WHEN cum * 100 >= 75 * n THEN v END) AS q3
    FROM {tag}w
)"""


def _score_sql(value: str, tag: str) -> str:
    return (
        f"CAST(1 + CASE WHEN {value} > {tag}b.q1 THEN 1 ELSE 0 END"
        f" + CASE WHEN {value} > {tag}b.q2 THEN 1 ELSE 0 END"
        f" + CASE WHEN {value} > {tag}b.q3 THEN 1 ELSE 0 END AS INT)"
    )


_RFM = f"""
WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
pc AS (
    SELECT o_custkey,
           MIN(date_diff('day', o_orderdate, maxd)) AS recency_days,
           COUNT(*) AS frequency,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders, mx GROUP BY o_custkey
),{_bounds_ctes('r', 'recency_days')},{_bounds_ctes('f', 'frequency')},{_bounds_ctes('m', 'cents')}
SELECT o_custkey AS custkey,
       CAST(recency_days AS INT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(cents / 100.0 AS DOUBLE) AS monetary,
       {_score_sql('recency_days', 'r')} AS r_score,
       {_score_sql('frequency', 'f')} AS f_score,
       {_score_sql('cents', 'm')} AS m_score,
       CAST(({_score_sql('recency_days', 'r')}) * 100
            + ({_score_sql('frequency', 'f')}) * 10
            + ({_score_sql('cents', 'm')}) AS INT) AS rfm_cell
FROM pc, rb, fb, mb
ORDER BY custkey
"""

_MAD = f"""
WITH hist AS (
    -- NULL prices excluded in BOTH engines (same contract as the
    -- percentile oracle above; the Spark side filters identically)
    SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
           COUNT(*) AS c
    FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
),
hc AS (
    SELECT l_returnflag, cents,
           SUM(c) OVER (PARTITION BY l_returnflag ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER (PARTITION BY l_returnflag) AS n
    FROM hist
),
med AS (
    SELECT l_returnflag,
           MIN(CASE WHEN cum * 100 >= 50 * n THEN cents END) AS med_cents
    FROM hc GROUP BY l_returnflag
),
dev_hist AS (
    SELECT h.l_returnflag, ABS(h.cents - m.med_cents) AS dev, SUM(h.c) AS c
    FROM hist h JOIN med m USING (l_returnflag)
    GROUP BY 1, 2
),
dc AS (
    SELECT l_returnflag, dev,
           SUM(c) OVER (PARTITION BY l_returnflag ORDER BY dev
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER (PARTITION BY l_returnflag) AS n
    FROM dev_hist
),
mad AS (
    SELECT l_returnflag,
           MIN(CASE WHEN cum * 100 >= 50 * n THEN dev END) AS med_dev
    FROM dc GROUP BY l_returnflag
),
agg AS (
    SELECT d.l_returnflag,
           CAST(SUM(d.c) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN d.dev > {ST.MAD_K} * a.med_dev THEN d.c
                         ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev_hist d JOIN mad a USING (l_returnflag)
    GROUP BY d.l_returnflag
)
SELECT g.l_returnflag, g.n_items,
       CAST(m.med_cents / 100.0 AS DOUBLE) AS median_price,
       CAST(a.med_dev / 100.0 AS DOUBLE) AS mad_price,
       g.n_outliers,
       CAST(g.n_outliers * 1000 // g.n_items AS BIGINT) AS outlier_permille
FROM agg g JOIN med m USING (l_returnflag) JOIN mad a USING (l_returnflag)
ORDER BY g.l_returnflag
"""

SPECS = [
    QuerySpec(
        "percentiles_price_by_flag", ST.percentiles_price_by_flag, _PERCENTILES
    ),
    QuerySpec("rfm_customer_segments", ST.rfm_customer_segments, _RFM),
    QuerySpec("mad_outliers_by_flag", ST.mad_outliers_by_flag, _MAD),
    # registered in the r7 rotation after a round staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("welch_ab_value_by_hour", ST.welch_ab_value_by_hour, ST.WELCH_AB_SQL()),
    QuerySpec("cusum_user_value_shift", ST.cusum_user_value_shift, ST.CUSUM_SQL()),
    QuerySpec(
        "winsorized_price_stats_by_flag",
        ST.winsorized_price_stats_by_flag,
        ST.WINSOR_SQL(),
    ),
    QuerySpec("seasonal_anomaly_days", ST.seasonal_anomaly_days, ST.SEASONAL_SQL()),
    QuerySpec("trend_slope_by_type", ST.trend_slope_by_type, ST.TREND_SQL()),
    # registered in the r8 rotation after two rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("ks_test_price_by_flag", ST.ks_test_price_by_flag, ST.KS_SQL),
    QuerySpec(
        "budget_allocation_by_nation",
        ST.budget_allocation_by_nation,
        ST.ALLOC_SQL,
    ),
    # registered in the r9 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "percentiles_cont_price_by_flag",
        ST.percentiles_cont_price_by_flag,
        ST.PCT_CONT_SQL,
    ),
    QuerySpec("ewma_user_value", ST.ewma_user_value, ST.EWMA_SQL),
    # registered in the r10 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "cramers_v_lang_source", ST.cramers_v_lang_source, ST.CRAMERS_V_SQL()
    ),
    QuerySpec(
        "mann_kendall_by_type", ST.mann_kendall_by_type, ST.MANN_KENDALL_SQL()
    ),
    QuerySpec("acf_daily_revenue", ST.acf_daily_revenue, ST.ACF_SQL()),
    QuerySpec(
        "daily_event_mix_drift", ST.daily_event_mix_drift, ST.MIX_DRIFT_SQL()
    ),
    QuerySpec(
        "theilsen_trend_by_type", ST.theilsen_trend_by_type, ST.THEILSEN_SQL()
    ),
    # registered in the r11 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "weighted_percentiles_price_by_flag",
        ST.weighted_percentiles_price_by_flag,
        ST.WEIGHTED_PCT_SQL(),
    ),
    QuerySpec(
        "halflife_decayed_user_value",
        ST.halflife_decayed_user_value,
        ST.HALFLIFE_SQL(),
    ),
]
