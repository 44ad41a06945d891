"""Exact distributed order statistics: percentiles and quantile-bucket
scoring without a global sort.

Spark ships two aggregate routes to a percentile and neither survives
100 TB cleanly: ``percentile_approx`` is approximate (not
oracle-matchable), and ``percentile`` buffers every value of a group
in one aggregation buffer. The scalable exact route is the
HISTOGRAM one used here:

1. one map-side-combined ``groupBy(keys, value).count()`` — the only
   pass over raw rows; its output is bounded by the VALUE DOMAIN per
   group (prices, day counts, order counts), not by row count;
2. a cumulative-count window over that (small) histogram;
3. each requested percentile read off with pure integer comparisons:
   ``percentile_disc(p)`` = the smallest value whose cumulative count
   satisfies ``cum * 100 >= p * n`` — no ceil(), no float fraction,
   so the DuckDB oracle (same CTEs) matches hash-exactly.

The same machinery yields scalable quantile-bucket SCORING (the RFM
segmentation below): instead of ranking every row with a global NTILE
window (one task per metric at scale), derive the three quartile
BOUNDARIES from the histogram and assign each row's score with two
broadcast comparisons — same result semantics (score k = 1 + number
of quartile boundaries strictly below the value), no global sort
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.functions.exact import int_div

__all__ = [
    "cramers_v_lang_source",
    "weighted_percentiles_price_by_flag",
    "WEIGHTED_PCT_SQL",
    "CRAMERS_V_SQL",
    "group_percentiles_disc",
    "mad_outliers_by_flag",
    "percentiles_price_by_flag",
    "rfm_customer_segments",
    "welch_ab_value_by_hour",
    "WELCH_AB_SQL",
    "cusum_user_value_shift",
    "CUSUM_SQL",
    "winsorized_price_stats_by_flag",
    "WINSOR_SQL",
    "seasonal_anomaly_days",
    "SEASONAL_SQL",
    "trend_slope_by_type",
    "TREND_SQL",
    "ks_test_price_by_flag",
    "KS_SQL",
    "budget_allocation_by_nation",
    "ALLOC_SQL",
    "ALLOC_BUDGET",
    "group_percentiles_cont",
    "percentiles_cont_price_by_flag",
    "PCT_CONT_SQL",
    "theilsen_trend_by_type",
    "THEILSEN_SQL",
    "daily_event_mix_drift",
    "MIX_DRIFT_SQL",
    "mann_kendall_by_type",
    "MANN_KENDALL_SQL",
    "acf_daily_revenue",
    "ACF_SQL",
    "ACF_MAX_LAG",
    "PCTS",
    "ewma_user_value",
    "halflife_decayed_user_value",
    "HALFLIFE_SQL",
    "EWMA_SQL",
    "EWMA_SPAN",
    "jackknife_se_price_by_priority",
    "JACKKNIFE_SQL",
    "JK_BUCKETS",
]

PCTS = (25, 50, 75, 90, 99)


def group_percentiles_disc(
    df: DataFrame,
    group_cols: list[str],
    value: str,
    pcts: tuple[int, ...] = PCTS,
    weight: Column | None = None,
    bucket: Column | None = None,
) -> DataFrame:
    """Exact discrete percentiles of ``value`` per group, histogram
    route. Output: group cols + ``n_values`` + one ``p{p}`` column per
    requested percentile.

    With ``weight`` (an integer Column), the histogram accumulates
    weights instead of row counts and ``n_values`` is the total
    weight: the read-off ``cum·100 ≥ p·n`` is unchanged — weighted
    discrete percentiles ARE the count read-off over the weighted
    histogram (each row standing for ``weight`` unit rows).

    NULL measurements are EXCLUDED, matching SQL aggregate semantics —
    counting them into ``n`` while never being selectable would shift
    every threshold, and the two engines disagree on NULL sort order
    (Spark NULLS FIRST vs DuckDB NULLS LAST), so any other treatment
    is engine-divergent. Oracles over possibly-NULL columns must state
    the same ``WHERE v IS NOT NULL``.

    The window partitions by the group key over DISTINCT values — the
    one structural cost; its input is the histogram, whose size per
    group is bounded by the value domain. For unbounded-domain values
    at extreme scale, the same read-off works on a two-level histogram
    (coarse bucket pass then in-bucket pass, as
    ``text.lang_quality_quantiles`` does approximately); this operator
    keeps single-level exactness. For an UNGROUPED call pass
    ``bucket`` (any Column monotone in ``value``): the cumulative
    counts then ride the two-phase global prefix scan
    (:func:`pac_spark.functions.prefix.global_running_sums`) instead
    of a single-task unpartitioned window over the histogram.
    """
    hist = (
        df.filter(F.col(value).isNotNull())
        .groupBy(*group_cols, value)
        .agg((F.count("*") if weight is None else F.sum(weight)).alias("_c"))
    )
    if bucket is not None and not group_cols:
        from pac_spark.functions.prefix import global_running_sums

        run = global_running_sums(hist, value, ["_c"], bucket)
        total = hist.agg(F.sum("_c").alias("_n"))
        with_cum = run.join(F.broadcast(total)).select(
            F.col(value),
            F.col("run__c").alias("_cum"),
            "_n",
        )
    else:
        cum_w = (
            W.partitionBy(*group_cols)
            .orderBy(value)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        with_cum = hist.select(
            *group_cols,
            F.col(value),
            F.sum("_c").over(cum_w).alias("_cum"),
            F.sum("_c").over(W.partitionBy(*group_cols)).alias("_n"),
        )
    aggs = [F.max("_n").alias("n_values")] + [
        F.min(
            F.when(F.col("_cum") * 100 >= F.lit(p) * F.col("_n"), F.col(value))
        ).alias(f"p{p}")
        for p in pcts
    ]
    return with_cum.groupBy(*group_cols).agg(*aggs)


def percentiles_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: exact p25/p50/p75/p90/p99 of ``l_extendedprice``
    per return flag. The driver hash-checks against a DuckDB oracle
    stating the identical histogram + cumulative read-off, so the
    discrete-percentile semantics are proven engine-portable (built-in
    ``quantile_disc``/``percentile`` interpolation variants are
    exactly what this construction avoids depending on)."""
    li = catalog.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    return group_percentiles_disc(
        li, ["l_returnflag"], "l_extendedprice"
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# RFM segmentation


def _quartile_bounds(df: DataFrame, metric: Column, name: str) -> DataFrame:
    """1-row frame of the p25/p50/p75 discrete boundaries of a metric —
    :func:`group_percentiles_disc` with an empty group key (ONE
    implementation of the cum*100 >= p*n read-off, not a parallel
    copy; code-review r6 #6), outputs renamed to ``{name}_q1..q3``.

    The monetary metric's histogram is ~|customers| rows (lifetime
    cents are near-unique), so the ungrouped cumulative rides the
    two-phase prefix scan via ``bucket`` — a single-task window over
    per-customer cardinality is exactly the scale-killer
    ``functions/prefix.py`` exists for (code-review r7). The bucket
    width is harmless for the small-domain metrics (days, order
    counts): one bucket ≡ one domain-bounded in-bucket window."""
    pcts = (25, 50, 75)
    bounds = group_percentiles_disc(
        df.select(metric.cast("long").alias("_v")),
        [],
        "_v",
        pcts,
        bucket=int_div(F.col("_v"), F.lit(1_000_000)),
    )
    return bounds.select(
        *[
            F.col(f"p{p}").alias(f"{name}_q{i + 1}")
            for i, p in enumerate(pcts)
        ]
    )


def _score(value: Column, name: str) -> Column:
    """Quartile score 1..4: 1 + number of quartile boundaries strictly
    below the value. Boundary ties land in the LOWER bucket (<=), the
    deterministic convention both engines state identically."""
    return (
        F.lit(1)
        + F.when(value > F.col(f"{name}_q1"), 1).otherwise(0)
        + F.when(value > F.col(f"{name}_q2"), 1).otherwise(0)
        + F.when(value > F.col(f"{name}_q3"), 1).otherwise(0)
    ).cast("int")


def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation, the classic
    customer-analytics operator, scale-shaped:

    - per-customer metrics in ONE map-side-combined aggregate over
      orders: days since last order (against the corpus max date, one
      broadcast scalar), order count, exact-cents lifetime spend;
    - quartile boundaries per metric from the histogram machinery
      above (three 1-row frames, broadcast);
    - scores by comparison against the broadcast boundaries — no
      global NTILE window, no sort, no hot task.

    Score semantics: 1 + number of quartile boundaries strictly below
    the customer's value (ties sit in the lower bucket). ``rfm_cell``
    packs the three scores as r*100 + f*10 + m. Note recency scores
    4 = most days since last order (largest values), so the classic
    "best customer" cell is r=1, f=4, m=4.
    """
    from pac_spark.cache import pin

    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    maxd = orders.agg(F.max("o_orderdate").alias("_maxd"))
    # datediff(corpus max, orderdate), MIN over a customer's orders =
    # days since their LAST order
    per_cust = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("_maxd"), F.col("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "_cents"
            ),
        )
    )
    # pinned: the scan+aggregate feeds FOUR consumers (three boundary
    # frames + the scoring join) — without the persist each branch
    # re-executes the aggregation (code-review r6 #4)
    per_cust = pin(per_cust)
    r_b = _quartile_bounds(per_cust, F.col("recency_days"), "r")
    f_b = _quartile_bounds(per_cust, F.col("frequency"), "f")
    m_b = _quartile_bounds(per_cust, F.col("_cents"), "m")
    scored = (
        per_cust.crossJoin(F.broadcast(r_b))
        .crossJoin(F.broadcast(f_b))
        .crossJoin(F.broadcast(m_b))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("recency_days").cast("int").alias("recency_days"),
            F.col("frequency").cast("long").alias("frequency"),
            (F.col("_cents") / 100.0).cast("double").alias("monetary"),
            _score(F.col("recency_days"), "r").alias("r_score"),
            _score(F.col("frequency"), "f").alias("f_score"),
            _score(F.col("_cents"), "m").alias("m_score"),
        )
    )
    return scored.withColumn(
        "rfm_cell",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "int"
        ),
    ).orderBy("custkey")


MAD_K = 3  # the classic |x - median| > K * MAD outlier rule


def mad_outliers_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median, MAD (median absolute
    deviation), and the count of rows beyond ``MAD_K`` MADs — the
    rule that, unlike mean/stddev z-scores, is not dragged by the
    outliers it is trying to find.

    ONE scan of the table; every subsequent step runs on the
    (value-domain-bounded) histogram:

    - histogram = groupBy(flag, cents).count — the only pass over rows;
    - median per flag by the integer cumulative read-off;
    - the DEVIATION histogram is derived FROM the value histogram
      (|cents − median| keyed re-aggregation of counts), not from a
      second table scan;
    - MAD = median of the deviation histogram, same read-off;
    - outlier counts = conditional sums over the deviation histogram.

    All arithmetic integer cents, so the DuckDB oracle (same CTE
    chain) is hash-exact.
    """
    from pac_spark.cache import pin

    li = (
        catalog.load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        # NULL prices excluded in BOTH engines — a NULL cents group
        # would ride the cumulative read-off NULLS FIRST here but
        # NULLS LAST in DuckDB, moving the two medians oppositely
        .filter(F.col("cents").isNotNull())
    )
    hist = pin(
        li.groupBy("l_returnflag", "cents").agg(F.count("*").alias("c"))
    )

    def p50(frame: DataFrame, value: str) -> DataFrame:
        cum_w = (
            W.partitionBy("l_returnflag")
            .orderBy(value)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        with_cum = frame.select(
            "l_returnflag",
            F.col(value),
            F.sum("c").over(cum_w).alias("_cum"),
            F.sum("c").over(W.partitionBy("l_returnflag")).alias("_n"),
        )
        return with_cum.groupBy("l_returnflag").agg(
            F.min(
                F.when(F.col("_cum") * 100 >= 50 * F.col("_n"), F.col(value))
            ).alias(f"med_{value}"),
        )

    med = p50(hist, "cents")
    dev_hist = pin(
        hist.join(F.broadcast(med.select("l_returnflag", "med_cents")), "l_returnflag")
        .groupBy(
            "l_returnflag",
            F.abs(F.col("cents") - F.col("med_cents")).alias("dev"),
        )
        .agg(F.sum("c").alias("c"))
    )
    mad = p50(dev_hist, "dev")
    outliers = (
        dev_hist.join(
            F.broadcast(mad.select("l_returnflag", "med_dev")), "l_returnflag"
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum("c").alias("n_items"),
            F.sum(
                F.when(F.col("dev") > MAD_K * F.col("med_dev"), F.col("c")).otherwise(
                    F.lit(0)
                )
            ).alias("n_outliers"),
        )
    )
    return (
        outliers.join(F.broadcast(med.select("l_returnflag", "med_cents")), "l_returnflag")
        .join(F.broadcast(mad.select("l_returnflag", "med_dev")), "l_returnflag")
        .select(
            "l_returnflag",
            "n_items",
            (F.col("med_cents") / 100.0).cast("double").alias("median_price"),
            (F.col("med_dev") / 100.0).cast("double").alias("mad_price"),
            "n_outliers",
            F.expr("(n_outliers * 1000) div n_items").alias("outlier_permille"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Two-sample significance testing (A/B experiment readout)

AB_GROUP_A = "purchase"
AB_GROUP_B = "click"


def welch_ab_value_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic per hour-of-day comparing
    ``purchase`` vs ``click`` event values — the experiment-readout
    aggregate (unequal variances, unequal sample sizes) every A/B
    platform computes, with the Welch–Satterthwaite degrees of
    freedom alongside.

    Like the Pearson operator (``text.corr_quality_tokens_by_lang``),
    native ``stddev``/``var`` are not engine-portable: their streaming
    accumulation order differs between Spark's aggregation tree and a
    serial oracle. Both arms' moments (n, Σcents, Σcents²) are exact
    integer sums accumulated in decimal(38,0) — associative at any
    partition count, bounded far past any real group size — gathered
    by CONDITIONAL aggregation in ONE map-side-combined groupBy (no
    per-arm join, one shuffle total); the t/df formulas then run as
    one identical double expression on both engines, so the statistic
    is bit-exact. Groups need n ≥ 2 in both arms (stated in the
    oracle's HAVING).
    """
    ev = catalog.load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(AB_GROUP_A, AB_GROUP_B)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    is_a = F.col("event_type") == AB_GROUP_A
    dec = "decimal(38,0)"

    def arm(flag: Column, expr: Column) -> Column:
        return F.sum(F.when(flag, expr).otherwise(F.lit(0)).cast(dec))

    agg = (
        ev.select(F.hour("ts").alias("hour_of_day"), is_a.alias("is_a"), cents.alias("c"))
        .groupBy("hour_of_day")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_b"),
            arm(F.col("is_a"), F.col("c")).alias("sa"),
            arm(~F.col("is_a"), F.col("c")).alias("sb"),
            # cast BEFORE squaring: c*c in long overflows at a single
            # ~$30M value; decimal(38,0) squares never do (the CUSUM
            # fold below uses the same order)
            arm(F.col("is_a"), F.col("c").cast(dec) * F.col("c")).alias("ssa"),
            arm(~F.col("is_a"), F.col("c").cast(dec) * F.col("c")).alias("ssb"),
        )
        .filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    ssa, ssb = F.col("ssa").cast("double"), F.col("ssb").cast("double")
    va = (ssa - sa * sa / na) / (na - F.lit(1.0))
    vb = (ssb - sb * sb / nb) / (nb - F.lit(1.0))
    sq = va / na + vb / nb
    t = (sa / na - sb / nb) / F.sqrt(sq)
    df = (sq * sq) / (
        (va / na) * (va / na) / (na - F.lit(1.0))
        + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))
    )
    # sq == 0 (both arms constant) would divide by zero: Spark 4 ANSI
    # mode THROWS on double /0 while DuckDB yields NULL — gate both
    # statistics on sq > 0 and state the same CASE in the oracle
    return agg.select(
        "hour_of_day",
        "n_a",
        "n_b",
        (sa / na / F.lit(100.0)).alias("mean_a"),
        (sb / nb / F.lit(100.0)).alias("mean_b"),
        F.when(sq > 0, t).alias("welch_t"),
        F.when(sq > 0, df).alias("welch_df"),
    ).orderBy("hour_of_day")


def WELCH_AB_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH e AS (
    SELECT EXTRACT(hour FROM ts) AS hour_of_day,
           event_type = '{AB_GROUP_A}' AS is_a,
           CAST(ROUND(value * 100) AS BIGINT) AS c
    FROM events
    WHERE event_type IN ('{AB_GROUP_A}', '{AB_GROUP_B}')
),
m AS (
    SELECT hour_of_day,
           CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           SUM(CASE WHEN is_a THEN c ELSE 0 END) AS sa,
           SUM(CASE WHEN NOT is_a THEN c ELSE 0 END) AS sb,
           SUM(CASE WHEN is_a THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ssa,
           SUM(CASE WHEN NOT is_a THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS ssb
    FROM e GROUP BY hour_of_day
    HAVING n_a >= 2 AND n_b >= 2
),
d AS (
    SELECT hour_of_day, n_a, n_b,
           CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
           CAST(sa AS DOUBLE) AS sa, CAST(sb AS DOUBLE) AS sb,
           CAST(ssa AS DOUBLE) AS ssa, CAST(ssb AS DOUBLE) AS ssb
    FROM m
),
v AS (
    SELECT *,
           (ssa - sa * sa / na) / (na - 1.0) AS va,
           (ssb - sb * sb / nb) / (nb - 1.0) AS vb
    FROM d
),
s AS (SELECT *, va / na + vb / nb AS sq FROM v)
SELECT hour_of_day, n_a, n_b,
       sa / na / 100.0 AS mean_a,
       sb / nb / 100.0 AS mean_b,
       CASE WHEN sq > 0
            THEN (sa / na - sb / nb) / sqrt(sq) END AS welch_t,
       CASE WHEN sq > 0
            THEN (sq * sq) / ((va / na) * (va / na) / (na - 1.0)
                              + (vb / nb) * (vb / nb) / (nb - 1.0))
            END AS welch_df
FROM s ORDER BY hour_of_day
"""


# ---------------------------------------------------------------------------
# CUSUM level-shift detection

CUSUM_ALARM_DOLLARS = 100.0


def cusum_user_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM level-shift statistics over the event-value
    series: the largest sustained upward and downward drift of the
    user's values away from their own mean — the classical
    change-detection statistic (Page's CUSUM, zero slack), plus an
    alarm flag at ``CUSUM_ALARM_DOLLARS``.

    The textbook recursion ``C_i = max(0, C_{i-1} + d_i)`` looks
    inherently sequential, but with zero slack it has a closed
    window form: ``C_i = P_i - min_{j<=i} P_j`` for prefix sums P —
    a running sum and a running min, so the whole operator is TWO
    stacked windows over ONE shuffle on user_id (the downward side
    reuses the same frames with max). Deviations are exact integers
    scaled by the user's own count (``d_i = c_i*n_u - S_u`` =
    ``n_u*(c_i - mean_u)`` with no division), accumulated in
    decimal(38,0); the only doubles are the final unit conversion,
    written identically in the oracle. The total sort key
    (ts, event_id) keeps window order engine-independent.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    dec = "decimal(38,0)"
    per_user = W.partitionBy("user_id")
    full = per_user.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    running = per_user.orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    t = ev.select(
        "user_id",
        "ts",
        "event_id",
        "c",
        F.count(F.lit(1)).over(full).alias("n_u"),
        F.sum("c").over(full).alias("s_u"),
    )
    p = t.select(
        "user_id",
        "ts",
        "event_id",
        "n_u",
        F.sum(
            (F.col("c").cast(dec) * F.col("n_u") - F.col("s_u")).cast(dec)
        )
        .over(running)
        .alias("pp"),
    )
    zero = F.lit(0).cast(dec)
    q = p.select(
        "user_id",
        "n_u",
        # the virtual empty prefix P_0 = 0 joins the running extrema:
        # that is the C_0 = 0 boundary of the textbook recursion
        # (without it, a series that only falls — or only rises —
        # understates the opposite-direction drift)
        (F.col("pp") - F.least(zero, F.min("pp").over(running))).alias("up"),
        (F.greatest(zero, F.max("pp").over(running)) - F.col("pp")).alias("down"),
    )
    agg = q.groupBy("user_id").agg(
        F.max("n_u").alias("n_events"),
        F.max("up").alias("max_up"),
        F.max("down").alias("max_down"),
    )
    return agg.select(
        "user_id",
        "n_events",
        (F.col("max_up").cast("double") / F.col("n_events").cast("double") / F.lit(100.0)).alias("up_shift"),
        (F.col("max_down").cast("double") / F.col("n_events").cast("double") / F.lit(100.0)).alias("down_shift"),
        (
            (F.col("max_up").cast("double") / F.col("n_events").cast("double") / F.lit(100.0))
            > F.lit(CUSUM_ALARM_DOLLARS)
        ).alias("alarm"),
    ).orderBy("user_id")


def CUSUM_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH e AS (
    SELECT user_id, ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS c
    FROM events
),
t AS (
    SELECT user_id, ts, event_id, c,
           COUNT(*) OVER (PARTITION BY user_id) AS n_u,
           SUM(c) OVER (PARTITION BY user_id) AS s_u
    FROM e
),
p AS (
    SELECT user_id, ts, event_id, n_u,
           SUM(CAST(c AS HUGEINT) * n_u - s_u) OVER w AS pp
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
q AS (
    SELECT user_id, n_u,
           pp - LEAST(0, MIN(pp) OVER w) AS up,
           GREATEST(0, MAX(pp) OVER w) - pp AS down
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
a AS (
    SELECT user_id,
           CAST(MAX(n_u) AS BIGINT) AS n_events,
           MAX(up) AS max_up,
           MAX(down) AS max_down
    FROM q GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(max_up AS DOUBLE) / CAST(n_events AS DOUBLE) / 100.0 AS up_shift,
       CAST(max_down AS DOUBLE) / CAST(n_events AS DOUBLE) / 100.0 AS down_shift,
       CAST(max_up AS DOUBLE) / CAST(n_events AS DOUBLE) / 100.0
           > {CUSUM_ALARM_DOLLARS} AS alarm
FROM a ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Winsorized (percentile-clipped) aggregates

WINSOR_LO = 1
WINSOR_HI = 99


def winsorized_price_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per return flag: ``l_extendedprice`` clipped to
    its group's [p1, p99] discrete percentiles before averaging — the
    standard tail-robust aggregate (outliers are capped, not dropped),
    reported next to the raw mean with the clip counts.

    Everything after the FIRST scan is histogram-sized: the one
    ``groupBy(flag, cents)`` histogram feeds (a) the cumulative-count
    percentile read-off for the clip bounds and (b) the winsorized
    aggregate itself — Σ count·clip(value) over distinct values —
    so the raw rows are never scanned a second time and no join back
    to the fact table exists. The bounds frame is one row per group
    and broadcasts onto the pinned histogram. All sums are integer
    cents; the only doubles are the final unit conversions, written
    identically in the oracle.
    """
    li = (
        catalog.load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        )
        # NULL prices excluded in BOTH engines: the NULL cents group
        # would shift the cumulative clip-bound read-off NULLS FIRST
        # here vs NULLS LAST in the oracle (group_percentiles contract)
        .filter(F.col("v").isNotNull())
    )
    from pac_spark.cache import pin

    hist = pin(li.groupBy("l_returnflag", "v").agg(F.count(F.lit(1)).alias("c")))
    cum_w = (
        W.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_cum = hist.select(
        "l_returnflag",
        "v",
        "c",
        F.sum("c").over(cum_w).alias("_cum"),
        F.sum("c").over(W.partitionBy("l_returnflag")).alias("_n"),
    )
    bound = lambda p: F.min(  # noqa: E731
        F.when(F.col("_cum") * 100 >= F.lit(p) * F.col("_n"), F.col("v"))
    )
    bounds = with_cum.groupBy("l_returnflag").agg(
        bound(WINSOR_LO).alias("lo"), bound(WINSOR_HI).alias("hi")
    )
    h = hist.join(F.broadcast(bounds), "l_returnflag")
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v")))
    agg = h.groupBy("l_returnflag").agg(
        F.sum("c").alias("n_values"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum(F.when(F.col("v") < F.col("lo"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("v") > F.col("hi"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_clipped_high"),
        # decimal(38,0) accumulators like the rest of the file: c·v is
        # total group cents, which outgrows a long at the design scale
        # and would throw under ANSI while DuckDB silently promotes to
        # HUGEINT (the welch lesson)
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("v")).alias("raw_sum"),
        F.sum(F.col("c").cast("decimal(38,0)") * clipped).alias("win_sum"),
    )
    n = F.col("n_values").cast("double")
    return agg.select(
        "l_returnflag",
        "n_values",
        (F.col("lo").cast("double") / F.lit(100.0)).alias("p_low"),
        (F.col("hi").cast("double") / F.lit(100.0)).alias("p_high"),
        "n_clipped_low",
        "n_clipped_high",
        (F.col("raw_sum").cast("double") / n / F.lit(100.0)).alias("mean_raw"),
        (F.col("win_sum").cast("double") / n / F.lit(100.0)).alias("mean_winsorized"),
    ).orderBy("l_returnflag")


def WINSOR_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH li AS (
    SELECT l_returnflag,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
    FROM lineitem WHERE l_extendedprice IS NOT NULL
),
hist AS (
    SELECT l_returnflag, v, CAST(COUNT(*) AS BIGINT) AS c
    FROM li GROUP BY 1, 2
),
cum AS (
    SELECT l_returnflag, v, c,
           SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
           SUM(c) OVER (PARTITION BY l_returnflag) AS _n
    FROM hist
),
bounds AS (
    SELECT l_returnflag,
           MIN(CASE WHEN _cum * 100 >= {WINSOR_LO} * _n THEN v END) AS lo,
           MIN(CASE WHEN _cum * 100 >= {WINSOR_HI} * _n THEN v END) AS hi
    FROM cum GROUP BY l_returnflag
),
agg AS (
    SELECT h.l_returnflag,
           SUM(c) AS n_values,
           MAX(lo) AS lo,
           MAX(hi) AS hi,
           CAST(SUM(CASE WHEN v < lo THEN c ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN v > hi THEN c ELSE 0 END) AS BIGINT) AS n_clipped_high,
           SUM(CAST(c AS HUGEINT) * v) AS raw_sum,
           SUM(CAST(c AS HUGEINT) * GREATEST(lo, LEAST(hi, v))) AS win_sum
    FROM hist h JOIN bounds USING (l_returnflag)
    GROUP BY h.l_returnflag
)
SELECT l_returnflag,
       CAST(n_values AS BIGINT) AS n_values,
       CAST(lo AS DOUBLE) / 100.0 AS p_low,
       CAST(hi AS DOUBLE) / 100.0 AS p_high,
       n_clipped_low,
       n_clipped_high,
       CAST(raw_sum AS DOUBLE) / CAST(n_values AS DOUBLE) / 100.0 AS mean_raw,
       CAST(win_sum AS DOUBLE) / CAST(n_values AS DOUBLE) / 100.0 AS mean_winsorized
FROM agg ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Seasonally-adjusted anomaly detection

SEASONAL_RATIO_PCT = 200  # flag days at >= 2x or <= 1/2 the seasonal mean


def seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose per-event value deviates from the SEASONAL baseline:
    each (event_type, day) is compared against the mean value of the
    same event type on the same DAY OF WEEK across the corpus — the
    seasonally-adjusted monitoring readout (a quiet Sunday is not an
    anomaly just because Mondays are busy).

    The ratio day_mean / baseline_mean is the rational
    ``(day_sum · bl_n) / (day_n · bl_sum)`` — numerator and
    denominator are exact decimal(38,0) integer products, so the
    anomaly FLAG is a pure integer comparison
    (``100·num >= RATIO·den`` / ``100·num·RATIO <= 100·100·den`` form
    avoids division entirely) and cannot flake across engines; the
    reported ratio is the one double division, written identically in
    the oracle. Plan: ONE raw scan into the per-day aggregate; the
    day-of-week baseline is a re-aggregation of that (pinned) frame —
    types × 7 rows — broadcast back onto it.
    """
    from pac_spark.cache import pin

    ev = catalog.load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.dayofweek("ts").alias("dow"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    days = pin(
        ev.groupBy("event_type", "day", "dow").agg(
            F.count(F.lit(1)).alias("day_n"), F.sum("c").alias("day_sum")
        )
    )
    baseline = days.groupBy("event_type", "dow").agg(
        F.sum("day_n").alias("bl_n"), F.sum("day_sum").alias("bl_sum")
    )
    dec = "decimal(38,0)"
    j = days.join(F.broadcast(baseline), ["event_type", "dow"])
    num = (F.col("day_sum").cast(dec) * F.col("bl_n")).alias("num")
    den = (F.col("day_n").cast(dec) * F.col("bl_sum")).alias("den")
    r = j.select("event_type", "day", "day_n", "day_sum", num, den)
    high = F.col("num") * 100 >= F.col("den") * SEASONAL_RATIO_PCT
    low = F.col("num") * SEASONAL_RATIO_PCT <= F.col("den") * 100
    return r.select(
        "event_type",
        "day",
        F.col("day_n").alias("n_events"),
        (F.col("day_sum").cast("double") / 100.0).alias("day_value"),
        # a zero-sum baseline (all-zero or net-refund day group) makes
        # den = 0: NULL ratio like the oracle's /0, not an ANSI throw
        F.when(
            F.col("den") != 0,
            F.col("num").cast("double") / F.col("den").cast("double"),
        ).alias("seasonal_ratio"),
        (high | low).alias("is_anomalous"),
    ).orderBy("event_type", "day")


def SEASONAL_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH e AS (
    SELECT event_type,
           strftime(ts, '%Y-%m-%d') AS day,
           dayofweek(ts) AS dow,
           CAST(ROUND(value * 100) AS BIGINT) AS c
    FROM events
),
days AS (
    SELECT event_type, day, dow,
           CAST(COUNT(*) AS BIGINT) AS day_n,
           CAST(SUM(c) AS BIGINT) AS day_sum
    FROM e GROUP BY 1, 2, 3
),
baseline AS (
    SELECT event_type, dow,
           CAST(SUM(day_n) AS BIGINT) AS bl_n,
           CAST(SUM(day_sum) AS BIGINT) AS bl_sum
    FROM days GROUP BY 1, 2
),
r AS (
    SELECT d.event_type, d.day, d.day_n, d.day_sum,
           CAST(d.day_sum AS HUGEINT) * b.bl_n AS num,
           CAST(d.day_n AS HUGEINT) * b.bl_sum AS den
    FROM days d JOIN baseline b USING (event_type, dow)
)
SELECT event_type, day,
       day_n AS n_events,
       CAST(day_sum AS DOUBLE) / 100.0 AS day_value,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS seasonal_ratio,
       (num * 100 >= den * {SEASONAL_RATIO_PCT}
        OR num * {SEASONAL_RATIO_PCT} <= den * 100) AS is_anomalous
FROM r ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Per-segment linear trend (exact-moment regression)

def trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares value trend per event type — slope (dollars per
    hour), intercept-at-epoch-start, and R² of value against event
    time, the "is this metric drifting" readout behind every
    monitoring dashboard.

    Like the Pearson and Welch operators, nothing streams in doubles:
    x is whole SECONDS since the corpus's first event (exact integer,
    the micros→seconds floor stated with the shared integer-division
    idiom on both engines; the 1-row corpus minimum is a broadcast,
    the house scalar pattern), y is integer cents, and all five
    moments (n, Σx, Σy, Σx², Σxy, Σy²) accumulate in decimal(38,0) —
    x ≤ a few 10⁷ even for a multi-year corpus, so Σx² stays within
    38 digits past 10¹² rows per group. The slope/R² formulas are one
    identical double expression; zero-variance groups (all events in
    one second, or constant values for R²) yield NULL via an exact
    integer guard on the decimal determinants, not a thrown ANSI
    division."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    t0 = ev.agg(F.min("us").alias("t0"))
    dec = "decimal(38,0)"
    xy = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        int_div(F.col("us") - F.col("t0"), F.lit(1_000_000)).alias("x"),
        "y",
    )
    m = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x").cast(dec) * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("y").cast(dec) * F.col("y")).cast(dec)).alias("syy"),
    )
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    dxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    g = m.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.col("sx").cast("double").alias("fx"),
        F.col("sy").cast("double").alias("fy"),
        F.col("n").cast("double").alias("fn"),
        dxx.cast("double").alias("fdxx"),
        dyy.cast("double").alias("fdyy"),
        dxy.cast("double").alias("fdxy"),
        (dxx > 0).alias("has_x_var"),
        ((dxx > 0) & (dyy > 0)).alias("has_both_var"),
    )
    slope = F.col("fdxy") / F.col("fdxx")  # cents per second
    intercept = (F.col("fy") - slope * F.col("fx")) / F.col("fn")
    r2 = (F.col("fdxy") * F.col("fdxy")) / (F.col("fdxx") * F.col("fdyy"))
    return g.select(
        "event_type",
        "n_events",
        F.when(F.col("has_x_var"), slope * 36.0).alias("slope_value_per_hour"),
        F.when(F.col("has_x_var"), intercept / 100.0).alias("intercept_value"),
        F.when(F.col("has_both_var"), r2).alias("r2"),
    ).orderBy("event_type")


def TREND_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py)."""
    return """
WITH e AS (
    SELECT event_type,
           epoch_us(ts) AS us,
           CAST(ROUND(value * 100) AS BIGINT) AS y
    FROM events
),
t0 AS (SELECT MIN(us) AS t0 FROM e),
xy AS (
    SELECT event_type, (us - t0) // 1000000 AS x, y FROM e CROSS JOIN t0
),
m AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(x AS HUGEINT)) AS sx,
           SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           SUM(CAST(x AS HUGEINT) * y) AS sxy,
           SUM(CAST(y AS HUGEINT) * y) AS syy
    FROM xy GROUP BY event_type
),
g AS (
    SELECT event_type, n,
           CAST(sx AS DOUBLE) AS fx,
           CAST(sy AS DOUBLE) AS fy,
           CAST(n AS DOUBLE) AS fn,
           CAST(n * sxx - sx * sx AS DOUBLE) AS fdxx,
           CAST(n * syy - sy * sy AS DOUBLE) AS fdyy,
           CAST(n * sxy - sx * sy AS DOUBLE) AS fdxy,
           n * sxx - sx * sx > 0 AS has_x_var,
           (n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0) AS has_both_var
    FROM m
)
SELECT event_type,
       n AS n_events,
       CASE WHEN has_x_var THEN fdxy / fdxx * 36.0 END AS slope_value_per_hour,
       CASE WHEN has_x_var
            THEN (fy - fdxy / fdxx * fx) / fn / 100.0 END AS intercept_value,
       CASE WHEN has_both_var
            THEN (fdxy * fdxy) / (fdxx * fdyy) END AS r2
FROM g ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test


def ks_test_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic comparing the
    ``l_extendedprice`` distribution of returned (``l_returnflag='R'``)
    vs accepted (``'A'``) lineitems — the distribution-shift readout a
    data pipeline runs between a candidate batch and its reference.

    Exactness: both ECDFs step only at observed values, so the sup is
    attained on the union of sample points. The statistic is computed
    as an INTEGER before any division —
    ``ks_num = max |cum_a * n_r - cum_r * n_a|`` over distinct cents —
    and only the final ``ks_stat = ks_num / (n_a * n_r)`` touches
    doubles; the cross products run in decimal(38,0) so the arithmetic
    is exact far past bigint row counts (the reported ks_num column
    itself is BIGINT, plenty until ~3e9 rows per arm).

    Scale shape: one conditional-aggregate scan builds the per-cents
    histogram (domain-bounded, not row-bounded); the running counts
    come from the two-phase prefix sum (``$10k``-bucketed), never a
    single-task window; the 1-row totals and max frames broadcast.

    Reference parity: the reference eyeballs distribution drift in its
    executive summaries (``executive_review_tool.py`` report section);
    this is the principled test at cluster scale.
    """
    from pac_spark.cache import pin
    from pac_spark.functions.prefix import global_running_sums

    li = (
        catalog.load(spark, sf_dir, "lineitem")
        # NULL prices excluded in BOTH engines: an unpriced row has no
        # ECDF position, and the NULL cents group would ride the
        # running sums NULLS FIRST here vs NULLS LAST in the oracle
        .filter(
            F.col("l_returnflag").isin("A", "R")
            & F.col("l_extendedprice").isNotNull()
        )
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.when(F.col("l_returnflag") == "A", 1).otherwise(0).alias("is_a"),
        )
    )
    # pinned: the histogram feeds the prefix-sum's two consumers plus
    # the totals aggregate — three scans of the fact table otherwise
    hist = pin(
        li.groupBy("cents").agg(
            F.sum("is_a").alias("a"), F.sum(F.lit(1) - F.col("is_a")).alias("r")
        )
    )
    run = global_running_sums(
        hist, "cents", ["a", "r"], bucket=int_div(F.col("cents"), F.lit(1_000_000))
    )
    totals = hist.agg(
        F.sum("a").alias("n_a"), F.sum("r").alias("n_r")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    diffs = pin(
        run.crossJoin(F.broadcast(totals)).select(
            "cents",
            "n_a",
            "n_r",
            F.abs(dec("run_a") * dec("n_r") - dec("run_r") * dec("n_a")).alias(
                "d"
            ),
        )
    )
    mx = diffs.agg(F.max("d").alias("ks_num"))
    return (
        diffs.join(F.broadcast(mx), diffs["d"] == mx["ks_num"])
        .groupBy("n_a", "n_r", "ks_num")
        .agg((F.min("cents").cast("double") / 100.0).alias("at_price"))
        .select(
            "n_a",
            "n_r",
            F.col("ks_num").cast("long").alias("ks_num"),
            # an empty arm makes n_a·n_r = 0: NULL statistic like the
            # oracle's 0/0, not an ANSI divide-by-zero throw
            F.when(
                F.col("n_a") * F.col("n_r") > 0,
                F.col("ks_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_r").cast("double")),
            ).alias("ks_stat"),
            "at_price",
        )
    )


KS_SQL = """
WITH li AS (
    SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
           CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_a
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R') AND l_extendedprice IS NOT NULL
), hist AS (
    SELECT cents, SUM(is_a) AS a, SUM(1 - is_a) AS r
    FROM li GROUP BY cents
), run AS (
    SELECT cents,
           SUM(a) OVER w AS run_a, SUM(r) OVER w AS run_r
    FROM hist
    WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
    SELECT SUM(a) AS n_a, SUM(r) AS n_r FROM hist
), diffs AS (
    SELECT cents, n_a, n_r,
           ABS(CAST(run_a AS DECIMAL(38,0)) * CAST(n_r AS DECIMAL(38,0))
             - CAST(run_r AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))) AS d
    FROM run, tot
), mx AS (
    SELECT MAX(d) AS ks_num FROM diffs
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_r AS BIGINT) AS n_r,
       CAST(ks_num AS BIGINT) AS ks_num,
       CAST(ks_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_r AS DOUBLE)) AS ks_stat,
       CAST(MIN(cents) AS DOUBLE) / 100.0 AS at_price
FROM diffs JOIN mx ON diffs.d = mx.ks_num
GROUP BY n_a, n_r, ks_num
"""


# ---------------------------------------------------------------------------
# Largest-remainder proportional allocation


ALLOC_BUDGET = 1_000_000


def budget_allocation_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split a fixed integer budget across nations proportionally to
    customer order revenue, with LARGEST-REMAINDER rounding — the only
    rounding rule under which the allocations sum to EXACTLY the
    budget (naive per-row rounding drifts by up to n/2 units; at a
    real ad-spend or quota split that drift is a reconciliation bug).

    Everything is exact: shares are ``floor(B*c_i / T)`` via integer
    division on decimal(38,0) products, remainders ``B*c_i − base_i*T``
    stay integral, and the leftover ``B − Σbase`` units go to the
    largest remainders under a total (remainder desc, nation) order.
    Σalloc == B is property-tested, not hoped for.

    Scale shape: one fact aggregate to nation grain; everything after
    is a NATION-sized frame (the unpartitioned ranking window runs
    over ≤ |nations| rows), with the two scalar totals broadcast.
    """
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    cust = catalog.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = catalog.load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    from pac_spark.cache import pin

    # pinned: the fact aggregate feeds TWO consumers (the grand-total
    # scalar and the per-nation share frame) — un-pinned, the
    # orders ⋈ customer join + aggregate re-executed per branch (the
    # plan audit read 12 parquet scans where the query needs 3;
    # plan-audit campaign r8)
    rev = pin(
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    totals = rev.agg(F.sum("revenue_cents").alias("t"))
    based = rev.crossJoin(F.broadcast(totals)).select(
        "n_name",
        "revenue_cents",
        int_div(
            (dec(F.lit(ALLOC_BUDGET)) * dec(F.col("revenue_cents"))).cast(
                "decimal(38,0)"
            ),
            dec(F.col("t")),
        ).alias("base"),
        # decimal % is exact and states the same quantity the oracle's
        # `% CAST(t AS HUGEINT)` does — not a second copy of the
        # quotient expression that could drift from `base`
        (
            (dec(F.lit(ALLOC_BUDGET)) * dec(F.col("revenue_cents"))).cast(
                "decimal(38,0)"
            )
            % dec(F.col("t"))
        ).alias("rem"),
    )
    # pinned: nation-sized, but consumed by BOTH the leftover scalar
    # and the ranking — un-pinned each consumer replayed the rev read
    based = pin(based)
    leftover = based.agg(
        (F.lit(ALLOC_BUDGET) - F.sum("base")).alias("left")
    )
    ranked = based.crossJoin(F.broadcast(leftover)).select(
        "*",
        F.row_number()
        .over(W.orderBy(F.desc("rem"), F.asc("n_name")))
        .alias("rk"),
    )
    return ranked.select(
        "n_name",
        "revenue_cents",
        (
            F.col("base") + F.when(F.col("rk") <= F.col("left"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    ).orderBy("n_name")


ALLOC_SQL = f"""
WITH rev AS (
    SELECT n_name,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
), tot AS (
    SELECT SUM(revenue_cents) AS t FROM rev
), based AS (
    SELECT n_name, revenue_cents,
           CAST({ALLOC_BUDGET} AS HUGEINT) * revenue_cents
               // CAST(t AS HUGEINT) AS base,
           CAST({ALLOC_BUDGET} AS HUGEINT) * revenue_cents
               % CAST(t AS HUGEINT) AS rem
    FROM rev, tot
), leftover AS (
    SELECT {ALLOC_BUDGET} - SUM(base) AS lft FROM based
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, n_name) AS rk
    FROM based, leftover
)
SELECT n_name,
       CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST(base + CASE WHEN rk <= lft THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Continuous (interpolated) percentiles


def group_percentiles_cont(
    df: DataFrame,
    group_cols: list[str],
    value: str,
    pcts: tuple[int, ...] = (25, 50, 75),
) -> DataFrame:
    """Exact CONTINUOUS percentiles (linear interpolation between
    order statistics — the ``percentile_cont`` / numpy default) from
    the same histogram + integer read-off machinery as the discrete
    variant: zero-based rank ``p*(n-1)/100`` splits into integer part
    ``k`` and hundredths remainder ``f``; the result is
    ``v_k + f*(v_{k+1} - v_k)/100`` where ``v_k`` = smallest value
    with cumulative count > k. Every comparison is integer; the one
    float expression is identical in both engines, so interpolated
    values hash-match — the construction proves percentile_cont
    semantics engine-portably instead of trusting either engine's
    interpolation flavor.
    """
    hist = df.groupBy(*group_cols, value).agg(F.count("*").alias("_c"))
    cum_w = (
        W.partitionBy(*group_cols)
        .orderBy(value)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_cum = hist.select(
        *group_cols,
        F.col(value),
        F.sum("_c").over(cum_w).alias("_cum"),
        F.sum("_c").over(W.partitionBy(*group_cols)).alias("_n"),
    )
    aggs = [F.max("_n").alias("n_values")]
    for p in pcts:
        pos = F.lit(p) * (F.col("_n") - 1)  # rank in hundredths
        k = int_div(pos, F.lit(100))
        f = pos % 100
        lo = F.min(F.when(F.col("_cum") > k, F.col(value)))
        hi = F.min(F.when(F.col("_cum") > k + 1, F.col(value)))
        # the last rank has no successor; f is 0 there, so reuse lo
        aggs.append(
            (
                lo.cast("double")
                + F.max(f).cast("double")
                * (F.coalesce(hi, lo).cast("double") - lo.cast("double"))
                / 100.0
            ).alias(f"p{p}_cont")
        )
    return with_cum.groupBy(*group_cols).agg(*aggs)


def percentiles_cont_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: interpolated p25/p50/p75 of lineitem price
    cents per return flag — the continuous twin of the registered
    discrete spec, same one-scan histogram shape."""
    li = (
        catalog.load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        # NULL prices excluded in BOTH engines (the percentile-helper
        # contract; opposite NULL sort orders shift the interpolation)
        .filter(F.col("cents").isNotNull())
    )
    out = group_percentiles_cont(li, ["l_returnflag"], "cents")
    return out.select(
        "l_returnflag",
        "n_values",
        *[(F.col(f"p{p}_cont") / 100.0).alias(f"p{p}_price") for p in (25, 50, 75)],
    ).orderBy("l_returnflag")


def _cont_col(p: int) -> str:
    return f"""
           CAST(MIN(CASE WHEN cum > ({p} * (n - 1)) // 100 THEN v END) AS DOUBLE)
           + CAST(MAX(({p} * (n - 1)) % 100) AS DOUBLE)
             * (CAST(COALESCE(
                    MIN(CASE WHEN cum > ({p} * (n - 1)) // 100 + 1 THEN v END),
                    MIN(CASE WHEN cum > ({p} * (n - 1)) // 100 THEN v END)
                ) AS DOUBLE)
                - CAST(MIN(CASE WHEN cum > ({p} * (n - 1)) // 100 THEN v END)
                       AS DOUBLE))
             / 100.0"""


PCT_CONT_SQL = f"""
WITH h AS (
    SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
           COUNT(*) AS c
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
       {",".join(f"({_cont_col(p)}) / 100.0 AS p{p}_price" for p in (25, 50, 75))}
FROM w GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Exponentially weighted moving average (order-sensitive smoothing)


EWMA_SPAN = 16  # lags folded in; alpha = 1/2 halves each step back


def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted value at the user's LATEST
    event: EWMA with decay alpha = 1/2 over the last ``EWMA_SPAN``
    events in (ts, event_id) order — the smoothing readout a
    monitoring pipeline keeps per entity.

    Float EWMA recursions are order-dependent and never
    cross-engine-stable; alpha = 1/2 makes every weight a POWER OF
    TWO, so the weighted numerator Sum(cents_i * 2^(SPAN-1-i)) and the
    weight mass Sum(2^(SPAN-1-i)) over the lags actually present are
    exact BIGINTs (max ~5e10, far under 2^53) and the smoothed value
    is one IEEE division both engines round identically. Beyond SPAN
    lags a weight would be < 2^-16 of the newest — truncation is the
    standard "effective memory" cutoff, and it is what bounds the
    window state.

    Scale shape: ONE shuffle on user_id; the lag chain is a single
    window pass (whole-stage codegen, no self-join); the final filter
    keeps each user's last row via the same window's row counter.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("cents", i).over(w).alias(f"l{i}") for i in range(EWMA_SPAN)]
    rows = ev.select(
        "user_id",
        "ts",
        "cents",
        *lags,
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("user_id")).alias("n"),
    ).filter(F.col("rn") == F.col("n"))
    weight = lambda i: 1 << (EWMA_SPAN - 1 - i)  # noqa: E731
    num = sum(
        (
            F.coalesce(F.col(f"l{i}") * F.lit(weight(i)), F.lit(0))
            for i in range(EWMA_SPAN)
        ),
        F.lit(0),
    )
    den = sum(
        (
            F.when(F.col(f"l{i}").isNotNull(), F.lit(weight(i))).otherwise(F.lit(0))
            for i in range(EWMA_SPAN)
        ),
        F.lit(0),
    )
    return rows.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        (F.col("cents").cast("double") / F.lit(100.0)).alias("last_value"),
        (num.cast("double") / den.cast("double") / F.lit(100.0)).alias("ewma_value"),
    ).orderBy("user_id")


def _ewma_sql() -> str:
    span = EWMA_SPAN
    lag_cols = ", ".join(f"LAG(cents, {i}) OVER w AS l{i}" for i in range(span))
    num = " + ".join(
        f"COALESCE(l{i} * {1 << (span - 1 - i)}, 0)" for i in range(span)
    )
    den = " + ".join(
        f"CASE WHEN l{i} IS NOT NULL THEN {1 << (span - 1 - i)} ELSE 0 END"
        for i in range(span)
    )
    return f"""
WITH base AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), lagged AS (
    SELECT user_id, ts, cents, {lag_cols},
           ROW_NUMBER() OVER w AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       n AS n_events,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       CAST(cents AS DOUBLE) / 100.0 AS last_value,
       CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) / 100.0 AS ewma_value
FROM lagged WHERE rn = n ORDER BY user_id
"""


EWMA_SQL = _ewma_sql()


# ---------------------------------------------------------------------------
# Half-life time-decayed aggregate (recency-weighted spend)

# one weight halving per calendar week of age; contributions older
# than CUTOFF half-lives are dropped by STATED semantics — the
# standard "effective memory" bound (the EWMA_SPAN trade), and what
# keeps the scaled integer sum inside decimal(38,0) at any row count
HALFLIFE_DAYS = 7
HALFLIFE_CUTOFF = 40


def halflife_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user HALF-LIFE-decayed total event value: each event
    contributes ``value · 2^(−age_weeks)`` where age is measured in
    whole calendar weeks back from the corpus's newest event day —
    the recency-weighted spend / activity feature every churn and
    LTV model wants, where last week counts double vs two weeks ago.

    The calendar-indexed companion to ``ewma_user_value`` (which
    decays per EVENT): a user's ten events today all carry today's
    weight; a gauge that went quiet decays with TIME, not ticks.

    Exactness (the EWMA power-of-two discipline): alpha = 1/2 per
    week makes every weight dyadic, so the decayed total is the exact
    integer Σ cents · 2^(CUTOFF − k) (k = age_days // 7, k < CUTOFF)
    accumulated in decimal(38,0) — cents ≤ 10^7 times 2^40 ≈ 10^19
    per term, so even trillions of rows per user sit inside 38 digits
    — then ONE division by the exact double 2^CUTOFF. Contributions
    with k ≥ CUTOFF (weight < 10^-12 of the newest) are dropped in
    BOTH engines. NULL-value and NULL-ts events are excluded up front
    in BOTH engines (an undated or unvalued event has no decayed
    contribution; Spark would otherwise propagate NULL terms that
    ``SUM`` skips while the age filter diverges).

    Scale shape: the anchor day is a 1-row aggregate broadcast by a
    literal crossJoin (the winsorized/seasonal bounds-frame pattern);
    then ONE map-side-combined groupBy(user) over the scan — no
    window, no self-join, partition-invariant by integer addition.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("cents").isNotNull() & F.col("d").isNotNull())
    anchor = ev.agg(F.max("d").alias("anchor_day"))
    dec = "decimal(38,0)"
    k = F.floor(F.datediff(F.col("anchor_day"), F.col("d")) / HALFLIFE_DAYS)
    scaled = (
        ev.crossJoin(F.broadcast(anchor))
        .withColumn("k", k)
        .filter(F.col("k") < HALFLIFE_CUTOFF)
        .select(
            "user_id",
            (
                F.col("cents").cast(dec)
                # SQL form: the Python shiftleft() only takes a literal
                # bit count; 2^(CUTOFF - k) stays an exact BIGINT
                * F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"CAST({HALFLIFE_CUTOFF} - k AS INT))"
                ).cast(dec)
            ).alias("term"),
        )
    )
    return (
        scaled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("term").alias("num"),
        )
        .select(
            "user_id",
            "n_events",
            (
                F.col("num").cast("double")
                / F.lit(float(1 << HALFLIFE_CUTOFF))
                / F.lit(100.0)
            ).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


def HALFLIFE_SQL() -> str:
    """STAGED for the r11 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH e AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL
),
a AS (SELECT MAX(d) AS anchor_day FROM e),
s AS (
    SELECT user_id,
           CAST(cents AS HUGEINT)
               * (CAST(1 AS HUGEINT) << ({HALFLIFE_CUTOFF}
                  - date_diff('day', d, anchor_day) // {HALFLIFE_DAYS}))
               AS term
    FROM e, a
    WHERE date_diff('day', d, anchor_day) // {HALFLIFE_DAYS}
          < {HALFLIFE_CUTOFF}
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(term) AS DOUBLE) / {float(1 << HALFLIFE_CUTOFF)!r} / 100.0
           AS decayed_value
FROM s GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (median of pairwise slopes)

TS_SCALE = 1_000_000  # slopes in 1e-6 cents/day fixed point


def theilsen_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the daily-revenue trend per event type:
    the MEDIAN of all pairwise slopes (and the companion median
    intercept), the robust alternative to ``trend_slope_by_type``'s
    least squares — one wild day shifts OLS arbitrarily but moves a
    median of ~k²/2 slopes not at all (breakdown point ≈ 29%).

    Scale shape: the O(k²) pair set is quadratic in DAYS, not rows —
    the fact table first collapses to one exact-cents total per
    (event_type, day) via a map-side-combined aggregate, so k is
    bounded by the calendar span (a 10-year corpus is ~3.7k days →
    ~6.6M pair rows per type, trivially shuffle-sized) while the scan
    underneath is the full corpus. Everything after the aggregate is
    exact integer arithmetic: day = epoch day, dy in cents, each
    slope truncated to 1e-6-cents/day fixed point by the shared
    remainder-subtracted division (trunc semantics match DuckDB's
    BIGINT ``//`` for NEGATIVE slopes too — both truncate toward
    zero), and the median is the house lower-median read-off
    ``2*rank >= n`` over ranked values, never a float percentile.
    ``dy * TS_SCALE`` stays under 2^53 while daily totals are below
    ~$90M — true far past sf100; widen to decimal before that.
    Single-day types have no pairs and are absent by definition.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "d").agg(F.sum("cents").alias("y"))
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("y").alias("y2"))
    pairs = a.join(b, "event_type").where(F.col("d1") < F.col("d2"))
    slope = int_div(
        (F.col("y2") - F.col("y1")) * F.lit(TS_SCALE), F.col("d2") - F.col("d1")
    )
    ranked = pairs.select("event_type", slope.alias("s")).select(
        "event_type",
        "s",
        F.row_number().over(W.partitionBy("event_type").orderBy("s")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n_pairs"),
    )
    med_slope = (
        ranked.where(F.col("rn") * 2 >= F.col("n_pairs"))
        .groupBy("event_type")
        .agg(F.min("s").alias("slope_fp"), F.first("n_pairs").alias("n_pairs"))
    )
    # median intercept over the k daily points: y*SCALE - slope_fp*d
    pts = daily.join(med_slope, "event_type").select(
        "event_type",
        "slope_fp",
        "n_pairs",
        (F.col("y") * F.lit(TS_SCALE) - F.col("slope_fp") * F.col("d")).alias("i"),
    )
    ranked_i = pts.select(
        "event_type",
        "slope_fp",
        "n_pairs",
        "i",
        F.row_number().over(W.partitionBy("event_type").orderBy("i")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("k"),
    )
    return (
        ranked_i.where(F.col("rn") * 2 >= F.col("k"))
        .groupBy("event_type")
        .agg(
            F.first("k").alias("n_days"),
            F.first("n_pairs").alias("n_pairs"),
            F.first("slope_fp").alias("slope_microcents_per_day"),
            F.min("i").alias("intercept_microcents"),
        )
        .orderBy("event_type")
    )


def THEILSEN_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH daily AS (
    SELECT event_type,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           -- BIGINT, not DuckDB's HUGEINT SUM: '//' stays integer and
           -- pandas never round-trips the result through float
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pairs AS (
    SELECT a.event_type,
           ((b.y - a.y) * {TS_SCALE}) // (b.d - a.d) AS s
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.d < b.d
),
ranked AS (
    SELECT event_type, s,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
    FROM pairs
),
med AS (
    SELECT event_type, MIN(s) AS slope_fp, MIN(n_pairs) AS n_pairs
    FROM ranked WHERE rn * 2 >= n_pairs GROUP BY event_type
),
pts AS (
    SELECT d.event_type, m.slope_fp, m.n_pairs,
           d.y * {TS_SCALE} - m.slope_fp * d.d AS i
    FROM daily d JOIN med m ON d.event_type = m.event_type
),
ranked_i AS (
    SELECT event_type, slope_fp, n_pairs, i,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY i) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS k
    FROM pts
)
SELECT event_type,
       MIN(k) AS n_days,
       MIN(n_pairs) AS n_pairs,
       MIN(slope_fp) AS slope_microcents_per_day,
       MIN(i) AS intercept_microcents
FROM ranked_i WHERE rn * 2 >= k
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Distribution drift: daily event-mix total-variation distance

TV_ALERT_MILLI = 200  # flag days whose mix drifts > 0.200 from the corpus


def daily_event_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitor over the event-type mix: for every day, the
    total-variation distance between that day's event-type
    distribution and the whole corpus's — TV = ½·Σ|p_t − q_t| — with
    an alert flag past 0.200. The readout behind "did yesterday's
    traffic change shape", feeding the same dashboards as the
    seasonal and CUSUM detectors but about COMPOSITION, not volume.

    TV distance is chosen over KL/JS divergence deliberately (the
    token-Gini precedent): the same monotone drift readout, but
    RATIONAL — clearing denominators turns ½Σ|n_dt/n_d − N_t/N| into
    Σ|n_dt·N − N_t·n_d| over 2·n_d·N, exact integers end-to-end
    (decimal(38,0) products: n_dt·N stays within 38 digits past 10¹⁸
    row corpora) where a log-based divergence would tie the hash to
    libm rounding. The published value is exact MILLI-units by the
    shared truncating division.

    One scan: day×type counts (map-side combined), day totals and
    type totals derived FROM that tiny table, corpus total broadcast
    — the fan-in after the first aggregate is |days|·|types| rows.
    Absent (day, type) cells contribute |0·N − N_t·n_d| and are
    materialized by the day×type spine join, not skipped.
    """
    from pac_spark.cache import pin

    ev = catalog.load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    )
    # pinned: the day×type count table feeds FOUR consumers (day
    # totals, type totals->corpus total, and the spine's cell join) —
    # un-pinned, the "one scan" the docstring promises was actually
    # four events scans (plan-audit campaign r8)
    dt = pin(ev.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n_dt")))
    days = dt.groupBy("day").agg(F.sum("n_dt").alias("n_d"))
    types = dt.groupBy("event_type").agg(F.sum("n_dt").alias("n_t"))
    total = types.agg(F.sum("n_t").alias("n"))
    dec = "decimal(38,0)"
    spine = days.crossJoin(F.broadcast(types)).crossJoin(F.broadcast(total))
    cells = spine.join(dt, ["day", "event_type"], "left").select(
        "day",
        "n_d",
        "n",
        (
            F.abs(
                F.coalesce(F.col("n_dt"), F.lit(0)).cast(dec) * F.col("n")
                - F.col("n_t").cast(dec) * F.col("n_d")
            )
        ).alias("dev"),
    )
    # trunc division in DECIMAL(38,0), not the long-backed int_div:
    # the numerator is 1000·Σdev ≈ 2000·n_d·N, far past 2^53 for real
    # corpora. Remainder-subtracted decimal division of an exact
    # multiple is exact (verified: decimal(38,6) result, .000000), and
    # the quotient is <= 1000 by construction.
    num = (F.sum("dev") * F.lit(1000)).cast(dec)
    den = (F.lit(2).cast(dec) * F.first("n_d") * F.first("n")).cast(dec)
    tv_milli = ((num - num % den) / den).cast("long")
    return (
        cells.groupBy("day")
        .agg(
            F.first("n_d").alias("n_events"),
            tv_milli.alias("tv_milli"),
        )
        .select(
            "day",
            "n_events",
            "tv_milli",
            (F.col("tv_milli") > TV_ALERT_MILLI).alias("is_drifted"),
        )
        .orderBy("day")
    )


def MIX_DRIFT_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH dt AS (
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_dt
    FROM events GROUP BY 1, 2
),
days AS (SELECT day, CAST(SUM(n_dt) AS BIGINT) AS n_d FROM dt GROUP BY day),
types AS (
    SELECT event_type, CAST(SUM(n_dt) AS BIGINT) AS n_t FROM dt GROUP BY event_type
),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n FROM types),
cells AS (
    SELECT d.day, d.n_d, t.n_t, tot.n,
           ABS(CAST(COALESCE(x.n_dt, 0) AS HUGEINT) * tot.n
               - CAST(t.n_t AS HUGEINT) * d.n_d) AS dev
    FROM days d CROSS JOIN types t CROSS JOIN tot
    LEFT JOIN dt x ON x.day = d.day AND x.event_type = t.event_type
),
agg AS (
    SELECT day, MIN(n_d) AS n_events,
           CAST(SUM(dev) * 1000 AS HUGEINT)
               // (2 * CAST(MIN(n_d) AS HUGEINT) * MIN(n)) AS tv_milli
    FROM cells GROUP BY day
)
SELECT day, n_events, CAST(tv_milli AS BIGINT) AS tv_milli,
       tv_milli > {TV_ALERT_MILLI} AS is_drifted
FROM agg ORDER BY day
"""


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (the significance companion to Theil–Sen)


def mann_kendall_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per event type over the
    daily-revenue series: S = Σ_{i<j} sign(y_j − y_i) and Kendall's
    tau = 2S / (n(n−1)) — the nonparametric "is this actually
    trending" readout that pairs with the Theil–Sen slope (same pair
    set, the SIGN of each pairwise slope instead of its value).

    Everything is trivially exact: signs are integers, ties
    contribute 0 naturally, and tau publishes in milli-units by the
    shared truncating division (S may be negative — trunc-toward-zero
    proven equal to DuckDB's ``//``). Same scale shape as Theil–Sen:
    pairs are quadratic in calendar DAYS, not rows.
    """
    daily = (
        catalog.load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("y"))
    )
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("y").alias("y2"))
    pairs = a.join(b, "event_type").where(F.col("d1") < F.col("d2"))
    agg = pairs.groupBy("event_type").agg(
        F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long")).alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    tau_milli = int_div(F.col("s_stat") * 1000, F.col("n_pairs"))
    return agg.select(
        "event_type", "n_pairs", "s_stat", tau_milli.alias("tau_milli")
    ).orderBy("event_type")


def MANN_KENDALL_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return """
WITH daily AS (
    SELECT event_type,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pairs AS (
    SELECT a.event_type, CAST(SIGN(b.y - a.y) AS BIGINT) AS sg
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.d < b.d
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(sg) AS BIGINT) AS s_stat,
       (CAST(SUM(sg) AS BIGINT) * 1000) // CAST(COUNT(*) AS BIGINT) AS tau_milli
FROM pairs GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Autocorrelation of the daily revenue series


ACF_MAX_LAG = 7


def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the corpus's daily revenue — the
    "is there weekly rhythm" readout behind seasonality decisions.
    Lags are CALENDAR days (pairs join on d2 = d1 + k; missing days
    produce no pair, they are not zero-filled — stated semantics).

    Exactness via denominator clearing, the trend/corr idiom: with
    S = Σy and n days, (y_t − S/n)(y_{t+k} − S/n)·n² =
    (n·y_t − S)(n·y_{t+k} − S), all integers; each r_k is ONE double
    division Num_k / Den of two decimal(38,0) sums (centered values
    ~n·y_max fit decimal squares far past 10¹² rows). Zero-variance
    series yield NULL via an exact integer guard, not an ANSI throw.
    """
    daily = (
        catalog.load(spark, sf_dir, "events")
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
    )
    from pac_spark.cache import pin

    daily = pin(daily)  # feeds the total, the denominator, and both pair sides
    dec = "decimal(38,0)"
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast(dec).alias("s")
    )
    centered = pin(
        daily.crossJoin(F.broadcast(tot)).select(
            "d",
            (F.col("n").cast(dec) * F.col("y") - F.col("s")).alias("c"),
            "n",
        )
    )
    den = centered.agg(
        F.sum((F.col("c") * F.col("c")).cast(dec)).alias("den"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = centered.select(F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = centered.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("d2") == F.col("d1") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum((F.col("c1") * F.col("c2")).cast(dec)).alias("num"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    out = pairs.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_terms",
        F.when(
            F.col("den") > 0, F.col("num").cast("double") / F.col("den").cast("double")
        ).alias("acf"),
    )
    return out.orderBy("lag")


def ACF_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH daily AS (
    SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY CAST(ts AS DATE)
),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(y) AS HUGEINT) AS s
        FROM daily),
centered AS (
    SELECT d, n * y - s AS c FROM daily CROSS JOIN tot
),
den AS (SELECT SUM(c * c) AS den FROM centered),
lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, {ACF_MAX_LAG + 1})),
pairs AS (
    SELECT l.lag,
           SUM(a.c * b.c) AS num,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM centered a CROSS JOIN lags l
    JOIN centered b ON b.d = a.d + l.lag
    GROUP BY l.lag
)
SELECT p.lag, p.n_terms,
       CASE WHEN d.den > 0
            THEN CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE) END AS acf
FROM pairs p CROSS JOIN den d ORDER BY p.lag
"""


# ---------------------------------------------------------------------------
# Cramér's V (categorical association strength)


def cramers_v_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association strength between a document's language and its
    ingestion source — the full R×C chi-square contingency test
    normalized to Cramér's V ∈ [0, 1]. The curation question it
    answers: are sources language-balanced (V ≈ 0), or does "source"
    secretly encode "language" (V → 1), in which case any
    source-stratified split leaks language?

    Determinism discipline: every cell's χ² term is ONE double
    expression over exact integer counts ((o·n − r·c)² / (n·r·c),
    factors cast to double before multiplying — the chi2_terms
    precedent), but an R×C table needs a float SUM over cells, which
    is partition-order-dependent — so each term is floored to 10⁻⁹
    fixed point and summed as integers (the BM25 idiom); sqrt is
    IEEE-identical cross-engine. EMPTY cells of the observed-marginal
    grid contribute e = r·c/n (o = 0), so the grid is the explicit
    marginal cross join — tiny (languages × sources), broadcast —
    LEFT-joined to observed counts, never just the observed cells.

    NULL categories are EXCLUDED up front (both engines state the
    same filter): a NULL marginal row can never equi-join its observed
    cell (NULL ≠ NULL), which would inflate χ² with a phantom empty
    cell while countDistinct excluded it from the dof — an
    engine-consistent wrongness no oracle hash could catch.
    """
    from pac_spark.cache import pin

    d = (
        catalog.load(spark, sf_dir, "documents")
        .select("lang", "source")
        .filter(F.col("lang").isNotNull() & F.col("source").isNotNull())
    )
    # ONE corpus scan: the observed contingency table is pinned and
    # every marginal (row, column, grand total) is derived FROM it —
    # the un-shared derivation scanned documents once per marginal
    # (4 scans; plan-audit campaign r8, the mix-drift idiom)
    obs = pin(d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o")))
    rmar = obs.groupBy("lang").agg(F.sum("o").alias("n_r"))
    cmar = obs.groupBy("source").agg(F.sum("o").alias("n_c"))
    # COALESCE: sum over an empty obs is NULL while the oracle's
    # COUNT-over-d tot is 0 — the value only ever surfaces through
    # MAX over the (then-empty) grid today, but the frames must state
    # the same empty-corpus total so a future consumer cannot diverge
    # (ADVICE r8)
    tot = obs.agg(F.coalesce(F.sum("o"), F.lit(0)).alias("n"))
    grid = (
        rmar.crossJoin(F.broadcast(cmar))
        .join(obs, ["lang", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            F.coalesce("o", F.lit(0)).alias("o"),
            "n_r",
            "n_c",
            "n",
        )
    )
    diff = (F.col("o") * F.col("n") - F.col("n_r") * F.col("n_c")).cast("double")
    den = (
        F.col("n").cast("double")
        * F.col("n_r").cast("double")
        * F.col("n_c").cast("double")
    )
    cell_fp = F.floor(diff * diff / den * F.lit(1e9)).cast("long")
    grid = grid.withColumn("cell_fp", cell_fp)
    dims = grid.agg(
        F.sum("cell_fp").alias("chi2_fp"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.max("n").alias("n_docs"),
    )
    chi2 = F.col("chi2_fp").cast("double") / F.lit(1e9)
    mindim = F.least(F.col("n_langs") - 1, F.col("n_sources") - 1)
    return dims.select(
        "n_docs",
        "n_langs",
        "n_sources",
        chi2.alias("chi2"),
        F.when(
            (mindim > 0) & (F.col("n_docs") > 0),
            F.sqrt(
                chi2 / (F.col("n_docs").cast("double") * mindim.cast("double"))
            ),
        ).alias("cramers_v"),
    )


def CRAMERS_V_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return """
WITH d AS (SELECT lang, source FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL),
obs AS (SELECT lang, source, COUNT(*) AS o FROM d GROUP BY 1, 2),
rmar AS (SELECT lang, COUNT(*) AS n_r FROM d GROUP BY 1),
cmar AS (SELECT source, COUNT(*) AS n_c FROM d GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM d),
grid AS (
    SELECT rmar.lang, cmar.source, COALESCE(obs.o, 0) AS o, n_r, n_c, n
    FROM rmar CROSS JOIN cmar
    LEFT JOIN obs ON obs.lang = rmar.lang AND obs.source = cmar.source
    CROSS JOIN tot
),
cells AS (
    SELECT *,
           CAST(FLOOR(
               CAST(o * n - n_r * n_c AS DOUBLE)
               * CAST(o * n - n_r * n_c AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n_r AS DOUBLE) * CAST(n_c AS DOUBLE))
               * 1e9
           ) AS BIGINT) AS cell_fp
    FROM grid
),
dims AS (
    SELECT SUM(cell_fp) AS chi2_fp,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT source) AS n_sources,
           MAX(n) AS n_docs
    FROM cells
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_langs AS BIGINT) AS n_langs,
       CAST(n_sources AS BIGINT) AS n_sources,
       CAST(chi2_fp AS DOUBLE) / 1e9 AS chi2,
       CASE WHEN LEAST(n_langs - 1, n_sources - 1) > 0 AND n_docs > 0
            THEN sqrt((CAST(chi2_fp AS DOUBLE) / 1e9)
                      / (CAST(n_docs AS DOUBLE)
                         * CAST(LEAST(n_langs - 1, n_sources - 1) AS DOUBLE)))
       END AS cramers_v
FROM dims
"""


def weighted_percentiles_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted price percentiles per return flag: the price
    below which p% of shipped UNITS fall — the distributional readout
    that a per-line percentile silently misstates whenever cheap lines
    carry big quantities (a 97-unit line is one vote in the unweighted
    histogram but 97 votes here). Same single rendering of the
    ``cum·100 ≥ p·n`` read-off (:func:`group_percentiles_disc`), with
    the histogram accumulating integer quantities."""
    li = (
        catalog.load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_extendedprice",
            F.col("l_quantity").cast("long").alias("_w"),
        )
        # a vote needs BOTH a price (position) and a quantity (mass);
        # stated identically in the oracle
        .filter(
            F.col("l_extendedprice").isNotNull() & F.col("_w").isNotNull()
        )
    )
    return group_percentiles_disc(
        li, ["l_returnflag"], "l_extendedprice", weight=F.col("_w")
    ).withColumnRenamed("n_values", "total_units").orderBy("l_returnflag")


def WEIGHTED_PCT_SQL(pcts: tuple[int, ...] = PCTS) -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    reads = ",\n       ".join(
        f"MIN(CASE WHEN cum * 100 >= {p} * n THEN l_extendedprice END) AS p{p}"
        for p in pcts
    )
    return f"""
WITH hist AS (
    SELECT l_returnflag, l_extendedprice,
           SUM(CAST(l_quantity AS BIGINT)) AS c
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    GROUP BY 1, 2
),
cum AS (
    SELECT l_returnflag, l_extendedprice, c,
           SUM(c) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                        ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(c) OVER (PARTITION BY l_returnflag) AS n
    FROM hist
)
SELECT l_returnflag,
       CAST(MAX(n) AS BIGINT) AS total_units,
       {reads}
FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Delete-one-bucket jackknife standard error
# ---------------------------------------------------------------------------

JK_BUCKETS = 32


def jackknife_se_price_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delete-d jackknife standard error of the mean order price per
    priority — distributed uncertainty quantification: a point
    estimate (the mean) ships with a resampling-based SE without ever
    materializing resamples. Rows land in ``JK_BUCKETS`` deterministic
    salted-md5 buckets (the curation split discipline); each
    leave-one-bucket-out replicate mean is computed from the ONE
    bucket-sums frame by subtraction, and
    SE = sqrt((g−1)/g · Σ_g (m_g − m̄)²) over the g PRESENT buckets.

    Exactness: prices sum as exact cents; each replicate mean is one
    double division quantized to 1e-6-cent integers (ROUND, identical
    in both engines — the exact_avg discipline), and the variance is
    the integer identity ``g·Σq² − (Σq)²`` in decimal(38,0) with the
    one sqrt/division at the read-off. A group where some replicate is
    degenerate (a bucket holds ALL of the group's rows, so the
    leave-it-out mean is 0/0) reads SE = NULL — stated in both
    engines. The double cast of the exact cent sums is faithful below
    2⁵³ cents per group (~9·10¹³ dollars); past that the mean itself
    needs the decimal read-off, stated here, not silently wrong.
    NULL prices are excluded; the NULL-priority lace rows drop at the
    bucket⋈totals join in BOTH engines (equality join semantics).

    Scale shape: one scan → one map-side-combined (priority, bucket)
    aggregate (≤ groups·32 rows leave the map side); everything after
    is arithmetic on that K-row frame — totals derive FROM it, never a
    second corpus pass — with one broadcast join back.
    """
    from pac_spark.cache import pin
    from pac_spark.functions.hashing import md5_bucket

    g = JK_BUCKETS
    b = pin(
        catalog.load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            md5_bucket(
                F.concat(F.lit("jk|"), F.col("o_orderkey").cast("string")),
                g,
            ).alias("g"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("s_g"),
        )
    )
    t = b.groupBy("prio").agg(
        F.count(F.lit(1)).alias("g_cnt"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
    )
    q = b.join(F.broadcast(t), "prio").select(
        "prio",
        F.when(F.col("n") == F.col("n_g"), F.lit(None))
        .otherwise(
            F.round(
                (F.col("s") - F.col("s_g")).cast("double")
                / (F.col("n") - F.col("n_g"))
                * F.lit(1000000.0)
            ).cast("long")
        )
        .alias("q"),
    )
    agg = q.groupBy("prio").agg(
        F.max(
            F.when(F.col("q").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("degen"),
        F.sum(F.col("q").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sq"),
    )
    se = F.sqrt(
        (
            (F.col("g_cnt") - 1).cast("decimal(38,0)")
            * (
                F.col("g_cnt").cast("decimal(38,0)") * F.col("sq")
                - F.col("s1") * F.col("s1")
            )
        ).cast("double")
    ) / (F.col("g_cnt").cast("double") * F.lit(100000000.0))
    return (
        t.join(F.broadcast(agg), "prio")
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("g_cnt").cast("long").alias("n_buckets"),
            (
                F.col("s").cast("double")
                / (F.col("n").cast("double") * F.lit(100.0))
            ).alias("mean_price"),
            F.when(F.col("degen") == 1, F.lit(None)).otherwise(se).alias(
                "jackknife_se"
            ),
        )
        .orderBy("o_orderpriority")
    )


def JACKKNIFE_SQL(g: int = JK_BUCKETS) -> str:
    """DuckDB oracle: the identical bucket-subtraction replicates."""
    from pac_spark.functions.hashing import md5_bucket_sql

    bucket = md5_bucket_sql("'jk|' || CAST(o_orderkey AS VARCHAR)", g)
    return f"""
WITH b AS (
    SELECT o_orderpriority AS prio, {bucket} AS g,
           COUNT(*) AS n_g,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS s_g
    FROM orders WHERE o_totalprice IS NOT NULL
    GROUP BY 1, 2
),
t AS (
    SELECT prio, COUNT(*) AS g_cnt, SUM(n_g) AS n, SUM(s_g) AS s
    FROM b GROUP BY prio
),
q AS (
    SELECT b.prio,
           CASE WHEN t.n = b.n_g THEN NULL
                ELSE CAST(ROUND(CAST(t.s - b.s_g AS DOUBLE)
                                / (t.n - b.n_g) * 1000000.0) AS BIGINT)
           END AS q
    FROM b JOIN t ON b.prio = t.prio
),
agg AS (
    SELECT prio,
           MAX(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS degen,
           SUM(CAST(q AS HUGEINT)) AS s1,
           SUM(CAST(q AS HUGEINT) * q) AS sq
    FROM q GROUP BY prio
)
SELECT t.prio AS o_orderpriority,
       CAST(t.n AS BIGINT) AS n_rows,
       CAST(t.g_cnt AS BIGINT) AS n_buckets,
       CAST(t.s AS DOUBLE) / (CAST(t.n AS DOUBLE) * 100.0) AS mean_price,
       CASE WHEN agg.degen = 1 THEN NULL
            ELSE sqrt(CAST((t.g_cnt - 1)
                           * (t.g_cnt * agg.sq - agg.s1 * agg.s1)
                           AS DOUBLE))
                 / (CAST(t.g_cnt AS DOUBLE) * 100000000.0)
       END AS jackknife_se
FROM t JOIN agg ON t.prio = agg.prio
ORDER BY o_orderpriority
"""
