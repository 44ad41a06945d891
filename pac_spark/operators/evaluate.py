"""Offline model-evaluation metrics: exact AUC and decile lift.

A training-data pipeline ends in an evaluation job: given a score
column and a binary outcome, how well does the score rank positives
above negatives? These are the two standard readouts, built to the
engine's exact-arithmetic rules so they hash-match the oracle:

- :func:`auc_value_predicts_purchase` — ROC AUC via the Mann-Whitney
  rank-sum identity with the textbook tie correction (ties count 1/2),
  kept exact by doubling: ``U2 = Σ_v n_pos(v)·(2·n_neg_below(v) +
  n_neg(v))`` is an integer, and ``AUC = U2 / (2·n_pos·n_neg)`` is one
  IEEE division of decimal(38,0) operands (row-count products overflow
  BIGINT long before 100 TB).
- :func:`decile_lift_value_purchase` — the gains table: score deciles
  from exact histogram percentile boundaries (the RFM boundary idiom —
  NO global NTILE window, which would serialize the table through one
  task), per-decile outcome rate and lift vs the base rate.

Scale shape (both): ONE map-side-combined ``groupBy(score)`` histogram
is the only pass over raw rows; everything after is histogram-sized.
The AUC cumulative window is unpartitioned BUT runs over the
histogram, whose row count is bounded by the value domain, not the
table (same posture as ``stats.group_percentiles_disc``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog

__all__ = [
    "auc_value_predicts_purchase",
    "AUC_SQL",
    "decile_lift_value_purchase",
    "DECILE_LIFT_SQL",
]

_DEC38 = "decimal(38,0)"


def _scored_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cents, pos) pairs for evaluation: NULL scores excluded, NULL
    event_type counted as negative — the shared contract of both
    metrics (see the callers' docstrings)."""
    return (
        catalog.load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(0))
            .alias("pos"),
        )
    )


def auc_value_predicts_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row frame: how well ``value`` ranks purchase events above
    all other events (n_pos, n_neg, distinct scores, AUC, Gini).
    Degenerate label sets (no positives or no negatives) yield NULL
    AUC instead of an ANSI divide-by-zero.

    NULL semantics (stated in BOTH engines): rows with a NULL score
    are excluded — an unscored event cannot be ranked, and the engines
    disagree on NULL sort order (Spark window NULLS FIRST vs DuckDB
    NULLS LAST), so any other treatment is engine-divergent. A NULL
    ``event_type`` counts as a negative (it is not a purchase), the
    oracle's ``CASE ... ELSE 0`` — a bare ``(col == lit)`` cast would
    silently drop the row from BOTH classes instead."""
    ev = _scored_events(spark, sf_dir)
    hist = ev.groupBy("cents").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
    )
    below_w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(below_w), F.lit(0)).alias("neg_below"),
    )
    agg = cum.agg(
        F.sum(
            F.col("n_pos").cast(_DEC38)
            * (F.lit(2) * F.col("neg_below") + F.col("n_neg")).cast(_DEC38)
        ).alias("u2"),
        F.sum("n_pos").alias("np"),
        F.sum("n_neg").alias("nn"),
        F.count("*").alias("n_scores"),
    )
    den = F.lit(2).cast(_DEC38) * F.col("np").cast(_DEC38) * F.col("nn").cast(_DEC38)
    auc = F.when(
        (F.col("np") > 0) & (F.col("nn") > 0),
        F.col("u2").cast("double") / den.cast("double"),
    )
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.col("n_scores").cast("long").alias("n_distinct_scores"),
        auc.alias("auc"),
        (F.lit(2.0) * auc - F.lit(1.0)).alias("gini"),
    )


AUC_SQL = """
WITH ev AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
    WHERE value IS NOT NULL
), hist AS (
    SELECT cents, SUM(pos) AS n_pos, SUM(1 - pos) AS n_neg
    FROM ev GROUP BY cents
), cum AS (
    SELECT n_pos, n_neg,
           COALESCE(SUM(n_neg) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
    FROM hist
), agg AS (
    SELECT SUM(CAST(n_pos AS HUGEINT) * CAST(2 * neg_below + n_neg AS HUGEINT))
               AS u2,
           SUM(n_pos) AS np, SUM(n_neg) AS nn, COUNT(*) AS n_scores
    FROM cum
)
SELECT CAST(np AS BIGINT) AS n_pos,
       CAST(nn AS BIGINT) AS n_neg,
       CAST(n_scores AS BIGINT) AS n_distinct_scores,
       CASE WHEN np > 0 AND nn > 0 THEN
           CAST(u2 AS DOUBLE)
               / CAST(2 * CAST(np AS HUGEINT) * CAST(nn AS HUGEINT) AS DOUBLE)
       END AS auc,
       2.0 * (CASE WHEN np > 0 AND nn > 0 THEN
           CAST(u2 AS DOUBLE)
               / CAST(2 * CAST(np AS HUGEINT) * CAST(nn AS HUGEINT) AS DOUBLE)
       END) - 1.0 AS gini
FROM agg
"""


DECILE_PCTS = (10, 20, 30, 40, 50, 60, 70, 80, 90)


def decile_lift_value_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gains table: events bucketed into value deciles (1 = lowest
    values) by exact histogram percentile boundaries, per-decile
    purchase rate and lift over the base rate. Boundary ties land in
    the lower bucket (the `stats._score` convention), so with heavy
    ties deciles are unequal by construction — the deterministic
    cross-engine semantics, unlike a global NTILE which would also
    serialize the table through one window task.

    NULL semantics: identical to :func:`auc_value_predicts_purchase`
    (NULL scores excluded in both engines, NULL event_type = negative).

    Scale shape: ONE ``groupBy(cents)`` histogram is the only pass
    over raw rows; the boundary read-off rides it via the weighted
    percentile route and the per-decile counts are weighted sums over
    the SAME pinned histogram — the raw table is never scanned twice."""
    from pac_spark.cache import pin
    from pac_spark.operators.stats import group_percentiles_disc

    ev = _scored_events(spark, sf_dir)
    hist = pin(
        ev.groupBy("cents").agg(F.count("*").alias("_c"), F.sum("pos").alias("_np"))
    )
    bounds = group_percentiles_disc(
        hist.select(F.col("cents").alias("_v"), "_c"),
        [],
        "_v",
        DECILE_PCTS,
        weight=F.col("_c"),
    ).select(*[f"p{p}" for p in DECILE_PCTS])
    decile = sum(
        (F.when(F.col("cents") > F.col(f"p{p}"), 1).otherwise(0) for p in DECILE_PCTS),
        F.lit(1),
    ).cast("int")
    per = (
        hist.crossJoin(F.broadcast(bounds))
        .select(decile.alias("value_decile"), "_c", "_np")
        .groupBy("value_decile")
        .agg(F.sum("_c").alias("n_events"), F.sum("_np").alias("n_purchases"))
    )
    totals = per.agg(
        F.sum("n_events").alias("n_total"), F.sum("n_purchases").alias("n_pos_total")
    )
    lift_num = F.col("n_purchases").cast(_DEC38) * F.col("n_total").cast(_DEC38)
    lift_den = F.col("n_events").cast(_DEC38) * F.col("n_pos_total").cast(_DEC38)
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "value_decile",
            "n_events",
            "n_purchases",
            (
                F.col("n_purchases").cast("double") / F.col("n_events").cast("double")
            ).alias("purchase_rate"),
            F.when(
                F.col("n_pos_total") > 0,
                lift_num.cast("double") / lift_den.cast("double"),
            ).alias("lift"),
        )
        .orderBy("value_decile")
    )


def _decile_lift_sql() -> str:
    bound_cols = ", ".join(
        f"MIN(CASE WHEN cum * 100 >= {p} * n THEN cents END) AS p{p}"
        for p in DECILE_PCTS
    )
    decile = " + ".join(
        f"CASE WHEN cents > (SELECT p{p} FROM bounds) THEN 1 ELSE 0 END"
        for p in DECILE_PCTS
    )
    return f"""
WITH ev AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
    WHERE value IS NOT NULL
), hist AS (
    SELECT cents, COUNT(*) AS c FROM ev GROUP BY cents
), cumh AS (
    SELECT cents,
           SUM(c) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER () AS n
    FROM hist
), bounds AS (SELECT {bound_cols} FROM cumh),
per AS (
    SELECT CAST(1 + {decile} AS INT) AS value_decile,
           COUNT(*) AS n_events, SUM(pos) AS n_purchases
    FROM ev GROUP BY 1
), totals AS (
    SELECT SUM(n_events) AS n_total, SUM(n_purchases) AS n_pos_total FROM per
)
SELECT value_decile,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(n_purchases AS DOUBLE) / CAST(n_events AS DOUBLE) AS purchase_rate,
       CASE WHEN n_pos_total > 0 THEN
           CAST(CAST(n_purchases AS HUGEINT) * CAST(n_total AS HUGEINT) AS DOUBLE)
               / CAST(CAST(n_events AS HUGEINT) * CAST(n_pos_total AS HUGEINT)
                      AS DOUBLE)
       END AS lift
FROM per CROSS JOIN totals
ORDER BY value_decile
"""


DECILE_LIFT_SQL = _decile_lift_sql()
