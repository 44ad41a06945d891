"""Two-phase global prefix sums — the scale-legal form of an
unpartitioned running-total window.

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY collapses the whole
input into ONE task (Spark plans a single-partition Window exchange),
which is the textbook 100 TB scale-killer. But a running total is a
classic two-phase computation — the same decomposition every parallel
prefix-sum algorithm (Blelloch scan) uses:

1. bucket rows by any expression MONOTONE in the order key (a day for
   timestamps, ``value div 10^6`` for integer domains): running sums
   inside each bucket are an ordinary PARTITIONed window, fully
   parallel;
2. per-bucket totals form a tiny frame (one row per bucket — bounded
   by the calendar / the value domain, not by row count); an
   unpartitioned window over THAT is harmless, and yields each
   bucket's starting offset;
3. broadcast-join the offsets back: ``global running = in-bucket
   running + offset``.

The reference's engines get this for free from their single-node
sequential scans (e.g. the pandas ``cumsum`` idiom around
``executive_review_tool.py``'s summaries); on a cluster it must be
re-derived, hence this helper.

Row-order caveat: a running sum is only well-defined per-row when the
order key is unique (or rows with equal keys are pre-aggregated).
Callers here always group to distinct order keys first; the helper
asserts nothing and documents the contract instead, matching Spark's
own ROWS-frame semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["global_running_sums", "global_running_max"]


def global_running_sums(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    bucket: Column,
    prefix: str = "run_",
) -> DataFrame:
    """Append ``{prefix}{v}`` = global running (inclusive) sum of each
    ``v`` in *value_cols*, ordered by *order_col*, without ever forming
    a single-task window over the data.

    ``bucket`` must be monotone non-decreasing in ``order_col`` (same
    order key -> same bucket, larger key -> same-or-larger bucket) and
    ``order_col`` must be distinct per row; both hold for the grouped
    event frames this repo feeds in.

    NULL semantics match ``SUM(v) OVER (ORDER BY k)`` exactly: NULL
    values are skipped, and the running sum is NULL only while the
    global prefix holds no non-null value — the offset rides a
    null-skipping SUM over an EXCLUSIVE bucket frame and the combine
    treats each side's NULL as "empty prefix part", never as a
    poisoning operand (code-review r8: the prior inclusive-minus-own
    offset turned one all-NULL bucket into NULLs for the whole
    bucket). Rows whose bucket expression is NULL are kept via a
    null-safe offset join (they sort first, Spark NULLS FIRST).
    """
    _guard_reserved(
        df, ["_pb"]
        + [f"_{t}_{v}" for v in value_cols for t in ("in", "tot", "off")]
        + [f"{prefix}{v}" for v in value_cols],
    )
    b = df.withColumn("_pb", bucket)
    in_w = (
        W.partitionBy("_pb")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run_in = b.select(
        "*", *[F.sum(v).over(in_w).alias(f"_in_{v}") for v in value_cols]
    )
    totals = b.groupBy("_pb").agg(
        *[F.sum(v).alias(f"_tot_{v}") for v in value_cols]
    )
    # one row per bucket: the unpartitioned window is over a
    # calendar/domain-bounded frame, not the data. Exclusive frame +
    # null-skipping SUM: a bucket's offset is the sum over PRECEDING
    # buckets' non-null totals, NULL only when every one is NULL.
    off_w = W.orderBy("_pb").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        F.col("_pb").alias("_pb_off"),
        *[F.sum(f"_tot_{v}").over(off_w).alias(f"_off_{v}") for v in value_cols],
    )
    joined = run_in.join(
        F.broadcast(offsets), F.col("_pb").eqNullSafe(F.col("_pb_off"))
    )

    def combine(v: str) -> Column:
        i, o = F.col(f"_in_{v}"), F.col(f"_off_{v}")
        return F.when(i.isNull() & o.isNull(), F.lit(None)).otherwise(
            F.coalesce(i, F.lit(0)) + F.coalesce(o, F.lit(0))
        )

    return joined.select(
        *df.columns,
        *[combine(v).alias(f"{prefix}{v}") for v in value_cols],
    )


def _guard_reserved(df: DataFrame, names: list[str]) -> None:
    """Raise on internal-column collisions — ``withColumn`` would
    silently REPLACE a same-named user column and the final
    ``select(*df.columns)`` would emit scratch values under the user's
    name (code-review r8; same contract as salting._SALT_COL)."""
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"global prefix scan reserves column names {clash}; "
            "rename them in the input frame"
        )


def global_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket: Column,
    out: str = "run_max",
    inclusive: bool = True,
) -> DataFrame:
    """Append ``out`` = global running MAX of ``value_col`` ordered by
    ``order_col`` — same two-phase decomposition as
    :func:`global_running_sums` (max is associative and commutative,
    so the identical bucket split applies; the combine is ``greatest``
    instead of ``+``).

    With ``inclusive=False`` the frame is strictly-preceding rows:
    the first row overall gets NULL (an empty prefix has no max), the
    property dominance tests (skyline) need. Same contracts as the sum
    variant: bucket monotone in the order key, distinct order keys.
    """
    _guard_reserved(df, ["_pb", "_in", "_tot", "_off", out])
    b = df.withColumn("_pb", bucket)
    hi = W.currentRow if inclusive else -1
    in_w = (
        W.partitionBy("_pb").orderBy(order_col).rowsBetween(W.unboundedPreceding, hi)
    )
    run_in = b.select("*", F.max(value_col).over(in_w).alias("_in"))
    totals = b.groupBy("_pb").agg(F.max(value_col).alias("_tot"))
    # strictly-preceding buckets either way: the in-bucket part covers
    # the current bucket
    off_w = W.orderBy("_pb").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        F.col("_pb").alias("_pb_off"), F.max("_tot").over(off_w).alias("_off")
    )
    # null-safe: a NULL bucket row must get its offset (= NULL, it
    # sorts first), not vanish through an equi-join (code-review r8)
    joined = run_in.join(
        F.broadcast(offsets), F.col("_pb").eqNullSafe(F.col("_pb_off"))
    )
    # greatest() skips NULLs (empty in-bucket prefix / first bucket),
    # returning NULL only when both sides are empty — exactly the
    # empty-global-prefix case
    return joined.select(
        *df.columns, F.greatest(F.col("_in"), F.col("_off")).alias(out)
    )
