"""Relational operator suite over the TPC-H-ish testdata.

The reference's relational surface is thin (full scans + one lookup
join + nested-dict groupings — SURVEY.md §2); this module supplies the
full breadth a query engine owes its users — multi-way joins,
aggregation variants (incl. rollup/cube), window functions, set
operations, top-k — each as a composable ``(spark, sf_dir) ->
DataFrame`` plan built for scale:

- joins declare smallness with ``F.broadcast`` only for genuinely
  bounded dims (region/nation/supplier); fact-fact joins are left to
  Catalyst/AQE to plan as sort-merge or shuffled hash with skew
  splitting;
- aggregates use the exact-cents pattern (``pac_spark.functions.exact``)
  so results are bit-identical regardless of partial-aggregation order —
  at any partition count, on any cluster size;
- temporal outputs are formatted to strings so results are
  engine-portable (no timestamp-representation ambiguity);
- sorts appear only at plan tops where the query promises order;
  ``limit`` after ``orderBy`` executes as TakeOrderedAndProject
  (per-partition heap + driver merge), never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.cache import pin
from pac_spark.functions.exact import exact_avg, int_div, money_sum

__all__ = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top_customers_by_revenue",
    "window_rank_orders",
    "window_running_events",
    "window_distribution_stats",
    "rollup_region_nation",
    "cube_flag_status",
    "set_ops_customers",
    "semi_anti_customers",
    "scalar_functions_showcase",
    "json_events_extract",
    "distinct_counts_by_segment",
    "approx_distinct_parts",
    "q6_forecast_revenue",
    "q18_large_orders",
    "pivot_daily_event_counts",
    "grouping_sets_revenue",
    "q4_late_shipments",
    "q13_order_distribution",
    "q17_small_quantity_revenue",
    "q22_idle_customers",
    "cohort_retention",
    "event_transition_matrix",
    "basket_part_pairs",
    "rolling_1h_user_stats",
    "daily_user_accounting",
    "user_growth_accounting",
    "user_growth_from_days",
    "GROWTH_SQL",
    "user_day_accounting",
    "skyline_suppliers",
    "open_orders_daily",
    "OPEN_ORDERS_SQL",
    "SKYLINE_SQL",
    "DAILY_USERS_SQL",
]

_DATE = "yyyy-MM-dd"
_TS6 = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: one wide partial+final hash
    aggregate over the filtered lineitem scan — single shuffle, filter
    and column pruning pushed to parquet."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price, scale=4).alias("sum_disc_price"),
            money_sum(charge, scale=6).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount"), scale=4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join, revenue per undelivered order, top 10.

    customer(filter) ⋈ orders(filter) ⋈ lineitem(filter): Catalyst
    pushes each filter below its join; AQE turns the customer side into
    a broadcast when it fits. Top-10 runs as TakeOrderedAndProject.
    """
    cust = catalog.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = catalog.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01")
    )
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue, scale=4).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", _DATE).alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where the supplier is in the
    customer's nation, region-restricted.

    region/nation are bounded dims → explicit broadcast; supplier
    SCALES with SF (~1B rows at the 100 TB point), so it gets no
    broadcast hint — AQE broadcasts it while it measures small and
    shuffles it when it does not (code-review r7: the old forced hint
    would hit the 8 GB broadcast hard limit exactly at scale). The
    orders⋈lineitem fact join shuffles on orderkey and is the only
    always-large exchange in the plan.
    """
    region = catalog.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = catalog.load(spark, sf_dir, "nation")
    supplier = catalog.load(spark, sf_dir, "supplier")
    customer = catalog.load(spark, sf_dir, "customer")
    orders = catalog.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = catalog.load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .filter(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(revenue, scale=4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (revenue desc, custkey tiebreak)."""
    customer = catalog.load(spark, sf_dir, "customer")
    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_revenue"),
        )
        .orderBy(F.desc("total_revenue"), "c_custkey")
        .limit(20)
    )


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: each customer's top-3 orders by price.

    One shuffle on the partition key; rank/dense_rank/row_number share
    the same window frame so Spark evaluates them in a single pass.
    """
    orders = catalog.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


def window_running_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows over the events stream table: lag/lead and a
    running sum per user in time order.

    The running double sum is deterministic cross-engine because the
    accumulation order is fully specified (ts, event_id unique).
    """
    events = catalog.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS6).alias("ts_str"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.sum("value").over(run), 2).alias("running_value"),
        F.row_number().over(w).alias("event_seq"),
    )


WINDOW_DIST_TOP = 20


# promoted to functions/exact.py (r6) so other operator families can
# share the exact-integer-division idiom; see int_div's docstring
_idiv = int_div


def _ntile4(r, n):
    """Exact NTILE(4) of rank ``r`` in a group of ``n`` (both Column):
    the first (n % 4) buckets hold (n div 4 + 1) rows, the rest
    (n div 4) — the remainder-first distribution every SQL engine
    implements. Kept as pure integer/column arithmetic (``_idiv``) so
    the two-phase window plan can reproduce the whole-window semantics
    from (rank, group size) alone; exhaustively unit-tested against a
    reference NTILE over all group sizes (test_function_properties)."""
    rem = n % 4
    base = _idiv(n, F.lit(4))
    big_span = (base + 1) * rem
    in_big = _idiv(r - 1, base + 1) + 1
    # the divide-by-base expression is only SELECTED when r > big_span
    # (which implies base >= 1); the protection for n < 4 groups is
    # F.when's BRANCH LAZINESS — under Spark 4's default ANSI mode a
    # hoisted/eager evaluation of this expression would throw
    # DIVIDE_BY_ZERO (code-review r7 corrected the old non-ANSI claim)
    in_small = rem + _idiv(r - big_span - 1, base) + 1
    return F.when(base == F.lit(0), r).otherwise(
        F.when(r <= big_span, in_big).otherwise(in_small)
    )


def window_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution / positional window stats (§2.5 completion) —
    ntile quartile, percent_rank, cume_dist, nth_value, and the ±1-row
    neighbor keys for each priority class's top rows — WITHOUT a
    whole-class window.

    The group key has cardinality ~5, so the naive window (the
    oracle's spec) puts a fifth of the table in one task — exactly the
    single-task-per-group shape this engine rejects at 100 TB (same
    move as ``lang_quality_quantiles``). Instead:

    - two-phase top-k: a window over (class, input partition) keeps
      each task's local top-(k+1) — thousands of small partitions, no
      hot task — then the global window ranks only the bounded
      survivors (≤ (k+1)·n_input_partitions rows per class). The
      global top-k is a subset of the local top-ks; the (k+1)th
      survivor exists only to supply the kth row's trailing neighbor.
    - group sizes from one map-side-combined aggregate (5 rows,
      broadcast), and the distribution stats derived arithmetically
      from (rank, n): percent_rank = (r-1)/(n-1), cume_dist = r/n
      (ordering is unique), ntile via the exact remainder-first bucket
      formula. Hash equality against the plain-window oracle proves
      the arithmetic IS the window semantics.
    """
    k = WINDOW_DIST_TOP
    orders = (
        catalog.load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        # stated in the oracle too: NULL-priority rows have no class,
        # NULL prices no rank (engines disagree on NULL sort order)
        .filter(
            F.col("o_orderpriority").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
    )
    local_w = W.partitionBy("o_orderpriority", "_pid").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    survivors = (
        # pid materialized in a Project (windows reject non-deterministic
        # expressions inline); ANY pid assignment preserves correctness —
        # the global top-k is a subset of every per-pid top-k union
        orders.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local_w))
        .filter(F.col("_lrn") <= k + 1)
        .drop("_lrn", "_pid")
    )
    sizes = orders.groupBy("o_orderpriority").agg(F.count("*").alias("_n"))
    gw = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = (
        survivors.withColumn("rn", F.row_number().over(gw))
        .withColumn("_next_key", F.lead("o_orderkey").over(gw))
        .withColumn("_prev_key", F.lag("o_orderkey").over(gw))
        .withColumn(
            "_third_key",
            F.nth_value("o_orderkey", 3).over(
                gw.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .filter(F.col("rn") <= k)
        .join(F.broadcast(sizes), "o_orderpriority")
    )
    r, n = F.col("rn").cast("long"), F.col("_n")
    ntile4 = _ntile4(r, n)
    return ranked.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.col("rn").cast("int").alias("rn"),
        ntile4.cast("int").alias("price_quartile"),
        F.round(
            F.when(n == 1, F.lit(0.0)).otherwise(
                (r - 1).cast("double") / (n - 1).cast("double")
            ),
            8,
        ).alias("pct_rank"),
        F.round(r.cast("double") / n.cast("double"), 8).alias("cume"),
        F.col("_third_key").alias("third_key_so_far"),
        F.coalesce("_prev_key", "o_orderkey").alias("prev_or_self_key"),
        F.coalesce("_next_key", "o_orderkey").alias("next_or_self_key"),
    ).orderBy("o_orderpriority", "rn")


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation): customer counts + exact acctbal sums at
    nation, region, and grand-total levels in one pass."""
    region = catalog.load(spark, sf_dir, "region")
    nation = catalog.load(spark, sf_dir, "nation")
    customer = catalog.load(spark, sf_dir, "customer")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus): all 2^2 grouping combinations."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            money_sum(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / union over customer-key sets, tagged.

    Sets: customers holding orders with status 'F' vs status 'O'.
    """
    orders = catalog.load(spark, sf_dir, "orders")
    # pinned shared base: each side set feeds THREE set operations —
    # un-pinned, the fact table scanned once per branch (6 scans for
    # one 2-column projection; plan-audit campaign r8)
    base = pin(
        orders.filter(F.col("o_orderstatus").isin("F", "O")).select(
            F.col("o_custkey").alias("c_custkey"), "o_orderstatus"
        )
    )
    f_cust = base.filter(F.col("o_orderstatus") == "F").select("c_custkey")
    o_cust = base.filter(F.col("o_orderstatus") == "O").select("c_custkey")
    both = f_cust.intersect(o_cust).withColumn("tag", F.lit("f_and_o"))
    f_only = f_cust.subtract(o_cust).withColumn("tag", F.lit("f_not_o"))
    o_only = o_cust.subtract(f_cust).withColumn("tag", F.lit("o_not_f"))
    return both.unionByName(f_only).unionByName(o_only).orderBy("tag", "c_custkey")


def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI / LEFT ANTI joins: per segment, customers with and
    without orders — the Spark-native EXISTS / NOT EXISTS."""
    # pinned: both projections feed BOTH the semi and the anti join —
    # un-pinned, each table scanned once per join (plan-audit r8)
    customer = pin(
        catalog.load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    orders = pin(catalog.load(spark, sf_dir, "orders").select("o_custkey"))
    with_orders = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )
    without_orders = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_orders"))
    )
    # null-safe recombine: the oracle computes both counts in ONE
    # grouped pass, so a NULL segment is a single row there — a plain
    # full-outer USING join can never match NULL==NULL and would emit
    # the NULL segment twice (once per side)
    w = with_orders.withColumnRenamed("c_mktsegment", "_seg_w")
    a = without_orders.withColumnRenamed("c_mktsegment", "_seg_a")
    return (
        w.join(a, w["_seg_w"].eqNullSafe(a["_seg_a"]), "full_outer")
        .select(
            F.coalesce("_seg_w", "_seg_a").alias("c_mktsegment"),
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("c_mktsegment")
    )


def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/conditional scalar surface in one projection —
    pure narrow plan, whole-stage codegen, zero shuffles."""
    part = catalog.load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.lower(F.col("p_type")).alias("type_lower"),
        F.substring(F.col("p_name"), 1, 10).alias("name_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        # explicit class, not \s: Java's \s includes \x0B (vertical
        # tab) while RE2's does not — the one cross-engine regex-class
        # divergence the whitespace-parity pass left (code-review r8)
        F.regexp_replace(F.col("p_name"), r"[ \t\n\x0B\f\r]+", "_").alias(
            "name_slug"
        ),
        # *1.25 adds two binary digits — exact in IEEE754, so no rounding
        # call whose half-way semantics could differ across engines
        (F.col("p_retailprice") * 1.25).alias("price_up25"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_size") % 5).alias("size_mod5"),
        F.greatest(F.col("p_size"), F.lit(10)).alias("size_floor10"),
        F.when(F.col("p_retailprice") > 1500, "premium")
        .when(F.col("p_retailprice") > 1000, "standard")
        .otherwise("budget")
        .alias("price_band"),
    ).orderBy("p_partkey")


def json_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from events.props (string column) + agg.

    ``get_json_object`` runs JVM-side; at scale prefer ``from_json``
    with an explicit schema once the payload shape is fixed.
    """
    events = catalog.load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def distinct_counts_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    customer = catalog.load(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB-scale answer to
    COUNT(DISTINCT) when exactness isn't required.

    Hybrid oracle (VERDICT r2 #6): the raw HLL estimate is
    engine-specific, so instead of emitting it (which would force a
    rows-only check) the query emits the exact count alongside
    ``approx_within_10pct`` — whether the estimate landed within 10% of
    exact. The default rsd is 0.05 and the sketch merge is
    order-independent, so the boolean is deterministic (observed error
    <= 2.7% at every test SF, 3.7x margin) — and DuckDB's oracle can
    assert it as TRUE. A drifting HLL implementation now fails the
    hash check instead of hiding behind rows-only."""
    li = catalog.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.10 * F.col("exact_parts")
            ).alias("approx_within_10pct"),
        )
        .orderBy("l_returnflag")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: single-table filter + global aggregate.

    The whole query is one parquet scan with every predicate pushed to
    the reader (``PushedFilters`` on shipdate/discount/quantity) and a
    two-column ReadSchema; partial sums combine to one row — the ideal
    minimal-IO plan at any scale.
    """
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount"), scale=4).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds a threshold,
    enriched with customer info — aggregate-then-join with a HAVING.

    The heavy groupBy runs on lineitem alone (narrowest possible
    shuffle: one bigint key + one double), and only the few surviving
    orderkeys join back to orders/customer — at 100 TB the join input
    shrinks from billions of rows to the HAVING survivors before any
    wide row is materialized.
    """
    li = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders")
    customer = catalog.load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(money_sum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 55)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", _DATE).alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: events per day × event_type as columns.

    Explicit pivot values keep the plan single-pass (no extra distinct
    job to discover them) — mandatory at scale where the discovery scan
    would read the whole fact table twice.
    """
    events = catalog.load(spark, sf_dir, "events")
    pivoted = (
        events.withColumn("day", F.date_format("ts", _DATE))
        .groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    ).orderBy("day")


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface: revenue by (status, priority),
    by status alone, and grand total — strictly the groups asked for,
    unlike CUBE which would also compute (priority)."""
    catalog.load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    from pac_spark.functions.exact import money_sum_sql

    # the exact-cents sum comes from the shared emitter (valid in both
    # Spark SQL and DuckDB — the oracle composes the same call), so
    # the pattern cannot drift between the two engines
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {money_sum_sql("o_totalprice")} AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style correlated EXISTS: orders with at least one
    lineitem shipped more than 60 days after the order date, counted
    per priority.

    The correlated subquery is expressed directly as a LEFT SEMI join
    with a non-equi condition — Spark's native decorrelation target: the
    fact side streams once, each order emits at most one row regardless
    of how many late lineitems it has (no fan-out, no distinct)."""
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.to_date(li.l_shipdate) > F.date_add(F.to_date(orders.o_orderdate), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of customers by order count,
    including zero-order customers — LEFT OUTER join with the filter
    inside the join condition (a WHERE would silently turn the outer
    join inner), then two stacked aggregations."""
    customer = catalog.load(spark, sf_dir, "customer")
    orders = catalog.load(spark, sf_dir, "orders")
    counts = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar aggregate: revenue from
    lineitems whose quantity is below 20% of the per-part average,
    for one brand.

    The correlated AVG decorrelates into a narrow per-part aggregate
    joined back to the fact — the aggregate input is (partkey,
    quantity) only, semi-joined against the broadcast brand part list
    BEFORE aggregating: the per-part threshold is only ever read for
    brand parts (~1/25 of the part space), so aggregating every part
    and discarding 96% of the groups in the join was pure waste
    (code-review r7; results bit-identical)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    part = catalog.load(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    # pinned: the brand slice feeds BOTH the threshold aggregate and
    # the fact side; projected to the three consumed columns first so
    # the pin stores the pruned slice, not the full row
    brand_li = pin(
        li.select("l_partkey", "l_quantity", "l_extendedprice").join(
            F.broadcast(brand_parts),
            F.col("l_partkey") == brand_parts.p_partkey,
            "left_semi",
        )
    )
    thresholds = brand_li.groupBy("l_partkey").agg(
        (exact_avg(F.col("l_quantity"), scale=2) * 0.2).alias("qty_threshold")
    )
    return (
        brand_li.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (money_sum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
        )
        .select(F.round("avg_yearly", 2).alias("avg_yearly"))
    )


Q22_IDLE_CUTOFF = "2000-01-01"


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers with no orders
    since ``Q22_IDLE_CUTOFF``, tallied per nation group — a global
    scalar subquery (broadcast 1-row cross join, never a driver
    collect) plus a LEFT ANTI join against the recent slice of the
    orders fact. The recency predicate is pushed to the orders scan, so
    the anti-join's build side shrinks before any shuffle — and it
    keeps the query discriminating on this fixture, where every
    customer has at least one order all-time."""
    customer = catalog.load(spark, sf_dir, "customer")
    orders = catalog.load(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= F.lit(Q22_IDLE_CUTOFF))
    avgbal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        exact_avg(F.col("c_acctbal"), scale=2).alias("avg_bal")
    )
    rich = (
        customer.crossJoin(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        rich.groupBy((F.col("c_nationkey") % 5).cast("int").alias("nation_group"))
        .agg(
            F.count("*").alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy("nation_group")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event, counted as active in each subsequent week they
    produced any event — the cohort × week-offset retention matrix in
    long form (the other product-analytics staple next to the funnel).

    Scale shape: first-event week per user (one groupBy on user_id),
    distinct (user, week) activity pairs (same shuffle key), a
    co-hashed join, then a small aggregate over (cohort, offset) —
    cardinality weeks², tiny. countDistinct is safe here because each
    (cohort, offset) group holds at most one row per user by
    construction of the distinct activity pairs.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    )
    first = ev.groupBy("user_id").agg(F.min("w").alias("w0"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("w0")) / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts + exact row-normalized
    permille probabilities — the empirical Markov chain over the event
    stream (what powers next-action prediction and anomaly scoring).

    One window (lag over user_id ordered by ts, event_id) = one
    shuffle on user_id with per-user sorted partitions bounded by user
    activity, then a tiny (types²) aggregate. Probabilities are exact
    integer permille (count·1000 div row_total) so the result is
    hash-comparable — a double division would be safe here too, but
    the integer form keeps the whole frame engine-exact by
    construction.
    """
    ev = catalog.load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    row_totals = pairs.groupBy("event_type").agg(
        F.sum("n_transitions").alias("_row_total")
    )
    return (
        pairs.join(row_totals, "event_type")
        .select(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
            "n_transitions",
            F.expr("(n_transitions * 1000) div _row_total").alias("permille"),
        )
        .orderBy("from_type", "to_type")
    )


BASKET_MIN_COUNT = 3


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: pairs of parts appearing in the
    same order, counted across orders, kept at ≥ BASKET_MIN_COUNT —
    the candidate-generation step of frequent-itemset mining.

    The pair generator is a self-join keyed on l_orderkey (never a
    cartesian): fan-out per order is items², bounded by order size
    (≤ 7 lineitems in TPC-H-shaped data; a retail basket of ~50 items
    stays trivially small). One shuffle for the join, one map-side-
    combined aggregate on the pair. The distinct on (order, part)
    first makes the count "orders containing both", not "lineitem
    pair combinations" — a part ordered twice still counts once."""
    li = (
        catalog.load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= BASKET_MIN_COUNT)
        .orderBy(F.desc("n_orders_together"), "part_a", "part_b")
    )


def rolling_1h_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window: for every event, the count and
    exact-cents value sum of the same user's events in the trailing
    hour (inclusive) — the time-series surface ROWS frames can't
    express (a frame must span a *time interval*, not a row count).

    Spark's rangeBetween needs a numeric order key, so the frame runs
    over ``unix_micros(ts)`` with a ±3.6e9-micro bound — exactly the
    ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`` the
    oracle states. One shuffle on user_id, per-user sorted frames
    bounded by user activity; the sum is integer cents, so the rolling
    values are order-exact at any partition count.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.withColumn("_cents", cents)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", _TS6).alias("ts"),
            F.count("*").over(w).alias("n_events_1h"),
            (F.sum("_cents").over(w).cast("double") / 100.0).alias("sum_value_1h"),
        )
        .orderBy("event_id")
    )


def daily_user_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: active users, NEW users (first-ever-seen that day), and
    the cumulative distinct-user count — the growth-accounting trio
    every activity dashboard opens with.

    The naive cumulative form (``COUNT(DISTINCT user) OVER (ORDER BY
    day)``) re-scans history per day and isn't even valid Spark SQL;
    the scalable identity is ``cumulative(d) = Σ_{d' <= d} new(d')``
    since each user is new exactly once. So: first-seen day per user
    (one map-side-combined min), daily new counts, one running sum
    over the CALENDAR-sized day frame (harmless unpartitioned window;
    at ten years of days it is ~3.7k rows), joined to daily actives
    from the distinct (user, day) projection.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    return user_day_accounting(ev.distinct())


def user_day_accounting(days: DataFrame) -> DataFrame:
    """Growth-accounting read-off over a DISTINCT (user_id, day) frame
    — shared by the batch operator above and the streaming IVM twin
    (``streaming.stateful.streaming_user_accounting``), so the two
    can only drift if the maintained state itself drifts."""
    active = days.groupBy("day").agg(
        F.count("*").alias("n_active_users")
    )
    first_seen = days.groupBy("user_id").agg(F.min("day").alias("day"))
    new_by_day = first_seen.groupBy("day").agg(F.count("*").alias("n_new_users"))
    run = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    cumulative = new_by_day.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(run).alias("n_cumulative_users"),
    )
    return (
        active.join(cumulative, "day", "left")
        .select(
            F.col("day").cast("string").alias("day"),
            "n_active_users",
            F.coalesce("n_new_users", F.lit(0)).alias("n_new_users"),
            # days with zero new users inherit the last cumulative value
            F.last("n_cumulative_users", ignorenulls=True)
            .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("n_cumulative_users"),
        )
        .orderBy("day")
    )


DAILY_USERS_SQL = """
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS day FROM events
), active AS (
    SELECT day, COUNT(DISTINCT user_id) AS n_active_users FROM ev GROUP BY day
), first_seen AS (
    SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id
), new_by_day AS (
    SELECT day, COUNT(*) AS n_new_users FROM first_seen GROUP BY day
), cumulative AS (
    SELECT day, n_new_users,
           SUM(n_new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_cumulative_users
    FROM new_by_day
)
SELECT strftime(a.day, '%Y-%m-%d') AS day,
       CAST(a.n_active_users AS BIGINT) AS n_active_users,
       CAST(COALESCE(c.n_new_users, 0) AS BIGINT) AS n_new_users,
       CAST(LAST_VALUE(c.n_cumulative_users IGNORE NULLS) OVER (
           ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_cumulative_users
FROM active a LEFT JOIN cumulative c ON a.day = c.day
ORDER BY day
"""


def skyline_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (SKYLINE) of suppliers over (total lineitem
    cost ASC better, total quantity DESC better): the suppliers no
    other supplier beats on both axes — the classic multi-criteria
    shortlist operator (Börzsönyi et al., ICDE'01) that engines
    without a SKYLINE clause make users hand-roll as an O(n²)
    NOT EXISTS.

    The 2-D skyline has a linear formulation: sort by cost, then a
    point survives iff its quantity is its cost-group's max AND
    strictly exceeds the running max quantity over all CHEAPER costs.
    That strictly-preceding running max is
    :func:`pac_spark.functions.prefix.global_running_max` — the same
    bucketed two-phase prefix machinery as the sweep line, so no
    single-task window ever sees the supplier frame; the oracle
    deliberately states the INDEPENDENT O(n²) NOT EXISTS dominance
    definition, so hash equality proves the linear plan implements
    the textbook semantics rather than echoing the same construction.

    All integers: cost in exact cents, quantity in whole units.
    """
    from pac_spark.functions.exact import int_div
    from pac_spark.functions.prefix import global_running_max

    from pac_spark.cache import pin

    # pinned: sup feeds the cost-group max AND the final join-back;
    # gmax feeds the prefix helper's two consumers
    sup = pin(
        catalog.load(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cost_cents"
            ),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )
    gmax = pin(sup.groupBy("cost_cents").agg(F.max("total_qty").alias("g_max")))
    cheaper = global_running_max(
        gmax,
        "cost_cents",
        "g_max",
        bucket=int_div(F.col("cost_cents"), F.lit(100_000_000)),
        out="cheaper_max",
        inclusive=False,
    )
    return (
        sup.join(cheaper, "cost_cents")
        .filter(
            (F.col("total_qty") == F.col("g_max"))
            & (
                F.col("cheaper_max").isNull()
                | (F.col("total_qty") > F.col("cheaper_max"))
            )
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            (F.col("cost_cents").cast("double") / 100.0).alias("total_cost"),
            "total_qty",
        )
        .orderBy("total_cost", "suppkey")
    )


SKYLINE_SQL = """
WITH sup AS (
    SELECT l_suppkey AS suppkey,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_cents,
           SUM(CAST(l_quantity AS BIGINT)) AS total_qty
    FROM lineitem GROUP BY l_suppkey
)
SELECT suppkey,
       CAST(cost_cents AS DOUBLE) / 100.0 AS total_cost,
       CAST(total_qty AS BIGINT) AS total_qty
FROM sup s
WHERE NOT EXISTS (
    SELECT 1 FROM sup a
    WHERE a.cost_cents <= s.cost_cents AND a.total_qty >= s.total_qty
      AND (a.cost_cents < s.cost_cents OR a.total_qty > s.total_qty)
)
ORDER BY total_cost, suppkey
"""


def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain growth accounting: split each day's active users into
    NEW (first-ever day), RETAINED (also active the previous day) and
    RESURRECTED (seen before, but not yesterday), plus the day's
    CHURNED count (active yesterday, absent today) — the four-state
    lifecycle readout behind every "growth accounting" chart, with the
    flow identity ``active(d) − active(d−1) = new + resurrected −
    churned`` holding exactly on every row.

    Plan (shared with the streaming twin via
    :func:`user_growth_from_days`): one distinct over (user, day),
    then ONE per-user day-ordered window computing ``lag(day)`` (state
    classification) and ``lead(day)`` together; churn days are emitted
    as exploded marker rows from that same pass — NO day-axis outer
    join exists (the plan-shape test pins exactly that: single scan,
    no outer join, bounded exchanges). A day with zero activity but
    positive churn still appears because its churn markers are rows
    of the same aggregate input. (Code-review r7 rewrote this
    paragraph — it described a two-window + full-outer-join plan that
    was never the shipped shape.)
    """
    days = (
        catalog.load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    return user_growth_from_days(days)


def user_growth_from_days(days: DataFrame) -> DataFrame:
    """Growth-accounting read-off over a DISTINCT (user_id, day) frame
    — shared by the batch operator above and the streaming IVM twin
    (``streaming.stateful.streaming_growth_accounting``), the same
    split as :func:`user_day_accounting`."""
    w = W.partitionBy("user_id").orderBy("day")
    # lag + lead in ONE window pass; each row then emits its own
    # (day, state) plus — when a gap opens after it — a (day+1,
    # 'churned') marker, so the whole readout is ONE scan, one
    # user-keyed window, a ≤2× explode and one day-grain aggregate
    # (no second scan, no full-outer day join)
    cls = days.select(
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    state = (
        F.when(F.col("prev_day").isNull(), F.lit("new"))
        .when(F.datediff("day", "prev_day") == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    active = F.struct(F.col("day"), state.alias("state"))
    churned = F.struct(
        F.date_add("day", 1).alias("day"), F.lit("churned").alias("state")
    )
    gap_opens = F.col("next_day").isNull() | (F.datediff("next_day", "day") > 1)
    marks = cls.select(
        F.explode(
            F.when(gap_opens, F.array(active, churned)).otherwise(F.array(active))
        ).alias("m")
    ).select("m.day", "m.state")

    def _n(s: str) -> Column:
        return F.sum(F.when(F.col("state") == s, 1).otherwise(0))

    return (
        marks.groupBy("day")
        .agg(
            F.sum(F.when(F.col("state") != "churned", 1).otherwise(0)).alias(
                "n_active_users"
            ),
            _n("new").alias("n_new_users"),
            _n("retained").alias("n_retained_users"),
            _n("resurrected").alias("n_resurrected_users"),
            _n("churned").alias("n_churned_users"),
        )
        .select(F.col("day").cast("string").alias("day"), *[
            F.col(c).cast("long").alias(c)
            for c in (
                "n_active_users",
                "n_new_users",
                "n_retained_users",
                "n_resurrected_users",
                "n_churned_users",
            )
        ])
        .orderBy("day")
    )


GROWTH_SQL = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cls AS (
    SELECT day,
           CASE WHEN prev_day IS NULL THEN 'new'
                WHEN day - prev_day = 1 THEN 'retained'
                ELSE 'resurrected' END AS state
    FROM (SELECT user_id, day,
                 LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
          FROM days)
), by_day AS (
    SELECT day,
           COUNT(*) AS n_active_users,
           SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS n_new_users,
           SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS n_retained_users,
           SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
               AS n_resurrected_users
    FROM cls GROUP BY day
), churn AS (
    SELECT day + 1 AS day, COUNT(*) AS n_churned_users
    FROM (SELECT user_id, day,
                 LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
          FROM days)
    WHERE next_day IS NULL OR next_day - day > 1
    GROUP BY day + 1
)
SELECT strftime(COALESCE(b.day, c.day), '%Y-%m-%d') AS day,
       CAST(COALESCE(b.n_active_users, 0) AS BIGINT) AS n_active_users,
       CAST(COALESCE(b.n_new_users, 0) AS BIGINT) AS n_new_users,
       CAST(COALESCE(b.n_retained_users, 0) AS BIGINT) AS n_retained_users,
       CAST(COALESCE(b.n_resurrected_users, 0) AS BIGINT) AS n_resurrected_users,
       CAST(COALESCE(c.n_churned_users, 0) AS BIGINT) AS n_churned_users
FROM by_day b FULL OUTER JOIN churn c ON b.day = c.day
ORDER BY day
"""


def open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-backlog curve: for every calendar day with activity, how
    many orders were OPEN — placed but not yet fully shipped (an
    order's open interval runs from ``o_orderdate`` through its last
    lineitem ``l_shipdate``, inclusive). The fulfillment-capacity
    readout: a rising curve is intake outpacing shipping.

    Interval counting WITHOUT an interval join (the
    peak-concurrent-sessions discipline): each order contributes a
    +1 delta on its open day and a −1 on the day AFTER its close; the
    backlog is the running sum over the day-grain delta frame — which
    is calendar-bounded, so the one unpartitioned cumulative window
    runs over thousands of rows, not orders. Orders with no lineitem
    never open (no ship evidence — stated in both engines); NULL
    order/ship dates are excluded (no position on the day axis).

    Scale shape: one orderkey-grain max-shipdate aggregate (map-side
    combined) co-shuffled into the orders join, explode to 2 deltas,
    one day-grain aggregate, the bounded window. Output days are the
    ACTIVITY days (delta ≠ 0 days) — the curve's knots; flat spans
    between knots are implied.
    """
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("start_day")
    ).filter(F.col("start_day").isNotNull())
    last_ship = (
        catalog.load(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.to_date("l_shipdate").alias("ship_day"))
        .filter(F.col("ship_day").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.max("ship_day").alias("close_day"))
    )
    spans = orders.join(
        last_ship, orders.o_orderkey == last_ship.l_orderkey
    ).select("start_day", "close_day")
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_day").alias("day"), F.lit(1).alias("d")
                ),
                F.struct(
                    F.date_add("close_day", 1).alias("day"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("e")
    ).select("e.day", "e.d")
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_opened"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("n_closed"),
        F.sum("d").alias("delta"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_opened").cast("long").alias("n_opened"),
        F.col("n_closed").cast("long").alias("n_closed"),
        F.sum("delta").over(w).cast("long").alias("open_orders"),
    ).orderBy("day")


OPEN_ORDERS_SQL = """
WITH o AS (
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_day
    FROM orders WHERE o_orderdate IS NOT NULL
),
ls AS (
    SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_day
    FROM lineitem WHERE l_shipdate IS NOT NULL
    GROUP BY l_orderkey
),
spans AS (
    SELECT start_day, close_day FROM o JOIN ls ON o.o_orderkey = ls.l_orderkey
),
deltas AS (
    SELECT start_day AS day, 1 AS d FROM spans
    UNION ALL SELECT close_day + 1, -1 FROM spans
),
daily AS (
    SELECT day,
           SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_opened,
           SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS n_closed,
           SUM(d) AS delta
    FROM deltas GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(n_opened AS BIGINT) AS n_opened,
       CAST(n_closed AS BIGINT) AS n_closed,
       CAST(SUM(delta) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS open_orders
FROM daily ORDER BY day
"""
