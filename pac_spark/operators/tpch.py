"""TPC-H completion suite — the 13 query shapes the relational module
didn't already cover (q2, q7-q12, q14-q16, q19-q21), adapted to the
driver testdata's schema.

The reference has no relational query surface beyond full scans and one
lookup join (SURVEY.md §2; index_align_to_firebase.py:139,
executive_review_tool.py:150), but "a user of the reference could
switch and run every query they run today" demands the standard
analytic repertoire; TPC-H is the canonical enumeration of those
shapes. Together with q1/q3/q4/q5/q6/q13/q17/q18/q22 in
``pac_spark.operators.relational``, this module completes all 22.

Schema adaptations (the testdata is TPC-H-*ish*): there is no
``partsupp`` table, so the part↔supplier relation is derived as
``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` (one shuffle,
keyed); there are no ``l_commitdate``/``l_receiptdate``/``l_shipmode``
columns, so q12's ship-mode classes become ship-delay buckets computed
from ``l_shipdate - o_orderdate`` and q21's "kept waiting" predicate
becomes "was the last supplier to ship in a multi-supplier order";
``ps_supplycost``-based expressions (q2 min-cost supplier, q9 profit,
q11 stock value, q20 availqty) are restated over the columns that
exist (s_acctbal, p_retailprice, shipped quantity) with the *query
shape* — correlated aggregate subquery, scalar-subquery threshold,
semi/anti join chains — preserved exactly. Each docstring names the
preserved shape.

Scale posture: every plan here is one-to-three keyed shuffles plus
broadcasts of genuinely BOUNDED frames only — nation/region (fixed-
cardinality dims) and 1-row scalar aggregates. part and supplier GROW
with scale factor (~20B parts / ~1B suppliers at the 100 TB point), so
they carry NO broadcast hint, ever — at test scale the planner's size
statistics broadcast them anyway, and at 100 TB the same plan falls
back to a shuffled join instead of an OOM. No cartesian
products, no driver-side loops, no UDFs: everything stays inside
whole-stage codegen, and all money arithmetic uses the exact-cents
pattern (pac_spark.functions.exact) so results are bit-identical at
any partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.functions.exact import money_sum

__all__ = [
    "q2_top_balance_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_ship_delay_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q19_discounted_revenue",
    "q20_heavy_promo_suppliers",
    "q21_last_to_ship",
]


def _part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp stand-in: distinct (part, supplier) pairs actually
    observed in lineitem. One keyed shuffle; at 100 TB this is a
    map-side-combined distinct on two int64 columns — the cheapest
    possible derivation of the relation."""
    return (
        catalog.load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


def q2_top_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for each LARGE part of size
    >= 25, the supplier(s) with the best account balance among the
    part's observed suppliers.

    Preserves Q2's correlated-aggregate shape — ``s_acctbal = (SELECT
    MAX(...) ... WHERE ps_partkey = p_partkey)`` — as a rank() window
    over the per-part supplier list, keeping *all* ties exactly like
    the SQL's equality-with-max. supplier and nation are broadcast
    (bounded dims); the only shuffles are the distinct on lineitem
    pairs and the per-part window."""
    part = catalog.load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 25)
    )
    supp = catalog.load(spark, sf_dir, "supplier")
    nation = catalog.load(spark, sf_dir, "nation")
    ps = _part_supplier(spark, sf_dir)
    best = W.partitionBy("p_partkey").orderBy(F.desc("s_acctbal"))
    return (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .join(supp, ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.rank().over(best))
        .filter(F.col("rnk") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): cross-nation trade volume by
    (supplier nation, customer nation, ship year).

    Q7's literal nation-pair filter is replaced by ``supp_nation <>
    cust_nation`` (the testdata's 10-supplier sf0.001 slice makes any
    specific pair vacuous); the join graph — lineitem ⋈ orders ⋈
    customer ⋈ supplier ⋈ nation×2 — and the year-extraction group
    keys are Q7's exactly. nation is broadcast twice under distinct
    aliases; the fact and supplier joins shuffle on their natural
    keys (supplier scales — no hint)."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = catalog.load(spark, sf_dir, "orders")
    cust = catalog.load(spark, sf_dir, "customer")
    supp = catalog.load(spark, sf_dir, "supplier")
    n1 = catalog.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = catalog.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(money_sum(volume, scale=4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): per order-year share of
    PROMO-part revenue delivered to EUROPE customers that came from
    ASIA-based suppliers.

    Q8's single-nation numerator is widened to a supplier *region*
    (robust across scale factors) but the shape is intact: conditional
    numerator over a joined fact star, share = sum(case)/sum(all).
    Both sums use exact cents, so the final double division is the
    only float op and is bit-identical on any engine."""
    li = catalog.load(spark, sf_dir, "lineitem")
    part = catalog.load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = catalog.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = catalog.load(spark, sf_dir, "customer")
    supp = catalog.load(spark, sf_dir, "supplier")
    nation = catalog.load(spark, sf_dir, "nation")
    region = catalog.load(spark, sf_dir, "region")
    cust_nat = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nat = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("n_nationkey").alias("s_nk"),
            (F.col("r_name") == "ASIA").alias("is_asia"),
        )
    )
    volume_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000)
    ).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nat), cust.c_nationkey == F.col("c_nk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nat), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("is_asia"), volume_cents).otherwise(F.lit(0))).alias(
                "_num"
            ),
            F.sum(volume_cents).alias("_den"),
        )
        .select(
            "o_year",
            (F.col("_num").cast("double") / F.col("_den").cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit by supplier nation
    and order year over parts whose name contains 'widget'.

    ps_supplycost does not exist in this schema; cost is modeled as
    half the part's retail price (documented constant), keeping Q9's
    profit expression ``revenue - cost*quantity`` and its
    five-table join + (nation, year) aggregation intact."""
    li = catalog.load(spark, sf_dir, "lineitem")
    part = catalog.load(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    orders = catalog.load(spark, sf_dir, "orders")
    supp = catalog.load(spark, sf_dir, "supplier")
    nation = catalog.load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.5) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(money_sum(profit, scale=4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    lost to returns for Q1-1996 orders. Exact TPC-H shape on the
    columns that exist; top-20 runs as TakeOrderedAndProject."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = catalog.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = catalog.load(spark, sf_dir, "customer")
    nation = catalog.load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(revenue, scale=4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose total shipped
    value from positive-balance suppliers exceeds 1.2x the mean
    per-part value.

    Preserves Q11's scalar-subquery HAVING — the threshold is a
    1-row aggregate joined back by broadcast (Q11's
    ``> (SELECT SUM(...) * fraction)``), never a driver-side collect.
    TPC-H's fixed fraction is scale-dependent (0.0001/SF); a
    mean-relative threshold keeps the filter selective-but-non-empty
    at every scale factor. The supplier gate is s_acctbal > 0
    (geography-free, so it's non-vacuous in every slice)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    supp = catalog.load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    value_cents = F.round(F.col("l_extendedprice") * F.lit(100)).cast("long")
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(value_cents).alias("_cents"))
    )
    total = per_part.agg(
        (
            F.lit(1.2) * F.sum("_cents").cast("double") / F.count("*").cast("double")
        ).alias("_threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_cents").cast("double") > F.col("_threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("_cents").cast("double") / F.lit(100.0)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority): order counts by
    urgency class per ship-delay bucket.

    l_shipmode doesn't exist; the mode classes become delay buckets
    over ``datediff(l_shipdate, o_orderdate)`` (FAST <= 30 < MEDIUM <=
    90 < SLOW), keeping Q12's conditional-count aggregation
    (high-priority vs other) verbatim."""
    li = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "MEDIUM").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            # the oracle's CASE WHEN high THEN 1 ELSE 0: a NULL
            # priority counts as LOW in both engines — a bare
            # high.cast(long) would skip the row from BOTH sums
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of March-1996 revenue
    from PROMO-type parts. Exact shape — conditional numerator over a
    part join, one row out; part scales, so no broadcast hint."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = catalog.load(spark, sf_dir, "part")
    volume_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10000)
    ).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", volume_cents).otherwise(F.lit(0))
            ).alias("_num"),
            F.sum(volume_cents).alias("_den"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("_num").cast("double")
                / F.col("_den").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) achieving the maximum
    revenue over Q1-1996 shipments.

    Q15's view + scalar-subquery max is a per-supplier aggregate
    joined to its own 1-row max by broadcast — ties all kept, exactly
    like ``revenue = (SELECT MAX(revenue) FROM view)``."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = catalog.load(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        money_sum(revenue, scale=4).alias("total_revenue")
    )
    max_rev = per_supp.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        per_supp.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "total_revenue",
        )
        .orderBy("s_suppkey")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) for parts outside an excluded brand
    and type, from suppliers NOT IN an exclusion subquery.

    Q16's complaint-supplier NOT IN becomes an anti join against
    negative-balance suppliers (the column that exists); the
    distinct-count aggregation over the derived part-supplier relation
    is Q16's exactly."""
    part = catalog.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO")
    )
    bad_supp = catalog.load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = _part_supplier(spark, sf_dir)
    return (
        ps.join(
            bad_supp,
            ps.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part, ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): one revenue figure over a
    disjunction of three (brand, size-range, quantity-range) branches.

    The join predicate is an equi join on partkey with the disjunctive
    residual — Catalyst keeps the equi key (no cartesian) and the
    branches prune to a part-side filter union; part scales, so the
    join strategy is the planner's call."""
    li = catalog.load(spark, sf_dir, "lineitem")
    part = catalog.load(spark, sf_dir, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(5, 40)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(10, 50)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(money_sum(revenue, scale=4).alias("revenue"))
    )


def q20_heavy_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipped quantity of PROMO parts in 1996-1997 exceeds the
    per-supplier average of that quantity.

    Q20's nested semi-join chain (supplier IN ... part IN ... with a
    correlated quantity threshold) is preserved: the qualifying-keys
    set is an aggregate-derived frame, the threshold a broadcast 1-row
    scalar, and the final supplier filter a semi join."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    promo_parts = (
        catalog.load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = catalog.load(spark, sf_dir, "supplier")
    nation = catalog.load(spark, sf_dir, "nation")
    qty_cents = F.round(F.col("l_quantity") * F.lit(100)).cast("long")
    per_supp = (
        li.join(promo_parts, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(qty_cents).alias("_qty_cents"))
    )
    threshold = per_supp.agg(
        (
            F.sum("_qty_cents").cast("double") / F.count("*").cast("double")
        ).alias("_avg_qty")
    )
    heavy = (
        per_supp.join(F.broadcast(threshold))
        .filter(F.col("_qty_cents").cast("double") > F.col("_avg_qty"))
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def q21_last_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished ('F') orders served by multiple suppliers, count per
    supplier the lineitems where that supplier shipped strictly last.

    Q21's EXISTS (another supplier on the order) AND NOT EXISTS
    (another supplier shipped later) is computed with two per-order
    window aggregates over (suppkey-count, max shipdate) instead of
    two self-joins — same result set, one shuffle on l_orderkey
    instead of three. A lineitem qualifies iff its order has >1
    distinct supplier, its shipdate equals the order's max, and no
    *other* supplier shares that max (strictly-last semantics)."""
    orders = catalog.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = catalog.load(spark, sf_dir, "lineitem")
    supp = catalog.load(spark, sf_dir, "supplier")
    per_order = W.partitionBy("l_orderkey")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .withColumn("_n_supp", F.size(F.collect_set("l_suppkey").over(per_order)))
        .withColumn("_max_ship", F.max("l_shipdate").over(per_order))
        .withColumn(
            "_n_last_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("l_shipdate") == F.col("_max_ship"), F.col("l_suppkey"))
                ).over(per_order)
            ),
        )
    )
    waiting = flagged.filter(
        (F.col("_n_supp") > 1)
        & (F.col("l_shipdate") == F.col("_max_ship"))
        & (F.col("_n_last_supp") == 1)
    )
    return (
        # reduce per suppkey first (fact-sized -> supplier-sized),
        # then re-aggregate on s_name: the oracle GROUPs BY s_name,
        # and nothing makes supplier names unique — grouping only by
        # key would emit two rows where the oracle merges them
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("_w"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("_w").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
