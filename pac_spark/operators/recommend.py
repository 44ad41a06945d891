"""Co-occurrence recommenders: association rules + item-item top-k.

The classic market-basket pipeline the reference's analytics users run
one step past raw pair counts (``relational.basket_part_pairs``):

- :func:`association_rules_parts` — directed rules ``A -> B`` scored
  by support / confidence / lift, the interpretable "customers who
  bought A also bought B" readout;
- :func:`item_item_similar_parts` — each part's top-k nearest
  neighbors under co-occurrence cosine, the memory-based
  collaborative-filtering item index (the thing a "similar items"
  widget serves).

Scale shape (both): candidate generation is a self-join keyed on
``l_orderkey`` — fan-out per order is basket², bounded by basket size,
never a cartesian — followed by one map-side-combined pair aggregate.
Per-item counts join back on the part key (a plain shuffled equi-join;
the item-count side is |parts|, which at 100 TB is far too big to
broadcast and doesn't need to be). The only driver-visible values are
the final bounded outputs (top-N rules / k neighbors per anchor).

All scores divide exact BIGINT counts (or their products) as one IEEE
double division — identical in both engines, so values hash-match the
DuckDB oracle. The lift numerator ``n_both * n_orders`` stays under
2^53 through sf100-scale order counts; past that, promote the two
products to decimal(38,0) before the division (documented contract,
same idiom as the stats moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.cache import pin

__all__ = [
    "ITEM_MIN_COOCCUR",
    "RULE_TOP_N",
    "ITEM_TOPK",
    "association_rules_parts",
    "ASSOC_RULES_SQL",
    "item_item_similar_parts",
    "ITEM_ITEM_SQL",
    "cf_holdout_coverage",
    "CF_HOLDOUT_SQL",
    "CF_TEST_PERMILLE",
]

ITEM_MIN_COOCCUR = 2  # directed pair admission threshold
RULE_TOP_N = 50
ITEM_TOPK = 3


def _directed_pairs(spark: SparkSession, sf_dir: str):
    """(pairs, items, n_orders): directed co-occurrence counts over
    distinct (order, part), per-part order counts, and the 1-row
    order total. The distinct-first makes every count "orders
    containing", so a part ordered twice in one basket counts once."""
    li = pin(
        catalog.load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= ITEM_MIN_COOCCUR)
    )
    items = li.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    totals = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return pairs, items, totals


def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``RULE_TOP_N`` association rules by lift.

    ``confidence = P(B|A)``, ``lift = P(A,B) / (P(A)·P(B))`` — lift > 1
    marks genuinely associated pairs rather than merely popular ones.
    The ordering is fully specified (lift desc, antecedent, consequent)
    so the limit is deterministic on both engines.
    """
    pairs, items, totals = _directed_pairs(spark, sf_dir)
    ia, ic = items.alias("ia"), items.alias("ic")
    joined = (
        pairs.join(ia, F.col("antecedent") == F.col("ia.l_partkey"))
        .join(ic, F.col("consequent") == F.col("ic.l_partkey"))
        .crossJoin(F.broadcast(totals))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.col("ia.n_item").alias("n_antecedent"),
            F.col("ic.n_item").alias("n_consequent"),
            "n_orders",
        )
    )
    return (
        joined.select(
            "*",
            (F.col("n_both").cast("double") / F.col("n_orders").cast("double")).alias(
                "support"
            ),
            (
                F.col("n_both").cast("double") / F.col("n_antecedent").cast("double")
            ).alias("confidence"),
            (
                (F.col("n_both") * F.col("n_orders")).cast("double")
                / (F.col("n_antecedent") * F.col("n_consequent")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(RULE_TOP_N)
    )


ASSOC_RULES_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
           COUNT(*) AS n_both
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {ITEM_MIN_COOCCUR}
),
items AS (SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY 1),
totals AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT antecedent, consequent, n_both,
       ia.n_item AS n_antecedent, ic.n_item AS n_consequent, n_orders,
       CAST(n_both AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
       CAST(n_both AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS confidence,
       CAST(n_both * n_orders AS DOUBLE)
           / CAST(ia.n_item * ic.n_item AS DOUBLE) AS lift
FROM pairs
JOIN items ia ON antecedent = ia.l_partkey
JOIN items ic ON consequent = ic.l_partkey
CROSS JOIN totals
ORDER BY lift DESC, antecedent, consequent
LIMIT {RULE_TOP_N}
"""


def item_item_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each part's top-``ITEM_TOPK`` co-occurrence neighbors by cosine
    ``n_ab / sqrt(n_a·n_b)`` — the item-item collaborative-filtering
    index. IEEE sqrt is correctly rounded in both engines, so the
    scores (and therefore the ranks, with the part-id tie-break) are
    bit-identical; the per-anchor window partitions are bounded by the
    admission threshold's survivor fan, never the catalog."""
    pairs, items, _ = _directed_pairs(spark, sf_dir)
    ia, ic = items.alias("ia"), items.alias("ic")
    scored = (
        pairs.join(ia, F.col("antecedent") == F.col("ia.l_partkey"))
        .join(ic, F.col("consequent") == F.col("ic.l_partkey"))
        .select(
            F.col("antecedent").alias("part_a"),
            F.col("consequent").alias("part_b"),
            "n_both",
            F.col("ia.n_item").alias("n_a"),
            F.col("ic.n_item").alias("n_b"),
            (
                F.col("n_both").cast("double")
                / F.sqrt((F.col("ia.n_item") * F.col("ic.n_item")).cast("double"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("part_a").orderBy(F.desc("cosine"), "part_b")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ITEM_TOPK)
        .orderBy("part_a", "rank")
    )


ITEM_ITEM_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {ITEM_MIN_COOCCUR}
),
items AS (SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY 1),
scored AS (
    SELECT part_a, part_b, n_both,
           ia.n_item AS n_a, ic.n_item AS n_b,
           CAST(n_both AS DOUBLE)
               / sqrt(CAST(ia.n_item * ic.n_item AS DOUBLE)) AS cosine
    FROM pairs
    JOIN items ia ON part_a = ia.l_partkey
    JOIN items ic ON part_b = ic.l_partkey
)
SELECT part_a, part_b, n_both, n_a, n_b, cosine, rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY part_a ORDER BY cosine DESC, part_b) AS INT) AS rank
    FROM scored
) WHERE rank <= {ITEM_TOPK}
ORDER BY part_a, rank
"""


CF_TEST_PERMILLE = 200  # 20% of orders held out by salted md5 bucket
CF_SALT = "cfholdout_v1"


def cf_holdout_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline recommender evaluation (the recall-audit discipline
    applied to the CF index): hold out 20% of ORDERS by a salted md5
    bucket, train the item-item cosine top-k on the remaining 80%, and
    report how many of the held-out orders' co-purchase pairs the
    index covers (pair covered ⟺ either direction appears in either
    part's top-k list). The eval row a production recommender ships
    with — a coverage number that drifts after a re-train is the
    regression alarm, and the holdout-by-ORDER split is the leakage
    discipline (splitting by pair would leak the pair's own count
    into training).

    Determinism: the split is the shared digit-wise md5 bucket under
    its own salt namespace; training re-runs the registered item-item
    formulation verbatim on the train half (same admission threshold,
    same total tie-break); coverage is ``int_div(hits·1000, pairs)``.
    Scale shape: everything reuses the CF plan's shapes (distinct
    basket self-join, bounded top-k window); the eval adds one
    order-bucket filter (row-local), a second bounded self-join over
    the 20% slice, and a semi-join of test pairs against the k·parts
    recommendation frame.
    """
    from pac_spark.functions.exact import int_div
    from pac_spark.functions.hashing import md5_bucket

    li = pin(
        catalog.load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn(
            "_bucket",
            md5_bucket(
                F.concat(
                    F.lit(f"{CF_SALT}|"), F.col("l_orderkey").cast("string")
                ),
                1000,
            ),
        )
    )
    train = li.filter(F.col("_bucket") >= CF_TEST_PERMILLE).select(
        "l_orderkey", "l_partkey"
    )
    test = li.filter(F.col("_bucket") < CF_TEST_PERMILLE).select(
        "l_orderkey", "l_partkey"
    )
    a, b = train.alias("a"), train.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= ITEM_MIN_COOCCUR)
    )
    items = train.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    ia, ic = items.alias("ia"), items.alias("ic")
    scored = (
        pairs.join(ia, F.col("part_a") == F.col("ia.l_partkey"))
        .join(ic, F.col("part_b") == F.col("ic.l_partkey"))
        .select(
            "part_a",
            "part_b",
            (
                F.col("n_both").cast("double")
                / F.sqrt(
                    (F.col("ia.n_item") * F.col("ic.n_item")).cast("double")
                )
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("part_a").orderBy(F.desc("cosine"), "part_b")
    recs = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= ITEM_TOPK)
        # normalize to undirected so either direction covers the pair
        .select(
            F.least("part_a", "part_b").alias("pa"),
            F.greatest("part_a", "part_b").alias("pb"),
        )
        .distinct()
    )
    ta, tb = test.alias("ta"), test.alias("tb")
    test_pairs = (
        ta.join(tb, "l_orderkey")
        .filter(F.col("ta.l_partkey") < F.col("tb.l_partkey"))
        .select(
            F.col("ta.l_partkey").alias("pa"),
            F.col("tb.l_partkey").alias("pb"),
        )
        .distinct()
    )
    covered = test_pairs.join(recs, ["pa", "pb"], "left_semi")
    return (
        test_pairs.agg(F.count(F.lit(1)).alias("n_test_pairs"))
        .crossJoin(
            F.broadcast(covered.agg(F.count(F.lit(1)).alias("n_covered")))
        )
        .select(
            "n_test_pairs",
            "n_covered",
            # explicit empty-holdout guard: ANSI mode throws on the
            # truncating division's % by zero (the r7 empty-table bug
            # class, caught by the r11 staged empty sweep); an empty
            # test slice has no coverage to report — NULL in BOTH
            # engines
            F.when(F.col("n_test_pairs") == 0, F.lit(None).cast("long"))
            .otherwise(
                int_div(F.col("n_covered") * 1000, F.col("n_test_pairs"))
            )
            .alias("coverage_milli"),
        )
    )


def CF_HOLDOUT_SQL() -> str:
    """Oracle: the identical digit-wise split, train-half CF, and
    undirected coverage count."""
    from pac_spark.functions.hashing import md5_bucket_sql

    bucket = md5_bucket_sql(
        f"'{CF_SALT}|' || CAST(l_orderkey AS VARCHAR)", 1000
    )
    return f"""
WITH li AS (
    SELECT l_orderkey, l_partkey, {bucket} AS b
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
),
train AS (SELECT l_orderkey, l_partkey FROM li WHERE b >= {CF_TEST_PERMILLE}),
test AS (SELECT l_orderkey, l_partkey FROM li WHERE b < {CF_TEST_PERMILLE}),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
    FROM train a JOIN train b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {ITEM_MIN_COOCCUR}
),
items AS (SELECT l_partkey, COUNT(*) AS n_item FROM train GROUP BY 1),
scored AS (
    SELECT part_a, part_b,
           CAST(n_both AS DOUBLE)
               / sqrt(CAST(ia.n_item * ic.n_item AS DOUBLE)) AS cosine
    FROM pairs
    JOIN items ia ON part_a = ia.l_partkey
    JOIN items ic ON part_b = ic.l_partkey
),
recs AS (
    SELECT DISTINCT LEAST(part_a, part_b) AS pa,
                    GREATEST(part_a, part_b) AS pb
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY part_a ORDER BY cosine DESC, part_b) AS rk
        FROM scored
    ) WHERE rk <= {ITEM_TOPK}
),
test_pairs AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM test a JOIN test b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test_pairs,
           CAST(SUM(CASE WHEN r.pa IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
    FROM test_pairs t
    LEFT JOIN recs r ON r.pa = t.pa AND r.pb = t.pb
)
SELECT n_test_pairs, n_covered,
       CAST(CASE WHEN n_test_pairs = 0 THEN NULL
                 ELSE (n_covered * 1000) // n_test_pairs END AS BIGINT)
           AS coverage_milli
FROM agg
"""
