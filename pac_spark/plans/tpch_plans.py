"""Registry entries + DuckDB oracles for the TPC-H completion suite
(pac_spark.operators.tpch — q2, q7-q12, q14-q16, q19-q21).

Every oracle restates the Spark plan's arithmetic exactly: money sums
via the integer-cents pattern, year extraction and date diffs cast to
the same widths, ratio queries dividing the same BIGINT cent sums so
the single double division is bit-identical across engines.
"""

from __future__ import annotations

from pac_spark.functions.exact import money_sum_sql
from pac_spark.operators import tpch as T
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]

# the partsupp stand-in used by q2/q16 (schema has no partsupp table)
_PS = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"

_Q2 = f"""
WITH ps AS ({_PS}),
ranked AS (
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           RANK() OVER (PARTITION BY p_partkey ORDER BY s_acctbal DESC) AS rnk
    FROM ps
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'LARGE' AND p_size >= 25
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM ranked WHERE rnk = 1
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""

_Q7 = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

_Q8 = """
WITH nr AS (SELECT n_nationkey, r_name FROM nation JOIN region ON n_regionkey = r_regionkey)
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN sn.r_name = 'ASIA'
                     THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
           AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nr cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nr sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'PROMO'
  AND cn.r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1 ORDER BY 1
"""

_Q9 = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       {money_sum_sql(
           'l_extendedprice * (1 - l_discount) - p_retailprice * 0.5 * l_quantity', 4
       )} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

_Q11 = """
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS _cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal > 0
    GROUP BY l_partkey
),
total AS (SELECT 1.2 * CAST(SUM(_cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS _threshold
          FROM per_part)
SELECT l_partkey AS p_partkey,
       CAST(_cents AS DOUBLE) / 100.0 AS part_value
FROM per_part, total
WHERE CAST(_cents AS DOUBLE) > _threshold
ORDER BY part_value DESC, p_partkey
"""

_Q12 = """
WITH b AS (
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST'
                WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 'MEDIUM'
                ELSE 'SLOW' END AS delay_bucket,
           o_orderpriority IN ('1-URGENT', '2-HIGH') AS high
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT delay_bucket,
       CAST(SUM(CASE WHEN high THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN high THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM b GROUP BY delay_bucket ORDER BY delay_bucket
"""

_Q14 = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
           AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""

_Q15 = f"""
WITH per_supp AS (
    SELECT l_suppkey,
           {money_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
ORDER BY s_suppkey
"""

_Q16 = f"""
WITH ps AS ({_PS})
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_Q19 = f"""
SELECT {money_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 5 AND 40)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 10 AND 50)
"""

_Q20 = """
WITH per_supp AS (
    SELECT l_suppkey, SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS _qty_cents
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
),
threshold AS (
    SELECT CAST(SUM(_qty_cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS _avg_qty
    FROM per_supp
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM per_supp, threshold
    WHERE CAST(_qty_cents AS DOUBLE) > _avg_qty
)
ORDER BY s_suppkey
"""

_Q21 = """
WITH f AS (
    SELECT l.* FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
),
ord AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           MAX(l_shipdate) AS max_ship
    FROM f GROUP BY l_orderkey
),
lastsupp AS (
    SELECT f.l_orderkey, COUNT(DISTINCT f.l_suppkey) AS n_last_supp
    FROM f JOIN ord ON f.l_orderkey = ord.l_orderkey AND f.l_shipdate = ord.max_ship
    GROUP BY f.l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM f
JOIN ord ON f.l_orderkey = ord.l_orderkey
JOIN lastsupp ON f.l_orderkey = lastsupp.l_orderkey
JOIN supplier ON f.l_suppkey = s_suppkey
WHERE n_supp > 1 AND f.l_shipdate = ord.max_ship AND n_last_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

SPECS = [
    QuerySpec("q2_top_balance_supplier", T.q2_top_balance_supplier, _Q2),
    QuerySpec("q7_volume_shipping", T.q7_volume_shipping, _Q7),
    QuerySpec("q8_market_share", T.q8_market_share, _Q8),
    QuerySpec("q9_product_profit", T.q9_product_profit, _Q9),
    QuerySpec("q10_returned_items", T.q10_returned_items, _Q10),
    QuerySpec("q11_important_parts", T.q11_important_parts, _Q11),
    QuerySpec("q12_ship_delay_priority", T.q12_ship_delay_priority, _Q12),
    QuerySpec("q14_promo_revenue", T.q14_promo_revenue, _Q14),
    QuerySpec("q15_top_supplier", T.q15_top_supplier, _Q15),
    QuerySpec("q16_supplier_part_counts", T.q16_supplier_part_counts, _Q16),
    QuerySpec("q19_discounted_revenue", T.q19_discounted_revenue, _Q19),
    QuerySpec("q20_heavy_promo_suppliers", T.q20_heavy_promo_suppliers, _Q20),
    QuerySpec("q21_last_to_ship", T.q21_last_to_ship, _Q21),
]
