"""Spatial operators: grid-cell-blocked radius joins with exact
integer squared distances.

The reference has no geo support; this is a first-class engine
extension (SURVEY §2.10 family) because "find everything within
radius R of each point" is the canonical spatial primitive behind
store-catchment, geofencing, and co-location curation jobs — and the
naive formulation is an O(n·m) cross join that no cluster survives.

The scale-legal plan is the textbook grid trick: snap every point to
a square cell of side R, explode ONE side of the join to its 3x3
neighbor stencil (a fixed fan-out of <=9, independent of data size),
and equi-join on the cell id. Any pair within distance R is in
adjacent cells by construction, so the stencil join is a superset of
the answer; an exact distance filter finishes the job. The cross
join becomes a hash join whose per-key fan-in is the cell occupancy —
at production scale R << domain, so cells are many and small, and
Catalyst picks a plain shuffled hash join partitioned by cell. No
CartesianProduct ever appears in the plan (asserted in
tests/test_plans.py).

Determinism: the testdata has no coordinates, so points are DERIVED —
each customer is dropped uniformly on a 2^20 x 2^20 integer plane via
the house md5 bucketing (functions/hashing.py), replayed digit-wise
by the DuckDB oracle. All distances are exact integer squared
Euclidean (no sqrt, no doubles, no libm): d2 <= 2*(2^20)^2 < 2^41.
The per-point nearest neighbor is an integer argmin over the packed
value d2 * 2^24 + neighbor_key — exact while neighbor keys stay below
2^24 (16.7M customers; repack wider before going past that). Packing
cannot overflow: only pairs surviving the radius filter are packed,
so d2 <= R^2 = 2^32 and packed < 2^32 * 2^24 + 2^24 < 2^57,
comfortably BIGINT on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_spark import catalog
from pac_spark.functions.hashing import md5_bucket, md5_bucket_sql

__all__ = [
    "GRID",
    "CELL_SHIFT",
    "RADIUS",
    "PACK",
    "customer_points",
    "neighbor_stats",
    "spatial_customer_neighbors",
    "SPATIAL_NEIGHBORS_SQL",
]

# 2^20 x 2^20 integer plane; cells of side 2^16 = RADIUS, so the
# neighbor stencil is the standard 3x3. (GRID/CELL)^2 = 256 cells at
# this toy geometry; in a real deployment R << domain and the same
# code yields millions of cells — the plan shape (fixed fan-out
# explode + equi-join on cell) is what carries to 100 TB.
GRID = 1 << 20
CELL_SHIFT = 16
RADIUS = 1 << 16
PACK_SHIFT = 24  # argmin packing: d2 * 2^PACK_SHIFT + neighbor key
PACK = 1 << PACK_SHIFT


def customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer as a deterministic point on the integer plane."""
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey")
    key = F.col("c_custkey").cast("string")
    return cust.select(
        "c_custkey",
        md5_bucket(F.concat(F.lit("sx:"), key), GRID).cast("long").alias("x"),
        md5_bucket(F.concat(F.lit("sy:"), key), GRID).cast("long").alias("y"),
    )


def spatial_customer_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer radius query: how many other customers fall
    within RADIUS, and which one is nearest (exact integer argmin,
    ties broken by the smaller key — total and engine-portable).

    Only customers with at least one in-radius neighbor appear; the
    relation is symmetric so every returned nearest_custkey also
    appears as a c_custkey row.
    """
    return neighbor_stats(customer_points(spark, sf_dir))


def neighbor_stats(pts: DataFrame) -> DataFrame:
    """The radius-join core over any (c_custkey, x, y) point set —
    split out so crafted tests can pin the geometry semantics
    (boundary cells, just-inside/just-outside radius, argmin ties)
    on hand-placed points."""
    from pac_spark.cache import pin

    # pinned: pts is BOTH join sides (stencil probe + build), which
    # are different subtrees — exchange reuse cannot apply, so the
    # point derivation (scan + two md5 buckets per row) would run
    # twice (code-review r8)
    pts = pin(pts)
    # probe side: each point exploded to its 3x3 cell stencil
    stencil = F.array([F.lit(d) for d in (-1, 0, 1)])
    probe = (
        pts.withColumn("dx", F.explode(stencil))
        .withColumn("dy", F.explode(stencil))
        .select(
            F.col("c_custkey").alias("a_key"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.shiftright("x", CELL_SHIFT) + F.col("dx")).alias("cx"),
            (F.shiftright("y", CELL_SHIFT) + F.col("dy")).alias("cy"),
        )
        # cells outside the plane hold no points; drop the probes
        .where(
            (F.col("cx") >= 0)
            & (F.col("cx") < GRID >> CELL_SHIFT)
            & (F.col("cy") >= 0)
            & (F.col("cy") < GRID >> CELL_SHIFT)
        )
    )
    build = pts.select(
        F.col("c_custkey").alias("b_key"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.shiftright("x", CELL_SHIFT).alias("cx"),
        F.shiftright("y", CELL_SHIFT).alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = (
        probe.join(build, ["cx", "cy"])
        .where(F.col("a_key") != F.col("b_key"))
        .select("a_key", "b_key", d2.alias("d2"))
        .where(F.col("d2") <= F.lit(RADIUS * RADIUS))
    )
    return (
        pairs.groupBy("a_key")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min(F.col("d2") * F.lit(PACK) + F.col("b_key")).alias("packed"),
        )
        .select(
            F.col("a_key").alias("c_custkey"),
            "n_within",
            (F.col("packed") % F.lit(PACK)).alias("nearest_custkey"),
            F.shiftright("packed", PACK_SHIFT).alias("nearest_d2"),
        )
        .orderBy("c_custkey")
    )


def SPATIAL_NEIGHBORS_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    sx = md5_bucket_sql("'sx:' || CAST(c_custkey AS VARCHAR)", GRID)
    sy = md5_bucket_sql("'sy:' || CAST(c_custkey AS VARCHAR)", GRID)
    ncells = GRID >> CELL_SHIFT
    return f"""
WITH pts AS (
    SELECT c_custkey AS key,
           CAST({sx} AS BIGINT) AS x,
           CAST({sy} AS BIGINT) AS y
    FROM customer
),
probe AS (
    SELECT p.key AS a_key, p.x AS ax, p.y AS ay,
           (p.x // {1 << CELL_SHIFT}) + dx.d AS cx,
           (p.y // {1 << CELL_SHIFT}) + dy.d AS cy
    FROM pts p
    CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
    CROSS JOIN (VALUES (-1), (0), (1)) dy(d)
    WHERE (p.x // {1 << CELL_SHIFT}) + dx.d BETWEEN 0 AND {ncells - 1}
      AND (p.y // {1 << CELL_SHIFT}) + dy.d BETWEEN 0 AND {ncells - 1}
),
build AS (
    SELECT key AS b_key, x AS bx, y AS by,
           x // {1 << CELL_SHIFT} AS cx, y // {1 << CELL_SHIFT} AS cy
    FROM pts
),
pairs AS (
    SELECT a_key, b_key,
           (ax - bx) * (ax - bx) + (ay - by) * (ay - by) AS d2
    FROM probe JOIN build USING (cx, cy)
    WHERE a_key <> b_key
      AND (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
          <= {RADIUS * RADIUS}
)
SELECT a_key AS c_custkey,
       COUNT(*) AS n_within,
       MIN(d2 * {PACK} + b_key) % {PACK} AS nearest_custkey,
       MIN(d2 * {PACK} + b_key) // {PACK} AS nearest_d2
FROM pairs GROUP BY a_key ORDER BY c_custkey
"""
