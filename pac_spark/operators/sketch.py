"""Mergeable-sketch operators: count-min heavy-hitter estimation.

At 100 TB you often cannot afford (or store) exact per-key counts —
the scalable pattern is a MERGEABLE sketch: each partition folds its
rows into a fixed-size counter table, partial tables add elementwise
(associative + commutative, so the merge tree's shape is irrelevant),
and point estimates read min-of-d cells. This file implements
count-min exactly that way as a DataFrame plan:

- hash family: ``md5(seed || key)`` → column index per depth row —
  engine-portable (same family every dedup/sampling operator here
  uses), no murmur dependence;
- build: explode each key into its ``CMS_DEPTH`` (row, col) cells,
  one map-side-combined groupBy — the sketch is a (row, col, count)
  table of at most ``CMS_DEPTH × CMS_WIDTH`` rows regardless of input
  size;
- estimate: min over the key's d cells (classic CMS upper-bounded
  overestimate: est >= true, est <= true + eps·N with prob 1-delta).

Everything is integer arithmetic over deterministic hashes, so the
DuckDB oracle rebuilds the identical sketch and the driver hash-checks
estimates — a sketch whose VALUES are reproducible cross-engine, not
just its error bound. The demo query estimates the events table's
user_id frequencies for the exact top keys and reports estimate vs
exact overestimate (always >= 0 by construction; property-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.cache import pin

__all__ = [
    "CMS_DEPTH",
    "CMS_WIDTH",
    "cms_build",
    "cms_estimate",
    "cms_top_report",
    "cms_user_heavy_hitters",
    "CMS_HH_SQL",
    "cms_daily_heavy_hitters",
    "CMS_DAILY_SQL",
    "CMS_DAILY_TOP_N",
    "hll_distinct_customers_by_priority",
    "HLL_SQL",
    "HLL_M",
    "rolling_7d_distinct_users_hll",
    "ROLLING_HLL_SQL",
    "kmv_nation_part_overlap",
    "KMV_SQL",
    "KMV_K",
    "bitmap_distinct_users_daily",
    "bitmap_day_words",
    "bitmap_day_counts",
    "BITMAP_DISTINCT_SQL",
    "ams_f2_user_activity",
    "AMS_SQL",
    "AMS_DEPTH",
    "ams_join_size_orders_events",
    "AMS_JOIN_SQL",
]

CMS_DEPTH = 4
CMS_WIDTH = 256
# the demo reports the top-N exact keys' estimates (candidate keys in
# production come from a per-partition SpaceSaving pass or are the
# queried entities themselves; the sketch answers any key)
CMS_TOP_N = 20


def _cms_col(key: Column, seed: int) -> Column:
    """Column index for depth row ``seed``: the shared md5-prefix
    bucket (``functions.hashing``) of the seeded key, mod width."""
    from pac_spark.functions.hashing import md5_bucket

    return md5_bucket(F.concat(F.lit(f"cms{seed}|"), key.cast("string")), CMS_WIDTH)


def cms_build(rows: DataFrame, key: str) -> DataFrame:
    """(row, col, cnt) sketch table from ``rows[key]``.

    One explode to DEPTH cells per input row, one map-side-combined
    groupBy — the shuffle moves at most DEPTH×WIDTH partial cells per
    task, never the input. Partial sketches from any partitioning sum
    to the same table (integer adds commute), which is the property
    that makes the sketch cluster-mergeable and the oracle exact.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"), _cms_col(F.col(key), d).alias("col")
            )
            for d in range(CMS_DEPTH)
        ]
    )
    return (
        rows.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """``keys`` + an ``est`` column: min over the key's DEPTH cells.

    The sketch is bounded (DEPTH×WIDTH rows) → broadcast; each key
    computes its cells row-locally and reads DEPTH cells. Estimates
    never undercount: every occurrence of the key incremented all of
    its cells, collisions only add. LEFT join + zero-fill: the sketch
    table materializes only touched cells, so a never-seen key's
    untouched cells must count as 0 (making its estimate 0 when any
    cell is clean) — an inner join would silently drop those cells and
    overestimate, or lose the key entirely."""
    keyed = keys.select(
        "*",
        F.array(
            *[
                F.struct(F.lit(d).alias("row"), _cms_col(F.col(key), d).alias("col"))
                for d in range(CMS_DEPTH)
            ]
        ).alias("_cells"),
    ).select("*", F.explode("_cells").alias("_cell"))
    return (
        keyed.join(
            F.broadcast(sketch),
            (F.col("_cell.row") == F.col("row")) & (F.col("_cell.col") == F.col("col")),
            "left",
        )
        .groupBy(*[c for c in keys.columns])
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_top_report(sketch: DataFrame, counts: DataFrame, key: str) -> DataFrame:
    """Shared report tail for the batch AND streaming heavy-hitter
    rows: cut ``counts`` (key, n_rows) to the exact top-``CMS_TOP_N``,
    probe the sketch, report estimate vs truth. One definition so the
    two registered queries cannot drift (code-review r7 — the tails
    were verbatim copies)."""
    top = counts.orderBy(F.desc("n_rows"), key).limit(CMS_TOP_N)
    est = cms_estimate(sketch, top, key)
    return est.select(
        key,
        "n_rows",
        F.col("est").alias("cms_estimate"),
        (F.col("est") - F.col("n_rows")).alias("overcount"),
    ).orderBy(F.desc("n_rows"), key)


def cms_user_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: build the events→user_id count-min sketch, then
    estimate the exact top-``CMS_TOP_N`` keys and report estimate vs
    truth. ``overcount = est - n_rows >= 0`` always (the CMS
    guarantee, also property-tested); the driver hash-checks the
    estimates themselves because the whole sketch is deterministic.
    The projected events frame is pinned — it feeds both the sketch
    build and the exact-count side (code-review r7).
    """
    ev = pin(catalog.load(spark, sf_dir, "events").select("user_id"))
    sketch = pin(cms_build(ev, "user_id"))
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_rows"))
    return cms_top_report(sketch, counts, "user_id")


def CMS_HH_SQL() -> str:
    """DuckDB oracle: the identical sketch (same seeded md5 column
    arithmetic, digit-wise), same min-of-cells estimates."""

    from pac_spark.functions.hashing import md5_bucket_sql

    def col_sql(key_expr: str, d: int) -> str:
        return md5_bucket_sql(
            f"'cms{d}|' || CAST({key_expr} AS VARCHAR)", CMS_WIDTH
        )

    cell_rows = " UNION ALL ".join(
        f"SELECT {d} AS row, {col_sql('user_id', d)} AS col FROM events"
        for d in range(CMS_DEPTH)
    )
    key_cells = " UNION ALL ".join(
        f"SELECT user_id, n_rows, {d} AS row, {col_sql('user_id', d)} AS col FROM top"
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH cells AS ({cell_rows}),
sketch AS (SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY row, col),
top AS (
    SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
    ORDER BY n_rows DESC, user_id LIMIT {CMS_TOP_N}
),
kc AS ({key_cells}),
est AS (
    -- LEFT + zero-fill mirrors cms_estimate exactly: a probed key
    -- whose cell the sketch never touched estimates 0, it does not
    -- drop the cell from the MIN (ADVICE r5 #1 — the registered
    -- top-N query only probes seen keys, but the 'identical sketch'
    -- contract must hold for unseen keys too)
    SELECT k.user_id, k.n_rows, MIN(COALESCE(s.cnt, 0)) AS est
    FROM kc k LEFT JOIN sketch s ON k.row = s.row AND k.col = s.col
    GROUP BY k.user_id, k.n_rows
)
SELECT user_id,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(est AS BIGINT) AS cms_estimate,
       CAST(est - n_rows AS BIGINT) AS overcount
FROM est ORDER BY n_rows DESC, user_id
"""


# ---------------------------------------------------------------------------
# HyperLogLog


HLL_M = 64  # registers (b = 6 index bits)
HLL_K = 56  # fixed-point exponent for the exact harmonic sum
# alpha_m * m^2 * 2^K — every factor is an exact double scale of the
# 0.709 constant (alpha for m=64), so the literal is bit-identical in
# both engines
_HLL_EST_NUM = 0.709 * float(HLL_M * HLL_M) * float(2**HLL_K)


def _rho_case(w: str) -> str:
    """Portable SQL for rho(w) = index of the lowest set bit of ``w``
    (1-based), 55 when w = 0 — the geometric observable HLL tracks.
    One CASE over power-of-two residues: exact integers, no log2, the
    identical text evaluated by Spark (``F.expr``) and DuckDB."""
    whens = " ".join(
        f"WHEN {w} % {1 << k} = {1 << (k - 1)} THEN {k}" for k in range(1, 55)
    )
    return f"CASE WHEN {w} = 0 THEN 55 {whens} END"


def hll_distinct_customers_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """From-scratch HyperLogLog: approximate distinct customers per
    order priority, next to the exact count so the error is visible —
    the mergeable-sketch answer to COUNT(DISTINCT) when the key space
    no longer fits an exact aggregate (the same scalability role
    ``approx_distinct_parts`` fills with Spark's built-in HLL++, but
    with the sketch itself in engine-portable integers).

    Construction (Flajolet et al.): a 60-bit md5 hash per key splits
    into a register index (mod 64) and the remaining bits ``w``; each
    register keeps max rho(w) (lowest-set-bit index — geometrically
    distributed). Register maxima commute, so the sketch is
    partition-invariant; the harmonic mean is computed EXACTLY by
    clearing denominators: ``sum(2^-M_j)`` becomes the integer
    ``S = sum(2^(K-M_j))`` (missing registers contribute ``2^K``),
    and the only float is the final ``alpha*m^2*2^K / S`` division —
    so the estimate VALUE hash-matches the DuckDB rebuild digit for
    digit. Raw estimate, no small/large-range corrections: the
    correction branch is a documented deployment choice and would be
    the same one-expression CASE in both engines.

    Scale shape: one map-side-combined groupBy to (group, register)
    maxima — at most ``|groups| * 64`` rows leave the map side; the
    exact-distinct companion column is the expensive one (it is the
    point of the comparison).
    """
    from pac_spark.functions.hashing import md5_u60

    orders = pin(
        catalog.load(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_custkey"
        )
    )
    h = md5_u60(F.concat(F.lit("hll1|"), F.col("o_custkey").cast("string")))
    hashed = orders.select(
        "o_orderpriority",
        (h % HLL_M).alias("reg"),
        # h // 64 via bit shift: functions.exact.int_div routes through
        # a double division, which ROUNDS a 60-bit numerator before
        # dividing (2^53 mantissa) — the shift is exact at any width
        F.shiftright(h, 6).alias("w"),
    )
    regs = (
        hashed.withColumn("rho", F.expr(_rho_case("w")))
        .groupBy("o_orderpriority", "reg")
        .agg(F.max("rho").alias("m_reg"))
    )
    sums = regs.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_active"),
        # SQL-form shiftleft takes a column exponent (the DSL overload
        # does not); 2^(K-M) stays exact integer
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_K} - m_reg)")).alias(
            "s_active"
        ),
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("exact_distinct"),
    )
    s_total = F.col("s_active") + (F.lit(HLL_M) - F.col("n_active")) * F.lit(
        2**HLL_K
    )
    return (
        exact.join(sums, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_rows",
            "exact_distinct",
            F.col("n_active").cast("int").alias("n_active_registers"),
            (F.lit(_HLL_EST_NUM) / s_total.cast("double")).alias("hll_estimate"),
        )
        .orderBy("o_orderpriority")
    )


from pac_spark.functions.hashing import md5_u60_sql as _md5_u60_sql

_H_CUST = _md5_u60_sql("'hll1|' || CAST(o_custkey AS VARCHAR)")

# module-level string like every other oracle, so QuerySpec
# registration cannot accidentally pass a callable (code-review r6,
# same fix as BM25_SQL)
HLL_SQL = f"""
WITH hashed AS (
    SELECT o_orderpriority,
           {_H_CUST} % {HLL_M} AS reg,
           {_H_CUST} // {HLL_M} AS w
    FROM orders
), regs AS (
    SELECT o_orderpriority, reg, MAX({_rho_case('w')}) AS m_reg
    FROM hashed GROUP BY o_orderpriority, reg
), sums AS (
    SELECT o_orderpriority, COUNT(*) AS n_active,
           SUM(CAST(1 AS BIGINT) << ({HLL_K} - m_reg)) AS s_active
    FROM regs GROUP BY o_orderpriority
), exact AS (
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS exact_distinct
    FROM orders GROUP BY o_orderpriority
)
SELECT e.o_orderpriority,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST(n_active AS INT) AS n_active_registers,
       {_HLL_EST_NUM!r} / CAST(s_active + ({HLL_M} - n_active)
                               * CAST({2**HLL_K} AS BIGINT) AS DOUBLE)
           AS hll_estimate
FROM exact e JOIN sums s ON e.o_orderpriority = s.o_orderpriority
ORDER BY e.o_orderpriority
"""


HLL_WINDOW_DAYS = 7


def rolling_7d_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, twice: exactly, and via
    MERGED daily HyperLogLog sketches — the pre-aggregation trick that
    makes rolling COUNT(DISTINCT) feasible at warehouse scale. A day's
    raw events are folded ONCE into a 64-register daily sketch;
    any trailing window then merges by per-register max (registers
    commute), so the rolling pass touches ``days x 64`` rows instead
    of re-scanning user ids per window — THE argument for mergeable
    sketches over exact distinct at 100 TB.

    The merge runs on a DENSE (day x register) grid (missing
    registers zero-filled) so a register active only earlier in the
    window still contributes when the anchor day lacks it; the range
    frame is by day number, so calendar gaps inside the window are
    skipped correctly. Estimates use the same exact-integer harmonic
    sum as :func:`hll_distinct_customers_by_priority`. The exact
    companion column replays each user-day into the 7 windows it
    serves via a bounded explode — linear fan-out, no range self-join.
    """
    from pac_spark.functions.hashing import md5_u60

    # pinned: feeds both the daily register table and the exact
    # explode companion — one scan, two consumers
    events = pin(
        catalog.load(spark, sf_dir, "events").select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
        )
    )
    h = md5_u60(F.concat(F.lit("hll1|"), F.col("user_id").cast("string")))
    daily = pin(
        events.select(
            "day_num", (h % HLL_M).alias("reg"), F.shiftright(h, 6).alias("w")
        )
        .withColumn("rho", F.expr(_rho_case("w")))
        .groupBy("day_num", "reg")
        .agg(F.max("rho").alias("m_reg"))
    )
    grid = (
        daily.select("day_num")
        .distinct()
        .select(
            "day_num", F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("reg")
        )
    )
    dense = grid.join(daily, ["day_num", "reg"], "left").select(
        "day_num", "reg", F.coalesce("m_reg", F.lit(0)).alias("m_reg")
    )
    merge_w = (
        W.partitionBy("reg")
        .orderBy("day_num")
        .rangeBetween(-(HLL_WINDOW_DAYS - 1), 0)
    )
    merged = dense.select(
        "day_num", "reg", F.max("m_reg").over(merge_w).alias("m7")
    )
    sums = merged.groupBy("day_num").agg(
        F.sum(F.when(F.col("m7") > 0, 1).otherwise(0)).alias("n_active"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {HLL_K} - m7)")).alias("s"),
    )
    # exact companion: each (user, active day) serves windows anchored
    # at day..day+6; count distinct users per anchor among ACTIVE days
    pairs = events.distinct()
    exact = (
        pairs.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day_num"),
                    F.col("day_num") + F.lit(HLL_WINDOW_DAYS - 1),
                )
            ).alias("anchor"),
        )
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("exact_7d_distinct"))
    )
    epoch = F.lit("1970-01-01").cast("date")
    return (
        sums.join(exact, sums.day_num == exact.anchor)
        .select(
            F.date_add(epoch, F.col("day_num")).cast("string").alias("day"),
            "exact_7d_distinct",
            F.col("n_active").cast("int").alias("n_active_registers"),
            (F.lit(_HLL_EST_NUM) / F.col("s").cast("double")).alias("hll_estimate"),
        )
        .orderBy("day")
    )


_H_USER = _md5_u60_sql("'hll1|' || CAST(user_id AS VARCHAR)")

ROLLING_HLL_SQL = f"""
WITH ev AS (
    SELECT user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
    FROM events
), daily AS (
    SELECT day_num, {_H_USER} % {HLL_M} AS reg,
           MAX({_rho_case(f"({_H_USER} // {HLL_M})")}) AS m_reg
    FROM ev GROUP BY 1, 2
), grid AS (
    SELECT d.day_num, u.reg
    FROM (SELECT DISTINCT day_num FROM daily) d,
         UNNEST(range(0, {HLL_M})) AS u(reg)
), dense AS (
    SELECT g.day_num, g.reg, COALESCE(daily.m_reg, 0) AS m_reg
    FROM grid g LEFT JOIN daily USING (day_num, reg)
), merged AS (
    SELECT day_num, reg,
           MAX(m_reg) OVER (PARTITION BY reg ORDER BY day_num
                            RANGE BETWEEN {HLL_WINDOW_DAYS - 1} PRECEDING
                            AND CURRENT ROW) AS m7
    FROM dense
), sums AS (
    SELECT day_num,
           SUM(CASE WHEN m7 > 0 THEN 1 ELSE 0 END) AS n_active,
           SUM(CAST(1 AS BIGINT) << ({HLL_K} - m7)) AS s
    FROM merged GROUP BY day_num
), pairs AS (
    SELECT DISTINCT user_id, day_num FROM ev
), exact AS (
    SELECT u.anchor, COUNT(DISTINCT user_id) AS exact_7d_distinct
    FROM pairs,
         UNNEST(range(day_num, day_num + {HLL_WINDOW_DAYS})) AS u(anchor)
    GROUP BY u.anchor
)
SELECT strftime(DATE '1970-01-01' + INTERVAL (s.day_num) DAY, '%Y-%m-%d') AS day,
       CAST(exact_7d_distinct AS BIGINT) AS exact_7d_distinct,
       CAST(n_active AS INT) AS n_active_registers,
       {_HLL_EST_NUM!r} / CAST(s AS DOUBLE) AS hll_estimate
FROM sums s JOIN exact e ON s.day_num = e.anchor
ORDER BY day
"""


# ---------------------------------------------------------------------------
# KMV / theta sketch: distinct counts WITH set algebra


KMV_K = 64  # sketch size (k minimum hash values)
_KMV_RANGE = 2**60  # md5_u60's hash space; exactly representable as double


def _kmv_sketches(rows: DataFrame, group: str, key: str) -> DataFrame:
    """(group, h) sample rows of each group's KMV/theta sketch.

    A KMV sketch keeps the ``k`` smallest hash values of a set; the
    k-th smallest estimates the set's density in hash space. Unlike
    HLL registers, the retained SAMPLE supports set algebra: two
    groups' samples intersected below the pairwise theta estimate the
    intersection cardinality — the theta-sketch trick that answers
    "how many items do these segments share?" without re-scanning
    either segment.

    Uniform theta formulation: ``theta = h_k`` when the group has at
    least ``k`` distinct hashes else the full hash range, and the
    sample is ``h < theta`` — so ``est = |sample| * RANGE / theta``
    covers both regimes (exact below ``k``, (k-1)-th-order estimate
    above) with a single expression.

    Scale shape: the k-smallest selection is TWO-PHASE — a first
    ``row_number`` inside (group, hash-bucket) partitions bounds every
    window partition, then the second pass ranks only the ≤ 32·k
    per-group survivors. A single window per group would serialize
    each group's full key set through one task — the unpartitioned-
    window anti-pattern ``functions.prefix`` exists to avoid.

    The hash depends ONLY on the key (no group salt): the same key
    must map to the same point of hash space in every group, or
    samples could never be intersected.
    """
    from pac_spark.functions.hashing import md5_bucket, md5_u60

    h = md5_u60(F.concat(F.lit("kmv1|"), F.col(key).cast("string")))
    b = md5_bucket(F.concat(F.lit("kmvb|"), F.col(key).cast("string")), 32)
    # NULL keys hash to NULL and are excluded (a NULL member adds
    # nothing to a distinct estimate, matching COUNT(DISTINCT)) —
    # kept in, the NULL h would sort FIRST in Spark and LAST in
    # DuckDB, displacing the k-th hash differently per engine
    # (code-review r7)
    hashed = (
        rows.filter(F.col(key).isNotNull())
        .select(F.col(group).alias("g"), h.alias("h"), b.alias("b"))
        .distinct()
    )
    phase1 = (
        hashed.withColumn(
            "rn", F.row_number().over(W.partitionBy("g", "b").orderBy("h"))
        )
        .filter(F.col("rn") <= KMV_K)
        .drop("rn", "b")
    )
    return (
        phase1.withColumn(
            "rn", F.row_number().over(W.partitionBy("g").orderBy("h"))
        )
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )


def kmv_theta(sk: DataFrame) -> DataFrame:
    """(g, theta) from a (g, h) KMV sample: theta = h_k in the full
    regime, else the whole hash range — ONE spelling of the uniform
    formulation shared by the batch overlap tier and the streaming
    fold (code-review r7: they carried byte-identical copies)."""
    return (
        sk.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("h_max"))
        .select(
            "g",
            F.when(F.col("n_sk") >= KMV_K, F.col("h_max"))
            .otherwise(F.lit(_KMV_RANGE))
            .alias("theta"),
        )
    )


def kmv_nation_part_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise part-catalog overlap between supplier nations, from
    KMV/theta sketches: for every nation pair, each side's estimated
    distinct part count and the estimated size of the INTERSECTION of
    their part sets, next to the exact intersection so the error is
    visible. The sketch answer reads 25 sketches of ≤ k rows; the
    exact companion is the expensive self-join it replaces at scale.

    All arithmetic to the final division is exact integers: samples
    join on the 60-bit hash itself, thetas compare as BIGINTs, and the
    estimate ``n·RANGE/theta`` multiplies n ≤ 64 (6 bits) by 2^60 —
    exactly representable as a double — before one IEEE division both
    engines round identically.
    """
    li = catalog.load(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    sup = catalog.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = catalog.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    np_pairs = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("l_partkey").alias("part"))
    )
    # pinned: the DISTINCT (nation, part) frame feeds BOTH the sketch
    # build and the exact-intersection companion. Deduplicating BEFORE
    # the sketch call matters twice over: the shared pin replaces the
    # r7 raw-join pin (one fact scan either way), and the sketch's
    # double-md5 hash chain now runs over the ~|distinct pairs| rows
    # instead of every raw lineitem row — at 100 TB that is the fact
    # table's row count of avoided md5 work; _kmv_sketches' internal
    # distinct still dedupes the (astronomically rare) 60-bit hash
    # collision exactly like the oracle's DISTINCT-on-hash (r9 bench
    # row review; sf0.1 full operator 4.9 -> 3.4 s same-session).
    np_distinct = pin(np_pairs.distinct())
    sk = pin(_kmv_sketches(np_distinct, "nation", "part"))
    theta = kmv_theta(sk)
    # sample = h < theta (drops the k-th value itself in the full regime)
    samples = sk.join(F.broadcast(theta), "g").filter(F.col("h") < F.col("theta"))
    per_g = samples.groupBy("g", "theta").agg(F.count("*").alias("n_below"))
    a, bq = per_g.alias("a"), per_g.alias("b")
    # ≤ |groups| rows per side: a broadcast nested-loop pair join
    pairs = a.join(F.broadcast(bq), F.col("a.g") < F.col("b.g")).select(
        F.col("a.g").alias("nation_a"),
        F.col("b.g").alias("nation_b"),
        F.col("a.n_below").alias("na"),
        F.col("a.theta").alias("ta"),
        F.col("b.n_below").alias("nb"),
        F.col("b.theta").alias("tb"),
        F.least("a.theta", "b.theta").alias("tab"),
    )
    sa, sb = samples.alias("sa"), samples.alias("sb")
    common = (
        sa.join(sb, (F.col("sa.h") == F.col("sb.h")) & (F.col("sa.g") < F.col("sb.g")))
        .select(
            F.col("sa.g").alias("nation_a"),
            F.col("sb.g").alias("nation_b"),
            F.col("sa.h").alias("h"),
            F.col("sa.theta").alias("ta2"),
            F.col("sb.theta").alias("tb2"),
        )
        .filter(F.col("h") < F.least("ta2", "tb2"))
        .groupBy("nation_a", "nation_b")
        .agg(F.count("*").alias("n_common"))
    )
    # exact companion via per-part nation combinations (r11, guide
    # §2.4): the prior self-join on part shuffled the distinct frame
    # into a SortMergeJoin and re-aggregated its fan-out; grouping by
    # part and generating the a<b nation pairs IN PLACE (the
    # inverted-index idiom _pair_shared_counts uses) moves one shuffle
    # of the distinct rows + a map-side pair explode instead — the
    # posting list is bounded by the nation count, so no group can go
    # hot. Same multiset of (a, b) rows by construction (array_sort
    # makes x < y ordered pairs; nations are distinct per part), so
    # counts are identical. Same-JVM interleaved A/B at sf0.1
    # (min-of-4, warm, whole operator): 2.71 s -> 2.67 s — locally
    # neutral (the self-join was not this scale's cost); kept for the
    # removed SortMergeJoin of the distinct frame, which IS the cost
    # once the distinct frame outgrows memory-local shuffles.
    per_part = np_distinct.groupBy("part").agg(
        F.array_sort(F.collect_list("nation")).alias("ds")
    )
    exact_inter = (
        per_part.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(slice(ds, i + 2, size(ds) - i - 1), "
                    "y -> struct(x AS nation_a, y AS nation_b))))"
                )
            ).alias("p")
        )
        .select("p.nation_a", "p.nation_b")
        .groupBy("nation_a", "nation_b")
        .agg(F.count("*").alias("exact_intersection"))
    )
    rng = F.lit(float(_KMV_RANGE))

    def est(n, t):
        return F.col(n).cast("double") * rng / F.col(t).cast("double")

    return (
        pairs.join(common, ["nation_a", "nation_b"], "left")
        .join(exact_inter, ["nation_a", "nation_b"], "left")
        .select(
            "nation_a",
            "nation_b",
            est("na", "ta").alias("kmv_est_a"),
            est("nb", "tb").alias("kmv_est_b"),
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                * rng
                / F.col("tab").cast("double")
            ).alias("kmv_est_intersection"),
            F.coalesce("exact_intersection", F.lit(0))
            .cast("long")
            .alias("exact_intersection"),
        )
        .orderBy("nation_a", "nation_b")
    )


_H_PART = _md5_u60_sql("'kmv1|' || CAST(part AS VARCHAR)")

KMV_SQL = f"""
WITH np AS (
    SELECT DISTINCT n.n_name AS nation, l.l_partkey AS part
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
), hashed AS (
    SELECT DISTINCT nation AS g, {_H_PART} AS h FROM np
), sk AS (
    SELECT g, h FROM (
        SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM hashed
    ) WHERE rn <= {KMV_K}
), theta AS (
    SELECT g,
           CASE WHEN COUNT(*) >= {KMV_K} THEN MAX(h)
                ELSE CAST({_KMV_RANGE} AS BIGINT) END AS theta
    FROM sk GROUP BY g
), samples AS (
    SELECT sk.g, sk.h, t.theta FROM sk JOIN theta t ON sk.g = t.g
    WHERE sk.h < t.theta
), per_g AS (
    SELECT g, theta, COUNT(*) AS n_below FROM samples GROUP BY g, theta
), pairs AS (
    SELECT a.g AS nation_a, b.g AS nation_b,
           a.n_below AS na, a.theta AS ta,
           b.n_below AS nb, b.theta AS tb,
           LEAST(a.theta, b.theta) AS tab
    FROM per_g a JOIN per_g b ON a.g < b.g
), common AS (
    SELECT sa.g AS nation_a, sb.g AS nation_b, COUNT(*) AS n_common
    FROM samples sa JOIN samples sb
      ON sa.h = sb.h AND sa.g < sb.g
    WHERE sa.h < LEAST(sa.theta, sb.theta)
    GROUP BY sa.g, sb.g
), exact_inter AS (
    SELECT ea.nation AS nation_a, eb.nation AS nation_b,
           COUNT(*) AS exact_intersection
    FROM np ea JOIN np eb
      ON ea.part = eb.part AND ea.nation < eb.nation
    GROUP BY ea.nation, eb.nation
)
SELECT p.nation_a, p.nation_b,
       CAST(na AS DOUBLE) * {float(_KMV_RANGE)!r} / CAST(ta AS DOUBLE)
           AS kmv_est_a,
       CAST(nb AS DOUBLE) * {float(_KMV_RANGE)!r} / CAST(tb AS DOUBLE)
           AS kmv_est_b,
       CAST(COALESCE(c.n_common, 0) AS DOUBLE) * {float(_KMV_RANGE)!r}
           / CAST(tab AS DOUBLE) AS kmv_est_intersection,
       CAST(COALESCE(e.exact_intersection, 0) AS BIGINT) AS exact_intersection
FROM pairs p
LEFT JOIN common c ON p.nation_a = c.nation_a AND p.nation_b = c.nation_b
LEFT JOIN exact_inter e ON p.nation_a = e.nation_a AND p.nation_b = e.nation_b
ORDER BY p.nation_a, p.nation_b
"""


# ---------------------------------------------------------------------------
# Bitmap-index exact distinct (the dense-domain companion to HLL)

def bitmap_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day via 64-bit bitmap words — the
    roaring-bitmap idea reduced to its Spark-native core. Each user
    id owns one bit (word = id >> 6, bit = id & 63); per (day, word)
    a map-side-combined ``bit_or`` fuses all occurrences into one
    BIGINT, and the day's distinct count is the sum of popcounts.

    Why it earns a slot next to HLL and count-distinct: the shuffle
    carries at most one row per (day, touched word) — for dense
    integer domains that is 1/64th of the distinct-expansion rows
    Spark's exact ``countDistinct`` rewrites into, the merge is a
    pure bitwise OR (associative, partition-invariant by
    construction), and unlike HLL the answer is EXACT. The trade is
    domain-boundedness: memory is domain/8 bytes per group worst
    case, so it fits id spaces up to a few billion — past that, HLL.

    The oracle is deliberately the INDEPENDENT formulation — plain
    ``COUNT(DISTINCT user_id)`` — so hash equality proves the bitmap
    machinery implements distinct-count semantics rather than echoing
    its own construction. bit_count of a negative word (bit 63 set)
    counts two's-complement bits identically on both engines
    (verified in the staged gate's crafted case).
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    return bitmap_day_counts(bitmap_day_words(ev))


def bitmap_day_words(ev: DataFrame) -> DataFrame:
    """(day, word, bits) bitmap words over a (day, user_id) frame —
    the ONE rendering of the word/bit split, shared by the batch tier
    and the streaming fold's per-batch partial."""
    return (
        ev.select(
            "day",
            F.shiftright("user_id", 6).alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("day", "word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bitmap_day_counts(words: DataFrame) -> DataFrame:
    """Popcount read-off of a (day, word, bits) frame. A day whose
    events all carry NULL user_id has one all-NULL word group — its
    count must read 0, matching COUNT(DISTINCT)'s NULL-exclusion in
    the independent oracle, not NULL (code-review r7)."""
    return (
        words.groupBy("day")
        .agg(
            F.coalesce(
                F.sum(F.expr("bit_count(bits)")), F.lit(0)
            ).alias("n_distinct_users")
        )
        .orderBy("day")
    )


# STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py).
# The independent spec: no bitmaps anywhere — COUNT(DISTINCT). A plain
# module string like HLL_SQL so QuerySpec registration cannot
# accidentally pass a callable (the BM25_SQL regression class).
BITMAP_DISTINCT_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events GROUP BY 1 ORDER BY day
"""


# ---------------------------------------------------------------------------
# AMS (Alon–Matias–Szegedy) second frequency moment


AMS_DEPTH = 8  # independent ±1 estimators, averaged


def ams_f2_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second frequency moment (F2 = Σ_k c_k²) of the events table's
    user_id distribution, estimated by the AMS ±1 sketch next to the
    exact answer — F2 IS the self-join size, so this sketch is what a
    planner consults before committing to a join strategy on a maybe-
    skewed key.

    Sketch: ``AMS_DEPTH`` independent estimators; estimator j keeps
    one integer ``s_j = Σ_rows sign_j(user_id)`` with sign_j the
    shared md5 bucket (mod 2 → ±1). E[s_j²] = F2 exactly; the readout
    averages the squares. Everything is an integer sum — partition-
    invariant, mergeable (the partial-tables-add property every sketch
    here carries), and the whole sketch is ONE 1-row aggregate: no
    explode, no shuffle beyond the partial-agg tree, D counters of
    state total. The exact companion accumulates c_k² in
    decimal(38,0) (a count of 10⁶ squares to 10¹² — BIGINT survives,
    but the cluster-scale margin is the point).

    Estimator error is the standard AMS bound (variance ≤ 2·F2²/D);
    the driver hash-checks the VALUES, which are deterministic because
    the sign family is md5, not RNG state.
    """
    from pac_spark.functions.hashing import md5_bucket

    # pinned: the projection feeds the sketch aggregate AND the exact
    # per-key companion
    ev = pin(catalog.load(spark, sf_dir, "events").select("user_id"))

    def sign(j: int):
        b = md5_bucket(
            F.concat(F.lit(f"ams{j}|"), F.col("user_id").cast("string")), 2
        )
        return (b * 2 - 1).cast("long")

    sk = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(sign(j)).alias(f"s{j}") for j in range(AMS_DEPTH)],
    )
    dec = "decimal(38,0)"
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((F.col("c").cast(dec) * F.col("c")).cast(dec)).alias("f2_exact"),
        )
    )
    # square in decimal, not long: s_j approaches ±n_rows under a
    # skewed key, so the long multiply overflows (ANSI throw) exactly
    # where the oracle's HUGEINT succeeds (code-review r7)
    est = sum(
        F.col(f"s{j}").cast(dec) * F.col(f"s{j}").cast(dec)
        for j in range(AMS_DEPTH)
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        "n_rows",
        "n_keys",
        F.col("f2_exact").cast("long").alias("f2_exact"),
        (est.cast("double") / F.lit(float(AMS_DEPTH))).alias("f2_estimate"),
    )


def _ams_signs_sql(col: str, alias: str) -> str:
    from pac_spark.functions.hashing import md5_bucket_sql

    return ", ".join(
        "SUM(CAST("
        + md5_bucket_sql(f"'ams{j}|' || CAST({col} AS VARCHAR)", 2)
        + f" * 2 - 1 AS BIGINT)) AS {alias}{j}"
        for j in range(AMS_DEPTH)
    )


# STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py);
# plain module strings for the same no-callable-oracle reason as
# BITMAP_DISTINCT_SQL above. The sign sums are HUGEINT (DuckDB SUM of
# BIGINT), so the squared estimator runs exact — mirrored by the
# Spark side's decimal products.
_AMS_SIGNS = _ams_signs_sql("user_id", "s")
_AMS_EST = " + ".join(f"s{j} * s{j}" for j in range(AMS_DEPTH))
AMS_SQL = f"""
WITH sk AS (SELECT COUNT(*) AS n_rows, {_AMS_SIGNS} FROM events),
ex AS (
    SELECT COUNT(*) AS n_keys,
           SUM(CAST(c AS HUGEINT) * c) AS f2_exact
    FROM (SELECT COUNT(*) AS c FROM events GROUP BY user_id)
)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(f2_exact AS BIGINT) AS f2_exact,
       CAST({_AMS_EST} AS DOUBLE) / {float(AMS_DEPTH)} AS f2_estimate
FROM sk CROSS JOIN ex
"""


def ams_join_size_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join cardinality estimation from two independently built
    AMS sketches: |orders ⋈ events on customer| = Σ_k a_k·b_k, and
    with BOTH tables sketched under the SAME ±1 sign family,
    E[sa_j·sb_j] = Σ_k a_k·b_k — the inner product of the sketches
    estimates the join size without ever joining. This is the
    planner's question ("how big would this join be?") answered from
    two 8-integer summaries that each side can maintain independently
    and merge monoidally; the exact companion (the actual per-key
    count join, decimal-accumulated) is computed alongside so the
    driver hash-checks both.
    """
    from pac_spark.functions.hashing import md5_bucket

    def sign(col: str, j: int):
        b = md5_bucket(F.concat(F.lit(f"ams{j}|"), F.col(col).cast("string")), 2)
        return (b * 2 - 1).cast("long")

    # pinned: each side feeds its sketch aggregate AND the exact
    # join-count companion
    o = pin(catalog.load(spark, sf_dir, "orders").select("o_custkey"))
    e = pin(catalog.load(spark, sf_dir, "events").select("user_id"))
    sk_o = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        *[F.sum(sign("o_custkey", j)).alias(f"a{j}") for j in range(AMS_DEPTH)],
    )
    sk_e = e.agg(
        F.count(F.lit(1)).alias("n_events"),
        *[F.sum(sign("user_id", j)).alias(f"b{j}") for j in range(AMS_DEPTH)],
    )
    dec = "decimal(38,0)"
    oc = o.groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("ac"))
    ec = e.groupBy(F.col("user_id").alias("k")).agg(F.count(F.lit(1)).alias("bc"))
    exact = oc.join(ec, "k").agg(
        F.coalesce(
            F.sum((F.col("ac").cast(dec) * F.col("bc")).cast(dec)),
            F.lit(0).cast(dec),
        ).alias("join_size_exact")
    )
    # decimal products for the same overflow-margin reason as the F2
    # estimator above
    est = sum(
        F.col(f"a{j}").cast(dec) * F.col(f"b{j}").cast(dec)
        for j in range(AMS_DEPTH)
    )
    return (
        sk_o.crossJoin(F.broadcast(sk_e))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_orders",
            "n_events",
            F.col("join_size_exact").cast("long").alias("join_size_exact"),
            (est.cast("double") / F.lit(float(AMS_DEPTH))).alias(
                "join_size_estimate"
            ),
        )
    )


_AMS_JOIN_EST = " + ".join(f"a{j} * b{j}" for j in range(AMS_DEPTH))
AMS_JOIN_SQL = f"""
WITH sko AS (SELECT COUNT(*) AS n_orders, {_ams_signs_sql("o_custkey", "a")} FROM orders),
ske AS (SELECT COUNT(*) AS n_events, {_ams_signs_sql("user_id", "b")} FROM events),
ex AS (
    SELECT COALESCE(SUM(CAST(ac AS HUGEINT) * bc), 0) AS join_size_exact
    FROM (SELECT o_custkey AS k, COUNT(*) AS ac FROM orders GROUP BY 1) o
    JOIN (SELECT user_id AS k, COUNT(*) AS bc FROM events GROUP BY 1) e
      USING (k)
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(join_size_exact AS BIGINT) AS join_size_exact,
       CAST({_AMS_JOIN_EST} AS DOUBLE) / {float(AMS_DEPTH)} AS join_size_estimate
FROM sko CROSS JOIN ske CROSS JOIN ex
"""


CMS_DAILY_TOP_N = 5


def cms_daily_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED count-min heavy hitters (VERDICT r10 next-#3: the CMS
    existed, the per-window decode did not): one sketch PER DAY over
    that day's user ids, decoded at the day's exact top-``CMS_DAILY_
    TOP_N`` candidate keys — estimate vs truth per (day, user). The
    rolling "who hammered us today" readout, and the shape a streamed
    CMS deployment actually serves (a global sketch cannot answer
    per-window questions; per-window sketches merge to any coarser
    window by cell-wise addition, which this table makes explicit).

    The day dimension rides the SAME sketch machinery: cells key on
    (day, row, col) — the per-day table is still bounded by
    DEPTH×WIDTH per day, so the whole sketch frame is calendar ×
    DEPTH×WIDTH no matter the event volume. Candidates come from a
    day-partitioned rank cut (count desc, user asc — total order)
    that compiles to WindowGroupLimit (per-partition heaps, the
    priority-sample precedent). NULL user_id / NULL ts rows are
    excluded in both engines (no key / no window).
    """
    ev = pin(
        catalog.load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                _cms_col(F.col("user_id"), d).alias("col"),
            )
            for d in range(CMS_DEPTH)
        ]
    )
    sketch = (
        ev.select("day", F.explode(cells).alias("cell"))
        .groupBy(
            "day",
            F.col("cell.row").alias("row"),
            F.col("cell.col").alias("col"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = ev.groupBy("day", "user_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    wr = W.partitionBy("day").orderBy(F.desc("n_rows"), "user_id")
    top = (
        counts.withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") <= CMS_DAILY_TOP_N)
        .drop("_rk")
    )
    # explicit renames kill the shared-lineage ambiguity: sketch and
    # the probe both descend from ev, so a bare probed.day == sketch.day
    # logs Spark's "trivially true equals predicate" warning (r11
    # staged NULL sweep) — values were right, but a join key that only
    # resolves by luck is a refactor away from being wrong
    probed = top.select(
        F.col("day").alias("p_day"),
        "user_id",
        "n_rows",
        F.explode(cells).alias("_cell"),
    )
    est = (
        probed.join(
            sketch.select(
                F.col("day").alias("s_day"),
                F.col("row").alias("s_row"),
                F.col("col").alias("s_col"),
                "cnt",
            ),
            (F.col("p_day") == F.col("s_day"))
            & (F.col("_cell.row") == F.col("s_row"))
            & (F.col("_cell.col") == F.col("s_col")),
            "left",
        )
        .select(
            F.col("p_day").alias("day"),
            "user_id",
            "n_rows",
            F.coalesce("cnt", F.lit(0)).alias("_c"),
        )
        .groupBy("day", "user_id", "n_rows")
        .agg(F.min("_c").cast("long").alias("cms_estimate"))
    )
    return est.select(
        "day",
        "user_id",
        "n_rows",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_rows")).alias("overcount"),
    ).orderBy("day", F.desc("n_rows"), "user_id")


def CMS_DAILY_SQL() -> str:
    """Oracle: identical per-day sketch (same seeded md5 arithmetic),
    per-day rank cut, min-of-cells decode with LEFT + zero-fill."""
    from pac_spark.functions.hashing import md5_bucket_sql

    def col_sql(d: int) -> str:
        return md5_bucket_sql(
            f"'cms{d}|' || CAST(user_id AS VARCHAR)", CMS_WIDTH
        )

    cell_rows = " UNION ALL ".join(
        f"SELECT day, {d} AS row, {col_sql(d)} AS col FROM ev"
        for d in range(CMS_DEPTH)
    )
    key_cells = " UNION ALL ".join(
        f"SELECT day, user_id, n_rows, {d} AS row, {col_sql(d)} AS col FROM top"
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH ev AS (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, user_id
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cells AS ({cell_rows}),
sketch AS (SELECT day, row, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2, 3),
counts AS (
    SELECT day, user_id, COUNT(*) AS n_rows FROM ev GROUP BY day, user_id
),
top AS (
    SELECT day, user_id, n_rows FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY day ORDER BY n_rows DESC, user_id) AS rk
        FROM counts
    ) WHERE rk <= {CMS_DAILY_TOP_N}
),
kc AS ({key_cells}),
est AS (
    SELECT kc.day, kc.user_id, kc.n_rows,
           MIN(COALESCE(s.cnt, 0)) AS cms_estimate
    FROM kc LEFT JOIN sketch s
      ON s.day = kc.day AND s.row = kc.row AND s.col = kc.col
    GROUP BY 1, 2, 3
)
SELECT day, user_id, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - n_rows AS BIGINT) AS overcount
FROM est ORDER BY day, n_rows DESC, user_id
"""
