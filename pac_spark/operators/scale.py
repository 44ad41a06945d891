"""Scale-technique showcase queries: the skew-salted join and the
bucketed-layout join, each run end-to-end on real tables so the driver
hash-verifies that the technique is invisible to results.

Both techniques exist for the same reason at 100 TB: the shuffle is
the enemy. Salting spreads a hot key's shuffle across ``n_salts``
tasks at the cost of replicating a small side; bucketing removes the
join shuffle entirely by paying it once at write time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.functions.exact import money_sum
from pac_spark.functions.salting import salted_join
from pac_spark.sources.bucketing import ensure_bucketed, read_table
from pac_spark.sources.layout_cache import (
    layout_intact,
    source_fingerprint,
    write_sidecar,
)

__all__ = [
    "salted_events_join",
    "bucketed_orders_join",
    "key_skew_report",
    "compaction_roundtrip",
    "zorder_roundtrip",
    "clustering_depth",
    "clustering_depth_events",
    "bloom_pruned_orders_join",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def salted_events_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-heavy equi-join through :func:`salted_join`: the events
    fact carries ~5 distinct event types over every row — exactly the
    key distribution that hot-spots a shuffle join — and the type dim
    is tiny. The driver compares the salted result against the plain
    join SQL, proving row-for-row that salting never changes results
    (the salt is derived, joined on, and dropped internally).
    """
    events = catalog.load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("type_code", F.upper(F.col("event_type")))
    )
    joined = salted_join(events, dim, ["event_type"], n_salts=16)
    return joined.select("event_id", "event_type", "type_code", "value").orderBy(
        "event_id"
    )


def bucketed_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join on a bucketed layout: orders and lineitem are
    written hash-bucketed (and sorted) by their order key, then joined
    with zero exchanges on either side — the ingest-time-shuffle trade
    ``sources.bucketing`` prescribes for repeated joins at scale. The
    aggregate afterwards is the query's only shuffle, and it runs on
    the (already co-located) join output.

    The oracle is the plain join + aggregate SQL, so the hash check
    proves the layout is invisible to results; the plan test asserts
    the exchange-free join shape. The bucketed tables are written
    ONCE per (table, sf) — repeat invocations only read (VERDICT r4
    wrong-#2: the r4 version re-shuffled and re-saved both facts on
    every call, charging ingest cost to a read query).
    """
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_orders, t_lineitem = f"pac_b_orders_{tag}", f"pac_b_lineitem_{tag}"
    warehouse = os.path.join(_REPO_ROOT, "spark-warehouse")

    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = catalog.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ensure_bucketed(
        spark,
        orders,
        t_orders,
        os.path.join(warehouse, t_orders),
        "o_orderkey",
        fingerprint=source_fingerprint(catalog.table_path(sf_dir, "orders")),
    )
    ensure_bucketed(
        spark,
        lineitem,
        t_lineitem,
        os.path.join(warehouse, t_lineitem),
        "l_orderkey",
        fingerprint=source_fingerprint(catalog.table_path(sf_dir, "lineitem")),
    )

    bo = read_table(spark, t_orders)
    bl = read_table(spark, t_lineitem)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            money_sum(disc_price, scale=4).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


SKEW_TOP_N = 10


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for the events fact on ``user_id`` —
    the measurement that decides between a plain join, AQE skew
    splitting, and :func:`~pac_spark.functions.salting.salted_join`.

    Per hot key: row count, share of the table (permille, exact
    integer arithmetic), and the ratio to a perfectly uniform key
    (count × n_distinct_keys / n_rows, in percent) — a ratio ≫ 100
    marks the keys that would hot-spot a shuffle task. One map-side-
    combined groupBy then TakeOrderedAndProject over the (already
    tiny) per-key counts; the two global scalars ride a 1-row
    broadcast, so the whole report is two passes over key counts,
    never over rows.
    """
    ev = catalog.load(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("_n_keys"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "user_id",
            "n_rows",
            F.expr("(n_rows * 1000) div _total").alias("share_permille"),
            # ratio vs the mean rows-per-key, NOT n_rows*n_keys*100
            # div total: that form overflows BIGINT for a hot key on a
            # 1e12-row/1e9-key fact (1e8*1e9*100 > 2^63, and non-ANSI
            # Spark wraps silently). _total div _n_keys >= 1 always
            # (every counted key has >= 1 row), so no zero-division.
            F.expr("(n_rows * 100) div (_total div _n_keys)").alias(
                "uniform_ratio_pct"
            ),
        )
        .orderBy(F.desc("n_rows"), "user_id")
        .limit(SKEW_TOP_N)
    )


# deliberately shatter the events fact into this many tiny files to
# simulate a streaming sink's small-files debris before compacting
_FRAG_FILES = 64


def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 compaction, driver-verified end-to-end: shatter the events
    fact into ``_FRAG_FILES`` tiny files (the small-files debris a
    per-batch streaming sink leaves), compact the fragmented copy with
    the AQE-REBALANCE pass (``sources.compaction.compact``), and
    aggregate the COMPACTED copy. The oracle states the same aggregate
    over the original table, so the hash check proves the rewrite is
    invisible to content — no row lost, duplicated, or mutated.

    Fragment + compact run ONCE per (table, sf) — create-if-absent on
    the compacted copy's sidecar + _SUCCESS, same write-once
    discipline as ``bucketed_orders_join``; repeat invocations only
    read. The sidecar carries a fingerprint of the SOURCE events
    files, so regenerating the testdata in place (or pointing a
    same-basename directory here) rebuilds instead of silently
    aggregating the stale copy (ADVICE r5 #3). The file-count / layout
    assertions live in ``tests/test_compaction.py`` (pytest), this row
    verifies content.
    """
    from pac_spark.sources.compaction import compact

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    warehouse = os.path.join(_REPO_ROOT, "spark-warehouse")
    frag_dir = os.path.join(warehouse, f"pac_frag_events_{tag}")
    comp_dir = os.path.join(warehouse, f"pac_compact_events_{tag}")
    spec = {
        "kind": "compacted",
        "source": source_fingerprint(catalog.table_path(sf_dir, "events")),
    }

    if not layout_intact(comp_dir, spec):
        import shutil

        events = catalog.load(spark, sf_dir, "events")
        events.repartition(_FRAG_FILES).write.mode("overwrite").parquet(frag_dir)
        compact(spark.read.parquet(frag_dir), comp_dir, advisory_partition_mb=64)
        # the fragmented copy is a build intermediate — never read once
        # the compacted copy exists, so don't let it double the footprint
        shutil.rmtree(frag_dir, ignore_errors=True)
        write_sidecar(comp_dir, spec)

    comp = spark.read.parquet(comp_dir)
    return (
        comp.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("event_id").alias("n_distinct_events"),
            money_sum(F.col("value")).alias("total_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


# the 2-D selection box the z-ordered row queries: chosen inside the
# data range at every SF so the result is non-trivial, and on BOTH
# layout axes so the Morton clustering (not a single-axis sort) is
# what makes the file-level min/max stats selective
# user_id spans ~0-14 at sf0.001 and grows with SF; the box must hold
# rows at EVERY SF or the local sf0.001 oracle gate is vacuous
# (code-review r6: the 20-70 box matched zero rows at the test SF)
_ZBOX_USER_LO, _ZBOX_USER_HI = 2, 10
_ZBOX_VALUE_LO, _ZBOX_VALUE_HI = 50.0, 200.0
_Z_FILES = 16


def zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14b Z-order clustering, driver-verified end-to-end: rewrite
    the events fact as a Morton-curve-clustered layout over
    (``user_id``, ``value``) via
    :func:`pac_spark.sources.compaction.compact_zordered`, then run a
    2-D box-selective aggregate against the CLUSTERED copy. The
    oracle states the same box aggregate over the original table, so
    the hash check proves the curve rewrite is content-invisible; the
    file-level pruning proof (row-group min/max selectivity vs an
    unclustered control) lives in ``tests/test_compaction.py``.

    Same write-once + sidecar-fingerprint discipline as
    ``compaction_roundtrip``: the curve layout is ingest work, paid
    once per (table, source generation), never by reads. At 100 TB
    this is the maintenance pass behind every "needle in a 2-D box"
    workload (user × amount, lat × lon, time × key): either column
    alone prunes ~sqrt(selectivity) of the files, the box prunes
    both ways.
    """
    from pac_spark.sources.compaction import compact_zordered

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    z_dir = os.path.join(_REPO_ROOT, "spark-warehouse", f"pac_zorder_events_{tag}")
    spec = {
        "kind": "zordered",
        "cols": ["user_id", "value"],
        "n_files": _Z_FILES,
        "source": source_fingerprint(catalog.table_path(sf_dir, "events")),
    }
    if not layout_intact(z_dir, spec):
        events = catalog.load(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        compact_zordered(events, z_dir, "user_id", "value", _Z_FILES)
        write_sidecar(z_dir, spec)

    z = spark.read.parquet(z_dir)
    box = (
        F.col("user_id").between(_ZBOX_USER_LO, _ZBOX_USER_HI)
        & F.col("value").between(_ZBOX_VALUE_LO, _ZBOX_VALUE_HI)
    )
    return (
        z.filter(box)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            money_sum(F.col("value")).alias("box_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


# the selective dim predicate the bloom-pruned join demonstrates:
# urgent orders above a quarter-million — ~1-2% of orders, so ~98% of
# lineitem rows can drop map-side before the join shuffle
_BLOOM_PRIORITY = "1-URGENT"
_BLOOM_MIN_TOTAL = 250000.0


def bloom_pruned_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning (``functions.bloom``): lineitem rows
    are pre-filtered MAP-SIDE by a bloom filter built from the
    selective orders dim, then joined for real. The bloom admits every
    true match (false negatives impossible) and the join removes any
    false positives, so the result is row-for-row the plain join — the
    oracle states the plain SQL and the driver hash-verifies it.

    This is Spark's own runtime-filter shape made deliberate: at
    100 TB a ~1%-selective dim means ~99% of the fact never gets
    hashed, serialized, or shuffled. (On THIS query Spark would
    broadcast the dim anyway at sf0.1; the technique's target is the
    fact-to-fact regime where both sides exceed the broadcast
    threshold — asserted shuffle-volume reduction lives in
    ``tests/test_bloom.py``.)
    """
    from pac_spark.functions.bloom import bloom_might_contain, build_bloom

    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dim = orders.filter(
        (F.col("o_orderpriority") == _BLOOM_PRIORITY)
        & (F.col("o_totalprice") > _BLOOM_MIN_TOTAL)
    )
    bf = build_bloom(dim.select("o_orderkey"), "o_orderkey")

    lineitem = catalog.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    pruned = lineitem.filter(bloom_might_contain(bf, F.col("l_orderkey")))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        pruned.join(dim, pruned.l_orderkey == dim.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            money_sum(disc_price, scale=4).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# file count for the range-clustered audit layout; matches _Z_FILES so
# the two clustered layouts are comparable in the depth report
_CLUSTER_FILES = 16


def clustering_depth(
    spark: SparkSession, path: str, layout: str, cols: list[str]
) -> DataFrame:
    """Zone-map quality audit for one parquet layout: per column, how
    many files' [min, max] ranges overlap — the metric deciding
    whether footer statistics can prune a scan (Snowflake publishes
    the same idea as *clustering depth*). depth_f = number of files
    whose range covers file f's minimum (itself included), read off a
    sweep line: (+1 at lo, −1 after hi) events, one running sum in
    (value, start-before-end, file) order — touching ranges count as
    overlapping. A perfectly clustered column reports avg = 100
    centi-depth (every file prunable independently); a hash/debris
    layout reports depth ≈ n_files (statistics prune nothing).

    Scale shape: the only full-data pass is the per-file min/max
    aggregate (map-side-combined, keyed on ``input_file_name()`` —
    at a deployment this reads footer metadata instead of data); all
    sweep arithmetic runs over the files×cols interval frame, which
    is metadata-sized.
    """
    from pac_spark.functions.exact import int_div

    df = spark.read.parquet(path)
    # boundaries as DECIMAL(38,9): stack() needs one common type
    # across audited columns, longs stay exact, and fractional
    # boundaries survive (the pre-r8 cast-to-long truncated doubles,
    # reporting disjoint ranges like [1.2,1.8]/[1.9,2.5] as
    # overlapping — code-review r8). Aliases are INDEX-based and the
    # source column is referenced via df[c], so arbitrary column
    # names (dots, quotes, spaces) cannot break the generated SQL.
    dec = "decimal(38,9)"
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(df[c]).cast(dec).alias(f"lo_{i}"))
        aggs.append(F.max(df[c]).cast(dec).alias(f"hi_{i}"))
    per_file = df.groupBy(
        F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("f")
    ).agg(*aggs)
    quads = ", ".join(
        "'{}', lo_{}, hi_{}".format(c.replace("'", "''"), i, i)
        for i, c in enumerate(cols)
    )
    intervals = per_file.select(
        "f", F.expr(f"stack({len(cols)}, {quads}) AS (col, lo, hi)")
    ).filter(
        # an all-NULL file has no range: it can never block pruning,
        # and NULL sweep events would corrupt the running depth
        F.col("lo").isNotNull()
    )
    events = intervals.select(
        "f",
        "col",
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("v"), F.lit(0).alias("t")),
                F.struct(F.col("hi").alias("v"), F.lit(1).alias("t")),
            )
        ).alias("e"),
    ).select("f", "col", "e.v", "e.t", F.when(F.col("e.t") == 0, 1).otherwise(-1).alias("d"))
    win = (
        W.partitionBy("col")
        .orderBy("v", "t", "f")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    depths = (
        events.withColumn("depth", F.sum("d").over(win))
        .filter(F.col("t") == 0)
        .groupBy("col")
        .agg(
            F.count("*").alias("n_files"),
            F.max("depth").cast("long").alias("max_depth"),
            int_div(F.sum("depth") * F.lit(100), F.count("*")).alias(
                "avg_depth_centi"
            ),
        )
    )
    return depths.select(F.lit(layout).alias("layout"), "col", "n_files", "max_depth", "avg_depth_centi")


def clustering_depth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth report over the two maintained events layouts: the
    AQE-compacted debris rewrite (hash order — expect depth ≈
    n_files on every column) and a range-clustered rewrite on
    ``event_id`` (expect exact centi-depth 100 there and debris-grade
    depth on the non-cluster column). The numbers quantify what the
    compaction family's pruning tests show qualitatively: range
    clustering is what makes footer statistics worth reading.

    Layout builds share the write-once sidecar-fingerprint discipline
    (``compaction_roundtrip`` ensures the compacted copy; the
    clustered copy is ensured here the same way).
    """
    from pac_spark.sources.compaction import compact_clustered

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    warehouse = os.path.join(_REPO_ROOT, "spark-warehouse")
    comp_dir = os.path.join(warehouse, f"pac_compact_events_{tag}")
    clus_dir = os.path.join(warehouse, f"pac_cluster_events_{tag}")

    # ensure the compacted copy (lazy result discarded; the rewrite
    # inside is an eager write action, the returned plan is not run)
    compaction_roundtrip(spark, sf_dir)

    spec = {
        "kind": "range_clustered",
        "cols": ["event_id"],
        "n_files": _CLUSTER_FILES,
        "source": source_fingerprint(catalog.table_path(sf_dir, "events")),
    }
    if not layout_intact(clus_dir, spec):
        events = catalog.load(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        compact_clustered(events, clus_dir, ["event_id"], _CLUSTER_FILES)
        write_sidecar(clus_dir, spec)

    cols = ["event_id", "user_id"]
    return (
        clustering_depth(spark, comp_dir, "compacted", cols)
        .unionByName(clustering_depth(spark, clus_dir, "range_clustered", cols))
        .orderBy("layout", "col")
    )
