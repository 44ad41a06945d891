"""Compaction: a fragmented table must come back with fewer,
size-targeted files and bit-identical content; range clustering must
leave disjoint per-file key ranges (the property footer-stats pruning
relies on)."""

from __future__ import annotations

import glob
import os

import duckdb

from pac_spark.sources.compaction import compact, compact_clustered


def _files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def _fragmented_orders(spark, sf_dir, tmp_path) -> str:
    src = str(tmp_path / "fragmented")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # simulate a streaming sink's droppings: 64 tiny files
    orders.repartition(64).write.mode("overwrite").parquet(src)
    assert len(_files(src)) == 64
    return src


def test_compact_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    src = _fragmented_orders(spark, sf_dir, tmp_path)
    dest = str(tmp_path / "compacted")
    df = spark.read.parquet(src)
    compact(df, dest, advisory_partition_mb=64)
    out_files = _files(dest)
    assert 0 < len(out_files) < 8, out_files
    before = spark.read.parquet(src)
    after = spark.read.parquet(dest)
    assert after.count() == before.count()
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0


def test_compact_clustered_files_have_disjoint_key_ranges(spark, sf_dir, tmp_path):
    src = _fragmented_orders(spark, sf_dir, tmp_path)
    dest = str(tmp_path / "clustered")
    df = spark.read.parquet(src)
    compact_clustered(df, dest, cluster_by=["o_orderkey"], n_files=4)
    out_files = _files(dest)
    assert len(out_files) == 4
    con = duckdb.connect()
    ranges = []
    for f in out_files:
        lo, hi = con.execute(
            f"SELECT MIN(o_orderkey), MAX(o_orderkey) FROM '{f}'"
        ).fetchone()
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next, ranges  # disjoint => footer stats prune
    # content preserved
    after = spark.read.parquet(dest)
    before = spark.read.parquet(src)
    assert after.count() == before.count()
    assert after.exceptAll(before).count() == 0


def test_max_records_per_file_caps_skew(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "capped")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = orders.count()
    cap = max(1, n // 10)
    compact_clustered(
        orders, dest, cluster_by=["o_orderkey"], n_files=1, max_records_per_file=cap
    )
    out_files = _files(dest)
    assert len(out_files) >= 10  # one range partition, but the cap splits it
    con = duckdb.connect()
    for f in out_files:
        (cnt,) = con.execute(f"SELECT COUNT(*) FROM '{f}'").fetchone()
        assert cnt <= cap


def test_zorder_bounds_both_columns(spark, sf_dir, tmp_path):
    """Z-order's pruning claim, measured on the actual footers: for a
    predicate on the SECONDARY column alone (bottom quarter of value),
    range-clustering by user_id prunes nothing — every file spans the
    full value range — while the Morton layout bounds value per file,
    so a strict minority of its files can intersect. Content identity
    under the rewrite is also asserted."""
    import glob as _glob

    import pyarrow.parquet as pq

    from pac_spark.sources.compaction import compact_clustered, compact_zordered

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    n_files = 16
    z_dir, r_dir = str(tmp_path / "z"), str(tmp_path / "r")
    compact_zordered(ev, z_dir, "user_id", "value", n_files)
    compact_clustered(ev, r_dir, ["user_id"], n_files)

    # content identity under the rewrite
    assert spark.read.parquet(z_dir).count() == ev.count()
    assert (
        spark.read.parquet(z_dir)
        .select("event_id")
        .exceptAll(ev.select("event_id"))
        .count()
        == 0
    )

    # predicate: value <= its 25th percentile (mass-based — the events
    # value column is skewed, so a range-based cut would cover most of
    # the data and prove nothing); user_id unconstrained
    [v_cut] = ev.approxQuantile("value", [0.25], 0.001)

    def files_hit(d: str) -> tuple[int, int]:
        paths = sorted(_glob.glob(f"{d}/*.parquet"))
        hit = 0
        for p in paths:
            md = pq.read_metadata(p)
            idx = md.schema.names.index("value")
            v_min = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            if v_min <= v_cut:
                hit += 1
        return hit, len(paths)

    z_hit, z_total = files_hit(z_dir)
    r_hit, r_total = files_hit(r_dir)
    assert z_total >= 8 and r_total >= 8, "layouts produced too few files"
    # range layout: every file spans the full value range -> no pruning
    assert r_hit == r_total, (r_hit, r_total)
    # Morton layout: a strict minority of files can contain low values
    assert z_hit <= z_total // 2, f"z-order pruned nothing: {z_hit}/{z_total}"


def test_clustering_depth_report_and_duckdb_mirror(spark, duck, sf_dir):
    """The depth audit quantifies zone-map quality: the range-clustered
    layout reports EXACT centi-depth 100 / max 1 on its cluster key
    (every file independently prunable) while the hash-debris
    compacted layout reports depth well above 1 on the same column;
    a DuckDB read_parquet(filename=true) mirror of the identical
    sweep-line metric agrees value-for-value."""
    import os

    from pac_spark.operators.scale import (
        _CLUSTER_FILES,
        _REPO_ROOT,
        clustering_depth_events,
    )

    rows = {
        (r["layout"], r["col"]): (
            r["n_files"],
            r["max_depth"],
            r["avg_depth_centi"],
        )
        for r in clustering_depth_events(spark, sf_dir).collect()
    }
    assert set(rows) == {
        ("compacted", "event_id"),
        ("compacted", "user_id"),
        ("range_clustered", "event_id"),
        ("range_clustered", "user_id"),
    }
    n_f, max_d, avg_c = rows[("range_clustered", "event_id")]
    assert n_f == _CLUSTER_FILES and max_d == 1 and avg_c == 100, rows
    # the non-cluster column stays unprunable
    assert rows[("range_clustered", "user_id")][1] > 1
    # the AQE-compacted copy can legitimately be ONE file at tiny SFs
    # (depth trivially 1); the debris claim is only meaningful multi-file
    if rows[("compacted", "event_id")][0] > 1:
        assert rows[("compacted", "event_id")][2] > 100

    tag = os.path.basename(str(sf_dir).rstrip("/")).replace(".", "_")
    mirror_sql = """
WITH per_file AS (
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS f,
           CAST(MIN(event_id) AS DECIMAL(38,9)) AS lo_event_id,
           CAST(MAX(event_id) AS DECIMAL(38,9)) AS hi_event_id,
           CAST(MIN(user_id) AS DECIMAL(38,9)) AS lo_user_id,
           CAST(MAX(user_id) AS DECIMAL(38,9)) AS hi_user_id
    FROM read_parquet('{d}/*.parquet', filename=true) GROUP BY 1
), intervals AS (
    SELECT f, 'event_id' AS col, lo_event_id AS lo, hi_event_id AS hi FROM per_file
    UNION ALL
    SELECT f, 'user_id', lo_user_id, hi_user_id FROM per_file
), nn AS (
    SELECT * FROM intervals WHERE lo IS NOT NULL
), ev AS (
    SELECT f, col, lo AS v, 0 AS t, 1 AS d FROM nn
    UNION ALL
    SELECT f, col, hi, 1, -1 FROM nn
), swept AS (
    SELECT f, col, t,
           SUM(d) OVER (PARTITION BY col ORDER BY v, t, f
                        ROWS UNBOUNDED PRECEDING) AS depth
    FROM ev
)
SELECT '{layout}' AS layout, col,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST((SUM(depth) * 100) // COUNT(*) AS BIGINT) AS avg_depth_centi
FROM swept WHERE t = 0 GROUP BY col
"""
    # an explicit 8-file hash layout IS debris: depth must pile up
    from pac_spark.operators.scale import clustering_depth
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        hash_dir = os.path.join(td, "hash_events")
        spark.read.parquet(f"{sf_dir}/events.parquet").repartition(8).write.parquet(
            hash_dir
        )
        debris = {
            r["col"]: (r["n_files"], r["max_depth"], r["avg_depth_centi"])
            for r in clustering_depth(spark, hash_dir, "hash", ["event_id"]).collect()
        }
        assert debris["event_id"][0] == 8
        assert debris["event_id"][1] == 8, debris  # every file overlaps
        assert debris["event_id"][2] > 100

    mirrors = []
    for layout, d in (
        ("compacted", f"{_REPO_ROOT}/spark-warehouse/pac_compact_events_{tag}"),
        ("range_clustered", f"{_REPO_ROOT}/spark-warehouse/pac_cluster_events_{tag}"),
    ):
        mirrors += duck.sql(mirror_sql.format(d=d, layout=layout)).fetchall()
    assert {(m[0], m[1]): (m[2], m[3], m[4]) for m in mirrors} == rows


def test_layout_caches_rebuild_when_source_regenerates(spark, tmp_path, monkeypatch):
    """End-to-end chaos sweep over ALL THREE layout caches (VERDICT r6
    next-#7): run bucketed / compacted / z-ordered queries against a
    private source copy, prove repeat runs serve the cached layouts
    byte-untouched, then regenerate the source parquet IN PLACE and
    prove every cache detects the fingerprint mismatch, rebuilds, and
    answers from the NEW data — the sidecar logic (ADVICE r5 #2/#3)
    integration-proven, not just unit-tested per cache."""
    import json
    import shutil

    from pyspark.sql import functions as F

    from pac_spark.functions.exact import money_sum
    from pac_spark.operators import scale

    src = tmp_path / "sfchaos"
    src.mkdir()
    for t in ("orders", "lineitem", "events"):
        shutil.copyfile(
            f"/root/testdata/sf0.001/{t}.parquet", src / f"{t}.parquet"
        )
    monkeypatch.setattr(scale, "_REPO_ROOT", str(tmp_path))
    wh = tmp_path / "spark-warehouse"
    sf_dir = str(src)

    def run_all():
        return (
            sorted(map(tuple, scale.bucketed_orders_join(spark, sf_dir).collect())),
            sorted(map(tuple, scale.compaction_roundtrip(spark, sf_dir).collect())),
            sorted(map(tuple, scale.zorder_roundtrip(spark, sf_dir).collect())),
        )

    def snapshot():
        out = {}
        for p in sorted(wh.rglob("*")):
            if p.is_file():
                st = p.stat()
                out[str(p.relative_to(wh))] = (st.st_size, st.st_mtime_ns)
        return out

    def sidecar_sources():
        return {
            str(p.parent.name): json.loads(p.read_text()).get("source")
            for p in wh.rglob("_pac_layout.json")
        }

    first = run_all()
    snap1, sides1 = snapshot(), sidecar_sources()
    assert len(sides1) == 4  # b_orders, b_lineitem, compacted, zordered

    # repeat run: cache hit — identical answers, zero bytes rewritten
    assert run_all() == first
    assert snapshot() == snap1

    # regenerate the source IN PLACE (half the rows survive)
    for t, key in (
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("events", "event_id"),
    ):
        kept = spark.read.parquet(f"{sf_dir}/{t}.parquet").filter(
            (F.col(key) % 2) == 0
        )
        staged = tmp_path / f"staged_{t}"
        kept.write.mode("overwrite").parquet(str(staged))
        (src / f"{t}.parquet").unlink()
        shutil.move(str(staged), str(src / f"{t}.parquet"))

    bucketed3, compacted3, zordered3 = run_all()
    sides3 = sidecar_sources()
    assert set(sides3) == set(sides1)
    changed = {k for k in sides1 if sides1[k] != sides3[k]}
    assert changed == set(sides1), f"stale sidecars survived: {sides1.keys() - changed}"

    # every answer now reflects the regenerated data, via plain-plan mirrors
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    want_b = sorted(
        map(
            tuple,
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_items"), money_sum(disc, scale=4).alias("revenue"))
            .orderBy("o_orderpriority")
            .collect(),
        )
    )
    assert bucketed3 == want_b and bucketed3 != first[0]
    assert sum(r[1] for r in compacted3) == events.count()
    box = F.col("user_id").between(scale._ZBOX_USER_LO, scale._ZBOX_USER_HI) & F.col(
        "value"
    ).between(scale._ZBOX_VALUE_LO, scale._ZBOX_VALUE_HI)
    assert sum(r[1] for r in zordered3) == events.filter(box).count()
