"""Source connector contract (reference S1-S3, S10-S12): parquet /
CSV / JSON round-trips preserve schema and values; JDBC reader builds
the partitioned-scan plan options (no database server in this
container, so JDBC is signature-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pac_spark.sources.readers import read_csv, read_json, read_orc, read_parquet
from pac_spark.sources.sinks import parquet_write


@pytest.fixture()
def nation(spark, sf_dir):
    return read_parquet(spark, f"{sf_dir}/nation.parquet")


def test_parquet_roundtrip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_rt")
    parquet_write(nation, path)
    back = read_parquet(spark, path)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_parquet_partitioned_write_prunes(spark, nation, tmp_path):
    path = str(tmp_path / "nation_part")
    parquet_write(nation, path, partition_by=["n_regionkey"])
    one = read_parquet(spark, path).filter(F.col("n_regionkey") == 1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == nation.filter("n_regionkey = 1").count()
    # partition filter must prune directories, not scan-and-filter
    assert "PartitionFilters: [" in plan and "n_regionkey" in plan.split("PartitionFilters")[1][:200]


def test_csv_roundtrip_with_schema(spark, nation, tmp_path):
    path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
            StructField("n_comment", StringType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert back.count() == nation.count()
    assert dict(back.dtypes)["n_nationkey"] == "bigint"


def test_csv_infer_schema(spark, nation, tmp_path):
    path = str(tmp_path / "nation_csv2")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, infer=True)
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")


def test_json_roundtrip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").json(path)
    back = read_json(spark, path, schema=nation.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jdbc_reader_is_importable():
    from pac_spark.sources.readers import read_jdbc

    assert callable(read_jdbc)


def test_orc_roundtrip_and_pushdown(spark, nation, tmp_path):
    path = str(tmp_path / "nation_orc")
    nation.write.orc(path)
    back = read_orc(spark, path)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in nation.collect()
    )
    qe = back.filter("n_nationkey = 3")._jdf.queryExecution().toString()
    assert "PushedFilters" in qe and "PushedFilters: []" not in qe


def test_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pac_spark.sources.readers import read_csv_quarantine

    path = tmp_path / "dirty.csv"
    path.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "2,beta,not_a_number\n"   # type mismatch -> quarantine
        "3,gamma,30\n"
        "4,delta\n"               # missing column -> quarantine
        "5,epsilon,50\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("qty", LongType()),
        ]
    )
    good, bad = read_csv_quarantine(spark, str(path), schema)
    good_rows = {r["id"]: (r["name"], r["qty"]) for r in good.collect()}
    bad_rows = sorted(r["raw_record"] for r in bad.collect())
    assert good_rows == {1: ("alpha", 10), 3: ("gamma", 30), 5: ("epsilon", 50)}
    assert bad_rows == ["2,beta,not_a_number", "4,delta"]
    # nothing silently dropped: every input line is in exactly one side
    assert len(good_rows) + len(bad_rows) == 5


def test_sql_surface_matches_dataframe_plan(spark, sf_dir):
    """register_views exposes the whole catalog to spark.sql; an ANSI
    query over the views must return exactly what the DataFrame-built
    operator returns (identical Catalyst plans underneath)."""
    from pac_spark.catalog import register_views
    from pac_spark.operators.relational import q6_forecast_revenue

    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
        """
    ).collect()[0]
    df = q6_forecast_revenue(spark, sf_dir).collect()[0]
    assert sql["revenue"] == df["revenue"]
    assert sql["n_items"] == df["n_items"]


def test_parquet_schema_evolution_merges_batches(spark, tmp_path):
    """Two ingest batches written months apart with different columns:
    the merged scan presents the union schema with NULLs where the old
    batch lacks the new column, and all rows survive."""
    from pyspark.sql import functions as F

    from pac_spark.sources.readers import read_parquet_evolving

    path = str(tmp_path / "evolving")
    old = spark.range(3).select(F.col("id"), F.lit("old").alias("src"))
    new = spark.range(3, 5).select(
        F.col("id"), F.lit("new").alias("src"), F.lit(0.9).alias("quality")
    )
    old.write.mode("overwrite").parquet(path)
    new.write.mode("append").parquet(path)
    merged = read_parquet_evolving(spark, path)
    assert set(merged.columns) == {"id", "src", "quality"}
    rows = {r["id"]: (r["src"], r["quality"]) for r in merged.collect()}
    assert len(rows) == 5
    assert rows[0] == ("old", None)
    assert rows[4] == ("new", 0.9)


def test_python_datasource_reads_deterministically(spark):
    """Spark 4 Python DataSource API: registered source yields the
    same deterministic rows at any parallelism, matching a direct
    hash computation."""
    import hashlib

    from pac_spark.sources.pydatasource import SyntheticEventsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("pac_synth_events")
        .option("n_days", 4)
        .option("events_per_day", 50)
        .option("seed", 11)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 200
    assert len({r["event_id"] for r in rows}) == 200
    # value check against the documented generator for one known row
    h = int(hashlib.md5(b"11|2|7").hexdigest()[:15], 16)
    row = next(r for r in rows if r["event_id"] == 2 * 50 + 7)
    assert row["user_id"] == h % 20
    assert row["value"] == float((h >> 16) % 10_000) / 100.0
    again = spark.read.format("pac_synth_events").option("n_days", 4).option(
        "events_per_day", 50
    ).option("seed", 11).load().collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_python_datasource_pushdown_prunes_partitions(spark):
    """day_num range predicates must prune generator partitions at
    plan time (the Python-source analog of parquet partition pruning),
    and the filtered read must return exactly the surviving days."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    from pac_spark.sources.pydatasource import (
        SyntheticEventsDataSource,
        _SynthReader,
    )

    # unit level: the reader consumes range filters and narrows its plan
    r = _SynthReader({"n_days": "10", "events_per_day": "5"})
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("day_num",), 3), LessThan(("day_num",), 6)]
        )
    )
    assert leftover == []
    assert [p.day for p in r.partitions()] == [3, 4, 5]
    r2 = _SynthReader({"n_days": "10"})
    assert len(list(r2.pushFilters([EqualTo(("day_num",), 4)]))) == 0
    assert [p.day for p in r2.partitions()] == [4]

    # end to end: Spark plans the pruned read and values agree
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("pac_synth_events")
        .option("n_days", 10)
        .option("events_per_day", 20)
        .load()
        .filter((F.col("day_num") >= 3) & (F.col("day_num") < 6))
    )
    rows = df.collect()
    assert len(rows) == 60
    assert {r["day_num"] for r in rows} == {3, 4, 5}


def test_python_datasource_empty_pruned_range_returns_empty(spark):
    """Filters that prune the day range to NOTHING (beyond n_days, or
    contradictory bounds) must yield an empty result, not crash:
    partitions() returns [] and PySpark then calls read(None) with a
    sentinel partition (ADVICE r6 #1)."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from pac_spark.sources.pydatasource import (
        SyntheticEventsDataSource,
        _SynthReader,
    )

    # unit level: empty plan + sentinel read
    r = _SynthReader({"n_days": "5"})
    list(r.pushFilters([GreaterThanOrEqual(("day_num",), 5)]))
    assert r.partitions() == []
    assert list(r.read(None)) == []

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    base = (
        spark.read.format("pac_synth_events")
        .option("n_days", 5)
        .option("events_per_day", 10)
        .load()
    )
    # beyond the last day
    assert base.filter(F.col("day_num") >= 5).count() == 0
    # contradictory bounds
    assert (
        base.filter((F.col("day_num") >= 4) & (F.col("day_num") < 2)).count()
        == 0
    )
