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
