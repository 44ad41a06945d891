"""JDBC connector contract, executed for real: Spark bundles Derby
(for the Hive metastore), whose embedded in-memory mode gives us an
actual JDBC database inside the test JVM. Round-trips the customer
table through it and proves the two properties the 100 TB story needs:
the read arrives as N bounded range scans (partitioned read), and
DataFrame filters reach the remote WHERE clause (pushdown)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pac_spark.sources.readers import read_jdbc

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
_URL = "jdbc:derby:memory:pacjdbc;create=true"


def test_jdbc_partitioned_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    # keep Derby's derby.log out of the repo working dir
    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    n = cust.count()
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).collect()[0]
    cust.write.mode("overwrite").jdbc(
        _URL, "CUSTOMERS", properties={"driver": _DRIVER}
    )

    back = read_jdbc(
        spark,
        _URL,
        "CUSTOMERS",
        partition_column="c_custkey",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        num_partitions=4,
        driver=_DRIVER,
    )
    # partitioned scan: one bounded range query per partition
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == n
    want = {(r["c_custkey"], r["c_name"]) for r in cust.collect()}
    got = {(r["c_custkey"], r["c_name"]) for r in back.collect()}
    assert got == want

    # predicate pushdown into the remote WHERE clause
    filtered = back.filter(F.col("c_custkey") < 100)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(c_custkey,100)" in plan
    assert filtered.count() == cust.filter(F.col("c_custkey") < 100).count()


def test_jdbc_bounds_discovered_remotely(spark, sf_dir, tmp_path):
    """Omitting lower/upper bounds must trigger the one-aggregate
    remote bounds probe (two values cross the wire, never rows) and
    still produce the partitioned, complete read."""
    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    orders.write.mode("overwrite").jdbc(
        _URL.replace("pacjdbc", "pacjdbc2"),
        "ORDERS_B",
        properties={"driver": _DRIVER},
    )
    url2 = _URL.replace("pacjdbc", "pacjdbc2")

    from pac_spark.sources.readers import jdbc_partition_bounds

    lo, hi = jdbc_partition_bounds(
        spark, url2, "ORDERS_B", "o_orderkey", driver=_DRIVER
    )
    want_lo, want_hi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    assert (lo, hi) == (int(want_lo), int(want_hi))

    back = read_jdbc(
        spark,
        url2,
        "ORDERS_B",
        partition_column="o_orderkey",
        num_partitions=4,
        driver=_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()


def test_connection_profiles_compose_with_read_jdbc(spark, sf_dir, tmp_path):
    """The Snowflake/MySQL profiles are option dicts that splat into
    read_jdbc; url shape and driver class are pinned here, and the
    merge mechanics (profile options flowing through **options) are
    exercised for real by routing a Derby read through a profile dict
    with the url/driver overridden."""
    from pac_spark.sources.readers import mysql_profile, snowflake_profile

    sf = snowflake_profile(
        "acct", "svc_user", "ANALYTICS", warehouse="WH_XL", role="REPORTER"
    )
    assert sf["url"] == "jdbc:snowflake://acct.snowflakecomputing.com/"
    assert sf["driver"] == "net.snowflake.client.jdbc.SnowflakeDriver"
    assert (sf["db"], sf["schema"], sf["warehouse"], sf["role"]) == (
        "ANALYTICS", "PUBLIC", "WH_XL", "REPORTER",
    )
    my = mysql_profile("db.internal", "crm", "svc_user")
    assert my["url"].startswith("jdbc:mysql://db.internal:3306/crm?")
    assert "rewriteBatchedStatements=true" in my["url"]
    assert my["driver"] == "com.mysql.cj.jdbc.Driver"

    # splat mechanics against the real (Derby) database: everything in
    # the dict except url is **options
    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))
    url3 = _URL.replace("pacjdbc", "pacjdbc3")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nat.write.mode("overwrite").jdbc(url3, "NATIONS", properties={"driver": _DRIVER})
    profile = {**my, "url": url3, "driver": _DRIVER}
    del profile["user"]  # Derby embedded needs no auth
    url = profile.pop("url")
    back = read_jdbc(spark, url, "NATIONS", **profile)
    assert back.count() == nat.count()
