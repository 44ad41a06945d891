"""Bucketed-layout contract: co-bucketed tables join with NO exchange
on either side; the identical unbucketed join needs two. This is the
ingest-time-shuffle trade the engine prescribes for repeated
fact-to-fact joins at scale (pac_spark/sources/bucketing.py)."""

from __future__ import annotations

import pytest

from pac_spark.sources.bucketing import ensure_bucketed, read_table, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge planning so exchange-absence is a bucketing
    effect, not a broadcast side effect."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )

    # negative control: the plain join shuffles both sides
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plain_plan

    write_bucketed(cust, "t_cust_b", str(tmp_path / "cust"), "c_custkey")
    write_bucketed(orders, "t_orders_b", str(tmp_path / "orders"), "o_custkey")
    try:
        bc = read_table(spark, "t_cust_b")
        bo = read_table(spark, "t_orders_b")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "SelectedBucketsCount" in plan  # scans are bucket-aware
        # values unaffected by layout
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_ensure_bucketed_writes_once(spark, sf_dir, tmp_path):
    """ensure_bucketed pays the ingest shuffle once: a second call with
    DIFFERENT data must be a no-op (the layout is already on disk), so
    the read still sees the first write's rows."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    try:
        ensure_bucketed(
            spark, nation, "t_ensure_b", str(tmp_path / "nat"), "n_nationkey"
        )
        first_files = sorted(p.name for p in (tmp_path / "nat").glob("*.parquet"))
        n_first = spark.table("t_ensure_b").count()
        assert n_first == nation.count()

        ensure_bucketed(
            spark,
            nation.limit(1),
            "t_ensure_b",
            str(tmp_path / "nat"),
            "n_nationkey",
        )
        assert (
            sorted(p.name for p in (tmp_path / "nat").glob("*.parquet"))
            == first_files
        ), "second ensure_bucketed rewrote the layout"
        assert spark.table("t_ensure_b").count() == n_first
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ensure_b")


def test_ensure_bucketed_recovers_from_deleted_path(spark, sf_dir, tmp_path):
    """A stale catalog entry over a deleted directory must re-ingest
    (not fail the downstream read)."""
    import shutil

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    try:
        ensure_bucketed(
            spark, nation, "t_stale_b", str(tmp_path / "st"), "n_nationkey"
        )
        shutil.rmtree(tmp_path / "st")
        ensure_bucketed(
            spark, nation, "t_stale_b", str(tmp_path / "st"), "n_nationkey"
        )
        assert spark.table("t_stale_b").count() == nation.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stale_b")


def test_ensure_bucketed_registers_existing_files_without_rewrite(spark, sf_dir, tmp_path, no_broadcast):
    """The cross-session branch: intact files + no catalog entry (a new
    session's in-memory catalog) must REGISTER the layout via DDL —
    file list unchanged — and the registered table must still plan
    bucket-aware joins."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    )
    try:
        ensure_bucketed(
            spark, orders, "t_reg_b", str(tmp_path / "reg"), "o_custkey"
        )
        files_before = sorted(p.name for p in (tmp_path / "reg").glob("*.parquet"))
        spark.sql("DROP TABLE t_reg_b")  # catalog forgets; files remain

        ensure_bucketed(
            spark, orders.limit(1), "t_reg_b", str(tmp_path / "reg"), "o_custkey"
        )
        files_after = sorted(p.name for p in (tmp_path / "reg").glob("*.parquet"))
        assert files_before == files_after, "registration rewrote the layout"
        back = spark.table("t_reg_b")
        assert back.count() == orders.count()

        # bucket metadata survived the re-registration: self-join on the
        # bucket key plans without exchanges on the bucketed side
        other = read_table(spark, "t_reg_b")
        joined = back.join(other, back.o_custkey == other.o_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_reg_b")
