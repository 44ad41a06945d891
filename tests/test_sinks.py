"""Sink contract: keyed JSON tree with per-key subtree overwrite
(reference S6), dry-run (S9), read-back verification (S8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pac_spark.sources.sinks import json_tree_read, json_tree_write


@pytest.fixture()
def issues_df(spark, sf_dir):
    from pac_spark.operators.issues import company_issue_positions

    return company_issue_positions(spark, sf_dir).limit(50).cache()


def test_write_and_verify(spark, issues_df, tmp_path):
    report = json_tree_write(spark, issues_df, str(tmp_path / "tree"), "company_id")
    assert not report.dry_run
    assert report.verified
    assert report.rows_written == 50
    assert report.rows_read_back == 50


def test_dry_run_writes_nothing(spark, issues_df, tmp_path):
    target = tmp_path / "tree_dry"
    report = json_tree_write(spark, issues_df, str(target), "company_id", dry_run=True)
    assert report.dry_run
    assert report.preview and len(report.preview) == 3
    assert not target.exists()


def test_dynamic_partition_overwrite_per_key(spark, issues_df, tmp_path):
    """Writing a batch containing only key K must replace K's subtree
    and leave every other key untouched — the reference's set()
    semantics."""
    path = str(tmp_path / "tree_dpo")
    json_tree_write(spark, issues_df, path, "company_id")
    before = json_tree_read(spark, path)
    keys_before = {r["__key"] for r in before.select("__key").distinct().collect()}

    one_key = sorted(keys_before)[0]
    patch = (
        json_tree_read(spark, path, key=one_key)
        .drop("__key")
        .withColumn("position", F.lit("PATCHED"))
        .withColumn("company_id", F.col("company_id").cast("long"))
    )
    json_tree_write(spark, patch, path, "company_id", verify=False)

    after = json_tree_read(spark, path)
    keys_after = {r["__key"] for r in after.select("__key").distinct().collect()}
    assert keys_after == keys_before, "other subtrees must survive"
    patched = after.filter(F.col("__key") == one_key).select("position").distinct().collect()
    assert [r["position"] for r in patched] == ["PATCHED"]
    untouched = (
        after.filter(F.col("__key") != one_key)
        .filter(F.col("position") == "PATCHED")
        .count()
    )
    assert untouched == 0


def test_point_read_prunes_to_one_key(spark, issues_df, tmp_path):
    path = str(tmp_path / "tree_point")
    json_tree_write(spark, issues_df, path, "company_id", verify=False)
    any_key = json_tree_read(spark, path).select("__key").first()["__key"]
    sub = json_tree_read(spark, path, key=any_key)
    assert sub.count() > 0
    assert sub.select("__key").distinct().count() == 1
    # partition pruning must reach the file listing: the key equality
    # appears as a PartitionFilter on the JSON scan (not a post-scan
    # Filter), so only that key's directory is ever listed/read
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pruned = plan.split("PartitionFilters")[1][:200]
    assert "__key" in pruned and "PartitionFilters: []" not in "PartitionFilters" + pruned
