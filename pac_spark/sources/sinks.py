"""Sinks (reference operators S6-S9): keyed JSON tree with per-key
overwrite, dry-run preview, and write verification.

The reference uploads one Firebase subtree per company with ``set()``
(full overwrite of that key's subtree, one HTTP PUT per key —
index_align_to_firebase.py:462-525). The Spark restatement:

- the tree is a partitioned JSON dataset: ``/<root>/<key>=<value>/``
  holds that key's records — the filesystem IS the key-value tree;
- per-key overwrite = **dynamic partition overwrite**: writing a batch
  containing keys {A, B} replaces exactly subtrees A and B, leaving
  every other key untouched (the session sets
  ``spark.sql.sources.partitionOverwriteMode=dynamic``);
- writes stream from executors — no collect, no per-key driver loop;
  at 100 TB each partition's files are written by the tasks that own
  the data;
- dry-run (S9) previews ``limit(n)`` without writing; verification
  (S8) re-reads the sink and checks row and key counts like the
  reference's read-back (:515-517).

Key values are sanitized with the reference's rule (spaces→'_', drop
',' '.') before partitioning (executive_review_tool.py:575,581).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_spark.functions.normalize import sanitize_key

__all__ = ["WriteReport", "json_tree_write", "json_tree_read", "parquet_write"]


@dataclass(frozen=True)
class WriteReport:
    path: str
    rows_written: int
    keys_written: int
    rows_read_back: int
    keys_read_back: int
    verified: bool
    dry_run: bool
    preview: list[dict] | None = None


def json_tree_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_col: str,
    dry_run: bool = False,
    verify: bool = True,
    preview_rows: int = 3,
) -> WriteReport:
    """Write ``df`` as a keyed JSON tree under ``path``, overwriting
    only the keys present in ``df`` (dynamic partition overwrite)."""
    keyed = df.withColumn("__key", sanitize_key(F.col(key_col).cast("string")))

    if dry_run:
        sample = [r.asDict(recursive=True) for r in keyed.limit(preview_rows).collect()]
        return WriteReport(
            path=path,
            rows_written=0,
            keys_written=0,
            rows_read_back=0,
            keys_read_back=0,
            verified=False,
            dry_run=True,
            preview=sample,
        )

    n_rows = keyed.count()
    n_keys = keyed.select("__key").distinct().count()
    keyed.write.mode("overwrite").partitionBy("__key").json(path)

    rows_back = keys_back = 0
    verified = False
    if verify:
        back = spark.read.json(path)
        rows_back = back.count()
        keys_back = back.select("__key").distinct().count()
        verified = rows_back >= n_rows and keys_back >= n_keys
    return WriteReport(
        path=path,
        rows_written=n_rows,
        keys_written=n_keys,
        rows_read_back=rows_back,
        keys_read_back=keys_back,
        verified=verified,
        dry_run=False,
    )


def json_tree_read(spark: SparkSession, path: str, key: str | None = None) -> DataFrame:
    """Read the whole tree, or one key's subtree via partition pruning
    (the scan lists only that directory — the reference's point-read
    S5 without the N+1 HTTP round trips)."""
    df = spark.read.json(path)
    if key is not None:
        df = df.filter(F.col("__key") == key)
    return df


def parquet_write(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar sink; partition columns become the directory hierarchy
    that future scans prune on."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
