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

__all__ = [
    "WriteReport",
    "json_tree_write",
    "json_tree_read",
    "parquet_write",
    "UpsertTable",
]


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
    from pac_spark.cache import pin

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

    # pinned: the keyed frame drives THREE actions (row count, key
    # count, the write itself) — unpinned, an expensive upstream
    # lineage executes three times, and a non-deterministic input
    # could make the reported counts disagree with what was written
    # (code-review r8)
    keyed = pin(keyed)
    n_rows = keyed.count()
    n_keys = keyed.select("__key").distinct().count()
    # the per-key-overwrite contract must not depend on session conf:
    # an externally built session (the driver path — tune_runtime does
    # not set partitionOverwriteMode) would otherwise STATIC-overwrite
    # and wipe every key not present in this batch (code-review r8) —
    # the writer-level option pins dynamic mode per write
    (
        keyed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__key")
        .json(path)
    )

    rows_back = keys_back = 0
    verified = False
    if verify and n_rows > 0:
        # guarded on n_rows: a data-less tree (legal no-op write, e.g.
        # an empty first foreachBatch) has no files for read.json to
        # infer a schema from and would raise (code-review r8)
        back = spark.read.json(path)
        rows_back = back.count()
        keys_back = back.select("__key").distinct().count()
        verified = rows_back >= n_rows and keys_back >= n_keys
    elif verify:
        verified = True  # nothing was asked to be written
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


# ---------------------------------------------------------------------------
# Idempotent keyed upsert sink (versioned snapshots + commit ledger)


class UpsertTable:
    """A keyed parquet table maintained by idempotent batch upserts —
    the exactly-once sink contract ``foreachBatch`` needs (Structured
    Streaming replays a failed micro-batch with the SAME batch_id and
    data; the sink must absorb the replay), provided without a lake
    format, with the same commit protocol a lake format uses:

    - every upsert writes a brand-new immutable snapshot directory
      ``v{n}`` (never mutates the current one);
    - a commit marker ``_commits/{n}.json`` recording the batch id is
      written LAST — the marker is the commit point, so a crash
      between data write and marker leaves an orphan directory that
      every reader and the recovery path ignore;
    - replaying an already-committed batch id is a metadata no-op
      (the ledger answers without touching data);
    - ``read(version=...)`` time-travels to any committed snapshot.

    Scale: the merge is ONE left-anti shuffle on the key (current
    snapshot vs the batch's keys) plus an append of the batch rows —
    unmatched rows pass through untouched; pair with the bucketed
    layout to plan it exchange-free. Within a batch, last-wins per key
    under the caller's ``order_col``; ties on (key, order_col) break
    on the remaining columns (name-sorted, descending), so the winner
    is a deterministic function of the row values across retries and
    shuffles even for duplicate-timestamp input (exact duplicate ROWS
    are interchangeable either way). The ledger
    is O(versions) tiny JSON files;
    compaction of old snapshots is a deployment-policy deletion of
    ``v{k}`` dirs below the retention horizon (their markers say so).
    """

    def __init__(
        self, spark: SparkSession, path: str, key: str, order_col: str
    ) -> None:
        import os

        self.spark = spark
        self.path = path
        self.key = key
        self.order_col = order_col
        os.makedirs(os.path.join(path, "_commits"), exist_ok=True)

    # -- ledger ------------------------------------------------------------
    def _commits(self) -> dict[int, str]:
        import json
        import os

        out: dict[int, str] = {}
        cdir = os.path.join(self.path, "_commits")
        for name in os.listdir(cdir):
            if not name.endswith(".json"):
                continue
            stem = name[:-5]
            if not stem.isdigit():
                continue  # foreign file in _commits — not a marker
            try:
                with open(os.path.join(cdir, name)) as fh:
                    out[int(stem)] = json.load(fh)["batch_id"]
            except (json.JSONDecodeError, KeyError, OSError):
                # a truncated/corrupt marker is an UNCOMMITTED version
                # (the tmp+rename in upsert makes this near-impossible,
                # but a half-written marker must degrade to "that
                # version never committed", not brick every read
                # forever — code-review r8)
                continue
        return out

    def versions(self) -> list[int]:
        return sorted(self._commits())

    def committed_batch_ids(self) -> set[str]:
        return set(self._commits().values())

    # -- io ----------------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        commits = self._commits()
        if version is None:
            version = max(commits, default=None)
        if version is None:
            raise FileNotFoundError(f"{self.path}: no committed version")
        if version not in commits:
            raise FileNotFoundError(f"{self.path}: v{version} never committed")
        import os

        return self.spark.read.parquet(os.path.join(self.path, f"v{version}"))

    def upsert(self, batch_df: DataFrame, batch_id: int | str) -> bool:
        """Apply one batch; returns False (no-op) on a replayed id."""
        import json
        import os

        from pyspark.sql.window import Window as W

        commits = self._commits()
        if str(batch_id) in set(commits.values()):
            return False
        # inside a per-key partition the key itself cannot break ties,
        # so duplicate (key, order_col) rows need a real secondary
        # order: every column, name-sorted, descending — a total order
        # over the row VALUES, so the elected winner is deterministic
        # across retries/shuffles. (A hash tie-break is NOT enough:
        # xxhash64 skips NULL inputs, so rows with the same non-null
        # values permuted across columns would collide.) Exact
        # duplicate rows remain interchangeable, which is harmless.
        w = W.partitionBy(self.key).orderBy(
            F.desc(self.order_col),
            *[F.desc(c) for c in sorted(batch_df.columns)],
        )
        dedup = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        current = max(commits, default=None)
        if current is None:
            merged = dedup
            version = 0
        else:
            base = self.read(current)
            # NULL-SAFE anti-join: a plain key equi-anti-join never
            # matches NULL, so a null-key row would append every batch
            # and never replace — inconsistent with the in-batch dedup
            # window, which groups all NULLs as one key (code-review
            # r8). <=> makes NULL a real (single) key under the same
            # last-wins contract.
            merged = base.join(
                dedup.select(F.col(self.key).alias("__upsert_k")),
                F.col(self.key).eqNullSafe(F.col("__upsert_k")),
                "left_anti",
            ).unionByName(dedup)
            version = current + 1
        target = os.path.join(self.path, f"v{version}")
        merged.write.mode("overwrite").parquet(target)
        # marker LAST, via tmp + atomic rename: the rename is the
        # commit point, so a crash mid-write leaves a .tmp file no
        # reader parses — never a truncated marker (code-review r8)
        marker = os.path.join(self.path, "_commits", f"{version}.json")
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": str(batch_id), "version": version}, fh)
        os.replace(tmp, marker)
        return True

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch(...)``."""

        def _apply(batch_df: DataFrame, batch_id: int) -> None:
            self.upsert(batch_df, batch_id)

        return _apply
