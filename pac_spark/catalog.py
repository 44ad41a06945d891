"""Table catalog over the driver-provided parquet testdata.

Mirrors the reference's runtime schema discovery (SHOW COLUMNS,
index_align_to_firebase.py:115-128; table-name probing,
executive_review_tool.py:113-138) with Spark's native equivalents:
parquet footers give the schema for free, and :func:`resolve_table`
probes candidate table names the way the reference probes
``executives/executive/execs/exec``.

At 100 TB each of these tables would be a partitioned/bucketed parquet
dataset rather than a single file; ``load`` takes any path Spark can
scan in parallel, so nothing here assumes single-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "TABLES",
    "load",
    "load_all",
    "normalize_events_ts",
    "register_views",
    "resolve_table",
    "table_path",
]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    """Filesystem path of one table's parquet data — the unit the
    derived-layout caches fingerprint for staleness."""
    return os.path.join(sf_dir, f"{name}.parquet")


def _guard_snapshot(path: str) -> None:
    """Arm the stale-cache guard for ``path`` (ADVICE r8): the shared
    metadata fingerprint (``sources.layout_cache.source_fingerprint``
    — ONE fingerprinting semantics repo-wide, code-review r9) recorded
    per load; if the same path's fingerprint CHANGES while a pinned
    frame reading it is live, ``cache.guard_source_snapshot`` raises
    instead of letting Spark's plan-keyed cache serve the pre-rewrite
    snapshot. A missing path is left for spark.read to report with its
    own error."""
    from pac_spark.cache import guard_source_snapshot
    from pac_spark.sources.layout_cache import source_fingerprint

    try:
        fp = source_fingerprint(path)
    except OSError:
        return
    guard_source_snapshot(path, fp)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown reach the
    parquet reader automatically because callers express plans
    declaratively on the returned DataFrame.

    The ``events`` table's ``ts`` physical type has varied across
    testdata generations — parquet TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects; ``spark.sql.legacy.parquet.nanosAsLong``
    scans it as raw nanos) and TIMESTAMP(MICROS) with
    isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ, a type
    ``unix_micros``/``window`` reject). Both are normalized here to a
    microsecond TimestampType; the session timezone is UTC, so the
    NTZ→LTZ cast is wall-clock-identical to DuckDB's
    ``CAST(ts AS TIMESTAMP)``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    path = table_path(sf_dir, name)
    _guard_snapshot(path)
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_events_ts(df)
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def normalize_events_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events table's ``ts`` physical-type drift to a
    microsecond TimestampType — ONE definition shared by the batch
    scan (:func:`load`) and the streaming source
    (``streaming.stream_exec.stream_events``), so the nanos-as-bigint
    div-1000 logic can never drift between them (code-review r7).
    Integer division: double math would lose precision on 1e18 nanos.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    t = df.schema[col].dataType
    if isinstance(t, LongType):  # parquet TIMESTAMP(NANOS) as raw nanos
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(t, TimestampNTZType):  # MICROS w/o UTC flag; session tz UTC
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can use
    ``spark.sql`` — the SQL and DataFrame APIs produce identical
    Catalyst plans."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def resolve_table(
    spark: SparkSession, sf_dir: str, candidates: list[str]
) -> tuple[str, DataFrame]:
    """Probe candidate table names and scan the first that exists.

    Spark-native analog of the reference's ``SHOW TABLES LIKE`` loop
    (executive_review_tool.py:118-127). Resolution goes through
    :func:`load`, not a raw parquet read, so a resolved ``events``
    table gets the same ts/NTZ normalization every other scan gets —
    a raw read would hand back nanos-as-BIGINT or NTZ columns that
    ``window``/``unix_micros`` reject, re-opening the drift
    ``normalize_events_ts`` was centralized to close (code-review r8).
    """
    for name in candidates:
        # existence probe via the Hadoop FS API, not os.path — the
        # module contract says sf_dir may be any URI Spark can scan
        # (s3://, hdfs://); a local-only probe would refuse tables
        # load() itself reads fine
        if _exists(spark, table_path(sf_dir, name)):
            return name, load(spark, sf_dir, name)
    raise FileNotFoundError(f"none of {candidates} exist under {sf_dir}")


def _exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on whatever filesystem owns it,
    resolved through Spark's Hadoop configuration (local paths, s3a,
    hdfs alike)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))
