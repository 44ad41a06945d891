"""Source connectors (reference operators S1-S5, S10-S12).

The reference reads MySQL over an SSH tunnel with ``SELECT *`` into
pandas (index_align_to_firebase.py:130-153) — single-threaded, whole
table in driver RAM. These readers express every source as a parallel
Spark scan with pushdown:

- parquet: schema from footers, predicate/column pushdown automatic;
- CSV: explicit schema preferred (inference costs an extra pass);
- JDBC: partitioned reads via (partitionColumn, lowerBound, upperBound,
  numPartitions) so a 1e9-row table arrives as N concurrent range
  scans, not one cursor. The SSH tunnel of the reference (S4,
  index_align_to_firebase.py:53-113) is connection plumbing that lives
  outside the engine: open it on the gateway host, point the JDBC URL
  at the forwarded port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = [
    "read_parquet",
    "read_parquet_evolving",
    "read_csv",
    "read_csv_quarantine",
    "read_json",
    "read_orc",
    "read_jdbc",
    "snowflake_profile",
    "mysql_profile",
]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    """CSV scan. Pass ``schema`` in production — ``infer`` performs an
    extra full pass over the data, which at 100 TB is a second scan."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across batches with EVOLVED schemas
    (``mergeSchema``): a long-lived ingest directory accumulates files
    written months apart with columns added over time; the merged scan
    presents the union schema, with NULLs where an old file lacks a
    new column.

    Off by default in plain ``read.parquet`` for a reason — schema
    merging reads every file's footer up front, a real cost at 100 TB
    (use a table format's catalog schema there); this entry point is
    for the evolving-directory case where that cost is the point.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
):
    """CSV ingestion that never drops data silently: PERMISSIVE parse
    with corrupt-record capture, split into (good, quarantined).

    A 100 TB crawl ingest always carries malformed rows; FAILFAST
    aborts the job on the first one and DROPMALFORMED erases evidence.
    This returns the cleanly-parsed frame AND the raw text of every
    row that failed the schema, so bad rows land in a quarantine sink
    for inspection instead of vanishing.

    The parsed frame is pinned (registered persist): Spark refuses a
    filter that references only the internal corrupt-record column on
    a streaming-parse plan, and the persist also guarantees good/bad
    split from ONE parse pass rather than two.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    from pac_spark.cache import pin

    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    df = pin(
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .csv(path)
    )
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record")
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    return good, bad


def read_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar format large warehouses hand us.
    Schema from file footers; predicate pushdown and column pruning
    work exactly as for parquet (both go through the vectorized
    columnar reader)."""
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC scan (reference S1/S2 modernized).

    With a partition column each executor issues its own bounded range
    query; filters composed on the returned DataFrame push down into
    the remote WHERE clause. Exercised for real against embedded Derby
    (bundled with Spark) in ``tests/test_jdbc_roundtrip.py``: write →
    4-partition bounded-range read-back → pushdown asserted in the
    plan. A Snowflake/MySQL deployment swaps the url + driver only.
    """
    # the main load quotes the table EXACTLY like the bounds probe
    # (_quote_ident) — asymmetric quoting made auto-bounds unusable
    # for case-preserved tables: the probe resolved "MixedCase" while
    # the unquoted dbtable case-folded past it (code-review r8).
    # Spark's own JDBC writer creates quoted identifiers, and the
    # dialect quotes partitionColumn in the generated ranges, so
    # quoting here closes the loop.
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", _quote_ident(table))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            lo, hi = jdbc_partition_bounds(spark, url, table, partition_column, **options)
            lower_bound = lo if lower_bound is None else lower_bound
            upper_bound = hi if upper_bound is None else upper_bound
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def _quote_ident(name: str) -> str:
    """ANSI-quote a (possibly schema-qualified) identifier: each
    dot-separated part is double-quoted with embedded quotes doubled —
    the same treatment Spark's JDBC dialects apply when writing, so
    names round-trip case-preserved and reserved words are safe."""
    return ".".join('"' + part.replace('"', '""') + '"' for part in name.split("."))


def jdbc_partition_bounds(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    **options: str,
) -> tuple[int, int]:
    """(min, max) of ``partition_column``, fetched by ONE remote
    aggregate pushed to the database — the bounds discovery every
    partitioned ingest needs before it can split range queries, run as
    a dbtable subquery so only two values cross the wire (never rows).
    Bounds that are stale by the time the ranged read runs only skew
    partition sizes, never correctness: Spark's first and last ranges
    are unbounded (``< lower`` / ``>= upper`` rows still land there).

    Both identifiers are interpolated into the pushed-down SQL, so
    both are ANSI-quoted via ``_quote_ident`` (ADVICE r5 #5: an
    unquoted table name case-folds to a different object for mixed
    case, breaks on reserved words, and is an injection surface for
    untrusted names). ``table`` may be schema-qualified
    (``schema.table``); each part is quoted separately.
    """
    probe = (
        spark.read.format("jdbc")
        .option("url", url)
        .option(
            "dbtable",
            # quoted: Spark's JDBC writer creates case-preserved
            # (quoted) identifiers, which unquoted ones would
            # case-fold past in Derby/Postgres/Snowflake alike
            f"(SELECT MIN({_quote_ident(partition_column)}) AS lo, "
            f"MAX({_quote_ident(partition_column)}) AS hi "
            f"FROM {_quote_ident(table)}) AS bounds_probe",
        )
    )
    for k, v in options.items():
        probe = probe.option(k, v)
    row = probe.load().collect()[0]
    if row[0] is None:
        raise ValueError(f"{table}.{partition_column} has no non-null values")
    try:
        return int(row[0]), int(row[1])
    except (TypeError, ValueError) as exc:
        # Spark's JDBC partitioning also accepts date/timestamp bounds,
        # but those must be passed explicitly as strings — this probe
        # derives integer bounds only, so fail with the actual reason
        # instead of a bare int() TypeError
        raise ValueError(
            f"{table}.{partition_column} is not integer-typed "
            f"({type(row[0]).__name__}); pass lower_bound/upper_bound "
            "explicitly for date/timestamp partition columns"
        ) from exc


def snowflake_profile(
    account: str,
    user: str,
    database: str,
    schema: str = "PUBLIC",
    warehouse: str | None = None,
    role: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """JDBC option profile for a Snowflake deployment of
    :func:`read_jdbc` (the reference's primary warehouse — its
    ``ENVIRONMENT_TEMPLATE.txt:10-16`` carries exactly these account /
    database / schema / warehouse knobs).

    Returns the ``**options`` dict: pass as
    ``read_jdbc(spark, **{**snowflake_profile(...), "table": ...})``
    — or splat everything except ``url`` which ``read_jdbc`` takes
    positionally. Credentials (password / private key / OAuth token)
    are deliberately NOT parameters here: provide them via ``extra``
    from a secret store at the call site, never hardcoded.

    Pushdown notes baked into the profile: Snowflake's JDBC driver
    accepts session parameters as URL options; partitioned reads work
    unchanged (the bounds probe in :func:`jdbc_partition_bounds`
    ANSI-quotes identifiers, which matches Snowflake's case-preserving
    quoted-identifier rules). The connector jar
    (``net.snowflake:snowflake-jdbc``) ships with the cluster image —
    this container has no network, so the profile is exercised only
    for option-merging mechanics in ``tests/test_jdbc_roundtrip.py``.
    """
    url = f"jdbc:snowflake://{account}.snowflakecomputing.com/"
    opts = {
        "url": url,
        "driver": "net.snowflake.client.jdbc.SnowflakeDriver",
        "user": user,
        "db": database,
        "schema": schema,
    }
    if warehouse is not None:
        opts["warehouse"] = warehouse
    if role is not None:
        opts["role"] = role
    opts.update(extra)
    return opts


def mysql_profile(
    host: str,
    database: str,
    user: str,
    port: int = 3306,
    **extra: str,
) -> dict[str, str]:
    """JDBC option profile for a MySQL deployment (the reference
    reaches MySQL through an SSH tunnel — ``index_align_to_firebase.py
    :53-113``; in Spark the tunnel is infrastructure outside the
    engine per SURVEY §2.1, so the profile points at whatever
    host:port the tunnel or direct route exposes).

    ``rewriteBatchedStatements`` speeds any write-back path;
    ``zeroDateTimeBehavior=convertToNull`` keeps MySQL's zero-dates
    from poisoning timestamp columns. Credentials via ``extra``.
    """
    url = (
        f"jdbc:mysql://{host}:{port}/{database}"
        "?rewriteBatchedStatements=true&zeroDateTimeBehavior=convertToNull"
    )
    opts = {
        "url": url,
        "driver": "com.mysql.cj.jdbc.Driver",
        "user": user,
    }
    opts.update(extra)
    return opts
