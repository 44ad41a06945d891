"""Data profiling: per-column summary statistics in ONE scan — the
ANALYZE/quality-report surface of the engine (the reference eyeballs
`df.head()` prints, e.g. test_index_align.py's diagnostics; this is
that need done as a distributed operator).

Shape: every column contributes (count, nulls, distinct, min, max)
aggregates to a single global aggregation — one pass over the table,
partial-aggregated map-side, no per-column jobs (``df.summary()``
similarly single-passes but drops distincts and types). The wide
1-row aggregate then unpivots JVM-side (array-of-struct → explode) to
one row per column.

``exact_distinct=True`` (default here, needed for the value-hash
oracle) uses ``countDistinct``, which rewrites the single aggregate
into Spark's expand-based multi-distinct plan — fine at fixture
scale, O(columns) data expansion. At 100 TB pass ``False`` for
``approx_count_distinct`` (HLL, one true pass, mergeable at any
partition count) — the numbers stop being oracle-exact but the plan
stops expanding.

Min/max are stringified with per-type deterministic formats (integer
micro-unit strings for doubles — printf tie-rounding differs between
engines — and an explicit timestamp pattern) rather than bare casts,
so the cross-engine comparison never hinges on an engine's float/
timestamp rendering quirks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_spark import catalog
from pac_spark.functions.exact import int_div

__all__ = [
    "profile",
    "profile_orders",
    "PROFILE_SQL",
    "RI_RELATIONSHIPS",
    "referential_integrity_report",
    "RI_SQL",
    "expectation_report",
    "expectations_orders",
    "EXPECTATIONS_SQL",
    "k_anonymity_customer_qi",
    "K_ANONYMITY_SQL",
    "benford_price_audit",
    "BENFORD_SQL",
    "BENFORD_MILLI",
    "table_fingerprint_by_nation",
    "FINGERPRINT_SQL",
    "FD_CANDIDATES",
    "fd_profile_orders",
    "FD_SQL",
]

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _fmt(col: Column, dtype: str) -> Column:
    # doubles as integer micro-unit strings, not printf: %.6f tie
    # rounding differs between Java Formatter (HALF_UP) and C printf
    # (half-even), so a dyadic-rational min/max (e.g. 2^-7) would
    # format differently per engine. ROUND(x*1e6) rounds away from
    # zero in both Spark (BigDecimal HALF_UP) and DuckDB (std::round).
    if dtype in ("double", "float"):
        return F.round(col * F.lit(10**6)).cast("long").cast("string")
    if dtype.startswith("timestamp"):
        return F.date_format(col, _TS_FMT_SPARK)
    return col.cast("string")


def _fmt_sql(name: str, dtype: str) -> str:
    if dtype in ("double", "float"):
        return f"CAST(CAST(ROUND({name} * 1000000) AS BIGINT) AS VARCHAR)"
    if dtype.startswith("timestamp"):
        return f"strftime(CAST({name} AS TIMESTAMP), '{_TS_FMT_DUCK}')"
    return f"CAST({name} AS VARCHAR)"


def profile(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max stringified so heterogeneous
    column types stack into one frame."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, t in df.dtypes:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__cnt_{c}"))
        aggs.append(
            (F.countDistinct(col) if exact_distinct else F.approx_count_distinct(col))
            .alias(f"__dst_{c}")
        )
        aggs.append(_fmt(F.min(col), t).alias(f"__min_{c}"))
        aggs.append(_fmt(F.max(col), t).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(t).alias("dtype"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_nulls"),
                F.col(f"__dst_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c, t in df.dtypes
        ]
    )
    return (
        wide.select(F.explode(per_col).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: profile the ``orders`` table.

    Uses the ``exact_distinct=True`` default because this row is
    value-hash-checked against the oracle; a 100 TB ANALYZE run passes
    ``exact_distinct=False`` to swap each COUNT(DISTINCT) for the
    fixed-memory ``approx_count_distinct`` sketch (VERDICT r4 #4)."""
    return profile(catalog.load(spark, sf_dir, "orders"))


def PROFILE_SQL(table: str, columns: list[tuple[str, str]]) -> str:
    """DuckDB oracle mirroring :func:`profile` over ``table`` with
    ``columns`` = [(name, spark_dtype_string), ...] — same per-type
    min/max formatting as the Spark side."""
    selects = []
    for c, t in columns:
        selects.append(
            f"""SELECT '{c}' AS "column", '{t}' AS dtype,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {_fmt_sql(f'MIN({c})', t)} AS min_value,
       {_fmt_sql(f'MAX({c})', t)} AS max_value
FROM {table}"""
        )
    union = "\nUNION ALL\n".join(selects)
    return f'SELECT * FROM ({union}) ORDER BY "column"'


# (parent table, parent key, child table, child key) relationships of
# the TPC-H-ish star schema the engine serves
RI_RELATIONSHIPS = (
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("supplier", "s_suppkey", "lineitem", "l_suppkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("region", "r_regionkey", "nation", "n_regionkey"),
)


def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit across the star schema: for every declared
    parent→child relationship, the child row count, the number of
    orphaned child rows (key not present in the parent, NULLs counted
    separately), and a pass flag — the data-quality gate a warehouse
    runs after every load.

    Scale shape per relationship: ONE left join from the child to the
    parent's distinct keys plus conditional counts — dimension parents
    broadcast, the one fact-fact pair (orders←lineitem) plans as a
    shuffled join on the key. Fully declarative: the six 1-row
    aggregates union JVM-side, no driver-side counting anywhere."""
    reports = []
    for parent, pkey, child, ckey in RI_RELATIONSHIPS:
        p = catalog.load(spark, sf_dir, parent).select(pkey).distinct()
        c = catalog.load(spark, sf_dir, child).select(ckey)
        joined = c.join(p, c[ckey] == p[pkey], "left")
        is_null_key = c[ckey].isNull()
        is_orphan = c[ckey].isNotNull() & p[pkey].isNull()
        reports.append(
            joined.agg(
                F.lit(f"{child}.{ckey}").alias("fk"),
                F.lit(f"{parent}.{pkey}").alias("references"),
                F.count(F.lit(1)).alias("n_child_rows"),
                F.sum(is_null_key.cast("long")).alias("n_null_keys"),
                F.sum(is_orphan.cast("long")).alias("n_orphans"),
            ).withColumn(
                "ok", (F.col("n_orphans") == 0) & (F.col("n_null_keys") == 0)
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("fk")


def RI_SQL() -> str:
    """DuckDB oracle: the same per-relationship audit unioned."""
    selects = []
    for parent, pkey, child, ckey in RI_RELATIONSHIPS:
        selects.append(
            f"""SELECT '{child}.{ckey}' AS fk,
       '{parent}.{pkey}' AS "references",
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(SUM(CASE WHEN c.{ckey} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_keys,
       CAST(SUM(CASE WHEN c.{ckey} IS NOT NULL AND p.{pkey} IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       (SUM(CASE WHEN c.{ckey} IS NOT NULL AND p.{pkey} IS NULL
                 THEN 1 ELSE 0 END) = 0
        AND SUM(CASE WHEN c.{ckey} IS NULL THEN 1 ELSE 0 END) = 0) AS ok
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pkey} FROM {parent}) p ON c.{ckey} = p.{pkey}"""
        )
    union = "\nUNION ALL\n".join(selects)
    return f"SELECT * FROM ({union}) ORDER BY fk"


# ---------------------------------------------------------------------------
# Declarative expectations (deequ-style data-quality gate)

def expectation_report(df: DataFrame, rules: list[tuple[str, object]]) -> DataFrame:
    """Compile a declarative rule list into ONE aggregate pass and
    report per-rule violations — the deequ/Great-Expectations-style
    gate a pipeline runs before publishing a table, as an engine
    primitive.

    ``rules`` is a list of ``(name, spec)`` where spec is either a
    boolean Column (rows violating = rows where the predicate is not
    TRUE — a NULL predicate counts as a violation, so ``col > 0``
    catches NULLs without a separate rule) or the string marker
    ``"unique:<col>"`` (violations = rows beyond the first of each
    value, computed as ``count - count_distinct`` in the same
    aggregate — no self-join, no window).

    Plan shape: every rule folds into one map-side-combined aggregate
    over a single scan; the per-rule output rows are an unpivot
    (``stack``) of that 1-row frame. Adding a rule never adds a scan.
    """
    n_col = F.count(F.lit(1)).alias("__n")
    aggs, names = [n_col], []
    for i, (name, spec) in enumerate(rules):
        names.append(name)
        if isinstance(spec, str) and spec.startswith("unique:"):
            col = spec.split(":", 1)[1]
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col))).alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(spec, F.lit(0)).otherwise(F.lit(1)))
                .cast("long")
                .alias(f"__v{i}")
            )
    one = df.agg(*aggs)
    # the unpivot is built from TYPED literals (explode of an array of
    # structs), never a stack() SQL string — a rule name containing a
    # quote would break (or inject into) F.expr parsing (code-review
    # r8); the physical shape is identical (one generator over the
    # 1-row aggregate)
    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("rule"),
                    F.col(f"__v{i}").alias("violations"),
                )
                for i, n in enumerate(names)
            ]
        )
    ).alias("kv")
    return (
        one.select(kv, F.col("__n").alias("n_rows"))
        .select(
            F.col("kv.rule").alias("rule"),
            "n_rows",
            F.col("kv.violations").alias("violations"),
            (F.col("kv.violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


def expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the declarative gate over ``orders``."""
    o = catalog.load(spark, sf_dir, "orders")
    rules = [
        ("accepted_values:o_orderstatus", F.col("o_orderstatus").isin("O", "F", "P")),
        ("not_null:o_custkey", F.col("o_custkey").isNotNull()),
        ("not_null:o_orderdate", F.col("o_orderdate").isNotNull()),
        ("range:o_totalprice_positive", F.col("o_totalprice") > 0),
        ("unique:o_orderkey", "unique:o_orderkey"),
    ]
    return expectation_report(o, rules)


def EXPECTATIONS_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py).
    Each rule restated as the same not-TRUE violation count over one
    aggregate; NULL predicates count as violations on both engines
    (CASE WHEN p THEN 0 ELSE 1 END)."""
    return """
WITH agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS v_status,
           CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_custkey,
           CAST(SUM(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_orderdate,
           CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_price,
           CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_unique
    FROM orders
)
SELECT rule, n_rows, violations, violations = 0 AS passed
FROM (
    SELECT 'accepted_values:o_orderstatus' AS rule, n_rows, v_status AS violations FROM agg
    UNION ALL SELECT 'not_null:o_custkey', n_rows, v_custkey FROM agg
    UNION ALL SELECT 'not_null:o_orderdate', n_rows, v_orderdate FROM agg
    UNION ALL SELECT 'range:o_totalprice_positive', n_rows, v_price FROM agg
    UNION ALL SELECT 'unique:o_orderkey', n_rows, v_unique FROM agg
)
ORDER BY rule
"""


# ---------------------------------------------------------------------------
# Privacy governance: k-anonymity / l-diversity audit

K_THRESHOLD = 5
L_THRESHOLD = 3
BAND_CENTS = 100_000  # sensitive attribute banded to $1000 buckets


def k_anonymity_customer_qi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit before a dataset release: treat
    (nation, market segment) as the quasi-identifier and the account
    balance (banded to $1000) as the sensitive attribute, and report
    per QI-group size (k-anonymity) and sensitive-value diversity
    (l-diversity) with pass flags at the house thresholds (k>=5,
    l>=3). Groups failing either flag are the re-identification /
    attribute-disclosure risk surface Sweeney's k-anonymity and
    Machanavajjhala's l-diversity measure.

    One map-side-combined aggregate over the QI keys; the exact
    distinct-band count rewrites to Spark's expand-based distinct
    plan (same trade as ``profile`` — swap to approx_count_distinct
    past oracle scale). Banding is exact integer arithmetic: balances
    to cents, shifted non-negative (TPC-H balances start at -999.99)
    so the shared ``int_div`` contract holds on both engines.
    """
    cust = catalog.load(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long") + F.lit(BAND_CENTS)
    band = int_div(cents, F.lit(BAND_CENTS))
    return (
        cust.select("c_nationkey", "c_mktsegment", band.alias("band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_n"),
            F.countDistinct("band").alias("l_distinct_bands"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_n",
            "l_distinct_bands",
            (F.col("group_n") >= K_THRESHOLD).alias("meets_k5"),
            (F.col("l_distinct_bands") >= L_THRESHOLD).alias("meets_l3"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


def K_ANONYMITY_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return f"""
WITH banded AS (
    SELECT c_nationkey, c_mktsegment,
           (CAST(ROUND(c_acctbal * 100) AS BIGINT) + {BAND_CENTS})
               // {BAND_CENTS} AS band
    FROM customer
)
SELECT c_nationkey, c_mktsegment,
       COUNT(*) AS group_n,
       COUNT(DISTINCT band) AS l_distinct_bands,
       COUNT(*) >= {K_THRESHOLD} AS meets_k5,
       COUNT(DISTINCT band) >= {L_THRESHOLD} AS meets_l3
FROM banded
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud / data-fabrication screen)

# P(first digit = d) = log10(1 + 1/d), in exact milli-probabilities
BENFORD_MILLI = [301, 176, 125, 97, 79, 67, 58, 51, 46]


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals — the classic forensic
    screen for fabricated or truncated numeric data: the first
    significant digit of naturally-grown amounts follows
    P(d) = log10(1 + 1/d), and a per-digit chi-square contribution
    table shows exactly where a corpus bends away from it.

    Exactness: the first digit comes from the integer cents rendered
    as a string (never float formatting); expected counts stay in
    exact integer MILLI-probability space (Σ = 1000, so expected
    milli-count = n·p_milli is an integer), and each chi-square cell
    is ONE double division of two exact integers —
    (1000·obs − n·p)² / (1000·n·p) — identical text on both engines.
    Digits with zero observations still report (the digit spine is a
    literal 1..9 frame), because a MISSING digit is the loudest
    Benford violation of all. One map-side-combined aggregate over
    the scan; the 9-row spine join is a broadcast.
    """
    ob = catalog.load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    counts = (
        ob.where(F.col("cents") > 0)
        .select(F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spine = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(
            F.array([F.lit(m) for m in BENFORD_MILLI]), F.col("id").cast("int")
        ).cast("long").alias("p_milli"),
    )
    total = counts.agg(F.sum("n_obs").alias("n"))
    j = (
        spine.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            (F.col("n") * F.col("p_milli")).alias("expected_milli"),
            "n",
            "p_milli",
        )
    )
    # the deviation is squared in DOUBLE: dev can reach ~954*n, so a
    # BIGINT square overflows past ~3.2M rows on strongly non-Benford
    # data — exactly the tables this audit exists to flag (ANSI mode
    # would throw). The result feeds a double division anyway; the
    # oracle mirrors the same cast-before-square (code-review r8).
    dev = (F.col("n_obs") * 1000 - F.col("n") * F.col("p_milli")).cast("double")
    chi = (dev * dev) / (
        F.lit(1000.0) * F.col("n").cast("double") * F.col("p_milli").cast("double")
    )
    return j.select(
        "digit", "n_obs", "expected_milli", chi.alias("chi2_contrib")
    ).orderBy("digit")


def BENFORD_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    milli_rows = ", ".join(f"({d + 1}, {m})" for d, m in enumerate(BENFORD_MILLI))
    return f"""
WITH c AS (
    SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INT) AS digit,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM orders
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 0
    GROUP BY 1
),
spine(digit, p_milli) AS (VALUES {milli_rows}),
t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c),
j AS (
    SELECT s.digit,
           CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(t.n * s.p_milli AS BIGINT) AS expected_milli,
           t.n AS n, CAST(s.p_milli AS BIGINT) AS p_milli
    FROM spine s LEFT JOIN c ON s.digit = c.digit CROSS JOIN t
)
SELECT digit, n_obs, expected_milli,
       (CAST(n_obs * 1000 - n * p_milli AS DOUBLE)
        * CAST(n_obs * 1000 - n * p_milli AS DOUBLE))
       / (1000.0 * CAST(n AS DOUBLE) * CAST(p_milli AS DOUBLE)) AS chi2_contrib
FROM j ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Content fingerprint (order-independent integrity checksum)

def table_fingerprint_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident content checksum of the customer table, one row
    per nation: SUM of each row's 60-bit md5 over a canonical
    serialization. Integer addition commutes, so the checksum is
    independent of row order, partitioning, file layout, and merge
    tree — two replicas (or a pre/post-compaction pair, or a JDBC
    copy) agree iff their CONTENT agrees, compared without sorting a
    byte. This is the first-class form of the identity proofs the
    compaction and upsert sinks run internally.

    The serialization pins every cross-engine rendering hazard the
    profile operator already solved: doubles as integer cents (never
    printf), explicit '|' field order, NULLs as a sentinel. Checksums
    accumulate in decimal(38,0) — 2^60 per row keeps exact headroom
    past 10¹⁸ rows per group.
    """
    from pac_spark.functions.hashing import md5_u60

    cust = catalog.load(spark, sf_dir, "customer")
    # EVERY nullable field carries the explicit sentinel: concat_ws
    # silently SKIPS a NULL element (ambiguous serialization, row
    # still hashed) while the oracle's || nulls the whole string (row
    # silently UNHASHED) — only a per-field COALESCE renders the same
    # bytes in both engines
    ser = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.coalesce(F.col("c_name"), F.lit("<null>")),
        F.col("c_nationkey").cast("string"),
        F.coalesce(
            F.round(F.col("c_acctbal") * 100).cast("long").cast("string"),
            F.lit("<null>"),
        ),
        F.coalesce(F.col("c_mktsegment"), F.lit("<null>")),
    )
    return (
        cust.select("c_nationkey", md5_u60(ser).alias("h"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # published mod 2^63: the exact decimal sum reduced to a
            # BIGINT residue (modular addition still commutes, so the
            # order/partition independence is untouched — and neither
            # pandas nor a JDBC reader mangles a 38-digit value)
            (
                F.sum(F.col("h").cast("decimal(38,0)"))
                % F.expr(f"CAST('{2**63}' AS DECIMAL(38,0))")
            )
            .cast("long")
            .alias("checksum"),
        )
        .orderBy("c_nationkey")
    )


def FINGERPRINT_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    from pac_spark.functions.hashing import md5_u60_sql

    ser = (
        "CAST(c_custkey AS VARCHAR) || '|' || COALESCE(c_name, '<null>')"
        " || '|' || CAST(c_nationkey AS VARCHAR)"
        " || '|' || COALESCE("
        "CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR), '<null>')"
        " || '|' || COALESCE(c_mktsegment, '<null>')"
    )
    return f"""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST({md5_u60_sql(f"({ser})")} AS HUGEINT))
            % 9223372036854775808 AS BIGINT) AS checksum
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Functional-dependency profiling (approximate-FD discovery readout)

# Candidate dependencies audited over orders: a true key FD, two
# plausible-but-false business rules, and a date→priority rule —
# the mix a schema-inference pass would propose for human review.
FD_CANDIDATES = [
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderstatus"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderdate", "o_orderpriority"),
]


def fd_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each declared candidate
    ``lhs → rhs``, how close the table comes to satisfying it — the
    Metanome/TANE-style profiling readout that tells a pipeline which
    "obvious" invariants actually hold before they get baked into
    MERGE keys or dedup rules.

    Per FD (all exact integers):
    - ``n_groups``: distinct lhs values;
    - ``n_violating_groups``: lhs values mapping to >1 distinct rhs;
    - ``g3_rows_to_remove``: the classic g3 error — the minimum rows
      whose deletion makes the FD hold (rows − Σ per-group majority
      count);
    - ``holds``: zero violations.

    Plan shape per FD: groupBy(lhs, rhs) count, then groupBy(lhs)
    fusing (Σcnt, max cnt, count distinct-by-construction rhs), then a
    1-row readout — two map-side-combined shuffles on the FD's own
    keys, over ONE pinned projection of the table (four FDs ≠ four
    scans). No window, no expand, no driver loop over data (the loop
    is over the four DECLARED rules, each a tiny plan).
    """
    from pac_spark.cache import pin

    cols = sorted({c for fd in FD_CANDIDATES for c in fd})
    base = pin(
        catalog.load(spark, sf_dir, "orders").select(
            *[
                F.date_format(c, _TS_FMT_SPARK).alias(c)
                if c == "o_orderdate"
                else F.col(c)
                for c in cols
            ]
        )
    )
    outs = []
    for lhs, rhs in FD_CANDIDATES:
        per_pair = base.groupBy(lhs, rhs).agg(F.count(F.lit(1)).alias("cnt"))
        per_lhs = per_pair.groupBy(lhs).agg(
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
            F.count(F.lit(1)).alias("n_rhs"),
        )
        outs.append(
            per_lhs.agg(
                F.lit(f"{lhs} -> {rhs}").alias("fd"),
                F.sum("n_rows").alias("n_rows"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum((F.col("n_rhs") > 1).cast("long")).alias(
                    "n_violating_groups"
                ),
                (F.sum("n_rows") - F.sum("max_cnt")).alias("g3_rows_to_remove"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "*", (F.col("n_violating_groups") == 0).alias("holds")
    ).orderBy("fd")


def FD_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    parts = []
    for lhs, rhs in FD_CANDIDATES:
        lhs_expr = (
            f"strftime({lhs}, '{_TS_FMT_DUCK}')" if lhs == "o_orderdate" else lhs
        )
        parts.append(f"""
SELECT '{lhs} -> {rhs}' AS fd,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_groups,
       CAST(SUM(n_rows) - SUM(max_cnt) AS BIGINT) AS g3_rows_to_remove,
       SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (
    SELECT {lhs} AS l,
           SUM(cnt) AS n_rows, MAX(cnt) AS max_cnt, COUNT(*) AS n_rhs
    FROM (
        SELECT {lhs_expr} AS {lhs}, {rhs}, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    ) GROUP BY 1
)""")
    return " UNION ALL ".join(parts) + " ORDER BY fd"
