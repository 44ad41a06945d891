"""Snapshot diffing / CDC: the slowly-changing-dimension maintenance
operator (detect inserts / deletes / updates between two snapshots of
a keyed table) every warehouse pipeline runs on dimension loads. The
reference's sink rewrites whole subtrees per run (its Firebase set()
overwrite, ``index_align_to_firebase.py:499-500``) precisely because
it lacks this; with a diff, only changed keys need writing.

The driver testdata ships one snapshot, so the "old" side is derived
from the current ``customer`` table by a deterministic transform both
engines replay identically: keys ≡0 (mod ``MOD_INSERT``) are removed
from old (→ inserts), balances of keys ≡0 (mod ``MOD_UPDATE``) are
shifted (→ updates), and keys ≡0 (mod ``MOD_DELETE``) are mirrored to
a synthetic high key-range present only in old (→ deletes). The diff
logic itself is snapshot-agnostic: :func:`snapshot_diff` takes any two
frames sharing a key.

Scale shape: one full-outer sort-merge join on the key, null-safe
column comparisons (``<=>``), change rows only — no collect, no
windows; exactly the plan you'd run nightly on a billion-row dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_spark import catalog

__all__ = [
    "snapshot_diff",
    "merge_changeset",
    "scd2_customer_diff",
    "SCD2_SQL",
    "maintain_sum_count",
    "ivm_nation_balance",
]

MOD_UPDATE = 7
MOD_INSERT = 11
MOD_DELETE = 13
GHOST_OFFSET = 10**7  # synthetic delete keys live far above real keys

_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Rows that changed between two snapshots sharing ``key``:
    (key, change_type ∈ insert|delete|update, per-side payloads)."""
    cols = [c for c in new.columns if c != key]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    differs = None
    for c in cols:
        d = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{key}").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            change.alias("change_type"),
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in cols],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in cols],
        )
        .filter(F.col("change_type") != "unchanged")
        .orderBy(key)
    )


def _old_snapshot(new: DataFrame) -> DataFrame:
    key = F.col("c_custkey")
    base = new.filter(key % MOD_INSERT != 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(key % MOD_UPDATE == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    ghosts = new.filter(key % MOD_DELETE == 0).select(
        (key + GHOST_OFFSET).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    return base.unionByName(ghosts)


def scd2_customer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: diff the derived old snapshot against the
    current ``customer`` table.

    The ghost-key construction assumes real keys stay below
    GHOST_OFFSET (true through SF ~66: max c_custkey = 150000·SF); a
    collision would silently misclassify deletes as updates, so the
    assumption is enforced with a runtime assert_true on the real key
    maximum rather than trusted."""
    new = catalog.load(spark, sf_dir, "customer").select(*_COLS)
    bound = new.agg(F.max("c_custkey").alias("_max_key"))
    new = (
        new.join(F.broadcast(bound))
        .filter(
            F.assert_true(
                F.col("_max_key") < GHOST_OFFSET,
                F.lit(f"c_custkey reached GHOST_OFFSET={GHOST_OFFSET}; raise it"),
            ).isNull()
        )
        .drop("_max_key")
    )
    return snapshot_diff(_old_snapshot(new), new, "c_custkey")


def SCD2_SQL() -> str:
    cols = [c for c in _COLS if c != "c_custkey"]
    differs = " OR ".join(
        f"(o.{c} IS DISTINCT FROM n.{c})" for c in cols
    )
    old_cols = ", ".join(f"o.{c} AS old_{c}" for c in cols)
    new_cols = ", ".join(f"n.{c} AS new_{c}" for c in cols)
    return f"""
WITH newc AS (SELECT {", ".join(_COLS)} FROM customer),
old_base AS (
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % {MOD_UPDATE} = 0 THEN c_acctbal + 100.0
                ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM newc WHERE c_custkey % {MOD_INSERT} <> 0
),
ghosts AS (
    SELECT c_custkey + {GHOST_OFFSET} AS c_custkey, c_name, c_nationkey,
           c_acctbal, c_mktsegment
    FROM newc WHERE c_custkey % {MOD_DELETE} = 0
),
oldc AS (SELECT * FROM old_base UNION ALL SELECT * FROM ghosts),
d AS (
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                WHEN {differs} THEN 'update'
                ELSE 'unchanged' END AS change_type,
           {old_cols}, {new_cols}
    FROM oldc o FULL JOIN newc n ON o.c_custkey = n.c_custkey
)
SELECT * FROM d WHERE change_type <> 'unchanged' ORDER BY c_custkey
"""


def merge_changeset(
    base: DataFrame, changes: DataFrame, key: str, op_col: str = "change_type"
) -> DataFrame:
    """Apply a changeset (the other half of CDC — :func:`snapshot_diff`
    produces one, this consumes one): MERGE semantics without a lake
    format. ``changes`` carries ``key``, ``op_col`` ∈ insert | update
    | delete, and the new payload columns; the result is ``base`` with
    deletes removed, updates replaced, inserts appended.

    One full-outer join on the key — the same single-shuffle plan as
    the diff, which is what makes nightly upsert-into-a-billion-row
    dimension viable without rewriting unmatched rows' values (they
    pass through untouched; at 100 TB pair this with the bucketed
    layout so the join plans exchange-free).

    Contract: at most one change row per key (the shape a keyed diff
    emits) and ``op_col`` drawn from exactly {insert, update, delete};
    a delete wins over the payload, an insert/update takes the change
    payload wholesale. Duplicate change keys and unknown ops raise
    rather than resolving silently (an unmatched key with a bad op
    would otherwise emit a null-payload row).
    """
    from pyspark.sql import functions as F

    from pac_spark.cache import pin

    # pin: the changeset is often itself a join (snapshot_diff output)
    # and is consumed by the validation pass AND the merge join —
    # unpinned it would recompute per consumer. Both contract checks
    # ride ONE aggregation job over the per-key counts.
    changes = pin(changes)
    bad_op = ~F.col(op_col).isin("insert", "update", "delete")
    chk = (
        changes.groupBy(key)
        .agg(
            F.count("*").alias("_n"),
            F.sum(bad_op.cast("int")).alias("_nbad"),
        )
        .agg(F.max("_n").alias("max_per_key"), F.sum("_nbad").alias("n_bad_ops"))
        .collect()[0]
    )
    if (chk["max_per_key"] or 0) > 1:
        raise ValueError(f"merge_changeset: duplicate change rows for {key}")
    if (chk["n_bad_ops"] or 0) > 0:
        ops = [
            r[0]
            for r in changes.filter(bad_op).select(op_col).distinct().limit(5).collect()
        ]
        raise ValueError(f"merge_changeset: unknown {op_col} values {ops}")
    cols = [c for c in base.columns if c != key]
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = ~F.col(f"c.{op_col}").eqNullSafe(F.lit("delete"))
    take_change = F.col(f"c.{op_col}").isin("insert", "update")
    return (
        joined.filter(keep)
        .select(
            F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key),
            *[
                F.when(take_change, F.col(f"c.{col}"))
                .otherwise(F.col(f"b.{col}"))
                .alias(col)
                for col in cols
            ],
        )
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance (IVM): the third leg of the CDC story.
# snapshot_diff produces a changeset, merge_changeset applies it to the
# TABLE — this applies it to a MATERIALIZED AGGREGATE, so a nightly
# sum/count view updates from the (small) changeset without rescanning
# the (huge) base table.


def maintain_sum_count(
    base_agg: DataFrame,
    changes: DataFrame,
    group_col: str,
    value_cents_old: str,
    value_cents_new: str,
    group_col_old: str | None = None,
) -> DataFrame:
    """Apply a :func:`snapshot_diff` changeset to a materialized
    ``(group, n, cents)`` aggregate.

    Delta algebra (count/sum are self-maintainable — no rescan, unlike
    min/max which need the base on deletes): an insert contributes
    (+1, +new) at the new group, a delete (−1, −old) at the old group,
    and an update BOTH — two delta rows, because the group key itself
    may have changed sides. Groups whose count reaches zero drop out.

    Scale shape: the deltas are a projection + explode of the (small)
    changeset; the final groupBy sums |view| + |changes| rows — the
    base TABLE is never touched, which is the entire point at 100 TB.
    Exact integer cents keep the maintained sums bit-identical to a
    full recompute at any partition count.
    """
    g_old = group_col_old or f"old_{group_col}"
    g_new = f"new_{group_col}"
    minus = F.struct(
        F.col(g_old).alias("g"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col(value_cents_old)).alias("dc"),
    )
    plus = F.struct(
        F.col(g_new).alias("g"),
        F.lit(1).cast("long").alias("dn"),
        F.col(value_cents_new).alias("dc"),
    )
    deltas = (
        changes.select(
            F.explode(
                F.when(F.col("change_type") == "insert", F.array(plus))
                .when(F.col("change_type") == "delete", F.array(minus))
                .otherwise(F.array(minus, plus))
            ).alias("d")
        )
        .select(
            F.col("d.g").alias(group_col),
            F.col("d.dn").alias("_dn"),
            F.col("d.dc").alias("_dc"),
        )
    )
    return (
        base_agg.select(
            group_col, F.col("n").alias("_dn"), F.col("cents").alias("_dc")
        )
        .unionByName(deltas)
        .groupBy(group_col)
        .agg(F.sum("_dn").alias("n"), F.sum("_dc").alias("cents"))
        .filter(F.col("n") > 0)
    )


def ivm_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: maintain the per-nation (customer count, exact
    account-balance sum) view across the derived old→new snapshot
    transition. The view is aggregated once from the OLD snapshot (the
    stand-in for a stored materialized view), then updated purely from
    the changeset. The oracle aggregates the NEW table directly, so
    hash equality proves incremental maintenance ≡ full recompute —
    including updates that change the group key (the modular transform
    shifts balances; inserts/deletes move rows across nations'
    counts)."""
    from pac_spark.cache import pin

    new = catalog.load(spark, sf_dir, "customer").select(*_COLS)
    new = pin(new)
    old = _old_snapshot(new)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    base_agg = old.groupBy("c_nationkey").agg(
        F.count("*").alias("n"), F.sum(cents).alias("cents")
    )
    changes = snapshot_diff(old, new, "c_custkey").select(
        "change_type",
        "old_c_nationkey",
        "new_c_nationkey",
        F.coalesce(F.round(F.col("old_c_acctbal") * 100).cast("long"), F.lit(0)).alias(
            "_old_cents"
        ),
        F.coalesce(F.round(F.col("new_c_acctbal") * 100).cast("long"), F.lit(0)).alias(
            "_new_cents"
        ),
    )
    maintained = maintain_sum_count(
        base_agg, changes, "c_nationkey", "_old_cents", "_new_cents"
    )
    return maintained.select(
        "c_nationkey",
        F.col("n").alias("n_customers"),
        (F.col("cents") / 100.0).cast("double").alias("total_acctbal"),
    ).orderBy("c_nationkey")
