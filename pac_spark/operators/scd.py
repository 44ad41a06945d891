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
from pyspark.sql.window import Window as W

from pac_spark import catalog

__all__ = [
    "snapshot_diff",
    "merge_changeset",
    "scd2_customer_diff",
    "SCD2_SQL",
    "maintain_sum_count",
    "ivm_nation_balance",
    "build_scd2_history",
    "scd2_history_customer",
    "SCD2_HISTORY_SQL",
    "scd2_snapshot_at",
    "scd2_pointintime_customer",
    "SCD2_PIT_SQL",
    "maintain_join_nation_revenue",
    "ivm_join_nation_revenue",
    "IVM_JOIN_SQL",
]

MOD_UPDATE = 7
MOD_INSERT = 11
MOD_DELETE = 13
GHOST_OFFSET = 10**7  # synthetic delete keys live far above real keys

_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def _guard_ghost_range(
    new: DataFrame, n_offsets: int = 1, key: str = "c_custkey"
) -> DataFrame:
    """Enforce (not trust) the ghost-key assumption: real keys must
    stay below GHOST_OFFSET so derived ghost ranges (up to
    ``n_offsets`` · GHOST_OFFSET above) cannot collide with them. A
    collision would silently misclassify deletes (diff), corrupt
    version chains (history), or shift group sums (IVM) — this turns
    it into a clear runtime error instead (code-review r6 #5: only
    scd2_customer_diff carried the assert). ``key`` names the guarded
    column — orders keys outgrow GHOST_OFFSET ~40x sooner than
    customer keys, so the join-IVM guards both sides (code-review
    r7: hardcoding c_custkey had left new_o unguardABLE)."""
    bound = new.agg(F.max(key).alias("_max_key"))
    return (
        new.join(F.broadcast(bound))
        .filter(
            F.assert_true(
                # NULL max = EMPTY table, which trivially satisfies the
                # bound; without the coalesce, Catalyst pushes this
                # broadcast-side-only predicate down to the 1-row bound
                # frame and assert_true(NULL) throws on empty input
                F.coalesce(F.col("_max_key") < GHOST_OFFSET, F.lit(True)),
                F.lit(
                    f"{key} reached GHOST_OFFSET={GHOST_OFFSET} "
                    f"(x{n_offsets} ghost ranges); raise it"
                ),
            ).isNull()
        )
        .drop("_max_key")
    )


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
    if differs is None:
        # key-only frames (membership CDC): no payload can differ, so
        # rows classify as insert/delete/unchanged only — without this
        # F.when(None, ...) raised a TypeError (code-review r7)
        differs = F.lit(False)
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
        # no ordering here: diffs usually feed joins/aggregates that
        # discard it, and a pin() downstream would materialize the
        # useless global sort (code-review r7) — the registry entry
        # whose OUTPUT is the diff sorts explicitly
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
    from pac_spark.cache import pin

    # pinned: the guarded frame feeds the derived-old base, its ghost
    # mirror, AND the new side of the full-outer diff — unpinned, the
    # customer scan + guard ran once per consumer (code-review r7)
    new = pin(
        _guard_ghost_range(catalog.load(spark, sf_dir, "customer").select(*_COLS))
    )
    return snapshot_diff(_old_snapshot(new), new, "c_custkey").orderBy(
        "c_custkey"
    )


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
    from pac_spark.cache import pin

    # pin: the changeset is often itself a join (snapshot_diff output)
    # and is consumed by the validation pass AND the merge join —
    # unpinned it would recompute per consumer. Both contract checks
    # ride ONE aggregation job over the per-key counts.
    changes = pin(changes)
    # NULL is a bad op too: ~NULL.isin(...) is NULL, which F.sum
    # skips — the guard would pass and a NULL-op row for an absent key
    # would emit the very null-payload row it exists to prevent
    # (code-review r7)
    bad_op = F.col(op_col).isNull() | ~F.col(op_col).isin(
        "insert", "update", "delete"
    )
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

    new = pin(_guard_ghost_range(catalog.load(spark, sf_dir, "customer").select(*_COLS)))
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


# ---------------------------------------------------------------------------
# SCD Type-2 HISTORY construction: the diff detects changes between two
# snapshots; this builds the versioned dimension (valid_from/valid_to
# chains + is_current) from a whole SERIES of snapshots — the table a
# warehouse actually serves point-in-time joins from.


def build_scd2_history(
    snapshots: list[tuple[int, DataFrame]], key: str
) -> DataFrame:
    """Collapse ``[(generation, snapshot), ...]`` into an SCD2 history:
    one row per (key, version), carrying the payload, ``valid_from``
    (the generation the version appeared), ``valid_to`` (the
    generation it was replaced or deleted, NULL while current) and
    ``is_current``.

    Construction (one shuffle on the key, two window passes + one
    aggregate over the unioned snapshots — at scale each generation is
    one day's partition scan):

    - a row OPENS a version when it is the key's first presence, its
      payload differs null-safely from the previous presence, or the
      previous presence is non-contiguous in the generation series
      (delete + reinsert must open a new version even with an equal
      payload);
    - a row BREAKS after itself when the series has a successor
      generation and the key is absent there (deleted), or present
      with a different payload (replaced). Within a version only the
      last row can break, so the version's ``valid_to`` is its
      max-generation row's successor when that row breaks, else NULL
      (current).
    """
    cols = [c for c in snapshots[0][1].columns if c != key]
    gens = sorted(g for g, _ in snapshots)
    succ_of = {g: gens[i + 1] for i, g in enumerate(gens[:-1])}
    tagged = None
    for g, df in snapshots:
        t = df.select(F.lit(g).alias("_gen"), key, *cols)
        tagged = t if tagged is None else tagged.unionByName(t)

    w = W.partitionBy(key).orderBy("_gen")
    prev_gen = F.lag("_gen").over(w)
    next_gen = F.lead("_gen").over(w)
    differs_prev = None
    differs_next = None
    for c in cols:
        dp = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        dn = ~F.col(c).eqNullSafe(F.lead(c).over(w))
        differs_prev = dp if differs_prev is None else (differs_prev | dp)
        differs_next = dn if differs_next is None else (differs_next | dn)

    succ = F.create_map(
        *[F.lit(x) for kv in succ_of.items() for x in kv]
    )[F.col("_gen")]
    contiguous_prev = prev_gen.isNotNull() & (
        F.lag(succ).over(w) == F.col("_gen")
    )
    opens = prev_gen.isNull() | ~contiguous_prev | differs_prev
    breaks_after = succ.isNotNull() & (
        next_gen.isNull() | (next_gen != succ) | differs_next
    )

    rows = tagged.select(
        key,
        *cols,
        "_gen",
        opens.alias("_opens"),
        F.when(breaks_after, succ).alias("_closes_at"),
    ).withColumn(
        "_version",
        F.sum(F.col("_opens").cast("int")).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        rows.groupBy(key, "_version")
        .agg(
            F.min("_gen").alias("valid_from"),
            F.max_by("_closes_at", "_gen").alias("valid_to"),
            *[F.max_by(c, "_gen").alias(c) for c in cols],
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_version")
        .select(key, *cols, "valid_from", "valid_to", "is_current")
    )


MOD_UPD0 = 3  # extra balance shift present only in generation 0
MOD_INS1 = 5  # keys absent from gen 0 (insert at gen 1)
MOD_DEL1 = 17  # ghost keys present only in gen 0 (deleted at gen 1)
_UPD0_SHIFT = 50.0


def _hist_snapshots(new: DataFrame) -> list[tuple[int, DataFrame]]:
    """Three deterministic snapshot generations derived from the
    current table, with UNIQUE keys per generation (ghost ranges are
    disjoint per motif — composing ``_old_snapshot`` instead produces
    ghost-of-ghost key collisions, and duplicate (key, gen) rows make
    the window tie-order engine-dependent). Motifs by key class:

    - stable keys: one current version from gen 0;
    - ``% MOD_UPD0``: balance differs at gen 0 → update 0→1;
    - ``% MOD_UPDATE``: balance shifted in gens 0 AND 1 → update 1→2;
    - ``% MOD_INS1``: absent from gen 0 → insert at gen 1;
    - ``% MOD_INSERT``: absent from gens 0,1 → insert at gen 2;
    - ghosts ``% MOD_DELETE`` (+GHOST_OFFSET): live gens 0-1, deleted
      at gen 2; ghosts ``% MOD_DEL1`` (+2·GHOST_OFFSET): live gen 0
      only, deleted at gen 1.
    """
    key = F.col("c_custkey")
    upd1 = F.when(
        key % MOD_UPDATE == 0, F.col("c_acctbal") + 100.0
    ).otherwise(F.col("c_acctbal"))

    def ghosts(mod: int, offset: int) -> DataFrame:
        return new.filter(key % mod == 0).select(
            (key + offset).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )

    g1 = (
        new.filter(key % MOD_INSERT != 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            upd1.alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(ghosts(MOD_DELETE, GHOST_OFFSET))
    )
    g0 = (
        new.filter((key % MOD_INSERT != 0) & (key % MOD_INS1 != 0))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.when(key % MOD_UPD0 == 0, upd1 + _UPD0_SHIFT)
            .otherwise(upd1)
            .alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(ghosts(MOD_DELETE, GHOST_OFFSET))
        .unionByName(ghosts(MOD_DEL1, 2 * GHOST_OFFSET))
    )
    return [(0, g0), (1, g1), (2, new)]


def scd2_history_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the SCD2 history built from three derived
    customer snapshot generations (see :func:`_hist_snapshots` for the
    motif coverage). Delete+reinsert gap handling is covered by the
    crafted pytest (`test_scd2_history_motifs`)."""
    from pac_spark.cache import pin

    new = pin(
        _guard_ghost_range(
            catalog.load(spark, sf_dir, "customer").select(*_COLS), n_offsets=2
        )
    )
    return build_scd2_history(_hist_snapshots(new), "c_custkey").orderBy(
        "c_custkey", "valid_from"
    )


def SCD2_HISTORY_SQL() -> str:
    """DuckDB oracle for :func:`scd2_history_customer`: derives the
    same three collision-free snapshot generations, then replays the
    identical opens/breaks window construction. The generation series
    is the concrete 0,1,2 here, so contiguity is ``prev_gen = _gen-1``
    and the successor ``_gen + 1`` (the Spark side stays generic over
    arbitrary generation labels)."""
    cols = [c for c in _COLS if c != "c_custkey"]
    dprev = " OR ".join(
        f"({c} IS DISTINCT FROM LAG({c}) OVER w)" for c in cols
    )
    dnext = " OR ".join(
        f"({c} IS DISTINCT FROM LEAD({c}) OVER w)" for c in cols
    )
    nl = "\n       "
    payload = ("," + nl).join(f"arg_max({c}, _gen) AS {c}" for c in cols)
    collist = ", ".join(_COLS)
    return f"""
WITH newc AS (SELECT {collist} FROM customer),
u1 AS (
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % {MOD_UPDATE} = 0 THEN c_acctbal + 100.0
                ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM newc
),
g1 AS (
    SELECT * FROM u1 WHERE c_custkey % {MOD_INSERT} <> 0
    UNION ALL
    SELECT c_custkey + {GHOST_OFFSET}, c_name, c_nationkey, c_acctbal,
           c_mktsegment
    FROM newc WHERE c_custkey % {MOD_DELETE} = 0
),
g0 AS (
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % {MOD_UPD0} = 0
                THEN c_acctbal + {_UPD0_SHIFT} ELSE c_acctbal
           END AS c_acctbal,
           c_mktsegment
    FROM u1
    WHERE c_custkey % {MOD_INSERT} <> 0 AND c_custkey % {MOD_INS1} <> 0
    UNION ALL
    SELECT c_custkey + {GHOST_OFFSET}, c_name, c_nationkey, c_acctbal,
           c_mktsegment
    FROM newc WHERE c_custkey % {MOD_DELETE} = 0
    UNION ALL
    SELECT c_custkey + {2 * GHOST_OFFSET}, c_name, c_nationkey, c_acctbal,
           c_mktsegment
    FROM newc WHERE c_custkey % {MOD_DEL1} = 0
),
tagged AS (
    SELECT 0 AS _gen, {collist} FROM g0
    UNION ALL SELECT 1, {collist} FROM g1
    UNION ALL SELECT 2, {collist} FROM newc
),
x AS (
    SELECT *,
           LAG(_gen) OVER w AS prev_gen,
           LEAD(_gen) OVER w AS next_gen,
           ({dprev}) AS dprev,
           ({dnext}) AS dnext,
           CASE WHEN _gen < 2 THEN _gen + 1 END AS succ
    FROM tagged
    WINDOW w AS (PARTITION BY c_custkey ORDER BY _gen)
),
y AS (
    SELECT *,
           (prev_gen IS NULL OR prev_gen <> _gen - 1
                OR COALESCE(dprev, FALSE)) AS opens,
           CASE WHEN succ IS NOT NULL AND (next_gen IS NULL
                     OR next_gen <> succ OR COALESCE(dnext, FALSE))
                THEN succ END AS closes_at
    FROM x
),
z AS (
    SELECT *, SUM(CASE WHEN opens THEN 1 ELSE 0 END) OVER (
        PARTITION BY c_custkey ORDER BY _gen
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _version
    FROM y
)
SELECT c_custkey,
       {payload},
       CAST(MIN(_gen) AS INT) AS valid_from,
       CAST(arg_max(closes_at, _gen) AS INT) AS valid_to,
       arg_max(closes_at, _gen) IS NULL AS is_current
FROM z GROUP BY c_custkey, _version
ORDER BY c_custkey, valid_from
"""


PIT_GEN = 1  # the generation the registered point-in-time row rebuilds


def scd2_snapshot_at(history: DataFrame, gen: int) -> DataFrame:
    """Time travel over an SCD2 history: the table AS OF ``gen`` is
    every version whose validity interval covers it —
    ``valid_from <= gen < coalesce(valid_to, ∞)``. One filter, no
    join; at scale this is a partition-prunable predicate when the
    history is range-partitioned on ``valid_from``."""
    return history.filter(
        (F.col("valid_from") <= gen)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > gen))
    ).drop("valid_from", "valid_to", "is_current")


def scd2_pointintime_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: rebuild generation ``PIT_GEN`` from the SCD2
    history and return it. The oracle is the GENERATION DEFINITION
    itself (the ``g1`` derivation), so hash equality closes the loop:
    snapshots → history → point-in-time filter reproduces the original
    snapshot row-for-row — the property that makes an SCD2 dimension
    trustworthy for as-of joins."""
    from pac_spark.cache import pin

    new = pin(
        _guard_ghost_range(
            catalog.load(spark, sf_dir, "customer").select(*_COLS), n_offsets=2
        )
    )
    history = build_scd2_history(_hist_snapshots(new), "c_custkey")
    return scd2_snapshot_at(history, PIT_GEN).orderBy("c_custkey")


def SCD2_PIT_SQL() -> str:
    """Oracle: the g1 generation stated directly."""
    collist = ", ".join(_COLS)
    return f"""
WITH newc AS (SELECT {collist} FROM customer),
u1 AS (
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % {MOD_UPDATE} = 0 THEN c_acctbal + 100.0
                ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM newc
),
g1 AS (
    SELECT * FROM u1 WHERE c_custkey % {MOD_INSERT} <> 0
    UNION ALL
    SELECT c_custkey + {GHOST_OFFSET}, c_name, c_nationkey, c_acctbal,
           c_mktsegment
    FROM newc WHERE c_custkey % {MOD_DELETE} = 0
)
SELECT {collist} FROM g1 ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# JOIN-view IVM: maintain an aggregate OVER A JOIN from both sides'
# changesets (the delta-join rule), never rejoining the full tables.

ORD_MOD_UPDATE = 5
ORD_MOD_INSERT = 9
ORD_MOD_DELETE = 17


def _old_orders(new: DataFrame) -> DataFrame:
    """Derived old orders snapshot: keys ≡0 (mod 9) absent (inserts),
    keys ≡0 (mod 5) carry a shifted price (updates), keys ≡0 (mod 17)
    mirrored to the ghost range (deletes). Same derivation discipline
    as ``_old_snapshot`` with disjoint moduli so order and customer
    changes interleave every way."""
    key = F.col("o_orderkey")
    base = new.filter(key % ORD_MOD_INSERT != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(key % ORD_MOD_UPDATE == 0, F.col("cents") + 2500)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    ghosts = new.filter(key % ORD_MOD_DELETE == 0).select(
        (key + GHOST_OFFSET).alias("o_orderkey"), "o_custkey", "cents"
    )
    return base.unionByName(ghosts)


def _old_customers_nation(new: DataFrame) -> DataFrame:
    """Derived old customer snapshot for the JOIN view: updates move
    the GROUP KEY (nation) — the case that makes join-IVM hard —
    instead of the balance."""
    key = F.col("c_custkey")
    base = new.filter(key % MOD_INSERT != 0).select(
        "c_custkey",
        F.when(key % MOD_UPDATE == 0, (F.col("c_nationkey") + 1) % 25)
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
    )
    ghosts = new.filter(key % MOD_DELETE == 0).select(
        (key + GHOST_OFFSET).alias("c_custkey"), "c_nationkey"
    )
    return base.unionByName(ghosts)


def _signed_deltas(diff: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """A :func:`snapshot_diff` changeset as a SIGNED delta relation:
    insert → (+1, new payload), delete → (−1, old payload), update →
    both rows. The multiset-algebra form every IVM derivation
    composes from. ``key`` is the diff's key column (emitted plain,
    one per row, valid for both sides); ``cols`` the per-side
    payloads."""
    minus = F.struct(
        F.lit(-1).cast("long").alias("sign"),
        *[F.col(f"old_{c}").alias(c) for c in cols],
    )
    plus = F.struct(
        F.lit(1).cast("long").alias("sign"),
        *[F.col(f"new_{c}").alias(c) for c in cols],
    )
    return diff.select(
        key,
        F.explode(
            F.when(F.col("change_type") == "insert", F.array(plus))
            .when(F.col("change_type") == "delete", F.array(minus))
            .otherwise(F.array(minus, plus))
        ).alias("d"),
    ).select(key, "d.*")


def ivm_join_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: maintain V = γ_nation(orders ⋈ customer) —
    order count and exact revenue per nation — across simultaneous
    old→new transitions of BOTH base tables, using the delta-join
    rule, never rejoining the full tables:

        Δ(O ⋈ C) = ΔO ⋈ C_old  +  O_old ⋈ ΔC  +  ΔO ⋈ ΔC

    with multiset signs multiplying in the cross term (that term is
    what makes the algebra self-correcting: e.g. a deleted order
    referencing an inserted customer nets to zero through +1·−1).
    Customer updates move the GROUP KEY (nation), order updates move
    the measure, and inserts/deletes hit both sides — every
    interleaving the rule must absorb.

    Scale shape: the changesets join WITHOUT forced broadcast hints —
    when they are genuinely small (the nightly-IVM premise) AQE
    broadcasts them from measured sizes, and when a changeset is a
    large fraction of its base (this demo's derived deltas are) the
    joins shuffle safely instead of OOMing the driver. The only
    full-table touches are one scan of O_old and one of C_old — no
    O⋈C rejoin anywhere. The maintained view then folds
    |V| + |contributions| rows. The oracle aggregates the NEW join
    directly, so hash equality proves maintenance ≡ full recompute.
    """
    new_c = _guard_ghost_range(catalog.load(spark, sf_dir, "customer").select(*_COLS))
    new_o = _guard_ghost_range(
        catalog.load(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ),
        key="o_orderkey",
    )
    from pac_spark.cache import pin

    new_o = pin(new_o)
    c_new = pin(new_c.select("c_custkey", "c_nationkey"))
    c_old = pin(_old_customers_nation(c_new))
    o_old = pin(_old_orders(new_o))

    return maintain_join_nation_revenue(o_old, new_o, c_old, c_new)


def maintain_join_nation_revenue(
    o_old: DataFrame, o_new: DataFrame, c_old: DataFrame, c_new: DataFrame
) -> DataFrame:
    """The delta-join maintenance core over any two snapshot pairs —
    split out so crafted tests can feed handmade transitions (the
    cross-term cancellations especially) without the derived-snapshot
    plumbing. Schemas: orders (o_orderkey, o_custkey, cents),
    customers (c_custkey, c_nationkey)."""
    from pac_spark.cache import pin

    d_o = pin(
        _signed_deltas(
            snapshot_diff(o_old, o_new, "o_orderkey"), "o_orderkey", ["o_custkey", "cents"]
        )
    )
    d_c = pin(
        _signed_deltas(
            snapshot_diff(c_old, c_new, "c_custkey"), "c_custkey", ["c_nationkey"]
        )
    )

    base = (
        o_old.join(c_old, o_old["o_custkey"] == c_old["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("_dn"), F.sum("cents").alias("_dc"))
    )
    # deltas are NOT force-broadcast: the derived changesets are
    # constant FRACTIONS of the base tables (~57% of orders, ~45% of
    # customers), not bounded frames — AQE broadcasts them while they
    # measure small and shuffles them at scale (code-review r7)
    t1 = (
        d_o
        .join(c_old, d_o["o_custkey"] == c_old["c_custkey"])
        .select(
            "c_nationkey",
            F.col("sign").alias("_dn"),
            (F.col("sign") * F.col("cents")).alias("_dc"),
        )
    )
    t2 = (
        o_old.join(d_c, o_old["o_custkey"] == d_c["c_custkey"])
        .select(
            "c_nationkey",
            F.col("sign").alias("_dn"),
            (F.col("sign") * F.col("cents")).alias("_dc"),
        )
    )
    t3 = (
        d_o.withColumnRenamed("sign", "s_o")
        .join(
            d_c.withColumnRenamed("sign", "s_c"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_nationkey",
            (F.col("s_o") * F.col("s_c")).alias("_dn"),
            (F.col("s_o") * F.col("s_c") * F.col("cents")).alias("_dc"),
        )
    )
    return (
        base.unionByName(t1).unionByName(t2).unionByName(t3)
        .groupBy("c_nationkey")
        .agg(F.sum("_dn").alias("n"), F.sum("_dc").alias("cents"))
        .filter(F.col("n") > 0)
        .select(
            "c_nationkey",
            F.col("n").alias("n_orders"),
            (F.col("cents") / 100.0).cast("double").alias("total_revenue"),
        )
        .orderBy("c_nationkey")
    )


def IVM_JOIN_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py).

    The independent spec: aggregate the NEW join directly — no deltas,
    no snapshots — so hash equality proves the delta-join maintenance
    implements exactly a full recompute.
    """
    return """
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
            / 100.0 AS DOUBLE) AS total_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
HAVING COUNT(*) > 0
ORDER BY c.c_nationkey
"""
