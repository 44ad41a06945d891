"""Temporal join operators: as-of join and range (band) join.

The reference has no join executor at all (SURVEY.md §2.3 — its only
joins are an N+1 key lookup and an O(n²) similarity loop), but any
engine serving its event/time-series data (`events` table) owes users
these two classics. Both are built to scale:

- **as-of join** is NOT implemented as a range self-join (which
  explodes to |A|·|B| candidate pairs per key before picking the max).
  Instead the two sides are union-tagged and sorted once per key, and a
  running ``last_value(..., ignorenulls)`` window carries the most
  recent right-side row forward — one shuffle on the join key, linear
  work per partition, no candidate blow-up. This is the merge-join
  formulation every column store uses for ASOF.
- **range/band join** broadcasts the (tiny, bounded) band table and
  lets Spark evaluate the non-equi predicate as a
  BroadcastNestedLoopJoin — each fact row tests a handful of bands in
  memory; the fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pac_spark import catalog
from pac_spark.cache import pin
from pac_spark.streaming.windows import SESSION_GAP_MIN as _SESSION_GAP_MIN

__all__ = [
    "user_daily_features",
    "conversion_latency_by_hour",
    "CONVERSION_LATENCY_SQL",
    "FEATURES_SQL",
    "asof_join_purchase_click",
    "range_band_join_quantity",
    "interval_overlap_join",
    "funnel",
    "funnel_view_click_purchase",
    "funnel_within_1h_view_click_purchase",
    "FUNNEL_WITHIN_SQL",
    "timeseries_gapfill_hourly",
    "ohlc_bars_hourly",
    "OHLC_SQL",
    "peak_concurrent_sessions",
    "PEAK_CONCURRENCY_SQL",
    "top_session_paths",
    "SESSION_PATHS_SQL",
    "user_activity_streaks",
    "STREAKS_SQL",
    "daily_coverage_us",
    "COVERAGE_SQL",
    "time_weighted_value_by_user",
    "TWA_SQL",
    "attribution_last_touch",
    "pattern_runs_view_click_purchase",
    "PATTERN_RUNS_SQL",
    "ATTRIBUTION_SQL",
    "ATTRIBUTION_WINDOW_MIN",
    "interarrival_stats_by_type",
    "interarrival_readout",
    "INTERARRIVAL_SQL",
    "attribution_position_weighted",
    "POSITION_ATTRIBUTION_SQL",
]

_TS6 = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every ``purchase`` event: the latest ``click`` by the same
    user at-or-before the purchase (LEFT semantics — purchases with no
    prior click keep NULLs).

    Tie-break is total and deterministic: latest ``ts`` wins, then the
    highest ``event_id`` — so the result hash-compares exactly against
    the oracle's ``ORDER BY ts DESC, event_id DESC LIMIT 1`` lateral.

    Plan shape: one hash-partition on ``user_id`` + per-partition sort;
    both sides of the "join" travel in the same shuffle. At 100 TB this
    beats a range join by construction — state per key is one carried
    row, not a candidate set.
    """
    ev = catalog.load(spark, sf_dir, "events")
    sides = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        # clicks sort before purchases at equal ts so an equal-ts click
        # is visible to the purchase row's running window (ts <= ts)
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("side"),
    )
    order = W.partitionBy("user_id").orderBy(
        "ts", "side", "event_id"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    carried = sides.select(
        "*",
        F.last(
            F.when(F.col("side") == 0, F.col("event_id")), ignorenulls=True
        ).over(order).alias("click_id"),
        F.last(
            F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
        ).over(order).alias("click_ts"),
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", _TS6).alias("purchase_ts"),
            "click_id",
            F.date_format("click_ts", _TS6).alias("click_ts"),
            (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))
            ).cast("double").alias("gap_micros"),
        )
    )


ASOF_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       c.click_id,
       strftime(CAST(c.c_ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       CAST(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.c_ts AS TIMESTAMP)) AS DOUBLE)
           AS gap_micros
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
    SELECT e.event_id AS click_id, e.ts AS c_ts
    FROM events e
    WHERE e.event_type = 'click'
      AND e.user_id = p.user_id
      AND e.ts <= p.ts
    ORDER BY e.ts DESC, e.event_id DESC
    LIMIT 1
) c ON TRUE
"""


# quantity bands: a bounded dimension a user would keep in a config
# table; inlined here so Spark and the oracle share one definition
QUANTITY_BANDS = [
    ("scrap", 0.0, 5.0),
    ("small", 5.0, 15.0),
    ("medium", 15.0, 30.0),
    ("bulk", 30.0, 51.0),
]


def range_band_join_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: classify every lineitem into a quantity band
    via ``lo <= qty < hi``, then aggregate revenue per band.

    The band table is broadcast (4 rows); the fact scan streams through
    a BroadcastNestedLoopJoin without shuffling, then one partial+final
    aggregate. Bands are half-open and non-overlapping, so the join is
    1:1 and row counts are preserved.
    """
    from pac_spark.functions.exact import money_sum

    li = catalog.load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(QUANTITY_BANDS, ["band", "lo", "hi"])
    joined = li.join(
        F.broadcast(bands),
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        "inner",
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue"),
        )
        .orderBy("band")
    )


def _bands_values_sql() -> str:
    rows = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in QUANTITY_BANDS)
    return f"(VALUES {rows}) AS bands(band, lo, hi)"


# re-export of the one session-gap source of truth (windows.py) —
# oracles interpolate the minutes form, the sessionizer uses the us
# form; deriving one from the other keeps them un-driftable
SESSION_GAP_MIN = _SESSION_GAP_MIN
# Attribution pad: each session interval is widened to
# [start - pad, end + pad] before the overlap test. Besides being the
# realistic ad-attribution semantics (a click "belongs" to a view that
# ended shortly before it), the pad keeps the query discriminating on
# sparse fixtures: single-event sessions are zero-length points that
# can only overlap on exact timestamp equality, which never happens.
ATTRIBUTION_PAD_MIN = 30


def _type_sessions(ev: DataFrame, event_type: str, prefix: str) -> DataFrame:
    """Per-user activity intervals for one event type, via THE
    canonical 10-minute-gap sessionizer
    (:func:`pac_spark.streaming.windows.with_session_ids`) — this was
    a fourth drifting private copy of the gaps-and-islands logic
    (ts-only ordering vs the canonical (ts, event_id) total order;
    output-invariant, but exactly the drift class code-review r6
    collapsed the other three copies for)."""
    from pac_spark.streaming.windows import with_session_ids

    typed = ev.filter(F.col("event_type") == event_type).select(
        "user_id", "ts", "event_id"
    )
    return with_session_ids(typed).groupBy("user_id", "sid").agg(
        F.min("ts").alias(f"{prefix}_start"), F.max("ts").alias(f"{prefix}_end")
    )


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join: every (view-session, click-session) pair
    of the same user whose ±30-minute attribution windows intersect.

    A naive user-keyed join compares every A-interval with every
    B-interval of that user — quadratic per key as history grows.
    Instead each interval is exploded into the 1-day chunks it touches
    and the join key is (user_id, chunk): an interval pair is only ever
    compared inside a chunk both touch, so per-key fan-out is bounded
    by per-day activity no matter how long the retained history is.
    The exact overlap predicate then filters, and distinct() collapses
    pairs that co-occur in several chunks (a pair spanning midnight).
    """
    ev = catalog.load(spark, sf_dir, "events")
    pad = F.expr(f"INTERVAL {ATTRIBUTION_PAD_MIN} MINUTES")

    def padded(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            "user_id",
            (F.col(f"{prefix}_start") - pad).alias(f"{prefix}_start"),
            (F.col(f"{prefix}_end") + pad).alias(f"{prefix}_end"),
        )

    views = padded(_type_sessions(ev, "view", "a"), "a")
    clicks = padded(_type_sessions(ev, "click", "b"), "b")

    def chunked(df: DataFrame, prefix: str) -> DataFrame:
        return df.withColumn(
            "chunk",
            F.explode(
                F.sequence(
                    F.date_trunc("day", F.col(f"{prefix}_start")),
                    F.date_trunc("day", F.col(f"{prefix}_end")),
                    F.expr("INTERVAL 1 DAY"),
                )
            ),
        )
    pairs = (
        chunked(views, "a")
        .join(chunked(clicks, "b"), ["user_id", "chunk"])
        .filter(
            (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
        )
        .select("user_id", "a_start", "a_end", "b_start", "b_end")
        .distinct()
    )
    overlap = F.unix_micros(F.least("a_end", "b_end")) - F.unix_micros(
        F.greatest("a_start", "b_start")
    )
    return pairs.select(
        "user_id",
        F.date_format("a_start", _TS6).alias("view_start"),
        F.date_format("a_end", _TS6).alias("view_end"),
        F.date_format("b_start", _TS6).alias("click_start"),
        F.date_format("b_end", _TS6).alias("click_end"),
        overlap.alias("overlap_micros"),
    ).orderBy("user_id", "view_start", "click_start")


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
) -> DataFrame:
    """Generic sequential funnel: for every user, the earliest
    completion of ``stages`` in order, each later stage strictly after
    the previous one. Users who stall mid-funnel keep the stages they
    reached (LEFT joins), so stage-to-stage drop-off falls out of the
    ``reached_*`` flags. With ``within_us`` each later stage must also
    land within that window of the previous stage's chosen time —
    greedy (Amplitude-style) conversion-window semantics: the funnel
    commits to each stage's earliest admissible event before looking
    at the next stage.

    Scale shape: a cascade of conditional min-aggregations keyed on
    ``user_col``. Each stage scans only its own event type (the filter
    pushes into the scan, so a type-partitioned event log reads K
    narrow slices, not K full passes), shuffles that slice once for
    its groupBy, and joins the previous stage's per-user frame —
    co-hashed on the user key, broadcast when the funnel head is
    small. No per-user event list is ever materialized, so a power
    user with millions of events costs min-aggregate state, not task
    memory — the collect_list-and-scan alternative would cap user
    history by task heap instead.
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    if len(set(stages)) != len(stages):
        # duplicate names would alias colliding t_<stage> columns and
        # surface as an opaque AMBIGUOUS_REFERENCE deep in analysis
        raise ValueError("funnel stages must be unique")
    for stage in stages:
        # stage names are interpolated into generated column names
        # (t_<stage>, reached_<stage>); a dot/space/backtick would
        # mis-resolve or fail deep in analysis (ADVICE r4) — reject
        # them here with a plain error instead. Word characters only,
        # NOT isidentifier(): the generated names are always prefixed,
        # so digit-leading stages ('404_error', '2fa_prompt') are safe
        # and were valid before the guard existed.
        if not stage or not all(c.isalnum() or c == "_" for c in stage):
            raise ValueError(
                f"funnel stage {stage!r} is not identifier-safe; stage "
                "names become generated column names (letters, digits, "
                "and underscores only)"
            )
    ev = events.select(user_col, type_col, ts_col)
    frames = []
    prev_t = None
    for stage in stages:
        t = f"t_{stage}"
        sliced = ev.filter(F.col(type_col) == stage)
        if prev_t is not None:
            step = F.col(ts_col) > F.col(prev_t)
            if within_us is not None:
                # conversion window: GREEDY product-analytics semantics
                # (earliest completion of each stage given the previous
                # stage's chosen time) — the bound composes with the
                # same cascade, one extra pushed predicate per stage
                step = step & (
                    F.unix_micros(F.col(ts_col))
                    <= F.unix_micros(F.col(prev_t)) + F.lit(within_us)
                )
            sliced = sliced.join(frames[-1], user_col).filter(step)
        # pinned: every stage frame has TWO consumers — the next
        # stage's admissibility join and the final reached-flags
        # cascade — so an un-pinned cascade replays the whole stage
        # prefix per consumer (the plan audit read the view slice
        # scanned 3x and click 2x for a 3-stage funnel; plan-audit
        # campaign r8). The frame is one row per user reaching the
        # stage — the small thing; the event-type slices it saves
        # re-scanning are the big thing.
        frames.append(
            pin(
                sliced.groupBy(user_col)
                .agg(F.min(ts_col).alias(t))
                .select(user_col, t)
            )
        )
        prev_t = t
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, user_col, "left")
    first_t, last_t = f"t_{stages[0]}", f"t_{stages[-1]}"
    return out.select(
        user_col,
        *[F.date_format(f"t_{s}", _TS6).alias(f"{s}_ts") for s in stages],
        *[
            F.col(f"t_{s}").isNotNull().alias(f"reached_{s}")
            for s in stages[1:]
        ],
        (F.unix_micros(last_t) - F.unix_micros(first_t)).alias(
            f"{stages[0]}_to_{stages[-1]}_micros"
        ),
    ).orderBy(user_col)


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the view → click → purchase funnel over the
    events table (the product-analytics staple the reference family's
    event data implies but never computes) — an instantiation of the
    generic :func:`funnel` operator."""
    return funnel(
        catalog.load(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def timeseries_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample + gap-fill: the events stream rolled
    up to a DENSE per-user hourly grid — every hour between a user's
    first and last event exists as a row, zero-filled counts, exact-
    cents hourly totals, and the last non-empty hour's total carried
    forward (the time-series ffill every monitoring/feature pipeline
    needs before a model can consume regular timesteps).

    Scale shape — everything is keyed by user, nothing is global:

    - hourly rollup: one map-side-combined groupBy(user, hour) over
      raw rows;
    - grid: ``sequence(min_hour, max_hour)`` exploded from the 1-row-
      per-user span frame — generated, not joined from a calendar
      table, and bounded by each user's own span;
    - fill: left join grid←rollup on (user, hour) — co-partitioned,
      one shuffle — then a running ``last(ignorenulls)`` window per
      user (a user's hours are bounded by the corpus time span, so no
      hot task).

    The DuckDB oracle states the same grid with ``generate_series``
    and ``last_value IGNORE NULLS``, so hash equality proves the
    gap-fill semantics, not just the rollup.
    """
    ev = catalog.load(spark, sf_dir, "events").select("user_id", "ts", "value")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    # The span bounds come straight off the events scan, NOT via the
    # rollup: the r7 pin of the twice-consumed rollup was MEASURED at
    # sf0.1 (r8, 3-run min, warm): pinned 1.15 s vs unpinned 0.37 s —
    # materializing the (user, hour) rollup costs ~3x more than the
    # second scan it saves, and Catalyst cannot ReuseExchange the two
    # consumers anyway (their column prunings differ). This branch is
    # the cheaper of the two consumers made cheaper still: a 2-column
    # pruned scan into a map-side-combined per-user min/max — |users|
    # rows shuffled, identical values (min hour over raw events ==
    # min hour over the rollup).
    spans = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("_lo"),
        F.max(F.date_trunc("hour", "ts")).alias("_hi"),
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("_lo", "_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    filled = grid.join(hourly, ["user_id", "hour"], "left")
    run = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        "user_id",
        F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour_str"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce("cents", F.lit(0)) / 100.0).cast("double").alias("hour_value"),
        (
            F.last("cents", ignorenulls=True).over(run) / 100.0
        ).cast("double").alias("carry_value"),
    ).orderBy("user_id", "hour_str")


# ---------------------------------------------------------------------------
# OHLC candlestick bars

def ohlc_bars_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars: per (event_type, hour), the opening /
    highest / lowest / closing event value plus count and exact value
    sum — the canonical time-series downsample every monitoring and
    market stack reads.

    Open/close are ORDER-SENSITIVE aggregates Spark has no portable
    one-shuffle built-in for (``first``/``last`` in a groupBy are
    partition-order-dependent), so they come off one full-frame window
    over the total sort key ``(ts, event_id)`` — event_id is unique,
    so ties cannot make the answer engine-dependent (the window
    tie-order lesson in the SCD2 history operator). Plan: ONE shuffle
    + sort on (event_type, hour); the collapsing groupBy keys equal
    the window partition keys, so the aggregate reuses the exchange
    (no second shuffle). Values live in integer cents through every
    aggregate — min/max/sum are order-independent there, and the
    window makes open/close deterministic.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    hour = F.date_trunc("hour", F.col("ts"))
    w = (
        W.partitionBy("event_type", "hour_ts")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    bars = (
        ev.select(
            "event_type",
            F.date_format(hour, "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .select(
            "event_type",
            "hour_ts",
            "cents",
            F.first("cents").over(w).alias("open_cents"),
            F.last("cents").over(w).alias("close_cents"),
        )
        .groupBy("event_type", "hour_ts")
        .agg(
            F.max("open_cents").alias("o"),
            F.max("cents").alias("h"),
            F.min("cents").alias("l"),
            F.max("close_cents").alias("c"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("s"),
        )
    )
    dollars = lambda col: (F.col(col).cast("double") / 100.0)  # noqa: E731
    return bars.select(
        "event_type",
        "hour_ts",
        dollars("o").alias("open_value"),
        dollars("h").alias("high_value"),
        dollars("l").alias("low_value"),
        dollars("c").alias("close_value"),
        "n_events",
        dollars("s").alias("sum_value"),
    ).orderBy("event_type", "hour_ts")


def OHLC_SQL() -> str:
    """Registered in the r7 rotation (gate: tests/test_staged_specs.py)."""
    return """
WITH e AS (
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
),
fl AS (
    SELECT event_type, hour_ts, cents,
           FIRST_VALUE(cents) OVER w AS open_cents,
           LAST_VALUE(cents) OVER w AS close_cents
    FROM e
    WINDOW w AS (PARTITION BY event_type, hour_ts ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hour_ts,
       CAST(CAST(MAX(open_cents) AS DOUBLE) / 100.0 AS DOUBLE) AS open_value,
       CAST(CAST(MAX(cents) AS DOUBLE) / 100.0 AS DOUBLE) AS high_value,
       CAST(CAST(MIN(cents) AS DOUBLE) / 100.0 AS DOUBLE) AS low_value,
       CAST(CAST(MAX(close_cents) AS DOUBLE) / 100.0 AS DOUBLE) AS close_value,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(cents) AS DOUBLE) / 100.0 AS DOUBLE) AS sum_value
FROM fl
GROUP BY event_type, hour_ts
ORDER BY event_type, hour_ts
"""


# ---------------------------------------------------------------------------
# Peak concurrency (sweep line over session intervals)


def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: the PEAK number of simultaneously-open user sessions,
    and the earliest instant that peak is reached.

    Sessions are the same 10-minute-gap islands as
    ``events_sessions_10m``; a session is open over the CLOSED interval
    [first event, last event]. Concurrency only changes at session
    starts, so candidate instants are the distinct start timestamps
    PLUS one midnight probe per day of the activity span — the probe
    is what makes the per-day slicing correct: a day whose peak is
    inherited from sessions still open across midnight (or that has
    carried-over sessions and no starts at all) is measured at 00:00,
    where the start-only candidate set would miss it (code-review r6
    finding). Candidates are grouped by timestamp first, so the whole
    computation is invariant to row order among equal timestamps.

    Scale shape: the classic formulation is one unpartitioned running
    sum over every interval endpoint — a single-task window. Here the
    endpoints are grouped to distinct instants, then the running counts
    come from :func:`pac_spark.functions.prefix.global_running_sums`
    (day-bucketed two-phase prefix sum), so no stage ever sees a
    window wider than one calendar day, and the final per-day argmax
    runs on the (tiny) distinct-instant frame.

    Reference parity: the reference keeps event/session frames in
    pandas and would take ``cumsum()`` on a sorted frame
    (SURVEY.md §2.6 family); this is that semantics made
    partition-parallel.
    """
    from pac_spark.cache import pin
    from pac_spark.functions.prefix import global_running_sums
    from pac_spark.streaming.windows import with_session_ids

    events = catalog.load(spark, sf_dir, "events")
    sessions = (
        with_session_ids(events)
        .select("user_id", "sid", F.unix_micros("ts").alias("us"))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us"))
    )
    # pinned: the sessionization scan feeds two consumers inside the
    # prefix-sum helper (in-bucket runs + bucket totals) — without the
    # pin the event windows would run once per consumer
    endpoints = pin(
        sessions.select(F.col("start_us").alias("t"), F.lit(1).alias("st"), F.lit(0).alias("en"))
        .unionAll(
            sessions.select(F.col("end_us").alias("t"), F.lit(0).alias("st"), F.lit(1).alias("en"))
        )
        .groupBy("t")
        .agg(F.sum("st").alias("st"), F.sum("en").alias("en"))
    )
    from pac_spark.functions.exact import int_div

    day_us = F.lit(86_400_000_000)
    # midnight probes across the activity span (calendar-sized):
    # sequence over day indices off the 1-row endpoint extremes
    span = endpoints.agg(
        int_div(F.min("t"), day_us).alias("d0"),
        int_div(F.max("t"), day_us).alias("d1"),
    )
    probes = span.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    ).select(
        (F.col("d") * day_us).alias("t"),
        F.lit(0).alias("st"),
        F.lit(0).alias("en"),
        F.lit(1).alias("probe"),
    )
    points = pin(
        endpoints.withColumn("probe", F.lit(0))
        .unionAll(probes)
        .groupBy("t")
        .agg(
            F.sum("st").alias("st"),
            F.sum("en").alias("en"),
            F.max("probe").alias("probe"),
        )
    )  # pinned: feeds the prefix helper's two consumers
    running = global_running_sums(
        points, "t", ["st", "en"],
        bucket=int_div(F.col("t"), day_us),
    )
    # ends strictly before t: inclusive running minus this instant's own
    conc = running.filter((F.col("st") > 0) | (F.col("probe") > 0)).select(
        "t",
        (F.col("run_st") - (F.col("run_en") - F.col("en"))).alias("conc"),
    )
    # pinned: cand feeds the per-day max AND the argmax join-back
    cand = pin(
        conc.select(
            F.date_format(F.timestamp_micros(F.col("t")), "yyyy-MM-dd").alias("day"),
            "t",
            "conc",
        )
    )
    peaks = cand.groupBy("day").agg(F.max("conc").alias("peak_concurrency"))
    return (
        cand.join(F.broadcast(peaks), ["day"])
        .filter(F.col("conc") == F.col("peak_concurrency"))
        .groupBy("day", "peak_concurrency")
        .agg(
            F.date_format(F.timestamp_micros(F.min("t")), _TS6).alias("at_ts")
        )
        .select(
            "day",
            F.col("peak_concurrency").cast("int").alias("peak_concurrency"),
            "at_ts",
        )
        .orderBy("day")
    )


PEAK_CONCURRENCY_SQL = """
WITH lagged AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM events
), b AS (
    SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
                   THEN 1 ELSE 0 END AS brk
    FROM lagged
), s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM b
), sess AS (
    SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us
    FROM s GROUP BY user_id, sid
), ep AS (
    SELECT start_us AS t, 1 AS st, 0 AS en, 0 AS probe FROM sess
    UNION ALL
    SELECT end_us AS t, 0 AS st, 1 AS en, 0 AS probe FROM sess
), span AS (
    SELECT MIN(t) // 86400000000 AS d0, MAX(t) // 86400000000 AS d1 FROM ep
), probes AS (
    SELECT unnest(generate_series(d0, d1)) * 86400000000 AS t,
           0 AS st, 0 AS en, 1 AS probe
    FROM span
), pts AS (
    SELECT t, SUM(st) AS st, SUM(en) AS en, MAX(probe) AS probe
    FROM (SELECT * FROM ep UNION ALL SELECT * FROM probes)
    GROUP BY t
), run AS (
    SELECT t, st, probe,
           SUM(st) OVER w - (SUM(en) OVER w - en) AS conc
    FROM pts
    WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), cand AS (
    SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day, t, conc
    FROM run WHERE st > 0 OR probe > 0
), peaks AS (
    SELECT day, MAX(conc) AS peak FROM cand GROUP BY day
)
SELECT c.day,
       CAST(p.peak AS INT) AS peak_concurrency,
       strftime(make_timestamp(MIN(c.t)), '%Y-%m-%d %H:%M:%S.%f') AS at_ts
FROM cand c JOIN peaks p ON c.day = p.day AND c.conc = p.peak
GROUP BY c.day, p.peak
ORDER BY c.day
"""


# ---------------------------------------------------------------------------
# Session path mining


PATH_PREFIX_LEN = 5
PATH_TOP_K = 20


def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``PATH_TOP_K`` most common session journeys: each session's
    first ``PATH_PREFIX_LEN`` event types in time order, joined with
    ``>`` — the "what do users actually do" readout over the same
    10-minute-gap sessions as ``events_sessions_10m``.

    Order inside a session is total — (ts, event_id) — so equal-
    timestamp events cannot reorder between engines or partitionings
    (the window-tie rule every path/funnel operator here follows). The
    per-session array is bounded by session length; the path regroup
    is one map-side-combined shuffle; the final cut is
    TakeOrderedAndProject under a total (count desc, path asc) order.

    Reference parity: the reference's event exports stop at flat
    tables (SURVEY.md §2.6); path mining is the first question asked
    of that data at scale.
    """
    from pac_spark.streaming.windows import with_session_ids

    events = catalog.load(spark, sf_dir, "events")
    with_session = with_session_ids(events, carry=("event_type",))
    paths = (
        with_session.groupBy("user_id", "sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.concat_ws(
                ">",
                F.transform(
                    F.slice("evs", 1, PATH_PREFIX_LEN), lambda x: x["event_type"]
                ),
            ).alias("path"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


SESSION_PATHS_SQL = f"""
WITH lagged AS (
    SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM events
), b AS (
    SELECT *, CASE WHEN prev_us IS NULL
                     OR epoch_us(ts) - prev_us > 600000000
                   THEN 1 ELSE 0 END AS brk
    FROM lagged
), s AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM b
), paths AS (
    SELECT user_id,
           array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:{PATH_PREFIX_LEN}],
               '>') AS path
    FROM s GROUP BY user_id, sid
)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP_K}
"""


# ---------------------------------------------------------------------------
# Activity streaks (gaps and islands on the day axis)


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: total active days, number of activity streaks, and
    the longest run of CONSECUTIVE active days (ties broken toward the
    earliest streak) — the retention-adjacent signal cohort tables
    don't capture.

    Classic gaps-and-islands on the integer day axis: for distinct
    (user, day) rows ordered by day, ``day_num - row_number()`` is
    constant within a consecutive run, so grouping by that anchor
    yields the streaks without any self-join. Every value is an exact
    integer or a date; the longest-streak pick is a row_number under
    the total order (length desc, start asc).

    Scale shape: one map-side-combined distinct on (user, day), then
    user-partitioned windows whose input is bounded by the calendar,
    not the event volume.
    """
    events = catalog.load(spark, sf_dir, "events")
    days = (
        events.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
        )
        .distinct()
    )
    order = W.partitionBy("user_id").orderBy("day_num")
    anchored = days.select(
        "user_id",
        "day_num",
        (F.col("day_num") - F.row_number().over(order)).alias("anchor"),
    )
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"),
        F.min("day_num").alias("start_num"),
        F.max("day_num").alias("end_num"),
    )
    pick = W.partitionBy("user_id").orderBy(F.desc("len"), F.asc("start_num"))
    best = streaks.select(
        "*", F.row_number().over(pick).alias("rn"),
        F.sum("len").over(W.partitionBy("user_id")).alias("n_active_days"),
        F.count("*").over(W.partitionBy("user_id")).alias("n_streaks"),
    ).filter(F.col("rn") == 1)
    epoch = F.lit("1970-01-01").cast("date")
    return best.select(
        "user_id",
        F.col("n_active_days").cast("long").alias("n_active_days"),
        F.col("n_streaks").cast("long").alias("n_streaks"),
        F.col("len").cast("long").alias("longest_streak_days"),
        F.date_add(epoch, F.col("start_num")).cast("string").alias("streak_start"),
        F.date_add(epoch, F.col("end_num")).cast("string").alias("streak_end"),
    ).orderBy("user_id")


STREAKS_SQL = """
WITH days AS (
    SELECT DISTINCT user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
    FROM events
), anchored AS (
    SELECT user_id, day_num,
           day_num - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_num)
               AS anchor
    FROM days
), streaks AS (
    SELECT user_id, anchor, COUNT(*) AS len,
           MIN(day_num) AS start_num, MAX(day_num) AS end_num
    FROM anchored GROUP BY user_id, anchor
), best AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY len DESC, start_num) AS rn,
           SUM(len) OVER (PARTITION BY user_id) AS n_active_days,
           COUNT(*) OVER (PARTITION BY user_id) AS n_streaks
    FROM streaks
)
SELECT user_id,
       CAST(n_active_days AS BIGINT) AS n_active_days,
       CAST(n_streaks AS BIGINT) AS n_streaks,
       CAST(len AS BIGINT) AS longest_streak_days,
       strftime(DATE '1970-01-01' + INTERVAL (start_num) DAY, '%Y-%m-%d') AS streak_start,
       strftime(DATE '1970-01-01' + INTERVAL (end_num) DAY, '%Y-%m-%d') AS streak_end
FROM best WHERE rn = 1
ORDER BY user_id
"""


CONVERSION_WINDOW_US = 3_600_000_000  # 1 hour


def funnel_within_1h_view_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The view→click→purchase funnel under a 1-hour conversion window
    per step — the realistic attribution variant of the unbounded
    registered funnel (a purchase a week after the click is not this
    campaign's conversion)."""
    events = catalog.load(spark, sf_dir, "events")
    return funnel(
        events, ["view", "click", "purchase"], within_us=CONVERSION_WINDOW_US
    )


FUNNEL_WITHIN_SQL = f"""
WITH e AS (
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
v AS (
    SELECT user_id, MIN(ts) AS t_view FROM e
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
      AND epoch_us(e.ts) <= epoch_us(v.t_view) + {CONVERSION_WINDOW_US}
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      AND epoch_us(e.ts) <= epoch_us(c.t_click) + {CONVERSION_WINDOW_US}
    GROUP BY e.user_id
)
SELECT v.user_id,
       strftime(t_view, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
       strftime(t_click, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(t_purchase, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       t_click IS NOT NULL AS reached_click,
       t_purchase IS NOT NULL AS reached_purchase,
       epoch_us(t_purchase) - epoch_us(t_view) AS view_to_purchase_micros
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
"""


# ---------------------------------------------------------------------------
# Interval union (covered time)


_HOUR_US = 3_600_000_000


def daily_coverage_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: total microseconds during which AT LEAST ONE user
    session is open (the union measure of all session intervals), plus
    the number of distinct covered stretches — "how much of the day
    was anyone active", the complement of peak concurrency.

    Interval union is the other classic sweep problem, and the naive
    merge (sort ALL intervals, walk once) is inherently sequential.
    The distributed form here: split every session at HOUR boundaries
    (closed-interval clipping, point sessions measure zero), so union
    is additive across disjoint hour cells, then run the classic
    island merge INSIDE each (hour) partition — a task never holds
    more than one hour of segments, at any corpus size. Island extent
    ``max(end) − min(start)`` is exact microseconds; the flag order is
    total (start, end, user, sid), so islands are deterministic.

    Sessions spanning midnight contribute to both days by
    construction — the midnight-probe lesson from
    :func:`peak_concurrent_sessions` applied structurally.
    """
    from pac_spark.functions.exact import int_div
    from pac_spark.streaming.windows import with_session_ids

    events = catalog.load(spark, sf_dir, "events")
    sessions = (
        with_session_ids(events)
        .select("user_id", "sid", F.unix_micros("ts").alias("us"))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s"), F.max("us").alias("e"))
    )
    hour = F.col("h") * F.lit(_HOUR_US)
    segs = (
        sessions.select(
            "user_id",
            "sid",
            "s",
            "e",
            F.explode(
                F.sequence(
                    int_div(F.col("s"), F.lit(_HOUR_US)),
                    int_div(F.col("e"), F.lit(_HOUR_US)),
                )
            ).alias("h"),
        )
        .select(
            "user_id",
            "sid",
            "h",
            F.greatest(F.col("s"), hour).alias("cs"),
            F.least(F.col("e"), hour + F.lit(_HOUR_US)).alias("ce"),
        )
        .filter(F.col("ce") > F.col("cs"))
    )
    order = W.partitionBy("h").orderBy("cs", "ce", "user_id", "sid")
    prev_max = F.max("ce").over(order.rowsBetween(W.unboundedPreceding, -1))
    flagged = segs.select(
        "h",
        "cs",
        "ce",
        "user_id",
        "sid",
        F.when(prev_max.isNull() | (F.col("cs") > prev_max), 1)
        .otherwise(0)
        .alias("new_island"),
    ).select(
        "h",
        "cs",
        "ce",
        F.sum("new_island")
        .over(order.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("island"),
    )
    from pac_spark.cache import pin

    # pinned: islands feeds BOTH cell_ends and the flagged join below
    # — unpinned, the sessionize-explode-window pipeline above would
    # re-execute per consumer (the peak_concurrent_sessions precedent)
    islands = pin(
        flagged.groupBy("h", "island").agg(
            F.min("cs").alias("i_start"),
            F.max("ce").alias("i_end"),
            (F.max("ce") - F.min("cs")).alias("covered"),
        )
    )
    # an island whose start sits exactly on its cell boundary continues
    # a stretch from the previous cell iff that cell has coverage
    # ending exactly there (clipping guarantees a boundary-crossing
    # stretch produces that pair) — such islands must not count as new
    # stretches, or every hour-crossing stretch counts once per hour
    # it touches (code-review r6 #1). Day boundaries are exempt: a
    # midnight-crossing stretch legitimately appears in both days'
    # per-day views. The cell-level join is calendar-sized.
    cell_ends = islands.groupBy("h").agg(
        F.max(
            F.when(F.col("i_end") == (F.col("h") + 1) * _HOUR_US, 1).otherwise(0)
        ).alias("ends_at_boundary")
    )
    prev = cell_ends.select(
        (F.col("h") + 1).alias("h"), F.col("ends_at_boundary").alias("prev_ends")
    )
    flagged_islands = islands.join(F.broadcast(prev), "h", "left").select(
        "h",
        "covered",
        F.when(
            (F.col("i_start") == F.col("h") * _HOUR_US)
            & (F.col("h") % 24 != 0)
            & (F.coalesce(F.col("prev_ends"), F.lit(0)) == 1),
            0,
        )
        .otherwise(1)
        .alias("is_new_stretch"),
    )
    return (
        flagged_islands.groupBy(
            F.date_format(
                F.timestamp_micros(F.col("h") * _HOUR_US), "yyyy-MM-dd"
            ).alias("day")
        )
        .agg(
            F.sum("covered").alias("covered_us"),
            F.sum("is_new_stretch").alias("n_stretches"),
        )
        .orderBy("day")
    )


COVERAGE_SQL = f"""
WITH lagged AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM events
), b AS (
    SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 600000000
                   THEN 1 ELSE 0 END AS brk
    FROM lagged
), sid AS (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM b
), sess AS (
    SELECT user_id, sid, MIN(us) AS s, MAX(us) AS e
    FROM sid GROUP BY user_id, sid
), segs AS (
    SELECT user_id, sid, u.h,
           GREATEST(s, u.h * {_HOUR_US}) AS cs,
           LEAST(e, u.h * {_HOUR_US} + {_HOUR_US}) AS ce
    FROM sess, UNNEST(generate_series(s // {_HOUR_US}, e // {_HOUR_US})) AS u(h)
), keep AS (
    SELECT * FROM segs WHERE ce > cs
), flagged AS (
    SELECT h, cs, ce,
           CASE WHEN MAX(ce) OVER (PARTITION BY h ORDER BY cs, ce, user_id, sid
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
                  OR cs > MAX(ce) OVER (PARTITION BY h ORDER BY cs, ce, user_id, sid
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island,
           user_id, sid
    FROM keep
), isl AS (
    SELECT h, cs, ce,
           SUM(new_island) OVER (PARTITION BY h ORDER BY cs, ce, user_id, sid
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM flagged
), islands AS (
    SELECT h, island, MIN(cs) AS i_start, MAX(ce) AS i_end,
           MAX(ce) - MIN(cs) AS covered
    FROM isl GROUP BY h, island
), cell_ends AS (
    SELECT h, MAX(CASE WHEN i_end = (h + 1) * {_HOUR_US} THEN 1 ELSE 0 END)
               AS ends_at_boundary
    FROM islands GROUP BY h
), flagged_islands AS (
    SELECT i.h, i.covered,
           CASE WHEN i.i_start = i.h * {_HOUR_US}
                 AND i.h % 24 <> 0
                 AND COALESCE(p.ends_at_boundary, 0) = 1
                THEN 0 ELSE 1 END AS is_new_stretch
    FROM islands i
    LEFT JOIN cell_ends p ON p.h + 1 = i.h
)
SELECT strftime(make_timestamp(h * {_HOUR_US}), '%Y-%m-%d') AS day,
       CAST(SUM(covered) AS BIGINT) AS covered_us,
       CAST(SUM(is_new_stretch) AS BIGINT) AS n_stretches
FROM flagged_islands
GROUP BY 1 ORDER BY day
"""


# ---------------------------------------------------------------------------
# Marketing attribution (last touch)


ATTRIBUTION_WINDOW_MIN = 60  # lookback from each purchase


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase credits the most
    recent ``view``/``click`` by the same user within the lookback
    window (purchases with no qualifying touch report as
    ``unattributed``), aggregated to per-channel purchase counts,
    revenue, and mean time-to-convert.

    Same scale posture as the as-of join above (module docstring): NO
    range self-join — one shuffle on user_id sorts touches and
    purchases together, a ``last_value(..., ignorenulls)`` ROWS window
    carries the latest touch forward, and the lookback cutoff is a
    row-local filter on the carried timestamp. A touch that shares a
    purchase's timestamp attributes when its event_id is lower (the
    (ts, event_id) total order decides "preceding", making ties
    deterministic instead of engine-dependent).

    Revenue uses the exact-cents sum; mean minutes-to-convert divides
    two exact integers (micros sum / count) once.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    is_touch = F.col("event_type").isin("view", "click")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = ev.select(
        "*",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    cutoff_us = ATTRIBUTION_WINDOW_MIN * 60 * 1_000_000
    # ONE qualification predicate and ONE delta expression shared by
    # both output branches — channel and delta_us must never disagree
    # about what "inside the lookback" means (code-review r7)
    delta = F.unix_micros("ts") - F.unix_micros("touch_ts")
    qualifies = F.col("touch_ts").isNotNull() & (delta <= cutoff_us)
    purchases = carried.filter(F.col("event_type") == "purchase").select(
        "cents",
        F.when(qualifies, F.col("touch_type"))
        .otherwise(F.lit("unattributed"))
        .alias("channel"),
        F.when(qualifies, delta).alias("delta_us"),
    )
    return (
        purchases.groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            (F.sum("cents") / F.lit(100.0)).cast("double").alias("revenue"),
            (
                F.sum("delta_us").cast("double")
                / F.count("delta_us").cast("double")
                / F.lit(60_000_000.0)
            ).alias("avg_minutes_to_touch"),
        )
        .orderBy("channel")
    )


ATTRIBUTION_SQL = f"""
WITH ev AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), carried AS (
    SELECT *,
           last_value(CASE WHEN event_type IN ('view', 'click') THEN ts END
                      IGNORE NULLS) OVER w AS touch_ts,
           last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                      IGNORE NULLS) OVER w AS touch_type
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), purchases AS (
    SELECT cents,
           CASE WHEN touch_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(touch_ts)
                         <= {ATTRIBUTION_WINDOW_MIN * 60 * 1_000_000}
                THEN touch_type ELSE 'unattributed' END AS channel,
           CASE WHEN touch_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(touch_ts)
                         <= {ATTRIBUTION_WINDOW_MIN * 60 * 1_000_000}
                THEN epoch_us(ts) - epoch_us(touch_ts) END AS delta_us
    FROM carried WHERE event_type = 'purchase'
)
SELECT channel,
       COUNT(*) AS n_purchases,
       CAST(CAST(SUM(cents) AS DOUBLE) / 100.0 AS DOUBLE) AS revenue,
       CAST(SUM(delta_us) AS DOUBLE) / CAST(COUNT(delta_us) AS DOUBLE)
           / 60000000.0 AS avg_minutes_to_touch
FROM purchases GROUP BY channel ORDER BY channel
"""


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-style run patterns

def pattern_runs_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 MATCH_RECOGNIZE's flagship shape — PATTERN
    (view+ click+ purchase+) — without the operator: per user, detect
    every place the event stream runs through one-or-more views, then
    IMMEDIATELY one-or-more clicks, then immediately one-or-more
    purchases, with no other event type breaking the chain. This is a
    different contract from the funnels (which allow arbitrary
    interleaving between stages): here adjacency is the predicate,
    which is what run-length encoding is for.

    Plan: one per-user window pass turns the stream into its runs
    (lag-change flag → running sum = run index; order key (ts,
    event_id) is unique, so no tie ever reaches a window compare),
    one aggregate collapses runs to (type, length, start), and two
    leads over the run table — already ~|event type changes| rows,
    far smaller than the corpus — read the A+B+C+ triple off. All
    per-user windows hash-partition on user_id; nothing global.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.withColumn(
            "chg",
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1,
            ).otherwise(0),
        )
        .withColumn("run_idx", F.sum("chg").over(w))
        .groupBy("user_id", "run_idx")
        .agg(
            F.first("event_type").alias("rtype"),
            F.count(F.lit(1)).alias("rlen"),
            F.min("ts").alias("rstart"),
        )
    )
    wr = W.partitionBy("user_id").orderBy("run_idx")
    return (
        runs.select(
            "user_id",
            "rtype",
            "rlen",
            "rstart",
            F.lead("rtype", 1).over(wr).alias("t1"),
            F.lead("rlen", 1).over(wr).alias("l1"),
            F.lead("rtype", 2).over(wr).alias("t2"),
            F.lead("rlen", 2).over(wr).alias("l2"),
        )
        .where(
            (F.col("rtype") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .select(
            "user_id",
            # string-format like every other spec in this module: the
            # driver hash compares rendered values, and raw timestamp
            # rendering is an engine choice
            F.date_format("rstart", _TS6).alias("match_start"),
            F.col("rlen").alias("n_views"),
            F.col("l1").alias("n_clicks"),
            F.col("l2").alias("n_purchases"),
        )
        .orderBy("user_id", "match_start")
    )


def PATTERN_RUNS_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
indexed AS (
    SELECT user_id, ts, event_type,
           SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_idx
    FROM flagged
),
runs AS (
    SELECT user_id, run_idx,
           MIN(event_type) AS rtype,
           CAST(COUNT(*) AS BIGINT) AS rlen,
           MIN(ts) AS rstart
    FROM indexed GROUP BY user_id, run_idx
),
led AS (
    SELECT user_id, rtype, rlen, rstart,
           LEAD(rtype, 1) OVER w AS t1, LEAD(rlen, 1) OVER w AS l1,
           LEAD(rtype, 2) OVER w AS t2, LEAD(rlen, 2) OVER w AS l2
    FROM runs
    WINDOW w AS (PARTITION BY user_id ORDER BY run_idx)
)
SELECT user_id, strftime(rstart, '%Y-%m-%d %H:%M:%S.%f') AS match_start,
       rlen AS n_views, l1 AS n_clicks, l2 AS n_purchases
FROM led
WHERE rtype = 'view' AND t1 = 'click' AND t2 = 'purchase'
ORDER BY user_id, match_start
"""


# ---------------------------------------------------------------------------
# Time-weighted average (step-function integral)


def time_weighted_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average event value: each event's value
    holds until the user's next event (a right-open step function),
    and the average weights by holding duration instead of event
    count — the standard readout for balances, prices, and gauge
    metrics, where ten rapid-fire updates must not out-vote one value
    held all day.

    Exactness: the integral is Σ cents·micros accumulated in
    decimal(38,0) (cents×micros ≈ 10¹⁷ per term — a BIGINT sum
    overflows at cluster scale, the ``corr_quality`` overflow lesson),
    divided once at the end as double. The step order is the total
    (ts, event_id), so duplicate timestamps form zero-width steps
    deterministically instead of reaching an engine-dependent window
    tie. Users whose events all share one timestamp have zero span
    and are excluded (a 0/0 average is undefined; the filter is
    stated in BOTH engines — ANSI mode would otherwise throw here).

    Scale shape: ONE window partitioned by user (lead), one
    map-side-combined groupBy — no global window, no self-join.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        "cents",
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    dec = "decimal(38,0)"
    agg = stepped.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.sum(F.col("dur_us").cast(dec)).alias("span_us"),
        F.sum((F.col("cents").cast(dec) * F.col("dur_us")).cast(dec)).alias("num"),
    )
    return (
        agg.filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_events",
            F.col("span_us").cast("long").alias("span_micros"),
            (
                F.col("num").cast("double")
                / F.col("span_us").cast("double")
                / F.lit(100.0)
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


def TWA_SQL() -> str:
    """STAGED for the r7/r8 rotation (gate: tests/test_staged_specs.py)."""
    return """
WITH e AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
),
stepped AS (
    SELECT user_id, cents,
           LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) - epoch_us(ts) AS dur_us
    FROM e
),
agg AS (
    SELECT user_id,
           COUNT(*) + 1 AS n_events,
           SUM(CAST(dur_us AS HUGEINT)) AS span_us,
           SUM(CAST(cents AS HUGEINT) * dur_us) AS num
    FROM stepped WHERE dur_us IS NOT NULL
    GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(span_us AS BIGINT) AS span_micros,
       CAST(num AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0 AS twa_value
FROM agg WHERE span_us > 0
ORDER BY user_id
"""


def user_daily_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-feature assembly — the feature-store read every
    churn/propensity model starts from: one row per (user, active
    day) with calendar features, exact rolling-7-day windows, the
    previous-day lag, and the NEXT-day purchase label. Leakage-safe
    by construction: every feature is drawn from day ``d`` and
    earlier, the label strictly from ``d+1``.

    Plan: one (user, day) aggregate over the scan, then a single
    user-partitioned day-ordered window pass computing all three
    temporal features — the 7-day sums use a RANGE frame over the
    integer day number (true calendar days, not "last 7 active
    rows"), the lag/lead features gate on ``datediff == 1`` so gaps
    read as zero/no-label rather than leaking across them. Exact
    integer cents everywhere; day-of-week is ``day_num % 7``
    (epoch-anchored, identical in both engines — no locale-dependent
    calendar function). Output value columns return to dollars only
    at the plan top.
    """
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.col("event_type"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
        F.sum("cents").alias("cents"),
    ).withColumn("day_num", F.datediff("day", F.lit("1970-01-01")).cast("long"))
    w_ord = W.partitionBy("user_id").orderBy("day_num")
    w_7d = w_ord.rangeBetween(-6, 0)
    prev_day = F.lag("day_num").over(w_ord)
    next_day = F.lead("day_num").over(w_ord)
    return daily.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        (F.col("day_num") % 7).alias("dow"),
        "n_events",
        "n_purchases",
        (F.col("cents") / 100.0).cast("double").alias("day_value"),
        F.sum("n_events").over(w_7d).alias("r7_events"),
        (F.sum("cents").over(w_7d) / 100.0).cast("double").alias("r7_value"),
        (
            F.when(prev_day == F.col("day_num") - 1, F.lag("cents").over(w_ord))
            .otherwise(F.lit(0))
            / 100.0
        )
        .cast("double")
        .alias("lag1_value"),
        F.when(
            (next_day == F.col("day_num") + 1)
            & (F.lead("n_purchases").over(w_ord) > 0),
            F.lit(1).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("label_next_day_purchase"),
    ).orderBy("user_id", "day")


FEATURES_SQL = """
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchases,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
    FROM events GROUP BY 1, 2
), dn AS (
    SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num FROM daily
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(day_num % 7 AS BIGINT) AS dow,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(CAST(cents AS DOUBLE) / 100.0 AS DOUBLE) AS day_value,
       CAST(SUM(n_events) OVER w7 AS BIGINT) AS r7_events,
       CAST(CAST(SUM(cents) OVER w7 AS DOUBLE) / 100.0 AS DOUBLE) AS r7_value,
       CAST(CAST(CASE WHEN LAG(day_num) OVER wo = day_num - 1
                      THEN LAG(cents) OVER wo ELSE 0 END AS DOUBLE)
            / 100.0 AS DOUBLE) AS lag1_value,
       CAST(CASE WHEN LEAD(day_num) OVER wo = day_num + 1
                      AND LEAD(n_purchases) OVER wo > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS label_next_day_purchase
FROM dn
WINDOW w7 AS (PARTITION BY user_id ORDER BY day_num
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
       wo AS (PARTITION BY user_id ORDER BY day_num)
ORDER BY user_id, day
"""


def conversion_latency_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: exact percentiles of the
    click→purchase latency (whole minutes, floored) per purchase
    hour-of-day — the conversion-funnel readout marketing dashboards
    chart, composed from two existing pieces: the as-of pairing
    (:func:`asof_join_purchase_click`, one user-keyed carried window,
    no range join) and the histogram percentile read-off
    (:func:`~pac_spark.operators.stats.group_percentiles_disc` —
    bounded by the latency-minute DOMAIN per hour, never buffering
    conversions). Unconverted purchases (no prior click) are excluded
    — this charts the latency of conversions that happened.
    """
    from pac_spark.functions.exact import int_div
    from pac_spark.operators.stats import group_percentiles_disc

    pairs = asof_join_purchase_click(spark, sf_dir).filter(
        F.col("click_id").isNotNull()
    )
    d = pairs.select(
        F.substring("purchase_ts", 12, 2).cast("int").alias("hour"),
        int_div(
            F.col("gap_micros").cast("long"), F.lit(60_000_000).cast("long")
        ).alias("latency_min"),
    )
    return (
        group_percentiles_disc(d, ["hour"], "latency_min")
        .withColumnRenamed("n_values", "n_conversions")
        .orderBy("hour")
    )


def CONVERSION_LATENCY_SQL() -> str:
    from pac_spark.operators.stats import PCTS

    reads = ",\n       ".join(
        f"MIN(CASE WHEN cum * 100 >= {p} * n THEN latency_min END) AS p{p}"
        for p in PCTS
    )
    return f"""
WITH pairs AS ({ASOF_ORACLE}),
conv AS (
    SELECT CAST(substring(purchase_ts, 12, 2) AS INT) AS hour,
           CAST(gap_micros AS BIGINT) // 60000000 AS latency_min
    FROM pairs WHERE click_id IS NOT NULL
),
hist AS (
    SELECT hour, latency_min, COUNT(*) AS c FROM conv GROUP BY 1, 2
),
cum AS (
    SELECT hour, latency_min, c,
           SUM(c) OVER (PARTITION BY hour ORDER BY latency_min
                        ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(c) OVER (PARTITION BY hour) AS n
    FROM hist
)
SELECT hour,
       CAST(MAX(n) AS BIGINT) AS n_conversions,
       {reads}
FROM cum GROUP BY hour ORDER BY hour
"""


def interarrival_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type: the distribution of
    gaps between a user's consecutive events of the same type — the
    workload-characterization readout behind capacity planning,
    session-gap calibration, and bot detection (a channel whose p50
    gap collapses toward zero is either a retry storm or a scraper).

    Gaps are PER (user, type) by stated semantics — cross-user gaps
    are meaningless and, structurally, the user-keyed window is what
    scales: partitioning by type alone would put each type's whole
    history in one task. NULL user_id / NULL ts rows are excluded in
    BOTH engines (no owner / no position; engines disagree on NULL
    sort order, the group_percentiles_disc rule).

    Exactness: gaps are integer micros off the (ts, event_id) total
    order (equal timestamps form deterministic zero-width gaps); the
    mean divides two exact integers once, decimal-carried so a
    100 TB event stream's micros sum cannot pass 2^53; percentiles
    quantize gaps to SECONDS first (stated semantics) so the shared
    histogram read-off runs over a domain-bounded frame instead of a
    per-gap-distinct one. One user-keyed window + one map-side
    aggregate + the histogram pass.
    """
    from pac_spark.functions.exact import int_div
    from pac_spark.operators.stats import group_percentiles_disc

    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (
                F.unix_micros("ts")
                - F.lag(F.unix_micros("ts")).over(w)
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return interarrival_readout(pin(gaps))


def interarrival_readout(gaps: DataFrame) -> DataFrame:
    """Shared readout tail over a (event_type, gap_us) frame — the
    batch operator's window-derived gaps AND the streaming twin's
    state-fold-derived gaps flow through this ONE definition, so the
    two formulations cannot drift (the cms_top_report precedent)."""
    from pac_spark.functions.exact import int_div
    from pac_spark.operators.stats import group_percentiles_disc

    DEC = "decimal(38,0)"
    s = F.sum(F.col("gap_us").cast(DEC))
    n = F.count(F.lit(1)).cast(DEC)
    base = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        ((s - s % n) / n).cast("long").alias("mean_gap_us"),
    )
    pcts = group_percentiles_disc(
        gaps.select(
            "event_type", int_div(F.col("gap_us"), F.lit(1_000_000)).alias("gap_s")
        ),
        ["event_type"],
        "gap_s",
        pcts=(50, 90, 99),
    ).select("event_type", "p50", "p90", "p99")
    return (
        base.join(pcts, "event_type")
        .select(
            "event_type",
            "n_gaps",
            "mean_gap_us",
            F.col("p50").alias("p50_gap_s"),
            F.col("p90").alias("p90_gap_s"),
            F.col("p99").alias("p99_gap_s"),
        )
        .orderBy("event_type")
    )


INTERARRIVAL_SQL = """
WITH ev AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
gaps AS (
    SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) AS gap_us
    FROM ev
),
g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL),
base AS (
    SELECT event_type, COUNT(*) AS n_gaps,
           CAST(SUM(CAST(gap_us AS HUGEINT)) // COUNT(*) AS BIGINT)
               AS mean_gap_us
    FROM g GROUP BY event_type
),
h AS (
    SELECT event_type, gap_us // 1000000 AS gap_s, COUNT(*) AS c
    FROM g GROUP BY 1, 2
),
wcum AS (
    SELECT event_type, gap_s,
           SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
           SUM(c) OVER (PARTITION BY event_type) AS nn
    FROM h
),
p AS (
    SELECT event_type,
           MIN(CASE WHEN cum * 100 >= 50 * nn THEN gap_s END) AS p50_gap_s,
           MIN(CASE WHEN cum * 100 >= 90 * nn THEN gap_s END) AS p90_gap_s,
           MIN(CASE WHEN cum * 100 >= 99 * nn THEN gap_s END) AS p99_gap_s
    FROM wcum GROUP BY event_type
)
SELECT base.event_type,
       CAST(n_gaps AS BIGINT) AS n_gaps,
       mean_gap_us,
       CAST(p50_gap_s AS BIGINT) AS p50_gap_s,
       CAST(p90_gap_s AS BIGINT) AS p90_gap_s,
       CAST(p99_gap_s AS BIGINT) AS p99_gap_s
FROM base JOIN p ON base.event_type = p.event_type
ORDER BY base.event_type
"""


def attribution_position_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted (U-shaped) revenue attribution: every
    ``view``/``click`` is assigned to the user's NEXT purchase within
    the ``ATTRIBUTION_WINDOW_MIN`` lookforward, and each purchase's
    credit splits 40% / 20% / 40% across first / middle / last touch —
    the multi-touch complement of ``attribution_last_touch`` (which
    answers "what closed", this answers "what opened AND what
    closed"). A single-touch purchase grants it full credit; a
    two-touch purchase splits 50/50.

    Credits are EXACT integer micro-units summing to 1,000,000 per
    attributed purchase by construction: the middle pool divides by
    truncating division and the remainder goes one micro each to the
    EARLIEST middles (largest-remainder order is touch order, a total
    order) — the water-filling discipline, so channel credit sums are
    bit-stable at any partitioning. Purchases with no qualifying touch
    report whole-credit under ``unattributed``.

    Scale posture (the as-of/last-touch rule): NO range self-join —
    one user_id shuffle sorts everything; the next purchase is a
    ``last_value(ignorenulls)`` carry over the DESCENDING (ts,
    event_id) order (at a touch row, the latest-seen purchase in that
    traversal IS the next one forward); the lookforward is a row-local
    filter. Then one purchase-keyed window (purchase ids are globally
    unique, so partition cardinality scales with purchases) numbers
    the touches, credit is a row-local formula, and one map-side
    channel aggregate reads off. Revenue-credit products are carried
    in decimal(38,0) (cents × micro-credit ~1e10/row — a double sum
    would drift, a long sum dies at corpus scale).
    """
    # NULL user_id / NULL ts rows are excluded in BOTH engines: no
    # owner to attribute within / no position in the (ts, event_id)
    # order, and the engines disagree on NULL sort placement
    ev = (
        catalog.load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    is_purchase = F.col("event_type") == "purchase"
    w_desc = (
        W.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = ev.select(
        "*",
        F.last(F.when(is_purchase, F.col("ts")), ignorenulls=True)
        .over(w_desc)
        .alias("p_ts"),
        F.last(F.when(is_purchase, F.col("event_id")), ignorenulls=True)
        .over(w_desc)
        .alias("p_id"),
        F.last(F.when(is_purchase, F.col("cents")), ignorenulls=True)
        .over(w_desc)
        .alias("p_cents"),
    )
    cutoff_us = ATTRIBUTION_WINDOW_MIN * 60 * 1_000_000
    delta = F.unix_micros("p_ts") - F.unix_micros("ts")
    qualifies = F.col("p_ts").isNotNull() & (delta <= cutoff_us)
    assigned = carried.filter(
        F.col("event_type").isin("view", "click") & qualifies
    ).select("event_type", "ts", "event_id", "p_id", "p_cents")
    wp = W.partitionBy("p_id")
    pos = F.row_number().over(wp.orderBy("ts", "event_id"))
    m = F.count(F.lit(1)).over(wp.orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    ))
    mid_pool = F.lit(200_000)
    mid_n = m - 2
    base_mid = (mid_pool - mid_pool % mid_n) / mid_n
    credit = (
        F.when(m == 1, F.lit(1_000_000))
        .when(m == 2, F.lit(500_000))
        .when((pos == 1) | (pos == m), F.lit(400_000))
        .otherwise(
            base_mid.cast("long")
            + F.when(pos - 1 <= mid_pool % mid_n, F.lit(1)).otherwise(F.lit(0))
        )
    )
    DEC = "decimal(38,0)"
    # DELIBERATELY UNPINNED (r11 measurement): pin(scored) produced the
    # smaller executed plan (2 scans/5 exchanges vs 3/7) but measured
    # SLOWER in a same-JVM interleaved A/B at BOTH scale points —
    # 1.07x at sf0.1, 1.14-1.22x at a 10x events blow-up — because the
    # materialization costs more than the window replay it avoids
    # (Catalyst already column-prunes the orphan branch's unused carry
    # columns, so the "replayed window" was partially free). The
    # er_candidate_pairs lesson again: fewer exchanges != faster; a
    # pin must buy its keep on the clock. Re-pin candidate: only if a
    # measured run at a scale point where the touch frame stops
    # fitting the shuffle comfortably shows the recompute dominating.
    scored = assigned.select(
        F.col("event_type").alias("channel"),
        "p_id",
        "p_cents",
        credit.alias("credit_micros"),
    )
    attributed = scored.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("p_id").alias("n_purchases"),
        F.sum("credit_micros").cast("long").alias("credit_micros"),
        (
            F.sum(
                (F.col("p_cents") * F.col("credit_micros")).cast(DEC)
            ).cast("double")
            / 1e6
            / 100.0
        ).alias("attributed_revenue"),
    )
    # orphan purchases come straight off the pre-window event frame:
    # a purchase row's carry columns are never read, so deriving this
    # branch from `carried` would replay the whole user window just to
    # drop its outputs (plan-audit r11)
    purchases = ev.filter(is_purchase).select("event_id", "cents")
    orphan = (
        purchases.join(
            scored.select(F.col("p_id").alias("event_id")).distinct(),
            "event_id",
            "left_anti",
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("_cents"),
        )
        .select(
            F.lit("unattributed").alias("channel"),
            F.lit(0).cast("long").alias("n_touches"),
            "n_purchases",
            (F.col("n_purchases") * 1_000_000).alias("credit_micros"),
            (F.col("_cents").cast("double") / 100.0).alias(
                "attributed_revenue"
            ),
        )
    )
    return attributed.unionByName(orphan).orderBy("channel")


POSITION_ATTRIBUTION_SQL = f"""
WITH ev AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
carried AS (
    SELECT *,
           last_value(CASE WHEN event_type = 'purchase' THEN ts END
                      IGNORE NULLS) OVER w AS p_ts,
           last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                      IGNORE NULLS) OVER w AS p_id,
           last_value(CASE WHEN event_type = 'purchase' THEN cents END
                      IGNORE NULLS) OVER w AS p_cents
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
assigned AS (
    SELECT event_type, ts, event_id, p_id, p_cents
    FROM carried
    WHERE event_type IN ('view', 'click') AND p_ts IS NOT NULL
      AND epoch_us(p_ts) - epoch_us(ts) <= {60 * 60 * 1_000_000}
),
numbered AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY ts, event_id) AS pos,
           COUNT(*) OVER (PARTITION BY p_id) AS m
    FROM assigned
),
scored AS (
    SELECT event_type AS channel, p_id, p_cents,
           CASE WHEN m = 1 THEN 1000000
                WHEN m = 2 THEN 500000
                WHEN pos = 1 OR pos = m THEN 400000
                ELSE 200000 // (m - 2)
                     + CASE WHEN pos - 1 <= 200000 % (m - 2)
                            THEN 1 ELSE 0 END
           END AS credit_micros
    FROM numbered
),
attributed AS (
    SELECT channel,
           COUNT(*) AS n_touches,
           COUNT(DISTINCT p_id) AS n_purchases,
           SUM(credit_micros) AS credit_micros,
           CAST(SUM(CAST(p_cents AS HUGEINT) * credit_micros) AS DOUBLE)
               / 1e6 / 100.0 AS attributed_revenue
    FROM scored GROUP BY channel
),
orphan AS (
    SELECT 'unattributed' AS channel,
           CAST(0 AS BIGINT) AS n_touches,
           COUNT(*) AS n_purchases,
           COUNT(*) * 1000000 AS credit_micros,
           CAST(COALESCE(SUM(cents), 0) AS DOUBLE) / 100.0
               AS attributed_revenue
    FROM carried
    WHERE event_type = 'purchase'
      AND event_id NOT IN (SELECT DISTINCT p_id FROM scored)
)
SELECT channel, CAST(n_touches AS BIGINT) AS n_touches,
       CAST(n_purchases AS BIGINT) AS n_purchases,
       CAST(credit_micros AS BIGINT) AS credit_micros,
       attributed_revenue
FROM attributed
UNION ALL SELECT * FROM orphan
ORDER BY channel
"""
