"""Zero-extra-scan data-quality metrics via ``Dataset.observe``.

Every ingest wants row counts, null ratios, and domain violations —
but a separate validation query re-scans the table, which at 100 TB
doubles the ingest cost. Spark's observation API attaches aggregate
metrics to an EXISTING plan: they are accumulated by the same tasks
that execute the query, so the metrics are free (one tree-reduce of a
few numbers at job end, no second scan).

The reference's validation passes are separate full reads of what was
just written (read-back verify, ``index_align_to_firebase.py:406-412``
count re-checks); the write-verification sink keeps that explicit
read-back (S8), while this module is the scan-free tier for the
metrics that don't need byte-level certainty.

Usage::

    df, metrics = observe_quality(df, {
        "n_rows": F.count(F.lit(1)),
        "null_keys": F.sum(F.col("k").isNull().cast("long")),
    })
    df.write.parquet(...)          # or any other single action
    stats = metrics()              # dict, available after the action

``Observation.get`` blocks until the action completes and may only be
consumed once per observation — hence the fresh Observation per call.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = ["observe_quality", "standard_quality_metrics"]


def observe_quality(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Callable[[], dict]]:
    """Attach named aggregate metrics to ``df``'s plan. Returns the
    observed frame (use it in place of ``df``) and a thunk that yields
    the metric dict after the frame's first action."""
    obs = Observation()
    observed = df.observe(obs, *[m.alias(name) for name, m in metrics.items()])
    return observed, lambda: obs.get


def standard_quality_metrics(
    df: DataFrame, key_cols: list[str], value_cols: list[str]
) -> dict[str, Column]:
    """The ingest-gate metric set: total rows, per-key-column null
    counts, per-value-column null counts and negative counts. All are
    plain aggregates, so they ride the observation tree-reduce."""
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in key_cols:
        out[f"null_{c}"] = F.sum(F.col(c).isNull().cast("long"))
    for c in value_cols:
        out[f"null_{c}"] = F.sum(F.col(c).isNull().cast("long"))
        out[f"neg_{c}"] = F.sum((F.col(c) < 0).cast("long"))
    return out
