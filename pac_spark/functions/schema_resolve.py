"""Fuzzy column-role resolution (reference operators P1/P2, §1.3).

The reference discovers physical schemas at runtime and maps logical
roles to physical columns by candidate-name matching
(index_align_to_firebase.py:183-222) and substring matching
(executive_review_tool.py:244-272). In Spark this is a *pre-plan*
concern: resolve names against ``df.schema`` once on the driver, then
build the declarative plan with the resolved names — no Catalyst work,
no per-row cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_role", "resolve_role_substring", "project_roles"]


def resolve_role(df: DataFrame, candidates: list[str]) -> str | None:
    """First column whose name case-insensitively equals a candidate
    (ref: index_align_to_firebase.py:183-202 ticker/issue resolution)."""
    lower_map = {c.lower(): c for c in df.columns}
    for cand in candidates:
        if cand.lower() in lower_map:
            return lower_map[cand.lower()]
    return None


def resolve_role_substring(df: DataFrame, variations: list[str]) -> str | None:
    """First column whose name contains any variation as a substring
    (ref: executive_review_tool.py:244-272)."""
    for col in df.columns:
        low = col.lower()
        for var in variations:
            if var.lower() in low:
                return col
    return None


def project_roles(df: DataFrame, roles: dict[str, list[str]], substring: bool = False) -> DataFrame:
    """Select one column per logical role, aliased to the role name.

    Roles that resolve to no physical column are emitted as null string
    columns (the reference falls back to the name column or skips,
    executive_review_tool.py:653 — emitting typed nulls keeps downstream
    plans uniform).
    """
    resolver = resolve_role_substring if substring else resolve_role
    cols = []
    for role, candidates in roles.items():
        phys = resolver(df, candidates)
        if phys is None:
            cols.append(F.lit(None).cast("string").alias(role))
        else:
            # df[phys], not F.col(phys): a runtime-discovered name
            # containing a dot would misparse as struct-field access
            # in exactly the module built for arbitrary schemas
            # (code-review r8)
            cols.append(df[phys].alias(role))
    return df.select(*cols)
