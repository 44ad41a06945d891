"""Fuzzy string similarity expressions (reference functions F5-F7).

The reference scores record pairs with rapidfuzz's ``token_sort_ratio``
/ ``ratio`` and blends per-field scores with weights 0.5 (name),
0.25 (address), 0.15 (title), 0.1 (company), renormalized over the
fields present (executive_review_tool.py:189-242).

Spark has no fuzzy-ratio builtin, but it has ``levenshtein``; the
classic ``ratio`` is expressed as::

    100 * (1 - levenshtein(a, b) / greatest(length(a), length(b)))

and ``token_sort_ratio`` applies the same ratio to the token-sorted
normalization of each side. This differs from rapidfuzz on edge cases
(rapidfuzz uses InDel distance, i.e. no substitutions), so the engine
treats thresholds — 75 group / 85 auto-approve — as the contract, not
raw score parity. An optional rapidfuzz-backed Pandas UDF provides
exact parity when the wheel is available (it is not in this container).

Everything here is a pure Column expression: codegen'd JVM execution,
safe inside a blocked similarity join over billions of pairs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pac_spark.functions.normalize import normalize_string

__all__ = [
    "token_sort_key",
    "levenshtein_ratio",
    "token_sort_ratio",
    "weighted_similarity",
    "FIELD_WEIGHTS",
]

# ref: executive_review_tool.py:206,214,222,231
FIELD_WEIGHTS = {"name": 0.5, "address": 0.25, "title": 0.15, "company": 0.1}


def token_sort_key(col: Column) -> Column:
    """Normalize then sort whitespace tokens — the canonical form that
    token_sort_ratio compares (ref: executive_review_tool.py:204)."""
    return F.array_join(F.sort_array(F.split(normalize_string(col), " ")), " ")


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """0-100 similarity ratio via Levenshtein distance.

    Both-empty compares as 100 (identical); one-empty as 0.
    """
    la, lb = F.length(a), F.length(b)
    longest = F.greatest(la, lb)
    return (
        F.when(longest == 0, F.lit(100.0))
        .otherwise(100.0 * (1.0 - F.levenshtein(a, b) / longest))
        .cast("double")
    )


def token_sort_ratio(a: Column, b: Column) -> Column:
    """Ratio over token-sorted normalized strings
    (ref: executive_review_tool.py:204,213,221)."""
    return levenshtein_ratio(token_sort_key(a), token_sort_key(b))


def weighted_similarity(scores: dict[str, Column]) -> Column:
    """Blend per-field scores with reference weights, renormalizing over
    the fields actually present, like executive_review_tool.py:233-242.

    ``scores`` maps field role -> score Column (null when the field is
    absent for the pair). Returns a 0-100 double; null only if every
    field is absent.

    CALLER CONTRACT (code-review r8): the reference treats a field as
    absent when its NORMALIZED form is empty (``if name1 and name2:``
    AFTER ``normalize_string`` — so whitespace-only fields are absent
    too), and this helper sees only score columns — the caller must
    pass NULL scores for such fields. ``_score_aliased_pairs`` does,
    by guarding on emptiness of the per-record scoring keys
    (normalized forms), which IS the reference's test; the crafted
    cross-engine pin is
    ``test_properties.py::test_blank_as_absent_scoring_parity``. A raw
    ratio for an empty-vs-empty pair is 100 and would inflate the
    blend toward auto-approval.
    """
    num = None
    den = None
    for role, score in scores.items():
        w = FIELD_WEIGHTS[role]
        contrib = F.when(score.isNotNull(), score * F.lit(w)).otherwise(F.lit(0.0))
        weight = F.when(score.isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
        num = contrib if num is None else num + contrib
        den = weight if den is None else den + weight
    return F.when(den > 0, num / den).otherwise(F.lit(None)).cast("double")
