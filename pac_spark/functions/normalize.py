"""String normalization expressions (reference functions F1-F4).

All JVM-side built-ins — these run inside whole-stage codegen, never in
Python, so they cost nothing extra at 100 TB scan scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_ticker", "normalize_string", "name_parts", "sanitize_key"]


def normalize_ticker(col: Column) -> Column:
    """Upper-cased, trimmed ticker (ref: index_align_to_firebase.py:245)."""
    return F.upper(F.trim(col))


def normalize_string(col: Column) -> Column:
    """Lower, trim, collapse internal whitespace
    (ref: executive_review_tool.py:168-175)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def name_parts(col: Column) -> tuple[Column, Column]:
    """(first_token, last_token) of a normalized name — a SINGLE-token
    name yields ``(token, '')``, exactly the reference's
    ``extract_name_parts`` (executive_review_tool.py:177-187, the
    ``len(parts) == 1`` branch); the pre-r8 last-token read-off
    returned the token twice, a live parity divergence on every
    single-token name (code-review r8)."""
    arr = F.split(normalize_string(col), " ")
    last = F.when(F.size(arr) >= 2, F.element_at(arr, -1)).otherwise(F.lit(""))
    return F.element_at(arr, 1), last


def sanitize_key(col: Column) -> Column:
    """Sink-key sanitization: spaces -> underscores, drop ',' and '.'
    (ref: executive_review_tool.py:575,581)."""
    return F.translate(F.regexp_replace(col, " ", "_"), ",.", "")
