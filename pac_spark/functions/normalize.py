"""String normalization expressions (reference functions F1-F4).

All JVM-side built-ins — these run inside whole-stage codegen, never in
Python, so they cost nothing extra at 100 TB scan scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "PY_SPLIT_WS",
    "normalize_ticker",
    "normalize_string",
    "name_parts",
    "sanitize_key",
]

# The EXACT character set Python's str.split() treats as whitespace
# (str.isspace() == True on CPython 3.x): ASCII \t\n\v\f\r, the
# FS/GS/RS/US separators, space, NEL, NBSP, Ogham space mark,
# en-quad..hair-space, line/paragraph separators, NNBSP, MMSP and the
# ideographic space. The reference normalizes with str.split()
# (executive_review_tool.py:174), so a Java-regex `\s+` (ASCII-only)
# silently diverged on any non-ASCII whitespace — and so did the
# DuckDB oracles' RE2 `\s`. Built with Python escapes so the class
# body holds the LITERAL characters, legal in both Java regex (Spark)
# and RE2 (DuckDB) character classes; interpolate as `[{PY_SPLIT_WS}]+`.
PY_SPLIT_WS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f "
    "\x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000"
)


def normalize_ticker(col: Column) -> Column:
    """Upper-cased, trimmed ticker (ref: index_align_to_firebase.py:245)."""
    return F.upper(F.trim(col))


def normalize_string(col: Column) -> Column:
    """Lower, trim, collapse internal whitespace — the whitespace set
    is Python's ``str.split()`` set, matching the reference's
    ``' '.join(s.split())`` exactly (executive_review_tool.py:168-175;
    rotation r9 queue: the old ``\\s+`` was ASCII-only)."""
    return F.lower(F.trim(F.regexp_replace(col, f"[{PY_SPLIT_WS}]+", " ")))


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
