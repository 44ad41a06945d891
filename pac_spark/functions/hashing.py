"""Deterministic md5-prefix bucketing, shared across engines.

The engine's only randomness substitute is a salted md5 prefix read as
an integer: reproducible on any cluster layout, no RNG state, and
replayable digit-by-digit in the DuckDB oracle. The Spark Column form
and the SQL text emitter live TOGETHER here so the two can never drift
apart and silently break cross-engine equivalence (the same reason
``relational._idiv`` was promoted to ``functions.exact.int_div``).
Legacy 4-digit call sites (``curation._sample_bucket``, the
training-shard layout) predate this module and keep their local
spelling; new bucketing goes through here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_bucket", "md5_bucket_sql", "md5_u60", "md5_u60_sql"]


def md5_bucket(expr: Column, modulus: int) -> Column:
    """First 8 md5 hex digits of (already-salted) string ``expr`` as
    an integer mod ``modulus``. 32 hash bits dwarf any realistic
    modulus, so the mod is uniform."""
    h = F.md5(F.encode(expr, "UTF-8"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % modulus).cast("int")


def _md5_digits_sql(expr: str, n_digits: int) -> str:
    """The ONE digit-wise md5-prefix-to-integer SQL emitter (DuckDB
    has no base-16 ``conv``): sum of hex-digit values times descending
    powers of 16. Shared by :func:`md5_bucket_sql` (8 digits) and
    :func:`md5_u60_sql` (15 digits) so a decoding fix can never land
    in one and not the other (code-review r8)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substring(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (n_digits - 1 - i)}"
        for i in range(n_digits)
    )


def md5_bucket_sql(expr: str, modulus: int) -> str:
    """DuckDB text computing exactly what :func:`md5_bucket` computes,
    digit-wise."""
    return f"CAST(({_md5_digits_sql(expr, 8)}) % {modulus} AS INT)"


def md5_u60(expr: Column) -> Column:
    """First 15 md5 hex digits of (already-salted) string ``expr`` as
    a 60-bit non-negative BIGINT — enough hash material for register
    sketches (HyperLogLog needs register index + geometric bits, which
    32-bit :func:`md5_bucket` can't supply)."""
    h = F.md5(F.encode(expr, "UTF-8"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def md5_u60_sql(expr: str) -> str:
    """DuckDB text computing exactly :func:`md5_u60`, digit-wise."""
    return f"CAST(({_md5_digits_sql(expr, 15)}) AS BIGINT)"
