"""Deterministic (engine-portable) aggregate arithmetic.

Floating-point SUM is order-dependent: Spark's partial/final aggregation
tree and DuckDB's serial scan accumulate doubles in different orders, so
``SUM(double)`` can differ in the last ulps between engines and break an
exact value-hash comparison. Money-like columns in the testdata are
2-decimal values, so we sum them *exactly* by rounding to integer cents,
summing as BIGINT (associative, order-independent), and dividing back.

The same pattern is emitted as SQL text for the DuckDB oracle so both
engines compute bit-identical results. This is also the right call at
100 TB scale: integer sums never lose precision no matter how many
partial-aggregation levels AQE inserts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["money_sum", "money_sum_sql", "exact_avg", "exact_avg_sql", "int_div"]


def int_div(a: Column, b: Column) -> Column:
    """Exact integer division of long Columns with TRUNCATION-toward-
    zero semantics for a negative numerator (``b`` must be positive).
    The remainder is subtracted FIRST (long arithmetic, exact; Spark's
    ``%`` follows the dividend sign, so ``a - a%b`` is the trunc
    multiple for either sign), so the one double division is of an
    exact multiple of ``b`` — IEEE correctly-rounded division returns
    the integer quotient exactly for any multiple below 2^53 in
    magnitude, far past any group size. No value ever sits near a
    floor boundary (ADVICE r5 #4: a plain ``floor(a / b)`` form could
    floor across a boundary on a pathological near-integer double
    quotient — and would also be FLOOR, not trunc, for negatives).
    The trunc-for-negatives guarantee is load-bearing: Theil–Sen and
    Mann–Kendall feed negative slope numerators and DuckDB's BIGINT
    ``//`` truncates toward zero identically (verified: -7//2 = -3);
    any rewrite of this helper must preserve it. DuckDB mirror: the
    ``//`` integer-division operator on BIGINT operands.

    HARD CONTRACT: the NUMERATOR ``a - a%b`` must stay below 2^53 —
    the long->double conversion itself rounds above that, BEFORE the
    division (caught live by the HLL sketch's 60-bit hashes, r6). For
    wider operands use decimal Columns (decimal division is exact
    here) or, for power-of-two divisors, ``F.shiftright``."""
    return ((a - a % b) / b).cast("long")


def money_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a fixed-decimal double column."""
    factor = 10**scale
    cents = F.round(col * F.lit(factor)).cast("long")
    return (F.sum(cents) / F.lit(float(factor))).cast("double")


def money_sum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB SQL text computing exactly what :func:`money_sum` computes."""
    factor = 10**scale
    return (
        f"CAST(CAST(SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / {float(factor)} AS DOUBLE)"
    )


def exact_avg(col: Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact integer sum divided by exact count."""
    factor = 10**scale
    cents = F.round(col * F.lit(factor)).cast("long")
    return (F.sum(cents) / (F.count(col) * F.lit(float(factor)))).cast("double")


def exact_avg_sql(expr: str, scale: int = 2) -> str:
    factor = 10**scale
    return (
        f"CAST(CAST(SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / (COUNT({expr}) * {float(factor)}) AS DOUBLE)"
    )
