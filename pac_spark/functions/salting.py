"""Explicit key salting for skew-heavy equi-joins.

AQE's skew-join splitting (enabled session-wide) covers sort-merge
shuffle joins, but some shapes still hot-spot on a single key: an
explosive build side it can't split, or stateful streaming joins where
AQE never runs. ``salted_join`` is the manual tool for those: the big
side gets a deterministic salt in ``[0, n_salts)``, the small side is
replicated ``n_salts`` ways, and the join key becomes (key, salt) — a
key carrying half the table now spreads across ``n_salts`` tasks at
the cost of replicating the small side.

The salt is a hash of the big side's row, not a random number: results
are identical across retries and speculative attempts (a ``rand()``
salt breaks exactly-once task semantics under retry).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join of ``big`` with ``small`` on ``on``;
    result rows are identical to ``big.join(small, on, how)``.

    Only big-side-preserving join types are valid: an unmatched
    small-side row exists once per salt replica, so right/full outer
    would emit it ``n_salts`` times instead of once.
    """
    allowed = {
        "inner",
        "cross",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: unmatched "
            "small-side rows would appear once per salt replica"
        )
    salt: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    )
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[*on, "__salt"], how=how).drop("__salt")
