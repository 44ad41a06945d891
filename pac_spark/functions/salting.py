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
from pyspark.sql import types as T

__all__ = ["salted_join"]

_SALT_COL = "__pac_salt_6f3a"  # unlikely name; a collision raises below


def _hashable(dtype: T.DataType) -> bool:
    """xxhash64 rejects maps (and variants) — nested arrays/structs are
    fine as long as they don't contain a map anywhere."""
    if isinstance(dtype, (T.MapType, getattr(T, "VariantType", T.MapType))):
        return False
    if isinstance(dtype, T.ArrayType):
        return _hashable(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return all(_hashable(f.dataType) for f in dtype.fields)
    return True


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
    would emit it ``n_salts`` times instead of once. The salt hashes
    every hashable big-side column (maps can't feed xxhash64); at
    least one non-key hashable column must exist, otherwise every row
    of a hot key would land in one salt bucket anyway.
    """
    allowed = {
        "inner",
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
    if isinstance(on, str):
        # a bare str satisfies Sequence[str] and would iterate as
        # CHARACTERS (join on single-letter column names) — accept it
        # the way DataFrame.join does (code-review r8)
        on = [on]
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: unmatched "
            "small-side rows would appear once per salt replica"
        )
    for side, name in ((big, "big"), (small, "small")):
        if _SALT_COL in side.columns:
            raise ValueError(
                f"{name} side already carries the internal salt column "
                f"{_SALT_COL!r}; rename it before salting"
            )
    # the salt must come from NON-key columns: hashing only the join
    # keys sends every row of a hot key to one salt bucket — a silent
    # no-op that defeats the whole point
    salt_src = [
        f.name
        for f in big.schema.fields
        if f.name not in set(on) and _hashable(f.dataType)
    ]
    if not salt_src:
        raise ValueError(
            "salted_join needs at least one hashable non-key big-side "
            "column to derive the salt from (maps are not hashable; "
            "join keys alone cannot spread a hot key)"
        )
    salt: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts)
    )
    b = big.withColumn(_SALT_COL, salt)
    s = small.withColumn(
        _SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[*on, _SALT_COL], how=how).drop(_SALT_COL)
