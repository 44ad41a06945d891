"""DataFrame-native bloom-filter join pruning.

Spark's optimizer injects exactly this shape on its own for some join
trees (``InjectRuntimeFilter``: build a bloom filter from the small
side of a selective join, evaluate it map-side on the big side before
the shuffle) — but the ``bloom_filter_agg`` / ``might_contain``
expressions it uses are internal, not resolvable from SQL or the
public API. This module re-creates the technique from public pieces so
the engine can apply it deliberately, not just when the optimizer
happens to fire:

- **build**: k bit positions per key via seeded ``xxhash64`` (JVM
  codegen, no UDF), reduced to a ``m/64``-word bitmap with one
  map-side-combined ``bit_or`` aggregate, materialized on the driver.
  This is the same driver-side materialization a broadcast exchange
  performs — the bitmap (a few KB) stands in for shipping the key set.
- **probe**: a pure Column predicate over the bitmap embedded as an
  array literal: k word-index/bit-mask tests, AND-ed. Whole-stage
  codegen, evaluated at the scan side of the fact table BEFORE its
  shuffle — rows that cannot join never get hashed, serialized, or
  sent over the network.

False positives pass the pre-filter and are eliminated by the real
join; false negatives are impossible, so results are EXACTLY the plain
join's (the registered query's oracle states the plain join, and the
hash check proves it). At 100 TB the win is the shuffle-volume cut:
with a 0.1%-selective dim, ~99.9% of fact rows drop map-side for the
cost of one broadcast variable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "build_bloom", "bloom_might_contain"]

_DEFAULT_BITS = 1 << 16  # 64 Kbit = 1024 words; FPR < 1% up to ~6k keys
_DEFAULT_HASHES = 4


class BloomFilter:
    """Immutable bitmap + parameters, built by :func:`build_bloom`.

    ``key_type`` records the BUILD column's dtype: xxhash64 is
    type-sensitive (an INT and a BIGINT holding the same value hash
    differently), so probing with a differently-typed column would
    produce FALSE NEGATIVES — silently dropping matching rows before
    the real join. :func:`bloom_might_contain` casts the probe column
    to this recorded type (a no-op cast Catalyst removes when the
    types already agree; code-review r8). A probe value outside the
    build type's range fails that cast loudly under ANSI mode — safe
    (never a silent wrong result) and a signal the filter was built
    on the wrong key type."""

    def __init__(
        self, words: list[int], n_bits: int, n_hashes: int, key_type: str
    ):
        if n_bits % 64 != 0 or len(words) != n_bits // 64:
            raise ValueError("bloom bitmap shape mismatch")
        self.words = words
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.key_type = key_type


def _one_shifted_by(bits: Column) -> Column:
    """``1L << bits`` with a Column shift amount (the Python
    ``F.shiftleft`` wrapper only takes a literal int)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits.cast("int"))


def _positions(col: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions for a key: xxhash64(key, seed) mod m. The seed
    rides as a second hashed column — one codegen'd expression per
    position, deterministic across partitionings and sessions."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    column: str,
    n_bits: int = _DEFAULT_BITS,
    n_hashes: int = _DEFAULT_HASHES,
) -> BloomFilter:
    """Aggregate ``keys[column]`` into a bloom bitmap.

    One explode (k rows per key) + one map-side-combined ``bit_or``
    groupBy over at most ``n_bits/64`` word indexes; the driver
    collects the ≤1024-row word table — the bounded-scalar collect
    regime (a broadcast build, not a data read).
    """
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(column), n_bits, n_hashes))).alias(
            "pos"
        )
    )
    word_rows = (
        pos.select(
            F.shiftright("pos", 6).cast("int").alias("w"),
            _one_shifted_by(F.col("pos").bitwiseAND(F.lit(63))).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in word_rows:
        words[r["w"]] = r["mask"]
    key_type = keys.schema[column].dataType.simpleString()
    return BloomFilter(words, n_bits, n_hashes, key_type)


def bloom_might_contain(bf: BloomFilter, col: Column) -> Column:
    """Pure-Column membership test: true for every inserted key, true
    with probability ~FPR for others. The bitmap rides as an array
    literal inside the expression, so the predicate is evaluated by
    whole-stage codegen at the probe table's scan — before any
    shuffle."""
    # one foldable array literal — F.array(lit, lit, ...) is a
    # CreateArray evaluated per row (measured 2x slower on the probe
    # scan); F.lit(list) ships the bitmap as a single constant
    bitmap = F.lit(bf.words)
    cond = None
    # cast to the BUILD column's dtype: xxhash64 is type-sensitive, so
    # an untyped probe of e.g. BIGINT against an INT-built filter
    # would hash to different positions and drop true matches
    for h in _positions(col.cast(bf.key_type), bf.n_bits, bf.n_hashes):
        word = F.element_at(bitmap, F.shiftright(h, 6).cast("int") + F.lit(1))
        mask = _one_shifted_by(h.bitwiseAND(F.lit(63)))
        test = word.bitwiseAND(mask) != F.lit(0)
        cond = test if cond is None else cond & test
    return cond
