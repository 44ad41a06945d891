"""Custom connector via the Spark 4 Python DataSource API, with REAL
partition pruning through ``pushFilters``.

The reference family's sources are all pre-existing files/DBMSes; a
complete engine also owes users the other direction — plugging a NEW
system in as a first-class source. Spark 4's Python DataSource API is
the supported seam (SPARK-44076), and this module exercises the parts
that matter at scale:

- ``partitions()`` plans one ``InputPartition`` per logical day, so a
  year of synthetic data arrives as 365 parallel generator tasks, not
  one driver loop;
- ``pushFilters()`` consumes ``day_num`` comparison filters and PRUNES
  partitions before they are ever planned — the Python-source analog
  of parquet partition pruning. Unsupported filters are handed back
  for Spark to evaluate, exactly per the API contract;
- generation is DETERMINISTIC (md5 of seed/day/index), so reads are
  reproducible at any parallelism, re-listable for retries, and
  testable by value.

The concrete source generates a synthetic event stream shaped like the
driver's ``events`` table — in production the same skeleton wraps any
REST/queue/proprietary reader.

Deployment note: ``pushFilters`` is only consulted when
``spark.sql.python.filterPushdown.enabled=true`` (Spark refuses to
silently ignore an implemented pushdown — it raises
DATA_SOURCE_PUSHDOWN_DISABLED instead, a deliberate fail-loud
contract this module inherits).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["SyntheticEventsDataSource", "SYNTH_SCHEMA"]

SYNTH_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("day_num", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_TYPES = ("view", "click", "purchase")


def _h(seed: int, day: int, i: int) -> int:
    return int(
        hashlib.md5(f"{seed}|{day}|{i}".encode()).hexdigest()[:15], 16
    )


@dataclass
class _DayPartition(InputPartition):
    day: int


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 7))
        self.n_days = int(options.get("n_days", 10))
        self.per_day = int(options.get("events_per_day", 100))
        self.n_users = int(options.get("n_users", 20))
        # day range the pushed-down filters have narrowed to (half-open)
        self.lo = 0
        self.hi = self.n_days

    def pushFilters(self, filters: list[Filter]):
        """Consume day_num range filters (pruning partitions); yield
        back everything else for Spark to evaluate post-scan."""
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col == "day_num" and isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif col == "day_num" and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif col == "day_num" and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif col == "day_num" and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif col == "day_num" and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self):
        return [_DayPartition(d) for d in range(self.lo, self.hi)]

    def read(self, partition: _DayPartition):
        # Pushed filters can prune the day range to EMPTY (e.g.
        # day_num >= n_days, or contradictory bounds). partitions()
        # then returns [], and PySpark's plan_data_source_read
        # substitutes the single sentinel partition ``None`` — so an
        # empty result must be produced here, not an AttributeError.
        if partition is None:
            return
        d = partition.day
        for i in range(self.per_day):
            h = _h(self.seed, d, i)
            yield (
                d * self.per_day + i,
                d,
                h % self.n_users,
                _TYPES[(h >> 8) % len(_TYPES)],
                float((h >> 16) % 10_000) / 100.0,
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("pac_synth_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "pac_synth_events"

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema):
        return _SynthReader(self.options)
