"""Query registry primitives.

Each operator the engine claims is registered as a :class:`QuerySpec`:
a named callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL.
The driver executes both sides at sf=0.01 and hash-compares values, so
every spec is an automatically-enforced correctness contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "collect_queries", "collect_oracles"]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None -> rows-only check


def collect_queries(specs: list[QuerySpec]) -> dict[str, Callable]:
    return {s.name: s.fn for s in specs}


def collect_oracles(specs: list[QuerySpec]) -> dict[str, str]:
    return {s.name: s.oracle for s in specs if s.oracle is not None}
