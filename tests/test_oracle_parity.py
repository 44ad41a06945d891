"""Every registered QuerySpec with an oracle must hash-match DuckDB —
the same gate the driver applies, run locally at sf0.001."""

from __future__ import annotations

import pytest

from pac_spark.plans.registry import all_specs
from tests.conftest import assert_oracle_match

# the r5 rotation promoted the last queued specs into the registry, so
# the registry IS the complete spec universe again
SPECS = all_specs()
ORACLE_SPECS = [s for s in SPECS if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in SPECS if s.oracle is None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, duck, sf_dir, spec):
    assert_oracle_match(spec.fn(spark, sf_dir), duck.sql(spec.oracle))


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_runs(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
