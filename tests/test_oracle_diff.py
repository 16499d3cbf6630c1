"""Primary correctness gate: every oracle-backed query vs DuckDB at sf0.01,
plus rows-only smoke for the approximate/streaming ops — the local mirror
of the driver's CORRECTNESS run."""

from __future__ import annotations

import pytest

from pythonmapreduce_spark.plans import registry
from tests import harness

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(name: str, spark, sf_oracle: str) -> None:
    harness.run_compare(spark, sf_oracle, name, registry.QUERIES[name], registry.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name: str, spark, sf_oracle: str) -> None:
    df = registry.QUERIES[name](spark, sf_oracle)
    assert len(df.columns) > 0
    assert df.count() >= 0
