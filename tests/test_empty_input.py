"""Robustness: every registered query must run (not crash) on EMPTY input
tables — the degenerate partition every 100 TB job eventually meets (an
empty hour of events, a lang partition with no documents, a filter that
eliminates everything upstream).

Queries that synthesize their own constants (hyperplanes, centroid seeds)
still return rows=0 gracefully; nothing may raise.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from pythonmapreduce_spark.catalog import SCHEMAS, TABLES
from pythonmapreduce_spark.plans import registry

registry.load_all()


@pytest.fixture(scope="session")
def empty_sf_dir(spark) -> str:
    d = os.path.join(tempfile.gettempdir(), "pmr_empty_sf")
    for t in TABLES:
        target = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(target):
            # single empty parquet FILE per table (catalog.load expects
            # file paths, like the driver's testdata layout)
            tmp = target + ".dir"
            spark.createDataFrame([], SCHEMAS[t]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            os.replace(os.path.join(tmp, part), target)
    return d


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_runs_on_empty_input(name: str, spark, empty_sf_dir: str) -> None:
    df = registry.QUERIES[name](spark, empty_sf_dir)
    n = df.count()
    assert n >= 0
