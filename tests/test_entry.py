"""Smoke: driver contract (entry + registry shape)."""

from __future__ import annotations

import __spark_entry__ as e


def test_registry_shape() -> None:
    q = e.queries()
    o = e.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
    # every oracle-backed query is the majority of the surface
    assert len(o) >= 30


def test_entry_flagship(spark) -> None:
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"r_name", "n_name", "revenue", "n_items"} == set(df.columns)
