"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``pythonmapreduce_spark`` package; this module
only exposes its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pythonmapreduce_spark.plans import registry

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the TPC-H Q5-style star join
    (lineitem ⋈ orders ⋈ customer ⋈ broadcast(nation) ⋈ broadcast(region)
    → revenue per nation, sorted)."""
    registry.load_all()
    return registry.QUERIES["join_star"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3 (plus the
    LLM-pipeline extensions). Each callable takes (spark, sf_dir) and
    returns a DataFrame with oracle-matched column names.

    Iteration order is attestation-aware (registry.ordered_names): queries
    whose latest driver correctness row failed come first, then queries
    never driver-checked in any committed CORRECTNESS_r*.json, then greens
    stalest-first — so a budget-capped verifier always spends its window on
    the least-verified surface."""
    registry.load_all()
    return {n: registry.QUERIES[n] for n in registry.ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here (approximate /
    streaming-stateful ops) get the driver's rows-only check."""
    registry.load_all()
    return dict(registry.ORACLES)
