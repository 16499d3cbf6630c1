"""Central query registry.

Every operator the engine claims (SURVEY.md §2.3) registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus — when ANSI-SQL-expressible —
a DuckDB oracle SQL string. ``__spark_entry__.py`` exposes this registry to
the driver verbatim.

Contract (driver compare): the driver sorts columns by name then hashes
values order-insensitively, so Spark column names MUST equal oracle column
names, float aggregates are rounded identically on both sides, and any
collected list is sorted to a deterministic order.

The reference's analog of this registry is its job-authoring surface:
marshal-serialized map/reduce code objects pointed at by master.ini
(/root/reference/mapreduce_wc.py:13-16, master.py:123-137). Here a "job" is
a declarative Catalyst plan instead of opaque bytecode.
"""

from __future__ import annotations

import functools

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional oracle.

    ``oracle=None`` marks a genuinely non-SQL-expressible op (approximate,
    streaming, iterative) — the driver then records a rows-only check.

    The registered callable pins session confs the query semantics depend
    on (UTC session timezone — the caller's SparkSession is not ours to
    assume) before building the plan.
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def query_names() -> list[str]:
    return sorted(QUERIES)


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports deferred so `import pythonmapreduce_spark` stays cheap and
    # circular imports are impossible.
    from pythonmapreduce_spark.operators import (  # noqa: F401
        aggregates,
        asof,
        joins,
        relational,
        reshape,
        timeseries,
        tpch,
        windows,
    )
    from pythonmapreduce_spark.functions import complex, scalar, udfs  # noqa: F401
    from pythonmapreduce_spark.sources import bucketing, readers, text_corpus  # noqa: F401
    from pythonmapreduce_spark.streaming import (  # noqa: F401
        event_windows,
        stateful,
        stream_jobs,
    )
    from pythonmapreduce_spark.pipeline import (  # noqa: F401
        dedup,
        multimodal,
        similarity,
        text_analysis,
    )
