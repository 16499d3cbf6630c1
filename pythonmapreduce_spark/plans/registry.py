"""Central query registry.

Every operator the engine claims (SURVEY.md §2.3) registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus — when ANSI-SQL-expressible —
a DuckDB oracle SQL string. ``__spark_entry__.py`` exposes this registry to
the driver verbatim.

Contract (driver compare): the driver sorts columns by name then hashes
values order-insensitively, so Spark column names MUST equal oracle column
names, float aggregates are rounded identically on both sides, and any
collected list is sorted to a deterministic order. Rounded floats that can
land on zero need `+ 0.0` AFTER the round on BOTH sides: ROUND of a tiny
negative produces IEEE -0.0, engines disagree on which side of zero the
noise falls, and "-0.0" != "0.0" under stringified compare (bit twice:
anomaly_zscore's z, collocation_pmi's ln(1)).

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

# Sessions already tuned (keyed by id(SparkSession)); runtime confs are
# session-wide so one pass per session suffices.
_TUNED: set[int] = set()


def _tune_session(spark: SparkSession) -> None:
    """Pin runtime confs query semantics/performance depend on.

    The caller's SparkSession (driver, notebook) is not ours to construct,
    but these are all runtime-settable:
    - UTC session timezone: timestamp semantics must match the UTC-naive
      DuckDB oracle.
    - AQE + partition coalescing: a caller session with the 200-partition
      default pays ~170 empty-task schedulings per shuffle at test SFs;
      AQE coalesces to the data's real size, and on a cluster it splits
      skewed joins. Start parallelism at defaultParallelism (cores), the
      right floor for local runs; cluster deployments override via
      spark-submit and AQE adapts from there.
    - Arrow: every pandas interchange in the engine assumes vectorized
      transfer.
    """
    if id(spark) in _TUNED:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    cores = spark.sparkContext.defaultParallelism
    if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 4 * cores:
        spark.conf.set("spark.sql.shuffle.partitions", str(cores))
    _TUNED.add(id(spark))


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
            _tune_session(spark)
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
    """Import every module that registers queries (idempotent).

    Import order IS registration order IS the order an external harness
    iterating ``queries()`` sees. Modules whose queries lacked a driver
    CORRECTNESS row in round 1 (everything after the ~50-query cutoff:
    sources, pipeline, functions, streaming, the back half of operators)
    register FIRST so a budget-capped verification run covers the
    least-verified surface before re-confirming the already-green tier.
    """
    # Imports deferred so `import pythonmapreduce_spark` stays cheap and
    # circular imports are impossible.
    from pythonmapreduce_spark.sources import bucketing, readers, refwire, text_corpus  # noqa: F401
    from pythonmapreduce_spark.pipeline import (  # noqa: F401
        search,
        curation,
        dedup,
        multimodal,
        similarity,
        text_analysis,
    )
    from pythonmapreduce_spark.functions import complex, scalar, udfs  # noqa: F401
    from pythonmapreduce_spark.streaming import (  # noqa: F401
        event_windows,
        stateful,
        stream_jobs,
    )
    from pythonmapreduce_spark.operators import (  # noqa: F401
        graphs,
        sql_features,
        quality,
        timeseries,
        windows,
        reshape,
        asof,
        tpch,
        aggregates,
        joins,
        relational,
    )
