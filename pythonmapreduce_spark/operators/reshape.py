"""Reshape operators: pivot (long→wide) and unpivot/melt (wide→long).

Pivot compiles to a single aggregate with one conditional branch per pivot
value — declare the value list explicitly so no extra distinct-collect pass
over the data is needed (mandatory at scale; implicit pivot values require
an eager scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register

_STATUSES = ["F", "O", "P"]


@register(
    "pivot_op",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2)
               AS total_f
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority pivoted by status (explicit value list)."""
    pivoted = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("sum_price"),
        )
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("status_p"),
        F.round(F.coalesce(F.col("F_sum_price"), F.lit(0.0)), 2).alias("total_f"),
    )


@register(
    "unpivot_op",
    oracle="""
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS metric_value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
    FROM part
    """,
)
def unpivot_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt part metrics wide→long via the native unpivot operator (no
    self-union, single scan)."""
    return (
        load(spark, sf_dir, "part")
        .withColumn("retailprice", F.col("p_retailprice"))
        .withColumn("size", F.col("p_size").cast("double"))
        .unpivot(
            ids=["p_partkey"],
            values=["retailprice", "size"],
            variableColumnName="metric",
            valueColumnName="metric_value",
        )
    )



@register(
    "transpose_op",
    oracle="""
    SELECT 'n_events' AS key,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS DOUBLE) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE) AS view
    FROM events
    UNION ALL
    SELECT 'total_value' AS key,
           ROUND(SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 2) AS click,
           ROUND(SUM(CASE WHEN event_type = 'error' THEN value ELSE 0 END), 2) AS error,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase,
           ROUND(SUM(CASE WHEN event_type = 'signup' THEN value ELSE 0 END), 2) AS signup,
           ROUND(SUM(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 2) AS view
    FROM events
    """,
)
def transpose_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (Spark 4): flip a small aggregated table so
    metrics become rows and group values become columns — the
    matrix-transpose reshape next to pivot (long→wide on ONE metric) and
    unpivot (wide→long). The per-type aggregate runs first, so transpose —
    which must materialize the index values as a schema — only ever sees
    the |groups|-row result, never the 100 TB input (the same
    aggregate-then-reshape policy as share_of_total). Values are promoted
    to the least-common type (double) by the engine; the oracle builds the
    transposed layout by hand with the same casts. Input is sorted on the
    index column so the emitted column order is deterministic.
    """
    agg = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias(
                "total_value"
            ),
        )
        .orderBy("event_type")
    )
    return agg.transpose()
