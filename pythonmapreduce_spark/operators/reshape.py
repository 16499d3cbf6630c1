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
