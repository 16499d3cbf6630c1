"""Complex-type scalar functions: maps and structs.

The reference's only value type is the string (SURVEY §1.2 — everything is
UTF-8 text, /root/reference/kvstore.py:14-57); nested types don't exist
there. Here maps and structs are first-class columns: JSON event properties
parse into a typed MapType, and structs bundle related columns without a
serialization round trip. Both stay entirely JVM-side (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           LIST_SORT(json_keys(props)) AS prop_keys,
           LEN(json_keys(props)) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → typed map, then map_keys / size / element_at.

    `from_json` with an explicit MapType parses once into Tungsten map
    format; subsequent key lookups are O(1) field reads, unlike repeated
    `get_json_object` calls which each re-parse the JSON string.
    """
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.sort_array(F.map_keys(m)).alias("prop_keys"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "struct_funcs",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS price_in_struct,
           UPPER(o_orderstatus) AS status_upper,
           o_orderkey * 2 AS doubled_key
    FROM orders
    WHERE o_totalprice > 250000
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction and field access (named_struct + getField).

    The struct never leaves the plan — Catalyst's SimplifyExtractValueOps
    collapses `named_struct(...).field` back to the underlying column, so
    bundling costs nothing at execution time.
    """
    s = F.struct(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.upper(F.col("o_orderstatus")).alias("status"),
    )
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 250000)
        .withColumn("s", s)
        .select(
            "o_orderkey",
            F.col("s.price").alias("price_in_struct"),
            F.col("s.status").alias("status_upper"),
            (F.col("s.key") * 2).alias("doubled_key"),
        )
    )
