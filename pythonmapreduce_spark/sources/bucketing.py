"""Bucketed tables: pre-shuffled physical layout for co-located joins.

``bucketBy(n, key)`` writes each table pre-hash-partitioned on the join
key; a later join between two tables bucketed the same way needs NO
exchange on either side — the shuffle was paid once at write time and
amortized over every subsequent join. This is the canonical layout for
fact tables that join repeatedly on the same key at 100 TB (the
alternative, repartition-per-query, re-shuffles every run).

The reference has no notion of data layout at all — every job re-ships the
whole input through the KV store (/root/reference/master.py:27-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pythonmapreduce_spark.catalog import load

N_BUCKETS = 8


def write_bucketed(spark: SparkSession, sf_dir: str, table: str, key: str, name: str) -> None:
    """Persist a table bucketed+sorted by its join key as a managed table."""
    (
        load(spark, sf_dir, table)
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_join(spark: SparkSession, left: str, right: str, cond) -> DataFrame:
    """Join two identically-bucketed tables — exchange-free by layout."""
    return spark.table(left).join(spark.table(right), cond, "inner")
