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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register

N_BUCKETS = 8


def write_bucketed(spark: SparkSession, sf_dir: str, table: str, key: str, name: str) -> None:
    """Persist a table bucketed+sorted by its join key as a managed table.

    The warehouse DIRECTORY outlives the per-session in-memory catalog, so
    a fresh session's saveAsTable would hit LOCATION_ALREADY_EXISTS on a
    location left by an earlier session (or a killed run). Drop both the
    catalog entry and the stale location first — overwrite semantics
    regardless of which of the two actually exists.
    """
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
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


def _morton_sql(a: str, b: str, bits: int = 16) -> str:
    """SQL expression interleaving the low `bits` of two int columns into a
    Morton (Z-order) key — identical text works in Spark SQL and DuckDB."""
    # every term fully parenthesized: DuckDB (PostgreSQL-style) gives all
    # bitwise operators EQUAL precedence, so an unparenthesized
    # `x << 1 | y << 3` chain would left-fold into ((x<<1)|y)<<3
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_partkey,
           CAST({_morton_sql('l_orderkey', 'l_partkey')} AS BIGINT) AS zkey
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY zkey, l_orderkey, l_partkey
    """,
)
def zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: bit-interleave two join/filter
    columns so a single sort co-locates rows that are close in BOTH
    dimensions — the layout behind multi-column data skipping (Delta
    OPTIMIZE ZORDER, Iceberg sort orders).

    Why it matters at 100 TB: min/max file statistics prune on one sort
    column only; a Z-order sort makes range predicates on EITHER column
    skip most files. The key itself is pure bit arithmetic in one codegen
    stage; writing the sorted layout is then an ordinary sorted write
    (sink side exercised by sink_partitioned_parquet/sink_compaction).

    Engine side uses the O(log bits) bit-twiddling spread (4 mask/shift
    steps per column, built as a withColumn chain so no subexpression
    duplicates) instead of the naive 64-term per-bit interleave: the big
    expression cost nothing at runtime but 3.4 s of WHOLE-STAGE-CODEGEN
    COMPILE per fresh plan — a real tax when a verification harness runs
    hundreds of distinct plans in one session. The oracle keeps the naive
    per-bit form, so the compare also proves the two formulations equal.
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 200)

    def spread(df: DataFrame, src: str, out: str) -> DataFrame:
        # 16 bits → even bit positions of a 32-bit lane.
        df = df.withColumn(out, F.expr(f"CAST({src} AS BIGINT) & 65535"))
        for shift, mask in ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765)):
            df = df.withColumn(out, F.expr(f"({out} | ({out} << {shift})) & {mask}"))
        return df

    keyed = spread(spread(li, "l_orderkey", "_za"), "l_partkey", "_zb")
    return (
        keyed.withColumn("zkey", F.expr("CAST(_za | (_zb << 1) AS BIGINT)"))
        .select("l_orderkey", "l_partkey", "zkey")
        .orderBy("zkey", "l_orderkey", "l_partkey")
    )


# Bucketed copies are written once per (session, sf_dir) and reused — the
# entire point of bucketing is paying the shuffle at WRITE time and
# amortizing it over every subsequent join.
_BUCKETED_READY: set[tuple[int, str]] = set()

_BUCKETED_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("join_bucketed", oracle=_BUCKETED_ORACLE)
def join_bucketed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact⋈dim join over pre-bucketed tables, aggregated per
    market segment — identical answers to the plain join (the oracle runs
    the unbucketed form).

    orders and customer are written bucketBy(8, custkey) + sortBy once;
    the join then needs NO exchange on either side (SortMergeJoin reads
    bucket n against bucket n directly — tests/test_bucketing.py pins the
    exchange-free plan). At 100 TB this is the difference between
    re-shuffling a fact table on every query and paying that shuffle once
    at ingest: the physical layout IS the optimization. The aggregate
    after the join shuffles only |segments| partial rows.
    """
    key = (id(spark), sf_dir)
    if key not in _BUCKETED_READY:
        write_bucketed(spark, sf_dir, "orders", "o_custkey", "bq_orders")
        write_bucketed(spark, sf_dir, "customer", "c_custkey", "bq_customer")
        _BUCKETED_READY.add(key)
    joined = spark.table("bq_orders").join(
        spark.table("bq_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
        "inner",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
