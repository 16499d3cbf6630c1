"""Window functions: ranking, running frames, lag/lead.

Absent from the reference (SURVEY §2.2 — no window operator, no sort
anywhere: /root/reference/reducer_node.py:34-48 is hash grouping). Spark's
Window operator sorts *within* hash partitions of the partition key — no
global sort, so at 100 TB cost scales with per-key group size, not total
rows. Skewed partition keys (one user with millions of events) are the
thing to watch; the queries here partition by bounded-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register


@register(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank of orders per customer by price."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (explicit ROWS frame, deterministic order)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_lag",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, 0), 4) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event stream + delta vs previous."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    lag_v = F.lag("value").over(w)
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "value",
        lag_v.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.coalesce(lag_v, F.lit(0.0)), 4).alias("delta"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the grouped top-k pattern.

    Window row_number + filter; Spark pushes the rank limit into the sort
    (WindowGroupLimit) so each partition keeps only k rows per key before
    the full window evaluates — the scalable grouped top-k.
    """
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rank").cast("long").alias("rank"))
    )


@register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile/percent_rank/cume_dist.

    One window spec shared by all three → a single sort per partition.
    Unique o_orderkey tiebreak makes ntile's bucket assignment (which
    depends on row order, not just rank) deterministic.
    """
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, epoch_s,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY epoch_s
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS hour_sum
    FROM (SELECT event_id, user_id, value,
                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s
          FROM events)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: trailing 1-hour sum of value per user.

    rangeBetween bounds are on the ORDER-BY *value* (epoch seconds), not
    row position — the frame holds every event within the last hour
    regardless of how many rows that is, and peers (equal timestamps)
    enter the frame together. This is the sliding-aggregate shape that
    rows-frames cannot express on irregular event times.
    """
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, 0)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "value",
            F.unix_timestamp("ts").alias("epoch_s"),
        )
        .select(
            "event_id",
            "user_id",
            "epoch_s",
            F.round(F.sum("value").over(w), 4).alias("hour_sum"),
        )
    )


@register(
    "window_firstlast",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS biggest,
           LAST_VALUE(o_totalprice) OVER w AS smallest,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_biggest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with an explicit full-partition frame.

    The default frame (unbounded-preceding → current-row) makes last_value
    just "current row" — the classic window gotcha; pinning the frame to
    the whole partition gives the per-group extreme/second-best shape.
    """
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("biggest"),
        F.last("o_totalprice").over(w).alias("smallest"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_biggest"),
    )


# vs_total is price*n - sum (exact 2dp) rather than price - avg: avg =
# sum/n terminates for the power-of-2 order counts customers commonly
# have, parking the 4dp round exactly on a half boundary where the
# engines disagree (the registry docstring's round-half rule).
_NAMED_WINDOW_SQL = """
SELECT o_custkey,
       o_orderkey,
       CAST(ROW_NUMBER() OVER w_price AS BIGINT) AS price_rank,
       ROUND(SUM(o_totalprice) OVER w_cust, 2) AS cust_total,
       CAST(COUNT(*) OVER w_cust AS BIGINT) AS cust_orders,
       ROUND(o_totalprice * (COUNT(*) OVER w_cust)
             - SUM(o_totalprice) OVER w_cust, 2) + 0.0 AS vs_total
FROM orders
WINDOW w_cust AS (PARTITION BY o_custkey),
       w_price AS (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("window_named_clause", oracle=_NAMED_WINDOW_SQL)
def window_named_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``WINDOW`` clause: window specs NAMED once and shared by
    several functions — four analytics over two windows with the
    partition spec written a single time (vs_total keeps the derived
    comparison in exact 2dp integer-cents space; see the constant's
    comment). Beyond readability, sharing
    the spec is what lets the planner compute all same-window functions
    in ONE Window operator over one partition sort (repeating slightly
    different inline specs is how queries accidentally buy extra
    sorts). Identical SQL text runs on DuckDB — the clause is
    SQL-standard — so the oracle also pins identical NULL/frame
    defaults.
    """
    from pythonmapreduce_spark.catalog import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_NAMED_WINDOW_SQL)
