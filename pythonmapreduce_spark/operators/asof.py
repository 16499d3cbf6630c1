"""As-of (temporal) join — an operator Spark lacks natively.

``join_asof``: for each click event, the user's most recent purchase at or
before the click's timestamp. Implemented with the scalable union-window
technique rather than a join:

    union(tagged left, tagged right)
      → window last_value(right_payload) IGNORE NULLS
        over (partition key ORDER BY ts, tiebreak)
      → keep left rows

One shuffle on the key, no range-join explosion, state bounded by partition
— the standard distributed as-of shape (DuckDB/kdb expose the same thing as
a native ASOF JOIN, which is exactly what the oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register


@register(
    "join_asof",
    oracle="""
    WITH purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, value AS purchase_value
        FROM events
        WHERE event_type = 'purchase'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ), clicks AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts, value
        FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.cts AS click_ts,
           p.pts AS purchase_ts, p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.pts <= c.cts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest purchase at-or-before each click, per user.

    Purchases are deduped to one per (user, ts) — max event_id wins — so
    the as-of tiebreak is deterministic on both engines.
    """
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("ets"),
            F.lit(1).alias("is_right"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("pts"),
            F.col("value").alias("purchase_value"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(0).alias("is_right"),
        "event_id",
        F.lit(None).cast("timestamp").alias("pts"),
        F.lit(None).cast("double").alias("purchase_value"),
    )
    # Right rows sort BEFORE left rows at equal ts (is_right desc) so a
    # purchase at exactly the click's timestamp is visible to it (<=).
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ets").asc(), F.col("is_right").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id",
        "is_right",
        "event_id",
        F.col("ets"),
        F.last("pts", ignorenulls=True).over(w).alias("purchase_ts"),
        F.last("purchase_value", ignorenulls=True).over(w).alias("purchase_value"),
    )
    return merged.where(F.col("is_right") == 0).select(
        "event_id",
        "user_id",
        F.col("ets").alias("click_ts"),
        "purchase_ts",
        "purchase_value",
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts
        FROM events
        WHERE event_type = 'purchase'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ), clicks AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts
        FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT c.event_id, p.pts AS bts
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND p.pts <= c.cts
    ), f AS (
        SELECT c.event_id, p.pts AS fts
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND p.pts >= c.cts
    )
    SELECT c.event_id, c.user_id, c.cts AS click_ts,
           CASE WHEN b.bts IS NULL AND f.fts IS NULL THEN NULL
                WHEN f.fts IS NULL THEN b.bts
                WHEN b.bts IS NULL THEN f.fts
                WHEN epoch_us(c.cts) - epoch_us(b.bts)
                     <= epoch_us(f.fts) - epoch_us(c.cts) THEN b.bts
                ELSE f.fts END AS purchase_ts,
           CASE WHEN b.bts IS NULL AND f.fts IS NULL THEN NULL
                WHEN f.fts IS NULL THEN 'backward'
                WHEN b.bts IS NULL THEN 'forward'
                WHEN epoch_us(c.cts) - epoch_us(b.bts)
                     <= epoch_us(f.fts) - epoch_us(c.cts) THEN 'backward'
                ELSE 'forward' END AS direction
    FROM clicks c
    LEFT JOIN b ON c.event_id = b.event_id
    LEFT JOIN f ON c.event_id = f.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each click picks the CLOSEST purchase
    in time, looking both backward and forward (sensor fusion and
    attribution both need this when the nearest state may postdate the
    observation; join_asof is the backward-only case). Equidistant ties
    choose backward — the deterministic convention kdb's aj-family uses.

    Same union-window technique as join_asof, run in both directions over
    ONE user-key exchange: the backward pass orders (ts, right-first) so
    an equal-timestamp purchase is visible to ≤, the forward pass orders
    (ts, right-last) for the mirror-image ≥ — two local sorts on the same
    partitioning, never a range-join explosion; per-partition state stays
    one row per direction. The oracle is DuckDB's native ASOF in each
    direction.
    """
    ev = load(spark, sf_dir, "events")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("ets"),
            F.lit(1).alias("is_right"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("pts"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(0).alias("is_right"),
        "event_id",
        F.lit(None).cast("timestamp").alias("pts"),
    )
    merged = purchases.unionByName(clicks)
    w_back = (
        W.partitionBy("user_id")
        .orderBy(F.col("ets").asc(), F.col("is_right").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy(F.col("ets").asc(), F.col("is_right").asc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    both = merged.select(
        "user_id",
        "is_right",
        "event_id",
        "ets",
        F.last("pts", ignorenulls=True).over(w_back).alias("bts"),
        F.first("pts", ignorenulls=True).over(w_fwd).alias("fts"),
    ).where(F.col("is_right") == 0)
    dist_b = F.unix_micros("ets") - F.unix_micros("bts")
    dist_f = F.unix_micros("fts") - F.unix_micros("ets")
    pick_back = (F.col("fts").isNull()) | (
        F.col("bts").isNotNull() & (dist_b <= dist_f)
    )
    return both.select(
        "event_id",
        "user_id",
        F.col("ets").alias("click_ts"),
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None).cast("timestamp"))
        .when(pick_back, F.col("bts"))
        .otherwise(F.col("fts"))
        .alias("purchase_ts"),
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None).cast("string"))
        .when(pick_back, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )
