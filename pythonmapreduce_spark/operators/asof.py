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


@register(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, value AS purchase_value
        FROM events
        WHERE event_type = 'purchase'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ), clicks AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts
        FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT c.event_id, c.user_id, c.cts, p.pts, p.purchase_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND p.pts <= c.cts
    )
    SELECT event_id, user_id, cts AS click_ts,
           CASE WHEN pts IS NOT NULL
                     AND epoch_us(cts) - epoch_us(pts) <= 7200000000
                THEN pts END AS purchase_ts,
           CASE WHEN pts IS NOT NULL
                     AND epoch_us(cts) - epoch_us(pts) <= 7200000000
                THEN purchase_value END AS purchase_value
    FROM b
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness as-of join: the latest purchase at or before each
    click, but only if it is at most 2 hours stale — older state returns
    NULL instead of silently attaching stale context (pandas merge_asof's
    ``tolerance``; the correctness knob for feature lookups where stale
    features are worse than missing ones).

    Same single-exchange union-window plan as join_asof; the tolerance is
    a residual NULL-out predicate applied AFTER the window, in integer µs
    so neither engine does interval arithmetic. Completes the as-of
    family: backward (join_asof), nearest (join_asof_nearest), bounded
    staleness (this).
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
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ets").asc(), F.col("is_right").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id",
        "is_right",
        "event_id",
        "ets",
        F.last("pts", ignorenulls=True).over(w).alias("pts"),
        F.last("purchase_value", ignorenulls=True).over(w).alias("pv"),
    ).where(F.col("is_right") == 0)
    fresh = F.col("pts").isNotNull() & (
        F.unix_micros("ets") - F.unix_micros("pts") <= 7200000000
    )
    return merged.select(
        "event_id",
        "user_id",
        F.col("ets").alias("click_ts"),
        F.when(fresh, F.col("pts")).alias("purchase_ts"),
        F.when(fresh, F.col("pv")).alias("purchase_value"),
    )


@register(
    "bitemporal_asof",
    oracle="""
    WITH states AS (
        SELECT user_id, value,
               CAST(ts AS TIMESTAMP) AS valid_from,
               epoch_us(CAST(ts AS TIMESTAMP)) + (event_id % 7) * 3600000000
                   AS tx_from_us,
               event_id,
               LEAD(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS cts
        FROM events WHERE event_type = 'click'
    ), joined AS (
        SELECT c.click_id, c.user_id, c.cts,
               s.value, s.valid_from, s.tx_from_us, s.event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY c.click_id
                   ORDER BY s.tx_from_us DESC, s.event_id DESC) AS rn
        FROM clicks c JOIN states s
          ON c.user_id = s.user_id
         AND s.valid_from <= c.cts
         AND (s.valid_to IS NULL OR c.cts < s.valid_to)
         AND s.tx_from_us <= epoch_us(c.cts)
    )
    SELECT c.click_id AS event_id, c.user_id, c.cts AS click_ts,
           j.value AS state_value,
           j.valid_from, j.tx_from_us
    FROM clicks c LEFT JOIN joined j
      ON c.click_id = j.click_id AND j.rn = 1
    """,
)
def bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal state lookup: for each click, the state VALID at the
    click's event time AS KNOWN at that time — the two-axis (valid time ×
    transaction time) query that scd2_snapshot and point_in_time_join
    cannot answer, because a state row ingested LATE (its transaction
    time lags its valid time — here synthesized deterministically as
    event_id-dependent ingest lag) must be invisible to observations made
    before it arrived. This is the reproducibility guarantee behind
    feature-store time travel and restated financial reports.

    Plan: valid intervals close via one lead() window per user; the
    lookup is a user-key equi-join with residual interval + knowledge
    predicates, then one row_number per observation picks the most
    recently learned qualifying state (deterministic (tx, id) order).
    Transaction time compares in integer µs. At 100 TB both sides
    co-partition on the user key — one exchange each, no range explosion
    beyond states-per-user.
    """
    ev = load(spark, sf_dir, "events")
    states = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "value",
            F.col("ts").alias("valid_from"),
            (
                F.unix_micros("ts") + (F.col("event_id") % 7) * 3600000000
            ).alias("tx_from_us"),
            "event_id",
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                W.partitionBy("user_id").orderBy("valid_from", "event_id")
            ),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    joined = (
        clicks.join(states, "user_id")
        .where(
            (F.col("valid_from") <= F.col("cts"))
            & (F.col("valid_to").isNull() | (F.col("cts") < F.col("valid_to")))
            & (F.col("tx_from_us") <= F.unix_micros("cts"))
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("click_id").orderBy(
                    F.col("tx_from_us").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("click_id", "value", "valid_from", "tx_from_us")
    )
    return clicks.join(joined, "click_id", "left").select(
        F.col("click_id").alias("event_id"),
        "user_id",
        F.col("cts").alias("click_ts"),
        F.col("value").alias("state_value"),
        "valid_from",
        "tx_from_us",
    )
