"""Event-time windowed aggregation (batch over the event-time axis).

The reference is strictly batch with no notion of time (SURVEY §2.2 —
"streaming: none"). These queries give the engine the event-time surface:
tumbling, sliding, and session windows over ``events.ts``, identical
semantics batch and streaming (Spark's ``window``/``session_window`` are
the same expressions Structured Streaming uses — see stream_jobs.py).

Scale: windowed aggregation shuffles on (window, key) — partial aggregation
applies as usual; sliding windows fan out one input row to
(window/slide) rows *before* the partial agg, which is why slide should
never be << window at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register


@register(
    "window_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))                   AS window_start,
           time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*)              AS n_events,
           ROUND(SUM(value), 2)  AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour tumbling window per type."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "window_sliding",
    oracle="""
    WITH fanout AS (
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                   - n * INTERVAL '15 minutes' AS window_start,
               value
        FROM events, (SELECT UNNEST(range(4)) AS n)
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM fanout
    GROUP BY window_start
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes (4× row fan-out pre-agg).

    Oracle: every event belongs to exactly duration/slide = 4 sliding
    windows, whose starts are the event's 15-min bucket minus 0..3 slides —
    the same epoch-aligned fan-out Spark's window() generator produces, so
    the overlapping-window semantics are exactly SQL-checkable.
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "window_session",
    oracle="""
    WITH gaps AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - LAG(CAST(ts AS TIMESTAMP))
                               OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), islands AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM gaps
    )
    SELECT user_id,
           MIN(ts)                       AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE  AS session_end,
           COUNT(*)                      AS n_events,
           ROUND(SUM(value), 2)          AS total_value
    FROM islands
    GROUP BY user_id, sess_no
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user via ``session_window``.

    Spark merges an event into the running session iff its gap from the
    previous event is strictly < 30 min (session windows [ts, ts+gap) merge
    on overlap); session end = last event + gap. The oracle is the classic
    gaps-and-islands rewrite with the same >= boundary.
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "window_session_dynamic",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id, value,
               CAST(ts AS TIMESTAMP) AS s,
               CAST(ts AS TIMESTAMP)
                   + CASE WHEN event_type = 'purchase'
                          THEN INTERVAL 60 MINUTE
                          ELSE INTERVAL 15 MINUTE END AS e
        FROM events
    ), flag AS (
        SELECT *, CASE WHEN s >= MAX(e) OVER (
                           PARTITION BY user_id ORDER BY s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS is_new
        FROM iv
    ), islands AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM flag
    )
    SELECT user_id,
           MIN(s) AS session_start,
           MAX(e) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM islands
    GROUP BY user_id, sess_no
    """,
)
def window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap sessions: ``session_window`` with a per-row gap
    expression — purchases hold a session open 60 minutes, everything else
    15 — the real-world sessionization rule (a checkout keeps the visit
    alive longer than an idle pageview) the fixed-gap form cannot express.

    Semantics: each event spans [ts, ts+gap(event)); overlapping spans
    merge, so session end = MAX over members of (ts + own gap), not
    last-event + constant. The oracle is therefore interval_merge's
    running-MAX-of-ends island detection, NOT window_session's lag-gap
    form — with a variable gap an event can be swallowed by a span whose
    opener is several rows back, which lag cannot see. Both the max and
    the cumulative-flag windows order by (s, event_id) — the
    deterministic-tiebreak discipline interval_merge pinned. Same scale
    shape as window_session: one user-key exchange, per-key sort,
    engine-managed merge state.
    """
    gap = F.when(F.col("event_type") == "purchase", "60 minutes").otherwise(
        "15 minutes"
    )
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
