"""Scalar function families: string / date / math / array / json / case / cast.

The reference's entire scalar surface is ``str.split`` / ``str.strip`` /
``int(x, 10)`` inside user functions (/root/reference/mapreduce_wc.py:4,10;
master.py:32 — SURVEY §2.2). Here the families are built-in Column
expressions — JVM-side, inside whole-stage codegen, no Python in the hot
path.

Dialect notes (Spark vs the DuckDB oracle) — each query picks forms with
identical semantics on both engines:
- ``ceil/floor``: Spark returns LONG, DuckDB returns DOUBLE → oracle casts.
- double→int casts: Spark truncates toward zero, DuckDB rounds → oracle uses
  TRUNC before the cast.
- ``year/month/...``: Spark INT vs DuckDB BIGINT → both cast to BIGINT.
- regexes kept to the RE2∩Java-regex common subset.
- double→string formatting differs → never cast doubles to strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                   AS name_upper,
           LOWER(p_brand)                                  AS brand_lower,
           SUBSTR(p_type, 1, 5)                            AS type_prefix,
           TRIM(CONCAT(p_brand, ' ', p_name))              AS brand_name,
           LENGTH(p_name)                                  AS name_len,
           REGEXP_EXTRACT(p_type, '([a-z]+)', 1)           AS first_word,
           REPLACE(p_brand, '#', '-')                      AS brand_dashed,
           LPAD(CAST(p_partkey AS VARCHAR), 10, '0')       AS key_padded
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/trim/concat/length/regexp_extract/replace/lpad."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.trim(F.concat(F.col("p_brand"), F.lit(" "), F.col("p_name"))).alias("brand_name"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_type", "([a-z]+)", 1).alias("first_word"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT)       AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT)      AS order_month,
           CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS order_day,
           DATE_TRUNC('month', o_orderdate)        AS month_start,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                                                   AS days_since_epoch_start,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR)
                                                   AS due_date
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff/date_add over orders."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        # dates go out as ISO strings: DATE-typed values round-trip through
        # pandas as midnight timestamps on one engine and dates on the
        # other, which breaks representation-independent hashing.
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due_date"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                    AS price_round,
           ABS(l_discount - 0.05)                       AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT)             AS qty_ceil,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
           ROUND(SQRT(l_quantity), 4)                   AS qty_sqrt,
           ROUND(POWER(1 + l_tax, 2), 6)                AS tax_sq,
           MOD(l_orderkey, 7)                           AS key_mod,
           ROUND(LN(l_extendedprice), 6)                AS price_ln
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/power/mod/ln over lineitem."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
    )


@register(
    "array_funcs",
    oracle=r"""
    SELECT doc_id,
           CAST(LEN(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)
               AS n_tokens,
           list_contains(string_split_regex(text, '\s+'), 'data') AS has_data,
           ARRAY_TO_STRING(
               list_sort(list_filter(string_split_regex(text, '\s+'), x -> x <> '')),
               ' ') AS tokens_sorted
    FROM documents
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → size / array_contains / array_sort (joined back to a
    string so the value-hash is representation-independent)."""
    tokens = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.array_contains(F.split(F.col("text"), r"\s+"), "data").alias("has_data"),
        F.array_join(F.array_sort(tokens), " ").alias("tokens_sorted"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                  AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_num
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props JSON column."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
    )


@register(
    "case_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                    AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           CASE WHEN c_acctbal IS NULL THEN 0.0 ELSE ROUND(c_acctbal, 2) END AS bal_filled
    FROM customer
    """,
)
def case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains + coalesce/nullif/null tests."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_masked"),
        F.when(F.col("c_acctbal").isNull(), F.lit(0.0))
        .otherwise(F.round(F.col("c_acctbal"), 2))
        .alias("bal_filled"),
    )


@register(
    "cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)               AS key_str,
           CAST(TRUNC(o_totalprice) AS BIGINT)       AS price_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(epoch(o_orderdate) AS BIGINT)        AS ts_epoch,
           CAST('42' AS BIGINT)                      AS const_num,
           (o_orderkey % 2 = 1)                      AS key_odd
    FROM orders
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string↔numeric↔timestamp↔boolean casts.

    Oracle-side TRUNC before the double→int cast because DuckDB rounds
    while Spark truncates; epoch via unix_timestamp (UTC session TZ).
    """
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.unix_timestamp("o_orderdate").alias("ts_epoch"),
        F.lit("42").cast("long").alias("const_num"),
        (F.col("o_orderkey") % 2 == 1).alias("key_odd"),
    )


@register(
    "fuzzy_match",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey <= 500 AND b.p_partkey <= 500
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: name pairs within Levenshtein distance 3.

    Blocked on p_brand so the pair space is |brand-group|² instead of n² —
    the edit-distance predicate itself can't be pushed into a join key, so
    blocking is what keeps fuzzy matching feasible at scale (same shape as
    the LSH band join: cheap equi-join candidate gen, expensive verify on
    the survivors only).
    """
    part = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    a = part.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"), "p_brand"
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"), "p_brand"
    )
    return (
        a.join(b, "p_brand")
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_dist") <= 3)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


@register(
    "bit_funcs",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id << 2 AS shifted,
           xor(event_id, 12345) AS xored,
           bit_count(event_id) AS popcount
    FROM events
    WHERE event_id <= 1000
    """,
)
def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions: and/shift/xor/popcount."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") <= 1000)
        .select(
            "event_id",
            F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
            F.shiftleft(F.col("event_id"), 2).alias("shifted"),
            F.col("event_id").bitwiseXOR(F.lit(12345)).alias("xored"),
            F.bit_count("event_id").cast("long").alias("popcount"),
        )
    )


@register(
    "try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(l_returnflag AS INTEGER)          AS flag_as_int,
           ROUND(l_extendedprice / NULLIF(l_discount, 0.0), 4) AS price_per_disc,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(FLOOR(l_extendedprice) AS BIGINT)
                     % CAST(FLOOR(l_quantity) AS BIGINT)
           END AS price_mod_qty
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family under ANSI mode: try_cast, try_divide,
    try_mod return NULL where strict ANSI evaluation would raise.

    Spark 4 runs ANSI-on by default — a bad cast or division by zero fails
    the whole job. At 100 TB one malformed row must NOT kill an 8-hour
    pipeline: the try_ variants turn per-row errors into NULLs that
    downstream quality filters count and quarantine (see the corrupt-record
    test for the source-level analog).
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_to_number(F.col("l_returnflag"), F.lit("9")).cast("int").alias("flag_as_int"),
        F.round(F.try_divide("l_extendedprice", F.nullif("l_discount", F.lit(0.0))), 4).alias(
            "price_per_disc"
        ),
        # floor() before the integer cast: DuckDB rounds double->BIGINT
        # casts, Spark truncates — floor pins both to the same integer
        F.try_mod(
            F.floor("l_extendedprice").cast("long"), F.floor("l_quantity").cast("long")
        ).alias("price_mod_qty"),
    )


@register(
    "json_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_text
    FROM events
    WHERE event_id <= 2000
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: parse_json once,
    then typed variant_get extraction.

    VARIANT stores a parsed binary form, so repeated path accesses skip
    re-parsing the JSON text (get_json_object re-parses per call) — the
    right ingestion shape for 100 TB of semi-structured logs: parse at the
    edge, extract many times.
    """
    ev = load(spark, sf_dir, "events").where(F.col("event_id") <= 2000)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_value"),
        F.variant_get(v, "$.k", "string").alias("k_text"),
    )


@register(
    "try_parsing",
    oracle="""
    WITH feed AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 7 = 0 THEN 'not-a-timestamp'
                    WHEN event_id % 7 = 1 THEN '2024-13-45 99:99:99'
                    ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
               END AS ts_raw
        FROM events
    ),
    parsed AS (
        SELECT event_type, ts_raw,
               TRY_STRPTIME(ts_raw, '%Y-%m-%d %H:%M:%S') AS ts_ok
        FROM feed
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(ts_ok) AS BIGINT) AS n_parsed,
           CAST(COUNT(*) - COUNT(ts_ok) AS BIGINT) AS n_failed,
           CAST(MIN(ts_ok) AS VARCHAR) AS first_valid
    FROM parsed
    GROUP BY event_type
    """,
)
def try_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe timestamp ingestion: ``try_to_timestamp`` turns malformed
    raw strings (garbage and calendar-invalid values alike, injected
    deterministically by event_id) into NULLs instead of failing the job
    — the temporal sibling of try_arithmetic, and with
    bad_records_quarantine the pattern that keeps one bad row in a 100 TB
    feed from killing the batch while still making the loss OBSERVABLE
    (n_failed per type, not a silent drop — the reference silently skips
    malformed records, /root/reference/reducer_node.py:41-42).
    """
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.expr(
            "try_to_timestamp("
            "CASE WHEN event_id % 7 = 0 THEN 'not-a-timestamp' "
            "WHEN event_id % 7 = 1 THEN '2024-13-45 99:99:99' "
            "ELSE date_format(ts, 'yyyy-MM-dd HH:mm:ss') END, "
            "'yyyy-MM-dd HH:mm:ss')"
        ).alias("ts_ok"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count("ts_ok").cast("long").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("ts_ok")).cast("long").alias("n_failed"),
        F.min("ts_ok").cast("string").alias("first_valid"),
    )


@register(
    "timezone_funcs",
    oracle="""
    WITH localized AS (
        SELECT event_type,
               EXTRACT(hour FROM (CAST(ts AS TIMESTAMP)
                   AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'))
                   AS local_hour
        FROM events
    )
    SELECT event_type, CAST(local_hour AS BIGINT) AS local_hour,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM localized
    GROUP BY event_type, local_hour
    """,
)
def timezone_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA time-zone conversion (``convert_timezone``, Spark 3.4+):
    event timestamps stored in UTC localized to a business zone before
    hour-of-day bucketing — the step every "when are users active"
    readout silently needs (dow_hour_activity buckets in UTC; a
    New-York-centric product shifted 5 hours is a different curve).
    Both engines resolve the SAME IANA tzdata rules (DST transitions
    included), which is exactly what the oracle pins: DuckDB's
    double AT TIME ZONE is the same UTC→zone wall-clock mapping.
    Conversion is a scan-stage scalar; the aggregate is the usual
    partial+final pass on ≤ 24×|types| groups.
    """
    ev = load(spark, sf_dir, "events")
    localized = ev.select(
        "event_type",
        F.hour(
            F.expr("convert_timezone('UTC', 'America/New_York', ts)")
        ).cast("long").alias("local_hour"),
    )
    return localized.groupBy("event_type", "local_hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
