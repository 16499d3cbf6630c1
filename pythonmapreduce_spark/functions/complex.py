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
           ARRAY_TO_STRING(LIST_SORT(json_keys(props)), ',') AS prop_keys,
           LEN(json_keys(props)) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → typed map, then map_keys / size / element_at.

    `from_json` with an explicit MapType parses once into Tungsten map
    format; subsequent key lookups are O(1) field reads, unlike repeated
    `get_json_object` calls which each re-parse the JSON string. Key list
    emitted as a ','-joined sorted string (array cells are hostile to
    pandas-based result canonicalizers).
    """
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
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


@register(
    "array_hof",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        FROM documents
        WHERE doc_id <= 200
    )
    SELECT doc_id,
           CAST(LEN(list_filter(toks, x -> LENGTH(x) > 5)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS BIGINT) AS total_chars,
           CAST(LEN(toks) > 0 AND LEN(list_filter(toks, x -> LENGTH(x) >= 2)) = LEN(toks)
                AS BOOLEAN) AS all_ge2,
           CAST(LEN(list_filter(toks, x -> x LIKE 'a%')) > 0 AS BOOLEAN) AS any_a
    FROM t
    """,
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: filter / transform+aggregate / forall /
    exists — per-element logic as JVM lambda expressions, the idiomatic
    replacement for 90% of would-be Python UDFs."""
    from pythonmapreduce_spark.sources.text_corpus import tokens_col

    toks = tokens_col()
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 200)
        .select(
            "doc_id",
            F.size(F.filter(toks, lambda x: F.length(x) > 5)).cast("long").alias("n_long"),
            F.aggregate(
                F.transform(toks, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
            F.forall(toks, lambda x: F.length(x) >= 2).alias("all_ge2"),
            F.exists(toks, lambda x: x.startswith("a")).alias("any_a"),
        )
    )


@register(
    "explode_null",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN n_chars < 600
                    THEN list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                    ELSE [] END AS toks
        FROM documents
        WHERE doc_id <= 100
    )
    SELECT doc_id, UNNEST(CASE WHEN LEN(toks) = 0 THEN [NULL] ELSE toks END) AS token
    FROM t
    """,
)
def explode_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with a NULL element.

    Plain explode silently DROPS parents with empty arrays — the outer
    variant is the left-join-shaped generator that keeps every input row,
    which is what joins back to the source table without losing documents.
    """
    from pythonmapreduce_spark.sources.text_corpus import tokens_col

    toks = F.when(F.col("n_chars") < 600, tokens_col()).otherwise(
        F.array().cast("array<string>")
    )
    return (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 100)
        .select("doc_id", F.explode_outer(toks).alias("token"))
    )


@register(
    "regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '[a-z]+') AS first_word,
           LEN(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
           regexp_replace(p_name, ' ', '_', 'g') AS snaked,
           regexp_matches(p_type, 'ST') AS has_st
    FROM part
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: extract / extract_all / replace / match.

    Patterns restricted to the syntax subset where Java regex (Spark) and
    RE2 (DuckDB) agree — anchors, classes, literals; no lookaround.
    """
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).cast("long").alias("n_vowels"),
        F.regexp_replace("p_name", " ", "_").alias("snaked"),
        F.col("p_type").rlike("ST").alias("has_st"),
    )


@register(
    "map_hof",
    oracle="""
    WITH m AS (
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               LEN(json_keys(props)) AS n_keys
        FROM events
    )
    SELECT event_id,
           n_keys AS n_entries,
           k_val * 10 AS k_scaled,
           CASE WHEN k_val >= 5 THEN 1 ELSE 0 END AS n_large
    FROM m
    """,
)
def map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions — transform_values / map_filter /
    map_entries — completing the HOF surface next to array_hof's array
    lambdas: the typed map parsed once from JSON is rewritten
    (values×10), filtered (values ≥ 5), and counted, all as JVM lambda
    expressions inside the scan stage, no UDF and no re-parse.

    The oracle states the same semantics over DuckDB's JSON accessors
    (DuckDB has no map lambdas — the FORMULATION differs, the contract
    doesn't, same convention as resample_ohlc's oracle). Fixture props
    carry the single key 'k', so entry counts and per-key effects are
    exactly checkable.
    """
    m = F.from_json(F.col("props"), "map<string,bigint>")
    scaled = F.transform_values(m, lambda _k, v: v * 10)
    large = F.map_filter(m, lambda _k, v: v >= 5)
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.size(F.map_entries(m)).cast("long").alias("n_entries"),
        F.element_at(scaled, "k").alias("k_scaled"),
        F.size(F.map_entries(large)).cast("long").alias("n_large"),
    )


@register(
    "xml_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS priority_from_xml,
           CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS price_from_xml
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's built-in XML support (`from_xml` — the spark-xml package
    folded into core): orders rows are serialized to XML deterministically
    and parsed back through a typed schema, proving the XML ingestion
    path round-trips values exactly (the oracle recomputes the same
    fields straight from the columns, so any parse loss or type coercion
    in the XML path breaks the hash).

    Both serialize and parse are scan-stage expressions (to_xml/from_xml
    inside codegen) — the shape an XML feed ingestion takes, with the
    document boundary per row. Bounded to 1% of orders to keep the
    driver compare light.
    """
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    xml = F.to_xml(
        F.struct(
            F.col("o_orderpriority").alias("priority"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    parsed = F.from_xml(xml, "priority STRING, price DOUBLE")
    return o.select(
        "o_orderkey",
        parsed.getField("priority").alias("priority_from_xml"),
        parsed.getField("price").alias("price_from_xml"),
    )
