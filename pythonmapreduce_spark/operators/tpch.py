"""Classic TPC-H query patterns, submitted through the SQL entry point.

Adapted to the fixture schema (FIXTURES.md keeps a subset of TPC-H's
columns). These are the canonical decision-support shapes — a filter-only
aggregate (Q6), a left-join distribution (Q13), and a having-subquery join
(Q18) — run as SQL text over the registered views so the parser/analyzer/
optimizer path carries real benchmark queries, not just DataFrame calls.

The reference cannot express any of these (no joins, no aggregates beyond
user reduce fns — SURVEY §2.2); they exist here as the north-star OLAP
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pythonmapreduce_spark.catalog import register_views
from pythonmapreduce_spark.plans.registry import register

_Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice,
       SUM(l_quantity) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
"""


@register("tpch_q6", oracle=_Q6)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-row filter aggregate — the pushdown showcase.

    All four predicates reach the parquet scan (row-group statistics prune
    whole chunks); no shuffle at all until the final 1-row combine.
    """
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q6)


@register("tpch_q13", oracle=_Q13)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution.

    Left join with a join-side predicate (customers with zero qualifying
    orders must count as c_count = 0), then a second aggregation over the
    first — two shuffles, both on low-cardinality keys.
    """
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_Q13)


@register("tpch_q18", oracle=_Q18)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (HAVING subquery + 3-way join).

    Catalyst rewrites the IN-subquery to a left-semi join against the
    having-filtered aggregate — lineitem is scanned twice but shuffled on
    the same key both times, so AQE can reuse the exchange.
    """
    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q18)


_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q12 = """
SELECT l_returnflag AS shipmode,
       SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
           AS high_line_count,
       SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                 AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END)
           AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("tpch_q4", oracle=_Q4)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking (correlated EXISTS over lineitem).

    Catalyst decorrelates the EXISTS into a left-semi join on l_orderkey
    with the l_shipdate > o_orderdate residual inside it; the orders date
    filter reaches the parquet scan first. (Fixture schema keeps a subset
    of TPC-H columns; the shape is Q4's.)
    """
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_Q4)


@register("tpch_q12", oracle=_Q12)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: shipping-priority distribution via conditional aggregates
    (the fixture schema has no l_shipmode; l_returnflag plays its role —
    the CASE-pivot aggregation shape is Q12's).
    """
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_Q12)
