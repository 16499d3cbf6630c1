"""Spark 4 SQL-language features: recursive CTEs and collations.

Both are parser/analyzer capabilities rather than new physical operators —
they matter because users of a SQL surface reach for them (hierarchies,
case-insensitive semantics) and because each lowers to plans this engine
already certifies: a recursive CTE is an iterative union-loop the engine
executes to fixpoint (the declarative twin of dedup_clusters' hand-rolled
label propagation), and a collated comparison changes equality/grouping
semantics inside ordinary hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pythonmapreduce_spark.catalog import register_views
from pythonmapreduce_spark.plans.registry import register

# Implicit binary-tree hierarchy over supplier keys (parent = key / 2):
# fixture tables are flat, so the hierarchy is derived deterministically.
# Identical SQL text runs on DuckDB.
_RECURSIVE = """
WITH RECURSIVE tree(s_suppkey, depth) AS (
    SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey = 1
    UNION ALL
    SELECT s.s_suppkey, t.depth + 1
    FROM supplier s
    JOIN tree t ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = t.s_suppkey
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM tree
GROUP BY depth
"""


@register("recursive_cte", oracle=_RECURSIVE)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): transitive closure over an implicit
    binary-tree hierarchy (parent = suppkey/2), counting nodes per depth.

    The declarative form of iterative graph traversal: the engine re-runs
    the recursive step (a join against the previous frontier) until the
    frontier empties — exactly the loop dedup_clusters drives by hand
    with localCheckpoint, here planned and terminated by the engine. Per
    iteration only the FRONTIER joins the base table, so work is
    O(edges) total, not O(edges × depth); at 100 TB the base side's join
    key pushdown prunes each round's scan.
    """
    register_views(spark, sf_dir, ["supplier"])
    return spark.sql(_RECURSIVE)


_COLLATION_SPARK = """
WITH mixed AS (
    SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END AS ptype,
           p_retailprice
    FROM part
)
SELECT lower(ptype) AS ptype_ci,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT ptype COLLATE UTF8_LCASE) AS BIGINT) AS n_ci_variants
FROM mixed
GROUP BY ptype COLLATE UTF8_LCASE, lower(ptype)
"""

_COLLATION_ORACLE = """
WITH mixed AS (
    SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END AS ptype,
           p_retailprice
    FROM part
)
SELECT lower(ptype) AS ptype_ci,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(1 AS BIGINT) AS n_ci_variants
FROM mixed
GROUP BY lower(ptype)
"""


@register("collation_group", oracle=_COLLATION_ORACLE)
def collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4): a deterministically mixed-case
    column grouped under UTF8_LCASE merges case variants in the HASH
    AGGREGATE ITSELF — no lower() preprocessing of the grouped column.

    The emitted key is normalized with lower() only for a stable display
    form; the grouping and the distinct-count run on the collated raw
    values (COUNT(DISTINCT x COLLATE UTF8_LCASE) = 1 per group proves the
    collation, not lower(), did the merging). DuckDB has no per-
    expression collation syntax, so the oracle is the lower()-normalized
    equivalent — same groups, same counts, and a constant 1 where Spark
    must also produce 1.
    """
    register_views(spark, sf_dir, ["part"])
    return spark.sql(_COLLATION_SPARK)
