"""Graph-tier contracts beyond the DuckDB oracle diff: an independent
second algorithm for triangles, PageRank mass conservation, and plan-shape
gates (no cartesian products in the wedge join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pythonmapreduce_spark.operators.graphs import _edges, _pagerank_ranks
from pythonmapreduce_spark.plans import registry

registry.load_all()


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_triangle_count_matches_adjacency_intersection(spark, sf_smoke) -> None:
    """Cross-check the wedge-join count with the edge-iterator formula:
    Σ_{(u,v)∈E} |N(u) ∩ N(v)| = 3·triangles — a fully independent
    second algorithm (adjacency-set intersection vs wedge join)."""
    e = _edges(spark, sf_smoke)
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    adj = sym.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    common = (
        e.join(adj.withColumnsRenamed({"src": "u", "nbrs": "nu"}), F.col("src") == F.col("u"))
        .join(adj.withColumnsRenamed({"src": "v", "nbrs": "nv"}), F.col("dst") == F.col("v"))
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(F.sum("c").alias("total"))
        .collect()[0]["total"]
    )
    wedge = registry.QUERIES["triangle_count"](spark, sf_smoke).collect()[0][
        "n_triangles"
    ]
    assert common == 3 * wedge
    assert wedge > 0  # the graph is non-degenerate at every test SF


def test_pagerank_mass_conserved(spark, sf_smoke) -> None:
    """Uniform teleport + symmetric (dangling-free) graph ⇒ the full rank
    vector sums to exactly 1 after every synchronous iteration."""
    ranks = _pagerank_ranks(spark, sf_smoke)
    total = ranks.agg(F.sum("pr").alias("s")).collect()[0]["s"]
    assert abs(total - 1.0) < 1e-9
    low = ranks.agg(F.min("pr").alias("m")).collect()[0]["m"]
    assert low > 0


def test_graph_plans_have_no_cartesian(spark, sf_smoke) -> None:
    for name in ("triangle_count", "pagerank_iter", "graph_degree"):
        plan = _plan(registry.QUERIES[name](spark, sf_smoke))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_bm25_broadcasts_model_sides(spark, sf_smoke) -> None:
    """bm25_rank: the idf join must be a broadcast (model side is
    O(|query terms|)); the only nested-loop joins are the two deliberate
    1-row stat broadcasts; the ranking is TakeOrderedAndProject."""
    plan = _plan(registry.QUERIES["bm25_rank"](spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    # formatted plans list each node in the tree AND the details section,
    # so count the tree form (node name + join type)
    assert plan.count("BroadcastNestedLoopJoin Cross") <= 2
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
