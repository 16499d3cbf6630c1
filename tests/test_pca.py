"""Contract tests for the ops without a SQL oracle: PCA projection and
the HLL sketch rollup (gram_matrix, their shared kernel, has a full
DuckDB oracle in test_oracle_diff)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pythonmapreduce_spark.plans import registry

registry.load_all()


@pytest.fixture(scope="module")
def pca_rows(spark, sf_oracle):
    return registry.QUERIES["pca_project"](spark, sf_oracle).collect()


def test_pca_variance_ordering(pca_rows) -> None:
    pc1 = np.array([r["pc1"] for r in pca_rows])
    pc2 = np.array([r["pc2"] for r in pca_rows])
    # Components are sorted by explained variance, and both are centered.
    assert pc1.var() >= pc2.var() > 0
    assert abs(pc1.mean()) < 1e-2 and abs(pc2.mean()) < 1e-2


def test_pca_decorrelated(pca_rows) -> None:
    pc1 = np.array([r["pc1"] for r in pca_rows])
    pc2 = np.array([r["pc2"] for r in pca_rows])
    # Projections onto orthogonal eigenvectors are uncorrelated.
    corr = np.corrcoef(pc1, pc2)[0, 1]
    assert abs(corr) < 0.05


def test_pca_deterministic(spark, sf_oracle, pca_rows) -> None:
    again = registry.QUERIES["pca_project"](spark, sf_oracle).collect()
    assert sorted((r["vec_id"], r["pc1"], r["pc2"]) for r in pca_rows) == sorted(
        (r["vec_id"], r["pc1"], r["pc2"]) for r in again
    )


def test_hll_rollup_error_bound(spark, sf_oracle) -> None:
    """The query now embeds the ≤5% contract (lgConfigK=12 → RSE ~1.6%):
    exact_users must match an independent exact distinct and sketch_ok
    must hold for every group."""
    rows = {
        r["event_type"]: (r["exact_users"], r["sketch_ok"])
        for r in registry.QUERIES["hll_rollup"](spark, sf_oracle).collect()
    }
    from pythonmapreduce_spark.catalog import load

    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k, n in exact.items():
        assert rows[k] == (n, True), (k, rows[k], n)


def test_kmeans_inertia_monotone(spark, sf_oracle) -> None:
    from pythonmapreduce_spark.pipeline.similarity import kmeans_history

    history, rows, _cents = kmeans_history(spark, sf_oracle)
    assert len(history) == 3
    # Lloyd's algorithm never increases inertia (allow fp slack).
    assert history[0] >= history[1] - 1e-6 >= history[2] - 2e-6
    # Every vector lands in exactly one cluster.
    n_total = sum(n for _, n in rows)
    from pythonmapreduce_spark.catalog import load

    assert n_total == load(spark, sf_oracle, "embeddings").count()


def test_semdedup_gemm_assignment_matches_expression(spark, sf_oracle) -> None:
    """Equivalence gate for semdedup's chunked-GEMM assignment: the numpy
    kernel must reproduce the pure-expression (sequential HOF dot +
    F.round) argmax exactly — this is what lets the DuckDB oracle keep
    pinning semdedup after the assignment stage moved off the expression
    cross join (round-3 scale fix). A flip here means the BLAS summation
    order crossed a 1e-4 rounding boundary the key encoding is supposed
    to absorb."""
    from pythonmapreduce_spark.pipeline.similarity import (
        _SEMDEDUP_K,
        _dot,
        _semdedup_unit_vectors,
        semdedup_assign,
    )

    e = _semdedup_unit_vectors(spark, sf_oracle)
    c = e.where(F.col("vec_id") <= _SEMDEDUP_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    gemm = {
        r["vec_id"]: r["cluster"]
        for r in semdedup_assign(spark, e, c).collect()
    }
    dkey = (
        F.round(_dot(F.col("v"), F.col("cv")) * 10000).cast("long") * 1000000
        - F.col("cid")
    )
    expr = {
        r["vec_id"]: r["cluster"]
        for r in e.crossJoin(F.broadcast(c))
        .select("vec_id", "cid", dkey.alias("dkey"))
        .groupBy("vec_id")
        .agg(F.max_by("cid", F.col("dkey")).alias("cluster"))
        .collect()
    }
    assert gemm == expr


def test_semdedup_kmeans_centroids_path(spark, sf_oracle) -> None:
    """The production wiring: semdedup_k consumes kmeans_iter-trained
    centroids as a table (the fixture's lowest-id rule exists only so the
    DuckDB oracle can replicate assignment). Every vector must land in
    one of the K trained clusters and the survivor invariant holds."""
    from pythonmapreduce_spark.pipeline.similarity import (
        _vectors,
        kmeans_history,
        semdedup_k,
    )

    _, _, cents = kmeans_history(spark, sf_oracle, k=8, iters=2)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cn)],
        "cid long, cv array<double>",
    )
    out = semdedup_k(spark, sf_oracle, centroids=cdf)
    rows = out.collect()
    assert len(rows) == _vectors(spark, sf_oracle).count()
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(len(cn)))
    # smallest id per cluster always survives
    by_cluster: dict = {}
    for r in rows:
        cur = by_cluster.get(r["cluster"])
        if cur is None or r["vec_id"] < cur["vec_id"]:
            by_cluster[r["cluster"]] = r
    assert all(r["keep"] for r in by_cluster.values())
