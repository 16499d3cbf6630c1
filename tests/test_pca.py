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
