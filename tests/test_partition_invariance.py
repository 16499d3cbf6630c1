"""Partition-invariance: a distributed engine's results must not depend on
HOW the data was parallelized. Every query here is executed under three
shuffle-partition settings (1, 17, and the session default) and must
produce the identical canonical row multiset.

This is the distributed-correctness property the oracle diff cannot see
(DuckDB has no partitioning): float aggregation order, window tiebreaks,
limit/top-k selection, and hash-based sampling all CAN silently depend on
partition boundaries if written carelessly. The query set spans each of
those risk families; registry-wide determinism then follows from the same
authoring rules (pinned tiebreaks, rounded ranking keys, hash-based
sampling) the suite enforces elsewhere.
"""

from __future__ import annotations

import pytest

from pythonmapreduce_spark.plans import registry
from tests.harness import _canon_rows

registry.load_all()

SF = "/root/testdata/sf0.001"

RISK_FAMILIES = [
    "agg_basic",               # float sums: rounded at declared precision
    "topk",                    # global limit under TakeOrderedAndProject
    "topk_per_group",          # window rank tiebreaks
    "knn_cosine",              # rounded-cosine ranking at the k boundary
    "sample_reservoir_group",  # hash-order sampling
    "dedup_near",              # LSH bucket pair generation
    "pagerank_iter",           # iterative float agg + top-20 boundary
    "heavy_hitters",           # per-partition pigeonhole candidates
    "wordcount",               # baseline partial+final agg
    "mode_per_group",          # count ties
    "weighted_median",         # cumulative-weight crossing row
    "event_paths3",            # trigram top-k boundary
    "skyline_pareto",          # running-min over a global order
    "ab_test_lift",            # hash-assigned arms + scalar pivot
    "semdedup",                # rounded-dot centroid argmax + pair prune
    "remove_dup_spans",        # per-doc rebuild from sorted (pos, token)
    "ewma_smooth",             # row-number band self-join on a float agg
    "auc_roc",                 # global rank with midrank tie handling
    "hits_hub_authority",      # iterative float ranking + top-20 boundary
    "token_budget_allocator",  # largest-remainder rank at the +1 boundary
    "resample_ohlc",           # min_by/max_by positional extremes
    "ann_pq_recall",           # Lloyd-trained codebooks: float partial sums
    #                            feed an argmin encode (kmeans-family risk)
    "winnow_fingerprints",     # per-window argmin selection (integer key,
    #                            must not depend on partition boundaries)
    "dataset_shuffle_shards",  # hash sharding + within-shard permutation
    "survival_km",             # EXP(SUM(LN)) cumulative product over days
    "stream_chained_agg",      # two chained stateful operators, one query
    "gains_deciles",           # global NTILE boundaries under a pinned order
    "graph_cc_bigstar",        # 4 chained star-contraction rounds (integer
    #                            min/join/distinct) across materializations
]


@pytest.mark.parametrize("name", RISK_FAMILIES)
def test_result_invariant_to_partitioning(name: str, spark) -> None:
    fn = registry.QUERIES[name]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("1", "17", default):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results.append(_canon_rows(fn(spark, SF).toPandas()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert results[0] == results[1] == results[2], (
        f"{name}: result depends on shuffle partitioning"
    )
