#!/usr/bin/env python3
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_total", "value": N, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": 0.1}

Each query executes fully through the noop sink (no driver-side collect,
no result materialization cost — pure engine time).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Headline set: one representative per operator family, weighted toward the
# shuffle/join/agg-heavy paths that dominate at scale.
HEADLINE = [
    "join_star",
    "agg_basic",
    "join_broadcast",
    "wordcount",
    "inverted_index",
    "window_rank",
    "window_tumbling",
    "dedup_exact",
    "dedup_near",
    "dedup_simhash",
    "knn_cosine",
    "ann_ivf",
    "pipeline_clean_corpus",
    "heavy_hitters",
    "text_stats",
    "topk",
    # round-2 additions: multi-join TPC-H, substring/chunk dedup, the
    # distributed GEMM kernel, and the profiling pass.
    "tpch_q9",
    "dup_ngram_spans",
    "media_chunk_dedup",
    "gram_matrix",
    "profile_columns",
    # round-2 second wave: graph analytics (wedge join + iterative rank),
    # sparse all-pairs similarity, and the two LM/search rankers.
    "triangle_count",
    "pagerank_iter",
    "tfidf_cosine_pairs",
    "bm25_rank",
    "lm_perplexity",
    # round-2 third wave: frontier-iterative BFS, per-edge overlap,
    # basket metrics, and the exact sliding distinct.
    "bfs_distances",
    "graph_common_neighbors",
    "basket_rules",
    "sliding_distinct_users",
    # round-3 additions: the heaviest TPC-H EXISTS/NOT-EXISTS shape, SCD2
    # dimension snapshots, a real one-shot streaming window, and the
    # greedy sequence packer — the previously unbenchmarked tiers.
    "tpch_q21",
    "scd2_snapshot",
    "stream_event_window",
    "sequence_pack",
    # round-3 second wave: the BPE encode loop, span-rewrite dedup,
    # clustered semantic dedup, and the rank-statistic AUC — the
    # tokenizer/rewrite/embedding-dedup/eval tiers.
    "tokenizer_apply",
    "remove_dup_spans",
    "semdedup",
    "auc_roc",
    # round-3 third wave: the compressed-index ANN tier (PQ train + encode
    # + ADC scan — the 100 TB retrieval path).
    "ann_pq",
    # round-4 additions: the window-function family (shared-sort named
    # WINDOW clause), exact grouped percentiles, nearest as-of join, and
    # the end-to-end curation pipeline — the families BENCH_r03 still
    # lacked.
    "window_named_clause",
    "percentile_agg",
    "join_asof_nearest",
    "pipeline_train_prep",
    # round-4 second wave: the large-bench decontamination scale path
    # (window-hash equi-join; the regex-lookahead window extraction this
    # round's extended-decade sweep forced).
    "decontamination_ngram",
    # round-4 third wave: stateful outer stream-stream join (watermark
    # eviction + NULL emission), iterative LPA community detection, the
    # Arrow NFC normalization pass, and the tokenizer losslessness
    # contract — one entry each for the newly added families.
    "stream_stream_left_join",
    "label_propagation_communities",
    "dedup_unicode_normalized",
    "tokenizer_roundtrip",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pythonmapreduce_spark.session import get_spark
    from pythonmapreduce_spark.plans import registry

    spark = get_spark("pythonmapreduce-spark-bench", cpus=cpus)
    registry.load_all()

    # Warm the JVM/codegen paths once with a trivial action.
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        # two warmup executions (first triggers codegen + C1 JIT, second
        # lets C2 tiering settle), then the timed run — steady-state
        # throughput is what's comparable across rounds
        for _ in range(2):
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
