"""Regenerate PLANS.md: annotated formatted physical plans for the headline
queries. Run from the repo root: ``python tools/gen_plans.py``."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pythonmapreduce_spark.plans.registry import QUERIES, load_all  # noqa: E402
from pythonmapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

NOTES = {
    "join_star": (
        "lineitem (the 100 TB fact) is joined without ever shuffling: "
        "orders/customer arrive via shuffle exchanges only on THEIR side at "
        "larger SFs, nation/region are broadcast; one exchange for the final "
        "aggregation."
    ),
    "agg_basic": (
        "partial HashAggregate before the exchange (map-side combine) — only "
        "|groups| rows shuffle, not |lineitem|; the reference ships every "
        "(word,1) pair uncombined."
    ),
    "wordcount": (
        "explode stays inside WholeStageCodegen; partial+final aggregate pair "
        "around one exchange keyed by word."
    ),
    "topk": (
        "TakeOrderedAndProject: per-partition top-k, k rows per partition to "
        "the driver — no global sort."
    ),
    "topk_per_group": (
        "WindowGroupLimit prunes each partition to k rows per key BEFORE the "
        "window sort — grouped top-k without materializing full partitions."
    ),
    "join_broadcast": (
        "supplier⋈nation dim chain broadcast to every executor; the fact "
        "table's only exchange is the final agg on n_name."
    ),
    "tpch_q6": (
        "all four predicates in PushedFilters at the parquet scan; single-row "
        "combine, no shuffle of data rows."
    ),
    "knn_cosine": (
        "corpus never shuffles: queries broadcast (BroadcastNestedLoopJoin "
        "over 20 rows), scoring inside codegen, per-query top-k via window."
    ),
    "knn_blocked": (
        "scale formulation of knn_cosine (same oracle): local top-k per "
        "(query, block) spreads ranking over 8x more partitions, global "
        "merge sees only blocks*k rows per query — no per-query straggler "
        "partition at 1000-executor scale."
    ),
    "dedup_near": (
        "MinHash-LSH: one scan computes 64 signatures via partial+final "
        "min-aggregates (scalar xxhash64 shingle hashing, no HOFs); pairs "
        "generated IN-bucket by groupBy+combination-explode so the "
        "signature pipeline runs once (a band self-join would run it per "
        "side); Jaccard verify runs as shuffle hash joins on doc_id with "
        "the pair side hinted as build — nothing corpus-proportional is "
        "ever broadcast (the pair list grows with the corpus)."
    ),
    "tpch_q3": (
        "both date predicates push to their scans; customer filter prunes "
        "before the fact joins; LIMIT 10 lowers to TakeOrderedAndProject "
        "on the rounded-revenue sort key (heap merge, no global sort)."
    ),
    "profile_columns": (
        "exact profiling in two narrow passes: one HashAggregate computes "
        "nulls/min/max for every column on native types; distincts go "
        "through a 2-column-wide stack() explode + partial-distinct "
        "aggregate, so shuffle width is independent of profiled column "
        "count and the corpus is never sorted."
    ),
    "doc_chunks": (
        "tokenize → sequence(starts) → explode → slice, all inside one "
        "WholeStageCodegen scan stage: zero exchanges, chunking runs at "
        "scan bandwidth and scales with input splits."
    ),
    "sequence_pack": (
        "running-sum window PARTITIONED by shard (one exchange on shard), "
        "then a partial+final aggregate per (shard,bin) — no global window, "
        "shards pack in parallel."
    ),
    "domain_mix": (
        "per-language rates from a tiny aggregate re-broadcast onto the "
        "corpus scan (BroadcastHashJoin) followed by a stateless hash "
        "filter — the corpus is filtered in place, never shuffled or "
        "ranked; one exchange for the final per-language count."
    ),
    "sketch_frequent_items": (
        "single pass: partial approx_top_k sketches merge map-side "
        "(ObjectHashAggregate partial+final around one 1-row exchange); "
        "memory bounded by maxItemsTracked regardless of corpus size."
    ),
    "triangle_count": (
        "node-iterator wedge join: both joins are vertex-key equi-joins "
        "(no cartesian, no nested loop); the vertex total order orients "
        "each triangle exactly once, and wedge volume is the Σ deg² bound "
        "kept small by the order-size-bounded co-occurrence degree."
    ),
    "tfidf_cosine_pairs": (
        "partial dot products generated per POSTING LIST (equi-join on the "
        "bigram key), never per document pair; the df∈[2,100] prune bounds "
        "Σ|posting|² — prefix filtering, the only way all-pairs similarity "
        "survives 100 TB. One exchange on the term key, one on (d1,d2)."
    ),
    "bm25_rank": (
        "query-term filter sits in the scan stage (non-matching tokens never "
        "shuffle); idf and corpus stats broadcast; TakeOrderedAndProject "
        "caps the ranking at k rows per partition."
    ),
    "semdedup": (
        "fixed-K (deployment constant, fixture 64) assignment as a "
        "MapInPandas chunked GEMM — the K×d centroid matrix is a bounded "
        "driver collect torrent-broadcast outside the plan, so there is NO "
        "join node and no broadcast-threshold cliff at any K; the argmax "
        "key is the integer-encoded ROUND(dot,4)/cid pair shared with the "
        "oracle; the in-cluster pair join shuffles on the cluster key. A "
        "deployment sizes K to the corpus (semdedup_k), keeping both "
        "stages linear."
    ),
    "tokenizer_apply": (
        "zero exchanges: the trained merges are driver-side literals applied "
        "as chained codegen'd string replaces over the marker-encoded scan; "
        "symbol counts are length arithmetic, never an explode."
    ),
    "remove_dup_spans": (
        "span identity crosses exchanges only as a compact hash; coverage "
        "explodes to (doc_id, pos) int pairs; the anti-join and the rebuild "
        "sort both key on doc_id, reusing one partition layout."
    ),
    "graph_clustering_coef": (
        "the oriented edge base materializes once and feeds wedges, the "
        "closing probe, AND the degree count; triangle corners union back "
        "to vertex keys for combine-enabled counting — work stays within "
        "the wedge bound, output is |V|."
    ),
    "hits_hub_authority": (
        "mutually-recursive two-table update: each half-round is one "
        "vertex-key equi-join + partial/final sum; normalizers are 1-row "
        "broadcasts; deterministic top-20 caps the output."
    ),
    "ann_pq": (
        "the final ADC scan: the encoded corpus (8 one-byte codes/vector) "
        "never shuffles; the 20 query distance tables broadcast; the "
        "estimated distance is a JVM higher-order fold, and the only "
        "exchange is the q_id top-k window. Training/encode are separate "
        "bounded-collect jobs upstream of this plan."
    ),
    "dataset_shuffle_shards": (
        "exactly the write topology: one hash exchange on the shard key + "
        "per-partition sort (window), partial+final aggregate for the "
        "checksums — deliberately NO global range sort."
    ),
    "media_chunk_cdc": (
        "content-defined chunking in ONE Arrow stage over the scan "
        "(rolling-hash boundaries are a local 8-byte window — no cross-row "
        "state); payload bytes never leave it, and both exchanges key on "
        "the 32-byte digest with partial aggregation ahead of each."
    ),
    "graph_cc_bigstar": (
        "four star-contraction rounds, each one neighborhood min-aggregate "
        "+ a re-keyed distinct edge emission over the materialized previous "
        "round — nothing wider than (vertex, vertex) int pairs in any "
        "exchange; the O(log n)-round CC shape."
    ),
    "winnow_fingerprints": (
        "gram explode + hashing in the scan stage; ONE doc_id partition "
        "sort serves both the 5-gram min window and the lead() validity "
        "check; all later aggregates reuse doc_id-keyed exchanges."
    ),
    "label_propagation_communities": (
        "final community-size aggregate over the checkpointed round-2 "
        "labels (iter_materialize truncates the per-round lineage — "
        "tests/test_plans.py pins the per-round shape explicitly: vote "
        "equi-join + count agg + WindowGroupLimit top-1, no cartesian)."
    ),
    "search_ndcg_mrr": (
        "offline ranking evaluation with bm25_rank's scan discipline: both "
        "corpus explodes (terms and bigrams) carry their IN-list filter "
        "directly on the Generate, so only the 6 eval terms / 3 query "
        "phrases ever reach an Exchange; qmap/idf/avgdl broadcast; every "
        "aggregate past the per-query top-10 touches ≤ |queries|·k rows. "
        "tests/test_plans.py asserts every Generate's parent is a Filter "
        "and the documents scans read only (doc_id, text)."
    ),
    "dedup_unicode_normalized": (
        "ONE ArrowEvalPython stage (NFC) over a text-only pruned scan — "
        "digest and the denormalized flag both derive from the same "
        "normalized column; downstream ships 16-byte digests, and the "
        "only non-equi join is the 1-row broadcast of the raw-unique "
        "aggregate."
    ),
    "audio_decode_wav": (
        "REAL stdlib WAV codec round trip in one narrow MapInPandas "
        "directly over a two-column pruned scan (doc_id, n_chars — text "
        "pruned): zero exchanges in the whole plan; payloads are built "
        "and decoded inside the stage so no blob ever shuffles."
    ),
    # --- round-7: the driver-attestation window's plan families
    # (time-series / event-analytics / ML-eval / as-of / TPC-H tier) ---
    "session_funnel": (
        "sessionization via the engine's session_window merge: ONE "
        "user-key exchange assigns 30-min-gap sessions and the "
        "conditional first-signup/last-purchase flags fold into the same "
        "combine-enabled aggregate; the funnel rollup then runs on "
        "|sessions| rows — no per-step self-join, no second pass over "
        "events."
    ),
    "resample_ohlc": (
        "positional open/close WITHOUT a window: min_by/max_by on the "
        "(µs, event_id) struct key are algebraic aggregates, so the "
        "whole OHLC bar builds in one partial+final aggregate pair and "
        "|days| rows cross the one exchange regardless of trade volume "
        "(the struct-keyed buffers route to SortAggregate — a "
        "per-partition sort on the day key, map-side combine intact — "
        "vs the naive first/last-over-window form that exchanges and "
        "sorts every event under a per-day window)."
    ),
    "rolling_zscore": (
        "aggregate-then-window: the event log collapses to |days| rows "
        "FIRST, then the trailing 14-row frame (current day excluded) "
        "runs on that tiny series — the single-partition window sort is "
        "|days| wide, never events-wide; at 100 TB the only O(events) "
        "work is the day-key partial aggregate."
    ),
    "survival_km": (
        "Kaplan–Meier as three collapses: events → |users| last-seen "
        "rows (one key exchange), → |days| death counts, then the "
        "at-risk countdown and the EXP(SUM(LN)) cumulative product are "
        "windows over the |days| curve. Horizon AND cohort size come "
        "from ONE 1-row broadcast aggregate (round 7: two separate aggs "
        "each re-derived the user-key collapse — a third events pass; n "
        "now rides through the deaths aggregate as a constant), and the "
        "surviving pair of last-seen derivations shares its exchange at "
        "runtime (executed plan: 2 events scans, 1 ReusedExchange). "
        "Nothing wider than |users| ever shuffles."
    ),
    "auc_roc": (
        "exact Mann–Whitney AUC with the collapse-first discipline "
        "(ks_statistic's): the O(events) work is ONE combine-enabled "
        "partial+final aggregate to distinct scores; the unavoidable "
        "global-order window (cumulative counts → midranks) then runs "
        "over rows bounded by the SCORE DOMAIN, not the corpus — the "
        "pre-round-7 form ranked raw rows, i.e. |events| through a "
        "single-partition window sort. Midrank math from (cnt, pos) "
        "group moments is float-exact vs the per-row form (multiples "
        "of 0.5 below 2^53); per-partition U-statistic merge is the "
        "documented fallback for truly continuous unquantized scores."
    ),
    "join_asof_nearest": (
        "both as-of directions in ONE user-key exchange: purchases and "
        "clicks union into a single sorted stream; the backward pass "
        "orders (ts, right-first) and the forward pass (ts, right-last) "
        "— two local sorts on the same partitioning, per-partition state "
        "one row per direction, never a range-join explosion."
    ),
    "bitemporal_asof": (
        "valid-time intervals close via one lead() per user, then the "
        "two-axis lookup is a user-key EQUI-join with residual interval "
        "+ knowledge predicates and a row_number pick of the most "
        "recently learned state — both sides co-partition on user_id, "
        "one exchange each; the non-equi axes stay residual conditions, "
        "never the join key, so no BNLJ/cartesian appears."
    ),
    "window_range_frame": (
        "time-based RANGE frame (trailing 1 h by epoch seconds) — the "
        "sliding aggregate rows-frames cannot express on irregular "
        "event times; one user-key exchange + per-partition sort, frame "
        "bounds evaluated on the order value so peers enter together."
    ),
    "tpch_q9": (
        "the LIKE filter prunes part BEFORE it reaches the fact join and "
        "the profit expression computes pre-shuffle, so only (nation, "
        "year, amount) crosses the aggregate exchange; dims broadcast, "
        "lineitem never re-sorts."
    ),
    "tpch_q18": (
        "Catalyst rewrites the HAVING IN-subquery to a left-semi join "
        "against the filtered aggregate; lineitem is scanned twice but "
        "shuffles on l_orderkey both times, so AQE's runtime "
        "ReusedExchange serves the second consumer from the first "
        "shuffle's files."
    ),
}


def main() -> None:
    load_all()
    spark = get_spark(cpus="8")
    jvm = spark._jvm
    out = [
        "# PLANS — annotated physical plans (generated at sf0.01, local[8])",
        "",
        "Regenerate: `python tools/gen_plans.py`. These are the plans the scale",
        "story depends on; `tests/test_plans.py` asserts the load-bearing shapes",
        "(pushdown, broadcast, partial agg, WindowGroupLimit, AQE re-plan) so",
        "regressions fail CI rather than silently degrading at 100 TB.",
        "",
    ]
    for name, note in NOTES.items():
        df = QUERIES[name](spark, SF)
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    # PLANS_OUT lets tools/check_plan_drift.py capture to a temp file and
    # diff against the committed dump without touching it.
    dest = os.environ.get(
        "PLANS_OUT", os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    )
    with open(dest, "w") as fh:
        fh.write("\n".join(out))


if __name__ == "__main__":
    main()
