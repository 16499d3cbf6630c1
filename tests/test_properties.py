"""Property-based invariants (SURVEY §5.2 item 6): relationships that must
hold regardless of data values — conservation laws for the operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans import registry
from pythonmapreduce_spark.sources.text_corpus import tokens_col

registry.load_all()


def test_wordcount_conserves_tokens(spark, sf_smoke) -> None:
    """sum(counts) == total token occurrences in the corpus."""
    total_tokens = (
        load(spark, sf_smoke, "documents")
        .select(F.size(tokens_col()).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    wc_sum = (
        registry.QUERIES["wordcount"](spark, sf_smoke).agg(F.sum("cnt")).collect()[0][0]
    )
    assert wc_sum == total_tokens


def test_dedup_exact_idempotent(spark, sf_smoke) -> None:
    """Dedup of a deduped corpus removes nothing, and survivors' texts are
    pairwise distinct."""
    survivors = registry.QUERIES["dedup_exact"](spark, sf_smoke)
    docs = load(spark, sf_smoke, "documents")
    kept = docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    n_kept = kept.count()
    assert kept.select("text").distinct().count() == n_kept
    assert docs.select("text").distinct().count() == n_kept


def test_set_op_cardinality_algebra(spark, sf_smoke) -> None:
    """|A| + |B| == |A ∪all B|; |A ∩ B| + |A \\ B| == |A distinct|."""
    seg = (
        load(spark, sf_smoke, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bal = (
        load(spark, sf_smoke, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    assert registry.QUERIES["union_all"](spark, sf_smoke).count() == seg.count() + bal.count()
    n_int = registry.QUERIES["intersect_op"](spark, sf_smoke).count()
    n_exc = registry.QUERIES["except_op"](spark, sf_smoke).count()
    assert n_int + n_exc == seg.distinct().count()


def test_window_rank_bounds(spark, sf_smoke) -> None:
    """row_number is a permutation per partition: max rn == partition size;
    dense_rank <= rank <= row_number everywhere."""
    df = registry.QUERIES["window_rank"](spark, sf_smoke)
    bad = df.where((F.col("drnk") > F.col("rnk")) | (F.col("rnk") > F.col("rn"))).count()
    assert bad == 0
    per_cust = df.groupBy("o_custkey").agg(
        F.max("rn").alias("max_rn"), F.count(F.lit(1)).alias("n")
    )
    assert per_cust.where(F.col("max_rn") != F.col("n")).count() == 0


def test_knn_matches_ann_on_probed_truth(spark, sf_smoke) -> None:
    """IVF results are a subset relation: every ANN hit's cosine is ≤ the
    exact-kNN cosine at the same rank (ANN can miss, never invent)."""
    exact = {
        (r["q_id"], r["rank"]): r["cosine"]
        for r in registry.QUERIES["knn_cosine"](spark, sf_smoke).collect()
    }
    for r in registry.QUERIES["ann_ivf"](spark, sf_smoke).collect():
        assert r["cosine"] <= exact[(r["q_id"], r["rank"])] + 1e-9


def test_simhash_identical_texts_zero_distance(spark, sf_smoke) -> None:
    """Exact duplicate texts must land at Hamming distance 0 — planted
    duplicates via a self-union of the corpus."""
    from pythonmapreduce_spark.pipeline.dedup import _simhash64

    docs = load(spark, sf_smoke, "documents").limit(20)
    a = docs.select(F.col("doc_id").alias("id"), _simhash64(F.col("text")).alias("sig_a"))
    b = docs.select(F.col("doc_id").alias("id"), _simhash64(F.col("text")).alias("sig_b"))
    joined = a.join(b, "id").select(
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("d")
    )
    assert joined.where(F.col("d") != 0).count() == 0


def test_ann_lsh_recall_vs_exact(spark, sf_smoke) -> None:
    """Random-hyperplane LSH must recover most of the exact top-10 (recall
    ≥ 0.6 with 2×8-bit bands on unit vectors) and never invent a better
    neighbor than the exact baseline at the same rank."""
    exact_rows = registry.QUERIES["knn_cosine"](spark, sf_smoke).collect()
    exact_sets: dict[int, set[int]] = {}
    exact_at_rank = {}
    for r in exact_rows:
        exact_sets.setdefault(r["q_id"], set()).add(r["n_id"])
        exact_at_rank[(r["q_id"], r["rank"])] = r["cosine"]

    lsh_rows = registry.QUERIES["ann_lsh"](spark, sf_smoke).collect()
    hits = sum(1 for r in lsh_rows if r["n_id"] in exact_sets.get(r["q_id"], set()))
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.6, f"LSH recall {hits}/{total}"
    for r in lsh_rows:
        if (r["q_id"], r["rank"]) in exact_at_rank:
            assert r["cosine"] <= exact_at_rank[(r["q_id"], r["rank"])] + 1e-9


def test_approx_quantile_error_bound(spark, sf_smoke) -> None:
    """The query now embeds the rank-error contract (accuracy=10000 →
    estimate between exact quantiles at q∓0.002): every per-group
    boolean must hold."""
    rows = registry.QUERIES["approx_quantile"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r


def test_dedup_clusters_are_consistent(spark, sf_smoke) -> None:
    """Every verified near-dup pair must land in ONE cluster; each cluster's
    id is its min member (the survivor); exactly one survivor per cluster."""
    labels = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in registry.QUERIES["dedup_clusters"](spark, sf_smoke).collect()
    }
    pairs = registry.QUERIES["dedup_near"](spark, sf_smoke).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert labels[p["id_a"]][0] == labels[p["id_b"]][0], (p, "split cluster")
    clusters: dict[int, list[int]] = {}
    for doc, (cid, _) in labels.items():
        clusters.setdefault(cid, []).append(doc)
    for cid, members in clusters.items():
        assert cid == min(members)
        assert sum(1 for m in members if labels[m][1]) == 1


def test_lsh_pathological_bucket_stays_linear(spark) -> None:
    """Adversarial corpus: 10k IDENTICAL documents land in one LSH bucket
    per band. Uncapped all-pairs expansion would emit s(s-1)/2 ≈ 50M pairs;
    the _BUCKET_CAP star degradation must keep the output LINEAR (s-1
    distinct pairs, every doc still connected to the hub for downstream
    connected components)."""
    from pythonmapreduce_spark.pipeline.dedup import minhash_candidates

    n = 10_000
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        "'the same boilerplate text repeated in every single document' AS text",
    )
    pairs = minhash_candidates(docs)
    rows = pairs.count()
    # star over the bucket min (doc 0): exactly n-1 distinct pairs, all
    # anchored at the hub
    assert rows == n - 1, f"expected linear {n - 1} pairs, got {rows}"
    hub = pairs.agg(F.min("id_a").alias("m"), F.max("id_a").alias("x")).first()
    assert hub["m"] == 0 and hub["x"] == 0, "star pairs must anchor at the bucket min"


def test_lsh_bucket_stats_matches_independent_recount(spark, sf_smoke) -> None:
    """dedup_lsh_bucket_stats is the registry's only rows-only query
    without an oracle-backed twin (it summarizes LSH-internal bucket ids
    no SQL oracle can reproduce) — so pin it HERE against an independent
    recomputation: collect the (band, bucket) sizes at sf0.001 and
    rebuild every output column in Python, including the pairs_avoided
    accounting (s(s-1)/2 - (s-1) per capped bucket)."""
    from collections import Counter

    from pythonmapreduce_spark.catalog import load
    from pythonmapreduce_spark.pipeline.dedup import _BUCKET_CAP, lsh_bands
    from pythonmapreduce_spark.plans import registry

    sizes = Counter(
        (r["band"], r["bucket"])
        for r in lsh_bands(load(spark, sf_smoke, "documents")).collect()
    )
    want: dict[int, dict[str, int]] = {}
    for (band, _), s in sizes.items():
        w = want.setdefault(
            band, {"n_buckets": 0, "max_bucket": 0, "capped_buckets": 0,
                   "pairs_avoided": 0}
        )
        w["n_buckets"] += 1
        w["max_bucket"] = max(w["max_bucket"], s)
        if s > _BUCKET_CAP:
            w["capped_buckets"] += 1
            w["pairs_avoided"] += s * (s - 1) // 2 - (s - 1)
    got = {
        r["band"]: r.asDict()
        for r in registry.QUERIES["dedup_lsh_bucket_stats"](
            spark, sf_smoke
        ).collect()
    }
    assert set(got) == set(want)
    for band, w in want.items():
        for col, val in w.items():
            assert got[band][col] == val, (band, col, got[band][col], val)


def test_lsh_bucket_cap_preserves_small_bucket_pairs(spark) -> None:
    """Below the cap, pair generation is unchanged: k distinct duplicated
    texts of m copies each yield m*(m-1)/2 pairs per text."""
    from pythonmapreduce_spark.pipeline.dedup import minhash_candidates

    k, m = 5, 4
    texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel",
        "one two three four five six seven eight nine",
        "red orange yellow green blue indigo violet colors",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "spark shuffles partitions across executors during wide stages",
    ]
    arr = ", ".join(f"'{t}'" for t in texts)
    docs = spark.range(k * m).selectExpr(
        "id AS doc_id",
        f"element_at(array({arr}), CAST(id % {k} AS INT) + 1) AS text",
    )
    pairs = minhash_candidates(docs).collect()
    assert len(pairs) == k * m * (m - 1) // 2


def test_approx_distinct_error_bound(spark, sf_smoke) -> None:
    """HLL++ (rsd=0.01) NDV must land within 5% of the exact distinct
    count for every group — the bound that makes approx_distinct usable
    as the 100 TB replacement for exact COUNT(DISTINCT)."""
    rows = {
        r["event_type"]: (r["exact_users"], r["hll_ok"])
        for r in registry.QUERIES["approx_distinct"](spark, sf_smoke).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k, want in exact.items():
        assert rows[k] == (want, True), (k, rows[k], want)


def test_feature_hashing_conserves_tokens(spark, sf_smoke) -> None:
    """Bucketizing must conserve mass: the sum of all bucket counts per
    doc equals the doc's whitespace token count (hashing drops nothing)."""
    fvec = {
        r["doc_id"]: sum(int(p.split(":")[1]) for p in r["fvec"].split(" "))
        for r in registry.QUERIES["feature_hashing"](spark, sf_smoke).collect()
    }
    tok = {
        r["doc_id"]: r["ws_tokens"]
        for r in registry.QUERIES["token_count"](spark, sf_smoke).collect()
        if r["ws_tokens"] > 0
    }
    assert fvec == {k: v for k, v in tok.items()}


def test_cumulative_users_final_equals_total_distinct(spark, sf_smoke) -> None:
    """The growth curve's last point must equal the corpus-wide distinct
    user count, and the curve must be strictly increasing."""
    rows = sorted(
        registry.QUERIES["cumulative_users"](spark, sf_smoke).collect(),
        key=lambda r: r["day"],
    )
    totals = [r["total_users"] for r in rows]
    assert totals == sorted(totals) and len(set(totals)) == len(totals)
    from pythonmapreduce_spark.catalog import load as _load

    n = _load(spark, sf_smoke, "events").select("user_id").distinct().count()
    assert totals[-1] == n


def test_attribution_touch_invariants(spark, sf_smoke) -> None:
    """Every attributed purchase has >= 1 touch; first and last touch
    coincide exactly when n_touches == 1."""
    rows = registry.QUERIES["attribution_touch"](spark, sf_smoke).collect()
    assert rows, "attribution produced no rows at smoke SF"
    for r in rows:
        assert r["n_touches"] >= 1
        if r["n_touches"] == 1:
            assert r["first_touch"] == r["last_touch"]


def test_rag_index_dup_ratio_bounds(spark, sf_smoke) -> None:
    """Chunk inventory sanity: unique <= total chunks and dup_ratio in
    [0, 1); n_docs never exceeds chunk count."""
    for r in registry.QUERIES["pipeline_rag_index"](spark, sf_smoke).collect():
        assert 0 < r["n_unique_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["dup_ratio"] < 1.0
        assert r["n_docs"] <= r["n_chunks"]


def test_observe_metrics_on_query_plan(spark, sf_oracle) -> None:
    """`df.observe` — in-flight metric collection on a query plan (the
    pipeline-monitoring API: row counts and sums recorded DURING the
    action, no second scan). The observation must agree with a direct
    aggregation of the same data."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from pythonmapreduce_spark.catalog import load

    docs = load(spark, sf_oracle, "documents")
    obs = Observation("ingest_stats")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("total_chars"),
    )
    kept = observed.where(F.col("n_chars") > 0).count()
    direct = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
    ).first()
    assert obs.get["n_rows"] == direct["n"]
    assert obs.get["total_chars"] == direct["s"]
    assert kept <= direct["n"]


def test_tokenizer_apply_compression_properties(spark, sf_oracle) -> None:
    """Encoding can only merge symbols: n_symbols ≤ n_chars_enc per doc,
    compression ∈ (0, 1], and the corpus-wide symbol reduction equals the
    total number of merge applications (each merge application removes
    exactly one symbol)."""
    from pythonmapreduce_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["tokenizer_apply"](spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["n_symbols"] <= r["n_chars_enc"]
        if r["n_chars_enc"] > 0:
            assert 0 < r["compression"] <= 1.0


def test_semdedup_survivor_structure(spark, sf_oracle) -> None:
    """Every vector is assigned exactly once; at least one survivor per
    non-empty cluster (the smallest id in a cluster can never be removed
    by the smaller-id-neighbor rule)."""
    from pyspark.sql import functions as F

    from pythonmapreduce_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["semdedup"](spark, sf_oracle)
    n = df.count()
    assert df.select("vec_id").distinct().count() == n
    per_cluster = df.groupBy("cluster").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep")
    )
    assert per_cluster.where(F.col("n_keep") == 0).count() == 0


def test_remove_dup_spans_idempotent(spark, sf_oracle) -> None:
    """Span removal only removes: n_removed ≥ 0 and cleaned token count
    equals n_tokens - n_removed (no token invented by the rebuild)."""
    from pythonmapreduce_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["remove_dup_spans"](spark, sf_oracle).collect()
    assert rows
    for r in rows:
        n_clean = len([t for t in r["cleaned"].split(" ") if t]) if r["cleaned"] else 0
        assert r["n_removed"] >= 0
        assert n_clean == r["n_tokens"] - r["n_removed"]


def test_weighted_quantiles_matches_numpy(spark) -> None:
    """operators/quantiles.weighted_quantiles == numpy's 'linear'
    interpolation (the quantile_cont definition) on randomized grouped
    data with duplicates and NULLs; global (no-group) mode, include_n,
    an all-NULL group, and empty input all behave."""
    import numpy as np

    from pythonmapreduce_spark.operators.quantiles import weighted_quantiles

    rng = np.random.default_rng(1707)
    rows = []
    expected: dict[str, dict[str, float]] = {}
    for g in ("a", "b", "c"):
        # duplicates on purpose: values drawn from a small grid
        vals = rng.choice(np.arange(0, 50, 0.25), size=int(rng.integers(7, 60)))
        for v in vals:
            rows.append((g, float(v)))
        rows.append((g, None))  # NULLs must be ignored
        expected[g] = {
            "q1": float(np.quantile(vals, 0.25, method="linear")),
            "med": float(np.quantile(vals, 0.5, method="linear")),
            "p9": float(np.quantile(vals, 0.9, method="linear")),
        }
    rows.append(("z", None))  # all-NULL group: NULL quantiles, still a row
    df = spark.createDataFrame(rows, "g string, v double")

    got = {
        r["g"]: r.asDict()
        for r in weighted_quantiles(
            df, ["g"], "v", {"q1": 0.25, "med": 0.5, "p9": 0.9}, include_n="n"
        ).collect()
    }
    for g, exp in expected.items():
        for k, want in exp.items():
            assert abs(got[g][k] - want) < 1e-9, (g, k, got[g][k], want)
    assert got["z"]["med"] is None and got["z"]["n"] == 0

    # global mode over the concatenation of all non-null values
    allv = np.array([v for _, v in rows if v is not None])
    gl = weighted_quantiles(df, [], "v", {"med": 0.5}, include_n="n").collect()[0]
    assert abs(gl["med"] - float(np.quantile(allv, 0.5, method="linear"))) < 1e-9
    assert gl["n"] == len(allv)

    # empty input: grouped -> no rows; global -> one row, n=0, NULL quantile
    empty = spark.createDataFrame([], "g string, v double")
    assert weighted_quantiles(empty, ["g"], "v", {"med": 0.5}).count() == 0
    g0 = weighted_quantiles(empty, [], "v", {"med": 0.5}, include_n="n").collect()[0]
    assert g0["n"] == 0 and g0["med"] is None


def test_weighted_quantiles_extra_guard(spark) -> None:
    """The ``extra`` aggregates run over COLLAPSED distinct-value rows, so
    a bare duplicate-sensitive aggregate is a silent wrong answer — the
    round-8 guard must reject it at plan-build time, while dedup-invariant
    (max) and weight-aware (sum(v*_wq_cnt)) forms pass AND the weight-aware
    sum equals the raw-row sum."""
    import pytest
    from pyspark.sql import functions as F

    from pythonmapreduce_spark.operators.quantiles import weighted_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 3.0), ("b", 2.0)], "g string, v double"
    )
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(df, ["g"], "v", {"med": 0.5}, extra={"s": F.sum("v")})
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(df, ["g"], "v", {"med": 0.5}, extra={"c": F.count("v")})
    # Round-9 ADVICE hardening: (a) order/moment statistics are in the
    # alternation — a bare median over collapsed rows is exactly the
    # dedup-distorted answer the module replaces; (b) _wq_cnt must sit
    # INSIDE each duplicate-sensitive call — a separate _wq_cnt term
    # elsewhere in the expression no longer launders a bare sum through.
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(df, ["g"], "v", {"med": 0.5}, extra={"m": F.median("v")})
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(df, ["g"], "v", {"med": 0.5}, extra={"k": F.skewness("v")})
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(
            df,
            ["g"],
            "v",
            {"med": 0.5},
            extra={"s": F.sum("v") + F.max("_wq_cnt") * F.lit(0)},
        )
    # Round-10 ADVICE hardening: the multiplicity-sensitive COLLECTION
    # and PRODUCT aggregates — collect_list returns one element per RAW
    # row, product multiplies once per raw occurrence — are rejected
    # too; collect_set stays allowed (a set over the collapsed distincts
    # IS the raw-row set).
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(
            df, ["g"], "v", {"med": 0.5}, extra={"l": F.collect_list("v")}
        )
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(
            df, ["g"], "v", {"med": 0.5}, extra={"p": F.product("v")}
        )
    with pytest.raises(ValueError, match="duplicate-sensitive"):
        weighted_quantiles(
            df, ["g"], "v", {"med": 0.5}, extra={"a": F.expr("array_agg(v)")}
        )
    got_set = {
        r["g"]: sorted(r["vset"])
        for r in weighted_quantiles(
            df, ["g"], "v", {"med": 0.5}, extra={"vset": F.collect_set("v")}
        ).collect()
    }
    assert got_set["a"] == [1.0, 3.0]
    got = {
        r["g"]: r.asDict()
        for r in weighted_quantiles(
            df,
            ["g"],
            "v",
            {"med": 0.5},
            extra={
                "vmax": F.max("v"),
                "vsum": F.sum(F.col("v") * F.col("_wq_cnt")),
            },
        ).collect()
    }
    assert got["a"]["vmax"] == 3.0 and abs(got["a"]["vsum"] - 5.0) < 1e-12
    assert got["b"]["vmax"] == 2.0 and abs(got["b"]["vsum"] - 2.0) < 1e-12
