"""Semantic contracts for the curation tier beyond the DuckDB oracles:
coverage/overlap invariants for chunking, bin-boundary invariants for
packing, and mixture bounds for domain rebalancing. These are the
properties a training pipeline silently corrupts data by violating —
an oracle twin built from the same (possibly wrong) spec can't catch them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.pipeline.curation import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _SEQ_LEN,
)
from pythonmapreduce_spark.plans import registry

registry.load_all()


def test_doc_chunks_cover_every_token(spark, sf_smoke) -> None:
    """Token conservation: summing each doc's chunk lengths minus the
    overlap double-count must equal the doc's token count, and every doc
    must produce ceil-ish n_chunks = 1 + floor((n-1)/stride) chunks."""
    chunks = registry.QUERIES["doc_chunks"](spark, sf_smoke)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("n_tok").alias("max_tok"),
        F.min("n_tok").alias("min_tok"),
        F.max(F.col("chunk_idx")).alias("last_idx"),
    )
    docs = (
        load(spark, sf_smoke, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n_tok_doc"),
        )
        .where(F.col("n_tok_doc") > 0)
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.where(
        (F.col("n_chunks") != 1 + F.floor((F.col("n_tok_doc") - 1) / _CHUNK_STRIDE))
        | (F.col("last_idx") != F.col("n_chunks") - 1)
        | (F.col("max_tok") > _CHUNK_SIZE)
        | (F.col("min_tok") < 1)
    )
    assert bad.count() == 0
    # no document lost: every nonempty doc appears
    assert per_doc.count() == docs.count()


def test_doc_chunks_overlap_is_exact(spark, sf_smoke) -> None:
    """Consecutive chunks of one doc overlap by exactly size-stride tokens:
    chunk i's tail equals chunk i+1's head wherever chunk i is full."""
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    chunks = registry.QUERIES["doc_chunks"](spark, sf_smoke).select(
        "doc_id", "chunk_idx", "chunk_text", "n_tok"
    )
    nxt = chunks.select(
        "doc_id",
        (F.col("chunk_idx") - 1).alias("chunk_idx"),
        F.col("chunk_text").alias("next_text"),
    )
    pairs = chunks.where(F.col("n_tok") == _CHUNK_SIZE).join(nxt, ["doc_id", "chunk_idx"])
    toks = F.split(F.col("chunk_text"), " ")
    tail = F.array_join(F.slice(toks, _CHUNK_SIZE - overlap + 1, overlap), " ")
    head = F.array_join(F.slice(F.split(F.col("next_text"), " "), 1, overlap), " ")
    assert pairs.where(tail != head).count() == 0


def test_sequence_pack_bins_are_contiguous_and_bounded(spark, sf_smoke) -> None:
    """Within a shard, bins are consecutive integers from 0, every bin's
    start offset is below the next bin boundary (fill accounting), and a
    bin never holds more tokens than seq_len + one max document (overflow
    bound of document-boundary packing)."""
    bins = registry.QUERIES["sequence_pack"](spark, sf_smoke)
    per_shard = bins.groupBy("shard").agg(
        F.min("bin").alias("bmin"),
        F.max("bin").alias("bmax"),
        F.count(F.lit(1)).alias("nbins"),
        F.sum("n_tokens").alias("shard_tokens"),
    )
    # contiguity: bins 0..bmax all present
    assert per_shard.where((F.col("bmin") != 0) | (F.col("nbins") != F.col("bmax") + 1)).count() == 0
    max_doc = (
        load(spark, sf_smoke, "documents")
        .select(F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert bins.where(F.col("n_tokens") > _SEQ_LEN + max_doc).count() == 0
    # token conservation across the whole corpus
    total_bins = bins.agg(F.sum("n_tokens")).collect()[0][0]
    total_docs = (
        load(spark, sf_smoke, "documents")
        .select(F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_bins == total_docs


def test_domain_mix_balances_languages(spark, sf_smoke) -> None:
    """Every language keeps ≈ the smallest language's count: kept counts
    within a 25% relative band of min_lang (hash-uniformity tolerance at
    smoke SF), and never above n_orig."""
    mix = registry.QUERIES["domain_mix"](spark, sf_smoke).collect()
    min_orig = min(r.n_orig for r in mix)
    for r in mix:
        assert r.n_kept <= r.n_orig
        assert abs(r.n_kept - min_orig) <= max(8, 0.25 * min_orig), (
            f"{r.lang}: kept {r.n_kept} vs target {min_orig}"
        )


def test_sketch_matches_heavy_hitters_contract(spark, sf_smoke) -> None:
    """Cross-mechanism consistency: the single-pass sketch and the exact
    two-pass heavy_hitters agree on the >400 frequent-token set (sketch is
    exact below capacity, so this is equality, not approximation)."""
    sk = {
        (r.word, r.n)
        for r in registry.QUERIES["sketch_frequent_items"](spark, sf_smoke).collect()
    }
    hh_df = registry.QUERIES["heavy_hitters"](spark, sf_smoke)
    cols = hh_df.columns
    hh = {(r[cols[0]], r[cols[1]]) for r in hh_df.collect()}
    assert sk == hh, f"sketch-only: {sk - hh}; hh-only: {hh - sk}"
