"""Training-corpus curation operators: chunking, sequence packing, domain
mixing, and sketch-based frequency profiling.

These are the steps between a cleaned corpus and a tokenized training run:
split long documents into model-window chunks, pack variable-length
documents into fixed token budgets, rebalance the domain/language mixture,
and profile token frequencies with a mergeable sketch. The reference has no
analog for any of them (its surface is two MapReduce jobs,
/root/reference/mapreduce_wc.py:3-11) — this module exists because the
engine's target workload is LLM data preparation, where these four shapes
are the daily drivers.

Tokenizer contract matches the rest of the text tier (FIXTURES.md): split
on whitespace, drop empties, case-sensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register

# Model context window for chunking/packing. Small enough that the fixture
# corpus (~100 tokens/doc) produces multi-chunk docs and multi-doc bins —
# the same code path a 8k/128k window takes on real documents.
_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks
_SEQ_LEN = 2048
_PACK_SHARD = 1000  # docs per packing shard (scale unit, see sequence_pack)


@register(
    "doc_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           array_to_string(tokens[start + 1 : start + {_CHUNK_SIZE}], ' ') AS chunk_text,
           LEAST({_CHUNK_SIZE}, len(tokens) - start) AS n_tok
    FROM toks, LATERAL (
        SELECT unnest(generate_series(0, len(tokens) - 1, {_CHUNK_STRIDE})) AS start
    ) s
    WHERE len(tokens) > 0
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: fixed {size}-token chunks every
    {stride} tokens (8-token overlap preserves cross-boundary context),
    the standard pre-tokenization split for long documents.

    Scale shape: one narrow stage — tokenize, generate window starts with
    `sequence`, explode, slice. No shuffle at all (the explode multiplies
    rows ~n_tok/stride × inside the scan stage), so it parallelizes as the
    input splits do and a 100 TB corpus chunks at full scan bandwidth.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", r"\s+"), lambda t: t != "").alias("tokens"),
    ).where(F.size("tokens") > 0)
    starts = toks.select(
        "doc_id",
        "tokens",
        F.explode(
            F.sequence(F.lit(0), F.size("tokens") - 1, F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        (F.col("start") / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.array_join(
            F.slice("tokens", F.col("start") + 1, F.lit(_CHUNK_SIZE)), " "
        ).alias("chunk_text"),
        F.least(F.lit(_CHUNK_SIZE), F.size("tokens") - F.col("start")).alias("n_tok"),
    )


@register(
    "sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(doc_id / {_PACK_SHARD} AS BIGINT) AS shard,
               len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_tok
        FROM documents
    ),
    placed AS (
        SELECT shard, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tok) / {_SEQ_LEN}.0) AS BIGINT) AS bin
        FROM toks
    )
    SELECT shard, bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           ROUND(SUM(n_tok) / {_SEQ_LEN}.0, 4) AS fill_ratio
    FROM placed
    GROUP BY shard, bin
    """,
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: documents are laid end-to-end in
    doc_id order and assigned to the {seq_len}-token training bin their
    START offset falls in (document-boundary packing with overflow — the
    greedy packer every data loader implements, made order-deterministic).

    Scale shape: the running sum is windowed PER SHARD of {shard} adjacent
    doc_ids, never over the global corpus — a single unpartitioned window
    would serialize 100 TB through one task, while shards pack in parallel
    and each is a bounded, reproducible unit (re-packing shard 7 never
    changes shard 8's bins, which is what makes incremental re-runs safe).
    Output is the per-bin fill profile (the packing-efficiency report).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") / _PACK_SHARD).cast("bigint").alias("shard"),
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n_tok"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.select(
        "shard",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / float(_SEQ_LEN)).alias("bin"),
    )
    return placed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.sum("n_tok") / float(_SEQ_LEN), 4).alias("fill_ratio"),
    )


@register(
    "domain_mix",
    oracle="""
    WITH c AS (
        SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ),
    t AS (
        SELECT lang, cnt,
               CAST(FLOOR(MIN(cnt) OVER () * 10000.0 / cnt) AS BIGINT) AS thr
        FROM c
    )
    SELECT d.lang, t.cnt AS n_orig, COUNT(*) AS n_kept
    FROM documents d JOIN t ON d.lang = t.lang
    WHERE (d.doc_id * 2654435761) % 4294967296 % 10000 < t.thr
    GROUP BY d.lang, t.cnt
    """,
)
def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language rebalancing: deterministically downsample every
    language to the smallest language's volume (uniform target mixture) —
    the mixing step that keeps one dominant web domain from swamping a
    training run.

    Keep decisions use the same Knuth multiplicative hash as dataset_split
    (engine-stable, no RNG), so the kept subset is reproducible and
    composable with the split. Scale shape: per-language rates come from a
    tiny aggregate that BROADCASTS back onto the corpus — the 100 TB side
    is filtered by a stateless hash predicate in the scan stage, never
    shuffled and never ranked (a per-language window rank would funnel each
    language through one partition).
    """
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    # MIN over the |langs|-row aggregate — unpartitioned window is fine on
    # a handful of rows (same aggregate-then-window policy as share_of_total)
    thr = counts.select(
        "lang",
        "cnt",
        F.floor(F.min("cnt").over(Window.partitionBy()) * 10000.0 / F.col("cnt"))
        .cast("bigint")
        .alias("thr"),
    )
    keep = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % 10000 < F.col("thr")
    return (
        docs.join(F.broadcast(thr), "lang")
        .where(keep)
        .groupBy("lang", F.col("cnt").alias("n_orig"))
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "sketch_frequent_items",
    oracle=f"""
    SELECT word, COUNT(*) AS n
    FROM (
        SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
        FROM documents
    )
    GROUP BY word
    HAVING COUNT(*) > 400
    """,
)
def sketch_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens via the mergeable approx_top_k sketch (DataSketches
    FrequentItems): ONE pass, bounded memory, partial sketches merged
    map-side — the single-pass complement to heavy_hitters' exact two-pass
    pigeonhole (same >400 threshold contract, so the two mechanisms are
    directly cross-checkable).

    Correctness regime, proven by the exact GROUP BY oracle: with
    maxItemsTracked (100k) ≥ true cardinality the sketch never evicts and
    its counts are EXACT; beyond capacity it degrades to ±N/maxItemsTracked
    error bounds instead of failing — the property that makes it safe to
    leave in a 100 TB job where cardinality is unknown upfront. The >400
    filter (not the rank-k cut) makes the output tie-independent.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("word")
    )
    return (
        words.agg(F.expr("approx_top_k(word, 40, 100000)").alias("tk"))
        .select(F.explode("tk").alias("s"))
        .select(F.col("s.item").alias("word"), F.col("s.count").alias("n"))
        .where(F.col("n") > 400)
    )
