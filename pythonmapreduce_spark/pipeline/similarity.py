"""Similarity search over embedding vectors (array<float> columns).

Three operators:
- ``knn_cosine``: brute-force top-k cosine neighbors for a bounded query
  set — the exact baseline. Per-row norms are precomputed and the query
  side is broadcast, so the big side streams through one stage with no
  shuffle of the corpus.
- ``ann_ivf``: IVF-style approximate search — assign every vector to its
  nearest centroid (one linear pass), probe only the closest clusters at
  query time. This is the 100 TB path: cluster assignment partitions the
  corpus, and each query touches ~nprobe/K of the data.
- ``dup_embedding``: embedding-cosine near-duplicate pairs over a bounded
  id range (oracle-checkable exact variant of semantic dedup).

All vector math is built-in array expressions (zip_with/aggregate) in
double precision — JVM-side, no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register

_KNN_QUERIES = 20  # vec_id <= 20 form the query set
_KNN_K = 10


def _as_double(col: F.Column) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(df: DataFrame, vec: str = "v") -> DataFrame:
    """Precompute the L2 norm once per row (reused across all comparisons)."""
    return df.withColumn("nrm", _norm(F.col(vec)))


@register(
    "knn_cosine",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id <= {_KNN_QUERIES}
    ), c AS (
        SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings
    ), scored AS (
        SELECT q_id, n_id,
               list_cosine_similarity(qv, nv) AS cos_raw
        FROM q CROSS JOIN c
        WHERE q_id <> n_id
    )
    SELECT q_id, n_id, ROUND(cos_raw, 4) AS cosine, rn AS rank
    FROM (
        SELECT q_id, n_id, cos_raw,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_raw DESC, n_id ASC) AS rn
        FROM scored
    )
    WHERE rn <= {_KNN_K}
    """,
)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) ⋈ corpus → per-partition scoring →
    window top-k per query. The corpus is scanned once, never shuffled
    (the only exchange is on q_id for the final top-k, k rows per query
    per partition after partial ranking).
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    corpus = with_norm(emb).select(
        F.col("vec_id").alias("n_id"), F.col("v").alias("nv"), F.col("nrm").alias("n_nrm")
    )
    queries = with_norm(emb.where(F.col("vec_id") <= _KNN_QUERIES)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("q_nrm")
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("q_id") != F.col("n_id"))
        .withColumn("cos_raw", _dot(F.col("qv"), F.col("nv")) / (F.col("q_nrm") * F.col("n_nrm")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _KNN_K)
        .select("q_id", "n_id", F.round("cos_raw", 4).alias("cosine"), F.col("rank").cast("long").alias("rank"))
    )


@register("ann_ivf")  # approximate (probed subset) → rows-only
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: coarse-quantize the corpus into
    K=16 clusters (centroids = the first 16 vectors — deterministic), then
    answer each query by scanning only its nprobe=4 closest clusters.

    Scale path: the corpus pass is one broadcast join against 16 centroids
    + max_by argmax; at query time each query scores ~K/nprobe of the data.
    Recall is approximate ⇒ rows-only check; the exact twin is knn_cosine.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    emb = with_norm(emb)
    centroids = emb.where(F.col("vec_id") <= 16).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("c_nrm")
    )
    # One pass: assign every vector to its nearest centroid.
    sim = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("c_nrm"))
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("sim", sim)
        .groupBy("vec_id")
        .agg(
            F.max_by("c_id", "sim").alias("cluster"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
    )
    # Query side: nprobe=4 closest clusters per query vector.
    queries = assigned.where(F.col("vec_id") <= _KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("q_nrm")
    )
    qsim = _dot(F.col("qv"), F.col("cv")) / (F.col("q_nrm") * F.col("c_nrm"))
    wq = W.partitionBy("q_id").orderBy(F.col("qsim").desc(), F.col("c_id").asc())
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("qsim", qsim)
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= 4)
        .select("q_id", "qv", "q_nrm", F.col("c_id").alias("cluster"))
    )
    # Score only vectors in probed clusters.
    scored = (
        probes.join(assigned, "cluster")
        .where(F.col("q_id") != F.col("vec_id"))
        .withColumn("cos_raw", _dot(F.col("qv"), F.col("v")) / (F.col("q_nrm") * F.col("nrm")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _KNN_K)
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round("cos_raw", 4).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "dup_embedding",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id <= 400
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.4
    """,
)
def dup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine above a corpus-calibrated threshold) over a bounded
    id range — the exact, oracle-checkable core of semantic dedup.

    At full scale the same scoring runs behind an LSH/IVF candidate
    generator (see ann_ivf) instead of the bounded self-join used here.
    """
    emb = with_norm(
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") <= 400)
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.4)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cosine"))
    )


@register(
    "embedding_centroid",
    oracle="""
    SELECT label, pos, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS centroid_val
    FROM (
        SELECT label,
               UNNEST(range(len(embedding))) AS pos,
               UNNEST(embedding) AS val
        FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors (mean pooling).

    Emitted FLAT — one row per (label, dimension) — rather than
    re-assembled into arrays: flat rows partial-aggregate map-side like any
    numeric agg, and the comparison contract stays scalar. posexplode is a
    generator expression, not a UDF, so the whole plan is codegen'd. At
    100 TB this is the shape of per-cluster mean computation: |labels|×dim
    output rows regardless of corpus size.
    """
    return (
        load(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"))
    )
