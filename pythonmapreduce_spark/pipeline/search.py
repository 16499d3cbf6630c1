"""Search relevance and language-model scoring over the documents corpus.

Extends the text-analysis tier (tfidf_terms, quality_score) with the two
ranking primitives a retrieval/curation stack actually serves:

- bm25_rank: full Okapi BM25 (idf × tf saturation × length
  normalization) for a fixed query, the standard lexical ranker.
- lm_perplexity: corpus-trained token-bigram language model scoring
  each document by average log-probability — the classic
  "perplexity-filter" quality signal for LLM training data (documents
  whose token transitions are improbable under the corpus LM are noise
  candidates).

Both are pure Column-expression plans: tokenization, bigram assembly and
probability math all run inside whole-stage codegen; Python never touches
a row. Corpus statistics (df, N, avgdl) are tiny aggregates that join
back in as broadcasts — O(|query terms|) and O(1) rows respectively —
while the corpus itself streams through unshuffled until the final
per-document aggregation on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register

# Fixed query for the registered BM25 ranking (terms from the corpus vocab).
_QUERY_TERMS = ["join", "table", "spark"]
_K1, _B = 1.2, 0.75

_TOKS = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


@register(
    "bm25_rank",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    dl AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS dl FROM docs),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(LEN(toks)) AS avgdl
        FROM docs
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, UNNEST(toks) AS term FROM docs)
        WHERE term IN ('join', 'table', 'spark')
        GROUP BY doc_id, term
    ),
    idf AS (
        SELECT term,
               LN(1 + ((SELECT n_docs FROM stats) - COUNT(*) + 0.5)
                      / (COUNT(*) + 0.5)) AS idf
        FROM tf GROUP BY term
    )
    SELECT tf.doc_id,
           ROUND(SUM(idf.idf * tf.tf * ({_K1} + 1)
                     / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl
                                         / (SELECT avgdl FROM stats)))),
                 4) + 0.0 AS bm25
    FROM tf
    JOIN idf USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 15
    """,
)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-15 for the fixed query ``join table spark``.

    Plan shape for 100 TB: the token explode is filtered to query terms
    BEFORE the (doc, term) aggregation, so only matching tokens ever
    shuffle — the corpus's non-matching bulk dies in the scan stage.
    df/idf (|terms| rows) and N/avgdl (1 row) broadcast onto the tf
    table; the only large exchange is the per-doc length join on doc_id.
    Scores round to 4dp on both engines before the top-k order so
    float-summation drift cannot flip the ranking tiebreak (doc_id).
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("filter(split(text, '\\\\s+'), t -> t != '')").alias("toks"),
    )
    dl = docs.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
                "idf"
            ),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("doc_id")
        .agg(
            (
                F.round(
                    F.sum(
                        F.col("idf")
                        * F.col("tf")
                        * (_K1 + 1)
                        / (
                            F.col("tf")
                            + _K1
                            * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
                        )
                    ),
                    4,
                )
                + 0.0
            ).alias("bm25")
        )
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(15)


@register(
    "lm_perplexity",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    grams AS (
        SELECT doc_id, UNNEST(
            list_transform(generate_series(1, LEN(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1])
        ) AS bigram
        FROM docs
    ),
    c2 AS (SELECT bigram, COUNT(*) AS c2 FROM grams GROUP BY bigram),
    c1 AS (
        SELECT split_part(bigram, ' ', 1) AS w1, SUM(c2) AS c1
        FROM c2 GROUP BY w1
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(LN(c2.c2 / c1.c1)), 4) + 0.0 AS avg_logp
    FROM grams g
    JOIN c2 USING (bigram)
    JOIN c1 ON split_part(g.bigram, ' ', 1) = c1.w1
    GROUP BY g.doc_id
    """,
)
def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM average log-probability per document.

    Two logical passes over one tokenization: (1) corpus bigram counts
    c2(w1,w2) and first-position unigram counts c1(w1) = Σ_w2 c2 — both
    derived from the SAME bigram multiset so the model normalizes exactly;
    (2) each document's bigrams join their probabilities and average.
    The model tables are vocabulary-sized (≪ corpus at scale) and join on
    the bigram/unigram key; the corpus-side explode never re-shuffles
    until the final doc_id aggregation. ln on both engines; 4dp round
    absorbs summation-order drift.
    """
    grams = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(filter(split(text, '\\\\s+'), t -> t != '')) - 1), "
                "i -> concat(element_at(filter(split(text, '\\\\s+'), t -> t != ''), i), ' ', "
                "element_at(filter(split(text, '\\\\s+'), t -> t != ''), i + 1)))"
            )
        ).alias("bigram"),
    )
    c2 = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        c2.groupBy(F.split("bigram", " ").getItem(0).alias("w1"))
        .agg(F.sum("c2").alias("c1"))
    )
    return (
        grams.join(c2, "bigram")
        .join(c1, F.split(F.col("bigram"), " ").getItem(0) == F.col("w1"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            (F.round(F.avg(F.log(F.col("c2") / F.col("c1"))), 4) + 0.0).alias(
                "avg_logp"
            ),
        )
    )
