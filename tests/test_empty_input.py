"""Robustness: every registered query must run (not crash) on EMPTY input
tables — the degenerate partition every 100 TB job eventually meets (an
empty hour of events, a lang partition with no documents, a filter that
eliminates everything upstream).

Queries that synthesize their own constants (hyperplanes, centroid seeds)
still return rows=0 gracefully; nothing may raise.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from pythonmapreduce_spark.catalog import SCHEMAS, TABLES
from pythonmapreduce_spark.plans import registry

registry.load_all()


@pytest.fixture(scope="session")
def empty_sf_dir(spark) -> str:
    d = os.path.join(tempfile.gettempdir(), "pmr_empty_sf")
    for t in TABLES:
        target = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(target):
            # single empty parquet FILE per table (catalog.load expects
            # file paths, like the driver's testdata layout)
            tmp = target + ".dir"
            spark.createDataFrame([], SCHEMAS[t]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            os.replace(os.path.join(tmp, part), target)
    return d


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_runs_on_empty_input(name: str, spark, empty_sf_dir: str) -> None:
    df = registry.QUERIES[name](spark, empty_sf_dir)
    n = df.count()
    assert n >= 0


@pytest.fixture(scope="session")
def short_doc_sf_dir(spark) -> str:
    """sf0.001 layout with documents replaced by a degenerate corpus:
    empty text, whitespace-only, and single-token rows — all of which the
    tokenizer contract admits but no shipped SF contains. Under Spark 4's
    default ANSI mode the old transform(sequence(1, size-1), element_at)
    bigram build was FATAL on these rows (sequence(1, 0) descends to
    [1, 0]; element_at(toks, 0) throws) — round-12 regression pin for the
    zip_with/slice form."""
    src = "/root/testdata/sf0.001"
    assert os.path.isdir(src)
    d = os.path.join(tempfile.gettempdir(), "pmr_short_doc_sf")
    os.makedirs(d, exist_ok=True)
    for t in TABLES:
        target = os.path.join(d, f"{t}.parquet")
        if t != "documents" and not os.path.exists(target):
            os.symlink(os.path.join(src, f"{t}.parquet"), target)
    target = os.path.join(d, "documents.parquet")
    if not os.path.exists(target):
        rows = [  # (doc_id, text, lang, source, n_chars)
            (0, "", "en", "synthetic", 0),
            (1, "   ", "en", "synthetic", 3),
            (2, "solitary", "en", "synthetic", 8),
            (3, "two tokens", "en", "synthetic", 10),
            (4, "a b c d e", "de", "synthetic", 9),
        ]
        tmp = target + ".dir"
        spark.createDataFrame(rows, SCHEMAS["documents"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, part), target)
    return d


# The bigram/qgram builders (the ANSI-fatal family) plus their heaviest
# consumers; every other documents consumer tokenizes via filter(split)
# only, which is short-doc-safe by construction.
_SHORT_DOC_QUERIES = [
    "search_ndcg_mrr",
    "lm_perplexity",
    "tfidf_cosine_pairs",
    "bm25_rank",
    "collocation_pmi",
    "ngram_bigrams",
]


@pytest.mark.parametrize("name", _SHORT_DOC_QUERIES)
def test_runs_on_short_docs(name: str, spark, short_doc_sf_dir: str) -> None:
    df = registry.QUERIES[name](spark, short_doc_sf_dir)
    assert df.count() >= 0
