r"""Golden reference-parity: the engine's word count and inverted index over
the reference's own books corpus must exactly match an independent
pure-Python implementation of the reference's semantics
(/root/reference/mapreduce_wc.py:3-11, mapreduce_inverted.py:3-11):
``str.split()`` whitespace tokenization, case-sensitive, punctuation kept;
exact integer sums; distinct file set per token (order normalized by
sorting — the reference's Python-set order is an artifact, SURVEY §2.1).
"""

from __future__ import annotations

import glob
import os
from collections import Counter, defaultdict

import pytest

from pythonmapreduce_spark.sources.text_corpus import (
    inverted_index_text,
    read_text_corpus,
    wordcount_text,
)

BOOKS = sorted(glob.glob("/root/reference/books/*.txt"))


def _pure_python_jobs() -> tuple[Counter, dict[str, set[str]]]:
    """Independent re-implementation of the reference's two jobs (NOT a code
    copy — same contract, plain batch Python)."""
    counts: Counter = Counter()
    postings: dict[str, set[str]] = defaultdict(set)
    for path in BOOKS:
        base = os.path.basename(path)
        with open(path, encoding="utf-8-sig", errors="ignore") as fh:
            # utf-8-sig strips the leading BOM, matching Hadoop's text
            # reader; a bare '﻿' token would be an encoding artifact,
            # not a tokenizer semantic.
            for line in fh:
                for word in line.strip("\n").split():
                    counts[word] += 1
                    postings[word].add(base)
    return counts, postings


@pytest.mark.skipif(not BOOKS, reason="reference corpus not present")
def test_books_wordcount_golden(spark) -> None:
    corpus = read_text_corpus(spark, BOOKS)
    got = {r["word"]: r["cnt"] for r in wordcount_text(corpus).collect()}
    expected, _ = _pure_python_jobs()
    assert len(got) == len(expected)
    assert got == dict(expected)
    # total token conservation: sum of counts == total tokens in the corpus
    assert sum(got.values()) == sum(expected.values())


@pytest.mark.skipif(not BOOKS, reason="reference corpus not present")
def test_books_inverted_index_golden(spark) -> None:
    corpus = read_text_corpus(spark, BOOKS)
    # input_file_name() yields file:///... URIs; normalize to basenames
    got = {
        r["word"]: sorted(os.path.basename(f) for f in r["files"])
        for r in inverted_index_text(corpus).collect()
    }
    _, expected = _pure_python_jobs()
    assert len(got) == len(expected)
    assert got == {w: sorted(fs) for w, fs in expected.items()}


def test_hostile_tokens_survive(spark) -> None:
    """The reference's wire format corrupts on data containing its framing
    delimiters (#\\r# between records, \\t between key/value, \\r, between
    rows — /root/reference/mapper_node.py:23-37); this engine must count
    such tokens exactly. Verified against pure-Python str.split() on
    strings stuffed with every delimiter the reference uses."""
    from collections import Counter

    from pyspark.sql import functions as F

    hostile = [
        "a\tb a\tb plain",
        "x#\r#y x#\r#y",
        "k\r,v k\r,v k\r,v",
        "quote\"d 'single' back\\slash",
        "tab\tand\rmix  double  space",
        "unicode: naïve café 北京 emoji🙂token",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(hostile)], "doc_id long, text string")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    got = {
        r["word"]: r["cnt"]
        for r in df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    expected = Counter(w for t in hostile for w in t.split())
    assert got == dict(expected)
