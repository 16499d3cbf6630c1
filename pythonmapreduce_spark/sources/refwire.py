"""A Spark Python DataSource that speaks the reference's wire format.

The reference frames every input record as ``#\\r#{file}#\\r#{line}`` and
concatenates frames into one string per mapper (its KV-store input value,
/root/reference/master.py:33-40); workers re-split on the delimiter and
pair up (file, chunk) records (/root/reference/mapper_node.py:78-82).
This module implements that format as a FIRST-CLASS Spark source via the
Python DataSource API (Spark 4): ``spark.read.format("refwire")`` returns
a (file_name, chunk) DataFrame, one input partition per wire file, with
the decode running distributed on executors — so the reference's own
on-the-wire data (not just its text corpus) is directly queryable, and
every relational operator in this engine composes on top.

The decode mirrors the reference exactly: split on the literal
``#\\r#``, drop the leading empty segment, pair adjacent segments as
(file, chunk) — including its quirk that a chunk CONTAINING the
delimiter corrupts framing (no escaping exists; SURVEY §1.3), which the
hostile-delimiter parity test pins at the tokenizer level.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from pythonmapreduce_spark.plans.registry import register

_DELIM = "#\r#"
_BOOKS_DIR = "/root/reference/books"


class RefWireDataSource(DataSource):
    """``format("refwire")``: reads directories of ``*.wire`` frame files."""

    @classmethod
    def name(cls) -> str:
        return "refwire"

    def schema(self) -> str:
        return "file_name string, chunk string"

    def reader(self, schema) -> "_RefWireReader":  # noqa: ANN001
        return _RefWireReader(self.options)


class _RefWireReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options.get("path")

    def partitions(self) -> list[InputPartition]:
        # One partition per wire file — the natural split boundary (frames
        # never cross files), so executors decode files in parallel.
        return [
            InputPartition(p)
            for p in sorted(glob.glob(os.path.join(self.path, "*.wire")))
        ]

    def read(self, partition: InputPartition):
        # errors='ignore' matches the reference's decode everywhere
        # (/root/reference/kvstore.py:14,23,32,51,57).
        # newline="" disables universal-newline translation: the delimiter
        # contains a literal \r that text mode would silently fold to \n.
        with open(partition.value, encoding="utf-8", errors="ignore", newline="") as f:
            segments = f.read().split(_DELIM)[1:]
        for i in range(0, len(segments) - 1, 2):
            yield (segments[i], segments[i + 1])


_REGISTERED: set[int] = set()


def register_refwire(spark: SparkSession) -> None:
    if id(spark) not in _REGISTERED:
        spark.dataSource.register(RefWireDataSource)
        _REGISTERED.add(id(spark))


def _frame_books(out_dir: str) -> str:
    """Encode the reference's books corpus into its wire format, one
    ``.wire`` file per book — the exact framing loop of master.py:25-40
    (line-per-frame; leading BOM stripped to match Spark's text-reader
    semantics so the oracle tokenization agrees)."""
    if not os.path.isdir(out_dir):
        os.makedirs(out_dir, exist_ok=True)
        for src in sorted(glob.glob(os.path.join(_BOOKS_DIR, "*.txt"))):
            name = os.path.basename(src)
            with open(src, encoding="utf-8", errors="ignore", newline="") as f:
                text = f.read().lstrip("\ufeff")
            text = text.replace("\r\n", "\n")
            frames = "".join(
                f"{_DELIM}{name}{_DELIM}{line}" for line in text.split("\n")
            )
            with open(
                os.path.join(out_dir, name + ".wire"), "w", encoding="utf-8", newline=""
            ) as f:
                f.write(frames)
    return out_dir


@register(
    "wordcount_refwire",
    oracle=r"""
    SELECT word, COUNT(*) AS cnt
    FROM (
        SELECT UNNEST(list_filter(string_split_regex(content, '\s+'), t -> t <> ''))
            AS word
        FROM (SELECT regexp_replace(content, '^\x{FEFF}', '') AS content
              FROM read_text('/root/reference/books/*.txt'))
    )
    GROUP BY word
    """,
)
def wordcount_refwire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference word count, ingested THROUGH the reference's own wire
    format via the custom Python DataSource — end-to-end proof that the
    refwire source decodes frames losslessly (the oracle reads the
    original text files directly; only a byte-exact decode of the framed
    corpus produces identical token counts).
    """
    register_refwire(spark)
    wire_dir = _frame_books(os.path.join(tempfile.gettempdir(), "pmr_spark_io", "refwire_books"))
    corpus = spark.read.format("refwire").option("path", wire_dir).load()
    toks = F.filter(F.split(F.col("chunk"), r"\s+"), lambda t: t != F.lit(""))
    return (
        corpus.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
