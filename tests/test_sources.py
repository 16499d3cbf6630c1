"""Connector robustness: malformed input must not kill a 100 TB job.

PERMISSIVE mode (Spark's default) parses what it can and quarantines the
rest into the corrupt-record column — the behavior a large ingest needs;
FAILFAST is the strict alternative. The reference silently DROPS malformed
records with a bare length check (/root/reference/reducer_node.py:41-42);
here the bad rows stay visible and attributable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_permissive_read_quarantines_corrupt_rows(spark) -> None:
    path = os.path.join(tempfile.mkdtemp(prefix="corrupt_"), "rows.jsonl")
    with open(path, "w") as fh:
        fh.write('{"k": 1, "v": "a"}\n')
        fh.write("this is not json\n")
        fh.write('{"k": 2, "v": "b"}\n')
        fh.write('{"k": "not-a-number", "v": "c"}\n')

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        .cache()  # corrupt-record queries need the full row materialized
    )
    good = df.where(F.col("_corrupt").isNull())
    bad = df.where(F.col("_corrupt").isNotNull())
    assert good.count() == 2
    assert sorted(r["k"] for r in good.collect()) == [1, 2]
    # both the non-JSON line and the type-mismatched row are quarantined,
    # with the raw text preserved for forensics
    assert bad.count() == 2
    raw = [r["_corrupt"] for r in bad.collect()]
    assert any("not json" in s for s in raw)
    assert any("not-a-number" in s for s in raw)
    df.unpersist()


def test_compaction_reduces_file_count(spark, sf_oracle) -> None:
    import glob
    import os

    from pythonmapreduce_spark.plans import registry
    from pythonmapreduce_spark.sources.readers import _scratch_keyed

    registry.load_all()
    df = registry.QUERIES["sink_compaction"](spark, sf_oracle)
    assert df.count() > 0
    # derive the SAME (pid, session, input)-keyed dirs the query wrote —
    # asserting on the old fixed names would inspect stale leftovers from
    # earlier runs instead of this invocation's output
    frag_dir = _scratch_keyed(spark, "documents_fragmented", sf_oracle)
    comp_dir = _scratch_keyed(spark, "documents_compacted", sf_oracle)
    frag = glob.glob(os.path.join(frag_dir, "*.parquet"))
    comp = glob.glob(os.path.join(comp_dir, "*.parquet"))
    assert len(frag) >= 16
    assert len(comp) <= 2


def test_cli_surface() -> None:
    """The __main__ CLI: list/oracle work without a SparkSession."""
    from pythonmapreduce_spark.__main__ import main

    assert main(["list"]) == 0
    assert main(["oracle", "wordcount"]) == 0
    assert main(["oracle", "dedup_near"]) == 1  # rows-only
