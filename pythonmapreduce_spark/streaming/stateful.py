"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running aggregates maintained in explicit group state — the
streaming analog of the reference's reduce-per-key, except the state
survives across micro-batches instead of requiring all values for a key to
ship to one reducer at once (/root/reference/reducer_node.py:79-84).

On an availableNow replay the final state equals the batch aggregate, which
gives the stateful path a full SQL oracle — the same batch-equivalence
harness as stream_wordcount.

Scale: state is partitioned by group key across executors and checkpointed;
per-key state here is two numbers, so state size grows with distinct users,
not events.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pythonmapreduce_spark.catalog import events_stream_source
from pythonmapreduce_spark.plans.registry import register
from pythonmapreduce_spark.streaming.stream_jobs import _run_to_memory

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


@register(
    "stream_stateful_counts",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful per-user totals over the event stream; verified
    against the batch GROUP BY oracle via availableNow replay."""
    src = events_stream_source(spark, sf_dir).select("user_id", "value")
    updated = src.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    _, name = _run_to_memory(updated, "update")
    return spark.table(name)
