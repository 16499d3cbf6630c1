"""SparkSession construction tuned for both local testing and cluster scale.

The reference ships its own orchestration (master.py:205-256 provisions VMs and
busy-polls barriers); on Spark all of that is the cluster manager + DAG
scheduler, so the only engine-level knob surface left is the session config.

Design notes for 100 TB scale (tested on local[*]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace any hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is a *starting* parallelism; AQE coalesces
  down. On a real cluster this would be set to ~2-3x total cores.
- Arrow enabled for any pandas interchange (UDFs, toPandas in tests).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "pythonmapreduce-spark", cpus: str | None = None) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    local[N] for tests; on a cluster the master/deploy-mode comes from
    spark-submit and these configs still apply.
    """
    cpus = cpus or DEFAULT_CPUS
    n = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Parallelism: start at #cores for local; AQE coalesces small shuffles.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        # Adaptive execution: coalesce partitions, split skewed joins,
        # convert sort-merge to broadcast at runtime when a side is small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the pandas_udf / applyInPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Quiet local runs.
        .config("spark.ui.enabled", "false")
        # local[N] runs driver+executors in ONE JVM whose heap defaults to
        # 1g — far under this machine's RAM and small enough that a single
        # 64 MB-threshold broadcast build can OOM at larger SFs (observed
        # at the sf1.0 scaling measurement). Sized here for local runs;
        # cluster deployments set driver/executor memory via spark-submit
        # and this conf only shapes the driver. Env-overridable.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Managed-table warehouse + metastore scratch outside the repo
        # (bucketed tables for co-located joins land here in local runs).
        .config("spark.sql.warehouse.dir", os.path.join(tempfile.gettempdir(), "pmr_warehouse"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={os.path.join(tempfile.gettempdir(), 'pmr_derby')}",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
