"""SparkSession construction with scale-aware defaults.

Centralizes the configs every entry point needs:

- AQE on (runtime re-planning, skew-join handling, partition coalescing)
- UTC session timezone (parity with the DuckDB oracle's naive timestamps)
- ``spark.sql.legacy.parquet.nanosAsLong`` so the ``events`` table's
  ``timestamp[ns]`` column is readable at all (Spark 4 otherwise raises
  PARQUET_TYPE_ILLEGAL); the loader converts ns→µs explicitly.
- shuffle partitions sized from the local core count; on a real cluster
  this would be set to ~2-3× total executor cores and AQE coalesces.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are safe to (re)apply on an existing session at runtime.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The driver harness owns its own SparkSession; query entry points call
    this so reads of ``events`` (ns timestamps) and oracle comparisons
    (UTC) behave identically there.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-settable on this build — keep going; loaders degrade
            # gracefully (see sources.load_events).
            pass
    return spark


def get_session(app_name: str = "parquet-stream-writer-spark") -> SparkSession:
    """Build (or fetch) a local session sized from the environment.

    ``SPARK_GRAFT_CPUS`` controls parallelism (default: all cores), the
    same knob the benchmark driver uses.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
