"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator pack from
``parquet_stream_writer_spark.operators`` (SURVEY.md §2c surface).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from parquet_stream_writer_spark.operators import all_oracles, all_queries  # noqa: E402
from parquet_stream_writer_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5-style star join: lineitem ⋈ orders ⋈ broadcast dims with a
    region filter, aggregated to revenue per nation.
    """
    from parquet_stream_writer_spark.operators.relational import join_broadcast_star

    apply_runtime_confs(spark)
    return join_broadcast_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (keys without an
    oracle are non-SQL-expressible and get the rows-only check)."""
    return all_oracles()
