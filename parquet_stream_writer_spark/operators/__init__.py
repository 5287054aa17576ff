"""Operator query pack.

Each submodule exports:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  DataFrame-API implementations (Catalyst plans the physical strategy).
- ``ORACLE: dict[str, str]`` — per-query ANSI SQL the DuckDB oracle runs
  on the same parquet tables; keys without an oracle get a rows-only
  check by the driver.

``all_queries()`` / ``all_oracles()`` merge the submodules for the
driver entry point (``__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from parquet_stream_writer_spark.operators import (
        dedup,
        multimodal,
        pipeline,
        relational,
        similarity,
        streaming_batch,
        text,
    )

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, dedup, similarity, text, streaming_batch, multimodal, pipeline):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from parquet_stream_writer_spark.operators import (
        dedup,
        multimodal,
        pipeline,
        relational,
        similarity,
        streaming_batch,
        text,
    )

    merged: dict[str, str] = {}
    for mod in (relational, dedup, similarity, text, streaming_batch, multimodal, pipeline):
        merged.update(mod.ORACLE)
    return merged
