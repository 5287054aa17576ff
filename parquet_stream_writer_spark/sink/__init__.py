"""Sink layer.

- ``stream_writer.ParquetStreamWriter`` — API/semantics parity with the
  reference's single-process push-based writer (byte-threshold shard
  rollover, ``prefix-N.parquet`` naming, manifest, lazy creation).
- ``sharded.ShardedDatasetWriter`` — the cluster-scale counterpart:
  distributed Spark write with size-bounded files and deterministic
  sequential names.
"""

from parquet_stream_writer_spark.sink.sharded import ShardedDatasetWriter, compact_dataset
from parquet_stream_writer_spark.sink.stream_writer import ParquetStreamWriter

__all__ = ["ParquetStreamWriter", "ShardedDatasetWriter", "compact_dataset"]
