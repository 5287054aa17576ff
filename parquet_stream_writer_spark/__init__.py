"""parquet_stream_writer_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``apcamargo/parquet-stream-writer`` (reference: /root/reference, a
single-process PyArrow streaming Parquet sink with size-based shard
rollover — see ``/root/reference/src/parquet_stream_writer/writer.py``),
re-expressed Spark-first and extended with the relational + LLM-data-
pipeline operator surface mandated by the project north star:

- ``sink``       — ParquetStreamWriter parity (byte-threshold shard
                   rollover, ``prefix-N.parquet`` naming, manifest,
                   lazy file creation) plus a distributed sharded sink
                   for cluster scale.
- ``sources``    — table loaders for the TPC-H-ish test corpus,
                   including the ns-timestamp workaround for ``events``.
- ``operators``  — the query pack: relational (joins/aggs/windows/...),
                   dedup (exact/MinHash/SimHash/Jaccard), similarity
                   search, text analysis, multimodal plumbing.
- ``streaming``  — Structured Streaming: foreachBatch sink adapter,
                   watermarked event-time windows.
- ``functions``  — reusable column expressions (cosine similarity,
                   tokenization, portable hashing shared with the
                   DuckDB oracle dialect).
- ``plans``      — physical-plan introspection (``summarize``,
                   ``assert_scan_pruned``) for auditing pushdown,
                   broadcast choice, and shuffle counts.

Everything is DataFrame-API first: plans are declared declaratively so
Catalyst handles pushdown, pruning, join selection, and AQE; Python
UDFs appear only where built-ins cannot express the semantics
(multimodal decode), and then only as Arrow-batched ``mapInPandas``.
"""

from parquet_stream_writer_spark.session import get_session
from parquet_stream_writer_spark.sink.sharded import ShardedDatasetWriter, compact_dataset
from parquet_stream_writer_spark.sink.stream_writer import ParquetStreamWriter

__all__ = [
    "ParquetStreamWriter",
    "ShardedDatasetWriter",
    "compact_dataset",
    "get_session",
]
__version__ = "0.1.0"
