"""End-to-end pipeline composition: the operators chained the way a
real training-data build would chain them — dedup → quality filter →
tokenize → sequence pack → sharded parquet write — proving the query
pack composes into one lazy plan pipeline, not just isolated queries."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from parquet_stream_writer_spark.operators.dedup import dedup_exact
from parquet_stream_writer_spark.operators.text import (
    text_repetition_gopher,
    text_tokenize_ids,
)
from parquet_stream_writer_spark.sink import ShardedDatasetWriter
from parquet_stream_writer_spark.sources import load_table

from tests.conftest import SF_DIR


def test_training_data_pipeline(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()

    # 1. exact dedup — keep-list of canonical doc_ids
    keep = dedup_exact(spark, SF_DIR).select("doc_id")
    n_kept = keep.count()
    assert 0 < n_kept <= n_docs

    # 2. quality filter — Gopher repetition rules
    quality = text_repetition_gopher(spark, SF_DIR).where(
        (F.col("top_tok_frac") <= 0.3) & (F.col("dup_bigram_frac") <= 0.2)
    ).select("doc_id")

    survivors = keep.join(quality, "doc_id")
    n_final = survivors.count()
    assert 0 < n_final <= n_kept

    # 3. tokenize-to-ids restricted to survivors (broadcast the tiny
    #    keep-list; corpus side stays unshuffled for the filter)
    toks = text_tokenize_ids(spark, SF_DIR).join(
        F.broadcast(survivors), "doc_id"
    )
    assert toks.select("doc_id").distinct().count() == n_final

    # 4. write the encoded stream as size-bounded shards
    out = tmp_path / "train"
    writer = ShardedDatasetWriter(out, shard_size_bytes=256 << 10)
    files = writer.write(toks.select("doc_id", "pos", "tok_id"))
    assert files
    total = sum(pq.read_table(p).num_rows for p in files)
    assert total == toks.count()
    # every shard respects the deterministic naming contract
    assert all(p.name.startswith("train-") for p in files)
