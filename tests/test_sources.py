"""Source-format coverage: CSV and JSONL readers with declared
schemas, strict-vs-permissive corrupt handling, and parquet
round-trip equivalence.

The reference is parquet-only (a write-only sink, SURVEY.md §0);
these formats are extension surface, but they inherit its schema
contract: fixed, declared, cast-on-ingest, never inferred.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from parquet_stream_writer_spark.sources import load_table, read_csv, read_jsonl

from tests.conftest import SF_DIR

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("value", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,value,score\n1,a,1.5\n2,b,2.5\n3,c,-1.0\n")
    return str(p)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "value": "a", "score": 1.5}\n'
        '{"id": 2, "value": "b", "score": 2.5}\n'
        '{"id": 3, "value": "c", "score": -1.0}\n'
    )
    return str(p)


def test_csv_reads_declared_schema(spark, csv_dir):
    df = read_csv(spark, csv_dir, SCHEMA)
    assert df.schema == SCHEMA
    rows = sorted((r.id, r.value, r.score) for r in df.collect())
    assert rows == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", -1.0)]


def test_jsonl_reads_declared_schema(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, SCHEMA)
    assert df.schema == SCHEMA
    rows = sorted((r.id, r.value, r.score) for r in df.collect())
    assert rows == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", -1.0)]


def test_csv_strict_raises_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,value,score\n1,a,1.5\nnot-an-int,b,2.5\n")
    with pytest.raises(Exception):  # noqa: B017 — Spark wraps the cause
        read_csv(spark, str(p), SCHEMA).collect()


def test_csv_permissive_nulls_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,value,score\n1,a,1.5\nnot-an-int,b,2.5\n")
    df = read_csv(spark, str(p), SCHEMA, strict=False)
    ids = [r.id for r in df.orderBy("score").collect()]
    assert ids == [1, None]


def test_jsonl_strict_raises_on_corrupt(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1, "value": "a", "score": 1.5}\n{broken\n')
    with pytest.raises(Exception):  # noqa: B017
        read_jsonl(spark, str(p), SCHEMA).collect()


def test_formats_roundtrip_parquet_equivalent(spark, tmp_path):
    """documents → CSV and JSONL → read back == parquet original.

    Pins that the extension formats carry the same data the parquet
    path does (modulo CSV's lossy text types, so only string/long
    columns are exercised)."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    schema = docs.schema
    csv_path = str(tmp_path / "docs_csv")
    json_path = str(tmp_path / "docs_jsonl")
    docs.write.option("header", "true").csv(csv_path)
    docs.write.json(json_path)
    from_csv = read_csv(spark, csv_path, schema)
    from_json = read_jsonl(spark, json_path, schema)
    base = docs.orderBy("doc_id").collect()
    assert from_csv.orderBy("doc_id").collect() == base
    assert from_json.orderBy("doc_id").collect() == base


def test_orc_roundtrip_parquet_equivalent(spark, tmp_path):
    """ORC as an alternate columnar source: a full documents round-trip
    through Spark's native ORC reader/writer must be value-identical to
    the parquet original (columnar pushdown/pruning work the same way,
    so a corpus delivered as ORC plugs into every operator unchanged)."""
    from parquet_stream_writer_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    orc_path = str(tmp_path / "docs_orc")
    docs.write.orc(orc_path)
    back = spark.read.orc(orc_path)
    assert back.schema == docs.schema
    assert back.orderBy("doc_id").collect() == docs.orderBy("doc_id").collect()
