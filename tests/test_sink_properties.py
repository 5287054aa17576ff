"""Property-based differential tests for the sink's rollover model.

A ~20-line pure-Python model replicates the reference's documented
semantics (flush at buffered>=buffer, strict-> rotation on flushed
bytes, rotate-before-flush, lazy creation — SURVEY.md §2a). Hypothesis
drives random workloads through writer and model and asserts they
agree on file count and per-file row counts — a much denser behavioral
net than the 19 example-based parity tests alone.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from parquet_stream_writer_spark.sink import ParquetStreamWriter

SCHEMA = pa.schema([("id", pa.int64()), ("value", pa.string())])


def make_batch(n_rows: int, width: int) -> pa.RecordBatch:
    return pa.RecordBatch.from_pydict(
        {"id": list(range(n_rows)), "value": ["x" * width] * n_rows},
        schema=SCHEMA,
    )


def model_rows_per_shard(
    batches: list[pa.RecordBatch],
    *,
    buffer_size: int,
    shard_size: int | None,
) -> list[int]:
    """Pure model of the documented write_batch/flush/close loop."""
    rows: list[int] = []

    def shard_rows(i: int) -> None:
        while len(rows) <= i:
            rows.append(0)

    pending_rows = 0
    pending_bytes = 0
    flushed_bytes = 0
    shard = 0
    for b in batches:
        if b.num_rows:
            pending_rows += b.num_rows
            pending_bytes += b.nbytes
        full_shard = shard_size is not None and flushed_bytes > shard_size
        if pending_bytes >= buffer_size or full_shard:
            if full_shard and flushed_bytes > 0:
                shard += 1
                flushed_bytes = 0
            if pending_rows:
                shard_rows(shard)
                rows[shard] += pending_rows
                flushed_bytes += pending_bytes
                pending_rows = pending_bytes = 0
    if pending_rows:  # close(): final flush, no rotation
        shard_rows(shard)
        rows[shard] += pending_rows
    return rows


@st.composite
def workload(draw):
    batches = draw(
        st.lists(
            st.tuples(st.integers(0, 40), st.integers(1, 60)),
            min_size=0,
            max_size=30,
        )
    )
    buffer_size = draw(st.integers(1, 4000))
    shard_size = draw(st.one_of(st.none(), st.integers(1, 6000)))
    return batches, buffer_size, shard_size


@settings(max_examples=60, deadline=None)
@given(workload())
def test_writer_matches_model(tmp_path_factory, wl):
    specs, buffer_size, shard_size = wl
    batches = [make_batch(n, w) for n, w in specs]
    out = tmp_path_factory.mktemp("sinkprop") / (
        "out" if shard_size is not None else "out.parquet"
    )
    with ParquetStreamWriter(
        out,
        SCHEMA,
        shard_size_bytes=shard_size,
        buffer_size_bytes=buffer_size,
    ) as w:
        for b in batches:
            w.write_batch(b)

    expected = model_rows_per_shard(
        batches, buffer_size=buffer_size, shard_size=shard_size
    )
    total_rows = sum(b.num_rows for b in batches)

    if total_rows == 0:
        assert not out.exists() or (out.is_dir() and not list(out.iterdir()))
        assert w.written_files == []
        return

    if shard_size is None:
        files = [out]
    else:
        files = sorted(
            out.iterdir(), key=lambda p: int(p.stem.rsplit("-", 1)[1])
        )
        # contiguous prefix-N naming from 0
        assert [p.name for p in files] == [
            f"out-{i}.parquet" for i in range(len(files))
        ]
    assert [p.name for p in files] == [p.name for p in w.written_files]

    actual = [pq.read_metadata(p).num_rows for p in files]
    assert actual == [r for r in expected if r > 0] or actual == expected
    assert sum(actual) == total_rows


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(1, 20), min_size=1, max_size=50))
def test_huge_buffer_consolidates_to_one_row_group(tmp_path_factory, row_counts):
    out = tmp_path_factory.mktemp("sinkprop") / "one.parquet"
    with ParquetStreamWriter(out, SCHEMA, buffer_size_bytes=1 << 30) as w:
        for n in row_counts:
            w.write_batch(make_batch(n, 10))
    md = pq.read_metadata(out)
    assert md.num_row_groups == 1
    assert md.num_rows == sum(row_counts)
