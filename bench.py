#!/usr/bin/env python
"""Benchmark harness: run the full query pack at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is materialized with the ``noop`` sink (full execution, no
write cost). The session is warmed with one tiny action first so JVM
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from parquet_stream_writer_spark.operators import all_queries  # noqa: E402
from parquet_stream_writer_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf = float(Path(sf_dir).name.removeprefix("sf") or 0) if "sf" in Path(sf_dir).name else 0.1

    spark = get_session("bench")
    # Warm the JVM + vectorized parquet read path so the first timed
    # query isn't billed for codegen/classloading.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()

    # Median-of-N per query: single-shot wall times on a shared machine
    # jitter by 2-3x; the median is robust to one-off stalls in either
    # direction (round-2 burned attention on ~17 noise "regressions"
    # from n<=2 sampling).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # Soft wall-clock budget: a complete single-rep sweep always beats
    # a timed-out multi-rep one, so once the budget is spent the
    # remaining queries run once instead of N times.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "480"))
    t_start = time.perf_counter()
    timings: dict[str, float] = {}
    for name, fn in sorted(all_queries().items()):
        reps = repeats if (time.perf_counter() - t_start) < budget else 1
        runs: list[float] = []
        failed = False
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            except Exception as exc:  # keep the bench alive; flag the query
                print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
                failed = True
                break
        timings[name] = -1.0 if failed or not runs else round(statistics.median(runs), 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        # Per-query stat is the MEDIAN of N repeats since round 3
        # (rounds 1-2 recorded best-of-N minima — naive cross-round
        # diffs over that transition read as regressions).
        "agg": "median",
        "repeats": repeats,
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(payload))
    # The driver's BENCH_r{N}.json wrapper captures only a truncated
    # tail of the stdout line, losing the head's per-query times every
    # round — persist the full result in-repo so round-over-round
    # comparison (tools/bench_compare.py) covers all queries from
    # driver artifacts alone.  N = next round after the recorded ones.
    try:
        here = Path(__file__).resolve().parent
        rounds = [
            int(m.group(1))
            for p in here.glob("BENCH_r*.json")
            if (m := re.search(r"BENCH_r(\d+)\.json$", p.name))
        ]
        n_round = max(rounds, default=0) + 1
        (here / f"bench_full_r{n_round:02d}.json").write_text(json.dumps(payload))
    except OSError as exc:
        print(f"bench: could not persist bench_full: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
