#!/usr/bin/env python
"""Capture `.explain("formatted")` for every registered query.

Writes one `<key>.txt` per query to the output directory (default
`/tmp/plans_r18`) plus a `summary.json` with node counts per key
(Exchange, join strategies, Python-eval nodes, Generate, etc.) for
optimization triage — planning only, nothing is executed.

Usage: python tools/plan_capture.py [outdir] [key ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_stream_writer_spark.operators import all_queries  # noqa: E402
from parquet_stream_writer_spark.plans import explain_string  # noqa: E402
from parquet_stream_writer_spark.session import get_session  # noqa: E402

_NODES = (
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "Generate",
    "Expand",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
    "Sort",
)


def main() -> None:
    args = sys.argv[1:]
    outdir = Path(args[0]) if args else Path("/tmp/plans_r18")
    only = set(args[1:])
    outdir.mkdir(parents=True, exist_ok=True)
    # ADVICE r18: honor the env the bench/driver already use instead of
    # silently pinning one machine's layout.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("plan-capture")
    queries = dict(sorted(all_queries().items()))
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    summary: dict[str, dict] = {}
    for name, fn in queries.items():
        failed = False
        try:
            txt = explain_string(fn(spark, sf_dir), "formatted")
        except Exception as exc:  # keep sweeping; record the failure
            txt = f"PLAN FAILED: {exc}"
            failed = True
        (outdir / f"{name}.txt").write_text(txt)
        # ADVICE r18: a failed plan must not masquerade as a healthy
        # plan with none of the tracked nodes.
        counts = {"failed": True} if failed else {}
        for node in _NODES:
            # count whole-word node names at line starts of the tree part
            # (\bExchange\b can never match inside 'BroadcastExchange' —
            # no word boundary between 't' and 'E' — so the plain count
            # already excludes broadcasts; review r18 removed a
            # double-subtraction here that emitted negative counts)
            n = len(re.findall(rf"(?m)^\s*[:+\-*( ]*\b{node}\b", txt))
            if n:
                counts[node] = n
        summary[name] = counts
    (outdir / "summary.json").write_text(json.dumps(summary, indent=1, sort_keys=True))
    print(f"captured {len(queries)} plans -> {outdir}")


if __name__ == "__main__":
    main()
