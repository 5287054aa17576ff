"""Physical-plan introspection helpers.

The reference has no plans or optimizer (SURVEY.md §4 — it is a
write-only sink); on Spark the *plan* is the performance contract, so
this module gives library users (and our own `tests/test_plans.py`)
a stable way to audit what Catalyst actually chose: which filters
reached the scan, which joins broadcast, how many exchanges a query
pays, and whether an aggregation kept its hash path.

Everything here is read-only introspection over `explain` output —
no private planner APIs, no behavior changes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["PlanSummary", "explain_string", "summarize", "assert_scan_pruned"]

#: Node names whose counts matter for scale audits.
_COUNTED_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "Generate",
)


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text Spark would print for ``df.explain(mode)``.

    ``simple`` mode lists each physical node once (use it for node
    counts); ``formatted`` adds per-node detail like ``PushedFilters``
    and ``ReadSchema`` (use it for scan audits) but mentions each
    node twice — tree plus detail block.
    """
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@dataclass
class PlanSummary:
    """Counts and scan details extracted from a physical plan."""

    nodes: dict[str, int] = field(default_factory=dict)
    shuffle_exchanges: int = 0
    broadcast_exchanges: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    @property
    def shuffles(self) -> int:
        return self.shuffle_exchanges

    def has_nested_loop(self) -> bool:
        return bool(
            self.nodes.get("BroadcastNestedLoopJoin")
            or self.nodes.get("CartesianProduct")
        )


def summarize(df: DataFrame) -> PlanSummary:
    """Summarize ``df``'s physical plan for programmatic audits.

    Node counts come from ``simple`` mode (one mention per node);
    scan details come from ``formatted`` mode.
    """
    simple = explain_string(df, "simple")
    formatted = explain_string(df, "formatted")
    s = PlanSummary()
    for n in _COUNTED_NODES:
        # word-boundary match so e.g. Window doesn't count WindowGroupLimit
        c = len(re.findall(rf"\b{n}\b", simple))
        if c:
            s.nodes[n] = c
    s.shuffle_exchanges = len(re.findall(r"\bExchange (?:hash|range|Single)", simple))
    s.broadcast_exchanges = simple.count("BroadcastExchange")
    for line in formatted.splitlines():
        t = line.strip()
        if t.startswith("PushedFilters:"):
            s.pushed_filters.append(t.removeprefix("PushedFilters:").strip())
        elif t.startswith("PartitionFilters:"):
            s.partition_filters.append(t.removeprefix("PartitionFilters:").strip())
        elif t.startswith("ReadSchema:"):
            s.read_schemas.append(t.removeprefix("ReadSchema:").strip())
    return s


def assert_scan_pruned(
    df: DataFrame, *, max_columns: int, require_pushed: str | None = None
) -> PlanSummary:
    """Raise ``AssertionError`` unless every parquet scan in ``df``'s
    plan reads at most ``max_columns`` columns (column pruning) and,
    if given, some pushed filter mentions ``require_pushed``.

    Returns the summary so callers can chain further checks. This is
    the audit to run after writing a new operator: a scan that reads
    every column for a two-column projection is a 100 TB regression
    that no correctness test will ever catch.
    """
    s = summarize(df)
    if not s.read_schemas:
        raise AssertionError("no parquet scans found in plan")
    for schema in s.read_schemas:
        # ReadSchema: struct<a:bigint,b:double,...> — count top-level fields
        inner = schema.removeprefix("struct<").removesuffix(">")
        depth = 0
        n_cols = 1 if inner else 0
        for ch in inner:
            if ch in "<([":
                depth += 1
            elif ch in ">)]":
                depth -= 1
            elif ch == "," and depth == 0:
                n_cols += 1
        if n_cols > max_columns:
            raise AssertionError(
                f"scan reads {n_cols} columns (> {max_columns}): {schema}"
            )
    if require_pushed is not None and not any(
        require_pushed in f for f in s.pushed_filters + s.partition_filters
    ):
        raise AssertionError(
            f"no pushed/partition filter mentions {require_pushed!r}: "
            f"{s.pushed_filters} {s.partition_filters}"
        )
    return s
