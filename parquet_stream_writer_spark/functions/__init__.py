"""Reusable column expressions shared across the query pack.

``pround`` / ``sql_round`` exist because Spark's ``round()`` and
DuckDB's ``round()`` disagree on doubles that sit on a ``.xx5``
boundary (Spark rounds the shortest decimal string via BigDecimal,
DuckDB rounds the binary value). Both engines evaluate
``floor(x * scale + 0.5) / scale`` over identical IEEE doubles, so the
pair below yields bit-identical results on both sides of the oracle
comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def pround(col: Column | str, digits: int = 2) -> Column:
    """Portable half-up rounding (matches ``sql_round`` exactly)."""
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_round(expr: str, digits: int = 2) -> str:
    """DuckDB-side twin of :func:`pround` for oracle SQL strings."""
    scale = 10**digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}.0"


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<double>`` columns using only
    JVM higher-order functions (no Python in the hot path)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm_a = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (norm_a * norm_b)
