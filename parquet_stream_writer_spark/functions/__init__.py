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

#: Explicit whitespace class for the pack's tokenizer convention,
#: engine-identical by construction: Java's ``\s`` matches vertical
#: tab (\x0B) while DuckDB/RE2's does not (ADVICE r11), so every
#: splitter spells the class out.  The raw-string escapes are
#: interpreted the same way by Java regex (Spark ``F.split``) and RE2
#: (``string_split_regex``); interpolate the constant verbatim into
#: oracle SQL string literals (single-quoted SQL strings pass the
#: backslashes through untouched).  Lifted here from staged5 in round
#: 16 when the staged4 tokenizers migrated off ``\s+``.
WS_CLASS = r"[ \t\n\r\f\x0B]+"


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


def quant6(col: Column) -> Column:
    """The integer-sum migration's shared quantizer: a fractional
    per-row term → a 1e-6-unit LONG via floor-half-up, so downstream
    sums are exact integers and partition-order free.  One definition
    instead of a hand-expanded ``F.floor(x * 1000000 + 0.5)`` per call
    site — the scale and the +0.5 are the two constants a typo would
    silently break the cross-engine contract with.  The DuckDB twin is
    :func:`sql_quant6`.  Caveat shared by every user: the quantized
    value is exact only while ``|x| * 1e6`` stays inside int64 (and
    ulp-exact only below 2^53); operators whose terms can exceed that
    at extreme scale must bound their domain in the docstring."""
    return quantn(col, 6)


def sql_quant6(expr: str) -> str:
    """DuckDB-side twin of :func:`quant6` for oracle SQL strings."""
    return sql_quantn(expr, 6)


def quantn(col: Column, digits: int) -> Column:
    """Generalized :func:`quant6`: a fractional per-row term → a
    ``1e-digits``-unit LONG via floor-half-up, for migrations whose
    sum headroom needs a coarser grid than 1e-6 (e.g. winsorized
    char counts at 1e-4: per-row magnitude ~1e6·1e4 = 1e10 leaves
    ~9e8 rows of int64 headroom per group where 1e-6 would leave
    ~9e6).  Same caveat as :func:`quant6`: exact only while
    ``|x| * 10^digits`` stays inside int64.  DuckDB twin:
    :func:`sql_quantn`."""
    scale = 10**digits
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def sql_quantn(expr: str, digits: int) -> str:
    """DuckDB-side twin of :func:`quantn` for oracle SQL strings."""
    scale = 10**digits
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def int_mean(col: Column, digits: int) -> Column:
    """The integer-sum migrations' shared MEAN reduce: per-row
    :func:`quantn` longs summed exactly in any accumulation order,
    the half-up mean taken as ``floor(Σq/n + 0.5)`` in integer units,
    then descaled — one definition instead of a hand-expanded
    floor/sum/count/scale per call site, for the same reason
    :func:`quant6` exists: the digits arg and its scale literal are
    the constants a copy-paste typo would silently break the
    cross-engine contract with (self-review r17).  The Σq→double cast
    is exact below 2^53 and the division is one IEEE op on both
    engines.  The denominator is the NON-NULL count of ``col`` (Spark
    ``count(col)`` / DuckDB ``count(expr)``), matching the
    avg-of-present semantics of the ``F.avg`` these migrations
    replace: ``sum`` skips NULLs on both engines, so a ``count(*)``
    denominator would silently drag the mean of a NULL-bearing group
    below the mean of its present values (ADVICE r17).  DuckDB twin:
    :func:`sql_int_mean`."""
    scale = float(10**digits)
    return (
        F.floor(
            F.sum(quantn(col, digits)).cast("double")
            / F.count(col)
            + F.lit(0.5)
        )
        / F.lit(scale)
    )


def sql_int_mean(expr: str, digits: int) -> str:
    """DuckDB-side twin of :func:`int_mean` for oracle SQL strings.

    ``count({expr})`` (non-null count) mirrors the Spark side's
    ``F.count(col)`` — see :func:`int_mean` on why the denominator is
    the count of PRESENT values, not ``count(*)``.

    The Σq is routed through ``CAST(... AS BIGINT)`` before the DOUBLE
    cast (fuzz catch, r18): DuckDB's ``sum(BIGINT)`` yields HUGEINT,
    whose software int128→double conversion TRUNCATES, while the
    JVM's int64→double rounds half-to-even — at a Σq above 2^53
    sitting exactly on a rounding tie the two engines fork by one
    ulp.  BIGINT→DOUBLE uses the hardware conversion (half-even,
    matching the JVM); the interposed cast is safe because the
    helpers' headroom contract already requires |Σq| inside int64."""
    scale = 10**digits
    return (
        f"floor(CAST(CAST(sum({sql_quantn(expr, digits)}) AS BIGINT) AS DOUBLE)"
        f" / count({expr}) + 0.5) / {scale}.0"
    )


def int_sum(col: Column, digits: int) -> Column:
    """The integer-sum migrations' shared SUM reduce: per-row
    :func:`quantn` longs summed exactly, descaled once — the exact
    Σq/10^digits with no further rounding.  DuckDB twin:
    :func:`sql_int_sum`."""
    scale = float(10**digits)
    return F.sum(quantn(col, digits)).cast("double") / F.lit(scale)


def sql_int_sum(expr: str, digits: int) -> str:
    """DuckDB-side twin of :func:`int_sum` for oracle SQL strings.
    The BIGINT cast before DOUBLE matches the JVM's half-even
    int64→double rounding — see :func:`sql_int_mean`."""
    scale = 10**digits
    return (
        f"CAST(CAST(sum({sql_quantn(expr, digits)}) AS BIGINT) AS DOUBLE)"
        f" / {scale}.0"
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<double>`` columns using only
    JVM higher-order functions (no Python in the hot path)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm_a = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (norm_a * norm_b)
