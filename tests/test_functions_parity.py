"""Property-based cross-engine parity for the rounding convention.

Every oracle comparison in this repo funnels floats through
``pround`` (Spark) / ``sql_round`` (DuckDB). If the two ever diverge
on any representable double, every float-producing query could
mismatch — so the pair is fuzzed here across engines: identical
inputs through Spark's JVM expression and DuckDB's evaluator must be
bit-identical.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from parquet_stream_writer_spark.functions import pround, sql_round


# One module-scoped pandas round-trip per example set would spin up
# Spark per case; instead collect a batch of doubles per test run.
DOUBLES = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


@settings(max_examples=30, deadline=None)
@given(batch_values=st.lists(DOUBLES, min_size=1, max_size=50), digits=st.integers(0, 6))
def test_pround_matches_duckdb(request, batch_values, digits):
    spark = request.getfixturevalue("spark")
    df = spark.createDataFrame([(v,) for v in batch_values], "x double")
    got = [r[0] for r in df.select(pround("x", digits).alias("r")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in batch_values])
    want = [r[0] for r in con.execute(f"SELECT {sql_round('x', digits)} FROM t").fetchall()]
    assert got == want  # bit-identical, no tolerance


@pytest.mark.parametrize("value,digits", [
    (2.675, 2),   # classic binary-representation trap
    (0.125, 2),
    (-2.675, 2),
    (1.005, 2),
    (1e11 + 0.5, 0),
])
def test_pround_known_boundaries(spark, value, digits):
    # CAST the literal to DOUBLE: a bare "1.005" literal is DECIMAL in
    # DuckDB (exact, rounds up) while Spark evaluates the binary
    # double — the oracle contract only covers DOUBLE-typed columns.
    df = spark.createDataFrame([(value,)], "x double")
    got = df.select(pround("x", digits).alias("r")).first()[0]
    want = duckdb.sql(
        f"SELECT {sql_round(f'CAST({value!r} AS DOUBLE)', digits)}"
    ).fetchone()[0]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(batch_values=st.lists(
    st.floats(min_value=-9e12, max_value=9e12,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=50,
))
def test_quant6_matches_duckdb(request, batch_values):
    """The round-13 integer-sum quantizer pair: identical doubles
    through Spark's quant6 and DuckDB's sql_quant6 must yield the
    same BIGINT (the per-term exactness every migrated operator's
    cross-engine contract rests on).  Bounded to |x| ≤ 9e12 so
    x·1e6 stays inside int64 — the documented validity domain."""
    from parquet_stream_writer_spark.functions import quant6, sql_quant6
    from pyspark.sql import functions as F

    spark = request.getfixturevalue("spark")
    df = spark.createDataFrame([(v,) for v in batch_values], "x double")
    got = [r[0] for r in df.select(quant6(F.col("x")).alias("r")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in batch_values])
    want = [r[0] for r in con.execute(f"SELECT {sql_quant6('x')} FROM t").fetchall()]
    assert got == want  # bit-identical longs, no tolerance


@settings(max_examples=30, deadline=None)
@given(
    batch_values=st.lists(
        st.floats(min_value=-9e14, max_value=9e14,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=50,
    ),
    digits=st.sampled_from([2, 4]),
)
def test_quantn_matches_duckdb(request, batch_values, digits):
    """The generalized quantizer pair (round 14): quantn/sql_quantn at
    the two new call-site scales — cents (events_anomaly_zscore's
    frame moments) and 1e-4 units (text_winsorize_quality's clipped
    means) — must produce the same BIGINT from identical doubles.
    Bounded to |x| ≤ 9e14 so x·1e4 stays well inside int64."""
    from parquet_stream_writer_spark.functions import quantn, sql_quantn
    from pyspark.sql import functions as F

    spark = request.getfixturevalue("spark")
    df = spark.createDataFrame([(v,) for v in batch_values], "x double")
    got = [
        r[0] for r in df.select(quantn(F.col("x"), digits).alias("r")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in batch_values])
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_quantn('x', digits)} FROM t"
        ).fetchall()
    ]
    assert got == want  # bit-identical longs, no tolerance


@pytest.mark.parametrize("value", [
    0.0000005,    # exactly on a +0.5 floor boundary in decimal
    -0.0000005,
    1.9999995,
    0.1,          # classic non-representable decimal
    -123.4567895,
    9e12,         # domain edge: 9e18 < int64 max
    -9e12,
])
def test_quant6_known_boundaries(spark, value):
    from parquet_stream_writer_spark.functions import quant6, sql_quant6
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(value,)], "x double")
    got = df.select(quant6(F.col("x")).alias("r")).first()[0]
    want = duckdb.sql(
        f"SELECT {sql_quant6(f'CAST({value!r} AS DOUBLE)')}"
    ).fetchone()[0]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    batch_values=st.lists(
        st.floats(
            min_value=-9e8, max_value=9e8, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    digits=st.sampled_from([4, 6, 8]),
)
def test_int_mean_and_int_sum_match_duckdb(request, batch_values, digits):
    """The shared integer-reduce pair (self-review r17, replacing five
    hand-expanded floor/sum/count sites): int_mean/sql_int_mean and
    int_sum/sql_int_sum over identical doubles must be bit-identical
    across engines at every call-site scale (q2 1e-4, kmeans/PQ 1e-6,
    int8 1e-8)."""
    from pyspark.sql import functions as F

    from parquet_stream_writer_spark.functions import (
        int_mean,
        int_sum,
        sql_int_mean,
        sql_int_sum,
    )

    spark = request.getfixturevalue("spark")
    df = spark.createDataFrame([(v,) for v in batch_values], "x double")
    got = df.agg(
        int_mean(F.col("x"), digits).alias("m"),
        int_sum(F.col("x"), digits).alias("s"),
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in batch_values])
    want = con.execute(
        f"SELECT {sql_int_mean('x', digits)}, {sql_int_sum('x', digits)} FROM t"
    ).fetchone()
    assert (got["m"], got["s"]) == want  # bit-identical, no tolerance
