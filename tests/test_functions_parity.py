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
