"""Shared fixtures: one local SparkSession per test run, a DuckDB
oracle connection with the corpus tables registered as views, and an
order-insensitive result comparator mirroring the driver's check."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

# Default to sf0.01 — the scale the round driver checks at.  Round 1's
# sf0.001 default let sf0.01-only divergences (DECIMAL typing, HUGEINT
# widening) through to the driver unseen.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

from parquet_stream_writer_spark.sources import TABLES  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from parquet_stream_writer_spark.session import get_session

    spark = get_session("pytest")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive
    comparison, the same shape the driver's value-hash uses."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            # tz-strip and unit-normalize (Spark ns vs DuckDB us) — the
            # driver hash compares timestamp values, not storage unit.
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_results_match(spark_df, oracle_con, sql: str, float_tol: float = 1e-9):
    left = _normalize(spark_df.toPandas())
    right = _normalize(oracle_con.sql(sql).df())
    assert list(left.columns) == list(right.columns), (
        f"column mismatch: spark={list(left.columns)} oracle={list(right.columns)}"
    )
    assert len(left) == len(right), f"row count: spark={len(left)} oracle={len(right)}"
    # Driver-faithful dtype strictness: the driver's value hash separates
    # a Spark float64 from a DuckDB Decimal/HUGEINT column even when the
    # numbers compare equal, so a dtype divergence must fail here too.
    for c in left.columns:
        assert str(left[c].dtype) == str(right[c].dtype), (
            f"dtype mismatch on {c}: spark={left[c].dtype} oracle={right[c].dtype}"
        )
    for c in left.columns:
        lv, rv = left[c].tolist(), right[c].tolist()
        for i, (a, b) in enumerate(zip(lv, rv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                assert not (a_nan or b_nan), f"{c}[{i}]: {a!r} vs {b!r}"
                assert math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol), (
                    f"{c}[{i}]: {a!r} vs {b!r}"
                )
            else:
                assert a == b, f"{c}[{i}]: {a!r} vs {b!r}"


@pytest.fixture(scope="session")
def empty_sf(spark, tmp_path_factory):
    """Schema-exact empty corpus: every driver table, zero rows
    (shared by the registered-pack and staged-pack empty sweeps)."""
    sf = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (
            spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(sf / f"{t}.parquet"))
        )
    return str(sf)
