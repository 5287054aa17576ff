"""Driver-faithful correctness replay.

Replays the round driver's CORRECTNESS gate more strictly than the
tolerant pytest harness: for each query in ``__spark_entry__.queries()``
with an ``oracle_sql()`` entry, runs the Spark DataFrame and the DuckDB
SQL at the same scale factor, canonicalizes both results the way the
driver does (columns sorted by name, rows sorted by all columns), and
then requires **exact** equality via ``pandas.DataFrame.equals`` — which
compares dtypes as well as values.  A Spark float64 vs DuckDB
Decimal/HUGEINT-object column fails here exactly like it fails the
driver's value hash, even when the numbers are numerically equal.

Usage::

    python tools/driver_check.py                 # all oracled queries
    python tools/driver_check.py q1 agg_pivot    # a subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/driver_check.py

Exit code 0 iff every checked query is strictly green.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from parquet_stream_writer_spark.sources import TABLES  # noqa: E402


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: column-name order, then row sort.

    Raises on unsortable cell types (e.g. numpy arrays) just like the
    driver's canonicalizer does — an array-typed output column is a
    contract violation, not something to paper over.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # Spark toPandas yields datetime64[ns], DuckDB datetime64[us];
        # the driver hashes the (equal) timestamp values, not the unit —
        # round-1 proof: q3_shipping_priority was hash-green with this
        # exact difference. Normalize so only real divergences fail.
        if str(df[c].dtype).startswith("datetime64"):
            # tz-strip BEFORE the unit cast, exactly like the pytest
            # normalizer (tests/conftest.py): astype("datetime64[ns]")
            # on a tz-aware column raises in pandas 2.x.
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def check_query(name, fn, sql, spark, con, sf_dir):
    spark_pd = fn(spark, sf_dir).toPandas()
    if sql is None:
        # Rows-only contract: still exercise the canonicalizer so
        # unhashable output types are caught before the driver sees them.
        canonicalize(spark_pd)
        return ("rows-only", len(spark_pd), None)
    oracle_pd = con.sql(sql).df()
    l, r = canonicalize(spark_pd), canonicalize(oracle_pd)
    if list(l.columns) != list(r.columns):
        return ("SCHEMA-MISMATCH", f"spark={list(l.columns)}", f"oracle={list(r.columns)}")
    if len(l) != len(r):
        return ("ROWS-MISMATCH", len(l), len(r))
    if not l.equals(r):
        detail = []
        for c in l.columns:
            if str(l[c].dtype) != str(r[c].dtype):
                detail.append(f"{c}: dtype {l[c].dtype} vs {r[c].dtype}")
            elif not l[c].equals(r[c]):
                neq = l[c] != r[c]
                idx = neq[neq].index[:3].tolist()
                pairs = [(l[c].iloc[i], r[c].iloc[i]) for i in idx]
                detail.append(f"{c}: values differ at {idx}: {pairs}")
        return ("VALUE-MISMATCH", len(l), "; ".join(detail) or "cell-level diff")
    return ("match", len(l), None)


def main(argv: list[str]) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from parquet_stream_writer_spark.session import get_session

    spark = get_session("driver-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = entry.queries(), entry.oracle_sql()
    wanted = argv or list(queries)
    missing = [w for w in wanted if w not in queries]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2

    failures = 0
    for name in wanted:
        try:
            status, a, b = check_query(
                name, queries[name], oracles.get(name), spark, con, sf_dir
            )
        except Exception as exc:  # canonicalizer crash == driver ERR
            status, a, b = "ERROR", type(exc).__name__, str(exc)[:200]
        ok = status in ("match", "rows-only")
        failures += 0 if ok else 1
        tail = f" :: {b}" if b else ""
        print(f"[{status}] {name} ({a}){tail}")
    print(f"-- {len(wanted) - failures}/{len(wanted)} strictly green --")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
