#!/usr/bin/env python
"""Strict differential replay for the SECOND staged pack
(operators/staged2.py) — driver_check's dtype-exact comparison applied
to keys that are not yet in the registry.

Usage::

    python tools/staged2_check.py                 # all staged2 keys
    python tools/staged2_check.py --staged3       # the third staged pack
    python tools/staged2_check.py --staged4       # the fourth staged pack
    python tools/staged2_check.py --staged5       # the fifth staged pack
    python tools/staged2_check.py --staged6       # the sixth staged pack
    python tools/staged2_check.py key1 key2       # a subset
    SPARK_GRAFT_SF_DIR=... python tools/staged2_check.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from parquet_stream_writer_spark.sources import TABLES  # noqa: E402


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = (
                pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
            )
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    from parquet_stream_writer_spark.session import get_session

    args = [a for a in sys.argv[1:] if a not in ("--staged3", "--staged4", "--staged5", "--staged6")]
    if "--staged6" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged6 as staged2
    elif "--staged5" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged5 as staged2
    elif "--staged4" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged4 as staged2
    elif "--staged3" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged3 as staged2
    else:
        from parquet_stream_writer_spark.operators import staged2

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    keys = args or sorted(staged2.QUERIES)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark = get_session("staged2-check")
    bad = 0
    for name in keys:
        try:
            l = canonicalize(staged2.QUERIES[name](spark, sf).toPandas())
            r = canonicalize(con.sql(staged2.ORACLE[name]).df())
            ok = l.equals(r)
        except Exception as ex:  # noqa: BLE001
            print(f"[ERROR] {name}: {type(ex).__name__}: {str(ex)[:200]}")
            bad += 1
            continue
        if ok:
            print(f"[match] {name} ({len(l)})")
        else:
            bad += 1
            print(f"[MISMATCH] {name}: spark {len(l)} rows vs oracle {len(r)}")
            print("  spark:", l.head(5).to_dict("records"))
            print("  oracle:", r.head(5).to_dict("records"))
            if list(l.columns) == list(r.columns) and len(l) == len(r):
                for c in l.columns:
                    if not l[c].equals(r[c]):
                        diff = (l[c] != r[c]) | l[c].isna() != r[c].isna()
                        print(f"  first col diff: {c}")
                        break
    print(f"-- {len(keys) - bad}/{len(keys)} strictly green --")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
