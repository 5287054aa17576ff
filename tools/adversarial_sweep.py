#!/usr/bin/env python
"""Adversarial-corpus differential sweep, on demand.

Builds the hostile corpus from tests/test_adversarial_corpus.py
(sf0.001 + unicode/empty/tie/boundary rows) and replays either the
STAGED pack (default — also covered in pytest) or the full REGISTERED
pack (too slow for the default pytest run) against the DuckDB oracles
with the driver-style dtype-strict comparison.

Usage::

    python tools/adversarial_sweep.py             # staged pack
    python tools/adversarial_sweep.py --registered
    python tools/adversarial_sweep.py --staged2   # pre-registration gate
    python tools/adversarial_sweep.py --staged3   # third staged pack
    python tools/adversarial_sweep.py --staged4   # fourth staged pack
    python tools/adversarial_sweep.py --staged5   # fifth staged pack
    python tools/adversarial_sweep.py --staged6   # sixth staged pack

The round-6 known-findings list (json_extraction /
multimodal_audio_features / multimodal_shard_manifest oracle
brittleness) was fixed in round 7 (TRY_CAST / BIGINT / encode()) and
the list is now EMPTY.

Exit code 0 iff no divergence or error anywhere in the pack.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys
import tempfile

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

#: Registered keys whose ORACLES are known-brittle on hostile rows.
#: Emptied in round 7: the three round-6 findings were fixed with
#: TRY_CAST (json_extraction), a BIGINT pre-cast before squaring
#: (multimodal_audio_features) and encode() (multimodal_shard_manifest).
KNOWN_ORACLE_BRITTLE: set[str] = set()


def _load_adv_module():
    spec = importlib.util.spec_from_file_location(
        "advmod", _REPO / "tests" / "test_adversarial_corpus.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["advmod"] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    import math

    import duckdb
    import pandas as pd

    registered = "--registered" in sys.argv[1:]
    adv = _load_adv_module()

    class _Factory:
        def mktemp(self, name):
            return pathlib.Path(tempfile.mkdtemp(prefix=name))

    sf = adv.adversarial_sf.__wrapped__(_Factory())
    con = duckdb.connect()
    for t in adv._TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    if registered:
        import __spark_entry__ as entry

        queries, oracles = entry.queries(), entry.oracle_sql()
    elif "--staged2" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged2

        queries, oracles = staged2.QUERIES, staged2.ORACLE
    elif "--staged3" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged3

        queries, oracles = staged3.QUERIES, staged3.ORACLE
    elif "--staged4" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged4

        queries, oracles = staged4.QUERIES, staged4.ORACLE
    elif "--staged6" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged6

        queries, oracles = staged6.QUERIES, staged6.ORACLE
    elif "--staged5" in sys.argv[1:]:
        from parquet_stream_writer_spark.operators import staged5

        queries, oracles = staged5.QUERIES, staged5.ORACLE
    else:
        from parquet_stream_writer_spark.operators import staged

        queries, oracles = staged.QUERIES, staged.ORACLE

    from parquet_stream_writer_spark.session import get_session

    spark = get_session("adversarial-sweep")

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        return df.sort_values(by=list(df.columns), ignore_index=True)

    def equal(l, r) -> bool:
        if list(l.columns) != list(r.columns) or len(l) != len(r):
            return False
        for c in l.columns:
            for a, b in zip(l[c].tolist(), r[c].tolist()):
                # pd.isna covers None, float NaN AND NaT — a bare
                # NaN/None check misses datetime nulls, and
                # NaT != NaT would read as a divergence.
                a_null = not isinstance(a, (list, tuple)) and pd.isna(a)
                b_null = not isinstance(b, (list, tuple)) and pd.isna(b)
                if a_null or b_null:
                    if a_null != b_null:
                        return False
                    continue
                if isinstance(a, float) or isinstance(b, float):
                    if not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
                        return False
                elif a != b:
                    return False
        return True

    diverged, errored = [], []
    for name in sorted(queries):
        try:
            l = norm(queries[name](spark, str(sf)).toPandas())
            r = norm(con.sql(oracles[name]).df())
            if not equal(l, r):
                diverged.append(name)
                print(f"[DIVERGES] {name}")
        except Exception as ex:  # either engine erroring is a finding
            errored.append(name)
            known = " (known)" if name in KNOWN_ORACLE_BRITTLE else ""
            print(f"[ERROR]{known} {name}: {type(ex).__name__}: {str(ex)[:140]}")
    spark.stop()

    new = [k for k in diverged + errored if k not in KNOWN_ORACLE_BRITTLE]
    total = len(queries)
    print(
        f"[adversarial] {total - len(diverged) - len(errored)}/{total} clean; "
        f"known-brittle hit: {sorted(set(errored) & KNOWN_ORACLE_BRITTLE)}; "
        f"NEW findings: {new}"
    )
    return 1 if new else 0


if __name__ == "__main__":
    raise SystemExit(main())
