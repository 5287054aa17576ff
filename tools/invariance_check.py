#!/usr/bin/env python
"""Partitioning-invariance audit.

The round driver runs the query pack under ITS OWN session
configuration, not the builder's — so any query whose output VALUES
depend on the shuffle partitioning (float summation order crossing a
rounding boundary, a window tie broken by partition layout, a limit
without a total order) can be green locally and red driver-side.

This tool runs every ``__spark_entry__.queries()`` entry under two
different ``spark.sql.shuffle.partitions`` settings in two separate
Spark sessions, canonicalizes each result the way the driver does
(columns sorted by name, rows sorted by all columns, 17-significant-
digit float rendering), and reports any query whose canonical output
differs — each one is a latent CORRECTNESS flake.

Usage::

    python tools/invariance_check.py              # 7 vs 32 partitions
    python tools/invariance_check.py 5 64         # custom pair
    python tools/invariance_check.py --staged     # staged pack instead
    python tools/invariance_check.py --staged2    # second staged pack
    python tools/invariance_check.py --staged5    # fifth staged pack
    python tools/invariance_check.py --staged6    # sixth staged pack
    python tools/invariance_check.py 14 32 --keys=a,b  # key subset
    python tools/invariance_check.py --keys a,b       # same, space form
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/invariance_check.py

Exit code 0 iff every query is invariant.  (Round-6 session 3: all
185 keys invariant at sf0.01.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

_WORKER = """
import json, hashlib, os, sys
import pandas as pd
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = os.environ.get("SPARK_GRAFT_CPUS", "8")
os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = {nparts!r}
from parquet_stream_writer_spark.session import get_session
import __spark_entry__ as e
spark = get_session("inv" + {nparts!r})
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
qs = dict(e.queries())
if {staged!r} == "staged":
    from parquet_stream_writer_spark.operators import staged as _staged
    qs = dict(_staged.QUERIES)
elif {staged!r} == "staged2":
    from parquet_stream_writer_spark.operators import staged2 as _staged2
    qs = dict(_staged2.QUERIES)
elif {staged!r} == "staged3":
    from parquet_stream_writer_spark.operators import staged3 as _staged3
    qs = dict(_staged3.QUERIES)
elif {staged!r} == "staged4":
    from parquet_stream_writer_spark.operators import staged4 as _staged4
    qs = dict(_staged4.QUERIES)
elif {staged!r} == "staged6":
    from parquet_stream_writer_spark.operators import staged6 as _staged6
    qs = dict(_staged6.QUERIES)
elif {staged!r} == "staged5":
    from parquet_stream_writer_spark.operators import staged5 as _staged5
    qs = dict(_staged5.QUERIES)
only = {keys!r}
if only:
    qs = {{k: qs[k] for k in only}}
res = {{}}
for name, fn in sorted(qs.items()):
    df = fn(spark, sf).toPandas()
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    res[name] = hashlib.sha256(
        df.to_csv(index=False, float_format="%.17g").encode()
    ).hexdigest()
json.dump(res, open({out!r}, "w"))
spark.stop()
"""


def run_config(nparts: str, out: str, staged: str = "", keys: tuple = ()) -> None:
    code = _WORKER.format(
        repo=str(_REPO), nparts=nparts, out=out, staged=staged, keys=tuple(keys)
    )
    # stderr is captured, not discarded: a worker crash (bad key, bad
    # partition count) must surface its traceback, not a bare
    # CalledProcessError (round-13 self-review).
    proc = subprocess.run(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE,
    )
    if proc.returncode != 0:
        tail = proc.stderr.decode(errors="replace").splitlines()[-15:]
        print("[invariance] worker failed; stderr tail:", file=sys.stderr)
        for line in tail:
            print("   ", line, file=sys.stderr)
        raise SystemExit(proc.returncode)


def main() -> int:
    args = sys.argv[1:]
    staged = (
        "staged6"
        if "--staged6" in args
        else "staged5"
        if "--staged5" in args
        else "staged4"
        if "--staged4" in args
        else "staged3"
        if "--staged3" in args
        else "staged2" if "--staged2" in args else "staged" if "--staged" in args else ""
    )
    args = [a for a in args if a not in ("--staged", "--staged2", "--staged3", "--staged4", "--staged5", "--staged6")]
    # --keys=k1,k2 (or --keys k1,k2) restricts the sweep to a subset
    # of the pack — the per-repair probe lane (round-13 convention:
    # repaired keys re-check at 14/23/32 without paying the
    # full-registry sweep).
    keys: tuple = ()
    for i, a in enumerate(list(args)):
        if a.startswith("--keys"):
            if "=" in a:
                raw, consumed = a.split("=", 1)[1], [a]
            elif i + 1 < len(args):
                raw, consumed = args[i + 1], [a, args[i + 1]]
            else:
                raw, consumed = "", [a]
            keys = tuple(k for k in raw.split(",") if k)
            if not keys:
                print("[invariance] --keys given but no key names parsed")
                return 2
            for c in consumed:
                args.remove(c)
            break
    if keys:
        # validate in the parent so a typo'd key fails with its name,
        # not a KeyError buried in the worker subprocess
        sys.path.insert(0, str(_REPO))
        if staged:
            import importlib

            mod = importlib.import_module(
                f"parquet_stream_writer_spark.operators.{staged}"
            )
            known = set(mod.QUERIES)
        else:
            import __spark_entry__ as entry

            known = set(entry.queries())
        unknown = sorted(set(keys) - known)
        if unknown:
            print(f"[invariance] unknown keys for this pack: {unknown}")
            return 2
    pair = args[:2] or ["7", "32"]
    with tempfile.TemporaryDirectory() as d:
        outs = []
        for np_ in pair:
            out = os.path.join(d, f"inv{np_}.json")
            print(f"[invariance] running pack at shuffle.partitions={np_} ...")
            run_config(np_, out, staged=staged, keys=keys)
            outs.append(json.load(open(out)))
    a, b = outs
    diff = sorted(k for k in a if a[k] != b.get(k))
    print(f"[invariance] queries compared: {len(a)}")
    if diff:
        print(f"[invariance] PARTITIONING-SENSITIVE: {len(diff)}")
        for k in diff:
            print("  DIVERGES:", k)
        return 1
    print("[invariance] all queries invariant")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
