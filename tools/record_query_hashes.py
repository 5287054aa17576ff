#!/usr/bin/env python
"""Snapshot every registry query function's source hash.

Run at the START of a round session, BEFORE making any edits (so the
snapshot reflects the code the previous round's driver verdicts were
recorded against; this round's edits then hash-differ and float back
into the verification window):

    python tools/record_query_hashes.py

Writes ``QUERY_SOURCE_HASHES.json`` at the repo root.  The registry
(``operators._source_stale_keys``) compares each key's CURRENT source
hash against this snapshot: a mismatch means the query was edited
after its last driver verdict, so the key floats back into the
driver's verification window even though an old green verdict exists.
(Per ADVICE r3: plan rewrites to previously-green queries must not
ride a stale verdict out of the re-verification window.)

The snapshot covers, per key: the query function's source, its
module's helper text (module source minus the registered query
functions), and the cross-module helpers from the manual dependency
map — so a rewrite of a shared mining core or decode kernel floats
every dependent key, not just same-function edits (VERDICT r4 item
2).  Package-level infra (``sources``/``functions``/``session``) is
excluded; verdict-age rotation is the backstop there.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_stream_writer_spark.operators import all_queries, query_source_hash  # noqa: E402


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    snapshot = {
        "as_of_round": max(rounds, default=0),
        "hashes": {k: query_source_hash(fn) for k, fn in sorted(all_queries().items())},
    }
    out = os.path.join(root, "QUERY_SOURCE_HASHES.json")
    with open(out, "w") as fh:
        json.dump(snapshot, fh, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(snapshot['hashes'])} hashes as of round {snapshot['as_of_round']}")


if __name__ == "__main__":
    main()
