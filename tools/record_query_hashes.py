#!/usr/bin/env python
"""Snapshot registry query source hashes — WINDOW-AWARE (round 8).

Run at the END of a round session, AFTER all edits, as (one of) the
last commits:

    python tools/record_query_hashes.py

Writes ``QUERY_SOURCE_HASHES.json`` at the repo root.  The registry
(``operators._source_stale_keys``) compares each key's CURRENT source
hash against this snapshot: a mismatch means the query was edited
after its last driver verdict, so the key floats ahead of its
verdict-round cohort in the driver's verification window.

The snapshot refreshes a key's hash ONLY when the upcoming driver run
will actually attest it:

- keys inside the 50-key prefix window (the driver verifies exactly
  these) get their CURRENT hash — verdict and hash land together;
- keys with no recorded hash yet (newly registered) get their current
  hash — they are tier-0 and always inside the window;
- every other key keeps its PREVIOUSLY RECORDED hash, so a key edited
  this round but left outside the window stays stale-marked until a
  later window verifies it.  (Under the round-8 age-first rotation,
  edit bursts no longer displace old verdicts; this preservation rule
  is what keeps that trade honest — staleness is never laundered by
  the snapshot.)

Per key the hash covers: the query function's source, its module's
helper text (module source minus the registered query functions), and
the cross-module helpers from the manual dependency map — so a rewrite
of a shared mining core or decode kernel floats every dependent key,
not just same-function edits (VERDICT r4 item 2).  Package-level infra
(``sources``/``functions``/``session``) is excluded; verdict-age
rotation is the backstop there.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_stream_writer_spark.operators import all_queries, query_source_hash  # noqa: E402

WINDOW = 50


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    out = os.path.join(root, _HASH_FILE)
    try:
        with open(out) as fh:
            recorded = json.load(fh).get("hashes", {})
    except (OSError, ValueError):
        recorded = {}

    queries = all_queries()  # prioritized: prefix == the driver's window
    window = set(list(queries)[:WINDOW])
    hashes = {}
    refreshed, preserved = 0, 0
    for k, fn in sorted(queries.items()):
        cur = query_source_hash(fn)
        if k in window or k not in recorded:
            hashes[k] = cur
            refreshed += 1
        else:
            hashes[k] = recorded[k]
            if recorded[k] != cur:
                preserved += 1
    snapshot = {"as_of_round": max(rounds, default=0), "hashes": hashes}
    with open(out, "w") as fh:
        json.dump(snapshot, fh, indent=1, sort_keys=True)
    print(
        f"wrote {out}: {len(hashes)} hashes as of round "
        f"{snapshot['as_of_round']} ({refreshed} refreshed/new, "
        f"{preserved} edited-but-unwindowed kept stale)"
    )


_HASH_FILE = "QUERY_SOURCE_HASHES.json"


if __name__ == "__main__":
    main()
