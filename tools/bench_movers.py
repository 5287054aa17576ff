#!/usr/bin/env python
"""Mechanized >=2x bench-mover enumeration (VERDICT r16 item 4).

Round 16's mover adjudication missed one boundary-case key
(events_cumulative_unique_users, warm 2.06x) because the set was
compiled by inspection.  This tool derives it programmatically from
the two sweep files of consecutive rounds — BOTH lanes — so boundary
cases cannot be missed:

    python tools/bench_movers.py 17            # r17 vs r16, warm+cold
    python tools/bench_movers.py 17 --ratio 2.0 --floor 0.30

Per lane (warm = bench_full_r{N}.json, cold = bench_full_r{N}_cold.json)
every key present in both rounds is ratio'd new/old and flagged when
ratio >= --ratio AND the NEW time >= --floor seconds.

The floor (default 0.30 s) is documented policy, not a fudge: keys
whose flagged time is below it are scheduler-noise-class on this box
(single-digit-millisecond plans where one GC pause doubles the
number); they are still PRINTED in a separate sub-threshold section so
the adjudication file can cite them, but they don't demand a solo
retime.  Improvements (ratio <= 1/--ratio) are listed informationally.

Output is one JSON document on stdout, shaped to paste directly into
bench_isolation_r{N}.json's "movers" scaffold.  Exit 0 always — this
is an enumerator, the adjudication stays a human read.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_compare import load  # noqa: E402


def _lane(root: str, rnd: int, cold: bool) -> dict | None:
    suffix = "_cold" if cold else ""
    path = os.path.join(root, f"bench_full_r{rnd:02d}{suffix}.json")
    if not os.path.exists(path):
        return None
    return load(path).get("queries", {})


def movers(root: str, rnd: int, ratio: float, floor: float) -> dict:
    out: dict = {"round": rnd, "vs_round": rnd - 1, "ratio_threshold": ratio,
                 "floor_sec": floor, "lanes": {}}
    for cold in (False, True):
        lane = "cold" if cold else "warm"
        new = _lane(root, rnd, cold)
        old = _lane(root, rnd - 1, cold)
        if new is None or old is None:
            out["lanes"][lane] = {"missing_sweep": True}
            continue
        flagged, sub_floor, improved = {}, {}, {}
        for key in sorted(set(new) & set(old)):
            a, b = float(old[key]), float(new[key])
            if a <= 0 or b <= 0:
                continue
            r = b / a
            row = {"old": a, "new": b, "ratio": round(r, 3)}
            if r >= ratio:
                (flagged if b >= floor else sub_floor)[key] = row
            elif r <= 1.0 / ratio:
                improved[key] = row
        out["lanes"][lane] = {
            "movers": flagged,
            "sub_floor": sub_floor,
            "improved": improved,
            "compared": len(set(new) & set(old)),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("round", type=int)
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--floor", type=float, default=0.30)
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(json.dumps(movers(root, args.round, args.ratio, args.floor),
                     indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
