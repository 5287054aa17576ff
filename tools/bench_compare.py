"""Compare two bench JSON lines (e.g. BENCH_r01.json vs a fresh run)
per query, so real plan regressions are distinguishable from the 2-3×
wall-time jitter this shared box shows on single runs.

Usage::

    python bench.py > /tmp/bench_now.json
    python tools/bench_compare.py BENCH_r01.json /tmp/bench_now.json

Prints queries whose best-of-N time moved by more than ``--threshold``
(default 2.0×) in either direction, plus totals.  Exit code 1 iff any
query regressed beyond the threshold (new queries and sub-threshold
moves are informational only).
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    """Load a bench result: either bench.py's own one-line JSON or the
    driver's BENCH_r{N}.json wrapper, whose "tail" holds a (possibly
    truncated) fragment of that line — recover per-query times from it
    with a regex.  When a BENCH_r{N}.json has a sibling
    bench_full_r{N}.json (written by bench.py itself, never
    truncated), prefer the sibling."""
    import os
    import re

    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        sibling = os.path.join(
            os.path.dirname(path), f"bench_full_r{int(m.group(1)):02d}.json"
        )
        if os.path.exists(sibling):
            path = sibling
    with open(path) as fh:
        text = fh.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        return doc
    tail = (doc or {}).get("tail", text)
    queries = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', tail)
        if m.group(1) not in ("value", "sf", "metric", "n", "rc", "cpus")
    }
    # The wrapper's per-query fragment excludes "value" above, so the
    # total must come from the tail's own "value" field (or stays None
    # for a truncated tail that lost it).
    m = re.search(r'"value":\s*(-?\d+(?:\.\d+)?)', tail)
    if m:
        total = float(m.group(1))
    else:
        # Front-truncated tails lose the "value" field; the per-query
        # sum (over whatever survived truncation) is the best estimate.
        total = round(sum(t for t in queries.values() if t >= 0), 3) if queries else None
    return {"queries": queries, "value": total}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    regressed = []
    improved = []
    for name in sorted(nq):
        t_new = nq[name]
        t_old = oq.get(name)
        if t_old is None or t_old <= 0 or t_new <= 0:
            continue
        ratio = t_new / t_old
        if ratio >= args.threshold:
            regressed.append((ratio, name, t_old, t_new))
        elif ratio <= 1 / args.threshold:
            improved.append((ratio, name, t_old, t_new))
    for ratio, name, t_old, t_new in sorted(regressed, reverse=True):
        print(f"REGRESSED {ratio:5.2f}x  {name}: {t_old}s -> {t_new}s")
    for ratio, name, t_old, t_new in sorted(improved):
        print(f"improved  {ratio:5.2f}x  {name}: {t_old}s -> {t_new}s")
    print(
        f"totals: old={old.get('value')}s ({len(oq)} queries) "
        f"new={new.get('value')}s ({len(nq)} queries); "
        f"{len(regressed)} regressed / {len(improved)} improved beyond "
        f"{args.threshold}x"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
