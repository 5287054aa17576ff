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

Per-query ratios are normalized by the MEDIAN ratio across all
comparable queries ("load factor") before thresholding: two runs from
different harnesses routinely differ by a uniform ~1.2-1.5× (round 4:
builder 73.0 s vs driver 89.1 s with every untouched trivial query
shifted by the same ratio), and without normalization that uniform
shift reads as dozens of fake regressions.  ``--no-normalize``
restores raw ratios.
"""

from __future__ import annotations

import argparse
import json
import statistics


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
    ap.add_argument(
        "--no-normalize",
        action="store_true",
        help="threshold raw ratios instead of load-factor-normalized ones",
    )
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    ratios = {
        name: nq[name] / oq[name]
        for name in nq
        if oq.get(name) is not None and oq[name] > 0 and nq[name] > 0
    }
    load_factor = 1.0
    if not args.no_normalize and len(ratios) >= 5:
        load_factor = statistics.median(ratios.values())
    regressed = []
    improved = []
    for name, raw in sorted(ratios.items()):
        ratio = raw / load_factor
        if ratio >= args.threshold:
            regressed.append((ratio, name, oq[name], nq[name]))
        elif ratio <= 1 / args.threshold:
            improved.append((ratio, name, oq[name], nq[name]))
    for ratio, name, t_old, t_new in sorted(regressed, reverse=True):
        print(f"REGRESSED {ratio:5.2f}x  {name}: {t_old}s -> {t_new}s")
    for ratio, name, t_old, t_new in sorted(improved):
        print(f"improved  {ratio:5.2f}x  {name}: {t_old}s -> {t_new}s")
    print(
        f"totals: old={old.get('value')}s ({len(oq)} queries) "
        f"new={new.get('value')}s ({len(nq)} queries); "
        f"load_factor={round(load_factor, 3)} "
        f"(normalized={not args.no_normalize and len(ratios) >= 5}); "
        f"{len(regressed)} regressed / {len(improved)} improved beyond "
        f"{args.threshold}x"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
