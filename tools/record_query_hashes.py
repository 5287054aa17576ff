#!/usr/bin/env python
"""Snapshot registry query source hashes — ATTESTATION-DRIVEN (round 9).

Two-file protocol (replaces round 8's window-prediction refresh, which
ADVICE r8 showed can launder staleness: the 50-key window predicted
under the OLD snapshot can differ from the window the driver actually
computes under the NEW one whenever the boundary falls inside a
verdict-round cohort — and iterating the prediction to a fixpoint can
oscillate with period 2 because refreshing a stale key demotes its
tie-break.  So the snapshot no longer predicts anything: a key's
recorded hash advances ONLY when a driver artifact proves that exact
source was verified).

1. ``python tools/record_query_hashes.py``  (session END, last commit)
   Writes ``PENDING_QUERY_HASHES.json``: the CURRENT source hash of
   every registered key.  This is exactly the source the upcoming
   driver run will execute, whatever window it picks.  It does NOT
   touch ``QUERY_SOURCE_HASHES.json`` (except to bootstrap one when
   missing), so the registry ordering the driver sees — and therefore
   the window it verifies — is computed from last-attested hashes by
   the driver itself, not predicted here.

2. ``python tools/record_query_hashes.py --fold``  (next round START,
   after ``CORRECTNESS_r{N}.json`` lands)
   For every key with a GREEN verdict in the latest CORRECTNESS file,
   copies the pending hash (the source the driver just attested) into
   ``QUERY_SOURCE_HASHES.json``.  Keys the driver did not verify keep
   their previously-attested hash, so an edited-but-unwindowed key
   stays stale-marked until a window actually verifies it — staleness
   cannot be laundered by construction, regardless of how the window
   boundary interacts with cohort tie-breaks.

Per key the hash covers: the query function's source, its module's
helper text (module source minus the registered query functions), the
cross-module helpers from the manual dependency map, and the key's
evaluated oracle SQL — so a rewrite of a shared mining core or decode
kernel floats every dependent key, not just same-function edits
(VERDICT r4 item 2).  Package-level infra (``sources``/``functions``/
``session``) is excluded; verdict-age rotation is the backstop there.

If a key was edited BETWEEN the pending snapshot and the driver run
(which the workflow forbids — the snapshot is the last commit of a
session), the fold detects the mismatch (pending hash ≠ hash of the
source the driver ran is unobservable, but pending ≠ CURRENT source at
fold time is) and keeps the old attested hash, leaving the key stale.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_stream_writer_spark.operators import (  # noqa: E402
    all_queries,
    oracle_text_hash,
    query_source_hash,
)

_HASH_FILE = "QUERY_SOURCE_HASHES.json"
_PENDING_FILE = "PENDING_QUERY_HASHES.json"


def _root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _latest_round(root: str) -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def snapshot_pending(root: str | None = None) -> None:
    """Session-END step: record every key's current source hash as the
    PENDING attestation candidate for the upcoming driver run.

    Self-heal (ADVICE r9): if a new CORRECTNESS round landed and was
    never folded, overwriting pending would advance ``for_round_after``
    past that round and make its attestations permanently unfoldable
    (the ``rnd <= for_round_after`` guard) — the whole verified window
    would re-verify.  Auto-fold first so the verdicts are banked
    against the OLD pending snapshot before it is replaced."""
    root = root or _root()
    pending_doc = _load(os.path.join(root, _PENDING_FILE))
    attested_doc = _load(os.path.join(root, _HASH_FILE))
    latest = _latest_round(root)
    if latest > pending_doc.get("for_round_after", -1) and latest > attested_doc.get(
        "as_of_round", -1
    ):
        print(
            f"CORRECTNESS_r{latest} landed but was never folded — "
            f"auto-folding before the pending snapshot is replaced:"
        )
        fold_attested(root)
    cur = {k: query_source_hash(fn) for k, fn in sorted(all_queries().items())}
    # Oracle-TEXT hashes ride alongside (round 10, VERDICT r9 item 3):
    # the fold advances them with the source hashes so _prioritized can
    # rank an oracle-recontracted key as unverified rather than stale.
    cur_oracle = {
        k: h for k in cur if (h := oracle_text_hash(k)) is not None
    }
    pending = {
        "for_round_after": _latest_round(root),
        "hashes": cur,
        "oracle_hashes": cur_oracle,
    }
    out = os.path.join(root, _PENDING_FILE)
    with open(out, "w") as fh:
        json.dump(pending, fh, indent=1, sort_keys=True)
    print(
        f"wrote {out}: {len(cur)} pending hashes "
        f"(driver round > {pending['for_round_after']} will attest a "
        f"window of these)"
    )

    # Bootstrap: a missing attested snapshot would mark nothing stale
    # and give verdict-age rotation nothing to tie-break; seed it with
    # the current hashes once (the round-8 file already exists in this
    # repo, so this path only matters for fresh clones).
    attested_path = os.path.join(root, _HASH_FILE)
    if not os.path.exists(attested_path):
        with open(attested_path, "w") as fh:
            json.dump(
                {
                    "as_of_round": _latest_round(root),
                    "hashes": cur,
                    "oracle_hashes": cur_oracle,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"bootstrapped {attested_path} ({len(cur)} hashes)")


def fold_attested(root: str | None = None) -> None:
    """Round-START step: advance the attested snapshot for exactly the
    keys the latest CORRECTNESS artifact verified green."""
    root = root or _root()
    rnd = _latest_round(root)
    if rnd == 0:
        # Fresh clone: writing {as_of_round: 0, hashes: {}} here would
        # permanently suppress snapshot_pending's bootstrap and mark
        # the whole registry stale against an empty snapshot.
        print("no fold: no CORRECTNESS artifact exists yet")
        return
    correctness = _load(os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json")) or _load(
        os.path.join(root, f"CORRECTNESS_r{rnd}.json")
    )
    pending_doc = _load(os.path.join(root, _PENDING_FILE))
    if rnd <= pending_doc.get("for_round_after", -1):
        # The latest CORRECTNESS file predates the pending snapshot —
        # its verdicts attest OLDER sources than pending records;
        # folding would launder the in-between edits.
        print(
            f"no fold: CORRECTNESS_r{rnd} predates the pending snapshot "
            f"(taken after round {pending_doc['for_round_after']})"
        )
        return
    pending = pending_doc.get("hashes", {})
    pending_oracle = pending_doc.get("oracle_hashes", {})
    # A pending file written before oracle-hash recording existed has
    # no ``oracle_hashes`` section at all — that is "no information",
    # not "these keys have no oracle", so such a fold must leave the
    # attested oracle hashes untouched (seeded attestations survive).
    pending_has_oracle = "oracle_hashes" in pending_doc
    attested_path = os.path.join(root, _HASH_FILE)
    attested = _load(attested_path)
    if rnd <= attested.get("as_of_round", -1):
        # Already banked (e.g. the fold was re-run at a later session's
        # start) — a second fold must be a no-op, not a partial rewrite.
        print(
            f"no fold: CORRECTNESS_r{rnd} is already attested "
            f"(snapshot as of round {attested['as_of_round']})"
        )
        return
    hashes = dict(attested.get("hashes", {}))
    oracle_hashes = dict(attested.get("oracle_hashes", {}))

    cur = {k: query_source_hash(fn) for k, fn in all_queries().items()}
    folded, skipped_red, skipped_edited = 0, 0, 0
    for key, row in sorted(correctness.items()):
        if not isinstance(row, dict):
            continue
        green = row.get("hash_match") is True or (
            row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        )
        if not green:
            skipped_red += 1
            continue
        if key not in pending:
            continue
        if cur.get(key) != pending[key]:
            # Edited after the pending snapshot — the driver verdict
            # does not cover the current source; stay stale.
            skipped_edited += 1
            continue
        if hashes.get(key) != pending[key]:
            folded += 1
        hashes[key] = pending[key]
        # The combined-hash guard above also covers the oracle text
        # (it is folded into query_source_hash), so the pending oracle
        # hash is exactly the contract the driver just attested.
        if key in pending_oracle:
            oracle_hashes[key] = pending_oracle[key]
        elif pending_has_oracle:
            # Pending records the key as oracle-less (rows-only): the
            # attested oracle contract is retired with this fold.
            oracle_hashes.pop(key, None)
    snapshot = {
        "as_of_round": rnd,
        "hashes": hashes,
        "oracle_hashes": oracle_hashes,
    }
    with open(attested_path, "w") as fh:
        json.dump(snapshot, fh, indent=1, sort_keys=True)
    print(
        f"wrote {attested_path}: {len(hashes)} hashes as of round {rnd} "
        f"({folded} attestations folded from pending, {skipped_red} "
        f"non-green skipped, {skipped_edited} edited-since-pending kept "
        f"stale)"
    )


def main() -> None:
    if "--fold" in sys.argv[1:]:
        fold_attested()
    else:
        snapshot_pending()


if __name__ == "__main__":
    main()
