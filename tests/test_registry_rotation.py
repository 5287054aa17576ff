"""Regression guards for the driver-window rotation machinery.

The round driver verifies only the FIRST 50 registry keys each round;
``operators._prioritized`` orders the registry so unverified keys come
first, then green keys by OLDEST verdict round (source-stale keys
ahead of untouched ones within the same round).  Verdict age outranks
staleness across rounds — the round-8 change after edit bursts twice
displaced r2-vintage verdicts out of the window (VERDICT r6 item 4 →
r7 backlog).  A silent ordering bug here means the driver re-verifies
the wrong keys and new or edited operators ship without a verdict —
so the invariants are pinned.
"""

from __future__ import annotations

from parquet_stream_writer_spark import operators as ops

WINDOW = 50


def _ranked():
    merged: dict = {}
    for mod in ops._modules():
        merged.update(mod.QUERIES)
    verdicts = ops._verdicts()
    stale = ops._source_stale_keys(merged)
    ordered = list(ops._prioritized(merged))

    def rank(k: str) -> tuple[int, int, int]:
        green, rnd = verdicts.get(k, (False, 0))
        if not green:
            return (0, 0, 0)
        return (1, rnd, 0 if k in stale else 1)

    return merged, verdicts, ordered, rank


def test_ordering_is_deterministic():
    a = list(ops.all_queries())
    b = list(ops.all_queries())
    assert a == b
    # the driver looks oracles up BY KEY (ordering is irrelevant);
    # what matters is that every query has its oracle and vice versa
    assert set(ops.all_oracles()) <= set(a)


def test_rank_is_monotone():
    """The registry order must be exactly the rank order: unverified
    keys first, then green keys by oldest verdict round with
    source-stale keys leading their round cohort — a green key sitting
    above an unverified key would burn a window slot the new key
    needs, and a fresh verdict sitting above an old one re-opens the
    r2-backlog spill."""
    _merged, _verdicts, ordered, rank = _ranked()
    ranks = [rank(k) for k in ordered]
    assert ranks == sorted(ranks), [
        (k, r) for k, r in zip(ordered, ranks) if ranks != sorted(ranks)
    ][:10]


def test_unverified_keys_land_in_the_window():
    """Every key with no green driver verdict must sit inside the
    50-key prefix — if tier 0 ever outgrows the window, this fails
    and the registry must stop growing (or the window must move)."""
    _merged, verdicts, ordered, rank = _ranked()
    tier0 = [k for k in ordered if rank(k)[0] == 0]
    assert len(tier0) <= WINDOW, (
        f"{len(tier0)} unverified keys exceed the {WINDOW}-key driver window"
    )
    window = set(ordered[:WINDOW])
    missing = [k for k in tier0 if k not in window]
    assert not missing, missing


def test_fold_advances_only_driver_attested_hashes(tmp_path):
    """ADVICE r8 (staleness laundering): the attested snapshot must
    advance a key's hash ONLY when a driver artifact verified that
    exact source — green-in-CORRECTNESS AND unchanged since the
    pending snapshot.  Red keys, unverified keys, and keys edited
    after the pending snapshot must keep their old attested hash."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    import record_query_hashes as tool

    queries = ops.all_queries()
    keys = list(queries)[:4]
    verified_ok, verified_red, unverified, edited = keys
    cur = {k: ops.query_source_hash(queries[k]) for k in keys}

    root = tmp_path
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps(
            {
                "for_round_after": 8,
                "hashes": {
                    verified_ok: cur[verified_ok],
                    verified_red: cur[verified_red],
                    unverified: cur[unverified],
                    # pending recorded a hash the CURRENT source no
                    # longer matches — an edit after the snapshot.
                    edited: "hash-at-snapshot-time",
                },
            }
        )
    )
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps(
            {
                "as_of_round": 8,
                "hashes": {k: f"old-attested-{k}" for k in keys},
            }
        )
    )
    (root / "CORRECTNESS_r09.json").write_text(
        json.dumps(
            {
                verified_ok: {"hash_match": True},
                verified_red: {"hash_match": False},
                edited: {"hash_match": True},
            }
        )
    )
    tool.fold_attested(str(root))
    out = json.loads((root / "QUERY_SOURCE_HASHES.json").read_text())
    assert out["as_of_round"] == 9
    h = out["hashes"]
    assert h[verified_ok] == cur[verified_ok], "green verdict must fold"
    assert h[verified_red] == f"old-attested-{verified_red}", "red kept stale"
    assert h[unverified] == f"old-attested-{unverified}", "unwindowed kept"
    assert h[edited] == f"old-attested-{edited}", (
        "edited-since-pending must stay stale even with a green verdict"
    )

    # A CORRECTNESS file that PREDATES the pending snapshot must not
    # fold anything (its verdicts attest older sources).
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps({"for_round_after": 9, "hashes": {verified_ok: "newer"}})
    )
    tool.fold_attested(str(root))
    out2 = json.loads((root / "QUERY_SOURCE_HASHES.json").read_text())
    assert out2["hashes"] == h, "stale-pending fold must be a no-op"


def test_oldest_verdicts_fill_the_remaining_window():
    """After the unverified keys, the window must hold exactly the
    OLDEST green verdicts: no green key outside the window may carry
    an older verdict round than any green key inside it (the
    "no key older than r3 after this round" criterion is this
    invariant applied at round 8)."""
    _merged, verdicts, ordered, rank = _ranked()
    greens = [k for k in ordered if rank(k)[0] == 1]
    inside = set(ordered[:WINDOW])
    in_rounds = [verdicts[k][1] for k in greens if k in inside]
    out_rounds = [verdicts[k][1] for k in greens if k not in inside]
    if in_rounds and out_rounds:
        assert max(in_rounds) <= min(out_rounds), (
            max(in_rounds),
            min(out_rounds),
        )


def test_fold_overdue_warning_fires_and_clears(tmp_path, capsys, monkeypatch):
    """The registry must warn (stderr, once) when a CORRECTNESS round
    newer than both the pending and attested snapshots exists — and
    stay silent once the fold has advanced the attested round."""
    import json

    root = tmp_path
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps({"for_round_after": 8, "hashes": {}})
    )
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps({"as_of_round": 8, "hashes": {}})
    )
    (root / "CORRECTNESS_r09.json").write_text("{}")

    monkeypatch.setattr(
        ops,
        "_correctness_snapshot",
        lambda: ((str(root / "CORRECTNESS_r09.json"), 0.0),),
    )
    ops._warn_if_fold_overdue._done = False
    ops._warn_if_fold_overdue(str(root))
    err = capsys.readouterr().err
    assert "--fold" in err and "CORRECTNESS_r9" in err

    # Fires once per process: a second call is silent even while due.
    ops._warn_if_fold_overdue(str(root))
    assert "--fold" not in capsys.readouterr().err

    # After the fold advances the attested round, the warning clears.
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps({"as_of_round": 9, "hashes": {}})
    )
    ops._warn_if_fold_overdue._done = False
    ops._warn_if_fold_overdue(str(root))
    assert "--fold" not in capsys.readouterr().err
    ops._warn_if_fold_overdue._done = False
