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
