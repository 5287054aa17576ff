"""Regression guards for the driver-window rotation machinery.

The round driver verifies only the FIRST 50 registry keys each round;
``operators._prioritized`` orders the registry so unverified keys,
then stale-edited keys (oldest verdict first), then untouched green
keys (oldest verdict first) fill that window.  A silent ordering bug
here means the driver re-verifies the wrong keys and new or edited
operators ship without a verdict — so the invariants are pinned.
"""

from __future__ import annotations

from parquet_stream_writer_spark import operators as ops

WINDOW = 50


def _tiers():
    merged: dict = {}
    for mod in ops._modules():
        merged.update(mod.QUERIES)
    verdicts = ops._verdicts()
    stale = ops._source_stale_keys(merged)
    ordered = list(ops._prioritized(merged))

    def tier(k: str) -> int:
        green, _rnd = verdicts.get(k, (False, 0))
        if not green:
            return 0
        return 1 if k in stale else 2

    return merged, verdicts, ordered, tier


def test_ordering_is_deterministic():
    a = list(ops.all_queries())
    b = list(ops.all_queries())
    assert a == b
    # the driver looks oracles up BY KEY (ordering is irrelevant);
    # what matters is that every query has its oracle and vice versa
    assert set(ops.all_oracles()) <= set(a)


def test_tiers_are_monotone():
    """No later-tier key may precede an earlier-tier key — a tier-2
    green key sitting above an unverified key would burn a window
    slot the new key needs."""
    _merged, _verdicts, ordered, tier = _tiers()
    tiers = [tier(k) for k in ordered]
    assert tiers == sorted(tiers), [
        (k, t) for k, t in zip(ordered, tiers) if tiers != sorted(tiers)
    ][:10]


def test_unverified_keys_land_in_the_window():
    """Every key with no green driver verdict must sit inside the
    50-key prefix — if tier 0 ever outgrows the window, this fails
    and the registry must stop growing (or the window must move)."""
    _merged, verdicts, ordered, tier = _tiers()
    tier0 = [k for k in ordered if tier(k) == 0]
    assert len(tier0) <= WINDOW, (
        f"{len(tier0)} unverified keys exceed the {WINDOW}-key driver window"
    )
    window = set(ordered[:WINDOW])
    missing = [k for k in tier0 if k not in window]
    assert not missing, missing


def test_green_tiers_ordered_by_verdict_age():
    """Within tiers 1 and 2, older verdicts must come first — the
    verdict-age rotation that retires stale rounds."""
    _merged, verdicts, ordered, tier = _tiers()
    for want_tier in (1, 2):
        rounds = [verdicts[k][1] for k in ordered if tier(k) == want_tier]
        assert rounds == sorted(rounds), (want_tier, rounds[:20])
