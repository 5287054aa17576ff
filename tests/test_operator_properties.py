"""Randomized cross-checks for the batch-5 operators: each test
builds a small synthetic corpus (fixed seeds, so failures reproduce),
runs the operator through its real parquet-loading path, and compares
against an independent brute-force model — covering regimes the
driver corpus never reaches (dominance ties, duplicate timestamps,
survival hitting zero, all-censored groups).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest


def _write(tmp_path, name: str, pdf: pd.DataFrame) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    # µs precision: the session reads parquet TIMESTAMP(NANOS) as
    # bigint (nanosAsLong, an events-table accommodation), which would
    # break date arithmetic on synthetic non-events tables.
    pdf = pdf.copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), d / f"{name}.parquet")
    return str(d)


@pytest.mark.parametrize("seed", [0, 7, 1234])
def test_skyline_matches_bruteforce_dominance(spark, tmp_path, seed):
    from parquet_stream_writer_spark.operators.relational import agg_skyline_pareto

    rng = np.random.default_rng(seed)
    n = 300
    # Coarse grids force ties in BOTH dimensions and duplicate points.
    sizes = rng.integers(1, 12, n)
    prices = np.floor(rng.uniform(10, 50, n) * 4) / 4.0
    pdf = pd.DataFrame(
        {"p_partkey": np.arange(n, dtype="int64"),
         "p_size": sizes.astype("int32"),
         "p_retailprice": prices}
    )
    sf = _write(tmp_path, "part", pdf)
    got = {
        (r.p_size, r.price, r.n_parts, r.min_partkey)
        for r in agg_skyline_pareto(spark, sf).collect()
    }

    # Brute force: O(n^2) dominance, then group frontier by size.
    pts = list(zip(pdf.p_partkey, pdf.p_size, pdf.p_retailprice))
    frontier = [
        (k, s, p)
        for k, s, p in pts
        if not any(
            (s2 >= s and p2 <= p and (s2 > s or p2 < p)) for _, s2, p2 in pts
        )
    ]
    want = set()
    for s in {s for _, s, _ in frontier}:
        grp = [(k, p) for k, s2, p in frontier if s2 == s]
        pmin = min(p for _, p in grp)
        want.add(
            (
                s,
                np.floor(pmin * 100 + 0.5) / 100.0,
                len(grp),
                min(k for k, _ in grp),
            )
        )
    assert got == want


@pytest.mark.parametrize("seed", [1, 42])
def test_concurrency_peak_matches_bruteforce_sweep(spark, tmp_path, seed):
    from parquet_stream_writer_spark.operators.streaming_batch import (
        _CONC_WINDOW_MIN,
        events_concurrency_peak,
    )

    rng = np.random.default_rng(seed)
    n = 400
    base = dt.datetime(2024, 3, 1)
    # Bursty arrivals across ~3 days, with DUPLICATE timestamps and
    # events exactly 30 minutes apart (end-meets-start ties).
    offsets = rng.integers(0, 3 * 24 * 60, n)
    offsets = np.concatenate([offsets, offsets[:40]])  # exact duplicates
    offsets = np.concatenate([offsets, offsets[:20] + _CONC_WINDOW_MIN])
    ts = [base + dt.timedelta(minutes=int(m)) for m in offsets]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(ts), dtype="int64"),
            "ts": pd.to_datetime(ts),
            "user_id": np.zeros(len(ts), dtype="int64"),
            "event_type": ["click"] * len(ts),
            "value": np.ones(len(ts)),
            "props": ["{}"] * len(ts),
        }
    )
    sf = _write(tmp_path, "events", pdf)
    got = {
        (r.day, r.n_starts, r.n_ends, r.peak_concurrency)
        for r in events_concurrency_peak(spark, sf).collect()
    }

    # Brute force: sweep boundaries in (t, delta) order; track level and
    # per-day max, seeding each day with its carry-in level.
    bounds = [(t, 1) for t in ts] + [
        (t + dt.timedelta(minutes=_CONC_WINDOW_MIN), -1) for t in ts
    ]
    bounds.sort(key=lambda x: (x[0], x[1]))
    level = 0
    days: dict = {}
    prev_day = None
    for t, d in bounds:
        day = t.replace(hour=0, minute=0, second=0, microsecond=0)
        if day not in days:
            days[day] = {"starts": 0, "ends": 0, "peak": level}
        level += d
        rec = days[day]
        rec["starts" if d == 1 else "ends"] += 1
        rec["peak"] = max(rec["peak"], level)
        prev_day = day
    want = {
        (pd.Timestamp(day), rec["starts"], rec["ends"], rec["peak"])
        for day, rec in days.items()
    }
    assert got == want


def test_km_survival_hits_zero_and_censors(spark, tmp_path):
    """Hand-built corpus exercising the regimes sf data never hits:
    a group whose survivors all ship the same day (survival must hit
    EXACTLY zero via the dead flag, not exp(ln(0))), a group with
    censored orders, and ties."""
    from parquet_stream_writer_spark.operators.relational import (
        _KM_CENSOR_DAYS,
        orders_survival_kaplan_meier,
    )

    day0 = dt.datetime(2024, 1, 1)
    rows = []
    # group A: 4 orders, all ship on day 3 -> S(3) = 0 exactly.
    for i in range(4):
        rows.append(("A", i, 3))
    # group B: ships on days 1,1,5; one censored (beyond horizon).
    rows.append(("B", 10, 1))
    rows.append(("B", 11, 1))
    rows.append(("B", 12, 5))
    rows.append(("B", 13, _KM_CENSOR_DAYS + 30))
    orders = pd.DataFrame(
        {
            "o_orderkey": [k for _, k, _ in rows],
            "o_orderdate": [pd.Timestamp(day0)] * len(rows),
            "o_orderpriority": [g for g, _, _ in rows],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [k for _, k, _ in rows],
            "l_shipdate": [pd.Timestamp(day0 + dt.timedelta(days=t)) for _, _, t in rows],
        }
    )
    sf = _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", lineitem)

    out = {
        (r.o_orderpriority, r.t_day): (
            r.n_at_risk,
            r.n_events,
            r.n_censored,
            r.survival,
        )
        for r in orders_survival_kaplan_meier(spark, sf).collect()
    }
    # group A: one cell at t=3 with d=4=n -> survival exactly 0.0
    assert out[("A", 3)] == (4, 4, 0, 0.0)
    # group B: S(1) = 1 - 2/4 = 0.5; S(5) = 0.5 * (1 - 1/2) = 0.25;
    # censored cell at the horizon keeps survival 0.25.
    assert out[("B", 1)] == (4, 2, 0, 0.5)
    assert out[("B", 5)] == (2, 1, 0, 0.25)
    assert out[("B", _KM_CENSOR_DAYS)] == (1, 0, 1, 0.25)
