"""Randomized brute-force cross-checks for the SECOND staged pack
(operators/staged2.py): each test builds a small synthetic corpus
(fixed seeds), runs the operator through its real parquet-loading
path, and compares against an independent pure-pandas/numpy model —
covering regimes the driver corpus never reaches (revenue ties at
class boundaries, equal-count histogram seams, bursty/quiet traffic
mixes, centroid near-ties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _write(tmp_path, name: str, pdf: pd.DataFrame) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "corpus"
    d.mkdir(exist_ok=True)
    pdf = pdf.copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), d / f"{name}.parquet")
    return str(d)


@pytest.mark.parametrize("seed", [3, 77])
def test_abc_classification_matches_bruteforce(spark, tmp_path, seed):
    """ABC classes from an O(n log n) pandas cumulative model — the
    coarse price grid plants revenue TIES across the 80/95 boundaries
    so the (revenue desc, partkey asc) tie order is load-bearing."""
    from parquet_stream_writer_spark.operators.staged2 import (
        orders_abc_classification,
    )

    rng = np.random.default_rng(seed)
    n = 400
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype="int64"),
            "l_partkey": rng.integers(0, 60, n).astype("int64"),
            "l_suppkey": np.zeros(n, dtype="int64"),
            "l_linenumber": np.ones(n, dtype="int32"),
            "l_quantity": rng.integers(1, 5, n).astype("float64"),
            "l_extendedprice": rng.integers(1, 8, n) * 25.0,
            "l_discount": np.zeros(n),
            "l_tax": np.zeros(n),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": pd.Timestamp("2024-01-01") + pd.to_timedelta(0, unit="D"),
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    got = {
        (r.abc_class, r.n_parts, r.revenue_cents)
        for r in orders_abc_classification(spark, sf).collect()
    }

    cents = (
        (li.l_extendedprice * 100 + 0.5).astype("int64") * li.l_quantity.astype("int64")
    )
    rev = (
        pd.DataFrame({"k": li.l_partkey, "c": cents})
        .groupby("k", as_index=False)["c"]
        .sum()
        .sort_values(["c", "k"], ascending=[False, True], ignore_index=True)
    )
    total = int(rev.c.sum())
    cum = rev.c.cumsum()
    cls = np.where(
        cum * 100 <= total * 80, "A", np.where(cum * 100 <= total * 95, "B", "C")
    )
    want = {
        (cl, int((cls == cl).sum()), int(rev.c[cls == cl].sum()))
        for cl in np.unique(cls)
    }
    assert got == want


@pytest.mark.parametrize("seed", [11, 404])
def test_equidepth_histogram_matches_bruteforce(spark, tmp_path, seed):
    """Equi-depth buckets vs an exact pandas rank model — duplicate
    prices across bucket seams pin the (cents, orderkey) tie order."""
    from parquet_stream_writer_spark.operators.staged2 import (
        agg_histogram_equidepth,
    )

    rng = np.random.default_rng(seed)
    n = 500
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": np.zeros(n, dtype="int64"),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": rng.integers(1, 40, n) * 10.0,  # heavy duplicates
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": ["3-MEDIUM"] * n,
        }
    )
    sf = _write(tmp_path, "orders", orders)
    got = {
        (r.bucket, r.n_rows, r.min_cents, r.max_cents, r.sum_cents)
        for r in agg_histogram_equidepth(spark, sf).collect()
    }

    cents = (orders.o_totalprice * 100 + 0.5).astype("int64")
    df = pd.DataFrame({"c": cents, "k": orders.o_orderkey}).sort_values(
        ["c", "k"], ignore_index=True
    )
    df["bucket"] = ((df.index.values) * 8 / n).astype("int64")
    want = {
        (
            int(b),
            int(g.c.size),
            int(g.c.min()),
            int(g.c.max()),
            int(g.c.sum()),
        )
        for b, g in df.groupby("bucket")
    }
    assert got == want


@pytest.mark.parametrize("seed", [5, 909])
def test_burst_detection_matches_bruteforce(spark, tmp_path, seed):
    """Burst episodes vs a pure-python trailing-window model over a
    planted quiet/spike traffic mix (the driver corpus is steady, so
    the episode-merge path only fires here)."""
    from parquet_stream_writer_spark.operators.staged2 import (
        _BURST_SIGMA,
        _BURST_WINDOW,
        events_burst_detection,
    )

    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-03-01")
    for h in range(200):
        lam = 4 if (h // 30) % 2 == 0 else 4 + 30 * (h % 7 == 3)
        for _ in range(int(rng.poisson(lam))):
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + pd.Timedelta(hours=h, seconds=int(rng.integers(0, 3600))),
                    "user_id": int(rng.integers(0, 20)),
                    "event_type": "t" + str(int(rng.integers(0, 2))),
                    "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    sf = _write(tmp_path, "events", pdf)
    got = {
        (r.event_type, r.start_hour, r.end_hour, r.n_hours, r.peak_count)
        for r in events_burst_detection(spark, sf).collect()
    }

    us = pdf.ts.astype("int64") // 1000
    hours = us // 3_600_000_000
    counts = (
        pd.DataFrame({"t": pdf.event_type, "h": hours})
        .groupby(["t", "h"])
        .size()
        .reset_index(name="c")
    )
    want = set()
    for t, g in counts.groupby("t"):
        g = g.sort_values("h", ignore_index=True)
        bursty = []
        for i in range(len(g)):
            lo = max(0, i - _BURST_WINDOW)
            win = g.c[lo:i]
            if len(win) == 0:
                continue
            bs, bn, c = int(win.sum()), len(win), int(g.c[i])
            excess = c * bn - bs
            if excess > 0 and excess * excess > _BURST_SIGMA**2 * bs * bn:
                bursty.append((int(g.h[i]), c))
        # merge consecutive hours into episodes
        ep = []
        for h, c in bursty:
            if ep and h == ep[-1][1] + 1:
                s, _e, n, p = ep.pop()
                ep.append((s, h, n + 1, max(p, c)))
            else:
                ep.append((h, h, 1, c))
        want |= {(t, s, e, n, p) for s, e, n, p in ep}
    assert got == want and len(got) > 0


@pytest.mark.parametrize("seed", [2, 31])
def test_growth_accounting_matches_bruteforce(spark, tmp_path, seed):
    from parquet_stream_writer_spark.operators.staged2 import (
        _GROWTH_GAP_DAYS,
        events_growth_accounting,
    )

    rng = np.random.default_rng(seed)
    n = 1500
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": base + pd.to_timedelta(rng.integers(0, 40 * 1440, n), unit="min"),
            "user_id": rng.integers(0, 25, n).astype("int64"),
            "event_type": ["view"] * n,
            "value": np.ones(n),
            "props": ["{}"] * n,
        }
    )
    sf = _write(tmp_path, "events", pdf)
    got = {
        (r.day, r.n_active, r.n_new, r.n_returning, r.n_resurrected)
        for r in events_growth_accounting(spark, sf).collect()
    }

    us = pdf.ts.astype("int64") // 1000
    days = us // 86_400_000_000
    ud = sorted(set(zip(pdf.user_id, days)))
    last: dict = {}
    agg: dict = {}
    for u, d in ud:  # sorted by (user, day) -> per-user chronological
        prev = last.get(u)
        st = (
            "new"
            if prev is None
            else ("resurrected" if d - prev > _GROWTH_GAP_DAYS else "returning")
        )
        last[u] = d
        a = agg.setdefault(d, [0, 0, 0, 0])
        a[0] += 1
        a[{"new": 1, "returning": 2, "resurrected": 3}[st]] += 1
    want = {(d, a[0], a[1], a[2], a[3]) for d, a in agg.items()}
    assert got == want


@pytest.mark.parametrize("seed", [13, 101])
def test_centroid_classifier_matches_numpy(spark, tmp_path, seed):
    """Confusion matrix vs a numpy Rocchio model built from the SAME
    1e6-quantized components (planted near-coincident centroids force
    close calls; the tie-break is the smaller label)."""
    from parquet_stream_writer_spark.operators.staged2 import (
        similarity_centroid_classifier,
    )

    rng = np.random.default_rng(seed)
    k, d, n = 4, 8, 160
    centers = rng.normal(0, 1, (k, d))
    centers[1] = centers[0] + 0.05 * rng.normal(0, 1, d)  # near-coincident pair
    labels = rng.integers(0, k, n)
    vecs = centers[labels] + 0.3 * rng.normal(0, 1, (n, d))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [v.astype("float32") for v in vecs],
            "label": labels.astype("int32"),
        }
    )
    sf = _write(tmp_path, "embeddings", pdf)
    got = {
        (r.label, r.predicted, r.n)
        for r in similarity_centroid_classifier(spark, sf).collect()
    }

    v6 = np.floor(vecs.astype("float32").astype("float64") * 1e6 + 0.5).astype(
        "int64"
    )
    sums = np.zeros((k, d), dtype="int64")
    for lab in range(k):
        sums[lab] = v6[labels == lab].sum(axis=0)
    norms = np.sqrt((sums.astype("float64") ** 2).sum(axis=1))
    scores = v6 @ sums.T / norms  # (n, k)
    pred = np.argmax(scores, axis=1)  # argmax -> first (smallest label) on ties
    want = (
        pd.DataFrame({"label": labels, "predicted": pred})
        .groupby(["label", "predicted"])
        .size()
        .reset_index(name="n")
    )
    assert got == {(int(r.label), int(r.predicted), int(r.n)) for r in want.itertuples()}


@pytest.mark.parametrize("seed", [21, 55])
def test_type_share_drift_matches_bruteforce(spark, tmp_path, seed):
    """L1 drift vs an exact-Fraction model — integer cross products
    must equal the rational Σ|c/N − c'/N'| to the 6-dp floor."""
    from fractions import Fraction

    from parquet_stream_writer_spark.operators.staged2 import (
        events_type_share_drift,
    )

    rng = np.random.default_rng(seed)
    n = 2000
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": base + pd.to_timedelta(rng.integers(0, 5 * 7 * 1440, n), unit="min"),
            "user_id": rng.integers(0, 50, n).astype("int64"),
            "event_type": rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2]),
            "value": np.ones(n),
            "props": ["{}"] * n,
        }
    )
    sf = _write(tmp_path, "events", pdf)
    got = {
        (r.week, r.n_events, r.n_prev_events, r.l1_drift)
        for r in events_type_share_drift(spark, sf).collect()
    }

    us = pdf.ts.astype("int64") // 1000
    weeks = us // 604_800_000_000
    counts = (
        pd.DataFrame({"w": weeks, "t": pdf.event_type})
        .groupby(["w", "t"])
        .size()
        .reset_index(name="c")
    )
    all_w = sorted(counts.w.unique())
    all_t = sorted(counts.t.unique())
    grid = {
        (w, t): 0 for w in all_w for t in all_t
    }
    for r in counts.itertuples():
        grid[(r.w, r.t)] = int(r.c)
    want = set()
    for prev, cur in zip(all_w, all_w[1:]):
        np_, nc = sum(grid[(prev, t)] for t in all_t), sum(
            grid[(cur, t)] for t in all_t
        )
        l1 = sum(
            abs(Fraction(grid[(cur, t)], nc) - Fraction(grid[(prev, t)], np_))
            for t in all_t
        )
        l1_6dp = float(int(l1 * 10**6 + Fraction(1, 2)) / 10**6)
        want.add((cur, nc, np_, l1_6dp))
    assert got == want


@pytest.mark.parametrize("seed", [8, 88])
def test_power_user_share_matches_bruteforce(spark, tmp_path, seed):
    """Top-decile-with-ties share vs a sorted-counts model; uniform
    per-user counts plant massive ties AT the decile threshold."""
    from parquet_stream_writer_spark.operators.staged2 import (
        events_power_user_share,
    )

    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for u in range(37):
        c = int(rng.choice([1, 2, 2, 3, 3, 3, 9]))  # ties everywhere
        for _ in range(c):
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + pd.Timedelta(minutes=eid),
                    "user_id": u,
                    "event_type": "t",
                    "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    sf = _write(tmp_path, "events", pdf)
    row = events_power_user_share(spark, sf).collect()[0]

    counts = pdf.groupby("user_id").size().sort_values(ascending=False)
    n_users = len(counts)
    k = -(-n_users // 10)  # ceil
    thr = int(counts.iloc[k - 1])
    top = counts[counts >= thr]
    assert row.n_users == n_users
    assert row.threshold_count == thr
    assert row.n_top_users == len(top)
    assert row.top_events == int(top.sum())
    assert abs(row.top_share - int(top.sum()) / int(counts.sum())) < 1e-6


@pytest.mark.parametrize("seed", [5, 211])
def test_duplicate_invoice_audit_matches_bruteforce(spark, tmp_path, seed):
    """Duplicate-invoice pairs from an O(n^2) pandas model — the
    coarse cent grid plants many (custkey, cents) collisions and the
    date grid straddles the 7-day boundary exactly (gaps of 7 days
    match, 8 days don't)."""
    from parquet_stream_writer_spark.operators.staged2 import (
        orders_duplicate_invoice_audit,
    )

    rng = np.random.default_rng(seed)
    n = 300
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": rng.integers(0, 12, n).astype("int64"),
            "o_totalprice": rng.integers(1, 6, n) * 100.5,
            "o_orderpriority": rng.choice(["1-URGENT", "3-MEDIUM"], n),
            "o_orderdate": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 16, n), unit="D"),
        }
    )
    sf = _write(tmp_path, "orders", orders)
    got = {
        (r.priority, r.n_pairs, r.n_flagged_first, r.at_risk_cents)
        for r in orders_duplicate_invoice_audit(spark, sf).collect()
    }

    cents = (orders.o_totalprice * 100 + 0.5).astype("int64")
    day = (orders.o_orderdate - pd.Timestamp("1970-01-01")).dt.days
    rows = []
    for i in range(n):
        for j in range(n):
            if (
                orders.o_orderkey[i] < orders.o_orderkey[j]
                and orders.o_custkey[i] == orders.o_custkey[j]
                and cents[i] == cents[j]
                and abs(int(day[i]) - int(day[j])) <= 7
            ):
                rows.append(
                    (orders.o_orderpriority[i], orders.o_orderkey[i], int(cents[i]))
                )
    pairs = pd.DataFrame(rows, columns=["priority", "k1", "cents"])
    want = {
        (
            p,
            len(g),
            g.k1.nunique(),
            int(g.cents.sum()),
        )
        for p, g in pairs.groupby("priority")
    }
    assert got == want and got  # non-vacuous: collisions must exist


@pytest.mark.parametrize("seed", [13, 909])
def test_discount_effectiveness_matches_bruteforce(spark, tmp_path, seed):
    """Discount-band rollup vs a pandas model — off-grid discounts
    (e.g. 0.034) pin the floor(+0.5) banding, and the exact
    cent·basis-point descaling is checked against integer math."""
    from parquet_stream_writer_spark.operators.staged2 import (
        lineitem_discount_effectiveness,
    )

    rng = np.random.default_rng(seed)
    n = 500
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype="int64"),
            "l_quantity": rng.integers(1, 50, n).astype("float64"),
            "l_extendedprice": rng.integers(100, 99999, n) / 100.0,
            "l_discount": rng.choice(
                [0.0, 0.01, 0.034, 0.05, 0.055, 0.1], n
            ),
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    got = {
        (
            r.discount_pct,
            r.n_lines,
            float(r.mean_quantity),
            r.gross_cents,
            r.discount_cents,
        )
        for r in lineitem_discount_effectiveness(spark, sf).collect()
    }

    pdf = pd.DataFrame(
        {
            "band": np.floor(li.l_discount * 100 + 0.5).astype("int32"),
            "qty": li.l_quantity.astype("int64"),
            "cents": np.floor(li.l_extendedprice * 100 + 0.5).astype("int64"),
            "bps": np.floor(li.l_discount * 10000 + 0.5).astype("int64"),
        }
    )
    pdf["disc_scaled"] = pdf.cents * pdf.bps
    want = set()
    for band, g in pdf.groupby("band"):
        mean_q = np.floor(g.qty.sum() / len(g) * 10000 + 0.5) / 10000.0
        want.add(
            (
                int(band),
                len(g),
                float(mean_q),
                int(g.cents.sum()),
                int(np.floor(g.disc_scaled.sum() / 10000)),
            )
        )
    assert got == want


@pytest.mark.parametrize("seed", [21, 555])
def test_brand_price_dispersion_matches_numpy(spark, tmp_path, seed):
    """Quartile dispersion vs numpy's linear-interpolated percentiles
    over integer cents — brand sizes are chosen so (n-1)*0.25 lands on
    every fractional phase (0, .25, .5, .75), and duplicated prices
    plant ties at the quartile seams."""
    from parquet_stream_writer_spark.operators.staged2 import (
        part_brand_price_dispersion,
    )

    rng = np.random.default_rng(seed)
    frames = []
    pk = 0
    for b, size in enumerate([4, 5, 6, 7, 9, 16, 40]):
        prices = rng.integers(100, 2000, size) / 4.0  # coarse grid → ties
        frames.append(
            pd.DataFrame(
                {
                    "p_partkey": np.arange(pk, pk + size, dtype="int64"),
                    "p_brand": f"Brand#{b:02d}",
                    "p_retailprice": prices,
                }
            )
        )
        pk += size
    part = pd.concat(frames, ignore_index=True)
    sf = _write(tmp_path, "part", part)
    got = {
        (
            r.p_brand,
            r.n,
            r.min_cents,
            r.max_cents,
            float(r.q1_cents),
            float(r.q3_cents),
            float(r.quartile_dispersion),
        )
        for r in part_brand_price_dispersion(spark, sf).collect()
    }

    def pround(x, k):
        return np.floor(x * 10**k + 0.5) / 10**k

    want = set()
    for b, g in part.groupby("p_brand"):
        cents = np.sort(np.floor(g.p_retailprice.values * 100 + 0.5).astype("int64"))
        q1 = np.percentile(cents, 25, method="linear")
        q3 = np.percentile(cents, 75, method="linear")
        want.add(
            (
                b,
                len(cents),
                int(cents.min()),
                int(cents.max()),
                float(pround(q1, 2)),
                float(pround(q3, 2)),
                float(pround((q3 - q1) / (q3 + q1), 6)),
            )
        )
    assert got == want


@pytest.mark.parametrize("seed", [8, 4096])
def test_row_size_profile_matches_bruteforce(spark, tmp_path, seed, monkeypatch):
    """Row-size profile vs exact python byte accounting — documents
    carry multi-byte UTF-8 text (octet length != char length), and the
    partition target is monkeypatched small so the ceil-division
    boundary (total % target == 0 vs != 0) is actually exercised."""
    from parquet_stream_writer_spark.operators import staged2

    monkeypatch.setattr(staged2, "_ROWSIZE_TARGET", 1000)

    rng = np.random.default_rng(seed)
    n = 60
    texts = [
        ("héllo wörld " * int(rng.integers(1, 9))) + ("日本語" * int(rng.integers(0, 4)))
        for _ in range(n)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": texts,
            "lang": rng.choice(["en", "de", "ja"], n),
            "source": rng.choice(["web", "книга"], n),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_orderstatus": rng.choice(["O", "F"], n),
            "o_orderpriority": rng.choice(["1-URGENT", "5-LOW"], n),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype="int64"),
            "l_returnflag": rng.choice(["A", "N", "R"], n),
            "l_linestatus": rng.choice(["O", "F"], n),
        }
    )
    sf = _write(tmp_path, "documents", docs)
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    got = {
        (r.table_name, r.n_rows, r.total_bytes, r.bytes_per_row, r.target_partitions)
        for r in staged2.pipeline_row_size_profile(spark, sf).collect()
    }

    def blen(s):
        return len(s.encode("utf-8"))

    totals = {
        "documents": sum(
            blen(t) + blen(g) + blen(s) + 16
            for t, g, s in zip(docs.text, docs.lang, docs.source)
        ),
        "orders": sum(
            blen(a) + blen(b) + 32
            for a, b in zip(orders.o_orderstatus, orders.o_orderpriority)
        ),
        "lineitem": sum(
            blen(a) + blen(b) + 76
            for a, b in zip(li.l_returnflag, li.l_linestatus)
        ),
    }
    want = {
        (
            t,
            n,
            total,
            int(np.floor(total / n)),
            (total + 999) // 1000,
        )
        for t, total in totals.items()
    }
    assert got == want
