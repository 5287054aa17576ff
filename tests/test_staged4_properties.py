"""Randomized brute-force cross-checks for the FOURTH staged pack
(operators/staged4.py): each test builds a small synthetic corpus
(fixed seeds), runs the operator through its real parquet-loading
path, and compares against an independent pure-pandas/numpy model —
covering regimes the driver corpus never reaches (band boundaries,
zero-variance brands, single-user lifetimes, planted sign structure,
anisotropic cones).
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


@pytest.mark.parametrize("seed", [11, 503])
def test_hamming_topk_matches_numpy_popcount(spark, tmp_path, seed):
    """Sign-code Hamming vs a numpy popcount model, with one planted
    exact-duplicate sign pattern per probe (distance 0 must rank
    first, tie-broken by id)."""
    from parquet_stream_writer_spark.operators.staged4 import (
        _HAM_PROBE_STRIDE,
        _HAM_TOPK,
        similarity_hamming_topk,
    )

    rng = np.random.default_rng(seed)
    d = 64
    n = 3 * _HAM_PROBE_STRIDE + 1  # 4 probes (0, 101, 202, 303)
    vecs = rng.normal(size=(n, d)).astype("float32")
    # Plant: vector qid+1 copies qid's SIGN pattern exactly.
    for qid in range(0, n, _HAM_PROBE_STRIDE):
        if qid + 1 < n:
            vecs[qid + 1] = np.abs(vecs[qid + 1]) * np.sign(vecs[qid])
            vecs[qid + 1][vecs[qid] == 0] = 0.0
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [v for v in vecs],
            "label": np.zeros(n, dtype="int32"),
        }
    )
    sf = _write(tmp_path, "embeddings", pdf)
    got = [
        (r.qid, r.rk, r.nid, r.hamming)
        for r in similarity_hamming_topk(spark, sf).collect()
    ]

    signs = vecs >= 0.0
    model = []
    for qid in range(0, n, _HAM_PROBE_STRIDE):
        dists = np.count_nonzero(signs != signs[qid], axis=1)
        order = sorted(
            (int(dists[i]), i) for i in range(n) if i != qid
        )[:_HAM_TOPK]
        for rk, (dist, nid) in enumerate(order, start=1):
            model.append((qid, rk, nid, dist))
    assert got == model
    # the planted sign-copy is distance 0 and ranks first
    for qid in range(0, n - 1, _HAM_PROBE_STRIDE):
        row = next(r for r in got if r[0] == qid and r[1] == 1)
        assert row[2] == qid + 1 and row[3] == 0


@pytest.mark.parametrize("seed", [3, 77])
def test_isotropy_audit_matches_bruteforce_pairwise(spark, tmp_path, seed):
    """The closed-form mean pairwise cosine must agree with the brute
    O(n²) average over the quantized unit vectors — including an
    anisotropic planted label (all vectors in a tight cone → mean_cos
    near 1) and an isotropic one (near 0)."""
    from parquet_stream_writer_spark.operators.staged4 import (
        embedding_isotropy_audit,
    )

    rng = np.random.default_rng(seed)
    d, rows = 16, []
    base = rng.normal(size=d)
    vid = 0
    for _ in range(12):  # label 0: tight cone around base
        v = base + rng.normal(size=d) * 0.05
        rows.append((vid, v.astype("float32"), 0))
        vid += 1
    for _ in range(15):  # label 1: isotropic
        rows.append((vid, rng.normal(size=d).astype("float32"), 1))
        vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = _write(tmp_path, "embeddings", pdf)
    got = {
        r.label: float(r.mean_cos)
        for r in embedding_isotropy_audit(spark, sf).collect()
    }

    for label in (0, 1):
        vecs = np.stack(
            [np.asarray(v, dtype="float64") for v, l in
             zip(pdf.embedding, pdf.label) if l == label]
        )
        u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        q = np.floor(u * 1_000_000 + 0.5)  # the quantized convention
        n = len(q)
        ss = (q.sum(axis=0) ** 2).sum()
        selfsum = (q * q).sum()
        expect = (ss - selfsum) / (selfsum / n * n * (n - 1))
        expect = np.floor(expect * 1e6 + 0.5) / 1e6
        assert got[label] == pytest.approx(expect, abs=2e-6)
    assert got[0] > 0.9 and abs(got[1]) < 0.35


def test_oov_coverage_matches_pandas_model(spark, tmp_path):
    """Coverage at each K vs a pandas frequency model, on a corpus
    with a deliberately skewed Zipf-ish token mix and a vocab smaller
    than the largest K (coverage must saturate at 1.0)."""
    from parquet_stream_writer_spark.operators.staged4 import (
        _COVERAGE_KS,
        text_oov_coverage,
    )

    words = [f"w{i}" for i in range(20)]
    docs = []
    for i in range(40):
        toks = []
        for j, w in enumerate(words):
            toks.extend([w] * max(0, 40 - 2 * j - (i % 3)))
        docs.append(" ".join(toks))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype="int64"),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    sf = _write(tmp_path, "documents", pdf)
    got = {
        int(r.k): (int(r.covered), float(r.coverage))
        for r in text_oov_coverage(spark, sf).collect()
    }

    freq = pd.Series(
        " ".join(docs).split()
    ).value_counts().sort_values(ascending=False)
    # deterministic tie-break: count desc, token asc
    freq = freq.reset_index()
    freq.columns = ["tok", "cnt"]
    freq = freq.sort_values(["cnt", "tok"], ascending=[False, True])
    total = int(freq.cnt.sum())
    for k in _COVERAGE_KS:
        covered = int(freq.cnt.head(k).sum())
        assert got[k][0] == covered
        assert got[k][1] == pytest.approx(
            np.floor(covered / total * 1e6 + 0.5) / 1e6, abs=1e-9
        )
    assert got[max(_COVERAGE_KS)][1] == 1.0  # vocab(20) < 128: saturates


def test_customer_migration_band_boundaries(spark, tmp_path):
    """Band routing at EXACT band-edge cents: a customer whose spend
    lands exactly on an edge must route to the upper band (strict <)
    in both engines, and single-period customers are excluded."""
    from parquet_stream_writer_spark.operators.staged4 import (
        _MIGRATION_BANDS,
        orders_customer_migration,
    )

    lo, mid, hi = _MIGRATION_BANDS
    t1, t2 = pd.Timestamp("1995-06-01"), pd.Timestamp("1997-06-01")
    rows = [
        # cust 1: exactly lo cents in p1 (→ 'M'), lo-1 in p2 (→ 'S')
        (1, 1, "F", lo / 100.0, t1, "1-URGENT"),
        (2, 1, "F", (lo - 1) / 100.0, t2, "1-URGENT"),
        # cust 2: exactly mid in p1 (→ 'L'), exactly hi in p2 (→ 'XL')
        (3, 2, "F", mid / 100.0, t1, "1-URGENT"),
        (4, 2, "F", hi / 100.0, t2, "1-URGENT"),
        # cust 3: p1 only — excluded
        (5, 3, "F", 500.0, t1, "1-URGENT"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    sf = _write(tmp_path, "orders", pdf)
    got = {
        (r.band_from, r.band_to): r.n_customers
        for r in orders_customer_migration(spark, sf).collect()
    }
    assert got == {("M", "S"): 1, ("L", "XL"): 1}


def test_user_lifetime_nearest_rank_percentiles(spark, tmp_path):
    """Nearest-rank percentiles over a crafted span distribution:
    5 users with spans [0, 1, 2, 10, 100] days → p50 = 3rd value (2),
    p90 = 5th value (100); ceil boundaries exercised exactly."""
    from parquet_stream_writer_spark.operators.staged4 import (
        events_user_lifetime,
    )

    base = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    for uid, span in enumerate([0, 1, 2, 10, 100]):
        rows.append((eid, base, uid, "view", 1.0, "{}")); eid += 1
        rows.append(
            (eid, base + pd.Timedelta(days=span), uid, "click", 1.0, "{}")
        ); eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", pdf)
    row = events_user_lifetime(spark, sf).collect()[0]
    assert row.n_users == 5
    assert row.p50_span_days == 2  # ceil(0.5*5)=3rd smallest
    assert row.p90_span_days == 100  # ceil(0.9*5)=5th smallest
    assert float(row.mean_span_days) == pytest.approx(22.6)
    assert float(row.mean_events_per_user) == 2.0


def test_price_elasticity_recovers_planted_slope(spark, tmp_path):
    """A brand with EXACT linear quantity response y = 3x + 2 must
    report slope 3.0; a zero-discount-variance brand must report
    null."""
    from parquet_stream_writer_spark.operators.staged4 import (
        orders_price_elasticity,
    )

    li_rows, part_rows = [], []
    part_rows.append((1, "p1", "BRAND_LIN", "T", 1, 10.0))
    part_rows.append((2, "p2", "BRAND_FLAT", "T", 1, 10.0))
    k = 0
    for x in range(0, 11):  # discounts 0..10 points
        li_rows.append(
            (k, 1, 1, 1, float(3 * x + 2), 100.0, x / 100.0, 0.0,
             "N", "O", pd.Timestamp("1995-01-01"))
        )
        k += 1
    for _ in range(5):  # flat brand: every sale at 5% discount
        li_rows.append(
            (k, 2, 1, 1, 7.0, 100.0, 0.05, 0.0, "N", "O",
             pd.Timestamp("1995-01-01"))
        )
        k += 1
    li = pd.DataFrame(
        li_rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    part = pd.DataFrame(
        part_rows,
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
    )
    sf = _write(tmp_path, "lineitem", li)
    _write(tmp_path, "part", part)
    got = {
        r.p_brand: r.qty_per_discount_pt
        for r in orders_price_elasticity(spark, sf).collect()
    }
    assert got["BRAND_LIN"] == pytest.approx(3.0, abs=1e-9)
    assert got["BRAND_FLAT"] is None


@pytest.mark.parametrize("seed", [5])
def test_dedup_aware_ess_matches_bruteforce(spark, tmp_path, seed):
    """ESS and weighted shares vs a pandas model on a corpus with one
    big near-dup cluster concentrated in a single source — that
    source's weighted share must collapse toward its unique content."""
    from parquet_stream_writer_spark.operators.dedup import clear_dedup_memo
    from parquet_stream_writer_spark.operators.staged4 import (
        sample_dedup_aware,
    )

    rows = []
    # source A: a 6-way near-dup cluster + 2 unique docs
    base = "shared shingle content block alpha " * 12
    for i in range(6):
        rows.append((i, base + ("tail " * i), "A", "en"))
    rows.append((6, "completely unique a-doc one with own words", "A", "en"))
    rows.append((7, "another unique a-doc with different words", "A", "en"))
    # source B: 8 unique docs
    for i in range(8):
        rows.append(
            (8 + i, f"unique b content {i} nothing shared here {i*13}", "B", "en")
        )
    pdf = pd.DataFrame(
        [(d, t, l, s) for d, t, s, l in rows],
        columns=["doc_id", "text", "lang", "source"],
    )
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    sf = _write(tmp_path, "documents", pdf)
    clear_dedup_memo()
    got = {
        r.source: (r.n_docs, float(r.weighted_share), float(r.ess))
        for r in sample_dedup_aware(spark, sf).collect()
    }

    # model: cluster of 6 in A → weights 1e6//6 each; all else 1e6
    w = {i: 1_000_000 // 6 for i in range(6)}
    for i in range(6, 16):
        w[i] = 1_000_000
    for src, ids in (("A", range(0, 8)), ("B", range(8, 16))):
        wsum = sum(w[i] for i in ids)
        wsq = sum(w[i] ** 2 for i in ids)
        tot_w = sum(w.values())
        assert got[src][0] == len(list(ids))
        assert got[src][1] == pytest.approx(
            np.floor(wsum / tot_w * 1e6 + 0.5) / 1e6, abs=1e-9
        )
        assert got[src][2] == pytest.approx(
            np.floor(wsum * wsum / wsq * 100 + 0.5) / 100, abs=1e-9
        )
    # the 6-way cluster devalues A: B carries more weighted share
    assert got["B"][1] > got["A"][1]


def test_seasonal_residual_anomaly_respects_dow_baseline(spark, tmp_path):
    """A type that is ALWAYS high on Mondays must show zero anomalies
    (the Monday baseline absorbs it), while one isolated mid-week
    spike on an otherwise-flat type must be flagged — the exact
    distinction the unadjusted z-score alarms miss."""
    from parquet_stream_writer_spark.operators.staged4 import (
        events_seasonal_residual_anomaly,
    )

    rows, eid = [], 0
    base = pd.Timestamp("2024-01-01")  # a Monday

    def day_events(day_idx, etype, count):
        nonlocal eid
        for _ in range(count):
            rows.append(
                (eid, base + pd.Timedelta(days=day_idx, seconds=eid % 3600),
                 eid % 5, etype, 1.0, "{}")
            )
            eid += 1

    for wk in range(6):
        for d in range(7):
            # "weekly": every Monday 30 events, other days 5 — periodic
            day_events(wk * 7 + d, "weekly", 30 if d == 0 else 5)
            # "flat": always 6, except ONE Wednesday spike of 40
            day_events(wk * 7 + d, "flat",
                       40 if (wk == 3 and d == 2) else 6)
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", ev)
    got = {
        r.event_type: (r.n_anomalies, float(r.max_dow_ratio))
        for r in events_seasonal_residual_anomaly(spark, sf).collect()
    }
    assert got["weekly"][0] == 0, "periodic Monday peak must not alarm"
    assert got["flat"][0] == 1, "the one Wednesday spike must alarm"
    # flat Wednesdays: counts [6,6,6,40,6,6] → mean 70/6; 40/(70/6)≈3.43
    assert got["flat"][1] == pytest.approx(
        np.floor(40 * 6 / 70 * 1e6 + 0.5) / 1e6, abs=1e-9
    )


def test_norm_length_correlation_recovers_planted_line(spark, tmp_path):
    """Vectors built with norm exactly proportional to doc length must
    report correlation ≈ 1; shuffled norms must not."""
    from parquet_stream_writer_spark.operators.staged4 import (
        embedding_norm_length_correlation,
    )

    d, n = 8, 24
    docs, vecs = [], []
    for i in range(n):
        length = 100 + 40 * i
        docs.append((i, "x" * length, "en", "s", length))
        v = np.zeros(d, dtype="float32")
        v[0] = length / 1000.0  # norm strictly proportional to length
        vecs.append((i, v, 0))
    ddf = pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    edf = pd.DataFrame(vecs, columns=["vec_id", "embedding", "label"])
    sf = _write(tmp_path, "documents", ddf)
    _write(tmp_path, "embeddings", edf)
    row = embedding_norm_length_correlation(spark, sf).collect()[0]
    assert row.n == n
    assert float(row.len_norm_corr) == pytest.approx(1.0, abs=1e-6)


def test_centroid_shift_detects_planted_half_shift(spark, tmp_path):
    """A label whose odd-id half is displaced by a constant vector
    must report a shift close to that vector's norm; an unshifted
    label reports near zero."""
    from parquet_stream_writer_spark.operators.staged4 import (
        embedding_centroid_shift,
    )

    rng = np.random.default_rng(13)
    d, rows = 16, []
    shift = np.zeros(d); shift[0] = 2.0
    vid = 0
    for label, shifted in ((0, True), (1, False)):
        for _ in range(20):
            v = rng.normal(size=d) * 0.01
            if shifted and vid % 2 == 1:
                v = v + shift
            rows.append((vid, v.astype("float32"), label))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = _write(tmp_path, "embeddings", pdf)
    got = {
        r.label: float(r.centroid_shift)
        for r in embedding_centroid_shift(spark, sf).collect()
    }
    assert got[0] == pytest.approx(2.0, abs=0.05)
    assert got[1] < 0.05


def test_bot_detection_flags_planted_bot_only(spark, tmp_path):
    """A planted bot (hundreds of same-type events in one day) must
    trip BOTH flags; a human-shaped user (few events across days,
    mixed types) must trip neither."""
    from parquet_stream_writer_spark.operators.staged4 import (
        events_bot_detection_heuristic,
    )

    base = pd.Timestamp("2024-05-01")
    rows, eid = [], 0
    # bot: 300 clicks in a single day → rate 300/day, monotony 100%
    for _ in range(300):
        rows.append((eid, base + pd.Timedelta(seconds=eid), 1, "click", 1.0, "{}"))
        eid += 1
    # human: 12 events over 6 days, alternating types
    for d in range(6):
        for t in ("view", "purchase"):
            rows.append(
                (eid, base + pd.Timedelta(days=d, hours=eid % 12), 2, t, 1.0, "{}")
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = _write(tmp_path, "events", pdf)
    row = events_bot_detection_heuristic(spark, sf).collect()[0]
    assert row.n_users == 2
    assert row.n_rate_flagged == 1
    assert row.n_monotony_flagged == 1
    assert row.n_both == 1
    assert float(row.flagged_share) == 0.5


def test_duplicate_vector_audit_counts_planted_group(spark, tmp_path):
    """Three ids sharing one exact vector + two sharing another must
    census as 2 dup groups / 5 dup vectors; near-misses (1e-6-unit
    component delta) must NOT merge."""
    from parquet_stream_writer_spark.operators.staged4 import (
        embedding_duplicate_vector_audit,
    )

    rng = np.random.default_rng(29)
    d = 8
    a = rng.normal(size=d).astype("float32")
    b = rng.normal(size=d).astype("float32")
    near = a.copy(); near[0] += 1e-4  # beyond the 1e-6 quantum: distinct
    rows = [(0, a, 0), (1, a, 0), (2, a, 0), (3, b, 0), (4, b, 0), (5, near, 0)]
    for i in range(6, 14):
        rows.append((i, rng.normal(size=d).astype("float32"), 0))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf = _write(tmp_path, "embeddings", pdf)
    row = embedding_duplicate_vector_audit(spark, sf).collect()[0]
    assert row.n_vectors == 14
    assert row.n_dup_groups == 2
    assert row.n_dup_vectors == 5
    assert row.max_group == 3
    assert float(row.dup_share) == pytest.approx(
        np.floor(5 / 14 * 1e6 + 0.5) / 1e6, abs=1e-9
    )


def test_quota_sampling_caps_only_oversized_sources(spark, tmp_path):
    """A source over quota truncates to exactly Q kept; one under
    quota keeps everything; and the kept set is deterministic across
    runs (hash order, no RNG)."""
    from parquet_stream_writer_spark.operators.staged4 import (
        _QUOTA_PER_SOURCE,
        sample_quota_per_source,
    )

    rows = []
    for i in range(30):
        rows.append((i, f"doc {i}", "en", "big", 10))
    for i in range(30, 33):
        rows.append((i, f"doc {i}", "en", "small", 10))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = _write(tmp_path, "documents", pdf)
    got1 = {
        r.source: (r.n_docs, r.n_kept, r.n_dropped)
        for r in sample_quota_per_source(spark, sf).collect()
    }
    got2 = {
        r.source: (r.n_docs, r.n_kept, r.n_dropped)
        for r in sample_quota_per_source(spark, sf).collect()
    }
    assert got1 == got2  # deterministic
    assert got1["big"] == (30, _QUOTA_PER_SOURCE, 30 - _QUOTA_PER_SOURCE)
    assert got1["small"] == (3, 3, 0)
