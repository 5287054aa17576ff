"""Randomized brute-force cross-checks for the SIXTH staged pack
(operators/staged6.py): each test builds a small synthetic corpus
(fixed seeds), runs the operator through its real parquet-loading
path, and compares against an independent pure-pandas/numpy model —
covering regimes the driver corpus never reaches (balance==max
boundary strictness, an empty probe list, single-channel funnels,
planted Pareto tails, authority monopolies).  Models replicate the
QUANTIZED arithmetic (the round-13 lesson: an unquantized free model
can pass by fixture luck), built from the spec, not from the
implementation's expression objects.
"""

from __future__ import annotations

import hashlib
import math

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


def _events(user_ids, types, values=None, start_us=1_704_067_200_000_000):
    n = len(user_ids)
    values = values if values is not None else np.round(
        np.linspace(1.0, 2.0, n), 2
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(
                start_us + np.arange(n, dtype="int64") * 60_000_000, unit="us"
            ),
            "user_id": np.asarray(user_ids, dtype="int64"),
            "event_type": list(types),
            "value": np.asarray(values, dtype="float64"),
            "props": ["{}"] * n,
        }
    )


def q6(x: float) -> int:
    return int(math.floor(x * 1_000_000 + 0.5))


# ---------------------------------------------------------------------------
# subquery_quantified_all
# ---------------------------------------------------------------------------

def test_quantified_all_boundary_strictness(spark, tmp_path):
    """bal == max(order total) exactly must NOT count (> ALL is
    strict); an orderless customer must count (vacuous truth)."""
    from parquet_stream_writer_spark.operators.staged6 import (
        subquery_quantified_all,
    )

    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3, 4], dtype="int64"),
            "c_name": ["a", "b", "c", "d"],
            "c_nationkey": np.zeros(4, dtype="int32"),
            "c_acctbal": [100.00, 250.50, 250.51, 7.0],
            "c_mktsegment": ["SEG"] * 4,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([10, 11, 12], dtype="int64"),
            "o_custkey": np.array([2, 3, 1], dtype="int64"),
            "o_orderstatus": ["O"] * 3,
            # cust 2's max == its balance exactly; cust 3's max below
            "o_totalprice": [250.50, 250.50, 500.0],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    sf = _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)
    row = subquery_quantified_all(spark, sf).first()
    assert row["n_customers"] == 4
    # cust 3 (250.51 > 250.50) and cust 4 (no orders) qualify;
    # cust 2 sits exactly ON the boundary and must not.
    assert row["n_over_all"] == 2
    assert row["n_no_orders"] == 1


# ---------------------------------------------------------------------------
# subquery_not_in_null_semantics
# ---------------------------------------------------------------------------

def test_not_in_null_semantics_free_model(spark, tmp_path):
    """Three-valued logic, modeled independently: with the min
    qualifying custkey NULLIF'd, NOT IN is 0 and NOT EXISTS excludes
    exactly the non-min qualifying custkeys."""
    from parquet_stream_writer_spark.operators.staged6 import (
        _NOTIN_PRICE_FLOOR,
        subquery_not_in_null_semantics,
    )

    custkeys = np.arange(1, 11, dtype="int64")
    cust = pd.DataFrame(
        {
            "c_custkey": custkeys,
            "c_name": [f"c{k}" for k in custkeys],
            "c_nationkey": np.zeros(10, dtype="int32"),
            "c_acctbal": np.linspace(0, 100, 10),
            "c_mktsegment": ["SEG"] * 10,
        }
    )
    # qualifying custkeys {3, 5, 7}; 3 is min -> nullified
    ok = _NOTIN_PRICE_FLOOR + 1
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(100, 105, dtype="int64"),
            "o_custkey": np.array([3, 5, 7, 5, 2], dtype="int64"),
            "o_orderstatus": ["F", "F", "F", "F", "O"],
            "o_totalprice": [ok, ok, ok, ok, ok],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 5),
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    sf = _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)
    row = subquery_not_in_null_semantics(spark, sf).first()
    assert row["n_probe"] == 4  # four F-orders over the floor
    assert row["n_probe_null"] == 1  # custkey 3's single order
    assert row["n_not_in"] == 0  # NULL in list -> never TRUE
    # members = {5, 7}; every other customer (incl. 3) survives
    assert row["n_not_exists"] == 8


def test_not_in_empty_probe_counts_everyone(spark, tmp_path):
    """With ZERO qualifying orders, NOT IN over the empty list is
    TRUE for every customer — the other branch of the rule."""
    from parquet_stream_writer_spark.operators.staged6 import (
        subquery_not_in_null_semantics,
    )

    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(1, 6, dtype="int64"),
            "c_name": list("abcde"),
            "c_nationkey": np.zeros(5, dtype="int32"),
            "c_acctbal": np.ones(5),
            "c_mktsegment": ["SEG"] * 5,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1], dtype="int64"),
            "o_custkey": np.array([1], dtype="int64"),
            "o_orderstatus": ["O"],  # not 'F' -> nothing qualifies
            "o_totalprice": [999999.0],
            "o_orderdate": pd.to_datetime(["2024-01-01"]),
            "o_orderpriority": ["1-URGENT"],
        }
    )
    sf = _write(tmp_path, "customer", cust)
    _write(tmp_path, "orders", orders)
    row = subquery_not_in_null_semantics(spark, sf).first()
    assert row["n_probe"] == 0
    assert row["n_probe_null"] == 0
    assert row["n_not_in"] == 5
    assert row["n_not_exists"] == 5


# ---------------------------------------------------------------------------
# agg_welch_ttest
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [7, 1213])
def test_welch_ttest_matches_numpy_model(spark, tmp_path, seed):
    """t and the Satterthwaite df against a numpy model computed from
    the same integer-cents moments (the quantized contract), on
    groups with deliberately unequal variances and sizes."""
    from parquet_stream_writer_spark.operators.staged6 import agg_welch_ttest

    rng = np.random.default_rng(seed)
    na, nb = 40, 160
    a = np.round(rng.normal(50, 5, na), 2)
    b = np.round(rng.normal(48, 25, nb), 2)
    ev = _events(
        np.arange(na + nb),
        ["purchase"] * na + ["click"] * nb,
        values=np.concatenate([a, b]),
    )
    sf = _write(tmp_path, "events", ev)
    row = agg_welch_ttest(spark, sf).first()

    def moments(x):
        c = np.floor(x * 100 + 0.5).astype(np.int64)
        n = len(c)
        s, q = int(c.sum()), int((c * c).sum())
        mean = s / (n * 100)
        var = (n * q - s * s) / (n * (n - 1) * 10000)
        return n, mean, var

    (na_, ma, va), (nb_, mb, vb) = moments(a), moments(b)
    se2 = va / na_ + vb / nb_
    t = (ma - mb) / math.sqrt(se2)
    df = (se2 * se2) / (
        (va / na_) ** 2 / (na_ - 1) + (vb / nb_) ** 2 / (nb_ - 1)
    )
    assert row["n_purchase"] == na and row["n_click"] == nb
    assert row["t_stat"] == math.floor(t * 10000 + 0.5) / 10000
    assert row["welch_df"] == math.floor(df * 100 + 0.5) / 100
    assert row["significant_95_normal_approx"] == (abs(row["t_stat"]) > 1.96)


# ---------------------------------------------------------------------------
# sample_ess_diagnostic
# ---------------------------------------------------------------------------

def test_ess_uniform_lengths_is_n(spark, tmp_path):
    """Constant weights ⇒ ESS == n exactly (ratio 1.0)."""
    from parquet_stream_writer_spark.operators.staged6 import (
        sample_ess_diagnostic,
    )

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(20, dtype="int64"),
            "text": ["x"] * 20,
            "lang": ["en"] * 20,
            "source": ["s"] * 20,
            "n_chars": np.full(20, 500, dtype="int64"),
        }
    )
    sf = _write(tmp_path, "documents", docs)
    row = sample_ess_diagnostic(spark, sf).first()
    assert row["n_docs"] == 20
    assert row["ess"] == 20.0
    assert row["ess_ratio"] == 1.0


@pytest.mark.parametrize("seed", [3, 89])
def test_ess_matches_numpy_model(spark, tmp_path, seed):
    """Mixed lengths against the quantized Kish model."""
    from parquet_stream_writer_spark.operators.staged6 import (
        sample_ess_diagnostic,
    )

    rng = np.random.default_rng(seed)
    n = 60
    lens = rng.integers(1, 5000, n).astype("int64")
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": ["x"] * n,
            "lang": rng.choice(["en", "fr"], n),
            "source": ["s"] * n,
            "n_chars": lens,
        }
    )
    sf = _write(tmp_path, "documents", docs)
    got = {
        r["lang"]: (r["n_docs"], r["ess"], r["ess_ratio"])
        for r in sample_ess_diagnostic(spark, sf).collect()
    }
    lmax = int(lens.max())
    for lang in ("en", "fr"):
        sub = lens[(docs["lang"] == lang).to_numpy()]
        w6 = np.array([q6(math.sqrt(lmax / x)) for x in sub], dtype=np.int64)
        s, q = float(w6.sum()), float((w6 * w6).sum())
        ess = s * s / q
        nd, got_ess, got_ratio = got[lang]
        assert nd == len(sub)
        assert got_ess == math.floor(ess * 10000 + 0.5) / 10000
        assert got_ratio == math.floor(ess / len(sub) * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# orders_hill_tail_index
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,alpha", [(5, 1.5), (17, 3.0)])
def test_hill_estimator_matches_model_and_recovers_alpha(
    spark, tmp_path, seed, alpha
):
    """Exact equality with the quantized free model, and loose
    recovery of a planted Pareto tail index."""
    from parquet_stream_writer_spark.operators.staged6 import (
        _HILL_M,
        orders_hill_tail_index,
    )

    rng = np.random.default_rng(seed)
    n = 3000
    vals = np.round(100.0 * rng.pareto(alpha, n) + 100.0, 2)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": np.ones(n, dtype="int64"),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": vals,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * n),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    sf = _write(tmp_path, "orders", orders)
    row = orders_hill_tail_index(spark, sf).first()

    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    order = np.lexsort((np.arange(n), -cents))
    top = cents[order[: _HILL_M + 1]]
    xm = int(top[_HILL_M])
    t6 = sum(q6(math.log(int(c) / xm)) for c in top[:_HILL_M])
    model_alpha = math.floor(_HILL_M * 1_000_000 / t6 * 10000 + 0.5) / 10000
    assert row["m_used"] == _HILL_M
    assert row["x_m"] == math.floor(xm / 100.0 * 100 + 0.5) / 100
    assert row["hill_alpha"] == model_alpha
    # loose recovery: Hill on a genuine Pareto tail lands near alpha
    assert abs(row["hill_alpha"] - alpha) / alpha < 0.35


# ---------------------------------------------------------------------------
# text_trigram_lm_heldout_perplexity
# ---------------------------------------------------------------------------

def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100


def test_trigram_lm_matches_python_model(spark, tmp_path):
    """Full pipeline against a dict-based python LM: same md5 split,
    same add-0.5 smoothing, same per-trigram quantized NLL."""
    from parquet_stream_writer_spark.operators.staged6 import (
        _TRI_ADD_K,
        _TRI_TRAIN,
        text_trigram_lm_heldout_perplexity,
    )

    rng = np.random.default_rng(42)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    n_docs = 400
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 12)))
        for _ in range(n_docs)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype="int64"),
            "text": texts,
            "lang": ["en"] * n_docs,
            "source": ["s"] * n_docs,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, "documents", docs)
    row = text_trigram_lm_heldout_perplexity(spark, sf).first()

    c3: dict = {}
    held = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.lower().split(" ")
        tris = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        if _bucket(int(doc_id)) < _TRI_TRAIN:
            for t in tris:
                c3[t] = c3.get(t, 0) + 1
        else:
            held.extend(tris)
    c2: dict = {}
    for (w1, w2, _w3), c in c3.items():
        c2[(w1, w2)] = c2.get((w1, w2), 0) + c
    v = len({w3 for (_a, _b, w3) in c3})
    nll6 = sum(
        q6(
            -math.log2(
                (c3.get(t, 0) + _TRI_ADD_K)
                / (c2.get(t[:2], 0) + _TRI_ADD_K * v)
            )
        )
        for t in held
    )
    mean_bits = nll6 / (len(held) * 1_000_000)
    assert row["n_heldout_trigrams"] == len(held)
    assert row["mean_nll_bits"] == math.floor(mean_bits * 1e6 + 0.5) / 1e6
    assert row["perplexity"] == math.floor(2.0**mean_bits * 1e4 + 0.5) / 1e4


# ---------------------------------------------------------------------------
# events_attribution_markov_removal
# ---------------------------------------------------------------------------

def test_markov_removal_single_gateway_channel(spark, tmp_path):
    """Planted structure: every conversion path runs through channel
    'view' ('click' never reaches purchase), so removing 'view' kills
    every conversion (effect 1.0, share 1.0) and removing 'click'
    changes nothing (effect 0.0)."""
    from parquet_stream_writer_spark.operators.staged6 import (
        events_attribution_markov_removal,
    )

    # users 0..9: view -> purchase; users 10..14: click -> (end)
    uids, types = [], []
    for u in range(10):
        uids += [u, u]
        types += ["view", "purchase"]
    for u in range(10, 15):
        uids += [u]
        types += ["click"]
    ev = _events(uids, types)
    sf = _write(tmp_path, "events", ev)
    rows = {
        r["channel"]: r
        for r in events_attribution_markov_removal(spark, sf).collect()
    }
    assert set(rows) == {"view", "click"}
    assert rows["view"]["removal_effect"] == 1.0
    assert rows["view"]["attribution_share"] == 1.0
    assert rows["click"]["removal_effect"] == 0.0
    assert rows["click"]["attribution_share"] == 0.0
    assert rows["view"]["p_conv_removed"] == 0.0


def test_markov_removal_matches_python_chain(spark, tmp_path):
    """Free model: rebuild the trimmed-journey transition counts and
    run the same 25-round quantized absorption iteration in pure
    python; every output column must match exactly."""
    from parquet_stream_writer_spark.operators.staged6 import (
        _MK_ITERS,
        events_attribution_markov_removal,
    )

    rng = np.random.default_rng(99)
    uids, types = [], []
    pool = ["view", "click", "signup", "purchase"]
    for u in range(120):
        ln = int(rng.integers(1, 8))
        seq = list(rng.choice(pool, ln, p=[0.4, 0.3, 0.2, 0.1]))
        uids += [u] * ln
        types += seq
    ev = _events(uids, types)
    sf = _write(tmp_path, "events", ev)
    got = {
        r["channel"]: r
        for r in events_attribution_markov_removal(spark, sf).collect()
    }

    # model: trim at first purchase, build transitions
    trans: dict = {}
    df = ev.sort_values(["user_id", "ts", "event_id"])
    for _u, grp in df.groupby("user_id"):
        seq = list(grp["event_type"])
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
        chain = ["START"] + [
            "CONV" if t == "purchase" else t for t in seq
        ]
        if chain[-1] != "CONV":
            chain.append("NULL")
        for a, b in zip(chain, chain[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({a for a, _ in trans})
    channels = [s for s in states if s != "START"]
    r = {s: sum(c for (a, _), c in trans.items() if a == s) for s in states}
    base = {
        s: trans.get((s, "CONV"), 0) * 1_000_000 for s in states
    }
    absorbed = {}
    for removed in ["<none>"] + channels:
        p = {s: 0 for s in states}
        for _ in range(_MK_ITERS):
            newp = {}
            for s in states:
                if s == removed:
                    newp[s] = 0
                    continue
                csum = sum(
                    trans.get((s, j), 0) * p[j]
                    for j in channels
                    if j != removed
                )
                newp[s] = int(
                    math.floor((base[s] + csum) / r[s] + 0.5)
                )
            p = newp
        absorbed[removed] = p["START"]
    pf6 = absorbed["<none>"]
    pcs = {ch: absorbed[ch] for ch in channels}
    dtot = sum(pf6 - v for v in pcs.values())
    assert set(got) == set(channels)
    for ch in channels:
        assert got[ch]["p_conv_full"] == pf6 / 1e6
        assert got[ch]["p_conv_removed"] == pcs[ch] / 1e6
        eff = math.floor((pf6 - pcs[ch]) / pf6 * 1e6 + 0.5) / 1e6
        assert got[ch]["removal_effect"] == eff
        share = math.floor((pf6 - pcs[ch]) / dtot * 1e6 + 0.5) / 1e6
        assert got[ch]["attribution_share"] == share


# ---------------------------------------------------------------------------
# graph_hits_user_type
# ---------------------------------------------------------------------------

def test_hits_matches_python_model(spark, tmp_path):
    """Free model of the quantized HITS rounds on a small random
    bipartite graph; authorities, top hubs, and scores must match
    exactly."""
    from parquet_stream_writer_spark.operators.staged6 import (
        _HITS_ITERS,
        graph_hits_user_type,
    )

    rng = np.random.default_rng(31)
    uids, types = [], []
    pool = ["view", "click", "error"]
    for u in range(40):
        for t in pool:
            k = int(rng.integers(0, 4))
            uids += [u] * k
            types += [t] * k
    ev = _events(uids, types)
    sf = _write(tmp_path, "events", ev)
    got = {
        r["event_type"]: r for r in graph_hits_user_type(spark, sf).collect()
    }

    w: dict = {}
    for u, t in zip(uids, types):
        w[(u, t)] = w.get((u, t), 0) + 1
    users = sorted({u for u, _ in w})
    tset = sorted({t for _, t in w})
    h = {u: 1_000_000 for u in users}
    a = {}
    for _ in range(_HITS_ITERS):
        araw = {
            t: sum(w.get((u, t), 0) * h[u] for u in users) for t in tset
        }
        amax = max(araw.values())
        a = {
            t: int(math.floor(araw[t] / amax * 1_000_000 + 0.5))
            for t in tset
        }
        hraw = {
            u: sum(w.get((u, t), 0) * a[t] for t in tset) for u in users
        }
        hmax = max(hraw.values())
        h = {
            u: int(math.floor(hraw[u] / hmax * 1_000_000 + 0.5))
            for u in users
        }
    for t in tset:
        touchers = [u for u in users if (u, t) in w]
        if not touchers:
            continue
        top = min(touchers, key=lambda u: (-h[u], u))
        assert got[t]["authority"] == a[t] / 1e6
        assert got[t]["n_users"] == len(touchers)
        assert got[t]["top_hub_user"] == top
        assert got[t]["top_hub_score"] == h[top] / 1e6
    assert any(abs(v["authority"] - 1.0) < 1e-12 for v in got.values())


# ---------------------------------------------------------------------------
# Degenerate-corpus guards (self-review r14: ANSI Spark raises on
# double/0 where DuckDB yields NULL — each guard must emit a NULL row
# instead of crashing)
# ---------------------------------------------------------------------------

def test_welch_single_purchase_emits_null_row(spark, tmp_path):
    from parquet_stream_writer_spark.operators.staged6 import agg_welch_ttest

    ev = _events([1, 2, 3, 4], ["purchase", "click", "click", "click"])
    sf = _write(tmp_path, "events", ev)
    row = agg_welch_ttest(spark, sf).first()
    assert row["n_purchase"] == 1 and row["n_click"] == 3
    assert row["mean_purchase"] is not None  # n >= 1: mean defined
    assert row["t_stat"] is None
    assert row["welch_df"] is None
    assert row["significant_95_normal_approx"] is None


def test_hill_flat_tail_emits_null_alpha(spark, tmp_path):
    from parquet_stream_writer_spark.operators.staged6 import (
        _HILL_M,
        orders_hill_tail_index,
    )

    n = _HILL_M + 50
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": np.ones(n, dtype="int64"),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.full(n, 99.99),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * n),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    sf = _write(tmp_path, "orders", orders)
    row = orders_hill_tail_index(spark, sf).first()
    assert row["m_used"] == _HILL_M
    assert row["hill_alpha"] is None


def test_hill_undersized_corpus_emits_null_row(spark, tmp_path):
    """Fewer than m+1 orders -> no x_(m+1) threshold: the result is
    the pack's single NULL-metric row (m_used = 0), not an empty
    relation (ADVICE r14)."""
    from parquet_stream_writer_spark.operators.staged6 import (
        _HILL_M,
        orders_hill_tail_index,
    )

    n = _HILL_M // 2
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": np.ones(n, dtype="int64"),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.linspace(100.0, 900.0, n).round(2),
            "o_orderdate": pd.to_datetime(["2024-01-01"] * n),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    sf = _write(tmp_path, "orders", orders)
    out = orders_hill_tail_index(spark, sf).collect()
    assert len(out) == 1
    row = out[0]
    assert row["m_used"] == 0
    assert row["x_m"] is None
    assert row["hill_alpha"] is None


def test_trigram_lm_all_heldout_emits_null_metrics(spark, tmp_path):
    """Doc ids chosen so every >=3-token doc hashes into the held-out
    buckets: the model has zero vocabulary, and the metrics must be
    NULL-rowed, not a DIVIDE_BY_ZERO crash."""
    from parquet_stream_writer_spark.operators.staged6 import (
        _TRI_TRAIN,
        text_trigram_lm_heldout_perplexity,
    )

    held_ids = [i for i in range(3000) if _bucket(i) >= _TRI_TRAIN][:6]
    assert len(held_ids) == 6
    docs = pd.DataFrame(
        {
            "doc_id": np.array(held_ids, dtype="int64"),
            "text": ["the cat sat on the mat"] * 6,
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [22] * 6,
        }
    )
    sf = _write(tmp_path, "documents", docs)
    row = text_trigram_lm_heldout_perplexity(spark, sf).first()
    assert row["n_heldout_trigrams"] == 6 * 4
    assert row["mean_nll_bits"] is None
    assert row["perplexity"] is None
