"""Oracle differential + property tests for the SIXTH staged operator
pack (operators/staged6.py) — the same local gate the first five
staged packs passed before registration.  Built in round 14, HELD by
the pack-growth gate (every driver window through r19 is a full
50-key cohort with zero slack); the staging guard below inverts to
``test_staged6_keys_registered`` at the registration drill.
"""

from __future__ import annotations

import pytest

from parquet_stream_writer_spark.operators import staged6

from tests.conftest import assert_results_match


@pytest.mark.parametrize("name", sorted(staged6.QUERIES))
def test_staged6_query_matches_oracle(name, spark, sf_dir, oracle_con):
    df = staged6.QUERIES[name](spark, sf_dir)
    assert name in staged6.ORACLE
    assert_results_match(df, oracle_con, staged6.ORACLE[name])


def test_staged6_keys_not_registered():
    """The staging assertion: staged6 keys must stay OUT of the driver
    registry until a window has slack and the pack-growth gate clears
    (the staged5 r11→r12 drill).  Inverting this test is step one of
    the registration drill."""
    from parquet_stream_writer_spark.operators import all_oracles, all_queries

    live = all_queries()
    overlap = set(staged6.QUERIES) & set(live)
    assert not overlap, f"staged6 keys leaked into the registry: {overlap}"
    assert not set(staged6.ORACLE) & set(all_oracles())


def test_staged6_every_key_has_an_oracle():
    assert set(staged6.QUERIES) == set(staged6.ORACLE)


@pytest.mark.parametrize("name", sorted(staged6.QUERIES))
def test_staged6_query_survives_empty_corpus(name, spark, empty_sf):
    """The FULL staged6 pack against a schema-exact zero-row corpus:
    no ANSI DIVIDE_BY_ZERO, no null-handling crash."""
    df = staged6.QUERIES[name](spark, empty_sf)
    assert df.count() >= 0  # materializes the plan; raises on ANSI errors


def test_markov_attribution_shares_sum_to_one(spark, sf_dir):
    """The removal-effect attribution contract: shares are the
    normalized integer differences, so they must be non-negative and
    sum to 1 within the 6-dp grid (one unit of slack per channel from
    the per-share floor)."""
    rows = staged6.QUERIES["events_attribution_markov_removal"](
        spark, sf_dir
    ).collect()
    assert rows, "expected at least one channel"
    shares = [r["attribution_share"] for r in rows if r["attribution_share"] is not None]
    assert all(s >= 0 for s in shares)
    assert abs(sum(shares) - 1.0) <= len(shares) * 1e-6 + 1e-9
    for r in rows:
        if r["removal_effect"] is not None:
            assert 0.0 <= r["removal_effect"] <= 1.0
            assert r["p_conv_removed"] <= r["p_conv_full"] + 1e-9


def test_hits_scores_normalized(spark, sf_dir):
    """HITS L-infinity normalization: every authority is in (0, 1]
    and exactly one type holds 1.0; top-hub scores are on the same
    grid."""
    rows = staged6.QUERIES["graph_hits_user_type"](spark, sf_dir).collect()
    assert rows
    auths = [r["authority"] for r in rows]
    assert all(0.0 < a <= 1.0 for a in auths)
    assert any(abs(a - 1.0) < 1e-9 for a in auths)
    assert all(0.0 < r["top_hub_score"] <= 1.0 for r in rows)


def test_not_in_vs_not_exists_diverge_by_design(spark, sf_dir):
    """The three-valued-logic lesson the key exists to teach: with a
    NULL planted in the probe list, NOT IN collapses to 0 while NOT
    EXISTS keeps the anti-join count."""
    row = staged6.QUERIES["subquery_not_in_null_semantics"](
        spark, sf_dir
    ).first()
    assert row["n_probe"] > 0
    # every qualifying order of the min custkey is NULLIF'd, so the
    # null count equals that customer's qualifying-order count (>= 1)
    assert row["n_probe_null"] >= 1
    assert row["n_not_in"] == 0
    assert row["n_not_exists"] > 0


def test_trigram_lm_heldout_is_leakage_split(spark, sf_dir):
    """Held-out trigram counts must come from the 20% bucket only —
    the per-language held-out totals are a fixed fraction-ish of the
    corpus, never the whole corpus (the leakage failure this eval
    shape exists to prevent)."""
    from pyspark.sql import functions as F

    from parquet_stream_writer_spark.sources import load_table

    out = staged6.QUERIES["text_trigram_lm_heldout_perplexity"](spark, sf_dir)
    total_heldout = out.agg(F.sum("n_heldout_trigrams")).first()[0]
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.lower(F.col("text")), " "))
    all_trigrams = (
        docs.select(F.greatest(toks - 2, F.lit(0)).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert 0 < total_heldout < all_trigrams


def test_staged6_cost_pass_plan_pins(spark, sf_dir):
    """Protects the round-15 cost pass from silent regression: the
    trigram corpus explode must stay on the arrays_zip/slice lane
    (a transform(sequence, i -> struct(get...)) lambda evaluates
    interpreted per element — measured 9x slower), and the markov
    plan must stay free of quadratic shapes (its 1-row/edges
    broadcasts are the only nested-loop joins)."""
    from parquet_stream_writer_spark.plans import explain_string, summarize

    tri = staged6.QUERIES["text_trigram_lm_heldout_perplexity"](
        spark, sf_dir
    )
    es = explain_string(tri, "formatted")
    assert "arrays_zip" in es
    assert "lambdafunction" not in es  # no interpreted per-element lane

    mk = staged6.QUERIES["events_attribution_markov_removal"](spark, sf_dir)
    nodes = summarize(mk).nodes
    assert not nodes.get("CartesianProduct")
    assert not nodes.get("SortAggregate")
    assert nodes.get("BroadcastNestedLoopJoin", 0) <= 3  # 1-row broadcasts
