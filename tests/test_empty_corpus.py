"""Empty-input robustness: a 100 TB pipeline regularly meets empty
sources (a new date partition, a filtered-out shard, a cold-start
history table), and pyspark 4 runs ANSI mode by default — a ratio
over an empty aggregate raises DIVIDE_BY_ZERO at runtime unless
guarded.

A full 185-query empty sweep runs clean (verified round 6); the suite
pins the division/ratio-bearing representatives so a future unguarded
ratio fails here instead of in production.
"""

from __future__ import annotations

import pytest

from parquet_stream_writer_spark.operators import all_queries

#: Queries whose outputs contain ratios/divisions of aggregates —
#: the shapes ANSI division errors hide in.
_RATIO_KEYS = (
    "dedup_lsh_recall_audit",
    "similarity_ivf_recall",
    "text_quality_psi",
    "text_pack_efficiency",
    "text_quality_filter_funnel",
    "events_funnel",
    "events_retention_cohort",
    "profile_table",
    "agg_moments",
    "orders_basket_affinity",
    "sample_temperature_mix",
    # r5 additions: weight = sqrt(n_chars / max) with a null max over
    # an empty corpus; entropy divides by the per-doc char total.
    "sample_importance_weighted",
    "text_char_entropy",
    # r5 batch 2: keep_ratio / share / regression divisions over
    # aggregates that vanish (not null) on an empty corpus.
    "dedup_semdedup_prune",
    "events_value_histogram",
    "text_zipf_fit",
    # The () grouping set emits its corpus row even over empty input,
    # so the dup-rate division meets n_docs = 0 for real.
    "pipeline_dataset_card",
    "dedup_minhash_estimate_audit",
    # Global aggregates still emit their 1-row stats on empty input,
    # so the FPR division meets n_probed = n_true_members = 0.
    "agg_bloom_filter_audit",
    # 1-row count aggregates emit n_child = 0 rows on empty tables.
    "pipeline_fk_integrity_audit",
    # r6 batch 2-5: the triangle combiner divides by a NULL wedge sum
    # on empty input (still emits its 1-row stats); the others carry
    # share/rate/span-fraction divisions over vanishing aggregates.
    "graph_triangle_count",
    "window_ntile_cume",
    "events_user_gini",
    "events_inactivity_churn",
    "text_pmi_collocations",
    "pipeline_zorder_layout",
    # budget-share / surprisal divisions over vanishing aggregates.
    "sample_mixture_epoch_plan",
    "text_ccnet_perplexity_buckets",
    # r6 batch 5: HHI/effective-N shares, ECDF gaps over vanishing
    # split totals, hazard terms, per-customer LTV, mean-idf, and the
    # finite-window EWMA normalizer — all division-bearing.
    "agg_hhi_concentration",
    "sample_ks_drift",
    "orders_survival_kaplan_meier",
    "orders_cohort_ltv",
    "text_idf_rarity",
    "events_ewma_smooth",
)


@pytest.mark.parametrize("key", _RATIO_KEYS)
def test_ratio_queries_survive_empty_corpus(spark, empty_sf, key):
    """No ANSI runtime error; result is a well-formed (possibly
    empty, possibly null-valued) DataFrame."""
    df = all_queries()[key](spark, empty_sf)
    assert df.count() >= 0  # materializes the plan; raises on ANSI errors
