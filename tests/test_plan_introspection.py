"""Tests for the plans introspection module itself — the audit tool
our plan-pinning tests and library users rely on must report the
same facts `.explain` prints.
"""

from __future__ import annotations

import pytest

from parquet_stream_writer_spark.operators import relational
from parquet_stream_writer_spark.plans import (
    assert_scan_pruned,
    explain_string,
    summarize,
)

from tests.conftest import SF_DIR


def test_summarize_counts_star_join_broadcasts(spark):
    s = summarize(relational.join_broadcast_star(spark, SF_DIR))
    assert s.nodes.get("BroadcastHashJoin", 0) >= 3
    assert "SortMergeJoin" not in s.nodes
    assert s.broadcast_exchanges >= 3
    assert not s.has_nested_loop()


def test_summarize_sees_pushed_filters_and_schema(spark):
    s = summarize(relational.scan_filter_project(spark, SF_DIR))
    assert any("l_quantity" in f for f in s.pushed_filters)
    assert s.read_schemas and all(r.startswith("struct<") for r in s.read_schemas)


def test_assert_scan_pruned_passes_on_pruned_scan(spark):
    df = relational.scan_filter_project(spark, SF_DIR)
    s = assert_scan_pruned(df, max_columns=6, require_pushed="l_quantity")
    assert s.pushed_filters


def test_assert_scan_pruned_fails_on_wide_scan(spark):
    from parquet_stream_writer_spark.sources import load_table

    df = load_table(spark, SF_DIR, "lineitem")  # full 11-column scan
    with pytest.raises(AssertionError):
        assert_scan_pruned(df, max_columns=6)


def test_window_not_confused_with_group_limit(spark):
    s = summarize(relational.window_topk_per_group(spark, SF_DIR))
    assert s.nodes.get("WindowGroupLimit", 0) >= 1
    # the Window count excludes the WindowGroupLimit mentions
    assert s.nodes.get("Window", 0) >= 1


def test_explain_string_modes_differ(spark):
    df = relational.topk_global(spark, SF_DIR)
    assert "TakeOrderedAndProject" in explain_string(df, "simple")
    assert "ReadSchema" in explain_string(df, "formatted")


#: Queries whose plans legitimately contain a SortAggregate.
#: (profile_table earned its way out: char(1) min/max now rides the
#: hash aggregate as ascii codes, so no string-buffer fallback.)
_SORT_AGG_OK = set()

#: Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
#: single-row scalar broadcasts (thresholds, totals, sketch/exact
#: audit cross joins), k-row codebook broadcasts, or the genuinely
#: non-equi range join. Every build side is O(1)–O(k) rows.
_NLJ_OK = {
    "sample_importance_weighted",  # 1-row max-weight broadcast
    "dedup_cluster_size_profile",
    "dedup_lsh_recall_audit",
    "multimodal_shard_manifest",
    "sample_class_balanced",
    "text_vocab_growth",
    "text_pack_sequences",
    "agg_bloom_filter_audit",  # two 1-row stat-aggregate broadcasts
    "pipeline_fk_integrity_audit",  # 7 × 1-row count-aggregate broadcasts
    "agg_hll_mergeable",
    "orders_basket_affinity",
    "agg_kll_quantile_mergeable",
    "agg_theta_sketch_setops",
    "embedding_kmeans_lloyd",
    "events_wau_rolling",
    "join_range_bands",
    "profile_table",
    "q22_global_sales",
    "sample_temperature_mix",
    "similarity_cosine_topk",
    "similarity_range_search",
    "similarity_truncation_audit",  # same 5-row-broadcast exact scan

    # (similarity_ivf/_ivf_pq earned their way out: the nprobe cell
    # list explodes into an equi probe join, no nested loop.)
    "similarity_ivf_recall",  # exact-vs-approx audit cross join
    "text_perplexity_proxy",
    "text_tfidf_top_term",
    # round-6 additions, all 1-row scalar broadcasts:
    "q11_important_stock",  # HAVING threshold total
    "pipeline_partition_skew_audit",  # mean-bucket-load scalar
    "sample_curriculum_order",  # (n, min, max) stats row
    "graph_pagerank_bipartite",  # node-count scalar per iteration
    "text_bigram_lm_perplexity",  # vocabulary-size scalar
    # round-6 batch 2-4 additions, all 1-row scalar broadcasts:
    "events_inactivity_churn",  # observation-horizon max-timestamp row
    "graph_triangle_count",  # node/edge/wedge/triangle 1-row combiners
    "similarity_rank_fusion",  # 5-row query-set broadcast (exact scan shape)
    "text_pmi_collocations",  # pair-total and token-total scalars
    "window_ntile_cume",  # total-spend scalar for revenue share
    "pipeline_zorder_layout",  # 1-row min/max stats broadcast
    "text_ccnet_perplexity_buckets",  # vocab-total + tertile-threshold rows
    "sample_mixture_epoch_plan",  # 1-row normalizer broadcast
    # round-6 batch-5 additions, 1-row scalar broadcasts:
    "text_idf_rarity",  # 1-row corpus-size broadcast inside idf
    "sample_ks_drift",  # 1-row split-totals/min/max stats broadcast
    # round-7 staged-pack registrations (pinned pre-registration by
    # tests/test_staged_operators.py::_STAGED_NLJ_OK):
    "events_forecast_baseline",  # 1-row backtest-window scalar
    "text_bm25_search",  # bounded probe-term-set broadcast
    "text_burstiness",  # 1-row corpus-size broadcast
    "events_ab_conversion_ztest",  # 1-row x 1-row arm-stats cross join
    # round-8 staged2 registration (folded from
    # tests/test_staged2_operators.py::_STAGED2_NLJ_OK):
    "orders_abc_classification",  # 1-row (lo, hi, total) stats broadcast
    "orders_backlog_aging",  # 1-row max-date horizon broadcast
    "agg_histogram_equidepth",  # 1-row (lo, hi, n) stats broadcast
    "agg_benford_audit",  # 1-row total broadcast
    "pipeline_quarantine_router",  # 1-row total broadcast
    "events_type_share_drift",  # bounded weeks x types grid cross join
    # round-9 staged3 registration (folded from
    # tests/test_staged3_operators.py::_STAGED3_NLJ_OK):
    "part_type_price_premium",  # 1-row catalog-mean broadcast
    "text_boilerplate_ngrams",  # 1-row corpus-size broadcast
    "text_ngram_novelty_curve",  # 1-row (min, max) doc-id broadcast
    "similarity_pair_sample_histogram",  # 1-row max-id broadcast
    "sample_neyman_allocation",  # 1-row Σw / deficit broadcasts
    "pipeline_partition_pruning_audit",  # 1-row totals broadcast
    "embedding_dedup_agreement_audit",  # 1-row summary relation
    "agg_topk_with_others",  # 1-row total + head-sum broadcasts
    "events_props_key_census",  # 1-row event-total broadcast
    "graph_assortativity",  # 1-row node-count broadcast
    "text_lang_source_cramers_v",  # 1-row dims broadcast
    # round-10 staged4 registration (folded from
    # tests/test_staged4_operators.py::_STAGED4_NLJ_OK):
    "text_oov_coverage",  # 8-row K-grid + 1-row totals broadcasts
    "similarity_hamming_topk",  # probe-code broadcast (non-equi id test)
    "sample_dedup_aware",  # 1-row totals broadcast
    "orders_basket_size_histogram",  # 1-row totals broadcast
    "orders_customer_migration",  # 1-row total broadcast
    "events_user_lifetime",  # 1-row totals broadcast
    "text_vocab_jaccard_by_lang",  # bounded lang-pair grid (lang < lang)
    # round-12 staged5 registration (folded from
    # tests/test_staged5_operators.py::_STAGED5_NLJ_OK):
    "similarity_threshold_calibration",  # ≤6-row band × 5-row grid join
    "sample_pps_systematic",  # |langs| × k bounded grid build
    "sample_temporal_embargo_split",  # 1-row min-day broadcast
}


def test_full_pack_plan_sweep(spark):
    """Every query in the pack planned, summarized, and checked for
    the two silent 100 TB regressions: a SortAggregate (a string in
    an agg buffer demotes the hash agg → full sort of the input) and
    an unexpected nested-loop join (a broadcast hint lost → quadratic
    join). Whitelists name the deliberate exceptions; a new query
    landing here unannounced fails the sweep."""
    import __spark_entry__ as entry

    spark.catalog.clearCache()
    offenders = {}
    for name, fn in sorted(entry.queries().items()):
        s = summarize(fn(spark, SF_DIR))
        if s.nodes.get("SortAggregate") and name not in _SORT_AGG_OK:
            offenders.setdefault(name, []).append("SortAggregate")
        if s.nodes.get("BroadcastNestedLoopJoin") and name not in _NLJ_OK:
            offenders.setdefault(name, []).append("BroadcastNestedLoopJoin")
        if s.nodes.get("CartesianProduct"):
            offenders.setdefault(name, []).append("CartesianProduct")
    assert not offenders, offenders


def test_aqe_skew_join_actually_fires(spark):
    """The session claims AQE skew-join handling (session.py confs;
    several join docstrings defer hot keys to it).  Pin that the
    mechanism actually FIRES under this session's configuration: a
    sort-merge join with one pathologically hot key must show
    skew-split sort-merge-join in its FINAL adaptive plan when the
    skew thresholds are scaled down to test size."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # ~200k rows on key 0, 1 row each on 1..999; payload pads bytes.
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 199_000, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        # No aggregation downstream (AQE declines to split a skewed
        # partition when a downstream distribution requirement, e.g. a
        # groupBy on the join key, would have to re-shuffle the split)
        # and the action must run on THIS DataFrame's QueryExecution —
        # a .write wraps the plan in its own execution and leaves this
        # one isFinalPlan=false.
        j = left.join(right, "k")
        assert len(j.collect()) == 200_000
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
