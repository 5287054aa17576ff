"""Bucketed co-located joins — the zero-shuffle path for the joins a
100 TB pipeline runs repeatedly on the same key.

`spark.read.parquet(...)` can never avoid the join shuffle: the files
carry no partitioning metadata, so every orders ⋈ lineitem pays two
full exchanges. Writing both fact tables bucketed on the join key
(`bucketBy(n, key)` + `saveAsTable`) records the hash layout in the
catalog; any later equi-join (or groupBy) on that key reads the
buckets co-located and drops the Exchange from the plan entirely —
the single biggest recurring-shuffle saving available to a curation
pipeline that joins on doc_id / orderkey every day.

The writers here are the showcase's setup cost, paid once; at real
scale the bucketed write IS the ingest step.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    """orders + lineitem written bucketed by orderkey into a tmp
    warehouse-backed catalog; dropped (tables AND files) afterward."""
    from parquet_stream_writer_spark.sources import load_table

    n_buckets = 8
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, SF_DIR, table)
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(f"bkt_{table}")
        )
    yield "bkt_orders", "bkt_lineitem"
    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Both sides bucketed on the join key with equal bucket counts:
    the sort-merge join must read buckets co-located — ZERO Exchange
    nodes in the whole plan (an unbucketed read of the same data pays
    two)."""
    orders_t, lineitem_t = bucketed_tables
    joined = (
        spark.table(lineitem_t)
        .join(
            spark.table(orders_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    p = _plan(spark, joined)
    # the join itself is exchange-free; the only allowed exchange is
    # the final tiny per-priority aggregate's.
    join_part = p.split("HashAggregate")[0]
    assert "Exchange" not in join_part, p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p, p


def test_unbucketed_same_join_pays_two_exchanges(spark):
    """Control: the identical join over plain parquet reads shuffles
    BOTH sides — proving the bucketed layout, not AQE, removed them."""
    from parquet_stream_writer_spark.sources import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    joined = li.join(
        orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    p = _plan(spark, joined)
    assert p.count("- Exchange") >= 2, p


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also rides the layout: per-order
    rollups (the most common curation aggregate) run shuffle-free."""
    _, lineitem_t = bucketed_tables
    agg = (
        spark.table(lineitem_t)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    p = _plan(spark, agg)
    assert "Exchange" not in p, p


def test_bucketed_join_matches_unbucketed_results(spark, bucketed_tables):
    """Layout changes the plan, never the answer."""
    from parquet_stream_writer_spark.sources import load_table

    orders_t, lineitem_t = bucketed_tables
    bucketed = (
        spark.table(lineitem_t)
        .join(spark.table(orders_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_label_propagation_carriers_agree(spark, sf_dir):
    """Checkpointed vs bucketed edge carriers must produce IDENTICAL
    convergence trajectories at the same round count (min over bigint
    labels is exact, so even float wobble can't excuse a diff)."""
    from parquet_stream_writer_spark.operators.staged import (
        graph_label_propagation,
    )

    a = graph_label_propagation(spark, sf_dir, rounds=5, carrier="checkpoint")
    b = graph_label_propagation(spark, sf_dir, rounds=5, carrier="bucketed")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 5


def test_pagerank_carriers_agree(spark, sf_dir):
    """Both adjacency carriers (checkpointed arrays vs the one-time
    bucketed table) must produce IDENTICAL ranked output at the same
    iteration count — the physical layout is an optimization choice,
    never a semantic one."""
    from parquet_stream_writer_spark.operators.pipeline import (
        graph_pagerank_bipartite,
    )

    a = graph_pagerank_bipartite(spark, sf_dir, iters=5, carrier="checkpoint")
    b = graph_pagerank_bipartite(spark, sf_dir, iters=5, carrier="bucketed")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pagerank_segmentation_is_value_invariant(spark, sf_dir, monkeypatch):
    """The hot-node bounds (pre-split modulus + absolute slice
    re-chunk) must never change PageRank values: shrinking the
    segment caps to force MANY segments per node at test scale gives
    byte-identical ranks to the production constants."""
    from parquet_stream_writer_spark.operators import pipeline

    sf = sf_dir
    baseline = sorted(
        map(tuple, pipeline.graph_pagerank_bipartite(spark, sf).collect())
    )
    monkeypatch.setattr(pipeline, "_PR_SEG", 4)
    monkeypatch.setattr(pipeline, "_PR_PRESPLIT", 3)
    segmented = sorted(
        map(tuple, pipeline.graph_pagerank_bipartite(spark, sf).collect())
    )
    assert baseline == segmented


def test_carrier_tables_are_session_salted_and_dropped(spark, sf_dir):
    """Carrier-table lifecycle contract (ADVICE r7): names are salted
    with the applicationId (concurrent sessions can't clobber each
    other), a repeat call leaves exactly one live table per logical
    key, and drop_carrier_tables() removes everything this process
    created from the catalog."""
    import re

    from parquet_stream_writer_spark.operators import _carrier
    from parquet_stream_writer_spark.operators.staged import (
        graph_label_propagation,
    )

    graph_label_propagation(spark, sf_dir, rounds=4, carrier="bucketed").collect()
    app = re.sub(r"[^0-9a-z]", "_", spark.sparkContext.applicationId.lower())
    live = [t for t in _carrier._LIVE_TABLES.values() if t.startswith("lp_edges_")]
    assert live and all(t.endswith(app) for t in live)
    n_before = len(_carrier._LIVE_TABLES)
    # Repeat call with identical args: same key, still one live table.
    graph_label_propagation(spark, sf_dir, rounds=4, carrier="bucketed").collect()
    assert len(_carrier._LIVE_TABLES) == n_before
    catalog = {t.name for t in spark.catalog.listTables()}
    assert set(_carrier._LIVE_TABLES.values()) <= catalog
    _carrier.drop_carrier_tables()
    assert not _carrier._LIVE_TABLES
    catalog_after = {t.name for t in spark.catalog.listTables()}
    assert not any(t in catalog_after for t in live)
