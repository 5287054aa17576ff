"""Third staged operator pack — built in round 8, to be REGISTERED
with the driver in round 9.

Same contract as the first two staged packs (operators/staged.py round
6 → 7, operators/staged2.py round 7 → 8): this module lives OUTSIDE
``operators._modules()`` so its keys consume no round-8
verification-window slot; every key ships with a DataFrame-first
implementation, an ANSI/DuckDB oracle twin, engine-portable arithmetic
(pround / integer scaling / cross-multiplied comparisons / the
sorted-array sequential-fold convention where a bounded double sum's
order matters), a scale-shape docstring, and local differential tests
(tests/test_staged3_operators.py).

Round-9 registration checklist (mirror of staged2's round-8 record):

1. re-run the full battery over ALL keys (tools/staged_pack_check.py
   --staged3 cross-SF strict at sf0.001/0.01/0.1, invariance_check
   --staged3, adversarial_sweep.py --staged3, the property tests);
2. add ``staged3`` to ``operators._modules()`` (after ``staged2``);
3. fold ``_STAGED3_NLJ_OK`` (tests/test_staged3_operators.py) into
   the plan sweep's ``_NLJ_OK`` in tests/test_plan_introspection.py;
4. fold the staged3 rows of SURVEY §2c into the main inventory and
   re-run tools/record_query_hashes.py (window-aware) at round-9
   session END.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_stream_writer_spark.functions import pround
from parquet_stream_writer_spark.sources import load_table, scan_parallel

QUERIES: dict = {}
ORACLE: dict = {}


# ---------------------------------------------------------------------------
# Monthly market-share trend per customer nation
# ---------------------------------------------------------------------------


def orders_market_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue share per customer nation with the
    month-over-month share delta — the market-share trend readout
    behind every regional BI dashboard ("who is gaining share, who is
    bleeding it").

    Exactness: revenue is exact integer cents of ``o_totalprice``; the
    share is ONE division of two exact integers (nation cents / month
    cents), 6-dp rounded; the delta subtracts two such identically
    computed doubles (deterministic in both engines); the first month
    per nation reports a null delta.

    Shape: one orders⋈customer equi join (both fact-sized — shuffle
    hash join, never a broadcast of customer), a (month, nation) hash
    aggregate down to bounded cells (months × 25 nations), then
    cell-relation-only joins and a nation-partitioned lag window —
    nothing after the first aggregate scales with the input.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    cells = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), "c_nationkey")
        .groupBy("month", "nation")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    totals = cells.groupBy("month").agg(
        F.sum("revenue_cents").alias("month_cents")
    )
    w = Window.partitionBy("nation").orderBy("month")
    shared = (
        cells.join(totals, "month")
        .withColumn(
            "month_share",
            pround(F.col("revenue_cents") / F.col("month_cents"), 6),
        )
        .withColumn(
            "share_delta",
            pround(
                F.col("month_share") - F.lag("month_share").over(w), 6
            ),
        )
    )
    return shared.select(
        "month", "nation", "revenue_cents", "month_share", "share_delta"
    ).orderBy("month", "nation")


ORACLE_ORDERS_MARKET_SHARE_TREND = """
WITH cells AS (
  SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
         n.n_name AS nation,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
           AS revenue_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
totals AS (
  SELECT month, sum(revenue_cents) AS month_cents FROM cells GROUP BY 1
),
shared AS (
  SELECT c.month, c.nation, c.revenue_cents,
         floor((CAST(c.revenue_cents AS DOUBLE) / t.month_cents)
               * 1000000 + 0.5) / 1000000.0 AS month_share
  FROM cells c JOIN totals t USING (month)
)
SELECT month, nation,
       CAST(revenue_cents AS BIGINT) AS revenue_cents,
       month_share,
       floor((month_share - lag(month_share) OVER
              (PARTITION BY nation ORDER BY month)) * 1000000 + 0.5)
         / 1000000.0 AS share_delta
FROM shared
ORDER BY month, nation
"""

QUERIES["orders_market_share_trend"] = orders_market_share_trend
ORACLE["orders_market_share_trend"] = ORACLE_ORDERS_MARKET_SHARE_TREND


# ---------------------------------------------------------------------------
# Month-of-year seasonal index per priority
# ---------------------------------------------------------------------------


def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year revenue seasonality per order priority: the
    seasonal index is the (priority, month-of-year) mean order value
    relative to the priority's overall mean — index > 1 marks the
    months a priority class over-earns, the input to staffing and
    inventory calendars.

    Exactness: sums are exact integer cents and counts; each mean is
    ONE double division of exact integers, and the index is ONE
    division of those two identically computed doubles — no summation
    whose order an engine could pick (integer sums are order-free).
    Int64 headroom: cents sums overflow past ~9.2e16 total cents
    (~$920 T) per cell — Spark fails loudly (ANSI) rather than
    diverging.

    Shape: one map-side month() projection + one (priority, moy) hash
    aggregate to ≤ 5·12 cells; the priority rollup and the index join
    touch only cells.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.month("o_orderdate").cast("long").alias("moy"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    cells = orders.groupBy("o_orderpriority", "moy").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    tot = cells.groupBy("o_orderpriority").agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts")
    )
    return (
        cells.join(tot, "o_orderpriority")
        .select(
            F.col("o_orderpriority").alias("priority"),
            "moy",
            F.col("n").alias("n_orders"),
            pround(F.col("s") / F.col("n"), 2).alias("mean_cents"),
            pround(
                (F.col("s") / F.col("n")) / (F.col("ts") / F.col("tn")), 6
            ).alias("seasonal_index"),
        )
        .orderBy("priority", "moy")
    )


ORACLE_ORDERS_SEASONAL_INDEX = """
WITH cells AS (
  SELECT o_orderpriority, month(o_orderdate) AS moy,
         count(*) AS n,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS s
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT o_orderpriority, sum(n) AS tn, sum(s) AS ts FROM cells GROUP BY 1
)
SELECT c.o_orderpriority AS priority,
       c.moy,
       c.n AS n_orders,
       floor((CAST(c.s AS DOUBLE) / c.n) * 100 + 0.5) / 100.0 AS mean_cents,
       floor(((CAST(c.s AS DOUBLE) / c.n)
              / (CAST(t.ts AS DOUBLE) / t.tn)) * 1000000 + 0.5)
         / 1000000.0 AS seasonal_index
FROM cells c JOIN tot t USING (o_orderpriority)
ORDER BY priority, moy
"""

QUERIES["orders_seasonal_index"] = orders_seasonal_index
ORACLE["orders_seasonal_index"] = ORACLE_ORDERS_SEASONAL_INDEX


# ---------------------------------------------------------------------------
# Bilateral trade-balance matrix (customer nation × supplier nation)
# ---------------------------------------------------------------------------


def orders_trade_balance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade matrix between customer and supplier nations:
    lineitem revenue aggregated to (buyer nation, seller nation)
    cells, plus the NET balance against the mirrored cell (what A buys
    from B minus what B buys from A) — the cross-border flow readout.

    Exactness: revenue is exact integer cents; the net balance is one
    integer subtraction of the mirrored cell's exact sum (0 when the
    mirror cell is absent).

    Shape: two fact-sized equi joins (lineitem⋈orders, then
    ⋈customer) — shuffle hash joins; the two 25-row nation sides
    broadcast; one hash aggregate to ≤ 625 cells; the mirror join runs
    on the cell relation only.
    """
    li = scan_parallel(spark, sf_dir, "lineitem", "l_orderkey").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("cnat")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("snat")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(supp, F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy("cnat", "snat")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    mirror = cells.select(
        F.col("cnat").alias("snat2"),
        F.col("snat").alias("cnat2"),
        F.col("revenue_cents").alias("mirror_cents"),
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cnat"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snat"), F.col("n_name").alias("supp_nation")
    )
    return (
        cells.join(
            mirror,
            (cells["cnat"] == mirror["cnat2"]) & (cells["snat"] == mirror["snat2"]),
            "left",
        )
        .join(F.broadcast(cn), "cnat")
        .join(F.broadcast(sn), "snat")
        .select(
            "cust_nation",
            "supp_nation",
            "n_lines",
            "revenue_cents",
            (
                F.col("revenue_cents") - F.coalesce("mirror_cents", F.lit(0))
            ).alias("net_balance_cents"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


ORACLE_ORDERS_TRADE_BALANCE_MATRIX = """
WITH cells AS (
  SELECT c.c_nationkey AS cnat, s.s_nationkey AS snat,
         count(*) AS n_lines,
         sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
           AS revenue_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       a.n_lines,
       CAST(a.revenue_cents AS BIGINT) AS revenue_cents,
       CAST(a.revenue_cents - coalesce(b.revenue_cents, 0) AS BIGINT)
         AS net_balance_cents
FROM cells a
LEFT JOIN cells b ON a.cnat = b.snat AND a.snat = b.cnat
JOIN nation cn ON a.cnat = cn.n_nationkey
JOIN nation sn ON a.snat = sn.n_nationkey
ORDER BY cust_nation, supp_nation
"""

QUERIES["orders_trade_balance_matrix"] = orders_trade_balance_matrix
ORACLE["orders_trade_balance_matrix"] = ORACLE_ORDERS_TRADE_BALANCE_MATRIX


# ---------------------------------------------------------------------------
# Part-type price premium
# ---------------------------------------------------------------------------


def part_type_price_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part-type retail-price premium over the catalog mean: the
    assortment positioning readout (which types command a premium,
    which are commodity).

    Exactness: prices are exact integer cents; both means are single
    double divisions of exact integers and the premium is one division
    of those two doubles minus 1, 6-dp rounded.

    Shape: one hash aggregate per type + a 1-row global aggregate
    broadcast (whitelisted scalar nested-loop).
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_type",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per_type = part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"), F.sum("cents").alias("s")
    )
    overall = part.agg(
        F.count(F.lit(1)).alias("gn"), F.sum("cents").alias("gs")
    )
    return (
        per_type.join(F.broadcast(overall))
        .select(
            "p_type",
            "n_parts",
            pround(F.col("s") / F.col("n_parts"), 2).alias("mean_cents"),
            pround(
                (F.col("s") / F.col("n_parts")) / (F.col("gs") / F.col("gn"))
                - F.lit(1.0),
                6,
            ).alias("premium"),
        )
        .orderBy("p_type")
    )


ORACLE_PART_TYPE_PRICE_PREMIUM = """
WITH base AS (
  SELECT p_type,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part
),
per_type AS (
  SELECT p_type, count(*) AS n_parts, sum(cents) AS s FROM base GROUP BY 1
),
overall AS (SELECT count(*) AS gn, sum(cents) AS gs FROM base)
SELECT p_type, n_parts,
       floor((CAST(s AS DOUBLE) / n_parts) * 100 + 0.5) / 100.0 AS mean_cents,
       floor(((CAST(s AS DOUBLE) / n_parts)
              / (CAST(gs AS DOUBLE) / gn) - 1.0) * 1000000 + 0.5)
         / 1000000.0 AS premium
FROM per_type, overall
ORDER BY p_type
"""

QUERIES["part_type_price_premium"] = part_type_price_premium
ORACLE["part_type_price_premium"] = ORACLE_PART_TYPE_PRICE_PREMIUM
