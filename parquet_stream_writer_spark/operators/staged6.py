"""Sixth staged operator pack — built in round 14, UNREGISTERED.

Holds until a driver window has slack (the staged5 precedent: built
r11, registered r12 when the pack-growth gate cleared).  Same contract
as staged packs 1–5: every key ships with a DataFrame-first
implementation, an ANSI/DuckDB oracle twin, engine-portable arithmetic
(pround / integer quantization / single double expressions over exact
integer sums — the round-13/14 integer-sum discipline applied from day
one, not retrofitted), a scale-shape docstring, and local differential
tests (tests/test_staged6_operators.py).

The pack fills verified gaps in the §2c surface: quantified and
null-aware subquery shapes, Markov removal-effect attribution, HITS
hubs/authorities, a leakage-aware held-out LM evaluation, Welch's
t-test, an importance-weight ESS diagnostic, and a Hill tail-index
estimator:

- ``subquery_quantified_all``      — correlated > ALL decorrelation
- ``subquery_not_in_null_semantics`` — NOT IN vs NOT EXISTS under NULL
- ``events_attribution_markov_removal`` — removal-effect attribution
- ``graph_hits_user_type``         — HITS over the user–type bipartite
- ``text_trigram_lm_heldout_perplexity`` — add-k trigram LM, held-out
- ``agg_welch_ttest``              — Welch's unequal-variance t-test
- ``sample_ess_diagnostic``        — importance-weight effective n
- ``orders_hill_tail_index``       — Hill estimator of the value tail

Reference parity note: the reference repo is a streaming Parquet
writer (``/root/reference/src/parquet_stream_writer/writer.py``) with
no query surface; these operators extend the engine's
training-data-pipeline mandate, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_stream_writer_spark.functions import (
    pround,
    quant6,
    sql_quant6,
    sql_round,
)
from parquet_stream_writer_spark.sources import load_table

QUERIES: dict = {}
ORACLE: dict = {}


# ---------------------------------------------------------------------------
# Quantified subquery: correlated > ALL, decorrelated Spark-side
# ---------------------------------------------------------------------------

def subquery_quantified_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment census of customers whose account balance exceeds
    ALL of their own orders' totals — the correlated quantified
    subquery (``> ALL``) shape.

    Spark SQL has no quantified comparisons, so the implementation IS
    the textbook decorrelation Catalyst would want: ``> ALL (SELECT
    o_totalprice ...)`` ≡ ``max IS NULL OR bal > max`` (vacuous truth
    over an empty set included — the SQL semantics the oracle's real
    ``> ALL`` exercises).  One per-customer max aggregate, one
    customer-keyed left join, one segment rollup; comparisons are
    exact double equality-class comparisons, no accumulation."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    omax = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("mx"))
    )
    j = cust.join(omax, cust["c_custkey"] == omax["o_custkey"], "left")
    over_all = F.col("mx").isNull() | (F.col("c_acctbal") > F.col("mx"))
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(over_all.cast("long")).alias("n_over_all"),
            F.sum(F.col("mx").isNull().cast("long")).alias("n_no_orders"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_SUBQUERY_QUANTIFIED_ALL = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CASE WHEN c_acctbal > ALL (SELECT o_totalprice FROM orders o
                                           WHERE o.o_custkey = c.c_custkey)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_over_all,
       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_custkey = c.c_custkey)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders
FROM customer c
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

QUERIES["subquery_quantified_all"] = subquery_quantified_all
ORACLE["subquery_quantified_all"] = ORACLE_SUBQUERY_QUANTIFIED_ALL


# ---------------------------------------------------------------------------
# NOT IN vs NOT EXISTS under a NULL-bearing probe list
# ---------------------------------------------------------------------------

#: The finished-order value floor that defines the probe list.
_NOTIN_PRICE_FLOOR = 150000.0


def subquery_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic three-valued-logic trap, measured: customers NOT IN
    a probe list that deterministically contains one NULL (the minimum
    qualifying custkey is NULLIF'd out) versus the same predicate as
    NOT EXISTS.  With a NULL in the list, ``x NOT IN list`` is never
    TRUE (non-members evaluate UNKNOWN), so the NOT IN count collapses
    to 0 while NOT EXISTS still returns the anti-join count — the two
    columns differing IS the lesson, and the cross-engine agreement on
    both is the parity check.

    Spark-side the implementation spells out the null-aware anti-join
    Catalyst plans for NOT IN: has_null and the member anti-count are
    computed explicitly and composed per the three-valued rule
    (probe empty → all rows qualify; NULL present → none do).  All
    counts are exact integers; two broadcast 1-row aggregates, one
    left-anti join on the distinct member list."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    qualifying = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > F.lit(_NOTIN_PRICE_FLOOR))
        )
        .select("o_custkey")
    )
    k0 = qualifying.agg(F.min("o_custkey").alias("k0"))
    probe = qualifying.crossJoin(F.broadcast(k0)).select(
        F.expr("nullif(o_custkey, k0)").alias("x")
    )
    probe_stats = probe.agg(
        F.count(F.lit(1)).alias("n_probe"),
        # coalesce: sum over an EMPTY probe is NULL in Spark but the
        # oracle's filtered count(*) is 0 — pin the same reading.
        F.coalesce(
            F.sum(F.col("x").isNull().cast("long")), F.lit(0).cast("long")
        ).alias("n_probe_null"),
    )
    members = probe.where(F.col("x").isNotNull()).select("x").distinct()
    n_cust = cust.agg(F.count(F.lit(1)).alias("n_cust"))
    anti = cust.join(
        members, cust["c_custkey"] == members["x"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_anti"))
    return (
        probe_stats.crossJoin(F.broadcast(n_cust))
        .crossJoin(F.broadcast(anti))
        .select(
            "n_probe",
            "n_probe_null",
            F.when(F.col("n_probe") == 0, F.col("n_cust"))
            .when(F.col("n_probe_null") > 0, F.lit(0).cast("long"))
            .otherwise(F.col("n_anti"))
            .alias("n_not_in"),
            F.col("n_anti").alias("n_not_exists"),
        )
    )


ORACLE_SUBQUERY_NOT_IN_NULL = f"""
WITH qualifying AS (
  SELECT o_custkey FROM orders
  WHERE o_orderstatus = 'F' AND o_totalprice > {_NOTIN_PRICE_FLOOR}
),
probe AS (
  SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM qualifying)) AS x
  FROM qualifying
)
SELECT (SELECT count(*) FROM probe) AS n_probe,
       (SELECT count(*) FROM probe WHERE x IS NULL) AS n_probe_null,
       (SELECT count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT x FROM probe)) AS n_not_in,
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM probe p
                          WHERE p.x = c.c_custkey)) AS n_not_exists
"""

QUERIES["subquery_not_in_null_semantics"] = subquery_not_in_null_semantics
ORACLE["subquery_not_in_null_semantics"] = ORACLE_SUBQUERY_NOT_IN_NULL


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test (purchase vs click event values)
# ---------------------------------------------------------------------------

def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-test between purchase and click event values — the
    unequal-variance two-sample test an experimentation platform runs
    when group variances differ (complementing the pooled z-test in
    ``events_ab_conversion_ztest``).

    Exactness discipline: the 2-dp values enter as integer CENTS, so
    each group's three moments (n, Σc, Σc²) are exact integer sums
    (order-free).  Mean, variance, t, and the Welch–Satterthwaite df
    are then single double expressions over those integers, identical
    in both engines; the 95% verdict compares |t| against the fixed
    NORMAL critical value 1.96 (a normal approximation — the column
    name says so: the Student-t critical value at the computed Welch
    df is larger for small groups, so this flag is anti-conservative
    below ~n=30 per group; the df is returned for callers who need
    the exact gate).  One map-side aggregate over a two-type filter —
    no join, no window."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    is_a = (F.col("event_type") == "purchase").cast("long")
    is_b = (F.col("event_type") == "click").cast("long")
    m = ev.select(
        is_a.alias("ia"),
        is_b.alias("ib"),
        cents.alias("c"),
    ).agg(
        F.sum("ia").alias("na"),
        F.sum(F.col("ia") * F.col("c")).alias("sa"),
        F.sum(F.col("ia") * F.col("c") * F.col("c")).alias("qa"),
        F.sum("ib").alias("nb"),
        F.sum(F.col("ib") * F.col("c")).alias("sb"),
        F.sum(F.col("ib") * F.col("c") * F.col("c")).alias("qb"),
    )
    mean_a = F.col("sa") / (F.col("na") * F.lit(100))
    mean_b = F.col("sb") / (F.col("nb") * F.lit(100))
    var_a = (F.col("na") * F.col("qa") - F.col("sa") * F.col("sa")).cast(
        "double"
    ) / (F.col("na") * (F.col("na") - F.lit(1)) * F.lit(10000)).cast("double")
    var_b = (F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb")).cast(
        "double"
    ) / (F.col("nb") * (F.col("nb") - F.lit(1)) * F.lit(10000)).cast("double")
    se2 = var_a / F.col("na") + var_b / F.col("nb")
    t = (mean_a - mean_b) / F.sqrt(se2)
    df = (se2 * se2) / (
        (var_a / F.col("na")) * (var_a / F.col("na")) / (F.col("na") - F.lit(1))
        + (var_b / F.col("nb")) * (var_b / F.col("nb")) / (F.col("nb") - F.lit(1))
    )
    # Degenerate-group guards (self-review r14): under ANSI Spark a
    # double division by zero RAISES while DuckDB yields NULL, so a
    # group with < 2 rows (or zero pooled variance) must be guarded
    # on BOTH sides, not left to engine defaults.  The inner when()
    # nests so se2 is never evaluated when a variance denominator
    # would be zero (AND does not short-circuit).
    ok_n = (F.col("na") >= 2) & (F.col("nb") >= 2)
    return m.select(
        F.col("na").alias("n_purchase"),
        F.col("nb").alias("n_click"),
        F.when(F.col("na") > 0, pround(mean_a, 4)).alias("mean_purchase"),
        F.when(F.col("nb") > 0, pround(mean_b, 4)).alias("mean_click"),
        F.when(ok_n, F.when(se2 > 0, pround(t, 4))).alias("t_stat"),
        F.when(ok_n, F.when(se2 > 0, pround(df, 2))).alias("welch_df"),
        F.when(
            ok_n, F.when(se2 > 0, F.abs(pround(t, 4)) > F.lit(1.96))
        ).alias("significant_95_normal_approx"),
    )


ORACLE_AGG_WELCH_TTEST = f"""
WITH m AS (
  SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS sa,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       * CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS qa,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN event_type = 'click'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS sb,
         sum(CASE WHEN event_type = 'click'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       * CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS qb
  FROM events WHERE event_type IN ('purchase', 'click')
),
d AS (
  SELECT na, nb,
         sa / (na * 100) AS mean_a,
         sb / (nb * 100) AS mean_b,
         CAST(na * qa - sa * sa AS DOUBLE)
           / CAST(na * (na - 1) * 10000 AS DOUBLE) AS var_a,
         CAST(nb * qb - sb * sb AS DOUBLE)
           / CAST(nb * (nb - 1) * 10000 AS DOUBLE) AS var_b
  FROM m
),
s AS (
  SELECT *, var_a / na + var_b / nb AS se2 FROM d
)
SELECT CAST(na AS BIGINT) AS n_purchase,
       CAST(nb AS BIGINT) AS n_click,
       CASE WHEN na > 0 THEN {sql_round('mean_a', 4)} END AS mean_purchase,
       CASE WHEN nb > 0 THEN {sql_round('mean_b', 4)} END AS mean_click,
       CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0
            THEN {sql_round('(mean_a - mean_b) / sqrt(se2)', 4)} END AS t_stat,
       CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0
            THEN {sql_round('(se2 * se2) / ((var_a / na) * (var_a / na) / (na - 1) + (var_b / nb) * (var_b / nb) / (nb - 1))', 2)} END AS welch_df,
       CASE WHEN na >= 2 AND nb >= 2 AND se2 > 0
            THEN abs({sql_round('(mean_a - mean_b) / sqrt(se2)', 4)}) > 1.96 END AS significant_95_normal_approx
FROM s
"""

QUERIES["agg_welch_ttest"] = agg_welch_ttest
ORACLE["agg_welch_ttest"] = ORACLE_AGG_WELCH_TTEST


# ---------------------------------------------------------------------------
# Importance-weight effective-sample-size diagnostic
# ---------------------------------------------------------------------------

def sample_ess_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of length-bias importance weights,
    per language: with w_d = √(L_max / n_chars_d) (up-weighting short
    documents toward a char-balanced epoch), ESS = (Σw)²/Σw² tells the
    curator how many "real" samples the weighted corpus is worth —
    the standard diagnostic before importance-weighted training
    (pairs with ``sample_importance_weighted``).

    Exactness discipline: each weight quantizes to a 1e-6-unit LONG
    before the sums, so Σw and Σw² are exact integers (order-free);
    ESS is then S·S/Q over the same doubles in both engines (S and Q
    cast once — deterministic even past 2^53, since both engines
    round the identical integer the same way).  Domain bound (the
    quant6 contract): w6² = (L_max/n_chars)·10¹² must fit int64, so
    the corpus length RATIO must stay under ~9.2e6 (a 1-char doc next
    to a ≥9.3M-char doc overflows the square) — corpora beyond that
    skew need a coarser quantizer or a length floor.  One broadcast
    1-row max, one map-side per-language aggregate."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .where(F.col("n_chars") > 0)
    )
    lmax = docs.agg(F.max("n_chars").alias("lmax"))
    w6 = quant6(F.sqrt(F.col("lmax").cast("double") / F.col("n_chars")))
    per = (
        docs.crossJoin(F.broadcast(lmax))
        .select("lang", w6.alias("w6"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w6").alias("s"),
            F.sum(F.col("w6") * F.col("w6")).alias("q"),
        )
    )
    s_d = F.col("s").cast("double")
    q_d = F.col("q").cast("double")
    return per.select(
        "lang",
        "n_docs",
        pround(s_d * s_d / q_d, 4).alias("ess"),
        pround(s_d * s_d / q_d / F.col("n_docs"), 6).alias("ess_ratio"),
    ).orderBy("lang")


ORACLE_SAMPLE_ESS = f"""
WITH docs AS (SELECT lang, n_chars FROM documents WHERE n_chars > 0),
lmax AS (SELECT max(n_chars) AS lmax FROM docs),
w AS (
  SELECT lang,
         {sql_quant6('sqrt(CAST(lmax AS DOUBLE) / n_chars)')} AS w6
  FROM docs, lmax
),
per AS (
  SELECT lang, count(*) AS n_docs, sum(w6) AS s, sum(w6 * w6) AS q
  FROM w GROUP BY lang
)
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       {sql_round('CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(q AS DOUBLE)', 4)} AS ess,
       {sql_round('CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(q AS DOUBLE) / n_docs', 6)} AS ess_ratio
FROM per
ORDER BY lang
"""

QUERIES["sample_ess_diagnostic"] = sample_ess_diagnostic
ORACLE["sample_ess_diagnostic"] = ORACLE_SAMPLE_ESS


# ---------------------------------------------------------------------------
# Hill tail-index estimator over order values
# ---------------------------------------------------------------------------

#: Top-order statistics used by the Hill estimator.
_HILL_M = 200


def orders_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-value tail index: α = m / Σ_{i≤m}
    ln(x_(i)/x_(m+1)) over the top m+1 order statistics — the standard
    heavy-tail diagnostic (α ≲ 2 means variance-infinite revenue
    concentration, which changes every downstream sampling decision).

    Shape: one TakeOrderedAndProject (sort+limit m+1, distributed
    top-k — never a global sort), then window/aggregate over the tiny
    m+1-row relation.  Exactness: values enter as integer cents with
    a total (cents DESC, orderkey ASC) tie-break, each log-ratio term
    quantizes to a 1e-6-unit LONG (ln is the documented ±1-unit
    per-row libm residual), and α divides two exact integers once.

    The estimator needs at least m+1 = ``_HILL_M + 1`` rows; an
    under-sized corpus has no x_(m+1) threshold, so the result is the
    pack's degenerate NULL-metric row (m_used = 0, x_m and hill_alpha
    NULL — the Welch/flat-tail convention) rather than an empty
    relation: x_(m+1) comes from an always-1-row aggregate whose NULL
    propagates through the log terms in both engines (ADVICE r14)."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    top = (
        load_table(spark, sf_dir, "orders")
        .select(cents.alias("cents"), "o_orderkey")
        .orderBy(F.col("cents").desc(), F.col("o_orderkey").asc())
        .limit(_HILL_M + 1)
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("o_orderkey").asc())
    ranked = top.withColumn("rk", F.row_number().over(w))
    xm = ranked.agg(
        F.max(
            F.when(F.col("rk") == _HILL_M + 1, F.col("cents"))
        ).alias("xm_cents")
    )
    terms = (
        ranked.where(F.col("rk") <= _HILL_M)
        .crossJoin(F.broadcast(xm))
        .select(
            quant6(
                F.log(F.col("cents").cast("double") / F.col("xm_cents"))
            ).alias("t6"),
            "xm_cents",
        )
    )
    # A degenerate flat tail (all top m+1 values equal) zeroes every
    # log term: ANSI Spark would raise on the division where DuckDB
    # yields NULL — guard both sides (self-review r14).  m_used counts
    # non-NULL xm_cents carriers, so the under-sized corpus reads 0.
    return terms.agg(
        F.count("xm_cents").alias("m_used"),
        pround(F.max("xm_cents") / F.lit(100.0), 2).alias("x_m"),
        F.when(
            F.sum("t6") > 0,
            pround(
                (F.count("xm_cents") * F.lit(1000000)).cast("double")
                / F.sum("t6"),
                4,
            ),
        ).alias("hill_alpha"),
    ).select("m_used", "x_m", "hill_alpha")


ORACLE_ORDERS_HILL = f"""
WITH ranked AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderkey,
         row_number() OVER (ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                            o_orderkey ASC) AS rk
  FROM orders
  QUALIFY rk <= {_HILL_M + 1}
),
xm AS (SELECT max(CASE WHEN rk = {_HILL_M + 1} THEN cents END) AS xm_cents
       FROM ranked),
terms AS (
  SELECT {sql_quant6('ln(CAST(cents AS DOUBLE) / xm_cents)')} AS t6, xm_cents
  FROM ranked, xm WHERE rk <= {_HILL_M}
)
SELECT count(xm_cents) AS m_used,
       {sql_round('max(xm_cents) / 100.0', 2)} AS x_m,
       CASE WHEN sum(t6) > 0
            THEN {sql_round('CAST(count(xm_cents) * 1000000 AS DOUBLE) / sum(t6)', 4)}
       END AS hill_alpha
FROM terms
"""

QUERIES["orders_hill_tail_index"] = orders_hill_tail_index
ORACLE["orders_hill_tail_index"] = ORACLE_ORDERS_HILL


# ---------------------------------------------------------------------------
# Held-out add-k trigram LM perplexity (leakage-aware split)
# ---------------------------------------------------------------------------

#: Train share of the 100 md5 buckets (buckets < this train).
_TRI_TRAIN = 80
#: Additive smoothing constant — 0.5 is exactly representable, so the
#: smoothed numerator/denominator stay exact doubles.
_TRI_ADD_K = 0.5


def _tri_bucket_sql(spark_side: bool) -> str:
    """The pack-wide deterministic split bucket — REUSES
    pipeline._bucket_col (self-review r14: a local re-implementation
    would silently de-synchronize from the ``sample_hash_split``
    convention the docstring promises)."""
    from parquet_stream_writer_spark.operators.pipeline import _bucket_col

    return _bucket_col(spark_side=spark_side)


def text_trigram_lm_heldout_perplexity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Add-k trigram LM trained on an 80% md5-bucket split and scored
    on the held-out 20% — the leakage-aware eval loop every data
    curation run needs (training and scoring on the same docs
    flatters perplexity; the deterministic hash split is the same
    convention as ``sample_hash_split``).

    Model: p(w3|w1w2) = (c3 + k)/(c2 + k·V) with k = 0.5 (exactly
    representable, so numerator and denominator are exact doubles
    over integer counts), c2 = Σ_w3 c3 (the trigram-table marginal),
    V = distinct continuations in training.  Per held-out trigram the
    NLL quantizes to a 1e-6-unit LONG (log2 carries the documented
    ±1-unit per-row libm residual), so the per-language sums are
    exact integers; mean bits and 2^mean perplexity are single double
    expressions.

    Shape: two map-side trigram explodes (train and held-out — rows
    linear in corpus tokens), one trigram-keyed count aggregate with
    map-side combine, TWO equi joins of held-out trigrams against the
    model (on (w1,w2,w3) and on (w1,w2) — shuffles on n-gram keys,
    never a cross join), a broadcast 1-row vocabulary size, one
    language rollup.  At 100 TB the trigram table is the big side and
    both joins co-partition on its keys."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    bucket = F.expr(_tri_bucket_sql(spark_side=True))
    toks = F.split(F.lower(F.col("text")), " ")
    # arrays_zip of three shifted slices, not transform(sequence(...),
    # i -> struct(get(toks,i)...)): higher-order lambdas evaluate
    # interpreted per ELEMENT and the round-15 cost pass measured the
    # transform form 9x slower (4.4 s vs 0.5 s per corpus explode at
    # sf0.1) for identical output.  greatest(...,0) keeps the slice
    # length non-negative because Catalyst may fuse explode's implicit
    # size(tri) > 0 conjunct ahead of the size(toks) >= 3 filter in
    # one generated predicate and evaluate tri on short rows (the r14
    # gotcha that motivated get()): a negative-length slice raises
    # there, an empty zip just yields no trigrams.
    n3 = F.greatest(F.size("toks") - 2, F.lit(0))
    tri = F.arrays_zip(
        F.slice("toks", 1, n3).alias("w1"),
        F.slice("toks", 2, n3).alias("w2"),
        F.slice("toks", 3, n3).alias("w3"),
    )
    base = (
        docs.withColumn("bucket", bucket)
        .withColumn("toks", toks)
        .where(F.size("toks") >= 3)
        .withColumn("tri", tri)
        .select("doc_id", "lang", "bucket", F.explode("tri").alias("t"))
        .select("doc_id", "lang", "bucket", "t.w1", "t.w2", "t.w3")
    )
    train = base.where(F.col("bucket") < _TRI_TRAIN)
    heldout = base.where(F.col("bucket") >= _TRI_TRAIN)
    # Pin the trigram MODEL table: the scoring join, the c2 marginal
    # and the vocabulary size all branch off c3, and without the pin
    # each branch re-runs the corpus explode + count (the round-15
    # cost pass measured 3 redundant corpus passes).  c3 is
    # model-sized (distinct training trigrams), the relation a real
    # pipeline would persist — the corpus-sized explodes stay
    # streaming, one pass each for train and held-out.
    c3 = (
        train.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
        .localCheckpoint(eager=False)
    )
    c2 = c3.groupBy("w1", "w2").agg(F.sum("c3").alias("c2"))
    vocab = c3.agg(F.countDistinct("w3").alias("v"))
    p = (F.coalesce(F.col("c3"), F.lit(0)) + F.lit(_TRI_ADD_K)) / (
        F.coalesce(F.col("c2"), F.lit(0)) + F.lit(_TRI_ADD_K) * F.col("v")
    )
    # v = 0 (an entirely held-out corpus) zeroes p's denominator: a
    # DIVIDE_BY_ZERO under ANSI Spark vs NULL in DuckDB — guard both
    # sides so the row survives with NULL metrics (self-review r14).
    scored = (
        heldout.join(c3, ["w1", "w2", "w3"], "left")
        .join(c2, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            F.when(F.col("v") > 0, quant6(-F.log2(p))).alias("nll6"),
        )
    )
    mean_bits = F.sum("nll6") / (F.count(F.lit(1)) * F.lit(1000000.0))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_heldout_trigrams"),
            pround(mean_bits, 6).alias("mean_nll_bits"),
            pround(F.pow(F.lit(2.0), mean_bits), 4).alias("perplexity"),
        )
        .orderBy("lang")
    )


ORACLE_TEXT_TRIGRAM_LM = f"""
WITH base AS (
  SELECT doc_id, lang,
         {_tri_bucket_sql(spark_side=False)} AS bucket,
         string_split(lower(text), ' ') AS toks
  FROM documents
),
tri AS (
  SELECT doc_id, lang, bucket,
         toks[i + 1] AS w1, toks[i + 2] AS w2, toks[i + 3] AS w3
  FROM base CROSS JOIN UNNEST(range(len(toks) - 2)) AS t(i)
  WHERE len(toks) >= 3
),
c3 AS (
  SELECT w1, w2, w3, count(*) AS c3
  FROM tri WHERE bucket < {_TRI_TRAIN} GROUP BY 1, 2, 3
),
c2 AS (SELECT w1, w2, sum(c3) AS c2 FROM c3 GROUP BY 1, 2),
vocab AS (SELECT count(DISTINCT w3) AS v FROM c3),
scored AS (
  SELECT h.lang,
         CASE WHEN v > 0 THEN {sql_quant6(
             f'-log2((coalesce(c3.c3, 0) + {_TRI_ADD_K}) '
             f'/ (coalesce(c2.c2, 0) + {_TRI_ADD_K} * v))'
         )} END AS nll6
  FROM tri h
  LEFT JOIN c3 ON h.w1 = c3.w1 AND h.w2 = c3.w2 AND h.w3 = c3.w3
  LEFT JOIN c2 ON h.w1 = c2.w1 AND h.w2 = c2.w2
  CROSS JOIN vocab
  WHERE h.bucket >= {_TRI_TRAIN}
)
SELECT lang,
       count(*) AS n_heldout_trigrams,
       {sql_round('sum(nll6) / (count(*) * 1000000.0)', 6)} AS mean_nll_bits,
       {sql_round('pow(2.0, sum(nll6) / (count(*) * 1000000.0))', 4)} AS perplexity
FROM scored
GROUP BY lang
ORDER BY lang
"""

QUERIES["text_trigram_lm_heldout_perplexity"] = text_trigram_lm_heldout_perplexity
ORACLE["text_trigram_lm_heldout_perplexity"] = ORACLE_TEXT_TRIGRAM_LM


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------

#: Fixed absorption-probability iterations.  The output is defined AT
#: this iteration count (not at convergence), so both engines compute
#: the identical quantized fixpoint prefix regardless of chain mixing
#: speed; 25 rounds converge a 7-state absorbing chain far past the
#: 1e-6 grid in practice.
_MK_ITERS = 25


def events_attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov removal-effect attribution: model user
    journeys (trimmed at first purchase) as START → channel* →
    CONV/NULL transitions, compute each channel's conversion
    probability drop when that channel is removed (its inbound
    traffic redirected to NULL), and attribute conversions by the
    normalized removal effects — the data-driven alternative to
    last-touch that ``events_attribution`` implements.

    Exactness discipline (integer-sum from day one): transition
    counts are exact integers, and the absorption-probability state
    is a 1e-6-unit LONG per (removed-variant, state) cell.  Each of
    the ``_MK_ITERS`` fixed iterations computes Σ_j c_ij·p6_k(j) — an
    integer dot product — plus the static c_i,CONV·1e6 base term,
    then ONE double division by the integer row total, floor-half-up
    back to the 1e-6 grid.  A 1-ulp libm divergence cannot survive
    the re-quantization, so both engines walk the identical integer
    state trajectory.  Removal effects and attribution shares divide
    exact integer differences once.

    Shape: two user-keyed window passes (row_number + first-purchase
    min, then lead over the trimmed sequence), one (src,dst) count
    aggregate — corpus-sized work ends there; the ``_MK_ITERS``
    absorption rounds run inside ONE Arrow-batched ``applyInPandas``
    kernel per removal variant over the (variants × states) grid with
    the ≤(C+2)² transition table attached (C = observed channel
    count), so the whole iteration is a single shuffle of a
    channel-grid-sized relation at any corpus scale.  (The round-14
    build ran the rounds as 25 chained DataFrame joins; the round-15
    cost pass measured that at ~97% Spark stage-scheduling overhead —
    ~10 s at sf0.1 against a 0.1 s corpus prefix — with the identical
    integer trajectory, so the kernel is strictly cheaper and equally
    exact: O(C²·iters) integer work per group, bounded by the channel
    domain, never the corpus.)  No driver-side matrix, no collect."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    wall = Window.partitionBy("user_id")
    numbered = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "fp",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).over(wall),
    )
    trimmed = numbered.where(
        F.col("fp").isNull() | (F.col("rn") <= F.col("fp"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    seq = trimmed.withColumn("nxt", F.lead("event_type").over(w2))
    mapped_nxt = (
        F.when(F.col("nxt").isNull(), F.lit("NULL"))
        .when(F.col("nxt") == "purchase", F.lit("CONV"))
        .otherwise(F.col("nxt"))
    )
    steps = seq.where(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("src"), mapped_nxt.alias("dst")
    )
    starts = seq.where(F.col("rn") == 1).select(
        F.lit("START").alias("src"),
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("dst"),
    )
    trans = (
        starts.union(steps).groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    )
    rtot = trans.groupBy("src").agg(F.sum("c").alias("r"))
    basec = trans.where(F.col("dst") == "CONV").select(
        F.col("src").alias("state"),
        (F.col("c") * F.lit(1000000)).cast("long").alias("base"),
    )
    states = rtot.select(F.col("src").alias("state"), "r")
    variants = (
        states.where(F.col("state") != "START")
        .select(F.col("state").alias("removed"))
        .union(states.select(F.lit("<none>").alias("removed")).distinct())
    )
    grid = (
        variants.crossJoin(states)
        .join(basec, "state", "left")
        .select(
            "removed",
            "state",
            "r",
            F.coalesce(F.col("base"), F.lit(0).cast("long")).alias("base"),
        )
    )
    tch = trans.where(~F.col("dst").isin("CONV", "NULL")).select(
        F.col("src").alias("state"), "dst", "c"
    )
    # Every variant group needs the full (tiny) transition table: nest
    # it once as a 1-row struct array and broadcast it onto the grid.
    edges1 = tch.agg(
        F.collect_list(F.struct("state", "dst", "c")).alias("edges")
    )
    payload = grid.crossJoin(F.broadcast(edges1))

    def _absorb(pdf):
        import math

        import pandas as pd

        removed = pdf["removed"].iloc[0]
        states_l = list(pdf["state"])
        r_by = {s: int(v) for s, v in zip(pdf["state"], pdf["r"])}
        base_by = {s: int(v) for s, v in zip(pdf["state"], pdf["base"])}
        edges = pdf["edges"].iloc[0]
        adj: dict = {}
        for e in edges if edges is not None else ():
            if e["dst"] != removed:
                adj.setdefault(e["state"], []).append(
                    (e["dst"], int(e["c"]))
                )
        p6 = {s: 0 for s in states_l}
        for _ in range(_MK_ITERS):
            new = {}
            for s in states_l:
                if s == removed:
                    new[s] = 0
                    continue
                csum = 0
                for dst, c in adj.get(s, ()):
                    csum += c * p6.get(dst, 0)
                # int/int true division is correctly rounded, hence
                # identical to the oracle's long->double division
                # below 2^53 (base+csum <= n_events*1e6, the
                # documented domain bound).  Fail loudly if a corpus
                # ever violates the bound (n_events >~ 9e9) instead
                # of silently drifting from the oracle (ADVICE r15).
                if base_by[s] + csum >= 2**53:
                    raise ValueError(
                        "markov removal-effect numerator "
                        f"{base_by[s] + csum} >= 2^53: the integer "
                        "trajectory can no longer match the oracle's "
                        "long->double division exactly"
                    )
                new[s] = math.floor(
                    (base_by[s] + csum) / r_by[s] + 0.5
                )
            p6 = new
        return pd.DataFrame(
            {"removed": [removed], "p6": [p6.get("START", 0)]}
        )

    # pf, pc and the dtot aggregate all branch off this relation: pin
    # it (lazy localCheckpoint materializes once, then is reused) so
    # the corpus prefix + kernel don't recompute per branch.
    p_start = payload.groupBy("removed").applyInPandas(
        _absorb, "removed string, p6 long"
    ).localCheckpoint(eager=False)
    pf = p_start.where(F.col("removed") == "<none>").select(
        F.col("p6").alias("pf6")
    )
    pc = p_start.where(F.col("removed") != "<none>").select(
        F.col("removed").alias("channel"), F.col("p6").alias("pc6")
    )
    joined = pc.crossJoin(F.broadcast(pf))
    dtot = joined.agg(F.sum(F.col("pf6") - F.col("pc6")).alias("dtot"))
    return (
        joined.crossJoin(F.broadcast(dtot))
        .select(
            "channel",
            (F.col("pf6") / F.lit(1000000.0)).alias("p_conv_full"),
            (F.col("pc6") / F.lit(1000000.0)).alias("p_conv_removed"),
            F.when(
                F.col("pf6") > 0,
                pround((F.col("pf6") - F.col("pc6")) / F.col("pf6"), 6),
            ).alias("removal_effect"),
            F.when(
                F.col("dtot") > 0,
                pround((F.col("pf6") - F.col("pc6")) / F.col("dtot"), 6),
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )


def _mk_oracle(iters: int = _MK_ITERS) -> str:
    head = """
WITH numbered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
fp AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'purchase' THEN rn END) AS fp
  FROM numbered GROUP BY user_id
),
trimmed AS (
  SELECT n.user_id, n.event_type, n.rn
  FROM numbered n JOIN fp USING (user_id)
  WHERE fp.fp IS NULL OR n.rn <= fp.fp
),
seq AS (
  SELECT user_id, event_type, rn,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
  FROM trimmed
),
steps AS (
  SELECT event_type AS src,
         CASE WHEN nxt IS NULL THEN 'NULL'
              WHEN nxt = 'purchase' THEN 'CONV'
              ELSE nxt END AS dst
  FROM seq WHERE event_type <> 'purchase'
  UNION ALL
  SELECT 'START' AS src,
         CASE WHEN event_type = 'purchase' THEN 'CONV'
              ELSE event_type END AS dst
  FROM seq WHERE rn = 1
),
trans AS MATERIALIZED (SELECT src, dst, count(*) AS c FROM steps GROUP BY 1, 2),
rtot AS MATERIALIZED (SELECT src, sum(c) AS r FROM trans GROUP BY 1),
basec AS (
  SELECT src AS state, c * CAST(1000000 AS BIGINT) AS base
  FROM trans WHERE dst = 'CONV'
),
states AS (SELECT src AS state, r FROM rtot),
variants AS (
  SELECT state AS removed FROM states WHERE state <> 'START'
  UNION ALL
  SELECT DISTINCT '<none>' FROM states
),
grid AS MATERIALIZED (
  SELECT v.removed, s.state, s.r, coalesce(b.base, 0) AS base
  FROM variants v CROSS JOIN states s
  LEFT JOIN basec b ON b.state = s.state
),
tch AS MATERIALIZED (
  SELECT src AS state, dst, c FROM trans WHERE dst NOT IN ('CONV', 'NULL')
),
p0 AS MATERIALIZED (SELECT removed, state, CAST(0 AS BIGINT) AS p6 FROM grid)"""
    blocks = []
    for k in range(1, iters + 1):
        blocks.append(f""",
c{k} AS MATERIALIZED (
  SELECT p.removed, t.state, sum(t.c * p.p6) AS csum
  FROM tch t JOIN p{k - 1} p ON t.dst = p.state
  WHERE t.dst <> p.removed
  GROUP BY 1, 2
),
p{k} AS MATERIALIZED (
  SELECT g.removed, g.state,
         CASE WHEN g.state = g.removed THEN CAST(0 AS BIGINT)
              ELSE CAST(floor((g.base + coalesce(c.csum, 0)) / g.r + 0.5)
                        AS BIGINT) END AS p6
  FROM grid g LEFT JOIN c{k} c
    ON c.removed = g.removed AND c.state = g.state
)""")
    tail = f"""
SELECT pc.removed AS channel,
       pf.pf6 / 1000000.0 AS p_conv_full,
       pc.p6 / 1000000.0 AS p_conv_removed,
       CASE WHEN pf.pf6 > 0
            THEN floor((pf.pf6 - pc.p6) / pf.pf6 * 1000000 + 0.5) / 1000000.0
       END AS removal_effect,
       CASE WHEN d.dtot > 0
            THEN floor((pf.pf6 - pc.p6) / d.dtot * 1000000 + 0.5) / 1000000.0
       END AS attribution_share
FROM p{iters} pc
CROSS JOIN (SELECT p6 AS pf6 FROM p{iters}
            WHERE removed = '<none>' AND state = 'START') pf
CROSS JOIN (
  SELECT sum(pf2.pf6 - pc2.p6) AS dtot
  FROM p{iters} pc2
  CROSS JOIN (SELECT p6 AS pf6 FROM p{iters}
              WHERE removed = '<none>' AND state = 'START') pf2
  WHERE pc2.removed <> '<none>' AND pc2.state = 'START'
) d
WHERE pc.removed <> '<none>' AND pc.state = 'START'
ORDER BY channel
"""
    return head + "".join(blocks) + tail


QUERIES["events_attribution_markov_removal"] = events_attribution_markov_removal
ORACLE["events_attribution_markov_removal"] = _mk_oracle()


# ---------------------------------------------------------------------------
# HITS hubs/authorities over the user–event-type bipartite graph
# ---------------------------------------------------------------------------

#: Fixed HITS iterations — like the Markov pass, the contract is the
#: state at exactly this round count, re-quantized to the 1e-6 grid
#: after every normalization, so both engines walk the same integers.
_HITS_ITERS = 8


def graph_hits_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the weighted user→event-type bipartite graph: users
    are hubs, event types are authorities, edge weight = interaction
    count.  The mutual-reinforcement score complements
    ``graph_pagerank_bipartite`` (importance via random walk) with
    Kleinberg's importance via endorsement — the shape used to rank
    content categories by the breadth of their power users.

    Exactness discipline: hub/authority state lives on the 1e-6-unit
    LONG grid (h₀ = 1e6 for every user).  Each iteration's raw score
    Σ w·score6 is an exact integer dot product (weights are counts);
    the L∞ normalization floor(raw/max·1e6 + 0.5) is one double
    division of exact integers per node, re-quantized — a ulp cannot
    survive it.  Exact while Σ_users w·h6 fits int64 (≤ n_events·1e6,
    i.e. ~9e12 events — shard the authority sum by user range past
    that).

    Shape: one (user, type) count aggregate ends the corpus-sized
    work; each of the ``_HITS_ITERS`` rounds is a type-sized aggregate
    (authority), a broadcast of the ≤|types| authority table back
    over the edge relation, and a user-keyed aggregate (hubs) — the
    user-sized state carries via lazy localCheckpoint exactly like
    the pagerank rank relation.  Top hub per type breaks ties
    (h6 DESC, user_id ASC) deterministically."""
    edges = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    hubs = edges.select("user_id").distinct().select(
        "user_id", F.lit(1000000).cast("long").alias("h6")
    )
    auth = None
    for _ in range(_HITS_ITERS):
        araw = (
            edges.join(hubs, "user_id")
            .groupBy("event_type")
            .agg(F.sum(F.col("w") * F.col("h6")).alias("araw"))
        )
        amax = araw.agg(F.max("araw").alias("amax"))
        auth = araw.crossJoin(F.broadcast(amax)).select(
            "event_type",
            F.floor(
                F.col("araw") / F.col("amax") * F.lit(1000000) + F.lit(0.5)
            )
            .cast("long")
            .alias("a6"),
        )
        hraw = (
            edges.join(F.broadcast(auth), "event_type")
            .groupBy("user_id")
            .agg(F.sum(F.col("w") * F.col("a6")).alias("hraw"))
        )
        hmax = hraw.agg(F.max("hraw").alias("hmax"))
        hubs = (
            hraw.crossJoin(F.broadcast(hmax))
            .select(
                "user_id",
                F.floor(
                    F.col("hraw") / F.col("hmax") * F.lit(1000000) + F.lit(0.5)
                )
                .cast("long")
                .alias("h6"),
            )
            .localCheckpoint(eager=False)
        )
    wtop = Window.partitionBy("event_type").orderBy(
        F.col("h6").desc(), F.col("user_id").asc()
    )
    tops = (
        edges.join(hubs, "user_id")
        .withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("top_hub_user"),
            (F.col("h6") / F.lit(1000000.0)).alias("top_hub_score"),
        )
    )
    nuse = edges.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        auth.join(nuse, "event_type")
        .join(tops, "event_type")
        .select(
            "event_type",
            (F.col("a6") / F.lit(1000000.0)).alias("authority"),
            "n_users",
            "top_hub_user",
            "top_hub_score",
        )
        .orderBy("event_type")
    )


def _hits_oracle(iters: int = _HITS_ITERS) -> str:
    head = """
WITH edges AS MATERIALIZED (
  SELECT user_id, event_type, count(*) AS w
  FROM events GROUP BY 1, 2
),
h0 AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(1000000 AS BIGINT) AS h6 FROM edges
)"""
    blocks = []
    for k in range(1, iters + 1):
        blocks.append(f""",
araw{k} AS MATERIALIZED (
  SELECT e.event_type, sum(e.w * h.h6) AS araw
  FROM edges e JOIN h{k - 1} h USING (user_id)
  GROUP BY 1
),
a{k} AS MATERIALIZED (
  SELECT event_type,
         CAST(floor(araw / (SELECT max(araw) FROM araw{k}) * 1000000 + 0.5)
              AS BIGINT) AS a6
  FROM araw{k}
),
hraw{k} AS MATERIALIZED (
  SELECT e.user_id, sum(e.w * a.a6) AS hraw
  FROM edges e JOIN a{k} a USING (event_type)
  GROUP BY 1
),
h{k} AS MATERIALIZED (
  SELECT user_id,
         CAST(floor(hraw / (SELECT max(hraw) FROM hraw{k}) * 1000000 + 0.5)
              AS BIGINT) AS h6
  FROM hraw{k}
)""")
    tail = f"""
SELECT a.event_type,
       a.a6 / 1000000.0 AS authority,
       n.n_users,
       t.top_hub_user,
       t.top_hub_score
FROM a{iters} a
JOIN (SELECT event_type, count(*) AS n_users FROM edges GROUP BY 1) n
  USING (event_type)
JOIN (
  SELECT event_type, user_id AS top_hub_user, h6 / 1000000.0 AS top_hub_score
  FROM (
    SELECT e.event_type, e.user_id, h.h6,
           row_number() OVER (PARTITION BY e.event_type
                              ORDER BY h.h6 DESC, e.user_id ASC) AS rk
    FROM edges e JOIN h{iters} h USING (user_id)
  ) WHERE rk = 1
) t USING (event_type)
ORDER BY a.event_type
"""
    return head + "".join(blocks) + tail


QUERIES["graph_hits_user_type"] = graph_hits_user_type
ORACLE["graph_hits_user_type"] = _hits_oracle()
