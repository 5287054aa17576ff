"""Staged operator pack — implemented and oracle-tested THIS round,
registered with the driver NEXT round.

The round driver verifies a 50-key prefix window of the registry per
round.  Round 6's window is exactly filled (36 new keys + 14
edited-key re-verifications, see SURVEY §7 session 3), so these
operators live in a module deliberately OUTSIDE
``operators._modules()``: they ship fully implemented with DuckDB
oracle twins and local differential tests
(tests/test_staged_operators.py) but consume no window slot.  Round 7
flips them live by adding ``staged`` to ``_modules()`` — a one-line
change that perturbs no other module's staleness hash, upon which
every key here enters the window as tier-0 (unverified) and gets its
driver verdict.

Keys staged here follow every pack convention: DataFrame-first
implementation, engine-portable arithmetic (pround / hash buckets /
integer-exact comparisons), scale-shape docstrings, and a matching
ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_stream_writer_spark.functions import cosine_similarity, pround
from parquet_stream_writer_spark.operators.dedup import _hex_to_int_sql
from parquet_stream_writer_spark.sources import load_table, scan_parallel

QUERIES: dict = {}
ORACLE: dict = {}


# ---------------------------------------------------------------------------
# Weighted median (bucketed two-pass)
# ---------------------------------------------------------------------------

#: Value-range buckets for the distributed weighted-median search.
_WM_BUCKETS = 256


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per return flag: the
    weighted-quantile operator (median of l_extendedprice where each
    row counts l_quantity times) — the aggregation exact percentile
    engines cannot do with plain percentile_approx when rows carry
    weights.

    Shape (the sample_ks_drift / pack_sequences prefix discipline):
    per-(flag, value) weight pre-aggregation, a 1-row-per-flag
    min/max/total broadcast, value-range bucketing into
    ``_WM_BUCKETS`` cells, bucket-level weight offsets through a
    bucket-count-sized window, and an in-bucket cumulative weight
    window — no group-sized sort, no single-partition window.  The
    half-total comparison is integer-exact (quantities are integral,
    half = total/2.0 is an exact double), so both engines pick the
    identical LOWER weighted median: the smallest value whose
    cumulative weight reaches half.  Degenerate value skew (all
    weight in one bucket) re-bounds to that bucket's per-VALUE
    relation, which the pre-aggregation already collapsed.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("w"),
    )
    pv = li.groupBy("flag", "v").agg(F.sum("w").alias("w"))
    stats = pv.groupBy("flag").agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("w").alias("total_w"),
        F.count(F.lit(1)).alias("n_values"),
    )
    nb = _WM_BUCKETS
    bucketed = pv.join(F.broadcast(stats), "flag").withColumn(
        "b",
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.lit(nb - 1),
                F.floor((F.col("v") - F.col("vmin")) / (F.col("vmax") - F.col("vmin")) * nb),
            ),
        )
        .otherwise(0)
        .cast("int"),
    )
    per_bucket = bucketed.groupBy("flag", "b").agg(F.sum("w").alias("bw"))
    wo = (
        Window.partitionBy("flag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "flag", "b", F.coalesce(F.sum("bw").over(wo), F.lit(0.0)).alias("off")
    )
    wb = (
        Window.partitionBy("flag", "b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    crossed = (
        bucketed.join(F.broadcast(offsets), ["flag", "b"])
        .withColumn("cumw", F.col("off") + F.sum("w").over(wb))
        .where(F.col("cumw") >= F.col("total_w") / 2.0)
        .groupBy("flag")
        .agg(F.min("v").alias("median_v"))
    )
    return (
        crossed.join(F.broadcast(stats), "flag")
        .select(
            "flag",
            F.col("total_w").cast("long").alias("total_weight"),
            "n_values",
            pround("median_v", 2).alias("weighted_median_price"),
        )
        .orderBy("flag")
    )


# Independent oracle: one flag-partitioned cumulative-weight window.
ORACLE_AGG_WEIGHTED_MEDIAN = """
WITH pv AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v, sum(l_quantity) AS w
  FROM lineitem GROUP BY 1, 2
),
st AS (
  SELECT flag, sum(w) AS total_w, count(*) AS n_values FROM pv GROUP BY 1
),
cum AS (
  SELECT pv.flag, v, st.total_w, st.n_values,
         sum(w) OVER (PARTITION BY pv.flag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM pv JOIN st ON pv.flag = st.flag
)
SELECT flag,
       CAST(total_w AS BIGINT) AS total_weight,
       n_values,
       floor(min(v) FILTER (WHERE cumw >= total_w / 2.0) * 100 + 0.5) / 100.0
         AS weighted_median_price
FROM cum
GROUP BY flag, total_w, n_values
ORDER BY flag
"""

QUERIES["agg_weighted_median"] = agg_weighted_median
ORACLE["agg_weighted_median"] = ORACLE_AGG_WEIGHTED_MEDIAN


# ---------------------------------------------------------------------------
# Gumbel / Efraimidis–Spirakis weighted top-k sampling
# ---------------------------------------------------------------------------

#: Sample size per source.
_GK_K = 10
#: Hash-uniform resolution (8 hex chars of md5).
_GK_SCALE = 16**8


def sample_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministically: the
    Efraimidis–Spirakis one-pass scheme — every doc gets the key
    ``ln(u) / w`` (u a content-hash uniform in (0,1), w = n_chars),
    and the top-``_GK_K`` keys per source are exactly a w-weighted
    sample without replacement.  Unlike `sample_importance_weighted`
    (independent keep/drop coin flips), this draws a FIXED-SIZE
    sample with inclusion probability proportional to weight — the
    shape used to cap per-source contributions while preferring
    substantive documents.

    No RNG state: u derives from the same md5 content hash every
    sampler in the pack uses (conv() fast path Spark-side, portable
    instr-sum in the oracle), so the sample is stable under re-runs,
    repartitioning, and scale-out.  The selection is a per-source
    top-k window (WindowGroupLimit prunes below rank k before the
    sort at scale); the transcendental key is used ONLY for ordering
    and never emitted, so a 1-ulp libm difference cannot perturb the
    value hash (keys of distinct docs are ~1/n² separated).
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
        )
        + 1
    ) / F.lit(float(_GK_SCALE + 2))
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("gk"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("gk"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _GK_K)
        .select(
            "source",
            F.col("rk").cast("int").alias("rk"),
            "doc_id",
            F.col("n_chars").alias("weight"),
        )
        .orderBy("source", "rk")
    )


ORACLE_SAMPLE_GUMBEL_TOPK = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln((CAST({_hex_to_int_sql("md5(CAST(doc_id AS VARCHAR))", 8)} AS BIGINT) + 1)
            / {float(_GK_SCALE + 2)!r}) / n_chars AS gk
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY gk DESC, doc_id ASC) AS rk
  FROM keyed
)
SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, n_chars AS weight
FROM ranked WHERE rk <= {_GK_K}
ORDER BY source, rk
"""

QUERIES["sample_gumbel_topk"] = sample_gumbel_topk
ORACLE["sample_gumbel_topk"] = ORACLE_SAMPLE_GUMBEL_TOPK


# ---------------------------------------------------------------------------
# Interval-overlap join (day-bucketed)
# ---------------------------------------------------------------------------

#: Activity-interval length in days, and the O-side restriction window.
_IV_DAYS = 5
_IV_YEAR = 1995
_IV_MAX_MONTH = 2
_IV_TOP = 20


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: for each open-status order placed in the
    first ``_IV_MAX_MONTH`` months of ``_IV_YEAR``, how many
    fulfilled-status orders have an overlapping ``_IV_DAYS``-day
    activity window — the classic temporal-overlap operator
    (conflicting bookings, concurrent campaigns, co-active sessions)
    that plain equi/as-of joins cannot express.

    Shape: a naive overlap join is a non-equi range predicate —
    BroadcastNestedLoop at best, quadratic at worst.  The scalable
    form BUCKETS time: each interval explodes into its ≤``_IV_DAYS``
    covered calendar days (map-side sequence/explode), the join is a
    plain DAY-equi hash join, and countDistinct collapses multi-day
    matches.  Day-aligned ``_IV_DAYS``-day intervals overlap iff they
    share a calendar day, so the rewrite is EXACT — which the oracle
    proves by running the textbook non-equi |Δdays| < N join
    (DuckDB plans it as an IEJoin).  Output: top ``_IV_TOP`` O-side
    orders by overlap count (TakeOrdered, never a global sort).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.to_date("o_orderdate").alias("d")
    )
    days = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(_IV_DAYS - 1)),
            lambda i: F.date_add(F.col("d"), i),
        )
    ).alias("day")
    oside = (
        orders.where(
            (F.col("o_orderstatus") == "O")
            & (F.year("d") == _IV_YEAR)
            & (F.month("d") <= _IV_MAX_MONTH)
        )
        .select(F.col("o_orderkey").alias("okey"), days)
    )
    fside = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("fkey"), days
    )
    return (
        oside.join(fside, "day")
        .groupBy("okey")
        .agg(F.countDistinct("fkey").alias("n_overlapping"))
        .orderBy(F.desc("n_overlapping"), F.asc("okey"))
        .limit(_IV_TOP)
    )


ORACLE_JOIN_INTERVAL_OVERLAP = f"""
WITH o AS (
  SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS d
  FROM orders
  WHERE o_orderstatus = 'O' AND year(o_orderdate) = {_IV_YEAR}
    AND month(o_orderdate) <= {_IV_MAX_MONTH}
),
f AS (
  SELECT o_orderkey AS fkey, CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderstatus = 'F'
)
SELECT okey, count(DISTINCT fkey) AS n_overlapping
FROM o JOIN f ON abs(date_diff('day', o.d, f.d)) < {_IV_DAYS}
GROUP BY okey
ORDER BY n_overlapping DESC, okey ASC
LIMIT {_IV_TOP}
"""

QUERIES["join_interval_overlap"] = join_interval_overlap
ORACLE["join_interval_overlap"] = ORACLE_JOIN_INTERVAL_OVERLAP


# ---------------------------------------------------------------------------
# DAU/MAU stickiness
# ---------------------------------------------------------------------------

#: Trailing window for "monthly" actives, in days.
_MAU_DAYS = 30


def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily stickiness: DAU / trailing-30-day MAU per day — the
    engagement ratio product analytics tracks everywhere, and a
    rolling-DISTINCT problem (MAU is not a sum of DAUs; users repeat).

    Shape (the `events_wau_rolling` discipline at 30 days): reduce to
    distinct (user, day) pairs first — the only corpus-sized shuffle —
    then explode each pair into the ≤``_MAU_DAYS`` target days it
    keeps a user active for, and countDistinct per target day.  The
    explode multiplies the DEDUPED pair relation, not raw events.
    Stickiness divides two exact integers (deterministic in both
    engines at any rounding).  Only days with observed activity are
    emitted.
    """
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    dau = pairs.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    target = pairs.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_MAU_DAYS - 1)),
                lambda i: F.col("day") + F.make_dt_interval(days=i),
            )
        ).alias("day"),
    )
    mau = target.groupBy("day").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            pround(F.col("dau") / F.col("mau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


ORACLE_EVENTS_DAU_MAU = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM pairs GROUP BY 1),
mau AS (
  SELECT d.day, count(DISTINCT p.user_id) AS mau
  FROM (SELECT DISTINCT day FROM pairs) d
  JOIN pairs p
    ON p.day <= d.day AND p.day > d.day - INTERVAL {_MAU_DAYS} DAY
  GROUP BY 1
)
SELECT dau.day, dau, mau,
       floor((CAST(dau AS DOUBLE) / mau) * 10000 + 0.5) / 10000.0 AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
ORDER BY dau.day
"""

QUERIES["events_dau_mau_stickiness"] = events_dau_mau_stickiness
ORACLE["events_dau_mau_stickiness"] = ORACLE_EVENTS_DAU_MAU


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance re-ranking
# ---------------------------------------------------------------------------

#: MMR trade-off (1.0 = pure relevance), candidate pool, output size.
_MMR_LAMBDA = 0.7
_MMR_CANDS = 30
_MMR_K = 10
#: Fixed query set (the similarity-family convention).
_MMR_QUERIES = 5


def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking of retrieval results:
    greedily pick ``_MMR_K`` of each query's top-``_MMR_CANDS``
    candidates maximizing ``λ·relevance − (1−λ)·max-sim-to-already-
    selected`` — the standard diversification pass between ANN
    retrieval and a RAG/labeling consumer, which plain top-k cannot
    express (near-duplicate hits crowd the list).

    Shape (the Lloyd/BPE loop discipline): candidate retrieval is the
    exact broadcast-query scan (`similarity_cosine_topk` shape); the
    candidate set (≤ queries×30 rows) and its pairwise-sim relation
    (≤ queries×30² rows) are built once and checkpointed; each greedy
    round then runs entirely on those BOUNDED relations — one
    max-sim-to-selected aggregate, one anti-join, one rank-1 window —
    so the iteration cost is independent of corpus size.  All
    comparisons happen on 4-dp-rounded similarities with identical
    λ-arithmetic in both engines (ties → vec_id), so the greedy
    trajectory is engine-exact; the oracle replays it as an unrolled
    per-round CTE chain.
    """
    from parquet_stream_writer_spark.operators.similarity import _emb

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < _MMR_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    scored = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        "emb",
        pround(cosine_similarity(F.col("qemb"), F.col("emb")), 4).alias("rel"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("vec_id"))
    cands = (
        scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _MMR_CANDS)
        .select("qid", "vec_id", "rel", "emb")
        .localCheckpoint(eager=False)
    )
    c1 = cands.select("qid", F.col("vec_id").alias("a"), F.col("emb").alias("ea"))
    c2 = cands.select("qid", F.col("vec_id").alias("b"), F.col("emb").alias("eb"))
    pairs = (
        c1.join(c2, "qid")
        .where(F.col("a") != F.col("b"))
        .select(
            "qid",
            "a",
            "b",
            pround(cosine_similarity(F.col("ea"), F.col("eb")), 4).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    sel = (
        cands.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") == 1)
        .select(
            "qid",
            "vec_id",
            "rel",
            (F.lit(lam) * F.col("rel")).alias("score"),
            F.lit(1).alias("pos"),
        )
    )
    for r in range(2, _MMR_K + 1):
        ms = (
            pairs.join(
                sel.select("qid", F.col("vec_id").alias("b")), ["qid", "b"]
            )
            .groupBy("qid", "a")
            .agg(F.max("s").alias("ms"))
        )
        remaining = cands.join(
            sel.select("qid", "vec_id"), ["qid", "vec_id"], "left_anti"
        )
        scored_r = remaining.join(
            ms.select("qid", F.col("a").alias("vec_id"), "ms"), ["qid", "vec_id"]
        ).select(
            "qid",
            "vec_id",
            "rel",
            (F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("ms")).alias("score"),
        )
        wr = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
        pick = (
            scored_r.withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1)
            .select("qid", "vec_id", "rel", "score", F.lit(r).alias("pos"))
        )
        # Checkpoint the ≤(queries·r)-row selection state each round
        # (the sample_coreset_kcenter loop discipline): without it the
        # lazily-chained union/anti-join lineage deepens every round
        # and Catalyst's analysis time explodes.
        sel = sel.unionByName(pick).localCheckpoint(eager=False)
    return sel.select(
        "qid",
        F.col("pos").cast("int").alias("pos"),
        "vec_id",
        F.col("rel").alias("relevance"),
        pround("score", 6).alias("mmr_score"),
    ).orderBy("qid", "pos")


# Unrolled-CTE greedy replay (module-level code, not a helper fn).
_MMR_ORACLE_PARTS = [
    f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM emb WHERE vec_id < {_MMR_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id, e.emb,
         floor(list_cosine_similarity(q.qemb, e.emb) * 10000 + 0.5) / 10000.0 AS rel
  FROM emb e JOIN q ON e.vec_id <> q.qid
),
cand AS MATERIALIZED (
  SELECT qid, vec_id, emb, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {_MMR_CANDS}
),
cpair AS MATERIALIZED (
  SELECT c1.qid, c1.vec_id AS a, c2.vec_id AS b,
         floor(list_cosine_similarity(c1.emb, c2.emb) * 10000 + 0.5) / 10000.0 AS s
  FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid AND c1.vec_id <> c2.vec_id
),
sel1 AS MATERIALIZED (
  SELECT qid, vec_id, rel, {_MMR_LAMBDA!r} * rel AS score, 1 AS pos FROM (
    SELECT qid, vec_id, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
)"""
]
for _r in range(2, _MMR_K + 1):
    _MMR_ORACLE_PARTS.append(
        f""",
msr{_r} AS MATERIALIZED (
  SELECT p.qid, p.a AS vec_id, max(p.s) AS ms
  FROM cpair p JOIN sel{_r - 1} s ON p.qid = s.qid AND p.b = s.vec_id
  GROUP BY 1, 2
),
pick{_r} AS MATERIALIZED (
  SELECT qid, vec_id, rel, score, {_r} AS pos FROM (
    SELECT c.qid, c.vec_id, c.rel,
           {_MMR_LAMBDA!r} * c.rel - {1.0 - _MMR_LAMBDA!r} * m.ms AS score,
           row_number() OVER (PARTITION BY c.qid
             ORDER BY ({_MMR_LAMBDA!r} * c.rel - {1.0 - _MMR_LAMBDA!r} * m.ms) DESC,
                      c.vec_id ASC) AS rn
    FROM cand c
    JOIN msr{_r} m ON c.qid = m.qid AND c.vec_id = m.vec_id
    WHERE NOT EXISTS (
      SELECT 1 FROM sel{_r - 1} s WHERE s.qid = c.qid AND s.vec_id = c.vec_id)
  ) WHERE rn = 1
),
sel{_r} AS MATERIALIZED (SELECT * FROM sel{_r - 1} UNION ALL SELECT * FROM pick{_r})"""
    )
_MMR_ORACLE_PARTS.append(
    f"""
SELECT qid, CAST(pos AS INTEGER) AS pos, vec_id, rel AS relevance,
       floor(score * 1000000 + 0.5) / 1000000.0 AS mmr_score
FROM sel{_MMR_K}
ORDER BY qid, pos
"""
)
ORACLE_SIMILARITY_MMR_RERANK = "".join(_MMR_ORACLE_PARTS)

QUERIES["similarity_mmr_rerank"] = similarity_mmr_rerank
ORACLE["similarity_mmr_rerank"] = ORACLE_SIMILARITY_MMR_RERANK
