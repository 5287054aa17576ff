"""Fifth staged operator pack — built in round 11, REGISTERED with
the driver in round 12 (registry 286 → 296) after the pack-growth gate
cleared (CORRECTNESS_r11 50/50 green, bench projection ~204 s) and the
four ADVICE r11 latents were closed pre-registration.

Same contract as the first four staged packs (operators/staged.py
round 6 → 7, staged2.py 7 → 8, staged3.py 8 → 9, staged4.py 9 → 10):
every key ships with a DataFrame-first implementation, an ANSI/DuckDB
oracle twin, engine-portable arithmetic (pround / 1e-6 integer
quantization / cross-multiplied comparisons / single double
expressions over exact integer sums), a scale-shape docstring, and
local differential tests (tests/test_staged5_operators.py).

The pack leans into the embedding/similarity surface (where the test
corpus is rich) plus sampling/events/text policy operators:

- ``embedding_knn_label_audit``     — leave-one-out kNN label accuracy
- ``embedding_hubness_audit``       — kNN-graph in-degree hubness
- ``embedding_binarization_distortion`` — sign-bit code fidelity
- ``embedding_centroid_margin``     — 1st-vs-2nd centroid margin
- ``similarity_threshold_calibration`` — cosine cut precision/recall
- ``similarity_bucket_occupancy_audit`` — sign-bucket capacity audit
- ``sample_pps_systematic``         — PPS systematic sampling
- ``sample_temporal_embargo_split`` — temporal split + balance audit
- ``events_error_rate_slo``         — hourly error-share SLO breaches
- ``text_token_budget_truncation``  — context-cap truncation loss

Reference parity note: the reference repo is a streaming Parquet
writer (``/root/reference/src/parquet_stream_writer/writer.py``) with
no query surface; these operators extend the engine's
training-data-pipeline mandate, not a reference port.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_stream_writer_spark.functions import WS_CLASS, pround, sql_round
from parquet_stream_writer_spark.operators.dedup import (
    _hex_prefix_int,
    _hex_to_int_sql,
)
from parquet_stream_writer_spark.sources import load_table, scan_parallel

QUERIES: dict = {}
ORACLE: dict = {}


# ---------------------------------------------------------------------------
# Shared: exact directed k-NN over the block-pair grid
# ---------------------------------------------------------------------------

#: Block-grid width for the directed k-NN build.  Work splits into
#: B(B+1)/2 block-pair tasks of ≤ 2·n/B rows each; at 100 TB scale B
#: grows with the corpus so one task's matmul stays executor-sized,
#: and replication is exactly B rows per vector — never n².
_KNN_BLOCKS = 8
#: Neighbours per query for the label/hubness audits.
_KNN_K = 5
#: The corpus' trained dimensionality — the pair kernels matmul a
#: dense (rows × dim) matrix, so a ragged row would crash np.asarray;
#: rows of any other length are out of the audits' domain (the same
#: contract embedding_centroid_margin states, and the oracles' len()
#: predicate mirrors it).
_KNN_DIM = 64


def _emb5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan_parallel(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        "label",
    )


def _eligible_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors the pair miners can actually score: non-null, exactly
    ``_KNN_DIM`` wide (ragged rows would crash the dense matmul),
    no NULL elements (Spark's fold would propagate NULL while DuckDB's
    ``list_sum`` skips NULLs and returns a partial sum — ADVICE r11 —
    so the domain pins them out in BOTH engines), and nonzero-norm
    (cosine undefined).  The oracle twin of this filter is
    ``len(embedding) = 64 AND len(list_filter(x -> x IS NULL)) = 0
    AND list_sum(x*x) > 0``."""
    return _emb5(spark, sf_dir).where(
        F.col("emb").isNotNull()
        & (F.size("emb") == _KNN_DIM)
        & ~F.exists("emb", lambda x: x.isNull())
        & (
            F.aggregate(
                "emb", F.lit(0.0), lambda acc, x: acc + x * x
            )
            > 0
        )
    )


def _knn_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate each (vector, label) to its ``_KNN_BLOCKS`` block-pair
    groups — the 2D-grid decomposition of distributed all-pairs.  The
    label rides along so no downstream join is needed to vote.

    Deliberately a sibling of similarity.py's ``_pair_blocks`` rather
    than an import: a cross-module helper edit would float every
    similarity key's attested source hash at once (the module-helper
    hash design), so each pack owns its copy of the convention; the
    blocking here uses ``pmod`` so a negative vector id still lands in
    0..B-1 (a signed id under Spark's sign-preserving ``%`` would get
    a block no diagonal group ever forms for, silently dropping its
    same-block pairs)."""
    emb = _eligible_emb(spark, sf_dir)
    peers = F.array(*[F.lit(i) for i in range(_KNN_BLOCKS)])
    return (
        emb.withColumn(
            "blk", F.expr(f"pmod(vec_id, {_KNN_BLOCKS})").cast("int")
        )
        .withColumn("peer", F.explode(peers))
        .select(
            F.least("blk", "peer").alias("bi"),
            F.greatest("blk", "peer").alias("bj"),
            "blk",
            "vec_id",
            "label",
            "emb",
        )
    )


def _knn_local_kernel(k: int):
    """Per-block-pair numpy kernel: each group emits, for every vector
    it holds, that vector's LOCAL top-``k`` neighbours among the
    group's valid candidates (cross-block only when bi≠bj, so each
    directed pair is scored exactly once across the grid).  Cosines
    are 4-dp half-up rounded BEFORE selection — the same arithmetic as
    the DuckDB oracle — with (sim desc, nid asc) tie-break."""
    import pandas as pd

    def kernel(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        blks = pdf["blk"].to_numpy()
        labs = pdf["label"].to_numpy()
        mat = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        ok = norms > 0
        sims = np.zeros((len(ids), len(ids)))
        if ok.any():
            m = mat[ok]
            sims_ok = (m @ m.T) / np.outer(norms[ok], norms[ok])
            sims[np.ix_(ok, ok)] = sims_ok
        sims = np.floor(sims * 10000.0 + 0.5) / 10000.0
        mask = ids[None, :] != ids[:, None]
        mask &= ok[None, :] & ok[:, None]
        if bi != bj:
            mask &= blks[None, :] != blks[:, None]
        out: dict[str, list] = {
            "qid": [], "q_label": [], "nid": [], "n_label": [], "sim": []
        }
        for r in range(len(ids)):
            cand = np.nonzero(mask[r])[0]
            if not len(cand):
                continue
            s = sims[r, cand]
            sel = cand[np.lexsort((ids[cand], -s))[:k]]
            out["qid"].extend([ids[r]] * len(sel))
            out["q_label"].extend([labs[r]] * len(sel))
            out["nid"].extend(ids[sel])
            out["n_label"].extend(labs[sel])
            out["sim"].extend(sims[r, sel])
        return pd.DataFrame(out)

    return kernel


def _directed_knn(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Exact directed k-NN relation (qid → its ``k`` nearest by
    4-dp-rounded cosine, ties by nid asc), built as per-group local
    top-k + one global per-query window over ≤ B·k candidates per
    query — the union of local top-ks provably contains the global
    top-k, so the result is exact with n·B shuffle rows, never n².

    The relation is defined over LABELED vectors only (``label IS NOT
    NULL``, pinned identically in the oracle CTE): the label rides
    through the kernel's ``int`` Arrow schema (a NaN from a nullable
    label would fail the conversion) and into the audits' vote/degree
    semantics, so excluding unlabeled vectors from the graph domain in
    both engines closes ADVICE r11 items 1–2 (NaN labels, NULL
    tie-break order) at the domain boundary instead of per-consumer."""
    local = (
        _knn_blocks(spark, sf_dir)
        .where(F.col("label").isNotNull())
        .groupBy("bi", "bj")
        .applyInPandas(
            _knn_local_kernel(k),
            schema="qid long, q_label int, nid long, n_label int, sim double",
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        local.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def _sql_directed_knn(k: int) -> str:
    """Oracle CTE body producing the same directed k-NN relation."""
    return f"""
emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings
  WHERE len(embedding) = {_KNN_DIM}
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0
    AND label IS NOT NULL
),
knn AS (
  SELECT qid, q_label, nid, n_label, sim, rk FROM (
    SELECT q.vec_id AS qid, q.label AS q_label,
           e.vec_id AS nid, e.label AS n_label,
           floor(list_cosine_similarity(q.emb, e.emb) * 10000 + 0.5)
             / 10000.0 AS sim,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY floor(list_cosine_similarity(q.emb, e.emb) * 10000
                            + 0.5) / 10000.0 DESC, e.vec_id ASC) AS rk
    FROM emb q JOIN emb e ON q.vec_id <> e.vec_id
  ) WHERE rk <= {k}
)"""


# ---------------------------------------------------------------------------
# Leave-one-out kNN label audit
# ---------------------------------------------------------------------------


def embedding_knn_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN label accuracy per label: each vector is
    classified by the majority label of its 5 nearest neighbours
    (cosine, self excluded) and scored against its own label — the
    standard probe for how label-coherent an embedding space is
    before trusting it for semantic dedup or curation.

    Exactness: cosines are 4-dp half-up rounded BEFORE neighbour
    selection (the pack's pair-mining convention, so a rounding tie
    cannot flip membership between engines); neighbour ties break by
    nid asc, vote ties by (votes desc, label asc); counts are exact
    integers and the accuracy is ONE division of two exact integers,
    6-dp rounded.

    Shape: block-grid local top-k (B(B+1)/2 tasks, ≤ 2n/B rows each,
    BLAS matmul inside ``applyInPandas``) → one per-query window over
    ≤ B·k candidates → vote hash aggregate on (qid, label) → label
    rollup.  Shuffle volume n·B rows; no n² relation, no collect.
    At 100 TB, B grows with the corpus and the same plan holds; an
    IVF/LSH candidate generator can replace the exact grid when the
    audit tolerates approximate neighbours.
    """
    knn = _directed_knn(spark, sf_dir, _KNN_K)
    votes = knn.groupBy("qid", "q_label", "n_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("n_label"))
    pred = votes.withColumn("vr", F.row_number().over(wv)).where(
        F.col("vr") == 1
    )
    return (
        pred.groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n_vecs",
            "n_correct",
            pround(F.col("n_correct") / F.col("n_vecs"), 6).alias("accuracy"),
        )
        .orderBy("label")
    )


ORACLE_EMBEDDING_KNN_LABEL_AUDIT = f"""
WITH {_sql_directed_knn(_KNN_K)},
v AS (
  SELECT qid, q_label, n_label, count(*) AS votes
  FROM knn GROUP BY 1, 2, 3
),
p AS (
  SELECT qid, q_label, n_label,
         row_number() OVER (PARTITION BY qid
                            ORDER BY votes DESC, n_label ASC) AS vr
  FROM v
)
SELECT q_label AS label,
       count(*) AS n_vecs,
       CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       {sql_round('CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS DOUBLE) / count(*)', 6)}
         AS accuracy
FROM p WHERE vr = 1
GROUP BY q_label
ORDER BY q_label
"""

QUERIES["embedding_knn_label_audit"] = embedding_knn_label_audit
ORACLE["embedding_knn_label_audit"] = ORACLE_EMBEDDING_KNN_LABEL_AUDIT


# ---------------------------------------------------------------------------
# kNN-graph hubness audit
# ---------------------------------------------------------------------------


def embedding_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree histogram of the directed k-NN graph: how many
    vectors appear in exactly ``d`` other vectors' top-5 lists.  High
    maximum in-degree (hub vectors) is the classic high-dimensional
    pathology that concentrates ANN results onto a few points and
    silently biases semantic dedup; a healthy space has in-degree
    concentrated near k with a thin tail and few zero-degree
    anti-hubs.

    Exactness: the k-NN relation is the 4-dp pre-rounded exact build
    shared with the label audit; in-degrees and bucket counts are
    exact integers; the vector share is ONE division of two exact
    integers, 6-dp rounded.

    Shape: k-NN build (see ``embedding_knn_label_audit``) → in-degree
    hash aggregate (≤ n rows) → left join from the id relation to
    re-admit zero-degree vectors → degree histogram (O(k·B) distinct
    degrees) → the share's denominator comes from an unpartitioned
    window over the histogram itself, NOT a second corpus scan.  No
    n² anywhere.
    """
    knn = _directed_knn(spark, sf_dir, _KNN_K).select("nid")
    indeg = knn.groupBy("nid").agg(F.count(F.lit(1)).alias("deg"))
    ids = _emb5(spark, sf_dir).select("vec_id")
    deg = ids.join(indeg, ids.vec_id == indeg.nid, "left").select(
        F.coalesce(F.col("deg"), F.lit(0)).alias("in_degree")
    )
    # n_total is derivable from the histogram itself (Σ n_vecs over a
    # ≤ k·B+1-row relation) — an unpartitioned window there beats a
    # second full corpus scan for the count (review r11 finding).
    hist = deg.groupBy("in_degree").agg(F.count(F.lit(1)).alias("n_vecs"))
    w_all = Window.partitionBy()
    return (
        hist.withColumn("n_total", F.sum("n_vecs").over(w_all))
        .select(
            F.col("in_degree").cast("long").alias("in_degree"),
            "n_vecs",
            pround(F.col("n_vecs") / F.col("n_total"), 6).alias("vec_share"),
        )
        .orderBy("in_degree")
    )


ORACLE_EMBEDDING_HUBNESS_AUDIT = f"""
WITH {_sql_directed_knn(_KNN_K)},
indeg AS (SELECT nid, count(*) AS deg FROM knn GROUP BY 1),
deg AS (
  SELECT coalesce(i.deg, 0) AS in_degree
  FROM (SELECT vec_id FROM embeddings) e LEFT JOIN indeg i
    ON e.vec_id = i.nid
)
SELECT CAST(in_degree AS BIGINT) AS in_degree,
       count(*) AS n_vecs,
       {sql_round('CAST(count(*) AS DOUBLE) / sum(count(*)) OVER ()', 6)}
         AS vec_share
FROM deg
GROUP BY in_degree
ORDER BY in_degree
"""

QUERIES["embedding_hubness_audit"] = embedding_hubness_audit
ORACLE["embedding_hubness_audit"] = ORACLE_EMBEDDING_HUBNESS_AUDIT


# ---------------------------------------------------------------------------
# Sign-bit binarization distortion
# ---------------------------------------------------------------------------


def embedding_binarization_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fidelity of the sign-bit binary code per label: the cosine
    between each vector and its own sign vector (±1 per dimension) is
    Σ|vᵢ| / √(d·Σvᵢ²) in closed form — no pair expansion, no decode.
    This prices the recall a Hamming-code ANN tier (see
    ``similarity_hamming_topk``) can possibly achieve: labels whose
    vectors poorly align with their own sign pattern will lose
    neighbours to binarization.

    Exactness: components quantize to 1e-6-unit integers FIRST (pack
    convention), so Σ|v₆| and d·Σv₆² are exact integer aggregates
    (long fold, ADVICE r10 convention); the per-vector cosine is ONE
    double expression of exact integers quantized back to 1e-6 units,
    making the per-label mean an exact integer sum divided once.
    min/max are order statistics of exact integers.

    Shape: one linear pass (two array folds per row), one label hash
    aggregate — no shuffle beyond the rollup, no joins.
    """
    emb = (
        _emb5(spark, sf_dir)
        # NULL-element rows are pinned out of the domain in BOTH
        # engines (same ADVICE r11 class as _eligible_emb: Spark's
        # fold would NULL the row out via the ssq>0 filter while
        # DuckDB's sum skips NULLs and keeps a partial-sum row).
        .where(~F.exists("emb", lambda x: x.isNull()))
        .select(
            "vec_id",
            "label",
            F.transform(
                "emb",
                lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long"),
            ).alias("v6s"),
        )
    )
    per = (
        emb.select(
            "label",
            F.size("v6s").cast("long").alias("d"),
            F.aggregate(
                "v6s", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
            ).alias("sabs"),
            F.aggregate(
                "v6s", F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ).alias("ssq"),
        )
        .where(F.col("ssq") > 0)
        .select(
            "label",
            F.floor(
                F.col("sabs")
                / F.sqrt((F.col("d") * F.col("ssq")).cast("double"))
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cos6"),
        )
    )
    return (
        per.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("cos6").alias("sum6"),
            F.min("cos6").alias("min6"),
            F.max("cos6").alias("max6"),
        )
        .select(
            "label",
            "n_vecs",
            pround(F.col("sum6") / F.col("n_vecs") / 1000000.0, 6).alias(
                "mean_cos_binary"
            ),
            (F.col("min6") / 1000000.0).alias("min_cos_binary"),
            (F.col("max6") / 1000000.0).alias("max_cos_binary"),
        )
        .orderBy("label")
    )


ORACLE_EMBEDDING_BINARIZATION_DISTORTION = f"""
WITH comps AS (
  SELECT vec_id, label,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS v6
  FROM embeddings
  WHERE len(list_filter(embedding, x -> x IS NULL)) = 0
),
per AS (
  SELECT vec_id, label,
         CAST(floor(sum(abs(v6))
                    / sqrt(CAST(count(*) * sum(v6 * v6) AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS cos6
  FROM comps GROUP BY 1, 2 HAVING sum(v6 * v6) > 0
)
SELECT label,
       count(*) AS n_vecs,
       {sql_round('CAST(sum(cos6) AS DOUBLE) / count(*) / 1000000.0', 6)}
         AS mean_cos_binary,
       min(cos6) / 1000000.0 AS min_cos_binary,
       max(cos6) / 1000000.0 AS max_cos_binary
FROM per GROUP BY label ORDER BY label
"""

QUERIES["embedding_binarization_distortion"] = (
    embedding_binarization_distortion
)
ORACLE["embedding_binarization_distortion"] = (
    ORACLE_EMBEDDING_BINARIZATION_DISTORTION
)


# ---------------------------------------------------------------------------
# Nearest-vs-second-nearest centroid margin
# ---------------------------------------------------------------------------

#: Fixed probe centroids (deterministic literals — 4-dp rounded so the
#: decimal text parses to identical doubles in Spark and DuckDB, then
#: quantized to 1e-6 integers like the vectors).
_MARGIN_K = 8
_MARGIN_DIM = 64


def _margin_centroids() -> np.ndarray:
    rng = np.random.RandomState(11)
    return np.round(rng.standard_normal((_MARGIN_K, _MARGIN_DIM)) * 0.1, 4)


def embedding_centroid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment-confidence audit: per assigned centroid, the mean
    squared distance to the nearest centroid and the mean MARGIN
    (second-nearest minus nearest squared distance).  Thin margins
    mark boundary vectors — exactly the population SemDeDup-style
    cluster pruning and IVF routing misassign first; a cell whose mean
    margin collapses needs more centroids or a re-train.

    Exactness: vectors and centroid literals both quantize to 1e-6
    integers, so every squared distance Σ(v₆−c₆)² is an EXACT integer
    (no float ordering anywhere); nearest/second break ties by
    centroid id; means are exact integer sums divided once, reported
    in raw-squared units (÷1e12), 6-dp rounded.

    Shape: K zip_with folds per row (JVM codegen), a K-row explode,
    one per-vector window over K rows, one centroid rollup — linear
    in n·K·d multiply-adds, constant output.  At scale the centroid
    set is a broadcast literal and the plan is one map stage + one
    bounded aggregate.
    """
    cents6 = [
        [int(round(float(x) * 1000000)) for x in row]
        for row in _margin_centroids()
    ]
    emb = (
        _emb5(spark, sf_dir)
        # The probe centroids are trained at the corpus dimensionality;
        # malformed rows of another length — or rows with NULL
        # elements, where Spark's fold yields a NULL distance that
        # would sort NEAREST under ASC while DuckDB sums the non-null
        # remainder (ADVICE r11) — are out of the audit's domain (the
        # oracle's len()/list_filter predicates mirror this).
        .where(
            (F.size("emb") == _MARGIN_DIM)
            & ~F.exists("emb", lambda x: x.isNull())
        )
        .select(
            "vec_id",
            F.transform(
                "emb",
                lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long"),
            ).alias("v6s"),
        )
    )
    dists = [
        F.aggregate(
            F.zip_with(
                "v6s",
                F.array(*[F.lit(c).cast("long") for c in cents6[k]]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"d{k}")
        for k in range(_MARGIN_K)
    ]
    stacked = emb.select("vec_id", *dists).select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("cid"),
                        F.col(f"d{k}").alias("d2"),
                    )
                    for k in range(_MARGIN_K)
                ]
            )
        ).alias("c"),
    ).select("vec_id", F.col("c.cid").alias("cid"), F.col("c.d2").alias("d2"))
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
    ranked = stacked.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= 2
    )
    per_vec = ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rk") == 1, F.col("cid"))).alias("near_cid"),
        F.max(F.when(F.col("rk") == 1, F.col("d2"))).alias("d1"),
        F.max(F.when(F.col("rk") == 2, F.col("d2"))).alias("d2nd"),
    )
    return (
        per_vec.groupBy(F.col("near_cid").alias("cid"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("d1").alias("sd1"),
            F.sum(F.col("d2nd") - F.col("d1")).alias("smargin"),
        )
        .select(
            "cid",
            "n_vecs",
            pround(F.col("sd1") / F.col("n_vecs") / 1e12, 6).alias(
                "mean_d2_near"
            ),
            pround(F.col("smargin") / F.col("n_vecs") / 1e12, 6).alias(
                "mean_margin"
            ),
        )
        .orderBy("cid")
    )


def _sql_margin_cents() -> str:
    rows = []
    for k, row in enumerate(_margin_centroids()):
        lits = ", ".join(str(int(round(float(x) * 1000000))) for x in row)
        rows.append(f"SELECT {k} AS cid, [{lits}]::BIGINT[] AS c6s")
    return " UNION ALL ".join(rows)


ORACLE_EMBEDDING_CENTROID_MARGIN = f"""
WITH comps AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS v6
  FROM embeddings WHERE len(embedding) = {_MARGIN_DIM}
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
),
cents AS (
  SELECT cid, generate_subscripts(c6s, 1) AS dim, unnest(c6s) AS c6
  FROM ({_sql_margin_cents()})
),
dists AS (
  SELECT v.vec_id, c.cid, sum((v.v6 - c.c6) * (v.v6 - c.c6)) AS d2
  FROM comps v JOIN cents c ON v.dim = c.dim
  GROUP BY 1, 2
),
ranked AS (
  SELECT vec_id, CAST(cid AS INTEGER) AS cid, d2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, cid ASC) AS rk
  FROM dists
),
per_vec AS (
  SELECT vec_id,
         max(CASE WHEN rk = 1 THEN cid END) AS near_cid,
         max(CASE WHEN rk = 1 THEN d2 END) AS d1,
         max(CASE WHEN rk = 2 THEN d2 END) AS d2nd
  FROM ranked WHERE rk <= 2 GROUP BY 1
)
SELECT near_cid AS cid,
       count(*) AS n_vecs,
       {sql_round('CAST(sum(d1) AS DOUBLE) / count(*) / 1e12', 6)}
         AS mean_d2_near,
       {sql_round('CAST(sum(d2nd - d1) AS DOUBLE) / count(*) / 1e12', 6)}
         AS mean_margin
FROM per_vec GROUP BY near_cid ORDER BY cid
"""

QUERIES["embedding_centroid_margin"] = embedding_centroid_margin
ORACLE["embedding_centroid_margin"] = ORACLE_EMBEDDING_CENTROID_MARGIN


# ---------------------------------------------------------------------------
# Cosine-threshold calibration against labels
# ---------------------------------------------------------------------------

#: Cut grid for the calibration sweep (the corpus' pair cosines top
#: out near 0.5, so this grid is non-degenerate at every test SF and
#: still meaningful on a real near-dup corpus where it marks the
#: conservative tail).
_CAL_THRESHOLDS = (0.15, 0.2, 0.25, 0.3, 0.35)
_CAL_BLOCKS = 8


def _cal_kernel():
    """Block-pair kernel emitting every distinct pair (v1 < v2) with
    4-dp cosine strictly above the grid minimum, plus a same-label
    flag — the only pairs any grid cut can count."""
    import pandas as pd

    tmin = min(_CAL_THRESHOLDS)

    def kernel(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        blks = pdf["blk"].to_numpy()
        labs = pdf["label"].to_numpy()
        mat = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        ok = norms > 0
        sims = np.full((len(ids), len(ids)), -2.0)
        if ok.any():
            m = mat[ok]
            sims[np.ix_(ok, ok)] = (m @ m.T) / np.outer(norms[ok], norms[ok])
        sims = np.floor(sims * 10000.0 + 0.5) / 10000.0
        mask = ids[None, :] > ids[:, None]
        if bi != bj:
            mask &= blks[None, :] != blks[:, None]
        mask &= sims > tmin
        p, q = np.nonzero(mask)
        # SQL equality semantics for the label match: NULL = NULL is
        # NOT a match (numpy object arrays would say None == None).
        eq = labs[p] == labs[q]
        nn = pd.notna(labs[p]) & pd.notna(labs[q])
        return pd.DataFrame(
            {
                "v1": ids[p].astype(np.int64),
                "v2": ids[q].astype(np.int64),
                "sim": sims[p, q],
                "same": (eq & nn).astype(np.int32),
            }
        )

    return kernel


def similarity_threshold_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Precision/recall of a cosine near-dup cut, calibrated against
    the label column as ground truth: for each threshold in the grid,
    how many pairs the cut keeps, how many of those share a label
    (precision), and what share of ALL same-label pairs it recovers
    (recall).  This is the sweep that turns an arbitrary 0.8-ish
    near-dup threshold into a measured operating point before running
    semantic dedup over a corpus.

    Exactness: cosines 4-dp pre-rounded; thresholds are exact 2-dp
    literals compared strictly (``sim > t``), so no rounding boundary
    is ambiguous; pair/same counts are exact integers; the same-label
    pair total is the closed form Σ C(n_label, 2) over the MINEABLE
    vectors (non-null label, valid dim, nonzero norm — counting pairs
    the miner can never emit would systematically understate every
    recall); precision/recall are single divisions, 6-dp, NULL when
    the denominator is zero.

    Shape: block-grid pair mining pruned AT THE KERNEL to the grid
    minimum (output is the surviving-pair relation, linear-ish in
    practice, never materialized n²); each surviving pair is then
    folded to its BAND — the highest cut it clears, one map-side CASE
    chain using the same strict comparisons as the per-cut test — so
    the per-threshold counts are cumulative sums over a ≤ |grid|-row
    band aggregate with ZERO row replication (review r11: the earlier
    broadcast-grid expansion streamed every surviving pair through
    the join up to |grid| times); finally a 1-row label-pair-total
    broadcast.
    """
    pairs = (
        _knn_blocks(spark, sf_dir)
        .groupBy("bi", "bj")
        .applyInPandas(
            _cal_kernel(),
            schema="v1 long, v2 long, sim double, same int",
        )
    )
    ts = sorted(_CAL_THRESHOLDS)
    band = F.when(F.col("sim") > ts[-1], F.lit(len(ts)))
    for i in range(len(ts) - 1, 0, -1):
        band = band.when(F.col("sim") > ts[i - 1], F.lit(i))
    bc = (
        pairs.select(band.otherwise(F.lit(0)).alias("band"), "same")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("same").cast("long").alias("s"),
        )
    )
    ks = spark.range(len(ts)).select(
        (F.col("id") + 1).cast("int").alias("idx"),
        F.element_at(
            F.array(*[F.lit(float(t)) for t in ts]),
            (F.col("id") + 1).cast("int"),
        ).alias("threshold"),
    )
    counted = (
        ks.join(F.broadcast(bc), F.col("band") >= F.col("idx"), "left")
        .groupBy("idx", "threshold")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.sum("s"), F.lit(0))
            .cast("long")
            .alias("n_same_label"),
        )
        .drop("idx")
    )
    same_total = (
        _eligible_emb(spark, sf_dir)
        .where(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("nl"))
        .agg(
            F.coalesce(
                F.sum(F.col("nl") * (F.col("nl") - 1) / 2), F.lit(0)
            )
            .cast("long")
            .alias("total_same")
        )
    )
    return (
        counted.join(F.broadcast(same_total))
        .select(
            "threshold",
            "n_pairs",
            "n_same_label",
            F.when(
                F.col("n_pairs") > 0,
                pround(F.col("n_same_label") / F.col("n_pairs"), 6),
            ).alias("precision"),
            F.when(
                F.col("total_same") > 0,
                pround(F.col("n_same_label") / F.col("total_same"), 6),
            ).alias("recall"),
        )
        .orderBy("threshold")
    )


def _sql_cal_band() -> str:
    """CASE chain assigning each surviving pair the highest cut it
    clears — the oracle twin of the Spark band expression."""
    ts = sorted(_CAL_THRESHOLDS)
    whens = " ".join(
        f"WHEN sim > {ts[i - 1]} THEN {i}"
        for i in range(len(ts), 0, -1)
    )
    return f"CASE {whens} ELSE 0 END"


ORACLE_SIMILARITY_THRESHOLD_CALIBRATION = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings
  WHERE len(embedding) = {_KNN_DIM}
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0
),
pairs AS (
  SELECT floor(list_cosine_similarity(a.emb, b.emb) * 10000 + 0.5)
           / 10000.0 AS sim,
         CASE WHEN a.label IS NOT NULL AND b.label IS NOT NULL
                   AND a.label = b.label THEN 1 ELSE 0 END AS same
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
),
bands AS (
  SELECT {_sql_cal_band()} AS band, same
  FROM pairs WHERE sim > {min(_CAL_THRESHOLDS)}
),
bc AS (
  SELECT band, count(*) AS n, CAST(sum(same) AS BIGINT) AS s
  FROM bands GROUP BY 1
),
ks AS (
  SELECT unnest([{", ".join(str(i + 1) for i in range(len(_CAL_THRESHOLDS)))}]) AS idx,
         unnest([{", ".join(str(t) for t in sorted(_CAL_THRESHOLDS))}]) AS threshold
),
counted AS (
  SELECT ks.threshold,
         CAST(coalesce(sum(bc.n), 0) AS BIGINT) AS n_pairs,
         CAST(coalesce(sum(bc.s), 0) AS BIGINT) AS n_same_label
  FROM ks LEFT JOIN bc ON bc.band >= ks.idx
  GROUP BY ks.threshold
),
tot AS (
  SELECT CAST(coalesce(sum(nl * (nl - 1) / 2), 0) AS BIGINT) AS total_same
  FROM (SELECT label, count(*) AS nl FROM emb
        WHERE label IS NOT NULL GROUP BY 1)
)
SELECT c.threshold, c.n_pairs, c.n_same_label,
       CASE WHEN c.n_pairs > 0 THEN
         {sql_round('CAST(c.n_same_label AS DOUBLE) / c.n_pairs', 6)}
       END AS precision,
       CASE WHEN t.total_same > 0 THEN
         {sql_round('CAST(c.n_same_label AS DOUBLE) / t.total_same', 6)}
       END AS recall
FROM counted c CROSS JOIN tot t
ORDER BY c.threshold
"""

QUERIES["similarity_threshold_calibration"] = similarity_threshold_calibration
ORACLE["similarity_threshold_calibration"] = (
    ORACLE_SIMILARITY_THRESHOLD_CALIBRATION
)


# ---------------------------------------------------------------------------
# Sign-bucket occupancy audit (LSH capacity planning)
# ---------------------------------------------------------------------------

#: Leading quantized components whose signs form the bucket id
#: (2^8 = 256 buckets).
_OCC_BITS = 8


def similarity_bucket_occupancy_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Occupancy histogram of the sign-bit bucket space: bucket id =
    the sign pattern of the first 8 quantized components, and the
    output reports, per occupancy size, how many buckets hold exactly
    that many vectors, the vector share, and the collision-pair share
    (ΣC(s,2) against C(n,2)).  This is the capacity audit run before
    trusting any LSH/Hamming tier: a heavy top bucket means the probe
    stage degenerates to a scan and needs more bits or a re-balance.

    Exactness: bucket ids, occupancy sizes and pair counts are exact
    integers (signs taken on 1e-6-quantized components, ``> 0``
    strictly, so both engines bucket identically); the two shares are
    single divisions of exact integers, 6-dp rounded.

    Shape: one map-side bucket expression, one 256-cell hash
    aggregate, one histogram aggregate over ≤ 256 rows; the corpus
    count comes from an unpartitioned window over the histogram, not
    a second scan.  Linear, shuffle is bucket-sized.
    """
    emb = _emb5(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "emb", lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long")
        ).alias("v6s"),
    )
    bucket = None
    for i in range(_OCC_BITS):
        # try_element_at: a malformed short/null row buckets as all-
        # zero bits (ANSI element_at would throw), matching the
        # oracle's NULL-subscript CASE fallthrough.
        bit = F.when(
            F.try_element_at("v6s", F.lit(i + 1)) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    occ = (
        emb.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("occupancy"))
    )
    # The corpus count is Σ occupancy·n_buckets over the ≤ 2^bits-row
    # histogram itself — an unpartitioned window there, not a second
    # full corpus scan (review r11 finding).
    w_all = Window.partitionBy()
    return (
        occ.groupBy("occupancy")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .withColumn(
            "n_total",
            F.sum(F.col("occupancy") * F.col("n_buckets")).over(w_all),
        )
        .where(F.col("n_total") > 1)
        .select(
            "occupancy",
            "n_buckets",
            (F.col("occupancy") * F.col("n_buckets")).alias("n_vectors"),
            pround(
                F.col("occupancy") * F.col("n_buckets") / F.col("n_total"), 6
            ).alias("vec_share"),
            pround(
                (
                    F.col("n_buckets")
                    * F.col("occupancy")
                    * (F.col("occupancy") - 1)
                    / 2
                )
                / (F.col("n_total") * (F.col("n_total") - 1) / 2),
                6,
            ).alias("collision_pair_share"),
        )
        .orderBy("occupancy")
    )


def _sql_occ_bucket() -> str:
    terms = [
        f"(CASE WHEN CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000"
        f" + 0.5) AS BIGINT) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_OCC_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


ORACLE_SIMILARITY_BUCKET_OCCUPANCY_AUDIT = f"""
WITH occ AS (
  SELECT CAST({_sql_occ_bucket()} AS INTEGER) AS bucket,
         count(*) AS occupancy
  FROM embeddings GROUP BY 1
),
hist AS (
  SELECT occupancy, count(*) AS n_buckets,
         sum(occupancy * count(*)) OVER () AS n_total
  FROM occ GROUP BY occupancy
)
SELECT occupancy,
       n_buckets,
       CAST(occupancy * n_buckets AS BIGINT) AS n_vectors,
       {sql_round('CAST(occupancy * n_buckets AS DOUBLE) / n_total', 6)}
         AS vec_share,
       {sql_round('(CAST(n_buckets * occupancy * (occupancy - 1) AS DOUBLE) / 2) / (CAST(n_total * (n_total - 1) AS DOUBLE) / 2)', 6)}
         AS collision_pair_share
FROM hist
WHERE n_total > 1
ORDER BY occupancy
"""

QUERIES["similarity_bucket_occupancy_audit"] = (
    similarity_bucket_occupancy_audit
)
ORACLE["similarity_bucket_occupancy_audit"] = (
    ORACLE_SIMILARITY_BUCKET_OCCUPANCY_AUDIT
)


# ---------------------------------------------------------------------------
# PPS systematic sampling (probability proportional to size)
# ---------------------------------------------------------------------------

#: Sample size per language stratum.
_PPS_K = 4


def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic probability-proportional-to-size SYSTEMATIC
    sample per language: documents are laid on a line in md5-hash
    order, each occupying an interval equal to its character weight,
    and the k grid points at (2j+1)·W / 2k (the interval midpoint
    rule) pick the documents they land in.  Big documents are
    proportionally more likely to be hit — the unequal-probability
    design a token-budgeted corpus sample actually wants — and the
    hash order de-correlates the systematic grid from any storage
    order, while staying fully replayable (no RNG).

    Exactness: interval endpoints are exact integer cumulative sums;
    the grid test is the cross-multiplied integer comparison
    2k·cum_lo ≤ (2j+1)·W < 2k·cum_hi — no division anywhere; the
    inclusion probability k·w/W is the only double, 6-dp rounded.

    Shape: one per-lang window cumsum (shuffle on lang, sort within
    stratum), a lang-equi join against the broadcast (lang × j) grid
    (|langs|·k rows) with the band as a post-filter.  At 100 TB the
    stratum cumsum becomes the classic two-pass partial-sum scan;
    nothing else changes.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("w"),
        _hex_prefix_int("md5(cast(doc_id as string))", 8).alias("h"),
    )
    win = (
        Window.partitionBy("lang")
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.select(
        "doc_id", "lang", "w", F.sum("w").over(win).alias("cum_hi")
    ).select(
        "doc_id", "lang", "w", (F.col("cum_hi") - F.col("w")).alias("cum_lo"),
        "cum_hi",
    )
    totals = docs.groupBy("lang").agg(F.sum("w").alias("big_w"))
    ks = spark.range(_PPS_K).select(F.col("id").alias("j"))
    grid = totals.join(F.broadcast(ks)).select(
        "lang", "j", "big_w", ((2 * F.col("j") + 1) * F.col("big_w")).alias("g")
    )
    k2 = 2 * _PPS_K
    return (
        cum.join(F.broadcast(grid), "lang")
        .where(
            (F.col("cum_lo") * k2 <= F.col("g"))
            & (F.col("g") < F.col("cum_hi") * k2)
        )
        .select(
            "lang",
            "j",
            "doc_id",
            F.col("w").alias("weight"),
            pround(F.lit(_PPS_K) * F.col("w") / F.col("big_w"), 6).alias(
                "inclusion_prob"
            ),
        )
        .orderBy("lang", "j")
    )


ORACLE_SAMPLE_PPS_SYSTEMATIC = f"""
WITH docs AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w,
         {_hex_to_int_sql("md5(CAST(doc_id AS VARCHAR))", 8)} AS h
  FROM documents
),
cum AS (
  SELECT doc_id, lang, w,
         sum(w) OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_hi
  FROM docs
),
totals AS (SELECT lang, sum(w) AS big_w FROM docs GROUP BY 1),
grid AS (
  SELECT t.lang, j.j, t.big_w, (2 * j.j + 1) * t.big_w AS g
  FROM totals t CROSS JOIN
       (SELECT unnest(range({_PPS_K})) AS j) j
)
SELECT c.lang, g.j, c.doc_id, c.w AS weight,
       {sql_round(f'{_PPS_K} * CAST(c.w AS DOUBLE) / g.big_w', 6)}
         AS inclusion_prob
FROM cum c JOIN grid g
  ON c.lang = g.lang
 AND (c.cum_hi - c.w) * {2 * _PPS_K} <= g.g
 AND g.g < c.cum_hi * {2 * _PPS_K}
ORDER BY c.lang, g.j
"""

QUERIES["sample_pps_systematic"] = sample_pps_systematic
ORACLE["sample_pps_systematic"] = ORACLE_SAMPLE_PPS_SYSTEMATIC


# ---------------------------------------------------------------------------
# Temporal train/valid split with embargo + balance audit
# ---------------------------------------------------------------------------

#: Split policy in days relative to the corpus' first day: train
#: covers [0, 22), the embargo gap [22, 24) is DROPPED, valid is
#: [24, ∞).  The gap keeps any label/feature computed with a ≤2-day
#: horizon from leaking across the boundary.
_EMBARGO_TRAIN_END = 22
_EMBARGO_VALID_START = 24


def sample_temporal_embargo_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temporal train/valid split with an embargo gap, plus the
    balance audit a time-based split must ship with: per (split,
    event_type), the event count, distinct users, and the type's
    share within its split — so a mix shift between train and valid
    is visible BEFORE a model trains on it.  Complements
    ``sample_split_leakage_safe`` (cluster-keyed identity leakage):
    this one guards horizon leakage, the other membership leakage.

    Exactness: day offsets are exact integer epoch-day arithmetic
    anchored to the corpus minimum; counts are exact integers; each
    share is ONE division of two exact integers, 6-dp rounded.

    Shape: one 1-row min-day broadcast, one (split, type) hash
    aggregate, a 3-row split-total broadcast re-join for shares.
    Embargoed events are reported as their own split row, never
    silently dropped.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        # Integer `div`, not a double divide-and-truncate: the double
        # quotient can round across a midnight boundary (and `div`
        # matches the batch pack's epoch-day convention).
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        ),
    )
    min_day = ev.agg(F.min("day").alias("day0"))
    split = (
        F.when(
            F.col("day") - F.col("day0") < _EMBARGO_TRAIN_END, F.lit("train")
        )
        .when(
            F.col("day") - F.col("day0") < _EMBARGO_VALID_START,
            F.lit("embargo"),
        )
        .otherwise(F.lit("valid"))
    )
    tagged = ev.join(F.broadcast(min_day)).select(
        split.alias("split"), "event_type", "user_id"
    )
    per = tagged.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    split_tot = per.groupBy("split").agg(
        F.sum("n_events").alias("split_events")
    )
    return (
        per.join(F.broadcast(split_tot), "split")
        .select(
            "split",
            "event_type",
            "n_events",
            "n_users",
            pround(F.col("n_events") / F.col("split_events"), 6).alias(
                "type_share"
            ),
        )
        .orderBy("split", "event_type")
    )


ORACLE_SAMPLE_TEMPORAL_EMBARGO_SPLIT = f"""
WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
m AS (SELECT min(day) AS day0 FROM ev),
tagged AS (
  SELECT CASE
           WHEN e.day - m.day0 < {_EMBARGO_TRAIN_END} THEN 'train'
           WHEN e.day - m.day0 < {_EMBARGO_VALID_START} THEN 'embargo'
           ELSE 'valid'
         END AS split,
         e.event_type, e.user_id
  FROM ev e CROSS JOIN m
),
per AS (
  SELECT split, event_type, count(*) AS n_events,
         count(DISTINCT user_id) AS n_users
  FROM tagged GROUP BY 1, 2
),
tot AS (
  SELECT split, CAST(sum(n_events) AS BIGINT) AS split_events
  FROM per GROUP BY 1
)
SELECT p.split, p.event_type, p.n_events, p.n_users,
       {sql_round('CAST(p.n_events AS DOUBLE) / t.split_events', 6)}
         AS type_share
FROM per p JOIN tot t ON p.split = t.split
ORDER BY p.split, p.event_type
"""

QUERIES["sample_temporal_embargo_split"] = sample_temporal_embargo_split
ORACLE["sample_temporal_embargo_split"] = ORACLE_SAMPLE_TEMPORAL_EMBARGO_SPLIT


# ---------------------------------------------------------------------------
# Hourly error-share SLO breach report
# ---------------------------------------------------------------------------

#: Breach threshold as an exact ratio: an hour breaches when
#: errors / events > 3/10 (cross-multiplied, never divided).
_SLO_NUM = 3
_SLO_DEN = 10


def events_error_rate_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily SLO report over hourly error shares: per day, how many
    traffic hours existed, how many breached the 30% error-share
    budget, and the single worst hour with its share — the rollup an
    on-call burn-rate policy reads.  Hour grain keeps the state
    calendar-bounded, so the same aggregate is the streaming twin's
    substrate.

    Exactness: the breach predicate is the cross-multiplied integer
    test e·10 > n·3 (no division); the worst hour is a deterministic
    (share desc, hour asc) row_number where the share ordering of two
    exact-integer fractions is division-stable across engines; the
    reported share is ONE division, 6-dp rounded.

    Shape: one hour hash aggregate (calendar-bounded), one per-day
    window over ≤ 24 rows, one day rollup.  Linear, no joins.
    """
    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.select(
            F.date_trunc("hour", F.col("ts")).alias("hr"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("e"),
        )
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("e").alias("e"))
        .select(
            F.date_trunc("day", F.col("hr")).alias("day"),
            "hr",
            "n",
            "e",
            (F.col("e") * _SLO_DEN > F.col("n") * _SLO_NUM).alias("breach"),
        )
    )
    w = Window.partitionBy("day").orderBy(
        F.desc(F.col("e") / F.col("n")), F.asc("hr")
    )
    ranked = hours.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(F.col("breach"), 1).otherwise(0)).alias(
                "n_breached"
            ),
            F.max(F.when(F.col("rk") == 1, F.col("hr"))).alias("worst_hour"),
            F.max(
                F.when(
                    F.col("rk") == 1, pround(F.col("e") / F.col("n"), 6)
                )
            ).alias("worst_share"),
        )
        .orderBy("day")
    )


ORACLE_EVENTS_ERROR_RATE_SLO = f"""
WITH hours AS (
  SELECT date_trunc('day', hr) AS day, hr, n, e,
         (e * {_SLO_DEN} > n * {_SLO_NUM}) AS breach
  FROM (
    SELECT date_trunc('hour', ts) AS hr, count(*) AS n,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS e
    FROM events GROUP BY 1
  )
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY day
           ORDER BY CAST(e AS DOUBLE) / n DESC, hr ASC) AS rk
  FROM hours
)
SELECT day,
       count(*) AS n_hours,
       CAST(sum(CASE WHEN breach THEN 1 ELSE 0 END) AS BIGINT)
         AS n_breached,
       max(CASE WHEN rk = 1 THEN hr END) AS worst_hour,
       max(CASE WHEN rk = 1 THEN
         {sql_round('CAST(e AS DOUBLE) / n', 6)} END) AS worst_share
FROM ranked GROUP BY day ORDER BY day
"""

QUERIES["events_error_rate_slo"] = events_error_rate_slo
ORACLE["events_error_rate_slo"] = ORACLE_EVENTS_ERROR_RATE_SLO


# ---------------------------------------------------------------------------
# Context-cap truncation loss
# ---------------------------------------------------------------------------

#: Token caps to audit (the test docs run 10–100 whitespace tokens, so
#: both caps bite without saturating; on a real corpus these become
#: the model's context-length candidates).
_TRUNC_CAPS = (32, 64)

#: Explicit whitespace class (Java ``\s`` matches \x0B, RE2's does
#: not — ADVICE r11).  Canonical definition lives in ``functions``
#: since round 16; the alias keeps this pack's call sites unchanged.
_WS_CLASS = WS_CLASS


def text_token_budget_truncation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Truncation-loss audit per (source, cap): if every document is
    hard-truncated to ``cap`` tokens, how many documents lose text and
    what share of the source's token stream is discarded.  The
    complement of ``text_pack_efficiency`` — packing prices padding
    waste, this prices the cut-off loss — and together they decide a
    context-length/packing policy per source before tokenizing 100 TB.

    Exactness: token counts are exact whitespace-token integers (the
    pack's tokenizer convention); kept tokens per doc are
    ``least(n_toks, cap)``; all aggregates are exact integer sums and
    the loss share is ONE division, 6-dp rounded, NULL on a zero-token
    source.

    Shape: one map-side token count per document (no explode — the
    array is sized, not expanded), a |caps|-row literal explode, one
    (source, cap) hash aggregate.  Linear, no joins.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.when(
            F.col("text").isNull() | (F.trim(F.col("text")) == ""), F.lit(0)
        )
        .otherwise(F.size(F.split(F.trim(F.col("text")), _WS_CLASS)))
        .cast("long")
        .alias("n_toks"),
    )
    caps = F.explode(
        F.array(*[F.lit(c).cast("long") for c in _TRUNC_CAPS])
    ).alias("cap")
    return (
        docs.select("source", "n_toks", caps)
        .groupBy("source", "cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n_toks") > F.col("cap"), 1).otherwise(0)
            ).alias("docs_truncated"),
            F.sum("n_toks").alias("toks_total"),
            F.sum(F.least(F.col("n_toks"), F.col("cap"))).alias("toks_kept"),
        )
        .select(
            "source",
            "cap",
            "n_docs",
            "docs_truncated",
            "toks_total",
            "toks_kept",
            F.when(
                F.col("toks_total") > 0,
                pround(
                    (F.col("toks_total") - F.col("toks_kept"))
                    / F.col("toks_total"),
                    6,
                ),
            ).alias("loss_share"),
        )
        .orderBy("source", "cap")
    )


ORACLE_TEXT_TOKEN_BUDGET_TRUNCATION = f"""
WITH docs AS (
  SELECT source,
         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '{_WS_CLASS}'))
         END AS n_toks
  FROM documents
),
grid AS (
  SELECT d.source, c.cap, d.n_toks
  FROM docs d CROSS JOIN
       (SELECT unnest([{", ".join(str(c) for c in _TRUNC_CAPS)}]::BIGINT[])
          AS cap) c
)
SELECT source, cap,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_toks > cap THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_truncated,
       CAST(sum(n_toks) AS BIGINT) AS toks_total,
       CAST(sum(least(n_toks, cap)) AS BIGINT) AS toks_kept,
       CASE WHEN sum(n_toks) > 0 THEN
         {sql_round('CAST(sum(n_toks) - sum(least(n_toks, cap)) AS DOUBLE) / sum(n_toks)', 6)}
       END AS loss_share
FROM grid
GROUP BY source, cap
ORDER BY source, cap
"""

QUERIES["text_token_budget_truncation"] = text_token_budget_truncation
ORACLE["text_token_budget_truncation"] = ORACLE_TEXT_TOKEN_BUDGET_TRUNCATION
