"""Similarity search and embedding ops over the ``embeddings`` table
(array<float> × 64): exact/LSH/IVF retrieval, global pair mining,
grouped-map PCA, int8 scalar quantization, and distributed Lloyd
k-means. The retrieval lanes, each a different scale strategy:

- ``similarity_cosine_topk``  — exact brute-force top-k for a small
  query set: broadcast the queries, fold the dot product with JVM
  higher-order functions (``zip_with``/``aggregate``) — zero Python,
  one pass over the corpus per query batch.
- ``similarity_ann_lsh``      — approximate: random-hyperplane LSH
  (sign-of-dot against 8 fixed planes → 256 buckets), candidates are
  same-bucket only. This is the 100 TB path: bucket id is a cheap
  map-side projection, and the candidate join is bucket-equi instead
  of all-pairs. Planes are fixed literals so the DuckDB oracle
  reproduces the exact buckets.
- ``similarity_pair_topk``    — global most-similar pairs via a
  block-partitioned exact all-pairs search: vectors replicate to a
  2D grid of block-pair groups (``_pair_blocks``), each group runs a
  BLAS matmul kernel in ``applyInPandas`` (Arrow-batched) and emits
  its local top-k, then a global top-k reduces. No full-corpus
  collect or broadcast anywhere; per-task memory is O(n/B · d).
  Demonstrates the sanctioned Python fast path (BLAS beats per-row
  JVM folds for dense linear algebra); still oracle-checkable
  because the math is double-precision on both sides.

All similarities are computed in float64 after casting the float32
input (both engines see identical inputs) and rounded to 4 decimals
with the portable rounding pair before ranking, so rank ties resolve
identically across engines (tie-break on vec_id).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_stream_writer_spark.functions import (
    cosine_similarity,
    int_mean,
    int_sum,
    pround,
    sql_int_mean,
    sql_int_sum,
)
from parquet_stream_writer_spark.sources import load_table, scan_parallel

#: Number of query vectors (lowest vec_ids) for the top-k queries.
_N_QUERIES = 5
_TOP_K = 5
#: Hyperplane count for LSH (2^8 = 256 buckets).
_N_PLANES = 8
_DIM = 64
#: Global pair-search result size.
_N_PAIRS = 20


def _planes() -> np.ndarray:
    """Fixed random hyperplanes, rounded so their decimal literals are
    short and parse to identical doubles in Spark and DuckDB."""
    rng = np.random.RandomState(7)
    return np.round(rng.standard_normal((_N_PLANES, _DIM)), 4)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scan_parallel: the test file is a single input split; the
    # per-row cosine folds / numpy kernels downstream need all cores.
    return scan_parallel(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


# ---------------------------------------------------------------------------
# Brute-force top-k for a query set
# ---------------------------------------------------------------------------

def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbours for the 5 lowest vec_ids (excluding
    self). Queries are broadcast; corpus is scanned once."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            pround(cosine_similarity(F.col("qemb"), F.col("emb")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("qid", "vec_id", "sim", F.col("rk").cast("int").alias("rk"))
    )


ORACLE_SIMILARITY_COSINE_TOPK = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM emb WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id,
         floor(list_cosine_similarity(q.qemb, e.emb) * 10000 + 0.5) / 10000.0 AS sim
  FROM emb e JOIN q ON e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT qid, vec_id, sim, CAST(rk AS INTEGER) AS rk FROM ranked WHERE rk <= {_TOP_K}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed approximate search
# ---------------------------------------------------------------------------

def _bucket_expr(emb_col: str) -> F.Column:
    """Bucket id: bit p set iff dot(v, plane_p) > 0."""
    planes = _planes()
    bucket = F.lit(0)
    for p in range(_N_PLANES):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(emb_col), plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 per query: candidates share the query's
    random-hyperplane bucket. At scale the bucket id becomes a
    partition/cluster key so each lookup touches one bucket."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket_expr("emb"))
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            "vec_id",
            F.col("bucket").cast("int").alias("bucket"),
            pround(cosine_similarity(F.col("qemb"), F.col("emb")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("qid", "vec_id", "bucket", "sim", F.col("rk").cast("int").alias("rk"))
    )


def _sql_plane_literal(p: int) -> str:
    planes = _planes()
    return "[" + ", ".join(repr(float(x)) for x in planes[p]) + "]"


def _sql_bucket(col: str) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({col}, {_sql_plane_literal(p)}::DOUBLE[]) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(_N_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


ORACLE_SIMILARITY_ANN_LSH = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         {_sql_bucket("embedding::DOUBLE[]")} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS qid, emb AS qemb, bucket AS qbucket FROM emb WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id, e.bucket,
         floor(list_cosine_similarity(q.qemb, e.emb) * 10000 + 0.5) / 10000.0 AS sim
  FROM emb e JOIN q ON e.bucket = q.qbucket AND e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id, bucket, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT qid, vec_id, CAST(bucket AS INTEGER) AS bucket, sim, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= {_TOP_K}
"""


# ---------------------------------------------------------------------------
# Global most-similar pairs — vectorized numpy kernel
# ---------------------------------------------------------------------------

#: Block-grid width for distributed all-pairs mining.  Work is split
#: into B(B+1)/2 block-pair tasks; each task holds ≤ 2·n/B rows.  At
#: 100 TB scale B grows with the corpus so a block stays executor-sized
#: (n/B ≈ 100k rows × 64 dims ≈ 50 MB); replication factor is exactly B.
_N_BLOCKS = 8


def _pair_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate each vector to the ``_N_BLOCKS`` block-pair groups it
    participates in — the 2D-grid decomposition of distributed all-pairs
    (distributed GEMM shape).  A vector in block ``i`` lands in group
    ``(min(i,j), max(i,j))`` once for every ``j``; shuffle volume is
    ``n × B`` rows, never ``n²``, and no driver-side collect exists
    anywhere in the lineage.

    The block id is ``pmod(vec_id, B)`` rather than ``%`` (round 17):
    Spark's ``%`` follows the dividend's sign, so a NEGATIVE vec_id
    would land in a block outside the 0..B−1 peer range and every pair
    involving it would be silently dropped from the grid.  The driver
    corpus's ids are non-negative, so results are unchanged there —
    this closes the latent contract hole for arbitrary id domains
    (pinned by a negative-id coverage test).
    """
    emb = _emb(spark, sf_dir).select("vec_id", "emb")
    peers = F.array(*[F.lit(i) for i in range(_N_BLOCKS)])
    return (
        emb.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(_N_BLOCKS)).cast("int"))
        .withColumn("peer", F.explode(peers))
        .select(
            F.least("blk", "peer").alias("bi"),
            F.greatest("blk", "peer").alias("bj"),
            "blk",
            "vec_id",
            "emb",
        )
    )


def _pair_sims_kernel(threshold: float | None, topk: int | None):
    """Per-block-pair numpy kernel: cosine over the valid cross/intra
    pairs of the group, 4-dp half-up rounding applied **before** any
    selection, deterministic (−sim, v1, v2) lexsort tie-break."""
    import pandas as pd

    def kernel(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        blks = pdf["blk"].to_numpy()
        mat = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        # Same arithmetic as the DuckDB oracle's cosine (dot / |a||b|),
        # kept bit-identical so 4-dp rounding can't flip a boundary.
        sims = (mat @ mat.T) / np.outer(norms, norms)
        sims = np.floor(sims * 10000.0 + 0.5) / 10000.0
        mask = ids[None, :] > ids[:, None]  # distinct pairs, v1 < v2
        if bi != bj:
            mask &= blks[None, :] != blks[:, None]  # cross-block only
        p, q = np.nonzero(mask)
        v1, v2, s = ids[p].astype(np.int64), ids[q].astype(np.int64), sims[p, q]
        if threshold is not None:
            keep = s > threshold
            v1, v2, s = v1[keep], v2[keep], s[keep]
        if topk is not None and len(s) > topk:
            # Primary key last in lexsort: order by −sim, then v1, v2.
            sel = np.lexsort((v2, v1, -s))[:topk]
            v1, v2, s = v1[sel], v2[sel], s[sel]
        return pd.DataFrame({"v1": v1, "v2": v2, "sim": s})

    return kernel


def similarity_pair_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar distinct pairs (v1 < v2), computed as a
    block-partitioned exact all-pairs search.

    Each of the B(B+1)/2 block-pair groups matmuls its two row blocks
    with BLAS inside ``applyInPandas`` and emits its local top-20
    under the global ordering (sim desc, v1, v2 — rounded *before*
    selection, so rounding ties can't drop boundary pairs); a global
    ``orderBy().limit()`` (TakeOrderedAndProject) reduces.  The global
    top-20 is a subset of the union of per-group top-20s, so the
    result is exact.  No full-corpus collect or broadcast exists —
    this is the shape that survives 100 TB (grow ``_N_BLOCKS`` with
    the corpus; per-task memory stays ``O(n/B · d)``).
    """
    local_tops = (
        _pair_blocks(spark, sf_dir)
        .groupBy("bi", "bj")
        .applyInPandas(
            _pair_sims_kernel(threshold=None, topk=_N_PAIRS),
            schema="v1 long, v2 long, sim double",
        )
    )
    return local_tops.orderBy(F.desc("sim"), F.asc("v1"), F.asc("v2")).limit(_N_PAIRS)


ORACLE_SIMILARITY_PAIR_TOPK = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         floor(list_cosine_similarity(a.emb, b.emb) * 10000 + 0.5) / 10000.0 AS sim
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
)
SELECT v1, v2, sim FROM pairs
ORDER BY sim DESC, v1 ASC, v2 ASC
LIMIT {_N_PAIRS}
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search
# ---------------------------------------------------------------------------

#: IVF cell count and probe width.
_N_CELLS = 8
_NPROBE = 2
#: Probe-side broadcast cap (rows in the exploded query×nprobe set).
#: Below it the IVF probe joins hint an explicit broadcast; above it
#: they fall through to Catalyst/AQE join selection, which shuffles
#: both sides on the cell key — the million-query regime
#: (scan_parallel-style conditional, VERDICT r5 advisory b).
_BROADCAST_QUERY_CAP = 100_000


def _centroids() -> np.ndarray:
    """Fixed coarse-quantizer centroids (stand-in for a k-means fit),
    rounded so their decimal literals parse to identical doubles in
    Spark and DuckDB."""
    rng = np.random.RandomState(11)
    return np.round(rng.standard_normal((_N_CELLS, _DIM)) * 0.5, 4)


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of
    ``_N_CELLS`` coarse centroids; a query probes its ``_NPROBE``
    nearest cells and ranks candidates by exact cosine.

    At 100 TB the cell id is the partition/cluster key (each probe
    touches nprobe/ncells of the corpus); here the whole assignment
    is a map-side projection and the candidate join is cell-equi
    against a broadcast query set. Complements ``similarity_ann_lsh``:
    IVF partitions by global geometry (k-means cells), LSH by random
    hyperplanes — IVF recall degrades gracefully with nprobe.
    """
    cents = _centroids()
    emb = _emb(spark, sf_dir)

    def dist(c: np.ndarray) -> F.Column:
        cent = F.array(*[F.lit(float(x)) for x in c])
        return F.sqrt(
            F.aggregate(
                F.zip_with(F.col("emb"), cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    with_d = emb.withColumn("dists", F.array(*[dist(c) for c in cents]))
    with_c1 = with_d.withColumn(
        "cell", F.array_position(F.col("dists"), F.array_min("dists")).cast("int")
    )
    masked = F.transform(
        F.col("dists"),
        lambda d: F.when(d == F.array_min("dists"), F.lit(1e18)).otherwise(d),
    )
    assigned = with_c1.withColumn(
        "cell2", F.array_position(masked, F.array_min(masked)).cast("int")
    )
    # Explode the nprobe cell list so the probe is an EQUI join on
    # cell (BroadcastHashJoin) instead of the OR-of-cells nested-loop;
    # the equi shape is what survives a large query set at scale.
    # array_distinct: if every centroid distance ties, cell == cell2
    # and a plain explode would double-count candidates (the oracle's
    # OR predicate cannot).
    queries = assigned.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qemb"),
        F.explode(F.array_distinct(F.array("cell", "cell2"))).alias("pcell"),
    )
    probe = (
        F.broadcast(queries)
        if _N_QUERIES * _NPROBE <= _BROADCAST_QUERY_CAP
        else queries
    )
    scored = (
        assigned.join(
            probe,
            (F.col("cell") == F.col("pcell")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            "vec_id",
            "cell",
            pround(cosine_similarity(F.col("qemb"), F.col("emb")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("qid", "vec_id", "cell", "sim", F.col("rk").cast("int").alias("rk"))
    )


def _sql_centroid(i: int) -> str:
    return "[" + ", ".join(repr(float(x)) for x in _centroids()[i]) + "]::DOUBLE[]"


ORACLE_SIMILARITY_IVF = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
d AS (
  SELECT vec_id, emb,
         [{", ".join(f"list_distance(emb, {_sql_centroid(i)})" for i in range(_N_CELLS))}] AS dists
  FROM emb
),
c1 AS (
  SELECT vec_id, emb, dists,
         CAST(list_position(dists, list_min(dists)) AS INTEGER) AS cell,
         list_transform(dists, x -> CASE WHEN x = list_min(dists) THEN 1e18 ELSE x END) AS masked
  FROM d
),
assigned AS (
  SELECT vec_id, emb, cell,
         CAST(list_position(masked, list_min(masked)) AS INTEGER) AS cell2
  FROM c1
),
q AS (
  SELECT vec_id AS qid, emb AS qemb, cell AS p1, cell2 AS p2
  FROM assigned WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.qid, a.vec_id, a.cell,
         floor(list_cosine_similarity(q.qemb, a.emb) * 10000 + 0.5) / 10000.0 AS sim
  FROM assigned a JOIN q
    ON (a.cell = q.p1 OR a.cell = q.p2) AND a.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id, cell, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT qid, vec_id, cell, sim, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= {_TOP_K}
"""


QUERIES = {
    "similarity_cosine_topk": similarity_cosine_topk,
    "similarity_ann_lsh": similarity_ann_lsh,
    "similarity_pair_topk": similarity_pair_topk,
    "similarity_ivf": similarity_ivf,
}

ORACLE = {
    "similarity_cosine_topk": ORACLE_SIMILARITY_COSINE_TOPK,
    "similarity_ann_lsh": ORACLE_SIMILARITY_ANN_LSH,
    "similarity_pair_topk": ORACLE_SIMILARITY_PAIR_TOPK,
    "similarity_ivf": ORACLE_SIMILARITY_IVF,
}


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs: cosine > 0.45 over all
    distinct pairs (v1 < v2).

    Same block-partitioned all-pairs decomposition as
    :func:`similarity_pair_topk` (shared ``_pair_blocks`` /
    ``_pair_sims_kernel``): B(B+1)/2 block-pair tasks, BLAS matmul per
    task inside ``applyInPandas``, threshold applied on the 4-dp
    half-up-rounded similarity so the compare matches the DuckDB
    oracle exactly.  No full-corpus collect or broadcast — per-task
    memory is ``O(n/B · d)`` and the shape survives 100 TB.  An
    LSH-bucketed variant (only candidate buckets meet) trades exactness
    for less work at extreme scale — see ``similarity_ann_lsh``.
    """
    return (
        _pair_blocks(spark, sf_dir)
        .groupBy("bi", "bj")
        .applyInPandas(
            _pair_sims_kernel(threshold=0.45, topk=None),
            schema="v1 long, v2 long, sim double",
        )
    )


ORACLE_DEDUP_EMBEDDING_COSINE = """
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         floor(list_cosine_similarity(a.emb, b.emb) * 10000 + 0.5) / 10000.0 AS sim
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
)
SELECT v1, v2, sim FROM pairs WHERE sim > 0.45
"""


QUERIES["dedup_embedding_cosine"] = dedup_embedding_cosine
ORACLE["dedup_embedding_cosine"] = ORACLE_DEDUP_EMBEDDING_COSINE


def embedding_pca_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label PCA summary via mergeable sufficient statistics.

    PCA's spectrum depends only on ``(n, Σx, XᵀX)``, which merge by
    addition — so no label group is ever materialized whole.  Stage 1
    (``mapInPandas``) folds each *partition's* rows into one
    ``(label, n, Σx, XᵀX)`` partial per label (d=64 → 32 KB each);
    stage 2 shuffles only those partials (≤ one per label per
    partition) and the finalize kernel sums them, forms the d×d
    covariance ``Σxx^T − n·μμ^T``, and eigendecomposes it.  Per-task
    memory is O(d²) regardless of group size — the billion-row shape.

    Hash-oracled as a BOUNDS CHECK: the eigensolve isn't
    SQL-expressible, but everything upstream of it IS — ``n``, the
    centroid norm, and the mean per-dimension variance (covariance
    trace / d) are recomputed by DuckDB from the raw vectors via
    per-dimension aggregates, cross-verifying the sufficient
    statistics (count, Σx, diag XᵀX).  The eigensolve itself is pinned
    by ``pc1_within_bounds``: λ_max must sit in [trace/d, trace]
    (λ_max ≥ the mean eigenvalue, Σλ = trace) and the spectrum must
    sum back to the trace within 1e-6 relative; the oracle pins the
    boolean TRUE.  Outputs are sign-invariant and portably rounded.
    """
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    d = _DIM

    def partials(batches):
        for pdf in batches:
            for label, grp in pdf.groupby("label"):
                X = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
                yield pd.DataFrame(
                    {
                        "label": [int(label)],
                        "n": [len(grp)],
                        "sum_vec": [X.sum(axis=0).tolist()],
                        "xtx": [(X.T @ X).ravel().tolist()],
                    }
                )

    parts = emb.mapInPandas(
        partials, schema="label int, n long, sum_vec array<double>, xtx array<double>"
    )

    def finalize(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        import math

        n = int(pdf["n"].sum())
        s = np.sum(np.stack(pdf["sum_vec"].to_numpy()), axis=0)
        xtx = np.sum(np.stack(pdf["xtx"].to_numpy()), axis=0).reshape(d, d)
        mu = s / n
        cov = xtx - n * np.outer(mu, mu)
        evals = np.linalg.eigvalsh((cov + cov.T) / 2.0)
        # Population-covariance trace per dim == mean var_pop, the
        # quantity DuckDB recomputes from raw vectors.
        trace = float(np.trace(cov))
        mean_var = trace / n / d
        lmax = float(evals[-1])
        spectrum_ok = abs(float(evals.sum()) - trace) <= 1e-6 * max(trace, 1e-12)
        pc1_ok = (trace / d - 1e-9 <= lmax <= trace + 1e-9) and spectrum_ok

        def pr4(x: float) -> float:
            return math.floor(x * 10000 + 0.5) / 10000.0

        return pd.DataFrame(
            {
                "label": [int(key[0])],
                "n_vectors": [n],
                "mean_dim_var": [pr4(mean_var)],
                "centroid_norm": [pr4(float(np.linalg.norm(mu)))],
                "pc1_within_bounds": [bool(pc1_ok)],
            }
        )

    return parts.groupBy("label").applyInPandas(
        finalize,
        "label int, n_vectors long, mean_dim_var double,"
        " centroid_norm double, pc1_within_bounds boolean",
    )


ORACLE_EMBEDDING_PCA_BY_LABEL = f"""
WITH dims AS (SELECT unnest(generate_series(1, {_DIM})) AS i),
per_dim AS (
  SELECT label, i,
         avg(CAST(embedding[i] AS DOUBLE))     AS mu,
         var_pop(CAST(embedding[i] AS DOUBLE)) AS v
  FROM embeddings CROSS JOIN dims
  GROUP BY label, i
),
stats AS (
  SELECT label,
         sqrt(sum(mu * mu)) AS centroid_norm_raw,
         avg(v)             AS mean_dim_var_raw
  FROM per_dim GROUP BY label
),
counts AS (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label)
SELECT CAST(c.label AS INTEGER) AS label,
       c.n_vectors,
       floor(s.mean_dim_var_raw * 10000 + 0.5) / 10000.0 AS mean_dim_var,
       floor(s.centroid_norm_raw * 10000 + 0.5) / 10000.0 AS centroid_norm,
       TRUE AS pc1_within_bounds
FROM counts c JOIN stats s ON c.label = s.label
"""


QUERIES["embedding_pca_by_label"] = embedding_pca_by_label
ORACLE["embedding_pca_by_label"] = ORACLE_EMBEDDING_PCA_BY_LABEL


# ---------------------------------------------------------------------------
# Scalar (int8) embedding quantization
# ---------------------------------------------------------------------------

def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (min/max affine codebook,
    255 levels) with reconstruction-error audit per label — the
    storage-shrink step before an ANN index build (4× smaller than
    float32). All array math is JVM-side higher-order functions over
    the embedding column; nothing leaves the row until the tiny
    per-label error agg, so the op is a single narrow scan plus a
    5-row aggregate at any scale. Rounding is floor(q + 0.5) on both
    engines (identical IEEE ops) rather than engine round().

    Exactness discipline (round 17, scheduled ledger repair): the
    per-label mean error was a float64 AVG of doubles — order-
    dependent accumulation.  Each per-vector max_err (itself a MAX of
    bit-identical doubles, order-free) now enters as a 1e-8-unit LONG
    (``quantn(max_err, 8)``) and the 8-dp half-up mean is
    ``floor(Σe8/n + 0.5)/1e8`` over exact integers.  ``worst_err``
    stays a rounded MAX — maxima of identical doubles commute, so it
    was never order-dependent.  Exact while a label's 1e-8-unit error
    sum stays inside 2^53 (errors are O(quantization step) ≪ 1:
    ~1e11 vectors of headroom per label)."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = (
        emb.select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> cast(x as double))").alias("dd"),
        )
        .withColumn("lo", F.array_min("dd"))
        .withColumn("hi", F.array_max("dd"))
        .withColumn("scale", (F.col("hi") - F.col("lo")) / F.lit(255.0))
    )
    err = d.withColumn(
        "max_err",
        F.array_max(
            F.expr(
                "transform(dd, x -> abs(x - (floor((x - lo) / scale + 0.5D)"
                " * scale + lo)))"
            )
        ),
    )
    return err.groupBy(F.col("label").cast("int").alias("label")).agg(
        int_mean(F.col("max_err"), 8).alias("avg_max_err"),
        pround(F.max("max_err"), 8).alias("worst_err"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


ORACLE_EMBEDDING_QUANTIZE = f"""
WITH q AS (
  SELECT label, [CAST(x AS DOUBLE) for x in embedding] AS dd FROM embeddings),
s AS (
  SELECT label, dd, list_min(dd) AS lo, list_max(dd) AS hi,
         (list_max(dd) - list_min(dd)) / 255.0 AS scale
  FROM q),
e AS (
  SELECT label,
         list_max([abs(x - (floor((x - lo) / scale + 0.5) * scale + lo))
                   for x in dd]) AS max_err
  FROM s)
SELECT CAST(label AS INTEGER) AS label,
       {sql_int_mean('max_err', 8)} AS avg_max_err,
       floor(max(max_err) * 100000000 + 0.5) / 100000000.0 AS worst_err,
       count(*) AS n_vectors
FROM e GROUP BY label
"""


QUERIES["embedding_quantize_int8"] = embedding_quantize_int8
ORACLE["embedding_quantize_int8"] = ORACLE_EMBEDDING_QUANTIZE


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's algorithm, fixed iterations)
# ---------------------------------------------------------------------------

#: Cluster count and unrolled Lloyd iterations for the k-means op.
_KM_K = 8
_KM_ITERS = 3

#: Strict left-fold squared-distance — Spark's ``aggregate`` and
#: DuckDB's ``list_reduce`` both fold left element-by-element, so the
#: partial-sum sequence (and thus the resulting double) is
#: bit-identical across engines, which keeps the argmin assignment
#: deterministic without any rounding of distances.
_KM_DIST_SPARK = (
    "aggregate(zip_with(dd, c, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as double), (acc, e) -> acc + e)"
)


def _km_dist_duck() -> str:
    return (
        "list_reduce(list_transform(generate_series(1, 64),"
        " i -> (e.dd[i] - c.c[i]) * (e.dd[i] - c.c[i])), (a, b) -> a + b)"
    )


def embedding_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means over the embedding table: k=8 seeded
    from the lowest vec_ids, three unrolled assign/update rounds, then
    a final assignment reported as per-cluster sizes and inertia.

    Each round is one broadcast of the (k × dim) centroid table over
    the point set — the fact side never shuffles for assignment; the
    only shuffles are the tiny (cid, pos) mean aggregations. That is
    exactly the 100 TB shape: centroids are KBs regardless of corpus
    size, so iteration cost is a narrow scan per round.

    Exactness discipline (round 17, scheduled ledger repair): the two
    post-distance reduces are integer-exact rather than rounded
    floats.  Each coordinate enters the centroid mean as a 1e-6-unit
    LONG (``quantn(x, 6)``), so the per-(cid, pos) sum is exact in any
    accumulation order and the 6-dp half-up mean is
    ``floor(Σx6/n + 0.5)/1e6`` — both engines iterate from identical
    codebooks BY CONSTRUCTION, not because float drift happens to stay
    below a rounding grid.  The inertia likewise sums per-row
    ``quantn(dist, 4)`` longs (dist itself is the bit-identical strict
    left-fold double on both engines) and reports ``Σd4/1e4``.  Exact
    while a cluster's 1e-6-unit coordinate sum and the corpus's
    1e-4-unit distance sum stay inside 2^53 (coordinates are O(1),
    distances O(100): ~1e9 vectors of headroom).  The assignment
    argmin keeps the UNROUNDED strict-fold distances — only the
    reduces migrate."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("dd"),
    )
    cents = emb.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("dd").alias("c")
    )

    def assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
        # Project down to (vec_id, cid, dist) BEFORE the argmin window:
        # the ×k replicated shuffle then moves 24-byte rows, not the
        # vectors (those re-join by vec_id afterwards, reusing the
        # window's partitioning).
        a = points.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "cid", F.expr(_KM_DIST_SPARK).alias("dist")
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            a.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "dist")
        )

    for _ in range(_KM_ITERS):
        b = assign(emb, cents)
        pts = b.join(emb, "vec_id").select(
            "cid", F.posexplode("dd").alias("pos", "x")
        )
        m = pts.groupBy("cid", "pos").agg(int_mean(F.col("x"), 6).alias("m"))
        cents = m.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("c")
        )
    final = assign(emb, cents)
    return final.groupBy(F.col("cid").cast("int").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        int_sum(F.col("dist"), 4).alias("inertia"),
    )


def _kmeans_oracle_sql(k: int = _KM_K, iters: int = _KM_ITERS) -> str:
    """Unrolled-CTE DuckDB twin of :func:`embedding_kmeans_lloyd`."""
    dist = _km_dist_duck()
    parts = [
        "WITH emb AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding]"
        " AS dd FROM embeddings),\n"
        f"cents0 AS (SELECT vec_id AS cid, dd AS c FROM emb WHERE vec_id < {k})"
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""a{it} AS (
  SELECT e.vec_id, c.cid, {dist} AS dist
  FROM emb e, cents{it - 1} c),
b{it} AS (
  SELECT vec_id, cid FROM a{it}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
m{it} AS (
  SELECT b.cid, s.pos, {sql_int_mean('s.x', 6)} AS m
  FROM b{it} b JOIN (SELECT vec_id, unnest(dd) AS x,
                            generate_subscripts(dd, 1) AS pos FROM emb) s
       USING (vec_id)
  GROUP BY b.cid, s.pos),
cents{it} AS (SELECT cid, list(m ORDER BY pos) AS c FROM m{it} GROUP BY cid)"""
        )
        parts.append(
            f"""af AS (
  SELECT e.vec_id, c.cid, {dist} AS dist FROM emb e, cents{iters} c),
bf AS (
  SELECT vec_id, cid, dist FROM af
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)
SELECT CAST(cid AS INTEGER) AS cluster_id, count(*) AS n_members,
       {sql_int_sum('dist', 4)} AS inertia
FROM bf GROUP BY cid"""
            if it == iters
            else ""
        )
    return ",\n".join(p for p in parts if p)


ORACLE_EMBEDDING_KMEANS = _kmeans_oracle_sql()

QUERIES["embedding_kmeans_lloyd"] = embedding_kmeans_lloyd
ORACLE["embedding_kmeans_lloyd"] = ORACLE_EMBEDDING_KMEANS


# ---------------------------------------------------------------------------
# ANN recall audit
# ---------------------------------------------------------------------------

def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against exact brute-force ground
    truth, per query — the eval every ANN deployment runs before
    trusting its index (nprobe/ncells tuning is a recall-vs-cost
    dial; this op is the recall side of that dial). Both retrievals
    are the already-oracled operators, so the audit itself is one
    semi-join-shaped LEFT JOIN and a per-query ratio of two exact
    integer counts."""
    exact = similarity_cosine_topk(spark, sf_dir).select("qid", "vec_id")
    approx = similarity_ivf(spark, sf_dir).select(
        F.col("qid").alias("aqid"), F.col("vec_id").alias("avid")
    )
    joined = exact.join(
        approx,
        (exact["qid"] == approx["aqid"]) & (exact["vec_id"] == approx["avid"]),
        "left_outer",
    )
    return joined.groupBy("qid").agg(
        F.count("avid").alias("hits"),
        F.count(F.lit(1)).alias("k"),
        (F.count("avid") / F.count(F.lit(1))).alias("recall"),
    )


ORACLE_SIMILARITY_IVF_RECALL = f"""
WITH exact AS ({ORACLE_SIMILARITY_COSINE_TOPK}),
approx AS ({ORACLE_SIMILARITY_IVF})
SELECT e.qid,
       CAST(count(a.vec_id) AS BIGINT) AS hits,
       count(*) AS k,
       count(a.vec_id) / count(*) AS recall
FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.vec_id = a.vec_id
GROUP BY e.qid
"""


QUERIES["similarity_ivf_recall"] = similarity_ivf_recall
ORACLE["similarity_ivf_recall"] = ORACLE_SIMILARITY_IVF_RECALL


# ---------------------------------------------------------------------------
# Product quantization (PQ codebook training + distortion audit)
# ---------------------------------------------------------------------------

#: PQ geometry: m subspaces × subdim dims (m · subdim = 64), k codes
#: per subspace, unrolled Lloyd iterations per sub-codebook.
_PQ_M = 4
_PQ_SUBDIM = 16
_PQ_K = 8
_PQ_ITERS = 2

_PQ_DIST_SPARK = (
    "aggregate(zip_with(sv, c, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as double), (acc, e) -> acc + e)"
)


def _pq_dist_duck() -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {_PQ_SUBDIM}),"
        " i -> (e.sv[i] - c.c[i]) * (e.sv[i] - c.c[i])), (a, b) -> a + b)"
    )


def embedding_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training: split every embedding
    into ``_PQ_M`` subvectors, run Lloyd k-means independently per
    subspace (k=``_PQ_K``, seeded from the lowest vec_ids), and report
    per (subspace, code) the assignment count and distortion. A
    vector's PQ code is its per-subspace argmin sequence — 4 bytes
    replacing 256, the compression that makes a 100 TB embedding store
    rerankable in memory.

    Exactness discipline (round 17, scheduled ledger repair — the
    :func:`embedding_kmeans_lloyd` contract with the ``sub`` key
    threaded through): codebook coordinates enter the per-(sub, cid,
    pos) mean as ``quantn(x, 6)`` longs with the 6-dp half-up mean
    ``floor(Σx6/n + 0.5)/1e6``, and the distortion sums per-row
    ``quantn(dist, 4)`` longs reported as ``Σd4/1e4`` — both reduces
    exact in any accumulation order; the assignment argmin keeps the
    unrounded strict-fold distances.  Same 2^53 headroom bound as the
    k-means op.

    Scale shape: identical to :func:`embedding_kmeans_lloyd` but keyed
    by (subspace, cluster) — every round broadcasts the m·k×subdim
    codebook (KBs regardless of corpus size) over the subvector
    relation; the only shuffles are the tiny (sub, cid, pos) mean
    aggregations. The subvector explode multiplies rows ×m but each
    row narrows to 1/m of the dims: bytes shuffled stay constant.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("dd")
    )
    subs = emb.select(
        "vec_id",
        F.explode(F.array(*[F.lit(s) for s in range(_PQ_M)])).alias("sub"),
        "dd",
    ).select(
        "vec_id",
        "sub",
        F.expr(f"slice(dd, sub * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})").alias("sv"),
    )
    cents = subs.where(F.col("vec_id") < _PQ_K).select(
        "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("c")
    )

    def assign(points: DataFrame, codebook: DataFrame) -> DataFrame:
        a = points.join(F.broadcast(codebook), "sub").select(
            "vec_id", "sub", "cid", F.expr(_PQ_DIST_SPARK).alias("dist")
        )
        w = Window.partitionBy("sub", "vec_id").orderBy("dist", "cid")
        return (
            a.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "sub", "cid", "dist")
        )

    for _ in range(_PQ_ITERS):
        b = assign(subs, cents)
        pts = b.join(subs, ["vec_id", "sub"]).select(
            "sub", "cid", F.posexplode("sv").alias("pos", "x")
        )
        m = pts.groupBy("sub", "cid", "pos").agg(
            int_mean(F.col("x"), 6).alias("m")
        )
        cents = m.groupBy("sub", "cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("c")
        )
    final = assign(subs, cents)
    return final.groupBy(
        F.col("sub").cast("int").alias("subspace"),
        F.col("cid").cast("int").alias("code"),
    ).agg(
        F.count(F.lit(1)).alias("n_assigned"),
        int_sum(F.col("dist"), 4).alias("distortion"),
    )


def _pq_oracle_sql(m: int = _PQ_M, k: int = _PQ_K, iters: int = _PQ_ITERS) -> str:
    """Unrolled-CTE DuckDB twin of :func:`embedding_pq_train` — the
    k-means oracle with a ``sub`` (subspace) key threaded through
    every join and aggregation."""
    dist = _pq_dist_duck()
    sd = _PQ_SUBDIM
    parts = [
        "WITH emb AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding]"
        " AS dd FROM embeddings),\n"
        f"subs AS (SELECT vec_id, s.sub,"
        f" array_slice(dd, s.sub * {sd} + 1, s.sub * {sd} + {sd}) AS sv"
        f" FROM emb, (SELECT unnest(range({m})) AS sub) s),\n"
        f"cents0 AS (SELECT sub, vec_id AS cid, sv AS c FROM subs WHERE vec_id < {k})"
    ]
    for it in range(1, iters + 1):
        parts.append(
            f"""a{it} AS (
  SELECT e.vec_id, e.sub, c.cid, {dist} AS dist
  FROM subs e JOIN cents{it - 1} c USING (sub)),
b{it} AS (
  SELECT vec_id, sub, cid FROM a{it}
  QUALIFY row_number() OVER (PARTITION BY sub, vec_id ORDER BY dist, cid) = 1),
m{it} AS (
  SELECT b.sub, b.cid, s.pos, {sql_int_mean('s.x', 6)} AS m
  FROM b{it} b JOIN (SELECT vec_id, sub, unnest(sv) AS x,
                            generate_subscripts(sv, 1) AS pos FROM subs) s
       USING (vec_id, sub)
  GROUP BY b.sub, b.cid, s.pos),
cents{it} AS (SELECT sub, cid, list(m ORDER BY pos) AS c FROM m{it} GROUP BY sub, cid)"""
        )
    parts.append(
        f"""af AS (
  SELECT e.vec_id, e.sub, c.cid, {dist} AS dist
  FROM subs e JOIN cents{iters} c USING (sub)),
bf AS (
  SELECT vec_id, sub, cid, dist FROM af
  QUALIFY row_number() OVER (PARTITION BY sub, vec_id ORDER BY dist, cid) = 1)
SELECT CAST(sub AS INTEGER) AS subspace, CAST(cid AS INTEGER) AS code,
       count(*) AS n_assigned,
       {sql_int_sum('dist', 4)} AS distortion
FROM bf GROUP BY sub, cid"""
    )
    return ",\n".join(parts)


ORACLE_EMBEDDING_PQ_TRAIN = _pq_oracle_sql()

QUERIES["embedding_pq_train"] = embedding_pq_train
ORACLE["embedding_pq_train"] = ORACLE_EMBEDDING_PQ_TRAIN


# ---------------------------------------------------------------------------
# Cosine range search (threshold retrieval, the top-k twin)
# ---------------------------------------------------------------------------

#: Cosine acceptance threshold for range retrieval.
_RANGE_TAU = 0.30


def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range retrieval: every corpus vector with cosine >= τ to any of
    the 5 query vectors — the "give me everything similar enough"
    mode (dedup sweeps, recall-oriented retrieval), vs top-k's fixed
    budget. Same scale shape as ``similarity_cosine_topk``: queries
    broadcast, corpus scanned once, zero Python; the threshold filter
    applies to the 4dp-rounded similarity so the acceptance boundary
    is engine-identical."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    scored = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        pround(cosine_similarity(F.col("qemb"), F.col("emb")), 4).alias("sim"),
    )
    return scored.where(F.col("sim") >= _RANGE_TAU)


ORACLE_SIMILARITY_RANGE_SEARCH = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM emb WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id,
         floor(list_cosine_similarity(q.qemb, e.emb) * 10000 + 0.5) / 10000.0 AS sim
  FROM emb e JOIN q ON e.vec_id <> q.qid
)
SELECT qid, vec_id, sim FROM scored WHERE sim >= {_RANGE_TAU}
"""


QUERIES["similarity_range_search"] = similarity_range_search
ORACLE["similarity_range_search"] = ORACLE_SIMILARITY_RANGE_SEARCH


# ---------------------------------------------------------------------------
# Per-label centroid outliers (embedding-space label noise audit)
# ---------------------------------------------------------------------------

#: Outliers reported per label.
_N_OUTLIERS = 3
#: Fixed-point scale for the centroid mean (see docstring).
_CENT_SCALE = 10_000_000


def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: the ``_N_OUTLIERS`` vectors least similar to
    their own label's centroid — the standard embedding-space screen
    for mislabeled / off-distribution rows before training.

    Scale shape: centroids are mergeable sufficient stats — one
    partial+final hash agg over the exploded (label, dim) stream
    compresses the corpus to k×d rows, reassembled into k centroid
    arrays and **broadcast** (KBs regardless of corpus size) for a
    single map-side cosine pass; the only other shuffle is the tiny
    per-label bottom-k window. Centroid components average in exact
    fixed-point (floor(val·1e7+0.5) longs — float32 inputs carry <8
    significant decimals, so the quantization is below input noise):
    a double SUM is partition-order-dependent in the last ulp, and
    the hash gate needs both engines to see bit-identical centroids.
    """
    e = _emb(spark, sf_dir)
    ex = e.select(
        "label", F.posexplode("emb").alias("idx", "val")
    ).select(
        "label",
        "idx",
        F.floor(F.col("val") * _CENT_SCALE + F.lit(0.5)).cast("long").alias("qv"),
    )
    cent = ex.groupBy("label", "idx").agg(
        (F.sum("qv") / (F.count(F.lit(1)) * F.lit(float(_CENT_SCALE)))).alias("cv")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "cv"))), lambda s: s["cv"]
        ).alias("cemb")
    )
    sims = e.join(F.broadcast(cent_arr), "label").select(
        "label",
        "vec_id",
        pround(cosine_similarity(F.col("emb"), F.col("cemb")), 4).alias("sim"),
    )
    w = Window.partitionBy("label").orderBy(F.asc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _N_OUTLIERS)
        .select("label", "vec_id", "sim", F.col("rk").cast("int").alias("rk"))
    )


ORACLE_EMBEDDING_CENTROID_OUTLIERS = f"""
WITH e AS (
  SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS val,
         generate_subscripts(embedding, 1) AS idx
  FROM embeddings),
q AS (SELECT vec_id, label, idx,
             CAST(floor(val * {_CENT_SCALE} + 0.5) AS BIGINT) AS qv, val
      FROM e),
cent AS (
  SELECT label, idx, sum(qv) * 1.0 / (count(*) * {_CENT_SCALE}.0) AS cv
  FROM q GROUP BY label, idx),
cent_arr AS (
  SELECT label, list(cv ORDER BY idx) AS cemb FROM cent GROUP BY label),
emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
sims AS (
  SELECT m.label, m.vec_id,
         floor(list_cosine_similarity(m.emb, c.cemb) * 10000 + 0.5) / 10000.0 AS sim
  FROM emb m JOIN cent_arr c USING (label)),
ranked AS (
  SELECT label, vec_id, sim,
         row_number() OVER (PARTITION BY label ORDER BY sim ASC, vec_id ASC) AS rk
  FROM sims)
SELECT label, vec_id, sim, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= {_N_OUTLIERS}
"""


QUERIES["embedding_centroid_outliers"] = embedding_centroid_outliers
ORACLE["embedding_centroid_outliers"] = ORACLE_EMBEDDING_CENTROID_OUTLIERS


# ---------------------------------------------------------------------------
# IVF-PQ — coarse cells + product-quantized candidate ranking
# ---------------------------------------------------------------------------

#: PQ layout: _IVFPQ_M subspaces of _IVFPQ_SUBDIM dims, _IVFPQ_K codewords each.
_IVFPQ_M = 8
_IVFPQ_K = 8
_IVFPQ_SUBDIM = _DIM // _IVFPQ_M


def _pq_codebooks() -> np.ndarray:
    """Fixed PQ codebooks (stand-in for per-subspace k-means, like
    ``_centroids`` for the coarse quantizer), shape (m, k, subdim),
    rounded so their decimal literals parse to identical doubles in
    Spark and DuckDB."""
    rng = np.random.RandomState(13)
    return np.round(rng.standard_normal((_IVFPQ_M, _IVFPQ_K, _IVFPQ_SUBDIM)) * 0.5, 4)


def _l2(a: F.Column, b: F.Column) -> F.Column:
    """Euclidean distance between two array<double> columns via a JVM
    left-fold — same element order as DuckDB's list_distance, so the
    doubles match bitwise."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _arr_lit(vals) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in vals])


def similarity_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: coarse cells prune the corpus (same 8-cell coarse
    quantizer as :func:`similarity_ivf`), then candidates are ranked by
    the PQ *approximate* distance — the L2 between the query and the
    candidate's PQ reconstruction (mathematically the ADC distance).

    This is the index shape real billion-vector systems ship (FAISS
    IVFPQ): the corpus stores only (cell, 8×3-bit codes) ≈ bytes per
    vector instead of 256 B of floats, queries touch nprobe/ncells of
    the data, and ranking never reads the original vectors.  Here both
    stages are map-side projections against literal codebooks and the
    candidate join is cell-equi against a broadcast query set — at
    100 TB the cell id becomes the partition key and the codes column
    replaces the embedding column in the scan (column pruning does the
    shrinking).

    Everything is deterministic: codebooks are fixed 4-dp literals,
    encode/argmin uses first-min positions, distances fold in array
    order on both engines.  Assign + encode run in an Arrow-batched
    numpy kernel (the sanctioned dense-linalg lane — the expression
    form needs 8 + 64 sqrt-folds per row, far past the whole-stage
    codegen field limit, so Catalyst would interpret it row-by-row);
    ``np.cumsum`` does the distance accumulation SEQUENTIALLY, so
    every partial sum is bit-identical to the JVM/DuckDB left-fold
    and argmin ties resolve at identical first-min positions.
    """
    import pandas as pd

    cents = _centroids()
    cbs = _pq_codebooks()
    emb = _emb(spark, sf_dir)

    def encode_kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            # Coarse assign: sqrt of the SEQUENTIAL (cumsum) sum of
            # squared deltas — the exact left-fold the oracle runs.
            d2 = np.cumsum((X[:, None, :] - cents[None, :, :]) ** 2, axis=2)[:, :, -1]
            d = np.sqrt(d2)
            cell = d.argmin(axis=1)  # first min, like array_position
            masked = np.where(d == d.min(axis=1, keepdims=True), 1e18, d)
            cell2 = masked.argmin(axis=1)
            recon = np.empty_like(X)
            for m in range(_IVFPQ_M):
                S = X[:, m * _IVFPQ_SUBDIM : (m + 1) * _IVFPQ_SUBDIM]
                sd2 = np.cumsum(
                    (S[:, None, :] - cbs[m][None, :, :]) ** 2, axis=2
                )[:, :, -1]
                codes = np.sqrt(sd2).argmin(axis=1)
                recon[:, m * _IVFPQ_SUBDIM : (m + 1) * _IVFPQ_SUBDIM] = cbs[m][codes]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "emb": list(X),
                    "cell": (cell + 1).astype("int32"),
                    "cell2": (cell2 + 1).astype("int32"),
                    "recon": list(recon),
                }
            )

    encoded = emb.mapInPandas(
        encode_kernel,
        schema="vec_id long, emb array<double>, cell int, cell2 int, recon array<double>",
    )

    # One row per (query, probe cell): the OR-of-cells predicate would
    # plan a nested-loop join; exploding the nprobe list makes the
    # probe an EQUI join on cell — hash-joinable, and the shape that
    # still scales when the query set is a million rows, not five.
    queries = encoded.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qemb"),
        F.explode(F.array_distinct(F.array("cell", "cell2"))).alias("pcell"),
    )
    # Conditional hint: broadcast only while the probe set is provably
    # small; a million-query workload exceeds _BROADCAST_QUERY_CAP and
    # takes the unhinted (shuffle-on-cell) path unchanged.
    probe = (
        F.broadcast(queries)
        if _N_QUERIES * _NPROBE <= _BROADCAST_QUERY_CAP
        else queries
    )
    scored = encoded.join(
        probe,
        (F.col("cell") == F.col("pcell")) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        "vec_id",
        "cell",
        pround(_l2(F.col("qemb"), F.col("recon")), 4).alias("adc_dist"),
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("qid", "vec_id", "cell", "adc_dist", F.col("rk").cast("int").alias("rk"))
    )


def _sql_pq_codebook(m: int) -> str:
    """DuckDB literal for subspace m's codebook: list of k sub-vectors."""
    cbs = _pq_codebooks()
    rows = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in cbs[m][j]) + "]" for j in range(_IVFPQ_K)
    )
    return f"[{rows}]::DOUBLE[][]"


def _sql_pq_recon(col: str) -> str:
    """DuckDB expression reconstructing ``col`` from its PQ codes."""
    parts = []
    for m in range(_IVFPQ_M):
        sub = f"{col}[{m * _IVFPQ_SUBDIM + 1}:{(m + 1) * _IVFPQ_SUBDIM}]"
        cdists = (
            "["
            + ", ".join(
                f"list_distance({sub}, list_extract({_sql_pq_codebook(m)}, {j + 1}))"
                for j in range(_IVFPQ_K)
            )
            + "]"
        )
        parts.append(
            f"list_extract({_sql_pq_codebook(m)}, "
            f"CAST(list_position({cdists}, list_min({cdists})) AS INTEGER))"
        )
    return "flatten([" + ", ".join(parts) + "])"


ORACLE_SIMILARITY_IVF_PQ = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
d AS (
  SELECT vec_id, emb,
         [{", ".join(f"list_distance(emb, {_sql_centroid(i)})" for i in range(_N_CELLS))}] AS dists
  FROM emb
),
c1 AS (
  SELECT vec_id, emb, dists,
         CAST(list_position(dists, list_min(dists)) AS INTEGER) AS cell,
         list_transform(dists, x -> CASE WHEN x = list_min(dists) THEN 1e18 ELSE x END) AS masked
  FROM d
),
assigned AS (
  SELECT vec_id, emb, cell,
         CAST(list_position(masked, list_min(masked)) AS INTEGER) AS cell2
  FROM c1
),
encoded AS (
  SELECT vec_id, emb, cell, cell2, {_sql_pq_recon("emb")} AS recon
  FROM assigned
),
q AS (
  SELECT vec_id AS qid, emb AS qemb, cell AS p1, cell2 AS p2
  FROM encoded WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.qid, e.vec_id, e.cell,
         floor(list_distance(q.qemb, e.recon) * 10000 + 0.5) / 10000.0 AS adc_dist
  FROM encoded e JOIN q
    ON (e.cell = q.p1 OR e.cell = q.p2) AND e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id, cell, adc_dist,
         row_number() OVER (PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC) AS rk
  FROM scored
)
SELECT qid, vec_id, cell, adc_dist, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= {_TOP_K}
"""


QUERIES["similarity_ivf_pq"] = similarity_ivf_pq
ORACLE["similarity_ivf_pq"] = ORACLE_SIMILARITY_IVF_PQ


# ---------------------------------------------------------------------------
# SemDeDup-style semantic pruning — cluster, then prune within cluster
# ---------------------------------------------------------------------------

#: Rounded-cosine threshold above which a same-cluster vector with a
#: lower id supersedes this one (SemDeDup's epsilon).
_SEMDEDUP_TAU = 0.45


def dedup_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): partition the
    embedding space into clusters, compare pairs ONLY within a cluster,
    and prune every vector that has a near-duplicate (rounded cosine ≥
    τ) with a smaller vec_id in its cluster.  Returns the per-cluster
    audit: size, pruned count, keep ratio.

    The cluster proxy is the deterministic random-hyperplane bucket
    (:func:`_bucket_expr` — k-means cluster ids aren't reproducible in
    SQL; hyperplane buckets are, and play the same role: restrict the
    quadratic pairwise check to a ~1/256 slice of the corpus).  The
    pruning pass is a bucket-equi self-join — at 100 TB the bucket is
    the partition key, so each task sees one bucket and the all-pairs
    cost is bounded per bucket exactly like ``_BUCKET_CAP`` bounds the
    MinHash-LSH candidate blowup.  Keep-lowest-id is SemDeDup's
    deterministic representative rule.
    """
    emb = _emb(spark, sf_dir).withColumn(
        "bucket", _bucket_expr("emb").cast("int")
    )
    left = emb.select("vec_id", "emb", "bucket")
    lower = emb.select(
        F.col("vec_id").alias("lo_id"),
        F.col("emb").alias("lo_emb"),
        F.col("bucket").alias("lo_bucket"),
    )
    pruned_ids = (
        left.join(
            lower,
            (F.col("bucket") == F.col("lo_bucket"))
            & (F.col("lo_id") < F.col("vec_id"))
            & (
                pround(cosine_similarity(F.col("emb"), F.col("lo_emb")), 4)
                >= F.lit(_SEMDEDUP_TAU)
            ),
            "left_semi",
        )
        .select("vec_id", "bucket")
        .withColumn("is_pruned", F.lit(1))
    )
    return (
        left.select("vec_id", "bucket")
        .join(pruned_ids.select("vec_id", "is_pruned"), "vec_id", "left")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_vecs"),
            F.coalesce(F.sum("is_pruned"), F.lit(0)).alias("n_pruned"),
        )
        .withColumn(
            "keep_ratio",
            pround((F.col("n_vecs") - F.col("n_pruned")) / F.col("n_vecs"), 4),
        )
        .orderBy("bucket")
    )


ORACLE_DEDUP_SEMDEDUP_PRUNE = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         CAST({_sql_bucket("embedding::DOUBLE[]")} AS INTEGER) AS bucket
  FROM embeddings
),
pruned AS (
  SELECT a.vec_id
  FROM emb a
  WHERE EXISTS (
    SELECT 1 FROM emb b
    WHERE b.bucket = a.bucket AND b.vec_id < a.vec_id
      AND floor(list_cosine_similarity(a.emb, b.emb) * 10000 + 0.5) / 10000.0
          >= {_SEMDEDUP_TAU}
  )
)
SELECT e.bucket,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(p.vec_id) AS BIGINT) AS n_pruned,
       floor(((count(*) - count(p.vec_id)) * 1.0 / count(*)) * 10000 + 0.5) / 10000.0
         AS keep_ratio
FROM emb e LEFT JOIN pruned p ON e.vec_id = p.vec_id
GROUP BY e.bucket
ORDER BY e.bucket
"""


QUERIES["dedup_semdedup_prune"] = dedup_semdedup_prune
ORACLE["dedup_semdedup_prune"] = ORACLE_DEDUP_SEMDEDUP_PRUNE


# ---------------------------------------------------------------------------
# Truncated-embedding (Matryoshka) fidelity audit
# ---------------------------------------------------------------------------

#: Truncated prefix length for the fidelity audit (64 → 16 dims).
_TRUNC_DIM = 16


def similarity_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-fidelity audit for prefix-truncated embeddings
    (the Matryoshka/MRL storage trick: keep the first d' dims, cut
    index size 4×): per query, the exact top-1 neighbour and top-5
    overlap under full-64-dim vs first-16-dim cosine.

    Both similarity sets come from ONE corpus scan and one broadcast
    of the 5-row query set (the same deliberate exact-scan shape as
    :func:`similarity_cosine_topk`); the two rankings are windows over
    the scored slice and the overlap is a (qid, vec_id) self-equi join
    of two top-5 row sets.  The number this emits — agreement@1 /
    overlap@5 — is what decides whether the truncated index can serve
    first-stage retrieval at scale with full-dim re-ranking.
    """
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    scored = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        pround(cosine_similarity(F.col("qemb"), F.col("emb")), 4).alias("sim_full"),
        pround(
            cosine_similarity(
                F.slice(F.col("qemb"), 1, _TRUNC_DIM),
                F.slice(F.col("emb"), 1, _TRUNC_DIM),
            ),
            4,
        ).alias("sim_trunc"),
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("sim_full"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(F.desc("sim_trunc"), F.asc("vec_id"))
    ranked = scored.select(
        "qid",
        "vec_id",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(wt).alias("rk_trunc"),
    )
    # Both ranks live on the SAME row of `ranked`, so the overlap is a
    # plain conditional aggregate — no top-k self-join (which would
    # recompute the scored relation on both sides).
    return (
        ranked.where((F.col("rk_full") <= _TOP_K) | (F.col("rk_trunc") <= _TOP_K))
        .groupBy("qid")
        .agg(
            F.min(F.when(F.col("rk_full") == 1, F.col("vec_id"))).alias("nn_full"),
            F.min(F.when(F.col("rk_trunc") == 1, F.col("vec_id"))).alias("nn_trunc"),
            (
                F.sum(
                    F.when(
                        (F.col("rk_full") <= _TOP_K) & (F.col("rk_trunc") <= _TOP_K),
                        1,
                    ).otherwise(0)
                )
                / F.lit(float(_TOP_K))
            ).alias("overlap_at_5"),
        )
        .select(
            "qid",
            "nn_full",
            "nn_trunc",
            F.when(F.col("nn_full") == F.col("nn_trunc"), 1)
            .otherwise(0)
            .cast("int")
            .alias("agree_top1"),
            "overlap_at_5",
        )
        .orderBy("qid")
    )


ORACLE_SIMILARITY_TRUNCATION_AUDIT = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM emb WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id,
         floor(list_cosine_similarity(q.qemb, e.emb) * 10000 + 0.5) / 10000.0 AS sim_full,
         floor(list_cosine_similarity(q.qemb[1:{_TRUNC_DIM}], e.emb[1:{_TRUNC_DIM}]) * 10000 + 0.5) / 10000.0 AS sim_trunc
  FROM emb e JOIN q ON e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim_full DESC, vec_id ASC) AS rk_full,
         row_number() OVER (PARTITION BY qid ORDER BY sim_trunc DESC, vec_id ASC) AS rk_trunc
  FROM scored
),
agg AS (
  SELECT qid,
         min(CASE WHEN rk_full = 1 THEN vec_id END) AS nn_full,
         min(CASE WHEN rk_trunc = 1 THEN vec_id END) AS nn_trunc,
         sum(CASE WHEN rk_full <= {_TOP_K} AND rk_trunc <= {_TOP_K} THEN 1 ELSE 0 END)
           * 1.0 / {float(_TOP_K)} AS overlap_at_5
  FROM ranked
  WHERE rk_full <= {_TOP_K} OR rk_trunc <= {_TOP_K}
  GROUP BY qid
)
SELECT qid, nn_full, nn_trunc,
       CAST(CASE WHEN nn_full = nn_trunc THEN 1 ELSE 0 END AS INTEGER) AS agree_top1,
       overlap_at_5
FROM agg
ORDER BY qid
"""


QUERIES["similarity_truncation_audit"] = similarity_truncation_audit
ORACLE["similarity_truncation_audit"] = ORACLE_SIMILARITY_TRUNCATION_AUDIT


# ---------------------------------------------------------------------------
# Reciprocal-rank-fusion retrieval
# ---------------------------------------------------------------------------

#: RRF smoothing constant (the standard k=60 from the original paper).
_RRF_K = 60
#: Fused results emitted per query.
_RRF_TOP = 10


def similarity_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings — full-dim
    cosine and truncated-``_TRUNC_DIM``-dim cosine — into one fused
    top-``_RRF_TOP`` list per query: the standard ensemble step when a
    cheap first-stage index and an exact scorer disagree
    (score = Σ 1/(k + rank), k = 60).

    Both rankings come from ONE scored relation (one corpus scan, one
    broadcast of the bounded query set — the
    :func:`similarity_truncation_audit` shape), so fusion is two
    window ranks over the same rows plus an arithmetic combine; the
    final per-query top-10 is one more window — no self-joins, no
    recomputation, nothing driver-side.  At 100 TB the scored
    relation comes from the ANN path (IVF/LSH) instead of the exact
    scan; the fusion arithmetic is unchanged.
    """
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    scored = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        pround(cosine_similarity(F.col("qemb"), F.col("emb")), 4).alias("sim_full"),
        pround(
            cosine_similarity(
                F.slice(F.col("qemb"), 1, _TRUNC_DIM),
                F.slice(F.col("emb"), 1, _TRUNC_DIM),
            ),
            4,
        ).alias("sim_trunc"),
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("sim_full"), F.asc("vec_id"))
    wt = Window.partitionBy("qid").orderBy(F.desc("sim_trunc"), F.asc("vec_id"))
    fused = scored.select(
        "qid",
        "vec_id",
        (
            F.lit(1.0) / (F.lit(_RRF_K) + F.row_number().over(wf))
            + F.lit(1.0) / (F.lit(_RRF_K) + F.row_number().over(wt))
        ).alias("rrf_raw"),
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("rrf_raw"), F.asc("vec_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wr).cast("long"))
        .where(F.col("fused_rank") <= _RRF_TOP)
        .select("qid", "fused_rank", "vec_id", pround(F.col("rrf_raw"), 6).alias("rrf_score"))
        .orderBy("qid", "fused_rank")
    )


ORACLE_SIMILARITY_RANK_FUSION = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qemb FROM emb WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.qid, e.vec_id,
         floor(list_cosine_similarity(q.qemb, e.emb) * 10000 + 0.5) / 10000.0 AS sim_full,
         floor(list_cosine_similarity(q.qemb[1:{_TRUNC_DIM}], e.emb[1:{_TRUNC_DIM}]) * 10000 + 0.5) / 10000.0 AS sim_trunc
  FROM emb e JOIN q ON e.vec_id <> q.qid
),
fused AS (
  SELECT qid, vec_id,
         1.0 / ({_RRF_K} + row_number() OVER (PARTITION BY qid ORDER BY sim_full DESC, vec_id ASC))
         + 1.0 / ({_RRF_K} + row_number() OVER (PARTITION BY qid ORDER BY sim_trunc DESC, vec_id ASC))
           AS rrf_raw
  FROM scored
),
ranked AS (
  SELECT qid, vec_id, rrf_raw,
         row_number() OVER (PARTITION BY qid ORDER BY rrf_raw DESC, vec_id ASC) AS fused_rank
  FROM fused
)
SELECT qid, CAST(fused_rank AS BIGINT) AS fused_rank, vec_id,
       floor(rrf_raw * 1000000 + 0.5) / 1000000.0 AS rrf_score
FROM ranked WHERE fused_rank <= {_RRF_TOP}
ORDER BY qid, fused_rank
"""

QUERIES["similarity_rank_fusion"] = similarity_rank_fusion
ORACLE["similarity_rank_fusion"] = ORACLE_SIMILARITY_RANK_FUSION


# ---------------------------------------------------------------------------
# Embedding hygiene audit
# ---------------------------------------------------------------------------

#: Norms below this are treated as zero vectors.
_NORM_EPS = 1e-12


def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column hygiene report, per label: vector count, dim
    consistency (min/max cardinality), zero-vector and non-finite
    counts, and the L2-norm distribution — the sanity pass that runs
    before any ANN index build or cosine pipeline (a handful of NaN
    or zero vectors silently poisons IVF centroids and normalized
    dot products).

    Scale shape: everything is a map-side higher-order-function fold
    (``aggregate``/``exists`` — JVM-side, no Python) followed by one
    hash aggregate on the label key.  One scan, one small shuffle.
    The per-element fold order is the list order on both engines, so
    norms are bit-identical.

    avg_norm is the integer-sum mean (round-12 migration of the
    fractional-avg latent class the mutual-kNN flip proved): each
    GOOD row's norm quantizes to a 1e-6-unit long FIRST, the long sum
    is partition-order free, and ONE division matches the oracle.

    Malformed-row contract (round-12 self-review: the engines'
    NULL-fold semantics diverge — Spark's ``aggregate`` propagates a
    NULL element into a NULL norm while DuckDB's ``sum`` skips it and
    returns a partial norm — so no norm statistic may ever SEE a
    malformed row): ``bad`` counts rows that are NULL, contain a NULL
    element, or contain a non-finite element, identically in both
    engines; every norm statistic (n_zero, avg/min/max) is computed
    over the GOOD rows only, and a label whose rows are all bad
    reports NULL for all four.  n_vecs / dims still cover every row —
    that is the hygiene report's job.
    """
    emb = _emb(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    bad = (
        F.when(F.col("emb").isNull(), F.lit(1))
        .when(F.exists(F.col("emb"), lambda v: v.isNull()), F.lit(1))
        .when(
            F.exists(
                F.col("emb"),
                lambda v: F.isnan(v) | (F.abs(v) == F.lit(float("inf"))),
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    audited = emb.select(
        "label",
        F.size("emb").alias("dims"),
        norm.alias("norm"),
        bad.alias("bad"),
    ).withColumn(
        "norm6",
        F.when(
            F.col("bad") == 0,
            F.floor(F.col("norm") * 1000000 + F.lit(0.5)).cast("long"),
        ),
    )
    n_good = F.sum(F.when(F.col("bad") == 0, 1).otherwise(0))
    return (
        audited.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("dims").alias("min_dims"),
            F.max("dims").alias("max_dims"),
            F.sum(
                F.when(
                    (F.col("bad") == 0) & (F.col("norm") < _NORM_EPS), 1
                ).otherwise(0)
            ).alias("n_zero"),
            F.sum("bad").alias("n_nonfinite"),
            F.when(
                n_good > 0,
                pround(F.sum("norm6") / (n_good * 1000000), 6),
            ).alias("avg_norm"),
            pround(
                F.min(F.when(F.col("bad") == 0, F.col("norm"))), 6
            ).alias("min_norm"),
            pround(
                F.max(F.when(F.col("bad") == 0, F.col("norm"))), 6
            ).alias("max_norm"),
        )
        .orderBy("label")
    )


ORACLE_EMBEDDING_NORM_AUDIT = f"""
WITH audited AS (
  SELECT label,
         len(embedding) AS dims,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm,
         CASE WHEN embedding IS NULL THEN 1
              WHEN len(list_filter(embedding, x -> x IS NULL)) > 0 THEN 1
              WHEN len(list_filter(embedding::DOUBLE[],
                                   x -> isnan(x) OR isinf(x))) > 0 THEN 1
              ELSE 0 END AS bad
  FROM embeddings
),
quant AS (
  SELECT *,
         CASE WHEN bad = 0
              THEN CAST(floor(norm * 1000000 + 0.5) AS BIGINT) END AS norm6
  FROM audited
)
SELECT label,
       count(*) AS n_vecs,
       CAST(min(dims) AS INTEGER) AS min_dims,
       CAST(max(dims) AS INTEGER) AS max_dims,
       CAST(sum(CASE WHEN bad = 0 AND norm < {_NORM_EPS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_zero,
       CAST(sum(bad) AS BIGINT) AS n_nonfinite,
       CASE WHEN sum(CASE WHEN bad = 0 THEN 1 ELSE 0 END) > 0 THEN
         floor(CAST(sum(norm6) AS DOUBLE)
               / (sum(CASE WHEN bad = 0 THEN 1 ELSE 0 END) * 1000000)
               * 1000000 + 0.5) / 1000000.0
       END AS avg_norm,
       floor(min(CASE WHEN bad = 0 THEN norm END) * 1000000 + 0.5)
         / 1000000.0 AS min_norm,
       floor(max(CASE WHEN bad = 0 THEN norm END) * 1000000 + 0.5)
         / 1000000.0 AS max_norm
FROM quant
GROUP BY label ORDER BY label
"""

QUERIES["embedding_norm_audit"] = embedding_norm_audit
ORACLE["embedding_norm_audit"] = ORACLE_EMBEDDING_NORM_AUDIT


# ---------------------------------------------------------------------------
# Mutual-kNN reciprocity audit
# ---------------------------------------------------------------------------

#: Neighbours per vector in the kNN-graph audit.
_KNN_K = 5


def similarity_mutual_knn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity profile of the exact cosine kNN graph: per
    neighbour rank r (1..k), how many directed edges (a→b at rank r)
    are MUTUAL (b→a is also a kNN edge at any rank) — the structural
    health check for kNN graphs before they feed semantic dedup or
    graph-based label propagation (low reciprocity at low ranks marks
    hub-dominated, unreliable neighbourhoods).

    Shape: the same 2D block-grid GEMM decomposition as
    :func:`similarity_pair_topk`, but the per-group numpy kernel emits
    each vector's DIRECTED local top-k (a vector's candidate set is
    partitioned across its B groups, so the union of local top-ks
    contains the global top-k); one src-keyed window reduces to the
    global kNN edges, and mutuality is a self-equi join on the
    reversed key.  Shuffle volume is n·B·k edge rows, never n²; no
    driver-side collect.  The kernel rounds sims to 4 dp BEFORE
    selection (deterministic (−sim, dst) tie-break), so Spark and the
    n² DuckDB oracle can never disagree on a boundary neighbour.
    """
    import pandas as pd  # noqa: F401  (kernel-side)

    def knn_kernel(key, pdf):
        import pandas as pd

        bi, bj = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        blks = pdf["blk"].to_numpy()
        mat = np.asarray(pdf["emb"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms)
        sims = np.floor(sims * 10000.0 + 0.5) / 10000.0
        mask = ids[None, :] != ids[:, None]
        if bi != bj:
            mask &= blks[None, :] != blks[:, None]
        srcs, dsts, out = [], [], []
        for r in range(len(ids)):
            cand = np.nonzero(mask[r])[0]
            if not len(cand):
                continue
            order = np.lexsort((ids[cand], -sims[r, cand]))[:_KNN_K]
            pick = cand[order]
            srcs.append(np.full(len(pick), ids[r], dtype=np.int64))
            dsts.append(ids[pick].astype(np.int64))
            out.append(sims[r, pick])
        if not srcs:
            return pd.DataFrame({"src": [], "dst": [], "sim": []})
        return pd.DataFrame(
            {
                "src": np.concatenate(srcs),
                "dst": np.concatenate(dsts),
                "sim": np.concatenate(out),
            }
        )

    local = (
        _pair_blocks(spark, sf_dir)
        .groupBy("bi", "bj")
        .applyInPandas(knn_kernel, schema="src long, dst long, sim double")
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    knn = (
        local.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KNN_K)
        .localCheckpoint(eager=False)  # both join sides consume it; on a
        # cluster: persist(DISK_ONLY)
    )
    rev = knn.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("m")
    )
    return (
        knn.join(rev, ["src", "dst"], "left")
        .groupBy("rk")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.coalesce(F.sum("m"), F.lit(0)).cast("bigint").alias("n_mutual"),
            pround(F.coalesce(F.sum("m"), F.lit(0)) / F.count(F.lit(1)), 6).alias(
                "reciprocity"
            ),
            # avg over exact 4-dp integers, not F.avg over doubles: a
            # double sum is partition-order dependent, and at sf0.1 the
            # rank-3 mean sits exactly on a 1e-6 rounding boundary
            # (observed round 11: 0.366904 vs 0.366905).  floor(sim*1e4
            # + 0.5) recovers the kernel's exact 4-dp integer, the long
            # sum is order-free, and ONE division matches the oracle.
            pround(
                F.sum(
                    F.floor(F.col("sim") * 10000 + F.lit(0.5)).cast("long")
                )
                / (F.count(F.lit(1)) * 10000),
                6,
            ).alias("avg_sim"),
        )
        .select(F.col("rk").cast("long").alias("rank"), "n_edges", "n_mutual",
                "reciprocity", "avg_sim")
        .orderBy("rank")
    )


ORACLE_SIMILARITY_MUTUAL_KNN_AUDIT = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
sims AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         floor(list_cosine_similarity(a.emb, b.emb) * 10000 + 0.5) / 10000.0 AS sim
  FROM emb a JOIN emb b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT src, dst, sim,
         row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst ASC) AS rk
  FROM sims
),
knn AS (SELECT * FROM ranked WHERE rk <= {_KNN_K})
SELECT CAST(e1.rk AS BIGINT) AS rank,
       count(*) AS n_edges,
       CAST(sum(CASE WHEN e2.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_mutual,
       floor((sum(CASE WHEN e2.src IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*))
             * 1000000 + 0.5) / 1000000.0 AS reciprocity,
       floor((CAST(sum(CAST(floor(e1.sim * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
              / (count(*) * 10000)) * 1000000 + 0.5) / 1000000.0 AS avg_sim
FROM knn e1 LEFT JOIN knn e2 ON e1.src = e2.dst AND e1.dst = e2.src
GROUP BY e1.rk ORDER BY rank
"""

QUERIES["similarity_mutual_knn_audit"] = similarity_mutual_knn_audit
ORACLE["similarity_mutual_knn_audit"] = ORACLE_SIMILARITY_MUTUAL_KNN_AUDIT


# ---------------------------------------------------------------------------
# k-center greedy coreset selection
# ---------------------------------------------------------------------------

#: Coreset size for the greedy k-center sweep.
_CORESET_K = 6


def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-maximizing coreset: greedy k-center selection over
    the embedding table (repeatedly pick the point FARTHEST from the
    already-chosen set under cosine distance) — the classic 2-approx
    cover that picks maximally diverse training exemplars, the
    opposite pole from :func:`dedup_semdedup_prune`'s redundancy
    removal.

    Loop discipline (Lloyd/PageRank shape): the iteration state is a
    per-point running min-distance column, updated each round by ONE
    broadcast of the single newly-picked row (never the chosen set,
    never a re-scan of picks) and checkpointed so the plan stays
    round-sized; the pick itself is a 1-row TakeOrdered.  Per round at
    100 TB: one narrow map over the point set plus a k-sized
    reduction — no quadratic term, nothing driver-side.  Cosine is
    4-dp-rounded before the distance so both engines argmax over
    identical grids (ties break on vec_id).
    """
    emb = _emb(spark, sf_dir).select("vec_id", "emb")
    seed = emb.where(F.col("vec_id") == 0)
    dist_to = lambda pemb: F.lit(1.0) - pround(  # noqa: E731
        cosine_similarity(F.col("emb"), pemb), 4
    )
    state = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(seed.select(F.col("emb").alias("pemb"))))
        .select("vec_id", "emb", dist_to(F.col("pemb")).alias("md"))
        .localCheckpoint(eager=False)
    )
    picks = [
        seed.select(
            F.lit(1).cast("long").alias("pick_order"),
            "vec_id",
            F.lit(0.0).alias("min_dist"),
        )
    ]
    for i in range(2, _CORESET_K + 1):
        pick = state.orderBy(F.desc("md"), F.asc("vec_id")).limit(1)
        picks.append(
            pick.select(
                F.lit(i).cast("long").alias("pick_order"),
                "vec_id",
                pround(F.col("md"), 6).alias("min_dist"),
            )
        )
        if i < _CORESET_K:
            state = (
                state.crossJoin(
                    F.broadcast(
                        pick.select(
                            F.col("vec_id").alias("pid"), F.col("emb").alias("pemb")
                        )
                    )
                )
                .where(F.col("vec_id") != F.col("pid"))
                .select(
                    "vec_id",
                    "emb",
                    F.least(F.col("md"), dist_to(F.col("pemb"))).alias("md"),
                )
                .localCheckpoint(eager=False)
            )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out.orderBy("pick_order")


# Unrolled-CTE DuckDB twin (module-level code, not a helper function,
# so it does not perturb sibling keys' staleness hashes — the
# graph_pagerank_bipartite convention).
_CS_D = "1 - floor(list_cosine_similarity({a}, {b}) * 10000 + 0.5) / 10000.0"
_CS_PARTS = [
    "WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),\n"
    "d1 AS (SELECT e.vec_id, e.emb, "
    + _CS_D.format(a="e.emb", b="p.emb")
    + " AS md\n  FROM emb e, (SELECT emb FROM emb WHERE vec_id = 0) p"
    " WHERE e.vec_id <> 0)"
]
for _i in range(1, _CORESET_K):
    _CS_PARTS.append(
        f"p{_i} AS (SELECT vec_id, emb, md FROM d{_i}"
        f" ORDER BY md DESC, vec_id ASC LIMIT 1)"
    )
    if _i < _CORESET_K - 1:
        _CS_PARTS.append(
            f"d{_i + 1} AS (SELECT s.vec_id, s.emb, least(s.md, "
            + _CS_D.format(a="s.emb", b="p.emb")
            + f") AS md\n  FROM d{_i} s, p{_i} p"
            f" WHERE s.vec_id <> p.vec_id)"
        )
_CS_SELECTS = [
    "SELECT CAST(1 AS BIGINT) AS pick_order, CAST(0 AS BIGINT) AS vec_id,"
    " 0.0 AS min_dist"
]
for _i in range(1, _CORESET_K):
    _CS_SELECTS.append(
        f"SELECT CAST({_i + 1} AS BIGINT), vec_id,"
        f" floor(md * 1000000 + 0.5) / 1000000.0 FROM p{_i}"
    )
ORACLE_SAMPLE_CORESET_KCENTER = (
    ",\n".join(_CS_PARTS)
    + "\n"
    + "\nUNION ALL\n".join(_CS_SELECTS)
    + "\nORDER BY pick_order"
)

QUERIES["sample_coreset_kcenter"] = sample_coreset_kcenter
ORACLE["sample_coreset_kcenter"] = ORACLE_SAMPLE_CORESET_KCENTER
