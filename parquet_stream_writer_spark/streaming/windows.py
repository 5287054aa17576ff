"""Watermarked event-time window pipelines for streaming DataFrames.

Same aggregation shapes as the batch-verified
``operators.streaming_batch`` (the oracle checks those); these lift
them onto an unbounded stream with late-data handling:

- watermark bounds state: windows older than (max event time −
  watermark) are finalized and evicted — the knob that keeps state
  size constant at 100 TB/day stream volume;
- output mode "append" emits only finalized windows (exactly-once
  parquet sinks), "update" emits refinements (dashboards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parquet_stream_writer_spark.functions import pround


def _with_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (not TIMESTAMP_NTZ); under the UTC
    session timezone the cast preserves the instant."""
    return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def tumbling_window_agg(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
) -> DataFrame:
    return (
        _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), group_col, "n_events", "sum_value")
    )


def sliding_window_agg(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.avg("value"), 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n_events", "avg_value")
    )


def session_window_agg(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session windows (dynamic gap-merged state) — the
    streaming counterpart of the batch gaps-and-islands sessionize."""
    return (
        _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(stream: DataFrame, keys: list[str], *, ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Cross-micro-batch exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps one row per key while
    evicting state older than the watermark — the streaming face of
    ``operators.dedup.dedup_exact``."""
    return (
        _with_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def windowed_dedup(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Streaming twin of the batch-verified
    ``operators.streaming_batch.events_windowed_dedup``: keep one
    event per (hour-window, ``keys``) via
    ``dropDuplicatesWithinWatermark`` on the truncated-hour column.

    Because every dedup key is confined to one event-time hour, any
    watermark ≥ the window width + max lateness gives EXACTLY the
    batch semantics (a key's state cannot be evicted while that hour
    can still produce rows); the watermark is what bounds state to
    O(keys per active window) instead of O(all keys ever)."""
    s = _with_event_time(stream, ts_col).withColumn(
        "w_start", F.date_trunc("hour", F.col(ts_col))
    )
    return s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["w_start", *keys]
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on ``key`` with a time-range bound:
    right events within ``[left.ts + lower, left.ts + upper]``.

    Both sides are watermarked, which lets Spark's symmetric hash
    join evict buffered rows once they can no longer match — state
    stays proportional to the interval width × arrival rate, not the
    stream length. Without the time bound (or watermarks) a
    stream-stream join must buffer both streams forever; this is the
    canonical bounded-state formulation (attribution joins,
    click→conversion funnels).
    """
    l = _with_event_time(left, "ts").withWatermark("ts", watermark).alias("l")
    r = _with_event_time(right, "ts").withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.expr(f"l.ts + {lower}"))
        & (F.col("r.ts") <= F.expr(f"l.ts + {upper}"))
    )
    return l.join(r, cond).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("r.ts").alias("right_ts"),
    )


def value_histogram_agg(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "6 hours",
    watermark: str = "12 hours",
    width: float = 50.0,
    max_bin: int = 9,
) -> DataFrame:
    """Windowed fixed-width value histogram — the streaming lift of
    ``operators.streaming_batch.events_value_histogram``.  The batch
    op's global bins become per-window bins so the watermark can
    finalize and evict them; state is O(windows × types × bins),
    constant per unit time regardless of stream volume.  Bin indexing
    is the same explicit ``floor(value / width)`` (engine-portable)
    arithmetic the batch/oracle pair pins."""
    binned = (
        _with_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .withColumn(
            "bin",
            F.least(
                F.floor(F.col("value") / width),
                F.lit(max_bin).cast("long"),
            ),
        )
    )
    return (
        binned.groupBy(F.window(ts_col, window).alias("w"), "event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "bin",
            "n_events",
            "sum_value",
        )
    )


def first_touch_agg(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    group_col: str = "event_type",
    user_col: str = "user_id",
    watermark: str = "30 days",
) -> DataFrame:
    """Incrementally maintained first-touch relation: per (group,
    user), the MINIMUM event time seen so far — the streaming
    substrate of the batch adoption curve
    (``operators.staged3.events_cumulative_unique_users``: its
    first_touch aggregate is exactly this relation; the per-day
    new/cumulative rollup is a bounded view over it).

    MIN is mergeable and arrival-order-insensitive, so the maintained
    state converges to the batch answer no matter how events are split
    across micro-batches (a ``dropDuplicates``-based "first SEEN"
    variant would depend on arrival order and fork from the batch
    twin).  State is user-universe-sized by design — an all-time
    adoption curve needs it; at 1e9 users this state lives in a keyed
    store (RocksDB state backend), and the watermark bounds only the
    lateness horizon, not the key count.  Run in "update" mode: each
    micro-batch emits refined minimums for the keys it touched.
    """
    s = _with_event_time(stream, ts_col).withWatermark(ts_col, watermark)
    return s.groupBy(group_col, user_col).agg(
        F.min(ts_col).alias("first_touch")
    )
