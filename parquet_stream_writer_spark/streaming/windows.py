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
