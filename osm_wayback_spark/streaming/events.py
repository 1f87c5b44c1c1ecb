"""Structured Streaming layer.

The reference is batch-only (its "streams" are Unix pipes —
SURVEY.md §2 X1); the one stream-shaped thing it computes is the
session-like temporal clustering of changesets (the 60 s thresholds
in way-history-builder.js:3-7). This module provides the streaming
counterparts a continuously-crawled pages/events feed would need:

- ``windowed_event_counts``: watermarked tumbling-window aggregation
  (late data bounded by the watermark);
- ``sessionize``: ``session_window`` gap clustering — the streaming
  analog of the reference's changeset clustering;
- ``run_available_now``: drains everything currently in the source
  (Trigger.AvailableNow) into an in-memory table — batch-equivalent
  semantics, used by tests to golden-compare against the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + sums per event_type with a watermark
    bounding late-data state."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user session windows with a gap timeout — the streaming
    form of the reference's changeset temporal clustering (≤60 s gap
    merges minor changesets, way-history-builder.js:266-272)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_available_now(
    stream_df: DataFrame, table_name: str, timeout_s: int = 120
) -> None:
    """Drain the source with Trigger.AvailableNow into an in-memory
    table (complete mode) and block until done."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
