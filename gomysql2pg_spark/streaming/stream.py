"""Structured Streaming operators (SURVEY.md §2.D C6).

The batch twins in `operators.events` define the semantics (and carry
the SQL oracles); these are the genuinely-streaming formulations:
file-source streams with watermarks, tumbling/sliding windows,
within-watermark dedup, and session windows. Tested with
Trigger.AvailableNow against a memory sink and asserted equal to the
batch results (tests/test_streaming.py).

100 TB / production notes baked into the shapes below:
- watermark bounds state; without it every window lives forever,
- windowed aggregation state is keyed (window × event_type) — small;
  sessionization state is keyed by user — bounded by active users,
- `dropDuplicatesWithinWatermark` is the streaming twin of
  dedup-by-key compaction,
- sinks should be idempotent (exactly-once via checkpoint + dedup-key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over parquet event files (schema pinned —
    streaming sources require it)."""
    reader = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark bounding
    state (late data beyond `watermark` is dropped — the streaming
    equivalent of the batch bucket aggregation in operators.events)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding windows: each event contributes to window/slide panes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def deduped_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Within-watermark dedup by event_id — idempotent ingest of an
    at-least-once source; state is bounded by the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Native session windows (gap-based), per user — the streaming twin
    of operators.events.q_events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain the stream with Trigger.AvailableNow into an in-memory
    table `name` (test harness; a production job swaps the sink for
    kafka/delta/parquet + checkpointLocation)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
