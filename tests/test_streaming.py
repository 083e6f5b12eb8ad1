"""Structured Streaming tests: drain the stream with AvailableNow and
assert equality with the batch twin's semantics."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.streaming.stream import (
    deduped_stream,
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_window_counts,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-write events as multiple parquet files (a stream of files),
    with the ns→us conversion applied."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    # watermark wider than the fixture's whole time span: batch equality
    # requires no late-drop (AvailableNow may split files into several
    # micro-batches, advancing the watermark between them)
    stream = windowed_counts(
        read_events_stream(spark, events_dir), watermark="35 days"
    )
    # complete mode: emit ALL window state at the end — append mode only
    # emits windows the watermark has passed, which here is none
    run_to_memory(stream, "win_counts", output_mode="complete")
    got = spark.table("win_counts")

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
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
    assert got.subtract(batch).count() == 0
    assert batch.subtract(got).count() == 0


def test_dedup_within_watermark(spark, events_dir):
    stream = deduped_stream(read_events_stream(spark, events_dir))
    run_to_memory(stream, "dedup_events")
    got = spark.table("dedup_events")
    # event_ids are unique in the fixture: dedup must be lossless here
    assert got.count() == got.select("event_id").distinct().count()


def test_sliding_windows_run(spark, sf_dir, events_dir):
    stream = sliding_window_counts(
        read_events_stream(spark, events_dir), watermark="35 days"
    )
    run_to_memory(stream, "slide_counts", output_mode="complete")
    got = spark.table("slide_counts")
    # every event lands in window/slide = 2 panes → total = 2 × events
    n_src = load_table(spark, sf_dir, "events").count()
    n_events = got.agg(F.sum("n_events")).collect()[0][0]
    assert n_events == 2 * n_src
    assert got.count() > 0


def test_session_windows_run(spark, events_dir):
    stream = session_windows(read_events_stream(spark, events_dir))
    run_to_memory(stream, "sess_counts", output_mode="append")
    got = spark.table("sess_counts")
    assert got.count() > 0
    assert got.filter(F.col("win_end") < F.col("win_start")).count() == 0
