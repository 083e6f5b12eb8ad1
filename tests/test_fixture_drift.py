"""Fixture-drift canary: the loader must be timestamp-unit agnostic.

The driver's testdata changed `events.ts` from parquet TIMESTAMP(NANOS)
to TIMESTAMP(MICROS) between rounds 3 and 4, silently breaking 17
queries. These tests synthesize the same table at every plausible unit
(ns/us/ms, with and without UTC adjustment) and assert that
`catalog.load_table` and `streaming.read_events_stream` always produce
a microsecond-precision TIMESTAMP column with identical epoch values —
so the next encoding drift fails as one named assertion, not as dozens
of cryptic AnalysisExceptions.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gomysql2pg_spark.catalog import load_table, timestamp_units

#: 2024-01-01T00:00:00Z and one microsecond-off neighbor, as epoch-us.
EPOCH_US = [1_704_067_200_000_000, 1_704_067_200_000_001, 1_704_070_800_500_000]


def _write_events(dir_path: str, unit: str, tz: str | None) -> str:
    """Write a minimal events.parquet with ts at the given unit/tz."""
    scale = {"ms": 1_000, "us": 1, "ns": 0.001}[unit]
    # ns stores more precision; ms truncates — keep values ms-exact for
    # the ms case so every unit round-trips to the same microseconds.
    us = EPOCH_US if unit != "ms" else [v // 1000 * 1000 for v in EPOCH_US]
    vals = [int(v / scale) if unit != "ns" else v * 1000 for v in us]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(vals, pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["view", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, "events.parquet")
    pq.write_table(table, path)
    return path


UNITS = [("ns", None), ("us", None), ("ms", None), ("us", "UTC"), ("ms", "UTC")]


@pytest.mark.parametrize("unit,tz", UNITS, ids=[f"{u}{'-utc' if t else ''}" for u, t in UNITS])
def test_load_table_unit_agnostic(spark, tmp_path, unit, tz):
    d = str(tmp_path / f"fixture_{unit}_{tz or 'naive'}")
    _write_events(d, unit, tz)
    df = load_table(spark, d, "events")
    ts_field = [f for f in df.schema.fields if f.name == "ts"][0]
    assert ts_field.dataType.typeName() == "timestamp", ts_field.dataType
    from pyspark.sql import functions as F

    got = [
        r[0]
        for r in df.select(F.unix_micros("ts")).orderBy("ts").collect()
    ]
    want = EPOCH_US if unit != "ms" else [v // 1000 * 1000 for v in EPOCH_US]
    assert got == want, (unit, tz, got)


@pytest.mark.parametrize("unit,tz", UNITS, ids=[f"{u}{'-utc' if t else ''}" for u, t in UNITS])
def test_stream_reader_unit_agnostic(spark, tmp_path, unit, tz):
    from gomysql2pg_spark.streaming.stream import read_events_stream

    d = str(tmp_path / f"stream_fixture_{unit}_{tz or 'naive'}")
    _write_events(d, unit, tz)
    stream = read_events_stream(spark, d)
    assert stream.isStreaming
    ts_field = [f for f in stream.schema.fields if f.name == "ts"][0]
    assert ts_field.dataType.typeName() == "timestamp", ts_field.dataType

    from pyspark.sql import functions as F

    sink = f"drift_{unit}_{tz or 'naive'}".lower()
    q = (
        stream.select(F.unix_micros("ts").alias("us"))
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r[0] for r in spark.sql(f"SELECT us FROM {sink}").collect()
    )
    want = EPOCH_US if unit != "ms" else [v // 1000 * 1000 for v in EPOCH_US]
    assert got == want, (unit, got)


def test_real_fixture_loads_as_timestamp(spark, sf_dir):
    """Whatever unit the driver ships, events.ts loads as TIMESTAMP."""
    units = timestamp_units(os.path.join(sf_dir, "events.parquet"))
    assert "ts" in units  # fixture still has a physical timestamp column
    df = load_table(spark, sf_dir, "events")
    ts_field = [f for f in df.schema.fields if f.name == "ts"][0]
    assert ts_field.dataType.typeName() == "timestamp", (
        units,
        ts_field.dataType,
    )


def test_bench_split_fixtures_load_identically(spark, tmp_path, monkeypatch):
    """The bench's multi-file fixture copies must stay content- and
    unit-identical to the source (the drift canary extends to them:
    bench.py rebuilds the copy whenever source size/mtime changes).
    Also pins the POINT of the split: with file-granular open cost,
    the scan schedules >1 task, which the single-file fixture never
    does."""
    import bench as benchmod

    src = str(tmp_path / "src")
    _write_events(src, "us", None)
    import pyarrow as pa
    import pyarrow.parquet as pq

    # widen to enough rows to split into multiple parts
    big = pa.table(
        {
            "event_id": pa.array(list(range(100)), pa.int64()),
            "ts": pa.array(
                [EPOCH_US[i % 3] for i in range(100)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 7 for i in range(100)], pa.int64()),
            "event_type": pa.array(["view"] * 100),
            "value": pa.array([float(i) for i in range(100)], pa.float64()),
            "props": pa.array(["{}"] * 100),
        }
    )
    pq.write_table(big, os.path.join(src, "events.parquet"))

    out = benchmod._split_fixture_dir(src, n_files=8, min_rows_per_part=10)
    assert out != src
    tdir = os.path.join(out, "events.parquet")
    parts = [f for f in os.listdir(tdir) if f.endswith(".parquet")]
    assert len(parts) == 8, parts

    df_src = load_table(spark, src, "events")
    old = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024 * 1024))
    try:
        df_split = load_table(spark, out, "events")
        assert df_split.rdd.getNumPartitions() > 1
        ts_field = [f for f in df_split.schema.fields if f.name == "ts"][0]
        assert ts_field.dataType.typeName() == "timestamp"
        a = sorted(tuple(r) for r in df_src.collect())
        b = sorted(tuple(r) for r in df_split.collect())
        assert a == b
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", old)

    # cache hit: same source stats → same directory, no rebuild
    assert (
        benchmod._split_fixture_dir(src, n_files=8, min_rows_per_part=10)
        == out
    )
