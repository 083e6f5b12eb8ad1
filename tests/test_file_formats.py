"""Round-trip tests for the file-format source/sink layer
(gomysql2pg_spark.sources.files): parquet fixture → format → read back
must be value-identical for every supported format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.sources import files as FF


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_round_trip_orders(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "orders")
    reader, writer = FF.FORMATS[fmt]
    path = str(tmp_path / f"orders_{fmt}")
    writer(src, path)
    got = (
        reader(spark, path, schema=src.schema)
        if fmt in ("csv", "json")
        else reader(spark, path)
    )
    assert got.schema == src.schema
    assert _sorted_rows(got) == _sorted_rows(src)


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_round_trip_preserves_timestamps(spark, sf_dir, tmp_path, fmt):
    """events.ts is microsecond-precision; the text formats must not
    truncate or shift it (UTC session zone + explicit format)."""
    src = load_table(spark, sf_dir, "events").select("event_id", "ts")
    reader, writer = FF.FORMATS[fmt]
    path = str(tmp_path / f"events_{fmt}")
    writer(src, path)
    got = reader(spark, path, schema=src.schema)
    join = src.alias("a").join(got.alias("b"), "event_id")
    mismatches = join.filter(F.col("a.ts") != F.col("b.ts")).count()
    assert mismatches == 0
    assert got.count() == src.count()


def test_csv_null_vs_empty_string(spark, tmp_path):
    """NULL and '' survive a CSV round trip as distinct values."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id int, s string"
    )
    path = str(tmp_path / "nulls_csv")
    FF.write_csv(df, path)
    got = FF.read_csv(spark, path, schema=df.schema)
    rows = {r["id"]: r["s"] for r in got.collect()}
    assert rows == {1: None, 2: "", 3: "x"}


def test_csv_special_characters(spark, tmp_path):
    """Quotes, delimiters, newlines and unicode survive quoting."""
    vals = ['a,b', 'he said "hi"', 'line1\nline2', 'ünïcødé', ' lead/trail ']
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, s string"
    )
    path = str(tmp_path / "special_csv")
    FF.write_csv(df, path)
    got = FF.read_csv(spark, path, schema=df.schema)
    rows = {r["id"]: r["s"] for r in got.collect()}
    assert rows == {i: v for i, v in enumerate(vals)}


def test_uncompressed_csv_splits(spark, sf_dir, tmp_path):
    """The writers emit splittable (uncompressed) CSV parts and honor
    upstream repartitioning — the knob that controls scan parallelism."""
    import glob

    src = load_table(spark, sf_dir, "orders").repartition(4)
    path = str(tmp_path / "orders_split")
    FF.write_csv(src, path)
    parts = glob.glob(path + "/part-*")
    assert len(parts) == 4
    assert not any(p.endswith(".gz") for p in parts)
