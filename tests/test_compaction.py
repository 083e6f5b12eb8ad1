"""Small-file compaction (sinks.maintenance): row fidelity, target
sizing, no-op detection."""

from __future__ import annotations

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.sinks.maintenance import (
    compact_parquet,
    parquet_files,
    plan_target_files,
)


def test_plan_target_files():
    assert plan_target_files(0, 100) == 1
    assert plan_target_files(99, 100) == 1
    assert plan_target_files(100, 100) == 1
    assert plan_target_files(101, 100) == 2
    assert plan_target_files(1000, 100) == 10


def test_compaction_preserves_rows(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "frag")
    src.repartition(32).write.parquet(path)
    assert len(parquet_files(path)) == 32

    report = compact_parquet(spark, path, target_bytes=10 * 1024 * 1024)
    assert report["compacted"]
    assert report["files_before"] == 32
    assert report["files_after"] < 32

    got = spark.read.parquet(path)
    cols = sorted(src.columns)
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, src.select(*cols).collect())
    )


def test_compaction_noop_when_already_compact(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "compact")
    src.coalesce(1).write.parquet(path)
    report = compact_parquet(spark, path, target_bytes=10 * 1024 * 1024)
    assert not report["compacted"]
    assert report["files_after"] == 1
