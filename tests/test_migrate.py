"""Orchestration tests (reference A17-A22): the parquet→parquet pipeline
runs the same Migrator code path a JDBC migration would."""

import os

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.functions.transforms import lowercase_columns
from gomysql2pg_spark.migrate import MigrationConfig, Migrator


@pytest.fixture
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _mk_migrator(spark, sf_dir, out_dir, config=None, fail_on=None):
    def source_fn(table):
        if fail_on and table == fail_on:
            raise RuntimeError(f"boom reading {table}")
        return load_table(spark, sf_dir, table)

    def sink_fn(df, table):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, table))

    return Migrator(
        spark,
        config or MigrationConfig(max_parallel=4),
        source_fn,
        sink_fn,
        transform_fn=lowercase_columns,
    )


def test_migrate_tables_end_to_end(spark, sf_dir, out_dir):
    m = _mk_migrator(spark, sf_dir, out_dir)
    report = m.run(["region", "nation", "supplier"])
    s = report.summary()
    assert s["tables_failed"] == 0
    assert s["tables_total"] == 3
    # data actually landed and round-trips
    back = spark.read.parquet(os.path.join(out_dir, "nation"))
    assert back.count() == load_table(spark, sf_dir, "nation").count()


def test_exclusion_applied(spark, sf_dir, out_dir):
    cfg = MigrationConfig(max_parallel=2, exclude=["nat*"])
    m = _mk_migrator(spark, sf_dir, out_dir, cfg)
    report = m.run(["region", "nation"])
    assert [r.table for r in report.results] == ["region"]


def test_failure_accounting(spark, sf_dir, out_dir):
    m = _mk_migrator(spark, sf_dir, out_dir, fail_on="nation")
    report = m.run(["region", "nation"])
    assert report.failed == ["nation"]
    s = report.summary()
    assert s["tables_failed"] == 1
    assert "boom reading nation" in s["per_table"]["nation"]["error"]
    # the failure is isolated: region still migrated (root.go page txn)
    assert s["per_table"]["region"]["ok"]


def test_validate_phase(spark, sf_dir, out_dir):
    m = _mk_migrator(spark, sf_dir, out_dir)
    m.run(["region", "nation"])

    def dst_fn(table):
        return spark.read.parquet(os.path.join(out_dir, table))

    results = m.validate(["region", "nation"], dst_fn)
    assert all(r.content_ok for r in results)
