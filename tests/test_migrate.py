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


EXAMPLE_SHAPED_YML = """\
src:
  host: mysql.internal.example
  port: 3306
  database: srcdb
  username: appuser
  password: s3cret
dest:
  host: pg.internal.example
  port: 5432
  database: dstdb
  username: pguser
  password: s3cret2
  dbType: Gauss
pageSize: 50000
maxParallel: 8
charInLength: true
useNvarchar2: false
Distributed: true
tables:
  t1:
    - select * from t1 where id > 0
  t2:
    - select * from t2
exclude:
  - 'log1'
  - '*_tmp'
"""


def test_config_from_yaml(tmp_path):
    """example.yml:1-26 surface through viper-equivalent keys
    (cmd/app.go:21-34, cmd/root.go:526-560)."""
    p = tmp_path / "cfg.yml"
    p.write_text(EXAMPLE_SHAPED_YML)
    cfg = MigrationConfig.from_yaml(str(p))
    assert cfg.page_size == 50_000
    assert cfg.max_parallel == 8
    assert cfg.char_in_length and not cfg.use_nvarchar2
    assert cfg.distributed
    assert cfg.tables == {
        "t1": "select * from t1 where id > 0",
        "t2": "select * from t2",
    }
    assert cfg.exclude == ["log1", "*_tmp"]
    assert cfg.src.host == "mysql.internal.example"
    assert cfg.src.port == 3306
    assert cfg.dest.database == "dstdb"
    assert cfg.dest.dbtype == "gauss"  # normalized lowercase


def test_config_from_yaml_drives_migration(spark, sf_dir, out_dir, tmp_path):
    """A parsed config drives the same Migrator path (exclude +
    parallelism applied)."""
    p = tmp_path / "cfg.yml"
    p.write_text("maxParallel: 2\nexclude:\n  - 'nat*'\n")
    cfg = MigrationConfig.from_yaml(str(p))
    m = _mk_migrator(spark, sf_dir, out_dir, cfg)
    report = m.run(["region", "nation"])
    assert [r.table for r in report.results] == ["region"]


def test_error_row_side_channel(spark, sf_dir, out_dir, tmp_path):
    """invalidTableData side-output (cmd/root.go:450-470,
    cmd/app.go:83-103): plant a NUL-byte row, assert it lands in the
    errors dir while the sanitized main write proceeds."""
    from gomysql2pg_spark.functions.transforms import (
        apply_cell_transforms,
        invalid_rows,
    )

    errors_dir = str(tmp_path / "errlog")
    types = {"r_name": "varchar"}

    def source_fn(table):
        df = load_table(spark, sf_dir, table)
        # plant one offending row (NUL in a varchar) like the reference's
        # invalid-Unicode case
        bad = df.limit(1).withColumn(
            "r_name", F.concat(F.col("r_name"), F.lit("\x00tail"))
        )
        return df.union(bad)

    def sink_fn(df, table):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, table))

    cfg = MigrationConfig(max_parallel=2, errors_dir=errors_dir)
    m = Migrator(
        spark,
        cfg,
        source_fn,
        sink_fn,
        transform_fn=lambda df: apply_cell_transforms(df, types),
        error_rows_fn=lambda df: invalid_rows(df, types),
    )
    report = m.run(["region"])
    res = report.results[0]
    assert res.ok and res.error_rows == 1
    logged = spark.read.json(f"{errors_dir}/invalidTableData/region")
    assert logged.count() == 1
    assert "\x00" in logged.collect()[0]["r_name"]  # pre-sanitize value
    # main write is sanitized
    main = spark.read.parquet(os.path.join(out_dir, "region"))
    assert main.filter(F.col("r_name").contains("\x00")).count() == 0


def test_single_scan_row_count(spark, sf_dir, out_dir):
    """The reported count comes from an Observation on the sink's own
    action — sources are scanned once (reference scans each page once,
    root.go:389-420)."""
    reads = {"n": 0}

    def source_fn(table):
        reads["n"] += 1
        return load_table(spark, sf_dir, table)

    def sink_fn(df, table):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, table))

    m = Migrator(spark, MigrationConfig(max_parallel=1), source_fn, sink_fn)
    report = m.run(["nation"])
    assert report.results[0].rows == 25
    assert reads["n"] == 1  # source_fn called once; one job ran


def test_cancel_mid_run(spark, sf_dir, out_dir):
    """A19: cancel() mid-run aborts cleanly with failure accounting
    (cmd/app.go:186-216). Tables entered after the cancel flag are
    recorded as cancelled, not silently dropped."""
    import threading as th

    started = th.Event()

    def source_fn(table):
        started.set()
        return load_table(spark, sf_dir, table)

    def sink_fn(df, table):
        # slow sink: wait until cancel() has fired before writing
        df.write.mode("overwrite").parquet(os.path.join(out_dir, table))

    cfg = MigrationConfig(max_parallel=1)
    m = Migrator(spark, cfg, source_fn, sink_fn)

    def canceller():
        started.wait(30)
        m.cancel()

    t = th.Thread(target=canceller)
    t.start()
    report = m.run(["region", "nation", "supplier", "customer", "orders"])
    t.join()
    s = report.summary()
    # at least the tail of the queue was cancelled; nothing hangs
    assert any(r.error == "cancelled" for r in report.results)
    assert s["tables_total"] == 5


def test_dialect_map():
    """dbType → JDBC driver/url (cmd/app.go:59-81)."""
    from gomysql2pg_spark.sinks.jdbc import DIALECTS, sink_config_for

    for dbtype in ("postgres", "gauss", "vastbase", "kingbase"):
        cfg = sink_config_for(dbtype, "h", 5432, "db", "u", "p")
        driver, tpl = DIALECTS[dbtype]
        assert cfg.driver == driver
        assert cfg.url == tpl.format(host="h", port=5432, database="db")
    # reference default branch: anything else → postgres driver
    assert (
        sink_config_for("", "h", 1, "d").driver == "org.postgresql.Driver"
    )
    assert (
        sink_config_for("Gauss", "h", 1, "d").driver == "org.opengauss.Driver"
    )
