"""END-TO-END migration against a real database target: the reference's
core flow (discover → transform → parallel load → compareDb validate,
`cmd/root.go:60-213`) run with embedded Derby standing in for
PostgreSQL. Everything real: the Migrator thread pool, the JDBC batched
writes, and the count validation read back over JDBC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.migrate import MigrationConfig, Migrator

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
TABLES = ["region", "nation", "customer", "supplier"]


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby_mig") / "migdb"
    return f"jdbc:derby:{db};create=true"


def _normalize(df):
    # Derby has no TIMESTAMP_NTZ; cast like the typemap layer does for
    # zone-less MySQL datetimes
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def test_full_migration_with_validation(spark, sf_dir, derby_url):
    cfg = MigrationConfig(max_parallel=4, exclude=["sup*"])

    def source_fn(table):
        return _normalize(load_table(spark, sf_dir, table))

    def sink_fn(df, table):
        (
            df.write.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", table.upper())
            .option("driver", DRIVER)
            .option("batchsize", "5000")
            .mode("overwrite")
            .save()
        )

    migrator = Migrator(spark, cfg, source_fn, sink_fn)
    report = migrator.run(TABLES)
    summary = report.summary()

    # exclusion honored (reference `exclude:` semantics)
    assert "supplier" not in summary["per_table"]
    assert summary["tables_failed"] == 0
    assert set(summary["per_table"]) == {"region", "nation", "customer"}

    # compareDb (A16): source count == target count per migrated table
    for table in ["region", "nation", "customer"]:
        src_n = load_table(spark, sf_dir, table).count()
        dst_n = (
            spark.read.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", table.upper())
            .option("driver", DRIVER)
            .load()
            .count()
        )
        assert src_n == dst_n, table
        assert summary["per_table"][table]["rows"] == src_n

    # content validation beyond the reference: value-level fidelity
    src = load_table(spark, sf_dir, "nation")
    dst = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "NATION")
        .option("driver", DRIVER)
        .load()
    )
    cols = sorted(src.columns)
    assert sorted(map(tuple, src.select(*cols).collect())) == sorted(
        map(tuple, dst.select(*cols).collect())
    )
