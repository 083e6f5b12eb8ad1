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


def test_streaming_ingest_into_database(spark, sf_dir, derby_url, tmp_path):
    """Continuous load: a file stream drained micro-batch-by-micro-batch
    into the JDBC target through foreachBatch, with checkpoint-resume —
    the streaming twin of the batch migration. Restarting with the same
    checkpoint after new files arrive appends ONLY the new rows
    (exactly-once across restarts)."""
    ev = _normalize(
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
    )
    us = F.unix_micros("ts")
    stats = ev.select(F.min(us).alias("lo"), F.max(us).alias("hi")).first()
    cut = stats["lo"] + (stats["hi"] - stats["lo"]) // 2

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "stream_ckpt")
    ev.filter(us < cut).coalesce(1).write.parquet(src)

    def write_batch(batch_df, batch_id):
        (
            batch_df.write.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", "EVENTS_STREAMED")
            .option("driver", DRIVER)
            .option("batchsize", "5000")
            .mode("append")
            .save()
        )

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # bootstrap the target table, then stream into it
    spark.createDataFrame([], ev.schema).write.format("jdbc").option(
        "url", derby_url
    ).option("dbtable", "EVENTS_STREAMED").option("driver", DRIVER).mode(
        "overwrite"
    ).save()

    run_once()
    got1 = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "EVENTS_STREAMED")
        .option("driver", DRIVER)
        .load()
    )
    assert got1.count() == ev.filter(us < cut).count()

    ev.filter(us >= cut).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "EVENTS_STREAMED")
        .option("driver", DRIVER)
        .load()
    )
    assert got2.count() == ev.count()
    assert got2.select("event_id").distinct().count() == ev.count()


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
