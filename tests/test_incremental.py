"""Incremental-pipeline patterns over partitioned parquet: dynamic
partition overwrite (the daily-batch reprocess primitive) and schema
evolution via mergeSchema — both core to operating a 100 TB lake where
full rewrites are impossible."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table


def test_dynamic_partition_overwrite_touches_only_matching(
    spark, sf_dir, tmp_path
):
    """Reprocessing one event_type partition must leave every other
    partition byte-for-byte untouched (static overwrite would drop
    them)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "by_type")
    ev.write.partitionBy("event_type").parquet(path)
    before = {
        p: sorted(glob.glob(f"{path}/event_type={p}/*.parquet"))
        for p in ["click", "view", "purchase", "signup", "error"]
    }

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patched = (
            ev.filter(F.col("event_type") == "click")
            .withColumn("value", F.col("value") * 2)
        )
        patched.write.partitionBy("event_type").mode("overwrite").parquet(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    after = spark.read.parquet(path)
    # untouched partitions identical files
    for p in ["view", "purchase", "signup", "error"]:
        assert (
            sorted(glob.glob(f"{path}/event_type={p}/*.parquet"))
            == before[p]
        ), p
    # patched partition has the new values, same row count
    clicks = after.filter(F.col("event_type") == "click")
    orig_clicks = ev.filter(F.col("event_type") == "click")
    assert clicks.count() == orig_clicks.count()
    got_sum = clicks.agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
    ).first()[0]
    exp_sum = orig_clicks.agg(
        F.sum(F.round(F.col("value") * 2 * 100).cast("long"))
    ).first()[0]
    assert got_sum == exp_sum
    assert after.count() == ev.count()


def test_merge_schema_reads_evolved_layout(spark, sf_dir, tmp_path):
    """A column added by a later batch must be readable across the
    whole dataset (NULL for old files) with mergeSchema."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "evolving")
    half = ev.filter(F.col("event_id") % 2 == 0)
    half.write.parquet(path)
    evolved = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "quality", F.lit(1).cast("int")
    )
    evolved.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "quality" in merged.columns
    assert merged.count() == ev.count()
    assert (
        merged.filter(F.col("quality").isNull()).count() == half.count()
    )
