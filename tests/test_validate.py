"""Validation tests (reference A16 + content-hash upgrade): the
planted-fault fixtures from FIXTURES.md — a removed row is caught by the
count compare (reference parity), a mutated value at EQUAL row count is
caught only by the content hash (exceeds the reference)."""

from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.validate import (
    compare_report,
    compare_tables,
    content_hash,
)


def test_identical_tables_ok(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    r = compare_tables(nation, load_table(spark, sf_dir, "nation"), "nation")
    assert r.count_ok and r.content_ok


def test_removed_row_caught_by_count(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    broken = nation.filter(F.col("n_nationkey") != 7)
    r = compare_tables(nation, broken, "nation")
    assert not r.count_ok and not r.content_ok


def test_mutated_value_caught_only_by_hash(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    mutated = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 7, F.lit("XXXX")).otherwise(
            F.col("n_name")
        ),
    )
    r = compare_tables(nation, mutated, "nation")
    assert r.count_ok  # the reference's check passes → silent corruption
    assert not r.content_ok  # ours catches it


def test_content_hash_partitioning_invariant(spark, sf_dir):
    """The checksum must be identical under any partitioning (integer
    sum is commutative) — the property that makes it safe under AQE."""
    orders = load_table(spark, sf_dir, "orders")
    h1 = content_hash(orders)
    h2 = content_hash(orders.repartition(13))
    h3 = content_hash(orders.coalesce(1))
    assert h1 == h2 == h3


def test_compare_report_shape(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    results = [
        compare_tables(nation, nation, "nation"),
        compare_tables(region, region.limit(3), "region"),
    ]
    rep = compare_report(results)
    assert rep["failed"] == ["region"]
    assert not rep["ok"]
