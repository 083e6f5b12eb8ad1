"""REAL JDBC round-trip against embedded Derby (ships with Spark):
exercises the actual partitioned-read and batched-write code paths the
reference implements against MySQL/PG (`cmd/root.go:389-516`) — not
just option construction. Embedded Derby lives in the same JVM, so
executor-side JDBC connections work in local mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.plans.pagination import numeric_range_predicates

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def orders_in_derby(spark, sf_dir, derby_url):
    src = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    (
        src.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "ORDERS")
        .option("driver", DRIVER)
        .option("batchsize", "5000")
        .mode("overwrite")
        .save()
    )
    return src


def _read(spark, derby_url, **opts):
    reader = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("driver", DRIVER)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_jdbc_write_read_row_fidelity(spark, derby_url, orders_in_derby):
    got = _read(spark, derby_url, dbtable="ORDERS")
    src = orders_in_derby
    assert got.count() == src.count()
    cols = sorted(src.columns)
    assert sorted(c.lower() for c in got.columns) == cols
    g = sorted(map(tuple, got.select(*cols).collect()))
    s = sorted(map(tuple, src.select(*cols).collect()))
    assert g == s


def test_jdbc_partitioned_read_predicates(spark, sf_dir, derby_url, orders_in_derby):
    """The reference's paged parallel scan (A3), for real: one JDBC
    query per page predicate, pages disjoint+complete."""
    src = orders_in_derby
    lo, hi = src.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    # Spark's JDBC writer quotes (case-sensitive) column names — the
    # predicate must quote them too or Derby folds to uppercase
    preds = numeric_range_predicates('"o_orderkey"', int(lo), int(hi), 8)
    assert len(preds) == 8

    df = spark.read.jdbc(
        url=derby_url,
        table="ORDERS",
        predicates=preds,
        properties={"driver": DRIVER},
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == src.count()
    assert df.select("o_orderkey").distinct().count() == src.count()


def test_engine_read_path_with_page_plan(spark, derby_url, orders_in_derby):
    """Our sources.jdbc.read() + plans.pagination.plan_pages pipeline
    (the reference's prepareSqlStr → runMigration flow) against the
    real database: one JDBC partition per generated page predicate."""
    from gomysql2pg_spark.plans.pagination import plan_pages
    from gomysql2pg_spark.sources.jdbc import JdbcSourceConfig, read

    src = orders_in_derby
    lo, hi = src.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    total = src.count()
    plan = plan_pages(
        "ORDERS",
        total_rows=total,
        page_size=max(1, total // 6),
        pk_cols=['"o_orderkey"'],
        pk_numeric=True,
        pk_min=int(lo),
        pk_max=int(hi),
    )
    assert plan.strategy == "range" and plan.page_count >= 6
    cfg = JdbcSourceConfig(url=derby_url, driver=DRIVER, max_parallel=8)
    df = read(spark, cfg, table="ORDERS", plan=plan)
    assert df.rdd.getNumPartitions() == len(plan.predicates)
    assert df.count() == total
    assert df.select("o_orderkey").distinct().count() == total


def test_jdbc_schema_probe_via_query(spark, derby_url, orders_in_derby):
    """A4: arbitrary-SQL source — Spark resolves the schema via the
    same zero-row probe the reference builds by hand (`root.go:306`)."""
    df = _read(
        spark,
        derby_url,
        query='SELECT "o_orderkey", "o_totalprice" FROM ORDERS'
        ' WHERE "o_totalprice" > 100000',
    )
    assert [c.lower() for c in df.columns] == ["o_orderkey", "o_totalprice"]
    assert df.count() > 0


def test_jdbc_read_lowercases_mixedcase_columns(spark, derby_url):
    """Scan-time column lowercasing (reference `cmd/root.go:327-329`):
    a MixedCase source table must arrive with lowercase names through
    BOTH sources.jdbc.read paths (plain reader and page-predicate
    reader), matching catalog.load_table's convention so the write side
    produces the same target schema the reference does."""
    from gomysql2pg_spark.plans.pagination import plan_pages
    from gomysql2pg_spark.sources.jdbc import JdbcSourceConfig, read

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["OrderKey", "CustName"]
    )
    (
        df.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "MIXEDCASE")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    cfg = JdbcSourceConfig(url=derby_url, driver=DRIVER)
    got = read(spark, cfg, table="MIXEDCASE")
    assert got.columns == ["orderkey", "custname"]
    assert got.count() == 3

    plan = plan_pages(
        "MIXEDCASE",
        total_rows=3,
        page_size=2,
        pk_cols=['"OrderKey"'],
        pk_numeric=True,
        pk_min=1,
        pk_max=3,
    )
    got2 = read(spark, cfg, table="MIXEDCASE", plan=plan)
    assert got2.columns == ["orderkey", "custname"]
    assert got2.count() == 3


def test_jdbc_truncate_overwrite_keeps_table(spark, derby_url, orders_in_derby):
    """A5: truncate-before-load — second overwrite with truncate=true
    must replace the rows, not duplicate them."""
    src = orders_in_derby
    (
        src.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "ORDERS")
        .option("driver", DRIVER)
        .option("truncate", "true")
        .mode("overwrite")
        .save()
    )
    got = _read(spark, derby_url, dbtable="ORDERS")
    assert got.count() == src.count()
