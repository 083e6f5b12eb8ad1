"""Bucketed co-located joins: pre-shuffling ON WRITE so repeated joins
on the bucket key run with ZERO exchanges (SURVEY.md §4 'bucketing for
co-located joins'; the reference's DISTRIBUTE BY hash(pk) analog,
`cmd/tablemeta.go:233-241`).

At 100 TB this is the difference between shuffling the fact table once
per query and never: `orders ⋈ lineitem` on orderkey is the hottest
join in the schema; bucketing both sides by the key makes every such
join (and groupBy on the key) exchange-free."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table

N_BUCKETS = 8


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # one writer task per bucket ⇒ one file per bucket ⇒ the read side
    # can trust per-bucket sortedness and skip the merge sort entirely
    (
        li.repartition(N_BUCKETS, "l_orderkey")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "b_lineitem"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    (
        orders.repartition(N_BUCKETS, "o_orderkey")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    yield spark.table("b_lineitem"), spark.table("b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """With broadcast disabled (forcing the at-scale join strategy),
    bucketed+sorted sides must sort-merge-join with NO shuffle and NO
    sort — co-location did the work at write time."""
    bli, bord = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bli.join(bord, bli.l_orderkey == bord.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = _plan(joined)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "SortMergeJoin" in plan, plan
    # the only exchange allowed is the final groupBy on priority —
    # nothing below the join may shuffle. (An in-partition Sort remains:
    # sort-order propagation from sorted buckets sits behind
    # spark.sql.legacy.bucketedTableScan.outputOrdering since 3.0; the
    # shuffle is the property that matters at scale.)
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, plan


def test_unbucketed_join_needs_exchanges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = _plan(joined)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert plan.count("Exchange") >= 2, plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    bli, bord = bucketed_tables
    got = (
        bli.join(bord, bli.l_orderkey == bord.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    expected = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_bucketed_groupby_on_key_has_no_exchange(spark, bucketed_tables):
    bli, _ = bucketed_tables
    agg = bli.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
