"""Pagination-plan tests (reference A3, `cmd/root.go:335-386`):
page predicates must be pairwise DISJOINT and jointly COMPLETE; the
scalable global row-number must match the naive single-partition
window."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.plans.pagination import (
    PagePlan,
    apply_pages,
    fetch_page,
    global_row_number,
    hashmod_predicates,
    numeric_range_predicates,
    page_count,
    plan_pages,
)


def test_page_count():
    assert page_count(0, 100) == 1
    assert page_count(100, 100) == 1
    assert page_count(101, 100) == 2
    assert page_count(1_000_000, 100_000) == 10


def _check_disjoint_complete(df, plan):
    total = df.count()
    pages = apply_pages(df, plan)
    counts = [p.count() for p in pages]
    assert sum(counts) == total, (counts, total)  # complete + disjoint


def test_numeric_range_pages(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lo, hi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    plan = plan_pages(
        "orders",
        orders.count(),
        page_size=500,
        pk_cols=["o_orderkey"],
        pk_numeric=True,
        pk_min=lo,
        pk_max=hi,
    )
    assert plan.strategy == "range"
    assert plan.page_count > 1
    _check_disjoint_complete(orders, plan)


def test_numeric_range_completeness_outside_bounds():
    # first/last page unbounded: rows outside sampled min/max captured
    preds = numeric_range_predicates("pk", 10, 99, 4)
    assert preds[0].startswith("pk <")
    assert preds[-1].startswith("pk >=")
    assert len(preds) == 4


def test_hashmod_pages_composite(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = plan_pages(
        "lineitem",
        li.count(),
        page_size=1000,
        pk_cols=["l_orderkey", "l_linenumber"],
        pk_numeric=False,
    )
    assert plan.strategy == "hashmod"
    _check_disjoint_complete(li, plan)


def test_no_pk_single_page(spark, sf_dir):
    plan = plan_pages("region", 5, 100, pk_cols=[], pk_numeric=False)
    assert plan.strategy == "full"
    assert plan.predicates == ["1=1"]
    region = load_table(spark, sf_dir, "region")
    _check_disjoint_complete(region, plan)


def test_global_row_number_matches_naive(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    scalable = global_row_number(orders, ["o_orderkey"])
    naive = orders.withColumn(
        "rn", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    diff = (
        scalable.select("o_orderkey", "rn")
        .subtract(naive.select("o_orderkey", "rn"))
        .count()
    )
    assert diff == 0
    # and no single-partition exchange in the scalable plan
    plan_str = scalable._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan_str.split("AdaptiveSparkPlan")[0]


def test_fetch_page_equals_offset_semantics(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    page = fetch_page(orders, ["o_orderkey"], page_no=2, page_size=100)
    keys = sorted(r["o_orderkey"] for r in page.collect())
    expected = sorted(r["o_orderkey"] for r in orders.collect())[200:300]
    assert keys == expected


def test_hashmod_null_key_routed_to_page_zero(spark):
    """A NULL key column NULLs the whole hash expression, which
    satisfies no residue predicate — the r9 IS-NULL arm must route
    those rows to page 0 instead of silently dropping them."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (None, None), (5, "e")],
        "k1 int, k2 string",
    )
    preds = hashmod_predicates(["k1", "k2"], 3)
    assert "IS NULL" in preds[0]
    pages = [df.filter(F.expr(p)) for p in preds]
    assert sum(p.count() for p in pages) == df.count()


def test_hashmod_bucket_sql_dialect_template():
    """Engines without a `%` operator (Derby, Oracle) supply the
    residue template; the IS-NULL completeness arm must survive the
    substitution."""
    preds = hashmod_predicates(
        ["a", "b"], 2, hash_sql="ABS(a*31+b)", bucket_sql="MOD({h}, {n}) = {i}"
    )
    assert preds == [
        "(MOD(ABS(a*31+b), 2) = 0) OR (ABS(a*31+b)) IS NULL",
        "MOD(ABS(a*31+b), 2) = 1",
    ]


def test_hashmod_negative_hash_still_complete(spark):
    """The sign-normalized residue (r13 review finding): a
    dialect-supplied hash_sql WITHOUT abs() can go negative, and SQL's
    `%` follows the dividend's sign — the raw residue matched no
    bucket, silently losing every negative-hash row. The wrapped
    template must cover every row exactly once."""
    from gomysql2pg_spark.plans.pagination import hashmod_predicates

    df = spark.createDataFrame(
        [(i,) for i in range(-50, 50)], "a bigint"
    )
    df.createOrReplaceTempView("_neg_hash_t")
    preds = hashmod_predicates(
        ["a"], 4, hash_sql="CAST(a AS BIGINT) * 31"
    )
    total = 0
    for p in preds:
        total += spark.sql(
            f"SELECT count(*) AS n FROM _neg_hash_t WHERE {p}"
        ).first()["n"]
    assert total == 100  # disjoint + complete, negatives included
