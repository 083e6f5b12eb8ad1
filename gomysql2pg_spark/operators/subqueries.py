"""Subquery & predicate patterns: HAVING, correlated scalar subqueries,
EXISTS, null-safe equality (SURVEY.md §2.B17 derived-table composition,
extended with the §2.C gaps a full SQL surface needs).

Spark has no correlated-subquery executor in the DataFrame API — the
idiomatic rewrite is decorrelation: compute the per-group scalar once,
then equi-join it back (exactly what Catalyst does to correlated SQL).
That rewrite is also the 100 TB-safe plan: one aggregate + one
broadcastable join instead of a per-row probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import cents, sql_cents, sql_whole, whole

QTY_THRESHOLD = 300


def q_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold (GROUP BY + HAVING), joined back to order/customer detail.
    The HAVING runs before the join — the filter shrinks the join input
    to the rare heavy keys."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum(whole("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > QTY_THRESHOLD)
    )
    return (
        heavy.join(orders, heavy.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            cents("o_totalprice").alias("price_cents"),
            "total_qty",
        )
    )


ORACLE_HAVING_LARGE_ORDERS = f"""
WITH heavy AS (
  SELECT l_orderkey, CAST(SUM({sql_whole('l_quantity')}) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM({sql_whole('l_quantity')}) > {QTY_THRESHOLD}
)
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS odate,
       {sql_cents('o_totalprice')} AS price_cents,
       total_qty
FROM heavy
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_scalar_subquery_above_brand_avg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated scalar subquery (parts priced above their brand's
    average), decorrelated: per-brand exact average computed once,
    broadcast-joined back. Exact arithmetic: avg = integer cent sum /
    count, one double division per brand."""
    part = load_table(spark, sf_dir, "part")
    pc = cents("p_retailprice")
    brand_avg = part.groupBy("p_brand").agg(
        (F.sum(pc).cast("double") / F.count("*")).alias("brand_avg_cents")
    )
    return (
        part.join(F.broadcast(brand_avg), "p_brand")
        .filter(pc.cast("double") > F.col("brand_avg_cents"))
        .select(
            "p_partkey",
            "p_brand",
            pc.alias("price_cents"),
            "brand_avg_cents",
        )
    )


ORACLE_SCALAR_SUBQUERY = f"""
SELECT p_partkey, p_brand,
       {sql_cents('p_retailprice')} AS price_cents,
       (SELECT CAST(SUM({sql_cents('p2.p_retailprice')}) AS DOUBLE) / COUNT(*)
        FROM part p2 WHERE p2.p_brand = p.p_brand) AS brand_avg_cents
FROM part p
WHERE CAST({sql_cents('p_retailprice')} AS DOUBLE) >
      (SELECT CAST(SUM({sql_cents('p2.p_retailprice')}) AS DOUBLE) / COUNT(*)
       FROM part p2 WHERE p2.p_brand = p.p_brand)
"""


def q_exists_pending_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS predicate: customers holding at least one pending ('P')
    order — left-semi join, the plan EXISTS decorrelates to."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(pending, "c_custkey", "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ORACLE_EXISTS_PENDING = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): join two
    derived sides where the key can be NULL ('P' status is mapped to
    NULL on both sides); NULL keys must MATCH each other — a plain
    equi-join drops them."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.when(
        F.col("o_orderstatus") == "P", F.lit(None).cast("string")
    ).otherwise(F.col("o_orderstatus"))
    a = orders.select(key.alias("k")).groupBy("k").agg(
        F.count("*").alias("n_a")
    )
    b = orders.select(key.alias("k")).groupBy("k").agg(
        F.count("*").alias("n_b")
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_a", "n_b"
    )


ORACLE_NULL_SAFE_JOIN = """
WITH keyed AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS k
  FROM orders
),
a AS (SELECT k, COUNT(*) AS n_a FROM keyed GROUP BY k),
b AS (SELECT k, COUNT(*) AS n_b FROM keyed GROUP BY k)
SELECT a.k AS k, n_a, n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-nation customer counts vs supplier counts —
    nations with only one side present survive with NULLs. Shuffles
    both (tiny) aggregates on the join key."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy(F.col("c_nationkey").alias("ck")).agg(
        F.count("*").alias("n_cust")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("sk")).agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, c.ck == s.sk, "full_outer").select(
        F.coalesce("ck", "sk").alias("nationkey"), "n_cust", "n_supp"
    )


ORACLE_FULL_OUTER_JOIN = """
WITH c AS (SELECT c_nationkey AS ck, COUNT(*) AS n_cust
           FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey AS sk, COUNT(*) AS n_supp
           FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(ck, sk) AS nationkey, n_cust, n_supp
FROM c FULL OUTER JOIN s ON ck = sk
"""


def q_cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two small dimensions (region × order
    priorities) — the domain-grid generator (every combination must
    appear even with zero matching facts). Both sides broadcastable;
    at scale a cross join is only ever sane when one side is tiny."""
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    prios = orders.select("o_orderpriority").distinct()
    return region.crossJoin(F.broadcast(prios)).select(
        "r_regionkey", "r_name", "o_orderpriority"
    )


ORACLE_CROSS_JOIN = """
SELECT r_regionkey, r_name, o_orderpriority
FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
"""


QUERIES = {
    "having_large_orders": q_having_large_orders,
    "full_outer_join": q_full_outer_join,
    "cross_join_small": q_cross_join_small,
    "scalar_subquery_above_brand_avg": q_scalar_subquery_above_brand_avg,
    "exists_pending_orders": q_exists_pending_orders,
    "null_safe_join": q_null_safe_join,
}

ORACLES = {
    "having_large_orders": ORACLE_HAVING_LARGE_ORDERS,
    "full_outer_join": ORACLE_FULL_OUTER_JOIN,
    "cross_join_small": ORACLE_CROSS_JOIN,
    "scalar_subquery_above_brand_avg": ORACLE_SCALAR_SUBQUERY,
    "exists_pending_orders": ORACLE_EXISTS_PENDING,
    "null_safe_join": ORACLE_NULL_SAFE_JOIN,
}
