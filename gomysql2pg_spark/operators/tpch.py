"""Additional TPC-H-shaped benchmark queries (Q4, Q6, Q10) — the join/
semi-join/filter-agg shapes the fixture schema supports beyond the Q1/
Q3/Q5 analogs in operators.relational. All money math is exact bigint
cents (functions.numeric)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import cents, sql_cents

Q4_LO, Q4_HI = "1996-07-01", "1996-10-01"


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter having at least one lineitem
    shipped after the order date (EXISTS → left-semi), counted per
    priority. The semi-join probes only the quarter's orders."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_HI).cast("timestamp"))
    )
    late_lines = li.select("l_orderkey", "l_shipdate")
    matched = window_orders.join(
        late_lines,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


ORACLE_Q4 = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_HI} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + scalar aggregate — the predicate-
    pushdown showcase (every filter reaches the parquet scan; the
    'shuffle' is one partial-agg row per task)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = cents("l_discount")
    qty = F.col("l_quantity")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (disc >= 5)
        & (disc <= 7)
        & (qty < 24)
    )
    return filtered.agg(
        F.sum(cents("l_extendedprice") * disc).alias("revenue_c4"),
        F.count("*").alias("n_lines"),
    )


ORACLE_Q6 = f"""
SELECT CAST(SUM({sql_cents('l_extendedprice')} * {sql_cents('l_discount')})
         AS BIGINT) AS revenue_c4,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND {sql_cents('l_discount')} BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns in
    a quarter — fact⋈orders shuffles once on orderkey; customer/nation
    broadcast; top-20 via orderBy+limit (TakeOrdered, no global sort)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
         AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_c4 DESC, c_custkey
LIMIT 20
"""


def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity over customer names within a nation —
    the fuzzy-matching primitive (entity resolution / near-dup on short
    strings). Join is bounded per nation partition; levenshtein is
    JVM-side."""
    customer = load_table(spark, sf_dir, "customer")
    a = customer.select(
        F.col("c_custkey").alias("ka"),
        F.col("c_name").alias("na"),
        F.col("c_nationkey").alias("nk"),
    ).filter(F.col("ka") % 50 == 0)
    b = customer.select(
        F.col("c_custkey").alias("kb"),
        F.col("c_name").alias("nb"),
        F.col("c_nationkey").alias("nk"),
    )
    pairs = a.join(b, (a.nk == b.nk) & (F.col("ka") < F.col("kb")))
    return pairs.select(
        "ka",
        "kb",
        F.levenshtein("na", "nb").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= 3)


ORACLE_STRING_DISTANCE = """
SELECT a.c_custkey AS ka, b.c_custkey AS kb,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE a.c_custkey % 50 = 0
  AND levenshtein(a.c_name, b.c_name) <= 3
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "string_distance": q_string_distance,
}

ORACLES = {
    "q4_order_priority": ORACLE_Q4,
    "q6_forecast_revenue": ORACLE_Q6,
    "q10_returned_items": ORACLE_Q10,
    "string_distance": ORACLE_STRING_DISTANCE,
}
