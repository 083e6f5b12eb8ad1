"""Additional TPC-H-shaped benchmark queries (Q4, Q6, Q10) — the join/
semi-join/filter-agg shapes the fixture schema supports beyond the Q1/
Q3/Q5 analogs in operators.relational. All money math is exact bigint
cents (functions.numeric)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import cents, sql_cents, sql_whole, whole

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


# ---------------------------------------------------------------------------
# Q7 volume shipping: revenue between two nations by ship year.
# ---------------------------------------------------------------------------

Q7_N1, Q7_N2 = "NATION_1", "NATION_2"  # fixture nation names


Q7_LO, Q7_HI = "1995-01-01", "1997-01-01"  # spec's two-year ship window


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape. Two scale moves beyond the naive join tree:

    1. The ship-date range reaches the lineitem SCAN as a pushed
       parquet filter (min/max row-group pruning), per the spec's
       two-year window — not a post-join residual.
    2. The nation-pair predicate is PUSHED THROUGH the fact join:
       supplier and customer are pre-joined to the 2-row filtered
       nation dim, so lineitem and orders are each cut to the ~2/25
       of rows touching those nations BEFORE the l⋈o join — the big
       join's input is ~8% per side instead of 100%. Only the
       direction disjunction ((F→G)|(G→F)) remains post-join, on the
       already-reduced rows.

    supplier_f is broadcast (supplier ≈ 1% of lineitem, filtered to
    2/25 of that); customer_f carries no hint — small enough here for
    auto-broadcast, and at cluster scale AQE/stats make the shuffle
    -vs-broadcast call on the filtered size."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    nat2 = nation.filter(F.col("n_name").isin(Q7_N1, Q7_N2))
    supplier_f = supplier.join(
        F.broadcast(
            nat2.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    customer_f = customer.join(
        F.broadcast(
            nat2.select(
                F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    li_f = li.filter(
        (F.col("l_shipdate") >= F.lit(Q7_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_HI).cast("timestamp"))
    ).join(F.broadcast(supplier_f), F.col("l_suppkey") == F.col("s_suppkey"))
    orders_f = orders.join(
        customer_f, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li_f.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (
                (F.col("supp_nation") == Q7_N1)
                & (F.col("cust_nation") == Q7_N2)
            )
            | (
                (F.col("supp_nation") == Q7_N2)
                & (F.col("cust_nation") == Q7_N1)
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(revenue).cast("long").alias("revenue_c4"))
    )


ORACLE_Q7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
         AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = '{Q7_N1}' AND cn.n_name = '{Q7_N2}')
   OR (sn.n_name = '{Q7_N2}' AND cn.n_name = '{Q7_N1}'))
  AND l_shipdate >= TIMESTAMP '{Q7_LO} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q7_HI} 00:00:00'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 market share: conditional share of one nation's revenue per year.
# ---------------------------------------------------------------------------

Q8_NATION = "BRAZIL"
Q8_REGION = "AMERICA"
Q8_TYPE = "STANDARD"


Q8_LO, Q8_HI = "1995-01-01", "1997-01-01"  # spec's two-year order window


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share = conditional-sum / sum per year —
    the one-pass CASE-aggregation idiom (no self-join). Share is a
    single double division of two exact bigints (deterministic).

    Scale moves: the p_type filter cuts lineitem via the broadcast
    part join BEFORE the l⋈o join; the order-date window is pushed to
    the orders parquet scan; and the region predicate is pushed
    THROUGH the fact join by pre-joining customer to the AMERICA
    nation list (broadcast 2-level dim: region⋈nation collapses to a
    ≤25-row in-list) — orders is cut to ~1/5 before the big join
    rather than after it."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # region⋈nation folds to the tiny set of AMERICA nation keys
    cn_in_region = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q8_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    customer_f = customer.join(
        F.broadcast(cn_in_region), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    orders_f = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(Q8_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q8_HI).cast("timestamp"))
        )
        .join(customer_f, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    joined = (
        li.join(F.broadcast(part.filter(F.col("p_type").contains(Q8_TYPE))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == Q8_NATION, revenue).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("nation_c4"),
            F.sum(revenue).cast("long").alias("total_c4"),
        )
        .withColumn(
            "mkt_share",
            F.col("nation_c4").cast("double")
            / F.col("total_c4").cast("double"),
        )
    )


ORACLE_Q8 = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         {sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})
           AS rev,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  WHERE r_name = '{Q8_REGION}' AND p_type LIKE '%{Q8_TYPE}%'
    AND o_orderdate >= TIMESTAMP '{Q8_LO} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q8_HI} 00:00:00'
)
SELECT CAST(o_year AS INT) AS o_year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev ELSE 0 END)
         AS BIGINT) AS nation_c4,
       CAST(SUM(rev) AS BIGINT) AS total_c4,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev ELSE 0 END)
         AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM j GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q13 customer distribution: orders-per-customer histogram.
# ---------------------------------------------------------------------------


def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT outer join so zero-order customers keep a
    0 count, then a histogram over the counts — two aggregations, the
    second tiny (distinct count values). The outer join preserves the
    customer side; count(o_orderkey) skips nulls exactly like SQL."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14 promo revenue share.
# ---------------------------------------------------------------------------

Q14_LO, Q14_HI = "1996-03-01", "1996-04-01"


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of a month's revenue from PROMO parts —
    broadcast part join + one CASE aggregation; the month filter prunes
    at the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    month = li.filter(
        (F.col("l_shipdate") >= F.lit(Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_HI).cast("timestamp"))
    )
    return (
        month.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(
                    F.col("p_type").startswith("PROMO"), revenue
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("promo_c4"),
            F.sum(revenue).cast("long").alias("total_c4"),
        )
        .withColumn(
            "promo_share",
            F.col("promo_c4").cast("double")
            / F.col("total_c4").cast("double"),
        )
    )


ORACLE_Q14 = f"""
SELECT
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
    THEN {sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})
    ELSE 0 END) AS BIGINT) AS promo_c4,
  CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
    AS BIGINT) AS total_c4,
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
    THEN {sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})
    ELSE 0 END) AS DOUBLE)
    / CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
      AS DOUBLE) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_LO} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q14_HI} 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q15 top supplier(s) by quarterly revenue.
# ---------------------------------------------------------------------------

Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier quarterly revenue, keep the
    max-revenue supplier(s). The reference formulation is a view +
    scalar-subquery max; mirrored here as max-aggregate + equality
    join against the supplier-cardinality aggregated frame. No global
    window: a rank() over an empty partition spec would funnel the
    whole frame through ONE partition — fine at 10k suppliers, a
    straggler at 10M. The two consumers of `rev` share the same
    shuffle (ReusedExchange dedupes the aggregation), and the 1-row
    max side is broadcast, so the plan has no single-partition
    Exchange at any cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q15_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_HI).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).cast("long").alias("total_rev_c4"))
    )
    # cache the supplier-cardinality frame: the max side and the join
    # probe both read it, and Catalyst does not reuse the aggregation
    # exchange across the broadcast boundary — without the cache the
    # lineitem scan + shuffle would run twice. The only remaining
    # SinglePartition exchange is the scalar-max gather over per-
    # partition partials (≤ one row each), inherent to any global max.
    # localCheckpoint, not persist(): same reuse (the max side and the
    # join probe read the materialized frame once), but the storage is
    # released by the ContextCleaner when the frame is GC'd — persist()
    # pinned supplier-cardinality cache in the shared session forever,
    # one copy per q15 evaluation (r13 review finding)
    rev = rev.localCheckpoint(eager=False)
    mx = rev.agg(F.max("total_rev_c4").alias("max_rev_c4"))
    top = rev.join(
        F.broadcast(mx), F.col("total_rev_c4") == F.col("max_rev_c4")
    ).drop("max_rev_c4")
    return top.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "total_rev_c4")


ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
           AS BIGINT) AS total_rev_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_HI} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_c4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_c4 = (SELECT MAX(total_rev_c4) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q17 small-quantity-order revenue (correlated per-part average).
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#23"


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity. The correlated scalar subquery decorrelates to a
    per-part aggregate joined back (broadcast — part-cardinality).
    Threshold compare stays integer: 10*qty < 2*avg_num/cnt →
    10*qty*cnt < 2*sum (exact, no float divide)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == Q17_BRAND).select(
        "p_partkey"
    )
    brand_lines = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    # ONE pass: per-part sufficient statistics as a window over the
    # same shuffle the filter consumes — the groupBy+broadcast-back
    # form scanned lineitem (and re-ran the brand join) TWICE because
    # Catalyst cannot reuse the aggregation exchange across the
    # broadcast boundary (r13 review finding; q15's comment documents
    # the same plan fact)
    from pyspark.sql.window import Window as _W

    w_part = _W.partitionBy("l_partkey")
    small = (
        brand_lines.withColumn(
            "qty_sum", F.sum(whole("l_quantity")).over(w_part).cast("long")
        )
        .withColumn("qty_cnt", F.count("*").over(w_part))
        .filter(
            whole("l_quantity") * F.lit(10) * F.col("qty_cnt")
            < F.lit(2) * F.col("qty_sum")
        )
    )
    return small.agg(
        F.sum(cents("l_extendedprice")).cast("long").alias("price_cents"),
        F.count("*").alias("n_small"),
    )


ORACLE_Q17 = f"""
WITH brand_lines AS (
  SELECT l_partkey, {sql_whole('l_quantity')} AS q,
         {sql_cents('l_extendedprice')} AS pc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
per_part AS (
  SELECT l_partkey AS ap_key, CAST(SUM(q) AS BIGINT) AS qty_sum,
         COUNT(*) AS qty_cnt
  FROM brand_lines GROUP BY l_partkey
)
SELECT CAST(SUM(pc) AS BIGINT) AS price_cents, COUNT(*) AS n_small
FROM brand_lines JOIN per_part ON l_partkey = ap_key
WHERE q * 10 * qty_cnt < 2 * qty_sum
"""


# ---------------------------------------------------------------------------
# Q18 large-volume customers.
# ---------------------------------------------------------------------------

# synthetic-fixture calibration: per-order quantity sums run hotter
# than stock TPC-H (composite lineitem keys fan out), 99th pct ≈ 262
# at sf0.01 — 250 keeps ~1% of orders, matching Q18's intent
Q18_QTY = 250


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (`large volume customer`): orders whose total
    lineitem quantity exceeds a threshold, top-100 by order value.

    The HAVING subquery decorrelates to one lineitem aggregation
    (partial-agg'd single shuffle on l_orderkey); the qualifying-order
    set is tiny (~1%), so it broadcasts into both the orders probe and
    the final per-order quantity join. customer is a broadcast dim.
    The top-100 sort runs on the already-filtered qualifying orders
    (thousands of rows, not the orders table) with a deterministic
    o_orderkey tie-break so the LIMIT cut is engine-stable. Quantity
    sums use the integer `whole()` path — no float aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(whole("l_quantity")).cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY)
    )
    return (
        orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(
            F.broadcast(customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(),
            "o_orderdate",
            "o_orderkey",
        )
        .limit(100)
    )


ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM({sql_whole('l_quantity')}) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM({sql_whole('l_quantity')}) > {Q18_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 disjunctive predicate revenue.
# ---------------------------------------------------------------------------


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of three conjunctive brand/size/quantity
    bands — the disjunction is a single post-join filter (Catalyst
    extracts the common l_partkey=p_partkey equi-key; part broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = whole("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 5))
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 10))
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 15))
            & q.between(20, 30)
        )
    )
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(revenue).cast("long").alias("revenue_c4"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q19 = f"""
SELECT
  CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
    AS BIGINT) AS revenue_c4,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND {sql_whole('l_quantity')} BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND {sql_whole('l_quantity')} BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND {sql_whole('l_quantity')} BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q22 dormant high-balance customers (anti-join + scalar threshold).
# ---------------------------------------------------------------------------


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no URGENT orders (every fixture customer has SOME order, so the
    anti-join side is the urgent subset) — scalar-subquery threshold
    (computed once, a tiny broadcast) + left-anti join, grouped by
    nation. The average is exact: threshold compare cross-multiplies
    instead of dividing (bal*cnt > sum)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = cents("c_acctbal")
    pos = customer.filter(bal > 0)
    avg_row = pos.agg(
        F.sum(bal).cast("long").alias("bal_sum"),
        F.count("*").alias("bal_cnt"),
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_row))
        .filter(bal * F.col("bal_cnt") > F.col("bal_sum"))
    )
    dormant = rich.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.sum(bal).cast("long").alias("totacctbal_cents"),
    )


ORACLE_Q22 = f"""
WITH thresh AS (
  SELECT CAST(SUM({sql_cents('c_acctbal')}) AS BIGINT) AS bal_sum,
         COUNT(*) AS bal_cnt
  FROM customer WHERE {sql_cents('c_acctbal')} > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM({sql_cents('c_acctbal')}) AS BIGINT) AS totacctbal_cents
FROM customer, thresh
WHERE {sql_cents('c_acctbal')} * bal_cnt > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q9 / Q21 shapes (round 15 — the two structurally new shapes the
# suite still lacked: the widest join fan, and the same-order
# different-supplier EXISTS / NOT-EXISTS pair)
# ---------------------------------------------------------------------------

Q9_NAME_FRAG = "red"  # 257 of 2k parts at sf0.01 — real selectivity


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): the
    widest join fan in the suite — lineitem ⋈ part ⋈ supplier ⋈
    nation ⋈ orders — with a LIKE-filtered part dimension and a
    (nation, year) rollup. The fixture schema has no partsupp table,
    so unit cost substitutes `p_retailprice` for `ps_supplycost`
    (documented; the join/agg shape is unchanged): profit_c4 =
    extprice·(100−disc) − retailprice·qty·100, all in exact bigint
    c4 units (functions.numeric — order-independent, AQE-immune).
    Plan: part is LIKE-pruned BEFORE the fact join (predicate reaches
    the scan) and, with supplier and nation, broadcast; lineitem is
    scanned once; the only corpus-sized exchange is the final
    (nation, year) partial aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{Q9_NAME_FRAG}%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount_c4 = cents("l_extendedprice") * (
        F.lit(100) - cents("l_discount")
    ) - cents("p_retailprice") * whole("l_quantity") * F.lit(100)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount_c4).alias("sum_profit_c4"))
    )


ORACLE_Q9 = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({sql_cents('l_extendedprice')}
                  * (100 - {sql_cents('l_discount')})
                - {sql_cents('p_retailprice')}
                  * {sql_whole('l_quantity')} * 100) AS BIGINT)
         AS sum_profit_c4
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_FRAG}%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


Q21_LATE_DAYS = 60
Q21_NATION = "NATION_3"


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for a
    fixed nation, count finished ('F') orders where THIS supplier's
    line was late but EVERY other supplier's line on the same order
    was on time — the same-order different-supplier EXISTS +
    NOT-EXISTS pair, the one correlated shape the suite still lacked.
    The fixture has no l_commitdate/l_receiptdate, so "late"
    substitutes l_shipdate > o_orderdate + Q21_LATE_DAYS (documented;
    the semi/anti self-join structure is unchanged), and the failed
    relation is collapsed to DISTINCT (orderkey, suppkey) because the
    synthetic lineitem composite key is not unique (TESTDATA caveat —
    duplicate lines must not double-count a wait).

    Plan: EXISTS → left-semi, NOT EXISTS → left-anti, both equi-keyed
    on orderkey with the supplier inequality as a residual condition —
    no cartesian anywhere; supplier and nation broadcast; the final
    top-100 sorts |suppliers-of-one-nation| count rows with a
    deterministic (numwait DESC, s_name) tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lines = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    with_ord = lines.join(
        f_orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    late = (
        with_ord.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_pairs = (
        with_ord.select("l_orderkey", "l_suppkey").distinct()
    )
    o = all_pairs.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    l2 = late.select(
        F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk")
    )
    # EXISTS another supplier on the order; NOT EXISTS another LATE one
    waiting = late.join(
        o,
        (F.col("l_orderkey") == F.col("o_ok"))
        & (F.col("l_suppkey") != F.col("o_sk")),
        "left_semi",
    ).join(
        l2,
        (F.col("l_orderkey") == F.col("x_ok"))
        & (F.col("l_suppkey") != F.col("x_sk")),
        "left_anti",
    )
    named = waiting.join(
        F.broadcast(
            sup.join(
                F.broadcast(nat.filter(F.col("n_name") == Q21_NATION)),
                F.col("s_nationkey") == F.col("n_nationkey"),
                "left_semi",
            )
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    return (
        named.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


ORACLE_Q21 = f"""
WITH f AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
),
pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN f ON l_orderkey = o_orderkey
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN f ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
),
w AS (
  SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
  WHERE EXISTS (SELECT 1 FROM pairs p
                WHERE p.l_orderkey = l1.l_orderkey
                  AND p.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
)
SELECT s_name, COUNT(*) AS numwait
FROM w JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_name = '{Q21_NATION}')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q16 / Q20 shapes over a DERIVED partsupp relation
# (round 15 — completes all 22 TPC-H shapes). The fixture schema has
# no partsupp table, so the four queries that depend on it
# structurally share ONE documented substitution: partsupp_derived =
# lineitem grouped by (partkey, suppkey) with
#   ps_supplycost_c = MIN(unit sale price in cents)   (integer div —
#     both engines truncate identically on non-negative operands)
#   ps_availqty     = SUM(quantity)
# The substitution changes the numbers, never the SHAPE: correlated
# min (Q2), group-vs-global-total threshold (Q11), distinct-count
# with NOT-IN supplier exclusion (Q16), nested-IN half-sum promotion
# (Q20) are all exercised exactly as written in the spec.
# ---------------------------------------------------------------------------


def derived_partsupp(li: DataFrame) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_supplycost_c, ps_availqty) — the
    derived supply relation (see block comment). One corpus-sized
    exchange on the composite key; map-side combinable.

    NULL part/supplier keys are dropped up front: every downstream
    equi-join would drop them anyway, EXCEPT Q16's anti-join, where a
    NULL-keyed group diverges from the oracle's literal NOT IN (the
    NOT IN evaluates to NULL against a non-empty exclusion list and
    drops the row; a left-anti KEEPS a NULL probe key — r15 review
    finding). One filter here keeps every consumer engine-exact."""
    return (
        li.filter(
            F.col("l_partkey").isNotNull()
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            # NULLIF guards a zero quantity: ANSI `div` by zero would
            # kill the corpus job; NULL-missing is the poisoned-row
            # discipline (functions.numeric), and DuckDB's `//` gets
            # the same NULLIF in SQL_PARTSUPP_DERIVED
            # composed from the ONE money-cast definition
            # (functions.numeric.sql_cents/sql_whole — Spark parses
            # the same TRY_CAST/ROUND text): a hand-inlined copy here
            # was the r13 drift class all over again (r15 review)
            F.min(
                F.expr(
                    f"{sql_cents('l_extendedprice')}"
                    f" div NULLIF({sql_whole('l_quantity')}, 0)"
                )
            ).alias("ps_supplycost_c"),
            F.sum(whole("l_quantity")).alias("ps_availqty"),
        )
    )


SQL_PARTSUPP_DERIVED = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN({sql_cents('l_extendedprice')}
             // NULLIF({sql_whole('l_quantity')}, 0))
           AS ps_supplycost_c,
         CAST(SUM({sql_whole('l_quantity')}) AS BIGINT) AS ps_availqty
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
  GROUP BY l_partkey, l_suppkey
"""

Q2_REGION = "EUROPE"
Q2_SIZE = 15


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every size-15 part,
    the region's suppliers whose (derived) supply cost EQUALS the
    part's regional minimum — the correlated-MIN-subquery shape,
    decorrelated the standard way: one per-part MIN aggregate over the
    region-filtered supply, equi-joined back on (partkey, cost). Ties
    at the minimum return every tied supplier, as in the spec.

    Plan: supplier ⋈ nation ⋈ region is dimension-sized and broadcast
    into the supply scan; the per-part MIN and the join back are both
    keyed on ps_partkey (one exchange each side); part is size-pruned
    before its broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") == Q2_SIZE
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q2_REGION
    )
    eur_sup = sup.join(
        F.broadcast(
            nat.join(
                F.broadcast(reg),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    supply = derived_partsupp(li).join(
        F.broadcast(eur_sup),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    )
    # rename the aggregate's key: `mins` descends from `supply`, so an
    # un-renamed ps_partkey would be ambiguous in the self-join below
    mins = (
        supply.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost_c").alias("min_cost_c"))
        .withColumnRenamed("ps_partkey", "min_partkey")
    )
    return (
        supply.join(
            mins,
            (F.col("ps_partkey") == F.col("min_partkey"))
            & (F.col("ps_supplycost_c") == F.col("min_cost_c")),
        )
        .join(
            F.broadcast(part),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "ps_supplycost_c",
            cents("s_acctbal").alias("s_acctbal_cents"),
        )
    )


ORACLE_Q2 = f"""
WITH ps AS ({SQL_PARTSUPP_DERIVED}),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
),
supply AS (
  SELECT ps.*, eur.s_name, eur.s_acctbal, eur.n_name
  FROM ps JOIN eur ON ps_suppkey = s_suppkey
)
SELECT p_partkey, p_name, s_name, n_name, ps_supplycost_c,
       {sql_cents('s_acctbal')} AS s_acctbal_cents
FROM supply
JOIN part ON ps_partkey = p_partkey
WHERE p_size = {Q2_SIZE}
  AND ps_supplycost_c = (
    SELECT MIN(s2.ps_supplycost_c) FROM supply s2
    WHERE s2.ps_partkey = supply.ps_partkey)
"""


Q11_NATION = "NATION_7"
Q11_FRACTION_DEN = 1000  # keep parts worth > 1/1000 of the total


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part
    stock value (Σ supplycost·availqty over one nation's suppliers),
    keeping parts whose value exceeds a FRACTION of the nation's
    total — the group-aggregate-vs-global-scalar-threshold shape. The
    threshold compare is integer cross-multiplied (value·DEN >
    total), so the keep set is engine-exact. Plan: one supply
    aggregate keyed on partkey, referenced twice (the per-part side
    and the global total reduced from it and broadcast back as a
    one-row frame) — both references share the identical partial-agg
    Exchange, which Spark's exchange-reuse rewrites to a single
    physical shuffle (`ReusedExchange`, plan-gated), so the corpus is
    scanned and partially aggregated ONCE inside one fully lazy plan:
    no persist to pin across a long-lived session, no eager driver
    scalar whose lineage would re-run when the result is consumed
    (r16 ADVICE: the r15 `.first()`-literal form paid two full passes
    — one at call time, one at consumption)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION
    )
    nat_sup = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    supply = derived_partsupp(li).join(
        F.broadcast(nat_sup), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    per_part = supply.groupBy("ps_partkey").agg(
        F.sum(
            F.col("ps_supplycost_c") * F.col("ps_availqty")
        ).alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * Q11_FRACTION_DEN > F.col("total_c"))
        .select("ps_partkey", "value_c")
    )


ORACLE_Q11 = f"""
WITH ps AS ({SQL_PARTSUPP_DERIVED}),
supply AS (
  SELECT ps.* FROM ps
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
),
per_part AS (
  SELECT ps_partkey,
         CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
  FROM supply GROUP BY ps_partkey
)
SELECT ps_partkey, value_c FROM per_part
WHERE value_c * {Q11_FRACTION_DEN} >
      (SELECT SUM(value_c) FROM per_part)
"""


Q16_BRAND_EXCL = "Brand#1"
Q16_TYPE_EXCL = "PROMO"
Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): DISTINCT
    supplier count per (brand, type, size) over the derived supply,
    excluding one brand, one type, non-listed sizes, and — the NOT-IN
    subquery the shape exists for — every supplier with a negative
    account balance (the fixture's analog of the spec's
    customer-complaints comment filter; 6 such suppliers exist at
    sf0.01, so the exclusion is non-trivial). Spark expresses NOT IN
    as a left-anti join, exactly equivalent here because supplier
    keys are non-null (the NOT-IN NULL trap is documented where the
    oracle keeps the literal NOT IN to pin the spec shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_BRAND_EXCL)
        & (F.col("p_type") != Q16_TYPE_EXCL)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = derived_partsupp(li)
    kept = ps.join(
        F.broadcast(bad_sup),
        F.col("ps_suppkey") == F.col("s_suppkey"),
        "left_anti",
    ).join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
    return kept.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("ps_suppkey").alias("supplier_cnt")
    )


ORACLE_Q16 = f"""
WITH ps AS ({SQL_PARTSUPP_DERIVED})
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{Q16_BRAND_EXCL}'
  AND p_type <> '{Q16_TYPE_EXCL}'
  AND p_size IN {Q16_SIZES}
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


Q20_NATION = "NATION_2"
Q20_NAME_PREFIX = "red"
Q20_LO, Q20_HI = "1996-01-01", "1997-01-01"


def q20_potential_promotion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested-IN
    chain — supplier IN (supply of parts IN a name-prefix list, with
    a CORRELATED half-sum threshold against a date-window quantity
    aggregate). Because the derived supply relation comes from the
    same lineitem rows (shipped ⊆ holdings), the spec's literal
    direction (availqty > ½·window-qty) is VACUOUS here, so the
    threshold is inverted to keep it biting: a (part, supplier)
    holding qualifies when the 1996 window moved MORE than half its
    total quantity (2·qty_1996 > availqty — fast-moving stock, the
    promotion signal; 983 of 6688 red-part pairs qualify at sf0.01,
    so the correlated compare does real work). Integer compare;
    pairs with no window shipments COALESCE to 0 and never qualify.
    Plan: the name-filtered part list and the nation's suppliers
    broadcast; the window aggregate and the supply relation share
    the (partkey, suppkey) key — one exchange each, one equi-join;
    final output is a DISTINCT supplier list."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"{Q20_NAME_PREFIX}%")
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q20_NATION
    )
    nat_sup = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    qty_window = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_HI).cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(whole("l_quantity")).alias("qty_1996"))
    )
    ps = derived_partsupp(li).join(
        F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"), "left_semi"
    )
    qualified = (
        ps.join(
            qty_window,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
            "left",
        )
        .filter(
            F.coalesce(F.col("qty_1996"), F.lit(0)) * 2
            > F.col("ps_availqty")
        )
        .select("ps_suppkey")
        .distinct()
    )
    # the inner equi-join both restricts to the nation's suppliers and
    # carries the name; `qualified` is already distinct on the key
    return qualified.join(
        F.broadcast(nat_sup), F.col("ps_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name")


ORACLE_Q20 = f"""
WITH ps AS ({SQL_PARTSUPP_DERIVED}),
qty AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM({sql_whole('l_quantity')}) AS BIGINT) AS qty_1996
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q20_HI} 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_name = '{Q20_NATION}')
  AND s_suppkey IN (
    SELECT ps_suppkey FROM ps
    LEFT JOIN qty ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE ps_partkey IN (SELECT p_partkey FROM part
                         WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
      AND COALESCE(qty_1996, 0) * 2 > ps_availqty)
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q16_parts_supplier_cnt": q16_parts_supplier_cnt,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q13_custdist": q13_custdist,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume": q18_large_volume,
    "q19_disjunctive": q19_disjunctive,
    "q22_dormant_customers": q22_dormant_customers,
    "string_distance": q_string_distance,
}

ORACLES = {
    "q4_order_priority": ORACLE_Q4,
    "q2_min_cost_supplier": ORACLE_Q2,
    "q9_product_profit": ORACLE_Q9,
    "q11_important_stock": ORACLE_Q11,
    "q16_parts_supplier_cnt": ORACLE_Q16,
    "q20_potential_promotion": ORACLE_Q20,
    "q21_waiting_suppliers": ORACLE_Q21,
    "q6_forecast_revenue": ORACLE_Q6,
    "q7_volume_shipping": ORACLE_Q7,
    "q8_market_share": ORACLE_Q8,
    "q10_returned_items": ORACLE_Q10,
    "q13_custdist": ORACLE_Q13,
    "q14_promo_revenue": ORACLE_Q14,
    "q15_top_supplier": ORACLE_Q15,
    "q17_small_qty_revenue": ORACLE_Q17,
    "q18_large_volume": ORACLE_Q18,
    "q19_disjunctive": ORACLE_Q19,
    "q22_dormant_customers": ORACLE_Q22,
    "string_distance": ORACLE_STRING_DISTANCE,
}
