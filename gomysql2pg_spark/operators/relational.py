"""Relational operator surface (SURVEY.md §2.B) as native DataFrame programs.

The reference generates these operators as SQL text and delegates
execution to MySQL/PG (e.g. page scans `cmd/root.go:382`, catalog
filters `cmd/root.go:229`, index-DDL aggregation `cmd/tablemeta.go:215`).
Here each becomes a Catalyst-planned DataFrame program over the parquet
fixtures, paired with an ANSI-SQL oracle (DuckDB) in `ORACLES`.

Scale notes are attached per-operator; the common themes:
- dimension joins (region/nation/customer-page-keys) are broadcast,
- aggregations are expressed so map-side partial aggregation applies,
- global-order operators (pagination) note their scalable variant in
  `plans.pagination` (two-phase range-partitioned row numbering),
- money aggregation is exact bigint (see `functions.numeric`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import cents, sql_cents, sql_whole, whole

# ---------------------------------------------------------------------------
# B1 full scan / B2 projection
# ---------------------------------------------------------------------------


def q_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: `select * from t` (`cmd/root.go:357` no-PK fallback)."""
    return load_table(spark, sf_dir, "region")


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: explicit column list; Catalyst prunes the parquet scan to
    exactly these columns (check ReadSchema in .explain)."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# B3 + A2: filters, LIKE / NOT LIKE wildcard chains
# ---------------------------------------------------------------------------


def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/A2: the exclusion-pattern semantics of `cmd/root.go:227-247`
    (`*`→`%`, AND-chained NOT LIKE) plus IN / IS NOT NULL / != predicates.
    All predicates are plain Column exprs → pushed to the parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(~F.col("p_type").like("PRO%"))
        .filter(~F.col("p_name").like("%gear%"))
        .filter(F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13", "Brand#20"))
        .filter(F.col("p_size").isNotNull() & (F.col("p_size") != 3))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    )


ORACLE_FILTER_LIKE = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_type NOT LIKE 'PRO%'
  AND p_name NOT LIKE '%gear%'
  AND p_brand IN ('Brand#1','Brand#7','Brand#13','Brand#20')
  AND p_size IS NOT NULL AND p_size <> 3
"""


# ---------------------------------------------------------------------------
# B4 multi-key sort (materialized as a rank so the hash compare sees order)
# ---------------------------------------------------------------------------


def q_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4/B5: ORDER BY <keys> LIMIT n (`cmd/root.go:382`). The sort order
    is materialized as `rn` so the order-insensitive hash still verifies
    ordering. Top-k via sort+limit is a TakeOrderedAndProject — no full
    sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(
        F.col("total_cents").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderkey", cents("o_totalprice").alias("total_cents")
        )
        .orderBy(F.col("total_cents").desc(), F.col("o_orderkey"))
        .limit(100)
        .withColumn("rn", F.row_number().over(w))
    )


ORACLE_MULTIKEY_SORT = f"""
SELECT o_orderkey, total_cents,
       ROW_NUMBER() OVER (ORDER BY total_cents DESC, o_orderkey) AS rn
FROM (
  SELECT o_orderkey, {sql_cents('o_totalprice')} AS total_cents
  FROM orders
  ORDER BY total_cents DESC, o_orderkey
  LIMIT 100
)
"""


# ---------------------------------------------------------------------------
# B5 limit/offset pagination (reference page template `cmd/root.go:382`)
# ---------------------------------------------------------------------------

PAGE_SIZE = 1000
PAGE_NO = 3  # 0-based → rows [3000, 4000)


def q_page_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: `ORDER BY pk LIMIT <page*size>, <size>` — one page of a
    PK-ordered scan. Implemented with a row_number window; the scalable
    path (no single-partition window) is plans.pagination.global_row_number,
    and on a real JDBC source this whole operator disappears into
    partition predicates (SURVEY.md §4)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    lo, hi = PAGE_NO * PAGE_SIZE, (PAGE_NO + 1) * PAGE_SIZE
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            cents("o_totalprice").alias("total_cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") > lo) & (F.col("rn") <= hi))
        .drop("rn")
    )


ORACLE_PAGE_LIMIT_OFFSET = f"""
SELECT o_orderkey, o_custkey, o_orderstatus,
       {sql_cents('o_totalprice')} AS total_cents
FROM orders
ORDER BY o_orderkey
LIMIT {PAGE_SIZE} OFFSET {PAGE_NO * PAGE_SIZE}
"""


# ---------------------------------------------------------------------------
# B6 composite-PK page fetch: inner key page LEFT JOIN back to the table
# ---------------------------------------------------------------------------


def q_page_fetch_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: the reference's pagination trick — `(SELECT pk ORDER BY pk
    LIMIT o,n) temp LEFT JOIN t ON temp.pk=t.pk` with a composite key
    (`cmd/root.go:361-371,382`). Faithful LEFT JOIN semantics: when the
    paging key is not unique (true in this fixture) the join fans out
    exactly as the reference's generated SQL would. The key page is the
    preserved side so it cannot be the broadcast build side; at scale
    the shuffle is bounded by page_size on one side, and the real JDBC
    path replaces this operator with partition predicates entirely
    (plans.pagination)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_orderkey", "l_linenumber")
    keys = (
        li.select("l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") > 10000) & (F.col("rn") <= 12000))
        .drop("rn")
    )
    return keys.join(li, on=["l_orderkey", "l_linenumber"], how="left").select(
        "l_orderkey",
        "l_linenumber",
        whole("l_quantity").alias("qty"),
        cents("l_extendedprice").alias("price_cents"),
    )


ORACLE_PAGE_FETCH_COMPOSITE = f"""
SELECT t.l_orderkey, t.l_linenumber,
       {sql_whole('t.l_quantity')} AS qty,
       {sql_cents('t.l_extendedprice')} AS price_cents
FROM (
  SELECT l_orderkey, l_linenumber FROM lineitem
  ORDER BY l_orderkey, l_linenumber
  LIMIT 2000 OFFSET 10000
) temp
LEFT JOIN lineitem t
  ON temp.l_orderkey = t.l_orderkey AND temp.l_linenumber = t.l_linenumber
"""


# ---------------------------------------------------------------------------
# B7 inner equi-join chain (customer ⋈ nation ⋈ region) + B11 group agg
# ---------------------------------------------------------------------------


def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7+B11: two-level dimension join. nation (25 rows) and region
    (5 rows) are broadcast — customer never shuffles for the join; the
    only shuffle is the final (tiny) groupBy."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(cents("c_acctbal")).alias("acctbal_cents"),
        )
    )


ORACLE_JOIN_MULTI = f"""
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM({sql_cents('c_acctbal')}) AS BIGINT) AS acctbal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# B8 semi-join / anti-join
# ---------------------------------------------------------------------------


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: IN-subquery → left_semi (`cmd/tablemeta.go:162` pattern)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join complement of B8 (NOT EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ---------------------------------------------------------------------------
# B9 count / B10 ceil page-count
# ---------------------------------------------------------------------------


def q_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: `select count(*)` (`cmd/compare.go:112`)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


ORACLE_COUNT_STAR = "SELECT COUNT(*) AS cnt FROM lineitem"


def q_page_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: `ceil(count(*)/pageSize)` (`cmd/root.go:373`)."""
    return (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.ceil(F.count("*") / F.lit(float(PAGE_SIZE)))
            .cast("long")
            .alias("total_page_num")
        )
    )


ORACLE_PAGE_COUNT = (
    f"SELECT CAST(CEIL(COUNT(*) / {PAGE_SIZE}.0) AS BIGINT) AS total_page_num FROM orders"
)


# ---------------------------------------------------------------------------
# B11+B12+B13: TPC-H Q1-style grouped aggregation (flagship)
# ---------------------------------------------------------------------------


def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11/B10/B13: multi-key hash aggregate with exact bigint money math
    (see functions.numeric). Partial (map-side) aggregation applies; the
    shuffle carries only 6 groups × a few bigints."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = cents("l_discount")  # discount in basis-point-ish integer (0..10)
    tax = cents("l_tax")
    price = cents("l_extendedprice")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(whole("l_quantity")).alias("sum_qty"),
            F.sum(price).alias("sum_base_cents"),
            F.sum(price * (F.lit(100) - disc)).alias("sum_disc_c4"),
            F.sum(price * (F.lit(100) - disc) * (F.lit(100) + tax)).alias(
                "sum_charge_c6"
            ),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_GROUP_AGG = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM({sql_whole('l_quantity')}) AS BIGINT) AS sum_qty,
  CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS sum_base_cents,
  CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
       AS BIGINT) AS sum_disc_c4,
  CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})
      * (100 + {sql_cents('l_tax')})) AS BIGINT) AS sum_charge_c6,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# B12: GROUP_CONCAT(DISTINCT … ORDER BY seq) — ordered distinct list agg
# ---------------------------------------------------------------------------


def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: `GROUP_CONCAT(DISTINCT col ORDER BY seq SEPARATOR ', ')`
    (`cmd/tablemeta.go:215,217,278`). Semantics: distinct values ordered
    by first occurrence (min seq). Two-level aggregation keeps it fully
    partial-aggregatable: (key, val)→min(seq), then key→sorted list.
    collect_list here is bounded (≤ distinct flags per order), safe at
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    per_val = li.groupBy("l_orderkey", F.col("l_returnflag").alias("val")).agg(
        F.min("l_linenumber").alias("mn")
    )
    return per_val.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("mn", "val"))),
                lambda s: s["val"],
            ),
            ", ",
        ).alias("flags")
    )


ORACLE_GROUP_CONCAT = """
SELECT l_orderkey,
       array_to_string(list(val ORDER BY mn, val), ', ') AS flags
FROM (
  SELECT l_orderkey, l_returnflag AS val, MIN(l_linenumber) AS mn
  FROM lineitem GROUP BY l_orderkey, l_returnflag
)
GROUP BY l_orderkey
"""


# ---------------------------------------------------------------------------
# B13/B14: conditional + null-handling scalar functions
# ---------------------------------------------------------------------------


def q_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13/B14: CASE WHEN / IF / ifnull-coalesce chains
    (`cmd/tablemeta.go:62,162,215`). Pure Column exprs → whole-stage
    codegen, no UDFs."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_word"),
        F.when(cents("o_totalprice") > 20_000_00, "big")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
            F.lit("unspecified"),
        ).alias("priority_clean"),
    )


ORACLE_CONDITIONAL_NULL = f"""
SELECT o_orderkey,
  CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
       ELSE 'pending' END AS status_word,
  CASE WHEN {sql_cents('o_totalprice')} > 2000000 THEN 'big' ELSE 'small'
       END AS size_class,
  COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified')
       AS priority_clean
FROM orders
"""


# ---------------------------------------------------------------------------
# B15: string scalar functions
# ---------------------------------------------------------------------------


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: concat/lower/upper/replace/substr/length
    (`cmd/tablemeta.go:62,162,306`)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.regexp_replace(F.col("p_type"), " ", "_").alias("type_u"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
    )


ORACLE_STRING_FUNCS = """
SELECT p_partkey,
  UPPER(p_name) AS name_upper,
  LOWER(p_brand) AS brand_lower,
  REPLACE(p_type, ' ', '_') AS type_u,
  SUBSTRING(p_name, 1, 5) AS name_pfx,
  CONCAT(p_brand, '|', p_type) AS brand_type,
  LENGTH(p_name) AS name_len
FROM part
"""


# ---------------------------------------------------------------------------
# B17: derived tables / nested aggregation
# ---------------------------------------------------------------------------


def q_derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: 3-level derived-table nesting (`cmd/tablemeta.go:162`):
    per-customer order totals → join dims → per-nation stats. The inner
    agg shuffles on o_custkey; nation is broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("total_c"),
        F.count("*").alias("n_orders"),
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("total_c").alias("nation_cents"),
            F.sum("n_orders").alias("nation_orders"),
            F.count("*").alias("nation_customers"),
        )
    )


ORACLE_DERIVED_TABLE = f"""
SELECT n_name,
  CAST(SUM(total_c) AS BIGINT) AS nation_cents,
  CAST(SUM(n_orders) AS BIGINT) AS nation_orders,
  COUNT(*) AS nation_customers
FROM (
  SELECT o_custkey, SUM({sql_cents('o_totalprice')}) AS total_c,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
) t
JOIN customer ON t.o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Distinct aggregation (absent in reference beyond GROUP_CONCAT DISTINCT —
# SURVEY.md §2.C — implemented as a first-class operator here)
# ---------------------------------------------------------------------------


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count("*").alias("n_orders"),
    )


ORACLE_DISTINCT_AGG = """
SELECT COUNT(DISTINCT o_custkey) AS n_cust,
       COUNT(DISTINCT o_orderpriority) AS n_prio,
       COUNT(*) AS n_orders
FROM orders
"""


# ---------------------------------------------------------------------------
# Window functions (absent in reference — §2.C): per-group top-k
# ---------------------------------------------------------------------------


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Window is PARTITIONED by o_custkey —
    scales horizontally (no global sort); rank ties broken by PK for
    determinism."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("total_cents").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            cents("o_totalprice").alias("total_cents"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


ORACLE_WINDOW_TOPK = f"""
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         {sql_cents('o_totalprice')} AS total_cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY {sql_cents('o_totalprice')} DESC,
                                     o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Grouping sets / rollup (absent in reference — §2.C)
# ---------------------------------------------------------------------------


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


ORACLE_ROLLUP_AGG = """
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# Set operations (absent in reference — §2.C)
# ---------------------------------------------------------------------------


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


ORACLE_SET_EXCEPT = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_set_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    union = c.union(s).distinct().withColumn("setop", F.lit("union"))
    inter = c.intersect(s).withColumn("setop", F.lit("intersect"))
    return union.union(inter)


ORACLE_SET_UNION_INTERSECT = """
SELECT nationkey, 'union' AS setop FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'intersect' AS setop FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT SELECT s_nationkey FROM supplier)
"""


# ---------------------------------------------------------------------------
# TPC-H-style headline queries (bench workload)
# ---------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 2 joins + agg + top-10. customer filter first
    (selective) → broadcast the filtered keys side is left to AQE; the
    orders⋈lineitem join shuffles on o_orderkey/l_orderkey."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01").cast("timestamp")
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("odate"), "o_orderpriority")
        .agg(F.sum(revenue).alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("l_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate, o_orderpriority,
       CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
         AS BIGINT) AS revenue_c4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue_c4 DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join with region filter. All dimension
    tables broadcast; the single big shuffle is lineitem⋈orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue_c4"))
    )


ORACLE_Q5 = f"""
SELECT n_name,
       CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
         AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "full_scan": q_full_scan,
    "projection": q_projection,
    "filter_like": q_filter_like,
    "multikey_sort": q_multikey_sort,
    "page_limit_offset": q_page_limit_offset,
    "page_fetch_composite": q_page_fetch_composite,
    "join_multi": q_join_multi,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "count_star": q_count_star,
    "page_count": q_page_count,
    "group_agg": q_group_agg,
    "group_concat": q_group_concat,
    "conditional_null": q_conditional_null,
    "string_funcs": q_string_funcs,
    "derived_table": q_derived_table,
    "distinct_agg": q_distinct_agg,
    "window_topk": q_window_topk,
    "rollup_agg": q_rollup_agg,
    "set_except": q_set_except,
    "set_union_intersect": q_set_union_intersect,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
}

ORACLES = {
    "full_scan": "SELECT r_regionkey, r_name FROM region",
    "projection": "SELECT c_custkey, c_name FROM customer",
    "filter_like": ORACLE_FILTER_LIKE,
    "multikey_sort": ORACLE_MULTIKEY_SORT,
    "page_limit_offset": ORACLE_PAGE_LIMIT_OFFSET,
    "page_fetch_composite": ORACLE_PAGE_FETCH_COMPOSITE,
    "join_multi": ORACLE_JOIN_MULTI,
    "semi_join": ORACLE_SEMI_JOIN,
    "anti_join": ORACLE_ANTI_JOIN,
    "count_star": ORACLE_COUNT_STAR,
    "page_count": ORACLE_PAGE_COUNT,
    "group_agg": ORACLE_GROUP_AGG,
    "group_concat": ORACLE_GROUP_CONCAT,
    "conditional_null": ORACLE_CONDITIONAL_NULL,
    "string_funcs": ORACLE_STRING_FUNCS,
    "derived_table": ORACLE_DERIVED_TABLE,
    "distinct_agg": ORACLE_DISTINCT_AGG,
    "window_topk": ORACLE_WINDOW_TOPK,
    "rollup_agg": ORACLE_ROLLUP_AGG,
    "set_except": ORACLE_SET_EXCEPT,
    "set_union_intersect": ORACLE_SET_UNION_INTERSECT,
    "q3_shipping_priority": ORACLE_Q3,
    "q5_local_supplier": ORACLE_Q5,
}
