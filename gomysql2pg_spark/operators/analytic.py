"""Analytic operators: the window-function / multi-dim aggregation /
pivot / statistical surface (absent in the reference — SURVEY.md §2.C
states the gaps explicitly; mandated by the task rubric).

Determinism discipline (everything is under the value-hash oracle):
- window orderings always end in a unique key (orderkey) so rank/lag
  values are total-order stable,
- money flows through exact bigint cents (functions.numeric),
- variance/correlation are computed from INTEGER power sums with the
  textbook closed forms, spelled identically in Spark and the oracle —
  the only float ops are the final divisions, identical IEEE both
  engines (a streaming stddev would be order-dependent across
  partitionings and could never hash-match),
- percent_rank/cume_dist are rational numbers of small ints → exact.

Scale notes: every window here is PARTITIONED (by customer / flag) —
no global unpartitioned window ordering exists in this module except
the final small orderBys; cube/grouping-sets expand to ≤4× the group
count, all partial-aggregated before shuffle; the range join is the
bucket-equi-join formulation (the scalable form — a BETWEEN theta-join
would be O(n·m))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import cents, sql_cents

# ---------------------------------------------------------------------------
# window functions: lag/lead/rank family/frames
# ---------------------------------------------------------------------------


def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-function family over per-customer order history:
    offsets (lag/lead), ranking (rank, dense_rank, percent_rank,
    cume_dist, ntile), and a running-sum ROWS frame. One shuffle on
    o_custkey; within-partition sort by (date, key) — unique, so every
    value is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    pc = cents("o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        pc.alias("pc"),
        F.lag(pc, 1).over(w).alias("prev_pc"),
        F.lead(pc, 1).over(w).alias("next_pc"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
        F.sum(pc).over(run).alias("running_pc"),
        F.min(pc).over(run).alias("min_so_far"),
        F.max(pc).over(run).alias("max_so_far"),
    )


ORACLE_WINDOW_FUNCS = f"""
SELECT o_custkey, o_orderkey,
  {sql_cents('o_totalprice')} AS pc,
  LAG({sql_cents('o_totalprice')}, 1) OVER w AS prev_pc,
  LEAD({sql_cents('o_totalprice')}, 1) OVER w AS next_pc,
  ROW_NUMBER() OVER w AS rn,
  RANK() OVER w AS rk,
  DENSE_RANK() OVER w AS drk,
  PERCENT_RANK() OVER w AS prk,
  CUME_DIST() OVER w AS cd,
  NTILE(4) OVER w AS quartile,
  CAST(SUM({sql_cents('o_totalprice')})
    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS running_pc,
  MIN({sql_cents('o_totalprice')})
    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS min_so_far,
  MAX({sql_cents('o_totalprice')})
    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_so_far
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: for each order, count + sum of the customer's orders
    priced within 50000 cents below the current price (value-based
    frame — a genuinely different physical operator than ROWS)."""
    orders = load_table(spark, sf_dir, "orders")
    pc = cents("o_totalprice")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(pc)
        .rangeBetween(-50_000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        pc.alias("pc"),
        F.count("*").over(w).alias("n_in_band"),
        F.sum(pc).over(w).alias("band_pc"),
    )


ORACLE_WINDOW_RANGE = f"""
SELECT o_custkey, o_orderkey,
  {sql_cents('o_totalprice')} AS pc,
  COUNT(*) OVER w AS n_in_band,
  CAST(SUM({sql_cents('o_totalprice')}) OVER w AS BIGINT) AS band_pc
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY {sql_cents('o_totalprice')}
             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# multi-dimensional aggregation: cube / grouping sets
# ---------------------------------------------------------------------------


def q_window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first_value / last_value (full frame) /
    nth_value over each customer's order history, plus NULLS LAST
    ordering of a nullable key (P-status orders get NULL keys) — the
    two ordering semantics the rank family doesn't exercise."""
    orders = load_table(spark, sf_dir, "orders")
    pc = cents("o_totalprice")
    nullable_key = F.when(
        F.col("o_orderstatus") == "P", F.lit(None).cast("long")
    ).otherwise(pc)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_nulls = Window.partitionBy("o_custkey").orderBy(
        nullable_key.asc_nulls_last(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        pc.alias("pc"),
        F.first(pc).over(w_full).alias("first_pc"),
        F.last(pc).over(w_full).alias("last_pc"),
        F.nth_value(pc, 2).over(w_full).alias("second_pc"),
        F.row_number().over(w_nulls).alias("rn_nulls_last"),
    )


ORACLE_WINDOW_VALUE_FUNCS = f"""
SELECT o_custkey, o_orderkey,
  {sql_cents('o_totalprice')} AS pc,
  FIRST_VALUE({sql_cents('o_totalprice')}) OVER wf AS first_pc,
  LAST_VALUE({sql_cents('o_totalprice')}) OVER wf AS last_pc,
  NTH_VALUE({sql_cents('o_totalprice')}, 2) OVER wf AS second_pc,
  ROW_NUMBER() OVER (
    PARTITION BY o_custkey
    ORDER BY (CASE WHEN o_orderstatus = 'P' THEN NULL
                   ELSE {sql_cents('o_totalprice')} END) ASC NULLS LAST,
             o_orderkey) AS rn_nulls_last
FROM orders
WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (mktsegment, nation): all 4 grouping combinations in
    one pass + GROUPING_ID to tag them. Expansion is bounded (4× the
    finest group count) and fully partial-aggregatable."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    # the () grouping set rides a SEPARATE global aggregate: Spark's
    # cube() on EMPTY input emits 0 rows where SQL emits the one ()
    # row (count 0, NULL sums) — r13 review finding, verified on both
    # engines. groupingSets without () is empty-on-empty in both, and
    # .agg() is always exactly one row, so the union matches SQL CUBE
    # on every input.
    aggs = [
        F.count("*").alias("n_customers"),
        F.sum(cents("c_acctbal")).alias("acctbal_cents"),
    ]
    gs = joined.groupingSets(
        [["c_mktsegment", "n_name"], ["c_mktsegment"], ["n_name"]],
        "c_mktsegment",
        "n_name",
    ).agg(*aggs, F.grouping_id().alias("gid"))
    glob = joined.agg(*aggs).select(
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("string").alias("n_name"),
        "n_customers",
        "acctbal_cents",
        F.lit(3).cast("int").alias("gid"),
    )
    return gs.unionByName(glob)


ORACLE_CUBE_AGG = f"""
SELECT c_mktsegment, n_name,
  COUNT(*) AS n_customers,
  CAST(SUM({sql_cents('c_acctbal')}) AS BIGINT) AS acctbal_cents,
  GROUPING(c_mktsegment, n_name) AS gid
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (c_mktsegment, n_name)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: ((status, priority), (status), ()) —
    the general form rollup/cube compile to."""
    orders = load_table(spark, sf_dir, "orders")
    # same ()-row-on-empty treatment as q_cube_agg above
    aggs = [
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("price_cents"),
    ]
    gs = orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"]],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(*aggs, F.grouping_id().alias("gid"))
    glob = orders.agg(*aggs).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "n_orders",
        "price_cents",
        F.lit(3).cast("int").alias("gid"),
    )
    return gs.unionByName(glob)


ORACLE_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS price_cents,
  GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------

PIVOT_STATUSES = ["O", "F", "P"]


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority (explicit value
    list — at scale an open-ended pivot needs a first pass to collect
    the domain; a fixed domain keeps it one pass)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(F.count(F.lit(1)))
        .toDF("o_orderpriority", *[f"n_{s.lower()}" for s in PIVOT_STATUSES])
        .na.fill(0, [f"n_{s.lower()}" for s in PIVOT_STATUSES])
    )


ORACLE_PIVOT_STATUS = """
SELECT o_orderpriority,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
"""


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-priority aggregate → long
    (priority, metric, value) rows — the inverse reshaping of pivot,
    via DataFrame.unpivot. Narrow op after the aggregate; no extra
    shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("price_cents"),
        F.max(cents("o_totalprice")).alias("max_cents"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "price_cents", "max_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    )


ORACLE_UNPIVOT_METRICS = f"""
WITH wide AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS price_cents,
         MAX({sql_cents('o_totalprice')}) AS max_cents
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
UNION ALL
SELECT o_orderpriority, 'price_cents', price_cents FROM wide
UNION ALL
SELECT o_orderpriority, 'max_cents', max_cents FROM wide
"""


# ---------------------------------------------------------------------------
# statistical aggregates — exact via integer power sums
# ---------------------------------------------------------------------------


def q_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation per market segment, computed
    from integer power sums (Σx, Σx², Σxy as bigints) with the closed
    forms applied once per group. A streaming float variance is
    partition-order-dependent; this formulation is bit-deterministic at
    any parallelism — the 100 TB-safe way to do statistics. The oracle
    spells the identical arithmetic."""
    customer = load_table(spark, sf_dir, "customer")
    ac = cents("c_acctbal")
    key = F.col("c_custkey").cast("long")
    g = customer.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(ac).alias("s1"),
        F.sum(ac * ac).alias("s2"),
        F.sum(key).alias("k1"),
        F.sum(key * key).alias("k2"),
        F.sum(ac * key).alias("sk"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    k1 = F.col("k1").cast("double")
    k2 = F.col("k2").cast("double")
    sk = F.col("sk").cast("double")
    # try_divide, not /: under ANSI mode a 1-customer segment
    # (n-1 = 0) or a constant-valued segment (zero stddev in the corr
    # denominator) would raise DIVIDE_BY_ZERO and kill the job, where
    # the DuckDB oracle returns NULL (r13 review finding; n itself is
    # ≥1 for every group, so mean/var_pop keep the plain division)
    return g.select(
        "c_mktsegment",
        "n",
        (s1 / n).alias("mean_cents"),
        F.try_divide(s2 - s1 * s1 / n, n - F.lit(1.0)).alias("var_samp"),
        F.sqrt(
            F.try_divide(s2 - s1 * s1 / n, n - F.lit(1.0))
        ).alias("stddev_samp"),
        ((s2 - s1 * s1 / n) / n).alias("var_pop"),
        F.try_divide(
            sk - s1 * k1 / n,
            F.sqrt(s2 - s1 * s1 / n) * F.sqrt(k2 - k1 * k1 / n),
        ).alias("corr_bal_key"),
    )


ORACLE_STATS_AGGS = f"""
WITH g AS (
  SELECT c_mktsegment,
    COUNT(*) AS n,
    SUM({sql_cents('c_acctbal')}) AS s1,
    SUM({sql_cents('c_acctbal')} * {sql_cents('c_acctbal')}) AS s2,
    SUM(CAST(c_custkey AS BIGINT)) AS k1,
    SUM(CAST(c_custkey AS BIGINT) * CAST(c_custkey AS BIGINT)) AS k2,
    SUM({sql_cents('c_acctbal')} * CAST(c_custkey AS BIGINT)) AS sk
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
  (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
    / (CAST(n AS DOUBLE) - 1.0) AS var_samp,
  SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
    / (CAST(n AS DOUBLE) - 1.0)) AS stddev_samp,
  (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
    / CAST(n AS DOUBLE) AS var_pop,
  (CAST(sk AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(k1 AS DOUBLE) / CAST(n AS DOUBLE))
    / (SQRT(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       * SQRT(CAST(k2 AS DOUBLE) - CAST(k1 AS DOUBLE) * CAST(k1 AS DOUBLE) / CAST(n AS DOUBLE)))
    AS corr_bal_key
FROM g
"""


def q_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + discrete percentiles over integer cents per
    segment. median of bigints = midpoint average (exact in double);
    percentile_disc picks an actual element — both engine-stable."""
    customer = load_table(spark, sf_dir, "customer")
    ac = cents("c_acctbal")
    return (
        customer.select("c_mktsegment", ac.alias("ac"))
        .groupBy("c_mktsegment")
        .agg(
            F.median("ac").alias("median_cents"),
            # cast to long: disc percentile picks an actual element (an
            # integer cent value); DuckDB quantile_disc returns the
            # element type (BIGINT) while Spark's returns double —
            # aligning on bigint keeps the driver's pandas dtypes equal.
            F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY ac)")
            .cast("long")
            .alias("p25_cents"),
            F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY ac)")
            .cast("long")
            .alias("p90_cents"),
            F.min("ac").alias("min_cents"),
            F.max("ac").alias("max_cents"),
        )
    )


ORACLE_MEDIAN_PERCENTILE = f"""
SELECT c_mktsegment,
  MEDIAN({sql_cents('c_acctbal')}) AS median_cents,
  quantile_disc({sql_cents('c_acctbal')}, 0.25) AS p25_cents,
  quantile_disc({sql_cents('c_acctbal')}, 0.90) AS p90_cents,
  MIN({sql_cents('c_acctbal')}) AS min_cents,
  MAX({sql_cents('c_acctbal')}) AS max_cents
FROM customer GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# range join (bucket-equi-join formulation)
# ---------------------------------------------------------------------------

BAND_WIDTH_CENTS = 5_000_000  # 50k-currency price bands


def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: assign each order to a price band [lo, hi). The
    scalable formulation maps the range predicate to an equi-join on
    the band index (one hash join, no theta-join blowup): band =
    floor(price / width). With multi-width bands the same trick emits
    one key per covered bucket (interval bucketing)."""
    orders = load_table(spark, sf_dir, "orders")
    pc = cents("o_totalprice")
    banded = orders.select(
        "o_orderkey",
        pc.alias("pc"),
        F.floor(pc / F.lit(BAND_WIDTH_CENTS)).cast("long").alias("band"),
    )
    return banded.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        F.min("pc").alias("min_pc"),
        F.max("pc").alias("max_pc"),
        (F.col("band") * BAND_WIDTH_CENTS).alias("band_lo"),
        ((F.col("band") + 1) * BAND_WIDTH_CENTS).alias("band_hi"),
    )


ORACLE_RANGE_JOIN_BANDS = f"""
SELECT CAST(FLOOR({sql_cents('o_totalprice')} / {BAND_WIDTH_CENTS}.0) AS BIGINT) AS band,
  COUNT(*) AS n_orders,
  MIN({sql_cents('o_totalprice')}) AS min_pc,
  MAX({sql_cents('o_totalprice')}) AS max_pc,
  CAST(FLOOR({sql_cents('o_totalprice')} / {BAND_WIDTH_CENTS}.0) AS BIGINT)
    * {BAND_WIDTH_CENTS} AS band_lo,
  (CAST(FLOOR({sql_cents('o_totalprice')} / {BAND_WIDTH_CENTS}.0) AS BIGINT) + 1)
    * {BAND_WIDTH_CENTS} AS band_hi
FROM orders
GROUP BY 1
"""


def q_collect_distinct_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set aggregation to a SORTED array per group (the
    deterministic form of collect_set — raw set order is partition-
    dependent and would never hash-match): per nation, the sorted
    distinct market segments of its customers."""
    customer = load_table(spark, sf_dir, "customer")
    # The sorted distinct set is serialized to a '|'-joined string:
    # array-typed output cells crash the driver's canonicalizer
    # ("unhashable type: 'list'", VERDICT r01), and the string form is
    # order-stable on both engines.
    return customer.groupBy("c_nationkey").agg(
        F.array_join(
            F.array_sort(F.collect_set("c_mktsegment")), "|"
        ).alias("segments"),
        F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
    )


ORACLE_COLLECT_DISTINCT = """
SELECT c_nationkey,
       array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|')
         AS segments,
       len(list_distinct(list(c_mktsegment)))::INT AS n_segments
FROM customer GROUP BY c_nationkey
"""


def q_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (the SQL FILTER clause): one scan, many
    differently-filtered aggregates per group — the idiom that replaces
    N self-joins with N predicates."""
    orders = load_table(spark, sf_dir, "orders")
    pc = cents("o_totalprice")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.sum(F.when(F.col("o_orderstatus") == "F", pc)).alias("cents_f"),
        F.max(F.when(F.col("o_orderstatus") == "O", pc)).alias("max_open"),
        F.avg(
            F.when(F.col("o_orderstatus") == "P", pc).cast("double")
        ).alias("avg_pending_cents"),
    )


ORACLE_FILTERED_AGGS = f"""
SELECT o_orderpriority,
  COUNT(*) AS n_all,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  CAST(SUM({sql_cents('o_totalprice')}) FILTER (WHERE o_orderstatus = 'F')
    AS BIGINT) AS cents_f,
  MAX({sql_cents('o_totalprice')}) FILTER (WHERE o_orderstatus = 'O')
    AS max_open,
  AVG(CAST({sql_cents('o_totalprice')} AS DOUBLE))
    FILTER (WHERE o_orderstatus = 'P') AS avg_pending_cents
FROM orders GROUP BY o_orderpriority
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per order priority (the sketch
    every 100 TB cardinality query uses: constant memory, mergeable
    partials — exact distinct shuffles every key). Rows-only check
    (sketch estimates are engine-specific); relative error vs exact is
    asserted in tests/test_ann_quality.py."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias(
            "approx_custs"
        ),
        F.count("*").alias("n_orders"),
    )


def q_topk_by_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer WITHOUT a window: aggregate with
    collect_list(struct) → array_sort → slice → posexplode. The
    map-side partial collect merges bounded lists, so the shuffle
    carries pre-truncatable state and no per-partition SORT of the
    whole fact is needed — preferable to the window formulation when
    groups are small and the sort dominates. Output identical to
    window_topk (the oracle is the window formulation)."""
    orders = load_table(spark, sf_dir, "orders")
    # sort key coalesces NULL cents to +2^62 so a NULL-price order
    # sorts LAST, matching the oracle's DESC (DuckDB nulls_last) —
    # array_sort otherwise puts NULL struct fields FIRST, promoting
    # poisoned orders into the top-3 (r13 review finding); the real
    # value rides alongside and stays NULL in the output
    neg = -cents("o_totalprice")
    entry = F.struct(
        F.coalesce(neg, F.lit(2 ** 62)).alias("sort_key"),
        F.col("o_orderkey").alias("okey"),
        neg.alias("neg_cents"),
    )
    top = (
        orders.groupBy("o_custkey")
        .agg(
            F.slice(F.array_sort(F.collect_list(entry)), 1, 3).alias("top3")
        )
        .select(
            "o_custkey", F.posexplode("top3").alias("pos0", "e")
        )
        .select(
            "o_custkey",
            F.col("e.okey").alias("o_orderkey"),
            (-F.col("e.neg_cents")).alias("total_cents"),
            (F.col("pos0") + 1).alias("rk"),
        )
    )
    return top


ORACLE_TOPK_BY_AGG = f"""
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         {sql_cents('o_totalprice')} AS total_cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY {sql_cents('o_totalprice')}
                                       DESC NULLS LAST,
                                     o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per segment (Greenwald-Khanna sketch, the
    mergeable constant-memory path — exact percentiles shuffle the full
    value set). Rows-only check (sketch output is engine-specific);
    rank accuracy vs exact quantiles is asserted in
    tests/test_ann_quality.py."""
    customer = load_table(spark, sf_dir, "customer")
    ac = cents("c_acctbal")
    # posexplode the sketch output to (quantile, value) rows: array-typed
    # cells crash the driver's rows-only canonicalizer too (VERDICT r01).
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9))
    return (
        customer.select("c_mktsegment", ac.alias("ac"))
        .groupBy("c_mktsegment")
        .agg(
            F.percentile_approx("ac", [0.25, 0.5, 0.9], 1000).alias(
                "approx_pcts"
            ),
            F.count("*").alias("n"),
        )
        .select(
            "c_mktsegment",
            "n",
            F.posexplode("approx_pcts").alias("pos", "approx_cents"),
        )
        .withColumn("quantile", F.element_at(qs, F.col("pos") + 1))
        .drop("pos")
    )


def q_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic driver gate for the HLL++ sketch: the sketch value
    itself is engine-specific (rows-only on `approx_distinct`), but the
    ERROR CONTRACT is checkable — per group, |approx − exact| must stay
    within 5× the configured rsd (0.02 → 10% slack, far above any
    realized HLL++ error). The exact distinct count and group sizes are
    cross-engine-exact columns, so the oracle hashes them too."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").cast("long").alias("exact_custs"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "exact_custs",
        (
            F.abs(F.col("approx") - F.col("exact_custs"))
            <= 0.1 * F.col("exact_custs")
        ).alias("within_bound"),
    )


ORACLE_APPROX_DISTINCT_CHECK = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       TRUE AS within_bound
FROM orders GROUP BY o_orderpriority
"""


def q_approx_quantiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic driver gate for the GK quantile sketch: per
    (segment, quantile), the returned value's RANK must sit within the
    sketch's guaranteed window |rank − q·n| ≤ n/accuracy (+1 for
    discreteness). Tie-safe formulation: the value's min-rank
    (count of strictly smaller) must not exceed the upper bound and its
    max-rank (count of ≤) must reach the lower bound — a run of equal
    values straddling the target rank is still a correct answer."""
    customer = load_table(spark, sf_dir, "customer")
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9))
    vals = customer.select("c_mktsegment", cents("c_acctbal").alias("ac"))
    approx = (
        vals.groupBy("c_mktsegment")
        .agg(
            F.percentile_approx("ac", [0.25, 0.5, 0.9], 1000).alias("ap"),
            F.count("*").alias("n"),
        )
        .select(
            "c_mktsegment",
            "n",
            F.posexplode("ap").alias("pos", "av"),
        )
        .withColumn("quantile", F.element_at(qs, F.col("pos") + 1))
        .drop("pos")
    )
    ranked = (
        vals.join(F.broadcast(approx), "c_mktsegment")
        .groupBy("c_mktsegment", "quantile", "n")
        .agg(
            F.sum((F.col("ac") < F.col("av")).cast("long")).alias("lt"),
            F.sum((F.col("ac") <= F.col("av")).cast("long")).alias("le"),
        )
    )
    tol = F.col("n") / 1000.0 + 1.0
    target = F.col("quantile") * F.col("n")
    return ranked.select(
        "c_mktsegment",
        "quantile",
        "n",
        (
            (F.col("lt") <= target + tol) & (F.col("le") >= target - tol)
        ).alias("within_bound"),
    )


ORACLE_APPROX_QUANTILES_CHECK = """
SELECT c_mktsegment, q.quantile, COUNT(*) AS n, TRUE AS within_bound
FROM customer
CROSS JOIN (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                   (CAST(0.9 AS DOUBLE))) q(quantile)
GROUP BY 1, 2
"""


def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (Oracle's RATIO_TO_REPORT): each nation's share
    of its region's customer balance, plus its share of the grand
    total — unbounded window sums over the AGGREGATED frame (nation
    cardinality), so the windows sort 25 rows, not the fact table. The
    two shares are single double divisions of exact bigint cents
    (engine-identical)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        customer.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(cents("c_acctbal")).cast("long").alias("bal_cents"))
    )
    w_region = Window.partitionBy("n_regionkey")
    w_all = Window.partitionBy()
    return per_nation.select(
        "n_regionkey",
        "n_name",
        "bal_cents",
        F.sum("bal_cents").over(w_region).cast("long").alias("region_cents"),
        # try_divide: signed balances can cancel a region (or the
        # grand total) to exactly 0 cents — ANSI would raise where the
        # oracle returns NULL (r13 review finding)
        F.try_divide(
            F.col("bal_cents").cast("double"),
            F.sum("bal_cents").over(w_region).cast("double"),
        ).alias("share_of_region"),
        F.try_divide(
            F.col("bal_cents").cast("double"),
            F.sum("bal_cents").over(w_all).cast("double"),
        ).alias("share_of_total"),
    )


ORACLE_RATIO_TO_REPORT = f"""
WITH per_nation AS (
  SELECT n_regionkey, n_name,
         CAST(SUM({sql_cents('c_acctbal')}) AS BIGINT) AS bal_cents
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_regionkey, n_name
)
SELECT n_regionkey, n_name, bal_cents,
  CAST(SUM(bal_cents) OVER (PARTITION BY n_regionkey) AS BIGINT)
    AS region_cents,
  CAST(bal_cents AS DOUBLE)
    / CAST(CAST(SUM(bal_cents) OVER (PARTITION BY n_regionkey) AS BIGINT)
           AS DOUBLE) AS share_of_region,
  CAST(bal_cents AS DOUBLE)
    / CAST(CAST(SUM(bal_cents) OVER () AS BIGINT) AS DOUBLE)
    AS share_of_total
FROM per_nation
"""


QUERIES = {
    "window_funcs": q_window_funcs,
    "ratio_to_report": q_ratio_to_report,
    "approx_distinct": q_approx_distinct,
    "approx_distinct_check": q_approx_distinct_check,
    "approx_quantiles": q_approx_quantiles,
    "approx_quantiles_check": q_approx_quantiles_check,
    "topk_by_aggregation": q_topk_by_aggregation,
    "window_range_frame": q_window_range_frame,
    "window_value_funcs": q_window_value_funcs,
    "cube_agg": q_cube_agg,
    "grouping_sets": q_grouping_sets,
    "pivot_status": q_pivot_status,
    "unpivot_metrics": q_unpivot_metrics,
    "collect_distinct_arrays": q_collect_distinct_arrays,
    "filtered_aggs": q_filtered_aggs,
    "stats_aggs": q_stats_aggs,
    "median_percentile": q_median_percentile,
    "range_join_bands": q_range_join_bands,
}

ORACLES = {
    "window_funcs": ORACLE_WINDOW_FUNCS,
    "ratio_to_report": ORACLE_RATIO_TO_REPORT,
    "window_range_frame": ORACLE_WINDOW_RANGE,
    "window_value_funcs": ORACLE_WINDOW_VALUE_FUNCS,
    "cube_agg": ORACLE_CUBE_AGG,
    "grouping_sets": ORACLE_GROUPING_SETS,
    "pivot_status": ORACLE_PIVOT_STATUS,
    "unpivot_metrics": ORACLE_UNPIVOT_METRICS,
    "collect_distinct_arrays": ORACLE_COLLECT_DISTINCT,
    "filtered_aggs": ORACLE_FILTERED_AGGS,
    "stats_aggs": ORACLE_STATS_AGGS,
    "median_percentile": ORACLE_MEDIAN_PERCENTILE,
    "topk_by_aggregation": ORACLE_TOPK_BY_AGG,
    "range_join_bands": ORACLE_RANGE_JOIN_BANDS,
    # approx_distinct / approx_quantiles: rows-only (sketch values are
    # engine-specific); their *_check twins gate the error contract
    "approx_distinct_check": ORACLE_APPROX_DISTINCT_CHECK,
    "approx_quantiles_check": ORACLE_APPROX_QUANTILES_CHECK,
}
