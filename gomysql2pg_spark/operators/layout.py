"""Data-layout operators: z-order clustering + interval joins
(SURVEY.md §2.I, round 7).

The reference writes rows in whatever order the MySQL cursor yields
them (`cmd/root.go:389-516`) — fine for a one-shot migration, fatal
for a 100 TB lakehouse where scan pruning IS the query optimizer's
biggest lever. This module adds the layout toolkit:

- `zorder_layout`: the multi-dimensional clustering key (bit-
  interleaved z-value over min-max-scaled dimensions) plus the
  per-z-bucket min/max envelope that data skipping would use. Writing
  files ordered by this key (``df.repartitionByRange(N, "z").
  sortWithinPartitions("z").write``, see docstring) gives every file
  a narrow rectangle in BOTH dimensions, so a predicate on EITHER
  column prunes ~√selectivity of the files — the property a
  single-column sort cannot give. The query output is that envelope
  table, which makes the clustering quality itself oracle-checkable.
- `interval_overlap_join`: the scalable band-join pattern. A direct
  overlap join (lo <= b.hi AND hi >= b.lo) has no equi-key and
  degenerates to a broadcast-nested-loop; instead each interval is
  EXPLODED onto the fixed time grid it covers (quarters here) and the
  join becomes a plain equi-join on the grid cell. Fan-out per row =
  interval length / cell width (bounded; ship spans are weeks), and
  each (interval, cell) lands exactly once so no dedup pass is
  needed.

All arithmetic is integer or single-division float on integer-exact
operands, so every published value is cross-engine stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: bits per dimension in the z-value (8 ⇒ 256×256 grid, 16-bit z)
Z_BITS = 8

#: z-buckets published in the envelope table: z >> Z_SHIFT ⇒ 256
Z_SHIFT = 8

def _interleave_expr(bx: str, by: str, div: str) -> str:
    """Bit-interleave via pure integer arithmetic — (x div 2^i) % 2
    picks bit i — so the SAME formula (modulo the integer-division
    token: Spark ``DIV``, DuckDB ``//``) runs on both engines without
    relying on shift-operator availability. bx contributes the odd
    (high) bit lanes, by the even ones."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({bx} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({by} {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket file-skipping envelope over lineitem clustered on
    (l_partkey, l_suppkey): each dimension is min-max scaled to
    Z_BITS bits (scale bounds from ONE broadcast two-column
    aggregate), bit-interleaved into z, and bucketed by the top bits.
    The output row per bucket — row count plus the min/max of both
    raw dimensions — is exactly the footer-stats envelope a reader
    would prune with; narrow envelopes in both columns are the
    z-order win. The write path is
    ``lineitem.withColumn("z", …).repartitionByRange(n_files, "z")
    .sortWithinPartitions("z").write.parquet(...)`` — stats-identical
    to this bucketing, no extra shuffle beyond the range partition."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").alias("pk_lo"),
        F.max("l_partkey").alias("pk_hi"),
        F.min("l_suppkey").alias("sk_lo"),
        F.max("l_suppkey").alias("sk_hi"),
    )
    scale = 1 << Z_BITS
    scaled = (
        li.select("l_partkey", "l_suppkey")
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "bx",
            F.floor(
                (F.col("l_partkey") - F.col("pk_lo"))
                * F.lit(float(scale))
                / (F.col("pk_hi") - F.col("pk_lo") + F.lit(1))
            ).cast("int"),
        )
        .withColumn(
            "by",
            F.floor(
                (F.col("l_suppkey") - F.col("sk_lo"))
                * F.lit(float(scale))
                / (F.col("sk_hi") - F.col("sk_lo") + F.lit(1))
            ).cast("int"),
        )
    )
    z = F.expr(_interleave_expr("bx", "by", "DIV"))
    return (
        scaled.withColumn("z", z)
        .withColumn("z_bucket", F.expr(f"z DIV {1 << Z_SHIFT}"))
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
        )
    )


ORACLE_ZORDER_LAYOUT = f"""
WITH bounds AS (
  SELECT MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
         MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
  FROM lineitem
),
scaled AS (
  SELECT l_partkey, l_suppkey,
    CAST(FLOOR((l_partkey - pk_lo) * {1 << Z_BITS}.0
               / (pk_hi - pk_lo + 1)) AS INTEGER) AS bx,
    CAST(FLOOR((l_suppkey - sk_lo) * {1 << Z_BITS}.0
               / (sk_hi - sk_lo + 1)) AS INTEGER) AS by
  FROM lineitem CROSS JOIN bounds
),
zed AS (
  SELECT l_partkey, l_suppkey,
         ({_interleave_expr("bx", "by", "//")}) AS z
  FROM scaled
)
SELECT z // {1 << Z_SHIFT} AS z_bucket, COUNT(*) AS n_rows,
       MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
FROM zed GROUP BY 1
"""


def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-in-flight per calendar quarter: collapse lineitem to
    per-order ship spans [min ship, max ship], explode each span onto
    the quarters it touches (``sequence`` over quarter-truncated
    endpoints — each overlapped quarter appears exactly once, so the
    grid join needs no post-filter or dedup), and count spans per
    quarter. Equivalent to the non-equi overlap join against a
    quarter calendar, but executes as explode + hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    spans = li.groupBy("l_orderkey").agg(
        F.to_date(F.min("l_shipdate")).alias("lo"),
        F.to_date(F.max("l_shipdate")).alias("hi"),
    )
    return (
        spans.withColumn(
            "quarter",
            F.explode(
                F.sequence(
                    F.trunc("lo", "quarter"),
                    F.trunc("hi", "quarter"),
                    F.expr("INTERVAL 3 MONTHS"),
                )
            ),
        )
        .groupBy("quarter")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("lo").alias("first_start"),
            F.max("hi").alias("last_end"),
        )
    )


ORACLE_INTERVAL_OVERLAP_JOIN = """
WITH spans AS (
  SELECT l_orderkey, CAST(MIN(l_shipdate) AS DATE) AS lo,
         CAST(MAX(l_shipdate) AS DATE) AS hi
  FROM lineitem GROUP BY 1
),
qgrid AS (
  SELECT CAST(q AS DATE) AS quarter
  FROM generate_series(DATE '1990-01-01', DATE '2010-10-01',
                       INTERVAL 3 MONTH) t(q)
)
SELECT g.quarter AS quarter, COUNT(*) AS n_orders,
       MIN(s.lo) AS first_start, MAX(s.hi) AS last_end
FROM spans s JOIN qgrid g
  ON s.lo < g.quarter + INTERVAL 3 MONTH AND s.hi >= g.quarter
GROUP BY 1
"""


QUERIES = {
    "zorder_layout": q_zorder_layout,
    "interval_overlap_join": q_interval_overlap_join,
}

ORACLES = {
    "zorder_layout": ORACLE_ZORDER_LAYOUT,
    "interval_overlap_join": ORACLE_INTERVAL_OVERLAP_JOIN,
}
