"""Partitioned-scan planning (reference A3, `cmd/root.go:335-386`).

The reference splits each table into `ceil(count/pageSize)` PK-ordered
`LIMIT offset,n` pages and runs one goroutine per page. The Spark-native
equivalents, in preference order:

1. **Numeric PK → value-range predicates** (what Spark's JDBC
   partitionColumn does): `pk >= lo AND pk < hi` strides. Unlike
   LIMIT/OFFSET pages, each range scans only its slice via the PK index
   on the source — O(1) per page instead of O(offset).
2. **Composite / non-numeric PK → hash-mod predicates**: disjoint +
   complete bucketing by a deterministic hash of the key columns —
   `mod(hash, n) = i` for i in 0..n-1.
3. **No PK → single full-scan page** (`root.go:355-359`).

Plus `global_row_number`: the scalable (no single-partition window)
formulation of the reference's offset semantics for in-engine data:
range-repartition → per-partition row_number → + broadcast partition
offsets. Used where true OFFSET semantics are required; page contents
are deterministic as multisets (ties may land either side of a
partition boundary but carry equal key values).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PagePlan:
    """One partitioned-scan plan: a list of disjoint, complete SQL
    predicates (one per page/partition) — consumable both by
    `spark.read.jdbc(predicates=...)` and by `df.filter(expr(p))`."""

    table: str
    predicates: list[str] = field(default_factory=list)
    page_count: int = 1
    strategy: str = "full"  # 'range' | 'hashmod' | 'full'


def page_count(total_rows: int, page_size: int) -> int:
    """`ceil(count(*)/pageSize)` (`root.go:373-375`)."""
    return max(1, math.ceil(total_rows / page_size))


def numeric_range_predicates(
    pk: str, lo: int, hi: int, num_pages: int
) -> list[str]:
    """Disjoint, complete value-range strides over [lo, hi]. First/last
    ranges are unbounded so rows outside the sampled min/max (concurrent
    inserts) are still captured — same hardening Spark's JDBC
    partitioning applies."""
    if num_pages <= 1 or hi <= lo:
        return ["1=1"]
    stride = max(1, math.ceil((hi - lo + 1) / num_pages))
    preds = []
    for i in range(num_pages):
        a, b = lo + i * stride, lo + (i + 1) * stride
        if i == 0:
            preds.append(f"{pk} < {b}")
        elif i == num_pages - 1:
            preds.append(f"{pk} >= {a}")
        else:
            preds.append(f"{pk} >= {a} AND {pk} < {b}")
    return preds


def hashmod_predicates(
    pk_cols: list[str],
    num_pages: int,
    hash_sql: str | None = None,
    # sign-normalized residue: SQL `%` follows the DIVIDEND's sign
    # (MySQL/Spark/PG alike), so a dialect-supplied hash_sql without
    # ABS would put negative hashes in NO bucket — silent row loss the
    # completeness claim forbids (r13 review finding); the +n %n wrap
    # is a no-op for the non-negative default crc32
    bucket_sql: str = "((({h}) % {n}) + {n}) % {n} = {i}",
) -> list[str]:
    """Disjoint + complete buckets for composite / non-numeric keys.

    `hash_sql` is a dialect template receiving the concatenated key; the
    default uses crc32(concat_ws(...)) which exists on MySQL (the
    reference's source dialect) and in Spark SQL — so the same predicate
    text works against both. `bucket_sql` is the residue-class
    template ({h}=hash expression, {n}=page count, {i}=page index):
    the `%` operator default covers MySQL/PG/Spark; Derby and
    Oracle have no `%` operator and need ``MOD({h}, {n}) = {i}``
    (the r9 Derby dialect matrix caught exactly this).

    Completeness: every NON-NULL key hashes to exactly one residue
    class. The IS-NULL arm on page 0 guards the hash expression
    itself going NULL — which can only happen with a dialect-supplied
    `hash_sql` whose arithmetic propagates NULL (e.g. the Derby
    ``ABS(a*31+b)`` template over a nullable column); the default
    ``crc32(concat_ws(...))`` never yields NULL because concat_ws
    skips NULL arguments in both MySQL and Spark. The arm is a no-op
    for the default path and the row-loss guard for custom ones."""
    if num_pages <= 1:
        return ["1=1"]
    key = "concat_ws('', " + ", ".join(pk_cols) + ")"
    h = hash_sql.format(key=key) if hash_sql else f"crc32({key})"
    preds = [
        bucket_sql.format(h=h, n=num_pages, i=i) for i in range(num_pages)
    ]
    preds[0] = f"({preds[0]}) OR ({h}) IS NULL"
    return preds


def plan_pages(
    table: str,
    total_rows: int,
    page_size: int,
    pk_cols: list[str],
    pk_numeric: bool,
    pk_min: int | None = None,
    pk_max: int | None = None,
) -> PagePlan:
    """The `prepareSqlStr` decision tree (`root.go:335-386`):
    no PK → one full page; numeric single PK → range strides;
    composite/non-numeric → hash-mod buckets."""
    n = page_count(total_rows, page_size)
    if not pk_cols:
        return PagePlan(table, ["1=1"], 1, "full")
    if pk_numeric and len(pk_cols) == 1 and pk_min is not None and pk_max is not None:
        preds = numeric_range_predicates(pk_cols[0], pk_min, pk_max, n)
        return PagePlan(table, preds, len(preds), "range")
    preds = hashmod_predicates(pk_cols, n)
    return PagePlan(table, preds, len(preds), "hashmod")


def apply_pages(df: DataFrame, plan: PagePlan) -> list[DataFrame]:
    """Materialize a plan against an in-engine DataFrame (tests use this
    to prove disjointness/completeness; the JDBC path hands
    plan.predicates to the source instead)."""
    return [df.filter(F.expr(p)) for p in plan.predicates]


# ---------------------------------------------------------------------------
# scalable global row numbering (OFFSET semantics without 1-partition sort)
# ---------------------------------------------------------------------------


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row numbers in `order_cols` order without moving
    all rows to one partition: range-repartition on the sort keys,
    per-partition row_number, then add broadcast per-partition offsets
    (computed from a tiny count-per-partition aggregate). Two narrow
    passes; the only global structure shipped is one row per partition."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(n, *cols)
    part = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = part.withColumn("_lrn", F.row_number().over(w))
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    wo = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(wo), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rn_col, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrn")
    )


def fetch_page(
    df: DataFrame,
    order_cols: list[str],
    page_no: int,
    page_size: int,
) -> DataFrame:
    """OFFSET-page fetch via global_row_number — the reference's
    `LIMIT o,n` + join-back trick (`root.go:382`) without the join OR
    the single-partition sort."""
    rn = global_row_number(df, order_cols)
    lo, hi = page_no * page_size, (page_no + 1) * page_size
    return rn.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop("rn")
