"""Catalog: table discovery + loading (reference A1/A2, `cmd/root.go:218-291`).

The reference discovers tables from MySQL `information_schema.tables`
and applies `*`-wildcard exclusion patterns. Here the "catalog" is a
directory of parquet tables; the same discovery/exclusion semantics
apply (`exclude_tables`), and column names are lowercased exactly as the
reference lowercases them at scan time (`cmd/root.go:327-329`).
"""

from __future__ import annotations

import os
from fnmatch import fnmatch

from pyspark.sql import DataFrame, SparkSession

#: The star-schema fixture tables (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def excluded(name: str, patterns: list[str] | None) -> bool:
    """`exclude:` semantics of `cmd/root.go:227-247`: `*` wildcard, ANDed
    NOT LIKE — i.e. a table is dropped if it matches ANY pattern."""
    return any(fnmatch(name, p) for p in patterns or [])


def list_tables(sf_dir: str, exclude: list[str] | None = None) -> list[str]:
    names = [
        f[: -len(".parquet")]
        for f in sorted(os.listdir(sf_dir))
        if f.endswith(".parquet")
    ]
    return [n for n in names if not excluded(n, exclude)]


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark refuses to
    read natively (PARQUET_TYPE_ILLEGAL)."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; lowercase column names (reference `root.go:327-329`).

    Parquet TIMESTAMP(NANOS) columns (the `events.ts` fixture) are
    unreadable by Spark's vectorized reader; we read them as raw nanos
    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microsecond
    timestamps with integer division — the same ns→us truncation DuckDB
    applies, so values agree across engines."""
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    lowered = [c.lower() for c in df.columns]
    if lowered != df.columns:
        df = df.toDF(*lowered)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or list_tables(sf_dir))}
