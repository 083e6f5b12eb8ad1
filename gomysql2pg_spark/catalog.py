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


def _schema_probe_path(path: str) -> str:
    """Resolve a table path to a single parquet file for footer probes.
    A table may be a single file OR a directory of part-files (the
    multi-file layout the bench splitter produces and any real lake
    uses) — pyarrow's read_schema needs a concrete file."""
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if parts:
            return os.path.join(path, parts[0])
    return path


def timestamp_units(path: str) -> dict[str, str]:
    """Physical parquet timestamp unit per column ('s'|'ms'|'us'|'ns').

    The fixtures have changed encoding between rounds (TIMESTAMP(NANOS)
    through round 3, TIMESTAMP(MICROS) from round 4) — the loader must be
    unit-agnostic, like the reference's byte-transparent row pump
    (`cmd/root.go:435-443`)."""
    return {name: unit for name, (unit, _tz) in timestamp_meta(path).items()}


def timestamp_meta(path: str) -> dict[str, tuple[str, str | None]]:
    """Physical parquet timestamp (unit, tz) per column.

    `tz` is None for naive (isAdjustedToUTC=false) columns and a zone
    string (usually 'UTC') for UTC-adjusted ones. Streaming sources pin
    an explicit schema, so they need BOTH facts: the unit decides
    long-vs-timestamp, the tz decides TIMESTAMP vs TIMESTAMP_NTZ."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(_schema_probe_path(path))
    return {
        f.name: (f.type.unit, f.type.tz)
        for f in schema
        if pat.is_timestamp(f.type)
    }


# SCOPE NOTE: load_table / the schema probes below are LOCAL-path-only
# by design (os.path over the driver fixture trees); only the
# driver-side cache keys (`fixture_stat`) are URI-capable, because
# those also key object-store corpora. A URI-capable load path would
# route the probes through pyarrow.fs the way fixture_stat does.
def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; lowercase column names (reference `root.go:327-329`).

    Timestamp handling is unit-agnostic:

    - TIMESTAMP(NANOS) is unreadable by Spark's vectorized reader
      (PARQUET_TYPE_ILLEGAL); read as raw nanos
      (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
      microsecond timestamps — the same ns→us truncation DuckDB applies.
    - TIMESTAMP(MICROS/MILLIS) without UTC adjustment arrives as
      TIMESTAMP_NTZ; cast to TIMESTAMP under the pinned-UTC session
      timezone so `unix_micros` epoch math matches DuckDB's `epoch_us`
      on the same naive values."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    path = os.path.join(sf_dir, f"{name}.parquet")
    units = timestamp_units(path)
    ns_cols = [c for c, u in units.items() if u == "ns"]
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    lowered = [c.lower() for c in df.columns]
    if lowered != df.columns:
        df = df.toDF(*lowered)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or list_tables(sf_dir))}


def fixture_stat(sf_dir: str, table: str):
    """Identity of one fixture table for driver-side caches, read
    through `pyarrow.fs` like every other file the engine plans
    against: (canonical path, ((name, size, mtime_ns), ...)) over the
    file or its shallow listing, or None when the table is missing /
    unstatable. (size, mtime_ns) — not whole-second mtime, not bare
    path — so a fixture rewritten in place within the same second
    still changes the key (the r12/r13 cache-staleness findings), and
    a URI sf_dir keys through the same FileInfo surface instead of
    os.stat (os.path.abspath would mangle 's3://…' into a local
    path)."""
    from pyarrow import fs as pafs

    try:
        if "://" in sf_dir:
            fs, root = pafs.FileSystem.from_uri(sf_dir)
            path = root.rstrip("/") + f"/{table}.parquet"
            ident = sf_dir.rstrip("/") + f"/{table}.parquet"
        else:
            fs = pafs.LocalFileSystem()
            path = os.path.join(sf_dir, f"{table}.parquet")
            ident = os.path.abspath(path)
        info = fs.get_file_info(path)
        if info.type == pafs.FileType.NotFound:
            return None
        entries = [("", info.size or -1, info.mtime_ns or -1)]
        if info.type == pafs.FileType.Directory:
            entries += sorted(
                (i.base_name, i.size or -1, i.mtime_ns or -1)
                for i in fs.get_file_info(pafs.FileSelector(path))
                if i.type == pafs.FileType.File
            )
        return (ident, tuple(entries))
    except (OSError, ValueError):
        # ValueError covers pyarrow ArrowInvalid (e.g. an unrecognized
        # URI scheme) — "unstatable" means CACHE MISS, never a crash
        # (r13 review finding)
        return None
