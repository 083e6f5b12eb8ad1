"""PostgreSQL COPY-text as a first-class Spark data source.

The reference's entire data plane speaks COPY text: every page it moves
is encoded to this wire format and streamed through `pq.CopyIn`
(`/root/reference/cmd/root.go:412-489`). Here that format becomes a
real Spark SOURCE via the PySpark 4 Python DataSource API — so a COPY
dump (from the reference, from `pg_dump`, or from this repo's
distributed encoder in `sinks.jdbc.copy_text_line`) is directly
queryable, one scan task per file.

Grammar (the strict server-side rules, proven against a live
PostgreSQL 15 in tests/test_postgres_live.py): rows are LF-terminated,
cells TAB-separated; `\\N` (backslash-N) is NULL; data backslash, tab,
newline, CR are escaped as `\\\\`, `\\t`, `\\n`, `\\r`; an unknown
escape or dangling backslash is a corrupt file and fails loudly.

The DataSource class is built inside a FACTORY and registered from the
returned value, so cloudpickle ships it BY VALUE — Python workers in a
bare-PYTHONPATH deployment (e.g. the round driver's gate) never need
this package importable to run the scan.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def make_copytext_source():
    """Return a self-contained (pickle-by-value) DataSource class for
    `spark.dataSource.register(...)`."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    def decode_cell(cell: str):
        if cell == "\\N":
            return None
        out, i = [], 0
        while i < len(cell):
            ch = cell[i]
            if ch == "\\":
                i += 1
                if i >= len(cell):
                    raise ValueError("corrupt COPY text: dangling backslash")
                esc = cell[i]
                try:
                    out.append(
                        {"\\": "\\", "t": "\t", "n": "\n", "r": "\r"}[esc]
                    )
                except KeyError:
                    raise ValueError(
                        f"corrupt COPY text: unknown escape \\{esc}"
                    ) from None
            else:
                out.append(ch)
            i += 1
        return "".join(out)

    def caster_for(dt):
        import datetime
        import decimal

        from pyspark.sql import types as T

        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType,
                           T.ByteType)):
            return int
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return float
        if isinstance(dt, T.DecimalType):
            return decimal.Decimal
        if isinstance(dt, T.BooleanType):
            return lambda s: {
                "t": True, "true": True, "1": True,
                "f": False, "false": False, "0": False,
            }[s.lower()]
        if isinstance(dt, T.DateType):
            return datetime.date.fromisoformat
        if isinstance(dt, T.TimestampType) or isinstance(
            dt, T.TimestampNTZType
        ):
            return datetime.datetime.fromisoformat
        if isinstance(dt, T.StringType):
            return lambda s: s
        raise TypeError(f"copytext: unsupported column type {dt}")

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class CopyTextReader(DataSourceReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._path = options.get("path")
            if not self._path:
                raise ValueError("copytext: .load(path) is required")

        def partitions(self):
            p = self._path
            if os.path.isfile(p):
                files = [p]
            else:
                files = sorted(
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if not f.startswith(("_", "."))
                    and os.path.isfile(os.path.join(p, f))
                )
            return [_FilePartition(f) for f in files]

        def read(self, partition):
            casters = [caster_for(f.dataType) for f in self._schema.fields]
            n = len(casters)
            with open(partition.path, encoding="utf-8", newline="\n") as fh:
                for line in fh:
                    if line.endswith("\n"):
                        line = line[:-1]
                    elif line == "":
                        continue
                    cells = line.split("\t")
                    if len(cells) != n:
                        raise ValueError(
                            f"corrupt COPY text: {len(cells)} cells, "
                            f"schema has {n}"
                        )
                    yield tuple(
                        None if (d := decode_cell(c)) is None else k(d)
                        for c, k in zip(cells, casters)
                    )

    class CopyTextDataSource(DataSource):
        """COPY-text reader; schema must be supplied by the caller
        (the wire format carries no header)."""

        @classmethod
        def name(cls):
            return "copytext"

        def schema(self):
            raise ValueError(
                "copytext: the COPY wire format has no header — supply "
                "the schema with spark.read.format('copytext')"
                ".schema(...)"
            )

        def reader(self, schema):
            return CopyTextReader(schema, self.options)

    return CopyTextDataSource


def register_copytext(spark: SparkSession) -> None:
    """Idempotent registration of the `copytext` format."""
    spark.dataSource.register(make_copytext_source())


_RT_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_totalprice",
    "o_orderdate",
)
_RT_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_orderpriority string, o_totalprice double, o_orderdate date"
)


def q_copytext_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → distributed COPY-text encode (`sinks.jdbc.
    copy_text_line`, pure Column expressions — the JVM writes the wire
    bytes, nothing is collected) → `.write.text` → read back through
    the `copytext` Python data source. The result must hash-equal a
    plain SELECT of the same columns: an encode/decode disagreement
    anywhere in the escape grammar, numeric/date formatting, or file
    splitting shows up as a value mismatch. Doubles survive because
    both directions use shortest-round-trip representations (the VALUE
    is compared, not the string). The encoded tree is cached per
    source-fixture mtime under /tmp, so reps measure the scan, not the
    rewrite."""
    from ..sinks.jdbc import copy_text_line

    src = os.path.join(sf_dir, "orders.parquet")
    # the key covers the ENCODER RECIPE version too (same lesson as
    # the scale-smoke corpus cache): editing the wire format must not
    # silently reuse a tree written by the old encoder
    key = hashlib.md5(
        repr((os.path.abspath(src), int(os.path.getmtime(src)),
              _RT_COLS, "wire-v1")).encode()
    ).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(), f"spark_graft_copytext_{key}"
    )
    done = os.path.isdir(out) and any(
        not f.startswith(("_", ".")) for f in os.listdir(out)
    )
    if not done:
        orders = load_table(spark, sf_dir, "orders")
        cols = [
            # the fixture's o_orderdate is a timestamp; the entry
            # exercises the DATE wire form ('YYYY-MM-DD'), so cast at
            # the source (mirrored in the oracle)
            F.col(c).cast("date") if c == "o_orderdate" else F.col(c)
            for c in _RT_COLS
        ]
        (
            orders.select(copy_text_line(cols).alias("value"))
            .write.mode("overwrite")
            .text(out)
        )
    register_copytext(spark)
    return spark.read.format("copytext").schema(_RT_SCHEMA).load(out)


ORACLE_COPYTEXT_ROUNDTRIP = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
       o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
FROM orders
"""


QUERIES = {
    "copytext_roundtrip": q_copytext_roundtrip,
}

ORACLES = {
    "copytext_roundtrip": ORACLE_COPYTEXT_ROUNDTRIP,
}
