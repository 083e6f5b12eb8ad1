"""JDBC / COPY sinks (reference A5/A6, `cmd/root.go:389-516`).

The reference streams each page through PostgreSQL's COPY protocol with
one transaction per page. Spark's JDBC sink batches INSERTs; for parity:

- `writer_options` sets truncate-overwrite (A5, `root.go:297-302`) and
  batched writes sized like the reference's page flush.
- `copy_partition_writer` is the true-COPY path: a foreachPartition
  function using psycopg's copy_expert, one transaction per partition —
  the exact failure-isolation unit the reference uses (one bad page
  rolls back only itself, `root.go:489-504`). psycopg is not installed
  here, so the writer is built lazily and gated behind an import-try;
  the CSV-encoding half is pure and unit-tested.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field


@dataclass
class JdbcSinkConfig:
    url: str  # jdbc:postgresql://host:port/db
    user: str = ""
    password: str = ""
    driver: str = "org.postgresql.Driver"
    batch_size: int = 10_000
    truncate: bool = True  # A5: truncate-before-load, not drop
    extra: dict = field(default_factory=dict)


# dbType → (JDBC driver class, URL template) — the reference switches
# the Go driver on `dest.dbType` (`cmd/app.go:59-81`: GAUSS → the
# openGauss connector, default → lib/pq) and documents the PG-compatible
# family (postgres/gauss/vastbase/kingbase) in readme.md. vastbase is
# wire-compatible with PG; kingbase ships its own JDBC driver.
DIALECTS: dict[str, tuple[str, str]] = {
    "postgres": (
        "org.postgresql.Driver",
        "jdbc:postgresql://{host}:{port}/{database}",
    ),
    "gauss": (
        "org.opengauss.Driver",
        "jdbc:opengauss://{host}:{port}/{database}",
    ),
    "vastbase": (
        "org.postgresql.Driver",
        "jdbc:postgresql://{host}:{port}/{database}",
    ),
    "kingbase": (
        "com.kingbase8.Driver",
        "jdbc:kingbase8://{host}:{port}/{database}",
    ),
}


def sink_config_for(
    dbtype: str,
    host: str,
    port: int,
    database: str,
    user: str = "",
    password: str = "",
    **kwargs,
) -> JdbcSinkConfig:
    """Build a JdbcSinkConfig from a dest block + dbType (`cmd/
    app.go:59-81`). Unknown/empty dbType falls back to postgres, like
    the reference's default branch."""
    driver, url_tpl = DIALECTS.get(
        (dbtype or "postgres").lower(), DIALECTS["postgres"]
    )
    return JdbcSinkConfig(
        url=url_tpl.format(host=host, port=port, database=database),
        user=user,
        password=password,
        driver=driver,
        **kwargs,
    )


def writer_options(cfg: JdbcSinkConfig, table: str) -> dict:
    """Options for df.write.format('jdbc').mode('overwrite'|'append').
    truncate=true + overwrite reproduces preMigData's truncate
    (`root.go:297-302`) without losing the target DDL."""
    opts = {
        "url": cfg.url,
        "user": cfg.user,
        "password": cfg.password,
        "driver": cfg.driver,
        "dbtable": table,
        "batchsize": str(cfg.batch_size),
        "truncate": "true" if cfg.truncate else "false",
        # PG-family fast batched inserts
        "reWriteBatchedInserts": "true",
    }
    opts.update(cfg.extra)
    return opts


def write(df, cfg: JdbcSinkConfig, table: str, mode: str = "overwrite"):
    writer = df.write.format("jdbc").mode(mode)
    for k, v in writer_options(cfg, table).items():
        writer = writer.option(k, v)
    writer.save()


# ---------------------------------------------------------------------------
# COPY-protocol sink (the reference's actual load path, `root.go:412-489`)
# ---------------------------------------------------------------------------


def encode_copy_text(rows, null_marker: str = "\\N") -> str:
    """Encode rows into PostgreSQL COPY text format — the same wire
    format pq.CopyIn produces. Tab-separated, escaped, NULL → \\N;
    bytes values take PG's bytea hex input form (`\\x` + lowercase
    hex, the same encoding lib/pq uses for []byte) BEFORE escaping,
    so the leading backslash doubles on the wire. Pure function
    (unit-tested without a database)."""
    buf = io.StringIO()
    for row in rows:
        cells = []
        for v in row:
            if v is None:
                cells.append(null_marker)
                continue
            if isinstance(v, (bytes, bytearray)):
                s = "\\x" + bytes(v).hex()
            else:
                s = str(v)
            s = (
                s.replace("\\", "\\\\")
                .replace("\t", "\\t")
                .replace("\n", "\\n")
                .replace("\r", "\\r")
            )
            cells.append(s)
        buf.write("\t".join(cells))
        buf.write("\n")
    return buf.getvalue()


def copy_text_line(cols, types=None) -> "object":
    """One COPY-text wire LINE per row, as a pure Column expression —
    the DISTRIBUTED twin of `encode_copy_text`: the JVM formats and
    escapes inside whole-stage codegen, so `df.select(copy_text_line(
    [...]).alias("value")).write.text(path)` produces a COPY dump with
    no Python in the hot path and no driver-side collection. Same
    grammar as the Python encoder (backslash first, then tab/LF/CR;
    NULL → `\\N`), proven against a live PostgreSQL COPY decoder in
    tests/test_postgres_live.py. Values are formatted by Spark's
    string cast — longs/strings/dates identical to `str(v)`; doubles
    use a shortest-round-trip form whose VALUE parses back exactly.

    `types` (optional, parallel to `cols`: the Spark DataTypes, e.g.
    `[f.dataType for f in df.schema.fields]`) routes BinaryType
    columns through PG's bytea hex input form — `\\x` + lowercase
    hex, still JVM-side (`hex()` is codegen) — instead of Spark's
    cast(binary as string), which would reinterpret raw bytes as
    UTF-8 and corrupt the staged data (the reference ships RawBytes
    through pq.CopyIn, which hex-encodes the same way;
    `cmd/root.go:412-489`). A bare Column carries no type, so without
    `types` binary data CANNOT be detected — callers with blob
    columns must pass `types` (copy_dump_sink derives it from the
    DataFrame schema automatically).

    The row terminator comes from the text writer (one line per row),
    matching `encode_copy_text`'s trailing newline."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cells = []
    for i, c in enumerate(cols):
        dt = types[i] if types is not None else None
        if isinstance(dt, T.BinaryType):
            s = F.concat(F.lit("\\x"), F.lower(F.hex(c)))
        else:
            s = c.cast("string")
        for find, repl in (
            ("\\", "\\\\"),
            ("\t", "\\t"),
            ("\n", "\\n"),
            ("\r", "\\r"),
        ):
            s = F.replace(s, F.lit(find), F.lit(repl))
        cells.append(F.coalesce(s, F.lit("\\N")))
    return F.concat_ws("\t", *cells)


def copy_dump_sink(out_dir: str, n_files: int | None = None):
    """`sink_fn` factory for `migrate.MigrationRunner`: stage each
    table as a COPY-text dump tree (one directory per table, one wire
    file per partition, written by `copy_text_line` — all JVM-side).
    The bulk-load path the reference's wire format implies: the dump
    loads with `psql -c '\\copy t FROM part-file'` per file (proven
    against live PostgreSQL in tests/test_postgres_live.py) or reads
    straight back through the `copytext` Spark source. Unlike
    `copy_partition_writer` this needs no driver library on the
    executors, and unlike the JDBC batched sink the load side can be
    parallelized/retried per file AFTER the Spark job is done — the
    staging pattern big migrations actually use."""
    import os as _os

    from pyspark.sql import functions as F

    def sink(df, table: str) -> None:
        out = df.select(
            copy_text_line(
                [F.col(c) for c in df.columns],
                types=[f.dataType for f in df.schema.fields],
            ).alias("value")
        )
        if n_files:
            out = out.repartition(n_files)
        out.write.mode("overwrite").text(_os.path.join(out_dir, table))

    return sink


def copy_partition_writer(
    dsn: str, table: str, columns: list[str], batch_rows: int = 50_000
):
    """Build a foreachPartition function performing COPY with one
    transaction per partition (the reference's page-level txn isolation,
    `root.go:408-504`). Returned as a closure so cloudpickle ships it by
    value; psycopg resolves on the executor (import-gated)."""

    col_list = ", ".join(f'"{c}"' for c in columns)
    sql = f'COPY "{table}" ({col_list}) FROM STDIN'

    def write_partition(rows_iter):
        try:
            import psycopg2  # noqa: F401 — optional, absent in this env
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "COPY sink requires psycopg2 on executors; use the JDBC "
                "batched sink instead"
            ) from exc
        conn = psycopg2.connect(dsn)
        try:
            cur = conn.cursor()
            batch = []
            for row in rows_iter:
                batch.append(tuple(row))
                if len(batch) >= batch_rows:
                    cur.copy_expert(sql, io.StringIO(encode_copy_text(batch)))
                    batch.clear()
            if batch:
                cur.copy_expert(sql, io.StringIO(encode_copy_text(batch)))
            conn.commit()  # one txn per partition == per page
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return write_partition
