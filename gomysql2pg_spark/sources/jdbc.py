"""Partitioned JDBC source (reference A1/A3/A4/A20,
`cmd/root.go:218-386`, `cmd/app.go:36-81`).

The reference hand-rolls: catalog discovery, PK-paged parallel cursors,
a `where 1=0` schema probe, and a capped connection pool. Spark's JDBC
relation gives each of these natively; this module maps the reference's
config surface (example.yml) onto the right reader options and adds the
piece Spark lacks — predicate generation for composite / non-numeric
PKs (plans.pagination).

No database is reachable in the test environment; everything here is
pure plan/option construction (unit-tested), with `read()` executing
only when a driver+URL is actually supplied.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..plans.pagination import PagePlan
from ..functions.transforms import lowercase_columns


@dataclass
class JdbcSourceConfig:
    """Source connection config (example.yml `src:` + perf knobs)."""

    url: str  # jdbc:mysql://host:port/db
    user: str = ""
    password: str = ""
    driver: str = "com.mysql.cj.jdbc.Driver"
    fetch_size: int = 10_000  # streams rows like the ref's cursor loop
    max_parallel: int = 20  # reference maxParallel (root.go:107-109)
    session_init: str | None = None  # e.g. the /* gomysql2pg */ tag vehicle
    extra: dict = field(default_factory=dict)


def reader_options(
    cfg: JdbcSourceConfig,
    dbtable: str | None = None,
    query: str | None = None,
) -> dict:
    """Base option dict for spark.read.format('jdbc'). `query=` performs
    the reference's `where 1=0` schema probe internally (A4) — no manual
    probe needed."""
    opts = {
        "url": cfg.url,
        "user": cfg.user,
        "password": cfg.password,
        "driver": cfg.driver,
        "fetchsize": str(cfg.fetch_size),
        # MySQL streams results only with useCursorFetch
        "useCursorFetch": "true",
    }
    if cfg.session_init:
        opts["sessionInitStatement"] = cfg.session_init
    if query is not None:
        opts["query"] = query
    elif dbtable is not None:
        opts["dbtable"] = dbtable
    opts.update(cfg.extra)
    return opts


def partitioned_reader_options(
    cfg: JdbcSourceConfig,
    table: str,
    pk: str,
    lower: int,
    upper: int,
    num_partitions: int | None = None,
) -> dict:
    """Numeric-PK partitioned read — the built-in fast path. Partition
    count is capped at max_parallel, which also caps concurrent source
    connections exactly like the reference's semaphore (A17)."""
    n = min(num_partitions or cfg.max_parallel, cfg.max_parallel)
    return {
        **reader_options(cfg, dbtable=table),
        "partitionColumn": pk,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(n),
    }




def read(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    table: str | None = None,
    query: str | None = None,
    plan: PagePlan | None = None,
) -> DataFrame:
    """Execute the read. With a PagePlan, one JDBC partition per
    predicate (the composite/non-numeric-PK path — each page SQL runs
    server-side, mirroring `runMigration`'s page cursors). Column names
    are lowercased (reference `root.go:327-329`)."""
    if plan is not None and plan.predicates and plan.strategy != "full":
        # EVERY predicate: the plan is a disjoint+complete partition of
        # the table, so dropping any (the old max_parallel*50 cap)
        # silently loses whole pages of rows — Spark schedules excess
        # partitions fine, max_parallel only bounds CONCURRENT JDBC
        # sessions via executor slots (r13 review finding). The props
        # ride through reader_options so useCursorFetch /
        # sessionInitStatement / cfg.extra apply to paged reads exactly
        # like unpaged ones (MySQL without cursor fetch buffers each
        # full page in executor memory).
        props = {
            k: v
            for k, v in reader_options(cfg).items()
            if k not in ("url", "dbtable", "query", "numPartitions",
                         "partitionColumn", "lowerBound", "upperBound")
        }
        return lowercase_columns(
            spark.read.jdbc(
                cfg.url,
                table or plan.table,
                predicates=plan.predicates,
                properties=props,
            )
        )
    reader = spark.read.format("jdbc")
    for k, v in reader_options(cfg, dbtable=table, query=query).items():
        reader = reader.option(k, v)
    return lowercase_columns(reader.load())


# catalog discovery (A1): the information_schema query the reference
# issues (`root.go:229`), with exclusion patterns appended (A2)
def catalog_query(exclude_sql: str = "") -> str:
    return (
        "select table_name from information_schema.tables "
        "where table_schema = database() and table_type = 'BASE TABLE' "
        + exclude_sql
    )
