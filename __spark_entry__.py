"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``gomysql2pg_spark``; this module only
aggregates the per-module registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    """Collect (QUERIES, ORACLES) from every operator module."""
    from gomysql2pg_spark.operators import relational

    modules = [relational]
    for name in (
        "analytic",
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "events",
        "pipeline",
        "ranking",
        "scalar",
        "subqueries",
        "timeseries",
        "tpch",
        "validation",
        "asof",
        "custom",
    ):
        try:
            mod = __import__(
                f"gomysql2pg_spark.operators.{name}", fromlist=[name]
            )
            modules.append(mod)
        except ImportError:
            continue
    try:
        from gomysql2pg_spark.streaming import stream as stream_mod

        modules.append(stream_mod)
    except ImportError:
        pass
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gomysql2pg_spark.operators.relational import q_group_agg

    return q_group_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (where SQL-expressible)."""
    return _registries()[1]
