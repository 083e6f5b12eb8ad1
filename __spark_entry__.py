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


# The round driver evaluates the FIRST 50 registry entries each round.
# This list front-loads (a) the queries whose oracles were fixed this
# round (re-verify the fix) and (b) queries that have never had a driver
# correctness row, rotating per round until every entry has a green row.
# Cumulative driver-verified coverage is tracked in README.md.
_PRIORITY = [
    # round-1 hash-fail / canonicalizer-crash queries, fixed in round 2
    "join_multi", "group_agg", "derived_table", "q3_shipping_priority",
    "q5_local_supplier", "window_funcs", "window_range_frame", "cube_agg",
    "grouping_sets", "unpivot_metrics", "filtered_aggs",
    "median_percentile", "collect_distinct_arrays", "approx_quantiles",
    # never driver-checked in round 1 (62 total; rest rotate to round 3)
    "having_large_orders", "exists_pending_orders",
    "scalar_subquery_above_brand_avg", "full_outer_join", "null_safe_join",
    "cross_join_small", "lateral_explode",
    "q4_order_priority", "q6_forecast_revenue", "q10_returned_items",
    "text_stats", "token_count", "lang_id", "quality_score",
    "doc_fingerprint", "bigram_counts",
    "tfidf_top_terms", "bm25_components",
    "events_window", "events_sessionize", "events_funnel",
    "events_cdc_merge", "events_latest_per_user", "events_json_props",
    "events_asof_purchase", "events_asof_next_purchase",
    "events_asof_tolerance",
    "corpus_pipeline", "skew_salted_join", "dataset_split",
    "embedding_quantize", "seq_packing",
    "profile_orders", "validate_rowcount", "catalog_tables",
    "datetime_funcs",
]


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


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
    return _prioritize(queries), oracles


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
