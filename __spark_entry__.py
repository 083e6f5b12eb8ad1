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
    # --- r9: staleness rotation (the whole window). These 50 are the
    # oldest of the 58 entries whose latest hard driver row is r01/r02
    # — they predate the r04-r06 fixture-encoding churn, so their green
    # rows are the least trustworthy in the record. Oldest first.
    # r01-stale (21 of 21):
    "approx_distinct", "dedup_simhash", "page_fetch_composite",
    "page_limit_offset", "pii_scrub", "pivot_status", "projection",
    "range_join_bands", "rollup_agg", "semi_join", "set_except",
    "set_union_intersect", "similarity_ivf", "similarity_lsh",
    "similarity_norms", "similarity_topk", "stats_aggs",
    "string_funcs", "topk_by_aggregation", "window_topk",
    "window_value_funcs",
    # r02-stale (29 of 37; the remaining 8 — collect_distinct_arrays,
    # corpus_pipeline, dataset_split, embedding_quantize,
    # events_json_props, profile_orders, seq_packing, unpivot_metrics
    # — roll to the r10 window):
    "join_multi", "cube_agg", "grouping_sets", "window_funcs",
    "window_range_frame", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q10_returned_items", "median_percentile",
    "full_outer_join", "null_safe_join", "validate_rowcount",
    "text_stats", "token_count", "quality_score", "lang_id",
    "tfidf_top_terms", "bm25_components", "catalog_tables",
    "derived_table", "having_large_orders",
    "scalar_subquery_above_brand_avg", "exists_pending_orders",
    "skew_salted_join", "lateral_explode", "datetime_funcs",
    "filtered_aggs", "cross_join_small",
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
        "clustering",
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
        "sampling",
        "quality",
        "linkage",
        "frequency",
        "layout",
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
