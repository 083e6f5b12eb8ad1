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
    # --- round-2 additions, never driver-checked (16) ---
    "q7_volume_shipping", "q8_market_share", "q13_custdist",
    "q14_promo_revenue", "q15_top_supplier", "q17_small_qty_revenue",
    "q19_disjunctive", "q22_dormant_customers",
    "repetition_filter", "stratified_sample",
    "dedup_substring_chunks", "decontamination_check", "incremental_dedup",
    "ratio_to_report", "ts_ohlc", "scd2_intervals",
    # --- upgraded from rows-only: recursive-CTE oracle added r2 ---
    "dedup_clusters",
    # --- round-1 tail, never driver-checked (26) ---
    "mm_metadata", "mm_decode", "mm_frame_sample", "mm_resize",
    "mm_features",
    "stream_windowed_counts", "stream_sliding_windows",
    "stream_session_windows", "stream_stream_join", "stream_dedup",
    "stream_dedup_then_window", "stream_stateful_totals",
    "map_funcs", "regex_funcs", "math_funcs", "array_funcs",
    "sequence_semantics", "random_ids",
    "ts_gapfill_ffill", "string_distance", "validate_content_hash",
    "cell_transforms", "typemap_matrix", "pandas_udaf_wavg",
    "events_ema", "skew_salted_agg",
    # --- re-verify: code changed since last green row (r3 short-doc
    # fixes, r2 df cap, r3 embedding gate) or rows-only sketches ---
    "dedup_jaccard", "dedup_embedding", "bigram_counts",
    "doc_fingerprint", "approx_quantiles", "dedup_minhash_lsh",
    # new in r3 (hard oracle — takes the slot of the dedup_simhash
    # rows-only re-verify, which can never upgrade past rows-only)
    "dedup_semantic",
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
