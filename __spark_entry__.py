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
    # --- r6: never driver-checked after 5 rounds (12) ---
    "dedup_containment", "dedup_lines", "events_anomaly",
    "kmeans_assign", "kmeans_update", "oov_rate", "q18_large_volume",
    "stream_anomaly", "temperature_sample", "token_budget_select",
    "unigram_logprob", "vocab_topk",
    # --- r6: re-verify the timestamp-unit fix (12 batch crashers) ---
    "ts_ohlc", "scd2_intervals", "ts_gapfill_ffill", "events_ema",
    "events_window", "events_sessionize", "events_latest_per_user",
    "events_funnel", "events_cdc_merge", "events_asof_purchase",
    "events_asof_next_purchase", "events_asof_tolerance",
    # --- r6: re-verify the streaming reader fix (5 wrong + 2 touched) ---
    "stream_windowed_counts", "stream_sliding_windows",
    "stream_session_windows", "stream_stream_join",
    "stream_dedup_then_window", "stream_dedup", "stream_stateful_totals",
    # --- r6: brand-new sampling/curation family (never checked) ---
    "domain_cap_sample", "hash_mod_sample", "cohort_retention",
    "hapax_stats", "ngram_novelty", "rfm_segments", "engagement_dau",
    "value_quantiles", "key_skew_histogram",
    "validate_fk_orphans", "validate_bucket_checksum",
    "curation_pipeline",
    # --- green-row canaries: one per operator family (fill to 50) ---
    "group_agg", "q3_shipping_priority", "q7_volume_shipping",
    "dedup_exact_norm", "dedup_jaccard", "dedup_semantic",
    "dedup_clusters",
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
