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
    # --- r11 window (50 slots). NO no_oracle-by-design entries
    # (approx_distinct, approx_quantiles, dedup_simhash,
    # dedup_minhash_lsh, random_ids, similarity_lsh,
    # dedup_survivors_lsh): they cannot produce hash rows; their
    # correctness gates are their driver-green *_check/*_verified
    # twins or invariant pytests.
    #
    # (a) entries whose code changed this round (r11): the vectorized
    # copytext reader and the multi-probe IVFADC
    "copytext_roundtrip", "similarity_ivfpq",
    # (b) staleness rotation — the 5 r05-stale rollovers, then 43 of
    # the 46 r06-stale entries; validate_bucket_checksum,
    # value_quantiles, vocab_topk overflow the window and roll to r12
    # (all three were green in this round's full local oracle sweep)
    "skew_salted_agg", "stratified_sample", "string_distance",
    "typemap_matrix", "validate_content_hash",
    "cohort_retention", "curation_pipeline", "dedup_containment",
    "dedup_exact_norm", "dedup_jaccard", "dedup_lines",
    "dedup_semantic", "domain_cap_sample", "engagement_dau",
    "events_anomaly", "events_asof_next_purchase",
    "events_asof_purchase", "events_asof_tolerance",
    "events_cdc_merge", "events_ema", "events_funnel",
    "events_latest_per_user", "events_sessionize", "events_window",
    "group_agg", "hapax_stats", "hash_mod_sample",
    "key_skew_histogram", "kmeans_assign", "kmeans_update",
    "ngram_novelty", "oov_rate", "q18_large_volume",
    "q3_shipping_priority", "q7_volume_shipping", "rfm_segments",
    "scd2_intervals", "stream_dedup", "stream_dedup_then_window",
    "stream_session_windows", "stream_sliding_windows",
    "stream_stream_join", "stream_windowed_counts",
    "temperature_sample", "token_budget_select", "ts_gapfill_ffill",
    "ts_ohlc", "unigram_logprob",
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
    try:
        from gomysql2pg_spark.sources import copytext as copytext_mod

        modules.append(copytext_mod)
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
