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
    # --- r13 window (50 slots). NO no_oracle-by-design entries.
    #
    # (a) the post-window driver-row gap (r12 verdict item 1): the
    # r12 snapshot commit (ca6f8a4) changed asof/events/linkage/
    # sampling/timeseries/stream code AFTER the r12 window froze, so
    # every oracled entry in those files whose latest driver row
    # predates that commit gets a fresh row here — all verified green
    # in this round's full local oracle sweep at sf0.01
    "events_asof_purchase", "events_asof_next_purchase",
    "events_asof_tolerance",
    "events_anomaly", "events_cdc_merge", "events_funnel",
    "events_json_props", "events_latest_per_user",
    "events_sessionize", "events_window",
    "er_blocking_pairs", "er_match_pairs",
    "cohort_retention", "curation_pipeline", "domain_cap_sample",
    "engagement_dau", "hapax_stats", "hash_mod_sample",
    "key_skew_histogram", "ngram_novelty", "rfm_segments",
    "ts_gapfill_ffill", "ts_ohlc", "scd2_intervals",
    "stream_anomaly", "stream_dedup", "stream_dedup_then_window",
    "stream_session_windows", "stream_sliding_windows",
    "stream_stateful_totals", "stream_stream_join",
    "stream_windowed_counts",
    # (b) the 3 r08-stale rollovers budgeted for r13 by the r12 brief
    "weighted_systematic_sample", "winsorized_stats", "zorder_layout",
    # (c) entries whose code/oracles r13 itself changed: the TRY_CAST
    # oracle sync (events/ts/sampling/linkage/stream/similarity/
    # validation — entries above already covered; these are the
    # r12-fresh ones the sync re-touched), the pyarrow.fs ANN index +
    # broadcast-join cell-assignment fallback, and the fixed
    # migration_e2e staging path
    "er_resolved_rollup", "rfm_segments_scaled", "value_quantiles",
    "similarity_pq", "similarity_ivfpq",
    "migration_e2e", "validate_bucket_checksum",
    "validate_content_hash", "snapshot_diff",
    # (d) the 4 r13-NEW entries (never driver-checked): leakage-free
    # cluster-atomic splits, the per-source dedup impact report, the
    # distinct-n corpus diversity ratio, and DSIR importance selection
    "split_by_cluster", "dedup_impact_report", "distinct_ngram_ratio",
    "dsir_select",
    # (e) staleness rotation: the oldest remaining r09 rows in the
    # similarity file this round touched
    "similarity_topk", "similarity_ivf",
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
