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
# From r14 this window is DERIVED, not hand-curated:
# `scripts/registry_hashes.py --derive-window` orders entries by
# (1) implementation changed in THIS build (function-level hash vs the
# latest round snapshot — these lead so the newest code always gets a
# driver row), then (2) stale entries oldest-green-row-first, then
# (3) fresh entries with the oldest rows if slots remain. Rows-only
# entries never take a slot (twin-gated). The function-level hash map
# lives in REGISTRY_HASHES.json; tests/test_registry_hashes.py FAILS
# when registry code changes without re-stamping it, closing the
# hand-curation hole that caused the r08 missed rotation and the
# r12 post-window gap.
_PRIORITY = [
    # --- r14 window (50 slots), derived 2026-08-15.
    # (1) changed this build: the fused single-shuffle LSH bucket-cap
    # kernel (both verified twins), the fused inverted-index pair
    # kernel (jaccard/containment + their CC/survivor/split/impact
    # consumers), the narrow-regroup cell assignment, the TRAINED PQ
    # sub-codebooks, and the LocalTableScan model tables (PQ + IVFADC)
    "dedup_containment", "dedup_jaccard", "dedup_clusters",
    "dedup_minhash_lsh_verified", "dedup_simhash_verified",
    "dedup_survivors", "dedup_impact_report",
    "similarity_ivfpq", "similarity_pq", "split_by_cluster",
    # ...then the 3 r14-NEW entries (never driver-checked): CCNet
    # perplexity terciles, the per-source datacard, epoch shards
    "ccnet_perplexity_buckets", "corpus_datacard", "epoch_shuffle",
    # (2) stale, oldest green row first: the 23 remaining r09 rows
    "bm25_components", "cube_agg", "derived_table", "filtered_aggs",
    "grouping_sets", "having_large_orders", "join_multi",
    "lateral_explode", "median_percentile", "page_fetch_composite",
    "page_limit_offset", "q10_returned_items", "q5_local_supplier",
    "q6_forecast_revenue", "range_join_bands",
    "scalar_subquery_above_brand_avg", "skew_salted_join",
    "stats_aggs", "topk_by_aggregation", "window_funcs",
    "window_range_frame", "window_topk", "window_value_funcs",
    # ...then 14 of the stale r10 rows (the rest lead the r15 queue
    # together with the stale r11/r12 rows — see REGISTRY_HASHES.json
    # "queued")
    "array_funcs", "bigram_counts", "bigram_lm_logprob",
    "corpus_pipeline", "dataset_split", "decontamination_check",
    "dedup_substring_chunks", "embedding_quantize",
    "incremental_dedup", "map_funcs", "math_funcs", "mm_decode",
    "mm_features", "mm_frame_sample",
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
