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
    # --- r10 window. NO no_oracle-by-design entries (approx_distinct,
    # approx_quantiles, dedup_simhash, dedup_minhash_lsh, random_ids,
    # similarity_lsh): they cannot produce hash rows and burned 3 r9
    # slots; their correctness gates are their driver-green
    # *_check/*_verified twins.
    #
    # (a) entries with NO usable driver row: the never-checked r9/r10
    # additions + the 8 r02-stale rollovers
    "dedup_jaccard_prefix", "similarity_ivfpq", "dedup_survivors",
    "bigram_lm_logprob", "copytext_roundtrip",
    "collect_distinct_arrays", "corpus_pipeline", "dataset_split",
    "embedding_quantize", "events_json_props", "profile_orders",
    "seq_packing", "unpivot_metrics",
    # (b) every entry whose code changed AFTER its latest driver row:
    # the r9 rewrites (real mm_decode + the mm_* family chain,
    # single-scan snapshot_diff, the ER chain + dedup_clusters CC
    # rewiring, freq_sketch_check worker pickling, pagerank edge
    # caching, similarity_pq) and the r10 changes (bucketed
    # stream_anomaly state, prefix-jaccard persist, _pq_codes carry)
    "mm_decode", "mm_features", "mm_frame_sample", "mm_metadata",
    "mm_resize", "snapshot_diff", "er_blocking_pairs",
    "er_match_pairs", "er_clusters", "er_resolved_rollup",
    "dedup_clusters", "stream_anomaly", "stream_stateful_totals",
    "freq_sketch_check", "similarity_pq", "pagerank_bipartite",
    # (c) staleness rotation: the oldest remaining rows (r05), by name;
    # the last TWO entries overflow the 50-slot window, roll to r11
    "array_funcs", "bigram_counts", "decontamination_check",
    "dedup_embedding", "dedup_substring_chunks", "doc_fingerprint",
    "incremental_dedup", "map_funcs", "math_funcs",
    "pandas_udaf_wavg", "q13_custdist", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_qty_revenue", "q19_disjunctive",
    "q22_dormant_customers", "q8_market_share", "ratio_to_report",
    "regex_funcs", "repetition_filter", "sequence_semantics",
    "skew_salted_agg", "stratified_sample", "string_distance",
    "typemap_matrix", "validate_content_hash",
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
