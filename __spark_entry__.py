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
    # --- r16 window (50 slots), re-derived 2026-08-16 (batch 7) by
    # `scripts/registry_hashes.py --derive-window 16`.
    # (1) changed/new this build: the persist-release fixes
    # (bloom_prefilter_join, similarity_lsh_verified, bm25_topk, the
    # two dedup verified twins), the exchange-reuse Q11, the
    # _ivf_index model-sidecar + compaction refactor + parameterized
    # ADC cap (similarity_ivfpq, similarity_pq, ann_recall_report),
    # and the SIXTEEN r16-NEW operators (retrieval_rrf,
    # retrieval_quality_report, selfrep_scrub, bpe_merges,
    # bpe_fertility, bpe_token_counts, winnowing_fingerprint,
    # winnow_near_dup, k_anonymity_report, l_diversity_report,
    # length_drift_ks, quantize_recall_report, weak_label_vote,
    # curriculum_order, kn_bigram_logprob, similarity_ivfpq_refined);
    # (2) the full 15-entry r15 stale queue (4 r11 + 11 r12 rows —
    # VERDICT r16 item 1: this window burns it to zero; the two
    # changed stale rows lead in group 1);
    # (3) oldest-fresh r09 rows in the remaining slots.
    "bloom_prefilter_join", "similarity_lsh_verified", "ann_recall_report",
    "bm25_topk", "dedup_minhash_lsh_verified", "dedup_simhash_verified",
    "q11_important_stock", "similarity_ivfpq", "similarity_pq",
    "bpe_fertility", "bpe_merges", "bpe_token_counts",
    "curriculum_order", "k_anonymity_report", "kn_bigram_logprob",
    "l_diversity_report", "length_drift_ks", "quantize_recall_report",
    "retrieval_quality_report", "retrieval_rrf", "selfrep_scrub",
    "similarity_ivfpq_refined", "weak_label_vote", "winnow_near_dup",
    "winnowing_fingerprint", "q18_large_volume", "q3_shipping_priority",
    "q7_volume_shipping", "skew_salted_agg", "coreset_margin_select",
    "cross_source_overlap", "domain_cap_sample_scaled", "er_clusters",
    "events_top_paths", "events_transition_matrix",
    "group_reservoir_sample", "mixture_allocation", "pagerank_bipartite",
    "catalog_tables", "cross_join_small", "datetime_funcs",
    "exists_pending_orders", "full_outer_join", "lang_id",
    "null_safe_join", "pii_scrub", "pivot_status",
    "projection", "q4_order_priority", "quality_score",
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
