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
    # --- r17 window (50 slots), re-derived 2026-08-17 by
    # `scripts/registry_hashes.py --derive-window 17` after the r17
    # OPTIMIZATION pass.
    # (1) changed this round: the r17-build closures (the EIGHT new
    # operators plus the retrain-path/IVF-family and production-K BPE
    # touches the build round already slotted) PLUS the optimization
    # pass's re-staled entries — bm25_topk (postings shuffle →
    # doc-keyed counter aggregate), retrieval_rrf/quality_report
    # (single-serving reuse + eager drain), the BPE family (batched
    # mining rounds), the IVF/PQ family (footer-count control
    # plane + the retrain overlap), and lsh_recall_report (the
    # measured-and-REJECTED overlap note re-staled its source hash);
    # (2) the remaining slots rotate the oldest-fresh r09/r10/r11
    # rows (VERDICT r16 item 5: let --derive-window slot them, no
    # hand-curation). bm25_topk's slot pushes cell_transforms out of
    # the 50; it stays fresh-green from its last row.
    "bitext_margin_pairs_ivf", "hard_negative_mining_ivf",
    "lsh_recall_report",
    "ann_recall_report", "bm25_topk", "bpe_fertility", "bpe_merges",
    "bpe_token_counts", "retrieval_quality_report", "retrieval_rrf",
    "similarity_ivfpq", "similarity_ivfpq_refined", "similarity_pq",
    "ann_retrain_report", "bpe_fertility_curve", "bpe_merges_k64",
    "decontamination_ngram_join", "dp_contribution_bound",
    "rollup_incremental", "stream_dedup_admit", "t_closeness_report",
    "rollup_agg", "semi_join", "set_except", "set_union_intersect",
    "similarity_norms", "string_funcs", "text_stats", "tfidf_top_terms",
    "token_count", "validate_rowcount", "collect_distinct_arrays",
    "dedup_embedding", "dedup_jaccard_prefix", "doc_fingerprint",
    "freq_sketch_check", "profile_orders", "q13_custdist",
    "regex_funcs", "sequence_semantics", "dedup_lines", "oov_rate",
    "stratified_sample", "string_distance", "temperature_sample",
    "token_budget_select", "typemap_matrix", "unigram_logprob",
    "anti_join", "approx_distinct_check",
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
