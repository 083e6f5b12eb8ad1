"""Parallelism-independence: results must be BIT-identical when the
shuffle partition count changes (the numeric.py claim, pinned). This is
what makes the engine trustworthy under AQE re-planning and cluster
resizing — a float-sum formulation would pass the oracle once and drift
across partitionings."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

# float-producing / ordering-sensitive queries — the ones that would
# break first if determinism discipline slipped
QUERIES = [
    "group_agg",
    "stats_aggs",
    "median_percentile",
    "similarity_topk",
    "tfidf_top_terms",
    "events_ema",
    "window_funcs",
    "q3_shipping_priority",
    "events_asof_purchase",
    # round-2 additions: share ratios (float division), checksum XOR,
    # iterative clustering, and the sampling bucketing must all be
    # partition-count-independent
    "q8_market_share",
    "q14_promo_revenue",
    "repetition_filter",
    "stratified_sample",
    "dedup_substring_chunks",
    "validate_content_hash",
    "dedup_clusters",
    # r3 batch 2: float dist2 fold (kmeans), scaled-bigint M-step sums,
    # two-level prefix sum ≡ global cumsum at any band partitioning
    "kmeans_assign",
    "kmeans_update",
    "token_budget_select",
    "events_anomaly",
    # quantized ln/pow over exact-integer inputs must not drift
    "unigram_logprob",
    "temperature_sample",
]


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def _multiset(df):
    cols = sorted(df.columns)
    out = {}
    for r in df.select(*cols).collect():
        k = tuple(tuple(v) if isinstance(v, list) else v for v in r)
        out[k] = out.get(k, 0) + 1
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_result_identical_across_partition_counts(spark, sf_dir, qs, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _multiset(qs[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = _multiset(qs[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, name
