"""Empty-input robustness: every operator must degrade to an empty (or
well-defined tiny) result on empty tables, never crash.

At 100 TB this is not an edge case — empty filter results, empty
partitions after pruning, and empty late-arriving sources happen on
every run. An operator that throws on zero rows takes the whole job
down; one that silently mis-aggregates (e.g. a global agg emitting no
row where SQL emits one NULL row) corrupts downstream joins.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry
from gomysql2pg_spark.catalog import TABLES

# representative subset: one per plan family (scan/join/agg/window/
# subquery/dedup/similarity/text/events/asof/pipeline/validation).
# Streaming entries are exercised by their own empty-batch tests.
REPRESENTATIVES = [
    "full_scan",
    "join_multi",
    "group_agg",
    "window_funcs",
    "having_large_orders",
    "q13_custdist",
    "q22_dormant_customers",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_substring_chunks",
    "decontamination_check",
    "similarity_topk",
    "text_stats",
    "repetition_filter",
    "stratified_sample",
    "events_window",
    "events_sessionize",
    "events_asof_purchase",
    "ts_ohlc",
    "scd2_intervals",
    "corpus_pipeline",
    "profile_orders",
    # r3 batch 2
    "kmeans_assign",
    "kmeans_update",
    "vocab_topk",
    "oov_rate",
    "token_budget_select",
    "events_anomaly",
    # r13: the applyInPandasWithState workers and the LSH bucket UDF —
    # the three streaming/ANN paths a NaN used to corrupt or kill
    "stream_stateful_totals",
    "stream_anomaly",
    "similarity_lsh",
    # r15 batch 4-6: the NaN-cosine argmax path, the chunk pipeline,
    # and the derived-supply integer division
    "decontamination_semantic",
    "boilerplate_strip",
    "q2_min_cost_supplier",
    "cube_agg",
    "grouping_sets",
    "topk_by_aggregation",
    "stats_aggs",
    "ratio_to_report",
    "events_json_props",
    "events_cdc_merge",
    "events_top_paths",
    "unigram_logprob",
    "temperature_sample",
    # r6 sampling/curation/validation family
    "domain_cap_sample",
    "hash_mod_sample",
    "cohort_retention",
    "hapax_stats",
    "ngram_novelty",
    "rfm_segments",
    "engagement_dau",
    "value_quantiles",
    "key_skew_histogram",
    "validate_fk_orphans",
    "validate_bucket_checksum",
    "curation_pipeline",
    # r7 scaled variants + deterministic twins
    "domain_cap_sample_scaled",
    "rfm_segments_scaled",
    "dedup_minhash_lsh_verified",
    "dedup_simhash_verified",
    "similarity_lsh_verified",
    "approx_distinct_check",
    "approx_quantiles_check",
    "random_ids_check",
    # r7 corpus-shaping family (operators/quality.py)
    "doc_chunking",
    "char_entropy",
    "winsorized_stats",
    "mad_outliers",
    "domain_reweight",
    "quality_calibration",
    "pagerank_bipartite",
    # r7 documents-stream ingest pair (streaming engine over an empty
    # corpus: zero-row file → one empty micro-batch, no fabricated rows)
    "stream_source_stats",
    "stream_quality_gate",
    # r7 batch 2: linkage / frequency / layout / systematic sampling
    "er_blocking_pairs",
    "er_match_pairs",
    "er_clusters",
    "er_resolved_rollup",
    "heavy_hitters",
    "freq_sketch_check",
    "cooccurrence_lift",
    "zorder_layout",
    "interval_overlap_join",
    "weighted_systematic_sample",
    # r7 batch 3
    "coreset_margin_select",
    "classifier_score",
    "mixture_allocation",
    "bloom_prefilter_join",
    "stream_heavy_hitters",
    "cross_source_overlap",
    "group_reservoir_sample",
    "similarity_pq",
    "events_transition_matrix",
    "events_top_paths",
    "snapshot_diff",
    # r12: the composed IVFADC (empty corpus -> empty model -> zero
    # neighbors, guarded), the survivor operator on LSH edges, the
    # COPY round-trip, and the end-to-end migration
    "similarity_ivfpq",
    "dedup_survivors_lsh",
    "copytext_roundtrip",
    "migration_e2e",
    # r12 audit: SUM-over-zero-rows NULL reached float() (fixed)
    "bm25_components",
]

# global aggregates legitimately emit rows over empty input (SQL
# semantics: aggregation without GROUP BY always yields a row);
# value = the exact expected row count
GLOBAL_AGG = {
    "profile_orders": 5,
    # SQL CUBE/GROUPING SETS emit the () row even on empty input
    # (count 0, NULL sums) — r13: the () set now rides a separate
    # global aggregate so Spark matches
    "cube_agg": 1,
    "grouping_sets": 1,
    # one global count row per FK edge, 0 orphans each
    "validate_fk_orphans": 5,
    # contract twins aggregate to exactly one summary row (counts 0 /
    # flags vacuous) even over an empty corpus
    "dedup_minhash_lsh_verified": 1,
    "dedup_simhash_verified": 1,
    "similarity_lsh_verified": 1,
    "random_ids_check": 1,
    # one-row bloom audit (counts 0 / NULL sums over an empty probe)
    "bloom_prefilter_join": 1,
    # one checksum row per migrated table (n_rows 0, NULL checksum)
    "migration_e2e": 3,
}


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    """Schema-identical, zero-row copies of every fixture table —
    single parquet FILES like the driver fixtures (catalog sniffs the
    footer with pyarrow, which rejects directories)."""
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        schema = pq.read_schema(src)
        pq.write_table(
            schema.empty_table(), os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_operator_survives_empty_input(spark, empty_dir, name):
    qs = entry.queries()
    df = qs[name](spark, empty_dir)
    n = df.count()
    if name in GLOBAL_AGG:
        # global agg without GROUP BY emits exactly one row per
        # profiled column (profile_orders: 5), even over empty input
        assert n == GLOBAL_AGG[name], (
            f"{name} emitted {n} rows on empty input,"
            f" expected {GLOBAL_AGG[name]}"
        )
    else:
        assert n == 0, f"{name} fabricated {n} rows from empty input"


@pytest.fixture(scope="module")
def nulls_dir(spark, sf_dir, tmp_path_factory):
    """Schema-identical fixtures where EVERY column of every row is
    NULL — keys included. Hostile but legal parquet: the shape of a
    failed upstream extract. r12 audit: this sweep found real
    crashers (NULL map keys in map_funcs, NULL media payloads in the
    mm_* family, SUM-over-zero-rows NULL reaching float() in
    bm25_components)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("sf_nulls"))
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        schema = pq.read_schema(src)
        arrays = [pa.nulls(2, type=f.type) for f in schema]
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=schema),
            os.path.join(out, f"{t}.parquet"),
        )
    return out


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_operator_survives_all_null_rows(spark, nulls_dir, name):
    """No operator may CRASH on rows whose every cell is NULL (the
    result may legitimately be empty, NULL-propagating rows, or a
    global-agg summary — the contract here is survival, not a count:
    a single bad row in a 100 TB corpus must not kill the job)."""
    qs = entry.queries()
    assert qs[name](spark, nulls_dir).count() >= 0


@pytest.fixture(scope="module")
def poisoned_dir(spark, sf_dir, tmp_path_factory):
    """Fixtures with NaN/+Inf/-Inf planted in every money/quantity
    double column and one all-NaN embedding vector. r12 audit: one NaN
    in a money column killed 11 operators through the exact-cents
    discipline's ANSI cast (now try_cast -> NULL = missing money)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("sf_poisoned"))
    plain = ["region", "nation", "part", "documents"]
    for t in plain:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out, f"{t}.parquet"))
    poison = {
        "events": ["value"],
        "orders": ["o_totalprice"],
        "customer": ["c_acctbal"],
        "supplier": ["s_acctbal"],
        "lineitem": ["l_extendedprice", "l_discount", "l_tax", "l_quantity"],
    }
    for t, cols in poison.items():
        tbl = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        d = tbl.to_pydict()
        for c in cols:
            d[c][0] = float("nan")
            if len(d[c]) > 1:
                d[c][1] = float("inf")
            if len(d[c]) > 2:
                d[c][2] = float("-inf")
        pq.write_table(
            pa.Table.from_pydict(d, schema=tbl.schema),
            os.path.join(out, f"{t}.parquet"),
        )
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    d = tbl.to_pydict()
    d["embedding"][0] = [float("nan")] * len(d["embedding"][0])
    pq.write_table(
        pa.Table.from_pydict(d, schema=tbl.schema),
        os.path.join(out, "embeddings.parquet"),
    )
    return out


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_operator_survives_poisoned_numerics(spark, poisoned_dir, name):
    """Non-finite doubles (sensor junk, bad join products) must yield
    NULL/skipped values, never an ANSI CAST_OVERFLOW job death."""
    qs = entry.queries()
    assert qs[name](spark, poisoned_dir).count() >= 0
