"""Semantic invariants of the corpus-shaping family (operators/
quality.py) — properties the oracle-parity hash check cannot express
(it proves both engines agree; these prove the agreed answer is the
RIGHT one): chunk reconstruction, entropy bounds, winsorization
clamps, robust-flag consistency, mixture-mass conservation, keep-rate
realization, PageRank mass conservation."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry
from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.operators.quality import (
    CALIBRATION_KEEP_RATE,
    CHUNK_SIZE,
    CHUNK_STRIDE,
    MAD_K,
)


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_chunks_reconstruct_documents(spark, sf_dir, queries):
    """Concatenating each chunk's first CHUNK_STRIDE chars (full tail
    for the last chunk) must reproduce the original text exactly —
    chunking may not drop, duplicate, or reorder a single character."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    chunks: dict[int, list] = {}
    for r in queries["doc_chunking"](spark, sf_dir).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in docs.items():
        if len(text) == 0:
            assert doc_id not in chunks
            continue
        rows = sorted(chunks[doc_id], key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert len(rows) == (len(text) - 1) // CHUNK_STRIDE + 1
        rebuilt = "".join(
            r["chunk_text"][:CHUNK_STRIDE] for r in rows[:-1]
        ) + rows[-1]["chunk_text"]
        assert rebuilt == text, doc_id
        for r in rows:
            assert 1 <= r["chunk_len"] <= CHUNK_SIZE
            assert r["chunk_start"] == r["chunk_idx"] * CHUNK_STRIDE + 1


def test_entropy_bounds(spark, sf_dir, queries):
    """0 ≤ H ≤ log2(alphabet size) for every doc, and the counted
    length must equal the document length (no dropped chars)."""
    lens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "length(text) AS n")
        .collect()
    }
    rows = queries["char_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_counted"] == lens[r["doc_id"]]
        h = r["entropy_micro"] / 1e6
        assert -1e-6 <= h <= math.log2(r["distinct_chars"]) + 1e-6, r


def test_winsorized_means_inside_clamp_band(spark, sf_dir, queries):
    for r in queries["winsorized_stats"](spark, sf_dir).collect():
        assert r["p_lo"] <= r["p_hi"]
        assert (
            r["n_docs"] * r["p_lo"]
            <= r["sum_winsorized"]
            <= r["n_docs"] * r["p_hi"]
        ), r
        # winsorization only moves tail mass; the clamped sum can
        # differ from the raw sum but the mean must stay in-band
        mean = r["mean_winsorized_micro"] / 1e6
        assert r["p_lo"] - 1 <= mean <= r["p_hi"] + 1, r


def test_mad_flags_satisfy_rule_and_are_minority(spark, sf_dir, queries):
    docs_n = load_table(spark, sf_dir, "documents").count()
    rows = queries["mad_outliers"](spark, sf_dir).collect()
    for r in rows:
        assert r["abs_dev"] == abs(r["n_chars"] - r["med"])
        assert r["abs_dev"] > MAD_K * r["mad"], r
    # by construction ≥ 50 % of each source sits within 1 MAD — the
    # 3-MAD flag set must be a strict minority of the corpus
    assert len(rows) < docs_n / 2


def test_reweight_mass_conservation(spark, sf_dir, queries):
    rows = queries["domain_reweight"](spark, sf_dir).collect()
    assert rows
    tol = len(rows)  # ±1 micro rounding per domain
    assert abs(sum(r["share_micro"] for r in rows) - 1_000_000) <= tol
    assert abs(sum(r["weight_micro"] for r in rows) - 1_000_000) <= tol
    # √-temperature reweighting must up-sample small domains and
    # down-sample large ones (boost strictly decreasing in share)
    by_share = sorted(rows, key=lambda r: r["share_micro"])
    boosts = [r["boost_micro"] for r in by_share]
    assert all(b1 >= b2 for b1, b2 in zip(boosts, boosts[1:])), boosts


def test_calibration_realizes_keep_rate(spark, sf_dir, queries):
    rows = queries["quality_calibration"](spark, sf_dir).collect()
    total = sum(r["n_total"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    # percentile_disc picks the cutoff from above: the realized global
    # rate is ≥ target, and within one doc + boundary-tie mass of it
    assert kept / total >= CALIBRATION_KEEP_RATE - 1.0 / total
    assert kept / total <= 0.5  # ties cannot double the acceptance


def test_pagerank_mass_conserved_and_positive(spark, sf_dir, queries):
    rows = queries["pagerank_bipartite"](spark, sf_dir).collect()
    assert rows
    # damped PR over a graph with no dangling nodes conserves unit
    # mass; allow ±1 nano rounding per node
    assert abs(sum(r["pr_nano"] for r in rows) - 1_000_000_000) <= len(rows)
    for r in rows:
        assert r["pr_nano"] > 0


def test_split_by_cluster_is_leakage_free(spark, sf_dir, queries):
    """The invariant that IS the operator: no near-dup cluster
    straddles two splits (so a test doc can never have a near-dup in
    train), every corpus document appears exactly once, and the
    bucket→split mapping realizes roughly 90/5/5."""
    from pyspark.sql import functions as F

    df = queries["split_by_cluster"](spark, sf_dir).persist()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert df.count() == n_docs
    assert df.select("doc_id").distinct().count() == n_docs
    # leakage-freedom: one split per cluster
    straddle = (
        df.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddle == 0
    # members inherit the CLUSTER's bucket, not their own doc hash
    pairs = queries["dedup_jaccard"](spark, sf_dir).select("da", "db")
    if pairs.count():
        joined = (
            pairs.join(
                df.select(
                    F.col("doc_id").alias("da"),
                    F.col("split").alias("sa"),
                ),
                "da",
            )
            .join(
                df.select(
                    F.col("doc_id").alias("db"),
                    F.col("split").alias("sb"),
                ),
                "db",
            )
        )
        assert joined.filter(F.col("sa") != F.col("sb")).count() == 0
    frac = {
        r["split"]: r["n"] / n_docs
        for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert frac.get("train", 0) > 0.8
    assert 0.005 < frac.get("test", 0) < 0.15
    assert 0.005 < frac.get("val", 0) < 0.15
    df.unpersist()


def test_dedup_impact_report_accounts_exactly(spark, sf_dir, queries):
    """The report's totals must reconcile exactly with its inputs:
    docs/chars before = the corpus per source, docs after = the
    survivor count, removed = before - after, and chars_after ≤
    chars_before with equality iff nothing was removed."""
    from pyspark.sql import functions as F

    rep = {r["source"]: r for r in queries["dedup_impact_report"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .collect()
    }
    assert set(rep) == set(truth)
    surv = (
        queries["dedup_survivors"](spark, sf_dir)
        .filter("is_survivor")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_surv"))
    )
    n_surv = {r["source"]: r["n_surv"] for r in surv.collect()}
    for s, r in rep.items():
        assert r["docs_before"] == truth[s]["n"]
        assert r["chars_before"] == truth[s]["chars"]
        assert r["docs_after"] == n_surv.get(s, 0)
        assert r["docs_removed"] == r["docs_before"] - r["docs_after"]
        assert r["chars_after"] <= r["chars_before"]
        if r["docs_removed"] == 0:
            assert r["chars_after"] == r["chars_before"]


def test_distinct_ngram_ratio_bounds_and_exactness(spark, sf_dir, queries):
    """distinct ≤ total, ratio in (0, 1e6], and the micro ratio is
    exactly round(distinct*1e6/total) recomputed from the row's own
    integer columns (no hidden float drift)."""
    rows = queries["distinct_ngram_ratio"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["distinct_bigrams"] <= r["total_bigrams"]
        want = round(r["distinct_bigrams"] * 1e6 / r["total_bigrams"])
        assert r["distinct_ratio_micro"] == want
        assert 0 < r["distinct_ratio_micro"] <= 1_000_000


def test_dsir_select_favors_target_language(spark, sf_dir, queries):
    """The operator's point, made measurable: documents in the target
    language must be selected at a (much) higher rate than the rest —
    the importance ratio is trained to tell exactly that apart. Also
    pins the stateless gate (selected ⇔ logratio > 0), full-corpus
    coverage, and token-less docs defaulting to not-selected."""
    from pyspark.sql import functions as F

    from gomysql2pg_spark.operators.ranking import DSIR_TARGET_LANG

    df = queries["dsir_select"](spark, sf_dir).persist()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    assert df.count() == docs.count()
    bad_gate = df.filter(
        (F.col("selected") != (F.col("logratio_micro") > 0))
    ).count()
    assert bad_gate == 0
    stats = {
        r["is_target"]: r
        for r in df.join(docs, "doc_id")
        .groupBy((F.col("lang") == DSIR_TARGET_LANG).alias("is_target"))
        .agg(
            F.avg(F.col("selected").cast("double")).alias("rate"),
            F.avg("logratio_micro").alias("mean_ratio"),
        )
        .collect()
    }
    # weak-signal fixture (synthetic "languages" share most of the
    # latin vocabulary, docs are ~55 tokens), so the gate is pinned the
    # way the ANN recall gates are: clearly better than non-target,
    # not production-separation — measured: target rate 0.56 vs 0.38,
    # mean ratio +35k vs -86k micro at sf0.001
    assert stats[True]["rate"] > stats[False]["rate"] + 0.1
    assert stats[True]["mean_ratio"] > 0 > stats[False]["mean_ratio"]
    df.unpersist()


def test_epoch_shuffle_invariants(spark, sf_dir, queries):
    """Every document appears exactly once per epoch; positions are
    dense 1..k within every (epoch, shard); the two epochs' orders are
    actually DIFFERENT permutations (the point of reshuffling); and
    the assignment is deterministic across invocations."""
    from pyspark.sql import functions as F

    from gomysql2pg_spark.operators.sampling import EPOCHS

    df = queries["epoch_shuffle"](spark, sf_dir).persist()
    n_docs = load_table(spark, sf_dir, "documents").count()
    per_epoch = {
        r["epoch"]: r["n"]
        for r in df.groupBy("epoch").agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("d"),
        ).collect()
    }
    assert set(per_epoch) == set(range(EPOCHS))
    assert all(v == n_docs for v in per_epoch.values())
    # dense positions: per (epoch, shard), max(pos) == count and
    # positions are distinct
    bad = df.groupBy("epoch", "shard").agg(
        F.max("pos").alias("mx"),
        F.count("*").alias("n"),
        F.countDistinct("pos").alias("dp"),
    ).filter((F.col("mx") != F.col("n")) | (F.col("dp") != F.col("n")))
    assert bad.count() == 0
    # the epochs disagree somewhere (different permutation)
    e0 = df.filter(F.col("epoch") == 0).select("doc_id", "shard", "pos")
    e1 = df.filter(F.col("epoch") == 1).select(
        F.col("doc_id").alias("doc_id"),
        F.col("shard").alias("s1"),
        F.col("pos").alias("p1"),
    )
    moved = e0.join(e1, "doc_id").filter(
        (F.col("shard") != F.col("s1")) | (F.col("pos") != F.col("p1"))
    )
    assert moved.count() > 0
    again = {
        (r["doc_id"], r["epoch"], r["shard"], r["pos"])
        for r in queries["epoch_shuffle"](spark, sf_dir).collect()
    }
    assert {
        (r["doc_id"], r["epoch"], r["shard"], r["pos"])
        for r in df.collect()
    } == again
    df.unpersist()


def test_ccnet_buckets_tercile_shape(spark, sf_dir, queries):
    """Per language: head/middle/tail are each within ±2 of n/3 (the
    explicit-rank cutpoints split value-ties deterministically but a
    run of equal scores can shift a boundary), 'empty' matches the
    token-less docs, and every doc lands in exactly one bucket."""
    from pyspark.sql import functions as F

    rows = queries["ccnet_perplexity_buckets"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r["n_docs"]
    for lang, buckets in by_lang.items():
        scored = sum(v for k, v in buckets.items() if k != "empty")
        if scored < 9:  # tiny languages can't show tercile shape
            continue
        for b in ("head", "middle", "tail"):
            assert abs(buckets.get(b, 0) - scored / 3) <= max(
                2, scored * 0.34 - scored / 3 + 2
            ), (lang, buckets)


def test_corpus_datacard_reconciles(spark, sf_dir, queries):
    """The datacard's integer columns reconcile exactly with direct
    aggregation over the corpus."""
    from pyspark.sql import functions as F

    rows = {r["source"]: r for r in
            queries["corpus_datacard"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    direct = {
        r["source"]: r
        for r in docs.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("chars"),
        ).collect()
    }
    assert set(rows) == set(direct)
    for s, r in rows.items():
        assert r["n_docs"] == direct[s]["n_docs"], s
        assert r["n_langs"] == direct[s]["n_langs"], s
        assert r["total_chars"] == direct[s]["chars"], s
        assert 0 <= r["n_empty"] <= r["n_docs"], s
        assert r["p50_chars"] is not None, s
