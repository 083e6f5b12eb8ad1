"""Invariant + plan gates for the round-7 batch-2 families:
entity resolution (linkage.py), frequency/heavy hitters
(frequency.py), layout (layout.py), and weighted systematic sampling.

The oracle sweep proves row equality at one partitioning; these tests
pin the properties the oracle cannot see — guarantee-preservation
under repartitioning, clustering quality, plan shape — so a refactor
that keeps the rows but breaks the 100 TB story fails CI.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


# --------------------------------------------------------------- linkage


def test_er_match_is_subset_of_blocking(spark, sf_dir, queries):
    """Precision stage can only drop candidates, never invent pairs."""
    block = queries["er_blocking_pairs"](spark, sf_dir)
    match = queries["er_match_pairs"](spark, sf_dir)
    extra = match.join(
        block.select("name_a", "name_b"), ["name_a", "name_b"], "left_anti"
    ).count()
    assert extra == 0
    assert match.count() <= block.count()


def test_er_blocking_never_crosses_blocks(spark, sf_dir, queries):
    """Every pair shares its blocking key (last token) — the recall
    contract of the blocking function."""
    bad = (
        queries["er_blocking_pairs"](spark, sf_dir)
        .filter(
            (F.substring_index("name_a", " ", -1) != F.col("block"))
            | (F.substring_index("name_b", " ", -1) != F.col("block"))
        )
        .count()
    )
    assert bad == 0


def test_er_clusters_closed_and_canonical_min(spark, sf_dir, queries):
    """Every matched pair shares a canonical name; the canonical is
    the lexicographic minimum of its cluster and is its own canonical
    (the survivor rule is a projection, applying it twice is a no-op)."""
    clusters = queries["er_clusters"](spark, sf_dir).cache()
    pairs = queries["er_match_pairs"](spark, sf_dir)
    ca = clusters.select(
        F.col("name").alias("name_a"), F.col("canonical").alias("can_a")
    )
    cb = clusters.select(
        F.col("name").alias("name_b"), F.col("canonical").alias("can_b")
    )
    split = (
        pairs.join(ca, "name_a")
        .join(cb, "name_b")
        .filter(F.col("can_a") != F.col("can_b"))
        .count()
    )
    assert split == 0
    # canonical = min member
    not_min = (
        clusters.groupBy("canonical")
        .agg(F.min("name").alias("min_member"))
        .filter(F.col("canonical") != F.col("min_member"))
        .count()
    )
    assert not_min == 0
    # idempotent: canonicals map to themselves
    rows = clusters.filter(
        F.col("is_canonical") & (F.col("name") != F.col("canonical"))
    ).count()
    assert rows == 0
    clusters.unpersist()


def test_er_rollup_conserves_records(spark, sf_dir, queries):
    """Resolution re-buckets records, never drops or duplicates them."""
    from gomysql2pg_spark.catalog import load_table

    total = load_table(spark, sf_dir, "part").count()
    rolled = (
        queries["er_resolved_rollup"](spark, sf_dir)
        .agg(F.sum("n_records"))
        .collect()[0][0]
    )
    assert rolled == total


def test_er_dictionary_is_broadcast(spark, sf_dir, queries):
    """The name→canonical dictionary must hit the fact side as a
    broadcast join — at 100 TB the fact table cannot shuffle for a
    dimension-sized dictionary."""
    plan = plan_of(queries["er_resolved_rollup"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------- frequency


def test_freq_sketch_guarantee_survives_repartitioning(spark, sf_dir):
    """The containment theorem is partitioning-independent: force an
    adversarial repartitioning of the events scan and re-run the
    candidate construction — every exact heavy hitter must still be
    found. This is the property the single-partitioning oracle row
    cannot establish."""
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.frequency import (
        SKETCH_K,
        sketch_candidates,
    )

    for n_parts in (1, 7, 64):
        ev = load_table(spark, sf_dir, "events").repartition(n_parts)
        n = ev.count()
        exact = (
            ev.groupBy("props")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") > F.lit(n) / F.lit(SKETCH_K))
        )
        cand = sketch_candidates(ev)
        missed = exact.join(
            cand,
            exact.props == F.col("candidate"),
            "left_anti",
        ).count()
        assert missed == 0, f"lost a heavy hitter at {n_parts} partitions"


def test_freq_sketch_null_key_heavy_hitter_is_found(spark):
    """A NULL key that is a global heavy hitter must appear in the
    candidate set and null-safe-join back to found=true (r7 ADVICE:
    value_counts(dropna=True) silently excluded NULL keys, breaking
    the containment guarantee for exactly the key most likely to
    dominate a dirty corpus)."""
    from gomysql2pg_spark.operators.frequency import (
        SKETCH_K,
        sketch_candidates,
    )

    rows = [(None,)] * 200 + [(f"k{i}",) for i in range(100)]
    ev = spark.createDataFrame(rows, "props string").repartition(5)
    cand = sketch_candidates(ev)
    # NULL has count 200 > 300/SKETCH_K, so it must be a candidate
    assert cand.filter(F.col("candidate").isNull()).count() == 1
    # and the null-safe membership join must flag it found
    n = ev.count()
    exact = (
        ev.groupBy("props")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > F.lit(n) / F.lit(SKETCH_K))
    )
    hit = cand.withColumn("_hit", F.lit(True))
    flagged = exact.join(
        hit, exact.props.eqNullSafe(hit.candidate), "left"
    ).select(
        "props", F.coalesce("_hit", F.lit(False)).alias("found")
    )
    assert flagged.filter(~F.col("found")).count() == 0


def test_heavy_hitters_partial_agg_and_broadcast_total(
    spark, sf_dir, queries
):
    plan = plan_of(queries["heavy_hitters"](spark, sf_dir))
    assert "partial_count" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_cooccurrence_pairs_ordered_and_bounded(spark, sf_dir, queries):
    """Unordered-pair convention (type_a < type_b) and the domain
    bound: at most |types|·(|types|−1)/2 rows."""
    from gomysql2pg_spark.catalog import load_table

    df = queries["cooccurrence_lift"](spark, sf_dir).cache()
    assert df.filter(F.col("type_a") >= F.col("type_b")).count() == 0
    n_types = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .count()
    )
    assert df.count() <= n_types * (n_types - 1) // 2
    df.unpersist()


# ---------------------------------------------------------------- layout


def test_zorder_buckets_cluster_both_dimensions(spark, sf_dir, queries):
    """The point of z-order: the average per-bucket envelope must be
    far narrower than the global range in BOTH dimensions (a
    single-column sort would leave the second dimension's envelopes
    at ~full width)."""
    env = queries["zorder_layout"](spark, sf_dir).cache()
    agg = env.agg(
        F.avg(F.col("pk_max") - F.col("pk_min")).alias("pk_span"),
        F.avg(F.col("sk_max") - F.col("sk_min")).alias("sk_span"),
        F.max("pk_max").alias("pk_hi"),
        F.min("pk_min").alias("pk_lo"),
        F.max("sk_max").alias("sk_hi"),
        F.min("sk_min").alias("sk_lo"),
        F.count("*").alias("n_buckets"),
    ).collect()[0]
    env.unpersist()
    assert agg["n_buckets"] > 1
    # each dimension's mean envelope ≤ 40% of its global span (a
    # 256-bucket z-curve over an 8-bit×8-bit grid gives ~1/16 per
    # dim in the uniform case; 0.4 leaves headroom for sparse cells)
    assert agg["pk_span"] <= 0.4 * (agg["pk_hi"] - agg["pk_lo"]), agg
    assert agg["sk_span"] <= 0.4 * (agg["sk_hi"] - agg["sk_lo"]), agg


def test_interval_join_is_equi_not_nested_loop(spark, sf_dir, queries):
    """The grid rewrite must execute as explode + hash aggregate —
    never a BroadcastNestedLoopJoin on the overlap predicate."""
    plan = plan_of(queries["interval_overlap_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate" in plan  # the explode


def test_interval_join_counts_match_nonequi_reference(
    spark, sf_dir, queries
):
    """Cross-check the grid rewrite against the direct non-equi
    formulation computed in Spark itself (small quarter calendar)."""
    from gomysql2pg_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    spans = li.groupBy("l_orderkey").agg(
        F.to_date(F.min("l_shipdate")).alias("lo"),
        F.to_date(F.max("l_shipdate")).alias("hi"),
    )
    quarters = spark.sql(
        "SELECT explode(sequence(DATE'1990-01-01', DATE'2010-10-01',"
        " INTERVAL 3 MONTHS)) AS quarter"
    )
    direct = (
        spans.join(
            quarters,
            (F.col("lo") < F.expr("quarter + INTERVAL 3 MONTHS"))
            & (F.col("hi") >= F.col("quarter")),
        )
        .groupBy("quarter")
        .agg(F.count("*").alias("n_orders"))
    )
    rewritten = queries["interval_overlap_join"](spark, sf_dir).select(
        "quarter", "n_orders"
    )
    diff = rewritten.exceptAll(direct).count() + direct.exceptAll(
        rewritten
    ).count()
    assert diff == 0


# ------------------------------------------------- systematic sampling


def test_weighted_systematic_tick_count_and_monotone_cum(
    spark, sf_dir, queries
):
    """Systematic selection drops ~N_SYSTEMATIC_PICKS ticks on the
    weight axis; each selected doc owns ≥1 tick, so the count lands
    in [N, N + n_docs·0] ± rounding — exactly: total DIV step ticks,
    each hitting exactly one doc slot, minus any tick at position 0.
    Also: cum is strictly increasing with doc_id among survivors."""
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.sampling import N_SYSTEMATIC_PICKS

    picked = queries["weighted_systematic_sample"](spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    step = total // N_SYSTEMATIC_PICKS
    expected_ticks = total // step  # ≥ N_SYSTEMATIC_PICKS
    n = picked.count()
    # one tick per selected doc unless a doc spans multiple ticks
    # (possible for huge docs), so n ≤ ticks; and every tick lands in
    # some doc's slot, so selections cover all ticks: n ≥ ticks iff
    # no doc owns 2+ ticks. Bound both sides loosely but usefully:
    assert n <= expected_ticks
    assert n >= N_SYSTEMATIC_PICKS * 0.5, n
    rows = picked.orderBy("doc_id").collect()
    cums = [r["cum"] for r in rows]
    assert cums == sorted(cums)
    picked.unpersist()


def test_weighted_systematic_inclusion_proportional_to_weight(
    spark, sf_dir, queries
):
    """Weight-proportionality: the selected set's total weight share
    cannot be smaller than its count share (heavier docs are more
    likely selected)."""
    from gomysql2pg_spark.catalog import load_table

    picked = queries["weighted_systematic_sample"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(
        F.sum("n_chars").alias("w"), F.count("*").alias("n")
    ).collect()[0]
    sel = picked.agg(
        F.sum("w").alias("w"), F.count("*").alias("n")
    ).collect()[0]
    if sel["n"]:
        assert sel["w"] / tot["w"] >= 0.8 * (sel["n"] / tot["n"])


def test_weighted_systematic_no_global_window(spark, sf_dir, queries):
    """The prefix sum must be the two-level form: every window in the
    plan is either partitioned (the per-band running sum) or runs on
    the tiny band table — assert no window sorts the full corpus by
    checking the corpus-side window is PARTITION BY band."""
    df = queries["weighted_systematic_sample"](spark, sf_dir)
    plan = plan_of(df, mode="extended")
    import re

    # every windowspecdefinition over the doc table must partition
    wins = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert wins, plan
    unpartitioned_wide = [
        w
        for w in wins
        if "band" not in w.split(",")[0] and "doc_id" in w
    ]
    assert not unpartitioned_wide, unpartitioned_wide


# ------------------------------------------------------ batch 3 gates


def test_classifier_score_stateless_zero_shuffle(spark, sf_dir, queries):
    """Model inference must be one codegen map over the scan: no
    Exchange anywhere in the plan, scan pruned to (doc_id, text)."""
    df = queries["classifier_score"](spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange" not in plan, plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema:" in ln][0]
    assert "text" in rs and "source" not in rs, rs


def test_classifier_keep_flag_consistent_with_logit(
    spark, sf_dir, queries
):
    bad = (
        queries["classifier_score"](spark, sf_dir)
        .filter(
            (F.col("kept") & (F.col("logit_micro") < 0))
            | (~F.col("kept") & (F.col("logit_micro") > 0))
        )
        .count()
    )
    assert bad == 0


def test_mixture_allocation_respects_budgets(spark, sf_dir, queries):
    """No domain exceeds its budget and fill rate ≤ 100%."""
    df = queries["mixture_allocation"](spark, sf_dir)
    over = df.filter(
        (F.col("chars_taken") > F.col("budget_chars"))
        | (F.col("fill_micro") > 1_000_000)
    ).count()
    assert over == 0


def test_mixture_allocation_window_is_per_source(spark, sf_dir, queries):
    """The greedy fill must run as a per-domain window, never a
    global sort; budget table joins as broadcast."""
    df = queries["mixture_allocation"](spark, sf_dir)
    plan = plan_of(df, mode="extended")
    import re

    wins = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert wins
    assert all("source" in w.split(",")[0] for w in wins), wins
    phys = plan_of(df)
    assert "BroadcastHashJoin" in phys


def test_mixture_fill_window_is_post_threshold(spark, sf_dir, queries):
    """The doc-level running-sum window must sit ABOVE the broadcast
    len_threshold join (fill only the budget-bounded candidates) —
    the raw-corpus window partitioned by source is exactly the
    mega-domain straggler the H1 pattern avoids. In explain's
    parent-first order the cum-sum Window precedes the threshold
    BroadcastHashJoin."""
    df = queries["mixture_allocation"](spark, sf_dir)
    plan = plan_of(df, mode="simple")
    lines = plan.splitlines()
    # the doc-level fill window is the one ordered by doc_id
    win_idx = next(
        i
        for i, ln in enumerate(lines)
        if "Window" in ln and "doc_id" in ln
    )
    join_idx = next(
        i
        for i, ln in enumerate(lines)
        if "BroadcastHashJoin" in ln and "len_threshold" in ln
    )
    assert win_idx < join_idx, plan


def test_coreset_margin_nonnegative_and_bounded(spark, sf_dir, queries):
    from gomysql2pg_spark.operators.clustering import (
        CORESET_PER_CLUSTER,
        K_CENTROIDS,
    )

    df = queries["coreset_margin_select"](spark, sf_dir).cache()
    assert df.filter(F.col("margin_micro") < 0).count() == 0
    sizes = df.groupBy("cid").count().collect()
    assert all(r["count"] <= CORESET_PER_CLUSTER for r in sizes)
    assert len(sizes) <= K_CENTROIDS
    df.unpersist()


def test_coreset_broadcasts_centroids_no_corpus_window_before_topk(
    spark, sf_dir, queries
):
    """Centroids must broadcast; the only window is the per-cluster
    top-M (PARTITION BY cid) — the best-2 extraction must be the
    bounded collect_list aggregate, not a per-vector rank window."""
    df = queries["coreset_margin_select"](spark, sf_dir)
    phys = plan_of(df)
    assert "BroadcastHashJoin" in phys or "BroadcastNestedLoopJoin" in phys
    plan = plan_of(df, mode="extended")
    import re

    wins = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert wins
    assert all(w.split(",")[0].startswith("cid") for w in wins), wins


def test_bloom_prefilter_no_false_negatives_low_fp(
    spark, sf_dir, queries
):
    """The Bloom guarantee (no false negatives) plus a sanity ceiling
    on the realized FP rate: with fill ≈ 3·|build|/2^16 the
    theoretical FP ≈ fill³; 5 % is far above it at any tested sf."""
    row = queries["bloom_prefilter_join"](spark, sf_dir).collect()[0]
    assert row["n_false_neg"] == 0
    assert row["n_passed"] >= row["n_true"]
    if row["n_keys"] - row["n_true"] > 0:
        assert row["fp_rate_micro"] <= 50_000, row


def test_group_reservoir_uses_window_group_limit(spark, sf_dir, queries):
    """The md5 rank must run with partial top-k pushdown (Spark's
    WindowGroupLimit before the exchange) so the shuffle carries ≤ k
    rows per task per group, plus the determinism contract: same rows
    under a forced adversarial repartitioning."""
    df = queries["group_reservoir_sample"](spark, sf_dir)
    plan = plan_of(df)
    assert "WindowGroupLimit" in plan, plan
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.sampling import RESERVOIR_K

    docs = load_table(spark, sf_dir, "documents").repartition(13)
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.md5("text").asc(), F.col("doc_id").asc()
    )
    again = (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "source", "lang", "rk")
    )
    diff = df.exceptAll(again).count() + again.exceptAll(df).count()
    assert diff == 0


def test_cross_source_overlap_matrix_bounded_and_symmetric_free(
    spark, sf_dir, queries
):
    """Matrix is |sources|²-bounded with the a<b convention, and each
    pair count never exceeds the smaller side's distinct-hash count."""
    from gomysql2pg_spark.catalog import load_table

    df = queries["cross_source_overlap"](spark, sf_dir).cache()
    assert df.filter(F.col("source_a") >= F.col("source_b")).count() == 0
    n_sources = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert df.count() <= n_sources * (n_sources - 1) // 2
    df.unpersist()


def test_bloom_position_joins_broadcast(spark, sf_dir, queries):
    """Every position lookup must be a broadcast join — the position
    set is bounded by 2^16 rows regardless of build cardinality. The
    public operator drains the one-row audit eagerly (persist-release
    discipline), so the gate inspects the lazy plan through
    `_bloom_audit_frames` and releases the caches it hands over."""
    from gomysql2pg_spark.operators.frequency import _bloom_audit_frames

    report, build, bits = _bloom_audit_frames(spark, sf_dir)
    try:
        plan = plan_of(report)
        assert plan.count("BroadcastHashJoin") >= 4, plan  # 3 pos + truth
    finally:
        build.unpersist()
        bits.unpersist()


# ------------------------------------------- partition-invariance gates


@pytest.mark.parametrize(
    "name", ["weighted_systematic_sample", "zorder_layout"]
)
def test_partition_invariance_round7(spark, sf_dir, queries, name):
    """Both ops compute layout/banding from VALUES (doc_id bands,
    min-max scaled keys), never from partition boundaries — so a
    forced adversarial repartition of the input must not change a
    single output row. Guards against accidentally reintroducing
    partition-dependent logic (e.g. per-partition prefix sums without
    offsets)."""
    base = queries[name](spark, sf_dir)
    conf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = queries[name](spark, sf_dir)
        diff = base.exceptAll(again).count() + again.exceptAll(base).count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", conf)
    assert diff == 0
