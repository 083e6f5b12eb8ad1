"""Round-18 optimization tests: the BPE driver-side trainer hybrid
(`_mine_bpe_merges_local`) must be exactly equivalent to the per-round
cluster loop, and the production-K entries must stop paying K
cluster-wide barriers."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry

    return entry.queries()


def _naive_bpe(word_counts: dict, iters: int, checkpoints=()):
    """Strictly sequential reference trainer (recounts every pair
    every round — no incremental bookkeeping to share a bug with the
    engine's inverted-index version): argmax (cnt DESC, pair ASC),
    greedy left-to-right non-overlapping application."""
    vocab = [[list(w), n] for w, n in word_counts.items()]
    nw = sum(n for _, n in vocab)
    merges, fert = [], {}
    if 0 in checkpoints:
        fert[0] = (nw, sum(n * len(s) for s, n in vocab))
    it = 1
    while it <= iters:
        pairs: dict = {}
        for syms, n in vocab:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            for c in checkpoints:
                if c >= it:
                    fert[c] = (nw, sum(n * len(s) for s, n in vocab))
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((it, a, b, cnt))
        for ent in vocab:
            syms = ent[0]
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            ent[0] = out
        if it in checkpoints:
            fert[it] = (nw, sum(n * len(s) for s, n in vocab))
        it += 1
    return merges, fert


def _local(word_counts: dict, iters: int, checkpoints=()):
    from gomysql2pg_spark.operators.text import _mine_bpe_merges_local

    rows = [{"w": w, "n": n} for w, n in word_counts.items()]
    return _mine_bpe_merges_local(rows, iters, checkpoints)


def _naive_final_lens(word_counts: dict, iters: int) -> dict:
    """Reference final segmentation lengths via the naive trainer."""
    merges, _ = _naive_bpe(dict(word_counts), iters)
    lens = {}
    for w in word_counts:
        syms = list(w)
        for _, a, b, _ in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        lens[w] = len(syms)
    return lens


HOSTILE_VOCABS = [
    # overlapping self-pair positions: "aaa" holds (a,a) twice but one
    # greedy merge consumes two symbols → [aa, a]
    {"aaa": 5, "aaaa": 3, "aa": 2},
    # tie-break: (a,b) and (b,c) tie on count; pair-ASC must win, and
    # the merge changes the loser's count for the next round
    {"ab": 3, "bc": 3, "abc": 1},
    # multi-char symbols chain: merged symbol participates in later
    # pairs and its text sorts differently from its parts
    {"the": 10, "then": 6, "these": 4, "he": 9},
    # exhaustion mid-run: single-char words freeze the vocabulary
    # before iters runs out; later checkpoints see the frozen state
    {"ab": 2, "a": 7, "b": 5},
    # unicode, multi-byte: UTF-8 byte order == code-point order
    {"héllo": 3, "hélé": 3, "héé": 2, "日本語": 4, "日本": 2},
    # empty vocabulary
    {},
]


@pytest.mark.parametrize("wc", HOSTILE_VOCABS)
def test_bpe_local_recursion_matches_naive_reference(wc):
    """The incremental inverted-index recursion must equal the
    recount-everything reference on hostile fixtures: overlapping
    self-pairs, count ties, chained multi-char merges, mid-run
    exhaustion with trailing checkpoints, multi-byte symbols."""
    ck = (0, 2, 5, 9)
    want = _naive_bpe(dict(wc), 9, checkpoints=ck)
    merges, fert, enc = _local(dict(wc), 9, checkpoints=ck)
    assert (merges, fert) == want
    assert dict(enc) == _naive_final_lens(wc, 9)


def test_bpe_local_recursion_randomized_against_reference():
    """Deterministic pseudo-random vocabularies, both trainers, every
    K from exhaustion-prone to deep — the incremental bookkeeping has
    no untested count path."""
    import random

    rng = random.Random(1804)
    alphabet = "abcdef"
    for trial in range(20):
        wc = {
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 9))
            ): rng.randint(1, 9)
            for _ in range(rng.randint(1, 30))
        }
        k = rng.randint(1, 40)
        ck = tuple(sorted(rng.sample(range(k + 1), min(3, k + 1))))
        merges, fert, enc = _local(dict(wc), k, ck)
        assert (merges, fert) == _naive_bpe(dict(wc), k, ck), (
            trial,
            wc,
            k,
            ck,
        )
        assert dict(enc) == _naive_final_lens(wc, k), (trial, wc, k)


def test_bpe_driver_and_cluster_paths_agree(spark, sf_dir):
    """The hybrid's two paths must be indistinguishable: the default
    driver-side recursion and the `driver_vocab=0` per-round cluster
    loop produce identical merge tables AND identical fertility
    checkpoints on the fixture corpus at production K."""
    from gomysql2pg_spark.operators.text import (
        BPE_CURVE_KS,
        BPE_PROD_ITERS,
        _mine_bpe_merges,
    )

    fast = _mine_bpe_merges(
        spark, sf_dir, BPE_PROD_ITERS, checkpoints=BPE_CURVE_KS
    )
    slow = _mine_bpe_merges(
        spark,
        sf_dir,
        BPE_PROD_ITERS,
        checkpoints=BPE_CURVE_KS,
        driver_vocab=0,
    )
    assert fast[:2] == slow[:2]
    # the driver path hands back the encoded vocabulary for free; the
    # cluster path signals consumers to build it cluster-side
    assert fast[2] is not None and slow[2] is None


def test_bpe_token_counts_single_corpus_scan_when_driver_mined(
    spark, sf_dir, queries
):
    """With the vocabulary driver-mined, the encoded vocabulary comes
    back as a LocalTableScan — the public plan must scan the corpus
    exactly ONCE (the doc-word aggregate side; the old venc subtree
    re-scanned it because Catalyst pruned through the shared dw
    aggregate)."""
    from tests.test_plan_quality import plan_of

    plan = plan_of(queries["bpe_token_counts"](spark, sf_dir))
    # one Location: line per scan node in the formatted details
    assert plan.count("Location:") == 1, plan
    assert "LocalTableScan" in plan, plan


def test_bpe_k64_mining_runs_constant_cluster_jobs(spark, sf_dir):
    """The r18 claim, pinned: production-K mining costs a CONSTANT
    number of cluster jobs — the one bounded vocabulary probe, which
    AQE materializes as up to three query-stage jobs (corpus-scan
    shuffle stage, coalesced reduce, take) — when the vocabulary fits
    the driver budget. Never one-plus jobs PER MERGE ROUND: the old
    chain ran 64+ driver-synchronous jobs at K=64."""
    from gomysql2pg_spark.operators.text import (
        BPE_CURVE_KS,
        BPE_PROD_ITERS,
        _mine_bpe_merges,
    )

    sc = spark.sparkContext
    group = "r18-bpe-jobcount"
    sc.setJobGroup(group, "bpe k64 mining job count")
    try:
        merges, fert, _ = _mine_bpe_merges(
            spark, sf_dir, BPE_PROD_ITERS, checkpoints=BPE_CURVE_KS
        )
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    assert len(merges) > 0 and len(fert) == len(BPE_CURVE_KS)
    assert len(jobs) <= 3, jobs
