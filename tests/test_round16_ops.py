"""Round-16 operator tests: RRF hybrid fusion, within-document
repeated-span scrub, BPE merge mining, incremental ANN index append."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry

    return entry.queries()


# ------------------------------------------------------- retrieval_rrf


def test_retrieval_rrf_reconciles_components(spark, sf_dir, queries):
    """Every fused score must equal the sum of the reciprocal-rank
    contributions recomputed from the two component rankings fetched
    independently — the fusion is arithmetic over the published
    rankers, never a reimplementation that can drift (VERDICT r16
    item 2's 'Done' condition)."""
    from gomysql2pg_spark.operators.ranking import (
        BM25_QUERIES,
        RRF_K0,
        RRF_TOPK,
    )
    from gomysql2pg_spark.operators.similarity import QUERY_MOD

    bm = {
        (r["qid"], r["doc_id"]): r["rank"]
        for r in queries["bm25_topk"](spark, sf_dir).collect()
    }
    ann = {}
    for r in queries["similarity_ivfpq"](spark, sf_dir).collect():
        if r["qid"] < len(BM25_QUERIES) * QUERY_MOD:
            ann[(r["qid"] // QUERY_MOD + 1, r["nid"])] = r["rank"]
    fused = queries["retrieval_rrf"](spark, sf_dir).collect()
    assert fused, "fusion produced no rows at the test scale"
    # expected fused score for every (qid, doc) either ranker saw
    expect = {}
    for key, rank in bm.items():
        expect[key] = expect.get(key, 0) + 1_000_000_000 // (RRF_K0 + rank)
    for key, rank in ann.items():
        expect[key] = expect.get(key, 0) + 1_000_000_000 // (RRF_K0 + rank)
    for r in fused:
        key = (r["qid"], r["doc_id"])
        assert r["fused_nano"] == expect[key], (key, r)
        assert r["bm25_rank"] == bm.get(key), (key, r)
        assert r["ann_rank"] == ann.get(key), (key, r)
    # per-qid: the emitted rows are exactly the top-RRF_TOPK of the
    # expected fused scores (ties by doc_id)
    by_qid = {}
    for (qid, doc), s in expect.items():
        by_qid.setdefault(qid, []).append((doc, s))
    for qid, docs in by_qid.items():
        want = [
            d
            for d, _ in sorted(docs, key=lambda kv: (-kv[1], kv[0]))
        ][:RRF_TOPK]
        got = [
            r["doc_id"]
            for r in sorted(
                (r for r in fused if r["qid"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert got == want[: len(got)], (qid, got, want)


def test_retrieval_rrf_union_coverage(spark, sf_dir, queries):
    """A document ranked by only ONE component must still appear with
    the other rank NULL and a single-list contribution (the
    full-outer shape) — and at least one such row must exist at test
    scale, otherwise the fixture isn't exercising the union."""
    rows = queries["retrieval_rrf"](spark, sf_dir).collect()
    single = [
        r
        for r in rows
        if (r["bm25_rank"] is None) != (r["ann_rank"] is None)
    ]
    assert single, "no single-list rows — fusion degenerated"


# ------------------------------------------------------- selfrep_scrub


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web"] * len(texts),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_selfrep_scrub_constructed_semantics(spark, tmp_path, queries):
    """Pinned outputs on constructed docs: a repeated 3-gram collapses
    to its first occurrence, overlapping repeats never double-remove,
    clean docs pass through as their normalized form."""
    _write_docs(
        tmp_path,
        [
            # repeat of "a b c" at positions 5..7 -> removed
            "a b c x a b c",
            # clean doc: unchanged (normalized)
            "The  quick   Brown fox",
            # run of identical tokens: spans "a a a" at 1..4; first
            # kept, repeats at 2,3,4 cover positions 2..6 -> "a"
            "a a a a a a",
            # too short for any span: unchanged
            "x y",
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in queries["selfrep_scrub"](spark, str(tmp_path)).collect()
    }
    assert rows[1]["scrubbed_text"] == "a b c x"
    assert rows[1]["n_removed"] == 3 and rows[1]["n_tokens"] == 7
    assert rows[2]["scrubbed_text"] == "the quick brown fox"
    assert rows[2]["n_removed"] == 0
    assert rows[3]["scrubbed_text"] == "a"
    assert rows[3]["n_removed"] == 5
    assert rows[4]["scrubbed_text"] == "x y"
    assert rows[4]["n_removed"] == 0


def test_selfrep_scrub_invariants_and_idempotence(
    spark, tmp_path, queries
):
    """Invariants over a mixed fixture: output shorter ONLY where a
    span repeated (n_removed > 0 iff a within-doc repeat existed),
    and the scrub is idempotent — re-scrubbing its own output changes
    nothing."""
    texts = [
        "alpha beta gamma delta alpha beta gamma",
        "one two three four five six seven",
        "loop loop loop loop loop",
        "p q r p q r p q r",
        "clean text with no repeats at all here",
    ]
    _write_docs(tmp_path, texts)
    first = {
        r["doc_id"]: r
        for r in queries["selfrep_scrub"](spark, str(tmp_path)).collect()
    }
    for did, r in first.items():
        toks = texts[did - 1].lower().split()
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        has_rep = len(grams) != len(set(grams))
        assert (r["n_removed"] > 0) == has_rep, (did, r)
        kept = len(r["scrubbed_text"].split()) if r["scrubbed_text"] else 0
        assert kept == r["n_tokens"] - r["n_removed"], (did, r)
    # idempotence: write the scrubbed output back as a corpus and
    # re-scrub — every doc must come through with n_removed == 0
    out_dir = tmp_path / "again"
    out_dir.mkdir()
    _write_docs(
        out_dir,
        [first[i]["scrubbed_text"] for i in sorted(first)],
    )
    second = queries["selfrep_scrub"](spark, str(out_dir)).collect()
    for r in second:
        assert r["n_removed"] == 0, r
