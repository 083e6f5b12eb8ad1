"""The scale-smoke replication builder must preserve the invariants the
operators rely on: key uniqueness across replicas, FK fan-out (lineitem
follows orders' offsets), near-duplicate (not identical) document
replicas, and untouched single-copy dimensions."""

import sys
import os

import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
BASE = "/root/testdata/sf0.001"


def _build(reps=2):
    from scale_smoke import build_replicated

    # the tiny sf0.001 fixture: the test writes ~KBs, not GBs
    return build_replicated(BASE, reps)


def test_replicated_keys_unique_and_counts_scale():
    out = _build(2)
    for f, key in [
        ("orders.parquet", "o_orderkey"),
        ("documents.parquet", "doc_id"),
        ("events.parquet", "event_id"),
    ]:
        src = pq.read_table(os.path.join(BASE, f))
        big = pq.read_table(os.path.join(out, f))
        assert big.num_rows == 2 * src.num_rows
        keys = big[key].to_pylist()
        assert len(set(keys)) == len(keys), f"{f}: replicated {key} collide"
    region = pq.read_table(os.path.join(out, "region.parquet"))
    assert region.num_rows == pq.read_table(
        os.path.join(BASE, "region.parquet")
    ).num_rows  # dimensions stay single-copy


def test_replicated_lineitem_follows_orders_offsets():
    out = _build(2)
    o = set(pq.read_table(os.path.join(out, "orders.parquet"))["o_orderkey"].to_pylist())
    li = set(
        pq.read_table(os.path.join(out, "lineitem.parquet"))["l_orderkey"].to_pylist()
    )
    # every lineitem FK resolves in the replicated orders (same offset
    # step on both tables) — a broken offset would orphan replica rows
    src_o = set(
        pq.read_table(os.path.join(BASE, "orders.parquet"))["o_orderkey"].to_pylist()
    )
    src_li = set(
        pq.read_table(os.path.join(BASE, "lineitem.parquet"))["l_orderkey"].to_pylist()
    )
    assert len(li - o) == 2 * len(src_li - src_o)


def test_replicated_documents_are_near_duplicates():
    out = _build(2)
    src = pq.read_table(os.path.join(BASE, "documents.parquet"))
    big = pq.read_table(os.path.join(out, "documents.parquet"))
    texts = big["text"].to_pylist()
    n = src.num_rows
    # replica 1 text = original + " rep1": distinct string, shared prefix
    assert texts[n] == texts[0] + " rep1"
    assert len(set(texts)) == len(texts)


def test_sparse_replicas_word_suffixed_disjoint_shingles():
    """--sparse mode: every word carries a per-replica suffix, so
    replica shingle universes are pairwise disjoint (no cross-replica
    near-dups) while each replica's internal df distribution is the
    original's under renaming."""
    from scale_smoke import build_replicated

    out = build_replicated(BASE, 2, sparse=True)
    src = pq.read_table(os.path.join(BASE, "documents.parquet"))
    big = pq.read_table(os.path.join(out, "documents.parquet"))
    texts = big["text"].to_pylist()
    n = src.num_rows
    orig = src["text"].to_pylist()[0].split()
    assert texts[0].split() == [w + "r0" for w in orig]
    assert texts[n].split() == [w + "r1" for w in orig]
    assert set(texts[0].split()).isdisjoint(texts[n].split())
