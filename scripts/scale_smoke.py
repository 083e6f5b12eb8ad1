#!/usr/bin/env python
"""Scale-smoke: run the scale-critical operators on a ~10× replication
of the sf0.1 fixtures (~sf1) and report per-operator wall time next to
the same operator at sf0.1 — the empirical check behind every "would
survive 100 TB" claim in the docstrings: a bounded design should scale
close to linearly in rows, so a time ratio far above the row ratio
flags a quadratic term (unbounded candidate generation, a global
window, a driver-side collect) that small fixtures can't surface.

    python scripts/scale_smoke.py [replication] [name_filter...]

The replicated fixture set is built once with pyarrow under /tmp
(cached by source mtimes + replication factor) from the DRIVER fixtures
— never written into /root/testdata:

- fact/dimension keys are offset per replica (orderkey/partkey/doc_id/
  vec_id/event_id stay unique; lineitem follows orders' offsets so FK
  joins keep their fan-out),
- `documents.text` gets a per-replica suffix token, so every original
  document gains R-1 NEAR-duplicates rather than exact clones: the
  near-dup/LSH/CC family sees a realistic dup-heavy crawl where
  candidate volume genuinely grows with scale,
- `events.user_id` / `documents.source` are NOT offset: per-key
  cardinality grows with scale, stressing state size and per-key
  windows the way a real corpus would.

Output: one line per operator — rows, seconds at the replicated scale,
seconds at sf0.1, and the time ratio to compare against the row ratio.
Exit 1 if any operator fails; ratios are printed, not asserted (this
box's CPU steal makes hard thresholds flaky — read the table).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"

#: operators whose 100 TB story is load-bearing: candidate generation,
#: iterative graph work, self-joins, heavy state — the ones a hidden
#: quadratic term would kill first
SCALE_CRITICAL = [
    "dedup_exact",
    "dedup_exact_norm",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_jaccard",
    "dedup_containment",
    "dedup_lines",
    "dedup_clusters",
    "cross_source_overlap",
    "similarity_topk",
    "similarity_ivf",
    "similarity_lsh",
    "similarity_pq",
    "er_resolved_rollup",
    "heavy_hitters",
    "cooccurrence_lift",
    "snapshot_diff",
    "group_agg",
    "q3_shipping_priority",
    "window_funcs",
    "token_budget_select",
    "weighted_systematic_sample",
    "group_reservoir_sample",
    "mixture_allocation",
    "pagerank_bipartite",
    "mm_decode",
    # streaming: keyed state must stay bounded as the drained volume
    # grows — per-user deque (anomaly), per-key counts (heavy hitters),
    # per-domain aggregates (source stats)
    "stream_anomaly",
    "stream_heavy_hitters",
    "stream_source_stats",
]


def build_replicated(base: str, reps: int) -> str:
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(
        f for f in os.listdir(base) if f.endswith(".parquet")
    )
    stamp = [(f, int(os.path.getmtime(os.path.join(base, f)))) for f in files]
    # hashlib, NOT hash(): str hashing is per-process randomized, which
    # would defeat the cross-invocation cache and strand orphan trees
    key = hashlib.md5(repr(stamp).encode()).hexdigest()[:12]
    out = os.path.join("/tmp", f"spark_graft_scale_{reps}x_{key}")
    manifest = os.path.join(out, "_MANIFEST.json")
    if os.path.isfile(manifest):
        return out
    os.makedirs(out, exist_ok=True)

    # key columns offset per replica so uniqueness survives; everything
    # else copied verbatim
    offset_cols = {
        "orders.parquet": ["o_orderkey"],
        "lineitem.parquet": ["l_orderkey"],
        "part.parquet": ["p_partkey"],
        "customer.parquet": ["c_custkey"],
        "supplier.parquet": ["s_suppkey"],
        "documents.parquet": ["doc_id"],
        "embeddings.parquet": ["vec_id"],
        "events.parquet": ["event_id"],
    }
    keep_single = {"region.parquet", "nation.parquet"}
    counts = {}
    # the lineitem FK must follow ORDERS' offset step, not its own
    # max(l_orderkey): orphan lineitems above max(o_orderkey) — or a
    # trailing order with no lineitems — would otherwise give the two
    # tables different steps and silently break replica fan-out
    orders_step = (
        pc.max(
            pq.read_table(
                os.path.join(base, "orders.parquet"), columns=["o_orderkey"]
            )["o_orderkey"]
        ).as_py()
        + 1
        if os.path.isfile(os.path.join(base, "orders.parquet"))
        else None
    )
    for f in files:
        tbl = pq.read_table(os.path.join(base, f))
        tdir = os.path.join(out, f)
        os.makedirs(tdir, exist_ok=True)
        if f in keep_single:
            pq.write_table(tbl, os.path.join(tdir, "part-000.parquet"))
            counts[f] = tbl.num_rows
            continue
        offs = {
            c: pc.max(tbl[c]).as_py() + 1 for c in offset_cols.get(f, [])
        }
        if f == "lineitem.parquet" and orders_step is not None:
            offs["l_orderkey"] = orders_step
        for i in range(reps):
            t = tbl
            for c, step in offs.items():
                t = t.set_column(
                    t.schema.get_field_index(c),
                    c,
                    pc.add(t[c], i * step),
                )
            if f == "documents.parquet" and i > 0:
                # near-duplicate replicas, not exact clones
                idx = t.schema.get_field_index("text")
                t = t.set_column(
                    idx,
                    "text",
                    pc.binary_join_element_wise(
                        t["text"], f" rep{i}", ""
                    ),
                )
            pq.write_table(t, os.path.join(tdir, f"part-{i:03d}.parquet"))
        counts[f] = tbl.num_rows * reps
    with open(manifest, "w") as fh:
        json.dump({"source": base, "reps": reps, "rows": counts}, fh)
    return out


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    name_filter = sys.argv[2:]
    names = [
        n
        for n in SCALE_CRITICAL
        if not name_filter or any(f in n for f in name_filter)
    ]

    big = build_replicated(BASE, reps)
    print(f"# replicated fixtures: {big}", file=sys.stderr)

    import __spark_entry__ as entry
    from gomysql2pg_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # codegen/JVM warmup at sf0.001 so the first timed operator doesn't
    # absorb session startup (same discipline as bench.py)
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for name in names:
            try:
                qs[name](spark, warm).count()
            except Exception:
                pass
        spark.catalog.clearCache()

    failures = []
    print(f"{'operator':34s} {'rows':>10s} {'t_big':>8s} {'t_0.1':>8s} ratio")
    for name in names:
        fn = qs[name]
        try:
            t0 = time.perf_counter()
            n_big = fn(spark, big).count()
            t_big = time.perf_counter() - t0
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, BASE).count()
            t_small = time.perf_counter() - t0
            spark.catalog.clearCache()
            ratio = t_big / t_small if t_small > 0 else float("inf")
            print(
                f"{name:34s} {n_big:>10d} {t_big:>8.2f} {t_small:>8.2f} "
                f"{ratio:>5.1f}x"
            )
        except Exception as exc:
            failures.append((name, f"{type(exc).__name__}: {exc}"[:300]))
            print(f"{name:34s} FAILED {failures[-1][1]}")
    print(f"FAILURES: {failures or 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
