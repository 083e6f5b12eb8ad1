#!/usr/bin/env python
"""Measure whether TRAINING the PQ sub-codebooks moves recall@5
(r13 VERDICT item 6).

r12 measured and rejected sub-codebook training at fixture scale
(sf0.01, 500 vectors): 1-3 Lloyd iterations moved recall@5 vs exact
cosine 0.12 -> 0.16 -> 0.08 — noise, because 8 sub-centroids over 16
near-isotropic dims carry no structure on this fixture family. This
probe re-runs the measurement at the scales the r13 brief asked for:
sf0.1 (2,000 vectors) and the 10x replicated smoke corpus (~20,000
vectors, exact-clone replicas from scripts/scale_smoke.py — more mass,
same generator, so a genuine structure effect would need to show here
before the operator docstring's rejection note can stand).

numpy replay of the engine semantics (same constants imported from
operators.similarity): seed codebooks = vec_id < PQ_K sub-slices;
queries = vec_id % QUERY_MOD == 0; exhaustive ADC; recall@5 against
the exact-cosine top-5 (self excluded). Trained variant = per-subspace
Lloyd from the same seeds, empty clusters keep their centroid (the
clustering.py E/M discipline).

    python scripts/pq_training_probe.py [--replicate N]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gomysql2pg_spark.operators.similarity import (  # noqa: E402
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    PQ_TOP_K,
    QUERY_MOD,
    TRAIN_SAMPLE_MOD,
)


def load(sf_dir: str):
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        import glob as g

        parts = sorted(g.glob(os.path.join(path, "*.parquet")))
        import pyarrow as pa

        t = pa.concat_tables([pq.read_table(p) for p in parts])
    else:
        t = pq.read_table(path)
    ids = np.asarray(t["vec_id"])
    X = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], X[order]


def exact_top5(ids, X):
    qmask = ids % QUERY_MOD == 0
    Q = X[qmask]
    qid = ids[qmask]
    nrm = np.linalg.norm(X, axis=1)
    cos = (Q @ X.T) / (np.linalg.norm(Q, axis=1)[:, None] * nrm[None, :])
    tops = {}
    for i, q in enumerate(qid):
        row = cos[i].copy()
        row[ids == q] = -np.inf  # exclude self (engine: vec_id != qid)
        # deterministic (cos desc, id asc) tie-break like the operator
        idx = np.lexsort((ids, -row))[:PQ_TOP_K]
        tops[int(q)] = set(int(v) for v in ids[idx])
    return qid, Q, tops


def codebooks(X, iters: int):
    """[(m, (PQ_K, PQ_SUBDIM) centroids)] — iters=0 is the seed form."""
    cbs = []
    for m in range(PQ_M):
        S = X[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        C = S[:PQ_K].copy()  # seeds: vec_id < PQ_K (ids are sorted)
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for k in range(PQ_K):
                if (a == k).any():
                    C[k] = S[a == k].mean(axis=0)
        cbs.append(C)
    return cbs


def sample_mask(ids, mod: int, pos: int = 30, residue: int = 0):
    """The engine's _train_sample predicate (md5 hex digit `pos`,
    0-indexed into the 32-char digest; 30 = SQL substring position
    31) replicated in numpy, generalized over digit/residue so the
    probe can measure the SPREAD across equally-valid samples."""
    import hashlib

    return np.asarray(
        [
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[pos], 16)
            % mod
            == residue
            for i in ids
        ]
    )


def codebooks_sampled(ids, X, iters: int, mask):
    """codebooks() with the Lloyd stats restricted to mask — seeds
    stay full-corpus, exactly like the engine."""
    cbs = []
    for m in range(PQ_M):
        S = X[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
        C = S[:PQ_K].copy()
        T = S[mask]
        for _ in range(iters):
            d = ((T[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for k in range(PQ_K):
                if (a == k).any():
                    C[k] = T[a == k].mean(axis=0)
        cbs.append(C)
    return cbs


def probe_sampled(label: str, sf_dir: str) -> None:
    """r15 measurement for the sampled-training decision: recall@5 of
    the PRODUCTION sample spec vs full training vs the spread across
    six equally-valid digit/residue choices. Recorded result (10x
    smoke): full 0.764; spread over half/quarter samples 0.69-0.84 —
    full-train recall sits INSIDE the sampling noise band, so the
    half-sample model is statistically indistinguishable while the
    training scans halve."""
    ids, X = load(sf_dir)
    qid, Q, exact = exact_top5(ids, X)
    full = adc_recall(ids, X, qid, Q, exact, codebooks(X, 1))
    prod = adc_recall(
        ids, X, qid, Q, exact,
        codebooks_sampled(ids, X, 1, sample_mask(ids, TRAIN_SAMPLE_MOD)),
    )
    print(f"\n{label}: {len(ids)} vectors — full-train recall@5 "
          f"{full:.3f}, production sample (mod {TRAIN_SAMPLE_MOD}) "
          f"{prod:.3f}")
    spread = []
    for pos in (31, 30, 29):
        for residue in (0, 1):
            m = sample_mask(ids, 2, pos, residue)
            spread.append(
                round(
                    adc_recall(
                        ids, X, qid, Q, exact,
                        codebooks_sampled(ids, X, 1, m),
                    ),
                    3,
                )
            )
    print(f"  spread across 6 half-samples: {min(spread)}-{max(spread)}"
          f" {spread}")


def adc_recall(ids, X, qid, Q, exact, cbs) -> float:
    codes = np.stack(
        [
            (
                (
                    X[:, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM][:, None, :]
                    - cbs[m][None, :, :]
                )
                ** 2
            )
            .sum(axis=2)
            .argmin(axis=1)
            for m in range(PQ_M)
        ],
        axis=1,
    )  # (n, PQ_M)
    hits = 0.0
    for i, q in enumerate(qid):
        tabs = [
            ((cbs[m] - Q[i, m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]) ** 2).sum(
                axis=1
            )
            for m in range(PQ_M)
        ]
        d = sum(tabs[m][codes[:, m]] for m in range(PQ_M))
        d = d.astype(np.float64)
        d[ids == q] = np.inf
        idx = np.lexsort((ids, d))[:PQ_TOP_K]
        got = set(int(v) for v in ids[idx])
        hits += len(got & exact[int(q)]) / PQ_TOP_K
    return hits / len(qid)


def probe(label: str, sf_dir: str) -> None:
    ids, X = load(sf_dir)
    qid, Q, exact = exact_top5(ids, X)
    print(f"\n{label}: {len(ids)} vectors, {len(qid)} queries")
    for iters in (0, 1, 2, 3, 5):
        r = adc_recall(ids, X, qid, Q, exact, codebooks(X, iters))
        tag = "seeds" if iters == 0 else f"{iters} Lloyd iter(s)"
        print(f"  recall@{PQ_TOP_K} ADC, {tag:16s}: {r:.3f}")


def main() -> int:
    reps = 10
    if "--replicate" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--replicate") + 1])
    from scripts.scale_smoke import build_replicated

    rep_dir = build_replicated("/root/testdata/sf0.1", reps)
    if "--sampled" in sys.argv:
        probe_sampled(f"{reps}x replicated (~sf1 smoke corpus)", rep_dir)
        return 0
    probe("sf0.1", "/root/testdata/sf0.1")
    probe(f"{reps}x replicated (~sf1 smoke corpus)", rep_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
