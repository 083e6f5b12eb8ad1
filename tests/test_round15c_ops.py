"""Invariants + plan gates for the round-15 batch-5 operators:
bm25_topk, quality_rule_ablation, temporal_holdout_report. Oracle
hash-exactness is the driver's job; these pin the semantic invariants
a hash can't articulate and the plan shapes the 100 TB story needs."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


# ------------------------------------------------------------ bm25_topk


def test_bm25_topk_rank_invariants(spark, sf_dir, queries):
    """Every query returns at most K rows; ranks are dense from 1;
    scores are non-increasing in rank with ties broken by doc_id."""
    from gomysql2pg_spark.operators.ranking import (
        BM25_QUERIES,
        BM25_TOPK_K,
    )

    rows = queries["bm25_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) <= set(BM25_QUERIES)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert len(rs) <= BM25_TOPK_K
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["score_micro"] > b["score_micro"] or (
                a["score_micro"] == b["score_micro"]
                and a["doc_id"] < b["doc_id"]
            ), (qid, a, b)


def test_bm25_topk_reconciles_with_bm25_components(
    spark, sf_dir, queries
):
    """For the query that matches q_bm25_components' fixed term set,
    every retrieved document's score must equal the integer sum of
    that document's per-term micro components — the retrieval operator
    is the sum-and-rank of the audited component operator, not a
    reimplementation that can drift."""
    from gomysql2pg_spark.operators.ranking import (
        BM25_QUERIES,
        BM25_QUERY,
    )

    qid = next(
        q for q, ts in BM25_QUERIES.items() if set(ts) == set(BM25_QUERY)
    )
    comp = {}
    for r in queries["bm25_components"](spark, sf_dir).collect():
        comp[r["doc_id"]] = comp.get(r["doc_id"], 0) + r["bm25_micro"]
    top = [
        r
        for r in queries["bm25_topk"](spark, sf_dir).collect()
        if r["qid"] == qid
    ]
    assert top, "query produced no rows at the test scale"
    for r in top:
        assert r["score_micro"] == comp[r["doc_id"]], r
    # and the ranking really is the top of the component sums
    best = sorted(comp.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [d for d, _ in best[: len(top)]]
    got = [r["doc_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert got == want


def test_bm25_topk_plan_broadcasts_and_group_limits(
    spark, sf_dir, queries
):
    """100 TB shape: the 12-row query map and the per-term document
    frequencies join via broadcast (never a shuffled join against the
    postings), and the per-query top-k executes through Spark's
    WindowGroupLimit so each map task ships at most K rows per query
    into the final window. The public operator drains this plan
    eagerly (persist-release discipline), so the gate inspects the
    lazy plan through `_bm25_topk_ranked` and releases the cache it
    hands over."""
    from gomysql2pg_spark.operators.ranking import _bm25_topk_ranked

    df, post = _bm25_topk_ranked(spark, sf_dir)
    try:
        plan = plan_of(df)
        assert "WindowGroupLimit" in plan, plan
        assert plan.count("BroadcastExchange") >= 2, plan
    finally:
        post.unpersist()


# ------------------------------------------------- quality_rule_ablation


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web"] * len(texts),
            "n_chars": pa.array(
                [len(t) for t in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_quality_rule_ablation_attribution(spark, tmp_path, queries):
    """Constructed corpus with one doc per single-rule failure, one
    multi-rule failure, and one clean doc: n_fail counts every
    failure, n_only_fail counts ONLY the sole-rule docs (the
    marginal-bite semantics the report exists for)."""
    long_uniq = [f"word{i:02d}" for i in range(24)]
    texts = [
        # fails len ONLY: 25 short distinct tokens incl a stopword,
        # < 120 chars, no punctuation
        "the " + " ".join(f"w{i:02d}" for i in range(24)),
        # fails punct ONLY: 24 distinct '!!'-suffixed tokens + 'the',
        # >= 120 chars, >= 25 tokens, >= 20% punctuation
        "the " + " ".join(f"wd{i:02d}!!!" for i in range(24)),
        # fails stop ONLY: 25 distinct 6-char tokens, no stopword
        " ".join(f"word{i:02d}" for i in range(25)),
        # fails min_toks ONLY: 10 long distinct tokens incl 'the'
        "the " + " ".join(f"verylongword{i:02d}" for i in range(9)),
        # fails rep ONLY: 30 tokens drawn from 8 distinct (27% < 35%),
        # incl 'the', ~150 chars
        "the " + " ".join(long_uniq[i % 7] for i in range(29)),
        # fails len + stop + min_toks (never counts as only-fail)
        "aaaa bbbb",
        # clean: 30 distinct 6-char tokens incl 'the'
        "the " + " ".join(f"term{i:02d}y" for i in range(29)),
    ]
    _write_docs(tmp_path, texts)
    out = {
        r["rule"]: r
        for r in queries["quality_rule_ablation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"len", "punct", "stop", "min_toks", "rep"}
    assert all(r["n_docs"] == len(texts) for r in out.values())
    assert (out["len"]["n_fail"], out["len"]["n_only_fail"]) == (2, 1)
    assert (out["punct"]["n_fail"], out["punct"]["n_only_fail"]) == (1, 1)
    assert (out["stop"]["n_fail"], out["stop"]["n_only_fail"]) == (2, 1)
    assert (
        out["min_toks"]["n_fail"],
        out["min_toks"]["n_only_fail"],
    ) == (2, 1)
    assert (out["rep"]["n_fail"], out["rep"]["n_only_fail"]) == (1, 1)
    assert out["len"]["fail_permille"] == 2 * 1000 // len(texts)


def test_quality_rule_ablation_single_scan_single_shuffle(
    spark, sf_dir, queries
):
    """The report is one corpus scan fanned through a generator into a
    5-group combinable aggregate: exactly one parquet scan and one
    exchange in the plan — no per-rule re-scan, no join."""
    df = queries["quality_rule_ablation"](spark, sf_dir)
    plan = plan_of(df, mode="simple")  # one line per node
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


# --------------------------------------------- temporal_holdout_report


def _write_events(tmp_path, rows):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(
                range(1, len(rows) + 1), type=pa.int64()
            ),
            "ts": pa.array(
                [base + dt.timedelta(seconds=s) for s, _ in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([u for _, u in rows], type=pa.int64()),
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


def test_temporal_holdout_report_leakage_accounting(
    spark, tmp_path, queries
):
    """Span [0, 100] s => cutoff at 80 s. User 1 entirely before,
    user 2 entirely after, user 3 straddles (the leak), plus a
    boundary event AT the cutoff which must land on the TEST side
    (half-open [lo, cutoff) train interval)."""
    rows = [
        (0, 1),
        (10, 1),
        (79, 3),
        (80, 2),  # exactly at the cutoff -> test side
        (90, 3),
        (100, 2),
    ]
    _write_events(tmp_path, rows)
    r = queries["temporal_holdout_report"](
        spark, str(tmp_path)
    ).collect()[0]
    import datetime as dt

    # the session timezone is pinned to UTC (gomysql2pg_spark.session)
    lo = int(
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )
    assert r["cutoff_micros"] == lo + 80 * 1_000_000
    assert r["n_train_events"] == 3
    assert r["n_test_events"] == 3
    assert r["n_train_users"] == 2  # users 1 and 3
    assert r["n_test_users"] == 2  # users 2 and 3
    assert r["n_leaky_users"] == 1  # user 3


def test_temporal_holdout_report_empty_events(spark, tmp_path, queries):
    """Empty events table: the report still returns exactly one row,
    all counters zero (not NULL) so downstream arithmetic never trips
    on a missing corpus."""
    _write_events(tmp_path, [])
    rows = queries["temporal_holdout_report"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cutoff_micros"] == 0
    for c in (
        "n_train_events",
        "n_test_events",
        "n_train_users",
        "n_test_users",
        "n_leaky_users",
    ):
        assert r[c] == 0, (c, r)


def test_temporal_holdout_report_no_window_two_aggregates(
    spark, sf_dir, queries
):
    """Plan gate: the audit is two combinable aggregates (per-user,
    then global) — no window operator and no more than the two
    aggregate exchanges the shape requires."""
    df = queries["temporal_holdout_report"](spark, sf_dir)
    plan = plan_of(df, mode="simple")  # one line per node
    assert "Window" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


# ---------------------------------------- dedup tuning telemetry (batch 6)


def test_dedup_threshold_sweep_monotone_and_reconciles(
    spark, sf_dir, queries
):
    """Raising the cutoff can only shrink the dup set: n_pairs and
    n_dup_docs must be non-increasing across the sweep, every grid
    value must emit a row (zero rows included), and the row at the
    production threshold must equal q_dedup_jaccard's pair count —
    the sweep is the production verifier evaluated at 7 cutoffs, not
    a reimplementation."""
    from gomysql2pg_spark.operators.dedup import (
        JACCARD_MILLI,
        SWEEP_MILLI,
    )

    rows = {
        r["thr_milli"]: r
        for r in queries["dedup_threshold_sweep"](spark, sf_dir).collect()
    }
    assert set(rows) == set(SWEEP_MILLI)
    for lo, hi in zip(sorted(SWEEP_MILLI), sorted(SWEEP_MILLI)[1:]):
        assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"], (lo, hi)
        assert rows[lo]["n_dup_docs"] >= rows[hi]["n_dup_docs"], (lo, hi)
    assert JACCARD_MILLI in rows
    n_prod = queries["dedup_jaccard"](spark, sf_dir).count()
    assert rows[JACCARD_MILLI]["n_pairs"] == n_prod


def test_dedup_cluster_sizes_reconciles_with_clusters(
    spark, sf_dir, queries
):
    """The histogram must be exactly the size distribution of the
    production cluster assignment: Σ n_docs equals the clustered-doc
    count, Σ n_clusters equals the distinct-cluster count, per-size
    bookkeeping holds (n_docs = size × n_clusters), and every cluster
    has at least 2 members (singletons never enter the pair graph)."""
    hist = queries["dedup_cluster_sizes"](spark, sf_dir).collect()
    clusters = queries["dedup_clusters"](spark, sf_dir)
    n_docs = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert sum(r["n_docs"] for r in hist) == n_docs
    assert sum(r["n_clusters"] for r in hist) == n_clusters
    for r in hist:
        assert r["cluster_size"] >= 2, r
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"], r


# ------------------------------------------------ property tests (hypothesis)
#
# Exact pure-Python models over arbitrary small corpora — the fixture
# tests pin chosen cases, these pin the SEMANTICS for all inputs the
# generators can reach. Few examples each (every example is a full
# Spark round-trip); the generated alphabet is ASCII with single-space
# joins so the Python tokenizer model (strip + \s+ split) is exactly
# Spark's trim + split.

import itertools as _it
import re as _re

_CASE_COUNTER = _it.count()


def _py_toks(text):
    return _re.split(r"\s+", text.strip().lower())


def test_quality_rule_ablation_matches_python_model_property(
    spark, tmp_path, queries
):
    """For ANY doc list over the generated alphabet the ablation table
    must equal the brute-force per-doc rule evaluation: n_fail,
    n_only_fail and the permille all recomputed in plain Python."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gomysql2pg_spark.operators.text import STOPWORDS

    pool = [
        "the", "a!", "bb", "cc", "dd", "worddddddd",
        "x" * 15, "yy!!", "zz..", "qq",
    ]

    def model(text):
        toks = _py_toks(text)
        n_chars = len(text)
        n_punct = n_chars - len(
            _re.sub(r"[^A-Za-z0-9\s]", "", text)
        )
        n_stop = sum(t in STOPWORDS for t in toks)
        n_toks = len(toks)
        n_distinct = len(set(toks))
        return {
            "len": 120 <= n_chars <= 10000,
            "punct": n_punct * 100 < n_chars * 20,
            "stop": n_stop > 0,
            "min_toks": n_toks >= 25,
            "rep": n_distinct * 20 >= n_toks * 7,
        }

    @given(
        docs=st.lists(
            st.lists(st.sampled_from(pool), min_size=0, max_size=40)
            .map(" ".join),
            min_size=1,
            max_size=6,
        )
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(docs):
        d = tmp_path / f"abl{next(_CASE_COUNTER)}"
        d.mkdir()
        _write_docs(d, docs)
        got = {
            r["rule"]: r
            for r in queries["quality_rule_ablation"](
                spark, str(d)
            ).collect()
        }
        per_doc = [model(t) for t in docs]
        for rule in ("len", "punct", "stop", "min_toks", "rep"):
            fails = [not m[rule] for m in per_doc]
            only = [
                (not m[rule]) and sum(not v for v in m.values()) == 1
                for m in per_doc
            ]
            r = got[rule]
            assert r["n_docs"] == len(docs)
            assert r["n_fail"] == sum(fails), (rule, docs)
            assert r["n_only_fail"] == sum(only), (rule, docs)
            assert (
                r["fail_permille"] == sum(fails) * 1000 // len(docs)
            )

    check()


def test_bm25_topk_invariants_and_qid1_reconciliation_property(
    spark, tmp_path, queries
):
    """For ANY corpus over a pool containing the query vocabulary:
    each query returns exactly min(K, |docs containing >=1 query
    term|) rows, only matching docs, positive integer scores, dense
    doc_id-tie-broken ranks — and query 1's scores reconcile exactly
    against q_bm25_components' integer sums (engine-internal, so no
    cross-runtime float involved)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gomysql2pg_spark.operators.ranking import (
        BM25_QUERIES,
        BM25_QUERY,
        BM25_TOPK_K,
    )

    pool = sorted(
        {t for ts in BM25_QUERIES.values() for t in ts}
    ) + ["filler", "pad", "noise"]

    @given(
        docs=st.lists(
            st.lists(st.sampled_from(pool), min_size=1, max_size=12)
            .map(" ".join),
            min_size=1,
            max_size=8,
        )
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(docs):
        d = tmp_path / f"bm{next(_CASE_COUNTER)}"
        d.mkdir()
        _write_docs(d, docs)
        rows = queries["bm25_topk"](spark, str(d)).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["qid"], []).append(r)
        tok_sets = {
            i + 1: set(_py_toks(t)) for i, t in enumerate(docs)
        }
        for qid, terms in BM25_QUERIES.items():
            matching = {
                doc for doc, ts in tok_sets.items()
                if ts & set(terms)
            }
            rs = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
            assert len(rs) == min(BM25_TOPK_K, len(matching)), (
                qid, docs,
            )
            assert {r["doc_id"] for r in rs} <= matching
            assert [r["rank"] for r in rs] == list(
                range(1, len(rs) + 1)
            )
            for r in rs:
                assert r["score_micro"] > 0
            for a, b in zip(rs, rs[1:]):
                assert a["score_micro"] > b["score_micro"] or (
                    a["score_micro"] == b["score_micro"]
                    and a["doc_id"] < b["doc_id"]
                )
        # engine-internal exact reconciliation for the component query
        qid1 = next(
            q for q, ts in BM25_QUERIES.items()
            if set(ts) == set(BM25_QUERY)
        )
        comp = {}
        for r in queries["bm25_components"](spark, str(d)).collect():
            comp[r["doc_id"]] = (
                comp.get(r["doc_id"], 0) + r["bm25_micro"]
            )
        for r in by_q.get(qid1, []):
            assert r["score_micro"] == comp[r["doc_id"]]

    check()


def test_temporal_holdout_matches_python_model_property(
    spark, tmp_path, queries
):
    """For ANY event list (including NULL timestamps and single-event
    spans) the report must equal the integer Python model: cutoff at
    min + 4/5 span, half-open train side, NULL-ts events on neither
    side, leaky users = users with events on both."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    base_us = int(base.timestamp() * 1_000_000)

    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(0, 1000)),
                st.integers(1, 5),
            ),
            min_size=0,
            max_size=25,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows):
        d = tmp_path / f"th{next(_CASE_COUNTER)}"
        d.mkdir()
        naive = dt.datetime(2024, 1, 1)
        tbl = pa.table(
            {
                "event_id": pa.array(
                    range(1, len(rows) + 1), type=pa.int64()
                ),
                "ts": pa.array(
                    [
                        None if s is None
                        else naive + dt.timedelta(seconds=s)
                        for s, _ in rows
                    ],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    [u for _, u in rows], type=pa.int64()
                ),
                "event_type": ["view"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )
        pq.write_table(tbl, d / "events.parquet")
        r = queries["temporal_holdout_report"](
            spark, str(d)
        ).collect()[0]
        stamps = [
            base_us + s * 1_000_000 for s, _ in rows if s is not None
        ]
        if not stamps:
            cutoff = 0
        else:
            lo, hi = min(stamps), max(stamps)
            cutoff = lo + (hi - lo) * 4 // 5
        train_u, test_u = set(), set()
        n_train = n_test = 0
        for s, u in rows:
            if s is None:
                continue
            us = base_us + s * 1_000_000
            if us < cutoff:
                n_train += 1
                train_u.add(u)
            else:
                n_test += 1
                test_u.add(u)
        assert r["cutoff_micros"] == cutoff, rows
        assert r["n_train_events"] == n_train
        assert r["n_test_events"] == n_test
        assert r["n_train_users"] == len(train_u)
        assert r["n_test_users"] == len(test_u)
        assert r["n_leaky_users"] == len(train_u & test_u)

    check()


def test_dedup_telemetry_matches_python_model_property(
    spark, tmp_path, queries, monkeypatch
):
    """Brute-force model of the WHOLE exact-dedup telemetry chain on
    arbitrary corpora with a tiny df cap (so the cap bites): distinct
    3-gram shingles per doc, shingles with df > cap dropped, pairwise
    intersections, the threshold sweep counts, and the union-find
    cluster-size histogram at the production threshold."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gomysql2pg_spark.operators import dedup as DD

    monkeypatch.setattr(DD, "MAX_SHINGLE_DF", 3)
    pool = ["aa", "bb", "cc", "dd", "ee", "ff"]

    def shingle_sets(docs):
        out = {}
        for i, text in enumerate(docs):
            toks = _py_toks(text)
            out[i + 1] = {
                " ".join(toks[j : j + 3])
                for j in range(max(len(toks) - 2, 0))
            }
        df: dict = {}
        for ss in out.values():
            for s in ss:
                df[s] = df.get(s, 0) + 1
        return {
            doc: {s for s in ss if df[s] <= 3}
            for doc, ss in out.items()
        }

    @given(
        docs=st.lists(
            st.lists(st.sampled_from(pool), min_size=0, max_size=8)
            .map(" ".join),
            min_size=1,
            max_size=6,
        )
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(docs):
        d = tmp_path / f"sw{next(_CASE_COUNTER)}"
        d.mkdir()
        _write_docs(d, docs)
        capped = shingle_sets(docs)
        pairs = {}
        for a, b in _it.combinations(sorted(capped), 2):
            i = len(capped[a] & capped[b])
            if i:
                pairs[(a, b)] = (i, len(capped[a]), len(capped[b]))
        # threshold sweep
        got = {
            r["thr_milli"]: r
            for r in queries["dedup_threshold_sweep"](
                spark, str(d)
            ).collect()
        }
        assert set(got) == set(DD.SWEEP_MILLI)
        for t in DD.SWEEP_MILLI:
            hit = {
                p
                for p, (i, na, nb) in pairs.items()
                if i * 1000 >= t * (na + nb - i)
            }
            assert got[t]["n_pairs"] == len(hit), (t, docs)
            assert got[t]["n_dup_docs"] == len(
                {x for p in hit for x in p}
            )
        # cluster-size histogram at the production threshold
        edges = [
            p
            for p, (i, na, nb) in pairs.items()
            if i * 1000 >= DD.JACCARD_MILLI * (na + nb - i)
        ]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        sizes: dict = {}
        for node in {x for e in edges for x in e}:
            r = find(node)
            sizes[r] = sizes.get(r, 0) + 1
        want_hist: dict = {}
        for sz in sizes.values():
            want_hist[sz] = want_hist.get(sz, 0) + 1
        got_hist = {
            r["cluster_size"]: (r["n_clusters"], r["n_docs"])
            for r in queries["dedup_cluster_sizes"](
                spark, str(d)
            ).collect()
        }
        assert got_hist == {
            sz: (n, sz * n) for sz, n in want_hist.items()
        }, (docs, edges)

    check()


# -------------------------- hostile-fixture cross-engine parity (r15 review)


def _parity(spark, duck_dir, name, sf_dir, queries):
    import duckdb
    import __spark_entry__ as e
    from tests.oracle_utils import compare_query

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{duck_dir}/documents.parquet')"
    )
    r = compare_query(
        queries[name](spark, sf_dir), e.oracle_sql()[name], con
    )
    con.close()
    return r


def test_bm25_topk_null_doc_id_tie_hash_match(
    spark, tmp_path, queries
):
    """Hostile fixture: a NULL doc_id document with the same text as
    two real docs — identical BM25 scores, so the tie straddles the
    NULL. Spark's ASC default is NULLS FIRST, DuckDB's NULLS LAST;
    the asc_nulls_last pin is what keeps the rank assignment (and the
    driver's value hash) identical (r15 review finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    text = "batch hash stream filler"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, None], type=pa.int64()),
            "text": [text, text, text],
            "lang": ["en"] * 3,
            "source": ["web"] * 3,
            "n_chars": pa.array([len(text)] * 3, type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    r = _parity(
        spark, str(tmp_path), "bm25_topk", str(tmp_path), queries
    )
    assert r["count_match"] and r["schema_match"] and r["value_match"], r


def test_boilerplate_strip_duplicate_doc_id_hash_match(
    spark, tmp_path, queries
):
    """Hostile fixture: two documents SHARING a doc_id (duplicate
    natural key), whose chunks merge into one group with duplicate
    chunk indices — the oracle's string_agg must order ties by the
    full (ci, df, chunk) key like Spark's struct sort, or kept_text
    diverges (r15 review finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = " ".join(f"aw{i}" for i in range(8))
    b = " ".join(f"bw{i}" for i in range(8))
    tbl = pa.table(
        {
            "doc_id": pa.array([7, 7, 8], type=pa.int64()),
            "text": [a, b, a + " " + b],
            "lang": ["en"] * 3,
            "source": ["web"] * 3,
            "n_chars": pa.array(
                [len(a), len(b), len(a) + 1 + len(b)], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    r = _parity(
        spark,
        str(tmp_path),
        "boilerplate_strip",
        str(tmp_path),
        queries,
    )
    assert r["count_match"] and r["schema_match"] and r["value_match"], r
