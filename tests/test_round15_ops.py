"""Invariants + plan gates for the round-15 operators (SURVEY §2.O):
hard_negative_mining, bitext_margin_pairs, shard_manifest. Oracle
hash-exactness is the driver's job; these pin the SEMANTIC invariants
a hash can't articulate and the plan shapes the 100 TB story depends
on."""

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


def test_hard_negatives_are_cross_label_and_dense_ranked(
    spark, sf_dir, queries
):
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.similarity import HN_K, QUERY_MOD

    out = queries["hard_negative_mining"](spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    labeled = (
        out.join(
            emb.withColumnRenamed("vec_id", "qid").withColumnRenamed(
                "label", "qlabel"
            ),
            "qid",
        )
        .join(
            emb.withColumnRenamed("vec_id", "nid").withColumnRenamed(
                "label", "nlabel"
            ),
            "nid",
        )
        .collect()
    )
    assert labeled
    per_q: dict = {}
    for r in labeled:
        # a negative NEVER shares the query's label, and never IS it
        assert r["nlabel"] != r["qlabel"] and r["nid"] != r["qid"]
        assert r["qid"] % QUERY_MOD == 0
        per_q.setdefault(r["qid"], []).append(r["rank"])
    for q, ranks in per_q.items():
        # dense 1..k ranking, no gaps (a dropped candidate would gap)
        assert sorted(ranks) == list(range(1, min(HN_K, len(ranks)) + 1))


def test_hard_negatives_corpus_never_shuffles_before_scoring(
    spark, sf_dir, queries
):
    """Broadcast-queries shape: the only exchange is the per-query
    rank window (hashpartitioning on qid); the corpus side reaches
    the join unshuffled."""
    plan = plan_of(queries["hard_negative_mining"](spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan


def test_bitext_margin_demotes_hub_vectors(spark, tmp_path, queries):
    """The point of the margin: a hub vector equally close to every
    query must lose to a mutually-exclusive match. Construct side B
    with a hub (high cosine to BOTH queries) and two dedicated
    matches (higher cosine to exactly one query each): raw cosine
    would rank the hub over the weak dedicated match, margin must
    rank every query's dedicated match first."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gomysql2pg_spark.operators import similarity as SIM

    dim = SIM.PQ_M * SIM.PQ_SUBDIM

    def vec(x, y):
        v = [0.0] * dim
        v[0], v[1] = x, y
        return v

    rows = [
        # side A queries (label 0, vec_id % BITEXT_QUERY_MOD == 0)
        (0, vec(1.0, 0.0), 0),
        (SIM.BITEXT_QUERY_MOD, vec(0.0, 1.0), 0),
        # side B: hub at 45° (cos ~0.71 to both), dedicated matches
        (1, vec(0.9, 0.9), 1),          # hub
        (3, vec(1.0, 0.25), 1),         # match for q0 (cos ~0.97)
        (5, vec(0.25, 1.0), 1),         # match for q50 (cos ~0.97)
        # filler so neighborhoods have mass
        (7, vec(-1.0, 0.5), 1),
        (9, vec(0.5, -1.0), 1),
    ]
    tbl = pa.table(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": pa.array(
                [r[1] for r in rows], type=pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], type=pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = {
        (r["qid"], r["rank"]): r["nid"]
        for r in queries["bitext_margin_pairs"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[(0, 1)] == 3
    assert out[(SIM.BITEXT_QUERY_MOD, 1)] == 5


def test_shard_manifest_dense_positions_and_plan(spark, sf_dir, queries):
    """Writer invariant: positions are dense 1..n per (epoch, shard)
    (max_pos == n_docs) and the manifest covers every shard exactly
    once. Plan gates: a PARTIAL aggregate collapses each partition to
    manifest-sized rows before any post-window exchange (AQE's
    coalesced read may re-add one at runtime, but it only ever moves
    combined rows), the STATIC plan has exactly the window's own
    exchange, and nothing is single-partitioned."""
    out = queries["shard_manifest"](spark, sf_dir)
    # static plan (pre-execution): the aggregate rides the window's
    # partitioning — exactly one exchange, keyed (epoch, shard)
    static = plan_of(out, "simple")
    assert static.count("Exchange hashpartitioning") == 1, static
    assert "partial_count" in static and "partial_bit_xor" in static
    assert "SinglePartition" not in static
    rows = out.collect()
    seen = set()
    for r in rows:
        assert r["max_pos"] == r["n_docs"], r
        key = (r["epoch"], r["shard"])
        assert key not in seen
        seen.add(key)


def test_ivf_hard_negatives_equal_brute_force_when_probing_all_cells(
    spark, sf_dir, queries
):
    """The IVF variant differs from brute force ONLY by the probe's
    cell pruning: with nprobe = IVF_NLIST (probe every cell) the
    candidate universe is the whole corpus and the output must equal
    `hard_negative_mining` row-for-row. At the default nprobe the
    overlap is the probe's cell-hit rate — floor it well below the
    measured 0.36 (near-isotropic fixture embeddings, same regime as
    the ivfpq recall gates)."""
    from gomysql2pg_spark.operators import similarity as SIM

    brute = {
        (r["qid"], r["nid"], r["rank"])
        for r in queries["hard_negative_mining"](spark, sf_dir).collect()
    }
    assert brute
    full_probe = {
        (r["qid"], r["nid"], r["rank"])
        for r in SIM.q_hard_negative_mining_ivf(
            spark, sf_dir, nprobe=SIM.IVF_NLIST
        ).collect()
    }
    assert full_probe == brute
    pruned = {
        (r["qid"], r["nid"])
        for r in queries["hard_negative_mining_ivf"](
            spark, sf_dir
        ).collect()
    }
    br = {(q, n) for q, n, _ in brute}
    assert len(pruned & br) / len(br) >= 0.15


def test_bitext_two_exchanges_and_null_id_parity(spark, sf_dir, tmp_path):
    """Review findings made permanent: (a) the pair frame crosses the
    wire exactly twice — backward (nid) pass first, then ONE qid
    exchange under which forward rank, forward sum, margin, and final
    rank all ride; (b) a NULL vec_id on side B (Spark sorts NULL ids
    first, DuckDB last — a silent rank divergence inside any cosine
    tie) is dropped up front on BOTH engines, pinned on a fixture
    with an exact cos tie against a real row."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    df = qs["bitext_margin_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    d = tbl.to_pydict()
    d["vec_id"].append(None)
    d["embedding"].append(d["embedding"][3])  # exact cosine tie
    d["label"].append(1)  # side B
    pq.write_table(
        pa.Table.from_pydict(d, schema=tbl.schema),
        tmp_path / "embeddings.parquet",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    from tests.oracle_utils import compare_query

    r = compare_query(
        qs["bitext_margin_pairs"](spark, str(tmp_path)),
        osql["bitext_margin_pairs"],
        con,
    )
    con.close()
    assert r["count_match"] and r["schema_match"] and r["value_match"], r


def test_calibration_bins_partition_the_corpus(spark, sf_dir, queries):
    """Bins are a partition: n_docs sums to the corpus, each bin id
    is in [0, CAL_BINS), means are valid micro-probs, and the gap is
    |mean - rate| (the ECE ingredient)."""
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.quality import CAL_BINS

    rows = queries["classifier_calibration"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert 0 <= r["bin"] < CAL_BINS
        assert 0 <= r["mean_prob_micro"] <= 1_000_000
        assert 0 <= r["pos_rate_micro"] <= 1_000_000
        assert r["gap_micro"] == abs(
            r["mean_prob_micro"] - r["pos_rate_micro"]
        )


def test_quality_signal_correlation_bounds_and_negative_logits(
    spark, sf_dir, queries
):
    """r_micro is a valid correlation (|r| ≤ 1e6 + rounding), and the
    operator's FLOOR-division milli-logit agrees with pure-python
    floor on NEGATIVE logits — the exact case where Spark's `div`
    (truncate) and DuckDB's `//` (floor) disagree and the shared
    FLOOR(double) idiom is load-bearing."""
    import math

    from pyspark.sql import functions as F

    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.quality import _classifier_frame

    rows = queries["quality_signal_correlation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1_000_000 <= r["r_micro"] <= 1_000_000

    docs = load_table(spark, sf_dir, "documents")
    f = _classifier_frame(docs)
    lm = F.round(F.col("logit") * 1e6).cast("bigint")
    got = f.select(
        lm.alias("lm"),
        F.floor(lm.cast("double") / F.lit(1000.0))
        .cast("bigint")
        .alias("x"),
    ).collect()
    neg = 0
    for r in got:
        assert r["x"] == math.floor(r["lm"] / 1000.0), r
        neg += r["lm"] < 0
    assert neg > 0  # the fixture exercises the negative branch


def test_hard_negatives_null_label_parity(spark, sf_dir, tmp_path):
    """IS DISTINCT FROM is the load-bearing label predicate: a NULL
    label must count as a DIFFERENT class on both engines (engine:
    ~eqNullSafe; oracle: IS DISTINCT FROM) — a plain != would drop
    NULL-labeled candidates on the engine side only. Pin hash
    parity on a fixture with a NULL-labeled corpus vector."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entry
    from tests.oracle_utils import compare_query

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    d = tbl.to_pydict()
    # a NULL-labeled vector near the query set: must be minable as a
    # negative by BOTH engines
    d["vec_id"].append(max(v for v in d["vec_id"] if v is not None) + 1)
    d["embedding"].append(d["embedding"][0])
    d["label"].append(None)
    pq.write_table(
        pa.Table.from_pydict(d, schema=tbl.schema),
        tmp_path / "embeddings.parquet",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    qs, osql = entry.queries(), entry.oracle_sql()
    df = qs["hard_negative_mining"](spark, str(tmp_path))
    r = compare_query(df, osql["hard_negative_mining"], con)
    con.close()
    assert r["count_match"] and r["schema_match"] and r["value_match"], r
    # and the NULL-labeled twin of query 0's embedding IS mined
    nid = max(v for v in d["vec_id"] if v is not None)
    got = {(x["qid"], x["nid"]) for x in df.collect()}
    assert (0, nid) in got


def test_ivf_bitext_equals_brute_force_when_probing_all_cells(
    spark, sf_dir, queries
):
    """Same contract as the negative miner's gate: with nprobe =
    IVF_NLIST the probed candidate universe is all of side B, the
    per-side neighborhoods coincide with the exhaustive ones, and the
    output must equal `bitext_margin_pairs` row-for-row — so at any
    smaller nprobe the difference is exactly the probe's cell-miss,
    never the margin math."""
    from gomysql2pg_spark.operators import similarity as SIM

    brute = {
        tuple(r)
        for r in queries["bitext_margin_pairs"](spark, sf_dir).collect()
    }
    assert brute
    full = {
        tuple(r)
        for r in SIM.q_bitext_margin_pairs_ivf(
            spark, sf_dir, nprobe=SIM.IVF_NLIST
        ).collect()
    }
    assert full == brute


def test_bucket_pairs_matches_reference_model_property(spark, monkeypatch):
    """Property test for the r15 kernel: for ANY (doc_id, band, bkey)
    frame — NULL ids, singleton buckets, over-cap buckets, shared ids
    across bands — the fused single-shuffle kernel emits exactly the
    set a brute-force per-bucket model emits: all i<j pairs of the
    sorted non-NULL member list, for buckets with 2..cap members,
    distinct across bands. Few examples, one Spark job each (the
    kernel is a distributed op; hypothesis explores the input shape,
    not the partitioning)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from gomysql2pg_spark.operators import dedup as DD

    monkeypatch.setattr(DD, "LSH_MAX_BUCKET", 4)

    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(0, 12)),
                st.integers(0, 2),
                st.integers(0, 2),
            ),
            min_size=0,
            max_size=30,
            unique=True,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows):
        bands = spark.createDataFrame(
            rows, "doc_id long, band int, bkey long"
        ) if rows else spark.createDataFrame(
            [], "doc_id long, band int, bkey long"
        )
        got = {(r["da"], r["db"]) for r in DD._bucket_pairs(bands).collect()}
        buckets: dict = {}
        for d, b, k in rows:
            if d is not None:
                buckets.setdefault((b, k), []).append(d)
        want = set()
        for members in buckets.values():
            members = sorted(set(members))  # unique=True makes set a no-op
            if 2 <= len(members) <= DD.LSH_MAX_BUCKET:
                for i in range(len(members)):
                    for j in range(i + 1, len(members)):
                        want.add((members[i], members[j]))
        assert got == want, (sorted(got), sorted(want))

    check()


def test_token_fertility_consistency(spark, sf_dir, queries):
    """Fertility rows reconcile with the per-doc token counter: for
    each language, (sum chars * 1000) div (sum tokens) recomputed
    from token_count + documents equals the operator's row; ratios
    are positive; every language with tokens is present."""
    from gomysql2pg_spark.catalog import load_table

    import pyspark.sql.functions as F

    rows = {
        r["lang"]: r
        for r in queries["token_fertility"](spark, sf_dir).collect()
    }
    assert rows
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("len_chars")
    )
    tok = queries["token_count"](spark, sf_dir).select(
        "doc_id", "n_bpe_tokens"
    )
    chk = (
        docs.join(tok, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("len_chars").alias("sc"),
            F.sum("n_bpe_tokens").alias("st"),
        )
        .collect()
    )
    matched = 0
    for r in chk:
        if r["st"] and r["st"] > 0 and r["lang"] in rows:
            got = rows[r["lang"]]
            assert got["n_docs"] == r["n"]
            # the advertised reconciliation: corpus-level ratio from
            # independent inputs equals the operator's row exactly
            assert (
                got["chars_per_token_milli"] == (r["sc"] * 1000) // r["st"]
            ), (r["lang"], got, r)
            matched += 1
    assert matched == len(rows)
    for r in rows.values():
        assert r["chars_per_token_milli"] > 0
        assert r["tokens_per_word_milli"] > 0


def test_ann_recall_report_reconciles_with_its_inputs(
    spark, sf_dir, queries
):
    """The audit row must equal a hand computation from the two
    pipelines it composes — and the recall definition is hits over
    n_queries x PQ_TOP_K, so the milli value reconciles exactly."""
    from gomysql2pg_spark.operators.similarity import PQ_TOP_K

    exact = {
        (r["qid"], r["nid"])
        for r in queries["similarity_topk"](spark, sf_dir).collect()
        if r["rank"] <= PQ_TOP_K
    }
    approx = {
        (r["qid"], r["nid"])
        for r in queries["similarity_ivfpq"](spark, sf_dir).collect()
    }
    row = queries["ann_recall_report"](spark, sf_dir).collect()[0]
    nq = len({q for q, _ in exact})
    hits = len(exact & approx)
    assert row["n_queries"] == nq
    assert row["total_hits"] == hits
    assert row["recall_milli"] == (hits * 1000) // (nq * PQ_TOP_K)
