"""Invariants + plan gates for the round-15 batch-4 operators:
boilerplate_strip, lsh_recall_report, decontamination_semantic,
packing_efficiency, label_agreement_kappa. Oracle hash-exactness is
the driver's job; these pin the SEMANTIC invariants a hash can't
articulate and the plan shapes the 100 TB story depends on."""

from __future__ import annotations

import contextlib
import io
import math

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


def _write_docs(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pa.array(
                [len(r[1]) for r in rows], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_boilerplate_strip_removes_template_preserves_order(
    spark, tmp_path, queries
):
    """Three docs stamped with the same 8-token template (df=3 > cap 2)
    in different positions; one clean doc. The template chunk must be
    stripped from all three, the surrounding unique content must
    survive IN ORDER, and the clean doc must be untouched."""
    from gomysql2pg_spark.operators.dedup import STRIP_CHUNK_TOKENS

    assert STRIP_CHUNK_TOKENS == 8
    template = "cookie banner accept terms privacy policy click here"
    u = lambda tag: " ".join(f"{tag}{i}" for i in range(8))
    rows = [
        # template leads (chunk 0), unique tail
        (1, f"{template} {u('a')}", "en", "web"),
        # unique head, template is chunk 1, unique tail
        (2, f"{u('b')} {template} {u('c')}", "en", "web"),
        # template trails
        (3, f"{u('d')} {template}", "en", "web"),
        # clean doc, no template
        (4, f"{u('e')} {u('f')}", "en", "web"),
    ]
    _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in queries["boilerplate_strip"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1]["n_stripped"] == 1 and out[1]["kept_text"] == u("a")
    assert out[2]["n_stripped"] == 1
    # order preserved: head before tail, template gone
    assert out[2]["kept_text"] == f"{u('b')} {u('c')}"
    assert out[3]["kept_text"] == u("d")
    assert out[4]["n_stripped"] == 0
    assert out[4]["kept_text"] == f"{u('e')} {u('f')}"
    for r in out.values():
        assert r["n_chunks"] >= 1 and r["n_stripped"] <= r["n_chunks"]


def test_boilerplate_strip_chunk_count_and_no_allpairs(
    spark, sf_dir, queries
):
    """n_chunks = ceil(tokens/8) per doc, and the plan is the
    Σ-bounded two-groupBy shape — no join of the docs table with
    itself (the all-pairs product the df-join design avoids)."""
    from gomysql2pg_spark.operators.dedup import STRIP_CHUNK_TOKENS

    df = queries["boilerplate_strip"](spark, sf_dir)
    got = {r["doc_id"]: r["n_chunks"] for r in df.collect()}
    from gomysql2pg_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").collect()
    assert got
    for d in docs:
        toks = d["text"].strip().lower().split()
        # split(r"\s+") of a nonempty string yields len(toks) pieces
        want = max(1, math.ceil(len(toks) / STRIP_CHUNK_TOKENS))
        assert got[d["doc_id"]] == want
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_recall_report_reconciles_with_components(
    spark, sf_dir, queries
):
    """The audit row must equal a recomputation from the two pipelines
    it composes: truth = dedup_jaccard's pair set, candidates = the
    md5-banded bucket pairs, hits = their intersection."""
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.dedup import (
        _bucket_pairs,
        _md5_minhash_bands,
    )

    rows = queries["lsh_recall_report"](spark, sf_dir).collect()
    truth = {
        (r["da"], r["db"])
        for r in queries["dedup_jaccard"](spark, sf_dir)
        .select("da", "db")
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    cand = {
        (r["da"], r["db"])
        for r in _bucket_pairs(_md5_minhash_bands(docs)).collect()
    }
    if not truth:
        assert rows == []
        return
    (row,) = rows
    hits = truth & cand
    assert row["n_true_pairs"] == len(truth)
    assert row["n_candidate_pairs"] == len(cand)
    assert row["n_hits"] == len(hits)
    assert row["recall_milli"] == (len(hits) * 1000) // len(truth)
    assert 0 <= row["recall_milli"] <= 1000


def test_decontamination_semantic_flags_planted_copy(
    spark, tmp_path, queries
):
    """A training vector IDENTICAL to an eval vector must come back
    contaminated (cos 1.0); an orthogonal one must be clean; ties on
    the micro-rounded cosine resolve to the smaller eval id; output
    has exactly one row per training vector."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gomysql2pg_spark.operators.similarity import (
        DECON_HARD_MICRO,
        DECON_MOD,
    )

    def vec(x, y):
        return [x, y, 0.0, 0.0]

    rows = [
        # eval set (ids ≡ 0 mod DECON_MOD)
        (0, vec(1.0, 0.0), 0),
        (DECON_MOD, vec(0.0, 1.0), 0),
        # train: exact copy of eval 0 → contaminated
        (1, vec(1.0, 0.0), 1),
        # train: orthogonal to both evals equally (tie) → eval 0 wins
        (3, vec(1.0, 1.0), 1),
        # train: anti-aligned → clean, review False
        (5, vec(-1.0, 0.0), 1),
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], type=pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], type=pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = {
        r["vec_id"]: r
        for r in queries["decontamination_semantic"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 3, 5}
    assert out[1]["contaminated"] and out[1]["nearest_eval_id"] == 0
    assert out[1]["max_cos_micro"] >= DECON_HARD_MICRO
    # tie at cos≈0.7071 to both evals → smaller eval id
    assert out[3]["nearest_eval_id"] == 0 and not out[3]["contaminated"]
    assert not out[5]["contaminated"] and not out[5]["review"]


def test_decontamination_poisoned_eval_vector_does_not_hijack_argmax(
    spark, tmp_path, queries
):
    """An all-NaN eval vector yields NULL micro-cosine against every
    training row; min(struct) ranks a NULL field FIRST, so without the
    pre-argmax filter the poisoned eval id would win nearest_eval_id
    for EVERY training vector and null both flags corpus-wide (r15
    review finding). The planted copy must still match its REAL eval
    twin, and no row may carry a NULL cosine or the poisoned id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gomysql2pg_spark.operators.similarity import DECON_MOD

    nan = float("nan")
    rows = [
        (0, [nan, nan, nan, nan], 0),          # poisoned eval
        (DECON_MOD, [1.0, 0.0, 0.0, 0.0], 0),  # real eval
        (1, [1.0, 0.0, 0.0, 0.0], 1),          # train: copy of real
        (3, [0.0, 1.0, 0.0, 0.0], 1),          # train: orthogonal
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], type=pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], type=pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = {
        r["vec_id"]: r
        for r in queries["decontamination_semantic"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 3}
    for r in out.values():
        assert r["max_cos_micro"] is not None
        assert r["nearest_eval_id"] != 0
    assert out[1]["nearest_eval_id"] == DECON_MOD
    assert out[1]["contaminated"]


def test_decontamination_plan_is_broadcast_no_window(
    spark, sf_dir, queries
):
    """The 100 TB story: eval side broadcast, argmax as a partial
    aggregate — the plan must contain a broadcast join and NO window
    over the corpus×eval pair frame."""
    df = queries["decontamination_semantic"](spark, sf_dir)
    plan = plan_of(df)
    assert "Broadcast" in plan
    assert "Window" not in plan
    # one row per train vector with non-null embedding
    from gomysql2pg_spark.operators.similarity import DECON_MOD
    from gomysql2pg_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_train = emb.filter(
        F.col("embedding").isNotNull()
        & (F.col("vec_id") % DECON_MOD != 0)
    ).count()
    assert df.count() == n_train


def test_packing_efficiency_reconciles_with_seq_packing(
    spark, sf_dir, queries
):
    """Every telemetry column must recompute from the packing it
    audits; fill is in (0, 1000]; n_packs is the exact ceiling."""
    from gomysql2pg_spark.operators.pipeline import PACK_TOKENS

    eff = {
        r["source"]: r
        for r in queries["packing_efficiency"](spark, sf_dir).collect()
    }
    packed = queries["seq_packing"](spark, sf_dir).collect()
    per: dict = {}
    for r in packed:
        s = per.setdefault(
            r["source"], {"n": 0, "tok": 0, "straddle": 0}
        )
        s["n"] += 1
        s["tok"] += r["n_tokens"]
        s["straddle"] += int(r["straddles"])
    assert eff
    for src, s in per.items():
        if s["tok"] == 0:
            assert src not in eff
            continue
        row = eff[src]
        assert row["n_docs"] == s["n"]
        assert row["total_tokens"] == s["tok"]
        assert row["n_straddlers"] == s["straddle"]
        want_packs = -(-s["tok"] // PACK_TOKENS)
        assert row["n_packs"] == want_packs
        assert row["fill_milli"] == (s["tok"] * 1000) // (
            want_packs * PACK_TOKENS
        )
        assert 0 < row["fill_milli"] <= 1000


def test_lsh_recall_and_strip_hash_match_on_null_doc_id(
    spark, sf_dir, tmp_path_factory
):
    """Hostile NULL doc_id parity for the two new document-keyed ops:
    `_bucket_pairs` drops NULL-keyed rows BEFORE its window count, so
    the lsh_recall_report oracle must exclude them before ITS bucket
    size gate too (not merely rely on `a.doc_id < b.doc_id` dropping
    the pairs later — a NULL doc sitting in a bucket at exactly the
    cap would otherwise tip the oracle's gate but not the engine's);
    boilerplate_strip groups the NULL key identically on both
    engines. Pin hash-exactness on a fixture that actually contains
    the NULL."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_utils import compare_query

    out = str(tmp_path_factory.mktemp("sf_null_docid_b4"))
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    d = tbl.to_pydict()
    d["doc_id"][0] = None
    pq.write_table(
        pa.Table.from_pydict(d, schema=tbl.schema),
        os.path.join(out, "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet')"
    )
    qs, osql = entry.queries(), entry.oracle_sql()
    for name in ("lsh_recall_report", "boilerplate_strip"):
        r = compare_query(qs[name](spark, out), osql[name], con)
        assert (
            r["count_match"] and r["schema_match"] and r["value_match"]
        ), (name, r)
    con.close()


def test_q9_plan_pushes_like_and_broadcasts_dims(
    spark, sf_dir, queries
):
    """The Q9 shape's 100 TB story: the LIKE predicate must reach the
    part scan (pruned BEFORE the fact join), every dimension join must
    broadcast, and nothing may cartesian."""
    plan = plan_of(queries["q9_product_profit"](spark, sf_dir))
    assert "StringContains(p_name,red)" in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_exists_notexists_semantics(spark, tmp_path, queries):
    """Constructed four-order corpus pinning each branch of the Q21
    correlated pair: a lone late supplier among on-time co-suppliers
    WAITS; two late suppliers on one order kill each other (NOT
    EXISTS); a non-'F' order never counts; a late supplier alone on
    its order has no co-supplier (EXISTS) and never counts."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gomysql2pg_spark.operators.tpch import (
        Q21_LATE_DAYS,
        Q21_NATION,
    )

    d0 = dt.datetime(1995, 1, 1)
    late = d0 + dt.timedelta(days=Q21_LATE_DAYS + 1)
    ontime = d0 + dt.timedelta(days=1)
    ts = pa.timestamp("us")

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0], type=pa.int64()),
                "n_name": [Q21_NATION],
                "n_regionkey": pa.array([0], type=pa.int64()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                "s_name": ["s1", "s2", "s3"],
                "s_nationkey": pa.array([0, 0, 0], type=pa.int64()),
                "s_acctbal": [0.0, 0.0, 0.0],
            }
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 20, 30, 40], type=pa.int64()),
                "o_custkey": pa.array([1] * 4, type=pa.int64()),
                "o_orderstatus": ["F", "F", "O", "F"],
                "o_totalprice": [1.0] * 4,
                "o_orderdate": pa.array([d0] * 4, type=ts),
                "o_orderpriority": ["1-URGENT"] * 4,
            }
        ),
        tmp_path / "orders.parquet",
    )
    lines = [
        # (orderkey, suppkey, shipdate)
        (10, 1, late),    # s1 waits: co-supplier s2 on time
        (10, 2, ontime),
        (20, 1, late),    # both late → neither waits
        (20, 2, late),
        (30, 1, late),    # order not 'F'
        (30, 2, ontime),
        (40, 1, late),    # no co-supplier
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    [l[0] for l in lines], type=pa.int64()
                ),
                "l_partkey": pa.array([1] * len(lines), type=pa.int64()),
                "l_suppkey": pa.array(
                    [l[1] for l in lines], type=pa.int64()
                ),
                "l_linenumber": pa.array(
                    list(range(1, len(lines) + 1)), type=pa.int64()
                ),
                "l_quantity": [1.0] * len(lines),
                "l_extendedprice": [1.0] * len(lines),
                "l_discount": [0.0] * len(lines),
                "l_tax": [0.0] * len(lines),
                "l_returnflag": ["N"] * len(lines),
                "l_linestatus": ["O"] * len(lines),
                "l_shipdate": pa.array([l[2] for l in lines], type=ts),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    out = queries["q21_waiting_suppliers"](
        spark, str(tmp_path)
    ).collect()
    assert [(r["s_name"], r["numwait"]) for r in out] == [("s1", 1)]


def _write_tpch_minimal(tmp_path, parts, suppliers, lines, orders=None):
    """Tiny constructed TPC-H fixture: parts = (key, name, brand,
    type, size), suppliers = (key, name, nationkey, acctbal), lines =
    (orderkey, partkey, suppkey, qty, extprice, shipdate)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pa.timestamp("us")
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], type=pa.int64()),
                "n_name": ["NATION_2", "NATION_9"],
                "n_regionkey": pa.array([0, 0], type=pa.int64()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0], type=pa.int64()),
                "r_name": ["EUROPE"],
            }
        ),
        tmp_path / "region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([p[0] for p in parts], type=pa.int64()),
                "p_name": [p[1] for p in parts],
                "p_brand": [p[2] for p in parts],
                "p_type": [p[3] for p in parts],
                "p_size": pa.array([p[4] for p in parts], type=pa.int64()),
                "p_retailprice": [1.0] * len(parts),
            }
        ),
        tmp_path / "part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([s[0] for s in suppliers], type=pa.int64()),
                "s_name": [s[1] for s in suppliers],
                "s_nationkey": pa.array([s[2] for s in suppliers], type=pa.int64()),
                "s_acctbal": [float(s[3]) for s in suppliers],
            }
        ),
        tmp_path / "supplier.parquet",
    )
    default_date = dt.datetime(1995, 6, 1)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lines], type=pa.int64()),
                "l_partkey": pa.array([l[1] for l in lines], type=pa.int64()),
                "l_suppkey": pa.array([l[2] for l in lines], type=pa.int64()),
                "l_linenumber": pa.array(
                    list(range(1, len(lines) + 1)), type=pa.int64()
                ),
                "l_quantity": [float(l[3]) for l in lines],
                "l_extendedprice": [float(l[4]) for l in lines],
                "l_discount": [0.0] * len(lines),
                "l_tax": [0.0] * len(lines),
                "l_returnflag": ["N"] * len(lines),
                "l_linestatus": ["O"] * len(lines),
                "l_shipdate": pa.array(
                    [l[5] if len(l) > 5 else default_date for l in lines],
                    type=pa.timestamp("us"),
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )


def test_q2_returns_only_regional_min_cost_rows(spark, sf_dir, queries):
    """Every returned supplier carries ITS part's minimum regional
    cost (one distinct cost per part in the output) and only size-15
    parts appear."""
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.tpch import Q2_SIZE

    rows = queries["q2_min_cost_supplier"](spark, sf_dir).collect()
    assert rows
    sizes = {
        r["p_partkey"]: r["p_size"]
        for r in load_table(spark, sf_dir, "part").collect()
    }
    per_part: dict = {}
    for r in rows:
        assert sizes[r["p_partkey"]] == Q2_SIZE
        per_part.setdefault(r["p_partkey"], set()).add(
            r["ps_supplycost_c"]
        )
    assert all(len(costs) == 1 for costs in per_part.values())


def test_q11_threshold_reconciles_with_derived_supply(spark, queries):
    """The keep set must equal an independent recomputation of the
    per-part values and the global total from the derived supply
    relation restricted to the nation's suppliers. Pinned to sf0.01
    (the driver gate scale): the sf0.001 fixture has no NATION_7
    suppliers at all, which would vacuously pass."""
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.tpch import (
        Q11_FRACTION_DEN,
        Q11_NATION,
        derived_partsupp,
    )

    sf_dir = "/root/testdata/sf0.01"

    out = {
        r["ps_partkey"]: r["value_c"]
        for r in queries["q11_important_stock"](spark, sf_dir).collect()
    }
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION
    )
    keys = {
        r["s_suppkey"]
        for r in sup.join(
            nat, F.col("s_nationkey") == F.col("n_nationkey")
        ).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    vals: dict = {}
    for r in derived_partsupp(li).collect():
        if r["ps_suppkey"] in keys:
            vals[r["ps_partkey"]] = vals.get(r["ps_partkey"], 0) + (
                r["ps_supplycost_c"] * r["ps_availqty"]
            )
    total = sum(vals.values())
    want = {
        pk: v for pk, v in vals.items() if v * Q11_FRACTION_DEN > total
    }
    assert out == want and out  # non-empty and exact


def test_q16_not_in_excludes_negative_balance_supplier(
    spark, tmp_path, queries
):
    """Constructed: one listed-size part supplied by one clean and one
    negative-balance supplier — the count must be 1; a second part
    outside the size list must not appear."""
    _write_tpch_minimal(
        tmp_path,
        parts=[
            (1, "blue bolt", "Brand#2", "SMALL", 4),
            (2, "red gear", "Brand#2", "SMALL", 5),  # size not listed
        ],
        suppliers=[(1, "good", 0, 10.0), (2, "bad", 0, -5.0)],
        lines=[
            (10, 1, 1, 5, 5.0),
            (11, 1, 2, 5, 5.0),
            (12, 2, 1, 5, 5.0),
        ],
    )
    rows = queries["q16_parts_supplier_cnt"](
        spark, str(tmp_path)
    ).collect()
    assert [
        (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"])
        for r in rows
    ] == [("Brand#2", "SMALL", 4, 1)]


def test_q20_half_sum_threshold_branches(spark, tmp_path, queries):
    """Constructed: a fast-moving red-part holding (window moved >½ of
    total) qualifies; a slow mover doesn't; a non-matching part name
    never does; a supplier of the other nation never does."""
    import datetime as dt

    in96 = dt.datetime(1996, 6, 1)
    out96 = dt.datetime(1995, 6, 1)
    _write_tpch_minimal(
        tmp_path,
        parts=[
            (1, "red gear", "Brand#2", "SMALL", 4),
            (2, "hot gear", "Brand#2", "SMALL", 4),
        ],
        suppliers=[
            (1, "fast", 0, 1.0),
            (2, "slow", 0, 1.0),
            (3, "othernation", 1, 1.0),
        ],
        lines=[
            # s1: 8 of 10 units in 1996 → 16 > 10 qualifies
            (10, 1, 1, 8, 8.0, in96),
            (11, 1, 1, 2, 2.0, out96),
            # s2: 2 of 10 in 1996 → 4 > 10 false
            (12, 1, 2, 2, 2.0, in96),
            (13, 1, 2, 8, 8.0, out96),
            # s3: fast mover but wrong nation
            (14, 1, 3, 8, 8.0, in96),
            # s2 fast mover on a NON-red part — must not qualify it
            (15, 2, 2, 8, 8.0, in96),
        ],
    )
    rows = queries["q20_potential_promotion"](
        spark, str(tmp_path)
    ).collect()
    assert [(r["s_suppkey"], r["s_name"]) for r in rows] == [(1, "fast")]


def test_label_agreement_kappa_algebra_and_bounds(
    spark, sf_dir, queries
):
    """The 2×2 table must partition each language's corpus, and
    kappa_micro must equal the textbook statistic recomputed from the
    table; kappa is bounded by [-1, 1]."""
    rows = queries["label_agreement_kappa"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_docs"]
        n11, n10, n01, n00 = r["n11"], r["n10"], r["n01"], r["n00"]
        assert n11 + n10 + n01 + n00 == n
        assert min(n11, n10, n01, n00) >= 0
        sa, sb = n11 + n10, n11 + n01
        pe_num = sa * sb + (n - sa) * (n - sb)
        num = n * (n11 + n00) - pe_num
        den = n * n - pe_num
        assert den > 0  # degenerate groups are excluded
        want = round(1e6 * num / den)
        assert r["kappa_micro"] == want
        assert -1_000_000 <= r["kappa_micro"] <= 1_000_000
