"""Short-document regression suite (round-3 ADVICE fixes).

Spark's ``sequence(a, b)`` with b < a yields a DESCENDING array — it
never errors and never returns empty. Any window/bigram index list
built as ``sequence(lo, n-1)`` therefore fabricates indices for docs
shorter than the window, either diverging from a ``range()``-based
oracle (dedup_substring_chunks) or crashing outright under ANSI mode
via ``element_at(toks, 0)`` (repetition_filter, bigram_counts). A
single 1-token document anywhere in a 100 TB corpus would kill the
whole job — exactly the junk input these filters exist to handle.

This suite runs the affected operators on a synthetic fixture of
pathological docs (empty text, 1 token, sub-window sizes) and checks
full oracle parity on it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle_utils import compare_query

# (doc_id, text) — token counts 0/1/2/10/19/20/25; doc 7 duplicates
# doc 6's text so the 20-token window actually matches across docs
_DOCS = [
    (1, ""),
    (2, "solo"),
    (3, "two tokens"),
    (4, " ".join(f"w{i}" for i in range(10))),
    (5, " ".join(f"w{i}" for i in range(19))),
    (6, " ".join(f"w{i}" for i in range(20))),
    (7, " ".join(f"w{i}" for i in range(20))),
    (8, " ".join(f"w{i}" for i in range(25))),
    # DUPLICATE sub-window-length docs (11 tokens): DuckDB's
    # truncating `//` would fabricate one clamped whole-doc window
    # each, and being duplicates they'd survive the df>1 filter —
    # exactly the sf0.1 divergence (doc_ids 179/2523) the floor-based
    # oracle fixes. A single short doc cannot catch this.
    (9, " ".join(f"d{i}" for i in range(11))),
    (10, " ".join(f"d{i}" for i in range(11))),
]


@pytest.fixture(scope="module")
def short_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_short"))
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in _DOCS], pa.int64()),
            "text": pa.array([t for _, t in _DOCS], pa.string()),
            "lang": pa.array(["en"] * len(_DOCS), pa.string()),
            "source": pa.array(["synthetic"] * len(_DOCS), pa.string()),
            "n_chars": pa.array([len(t) for _, t in _DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))
    return out


@pytest.fixture(scope="module")
def short_duck(short_dir):
    import duckdb

    con = duckdb.connect()
    path = os.path.join(short_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    yield con
    con.close()


_CASES = [
    "dedup_substring_chunks",
    "dedup_jaccard",
    "dedup_containment",
    "dedup_lines",
    "dedup_exact",
    "dedup_exact_norm",
    "dedup_clusters",
    "decontamination_check",
    "repetition_filter",
    "bigram_counts",
    "text_stats",
    "token_count",
    "doc_fingerprint",
]

# rows-only operators (hash-family-specific, no SQL oracle): assert
# they survive pathological docs without ANSI crashes
_ROWS_ONLY_CASES = ["dedup_minhash_lsh", "dedup_simhash"]


@pytest.mark.parametrize("name", _ROWS_ONLY_CASES)
def test_short_docs_no_crash(name, spark, short_dir):
    import __spark_entry__ as e

    assert e.queries()[name](spark, short_dir).count() >= 0


@pytest.mark.parametrize("name", _CASES)
def test_short_docs_oracle_parity(name, spark, short_dir, short_duck):
    import __spark_entry__ as e

    df = e.queries()[name](spark, short_dir)
    report = compare_query(df, e.oracle_sql()[name], short_duck)
    assert report["count_match"], report
    assert report["schema_match"], report
    assert report["value_match"], report


def test_substring_chunks_short_docs_emit_no_windows(spark, short_dir):
    """Docs with <20 tokens must contribute zero chunk hashes — no
    fabricated whole-doc chunk, no bogus negative-slice tail window."""
    import __spark_entry__ as e

    rows = (
        e.queries()["dedup_substring_chunks"](spark, short_dir).collect()
    )
    ids = {r["doc_id"] for r in rows}
    # docs 6 and 7 (exact-duplicate 20-token texts) and doc 8 (whose
    # first window w0..w19 equals that text) share one chunk; the
    # <20-token docs (1-5) must not appear at all
    assert ids == {6, 7, 8}, rows
