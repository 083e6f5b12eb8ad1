"""Property-based tests (hypothesis) over the pure layers: invariants
that must hold for ALL inputs, not just the fixtures — the reference
gets these right only implicitly, we pin them."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from gomysql2pg_spark.functions.patterns import (
    matches_exclusion,
    to_like_pattern,
)
from gomysql2pg_spark.functions.typemap import ColumnMeta, map_type
from gomysql2pg_spark.plans.pagination import (
    numeric_range_predicates,
    page_count,
)


# ---------------------------------------------------------------------------
# pagination invariants: every row lands in EXACTLY one page
# ---------------------------------------------------------------------------


@given(
    lo=st.integers(-(10**9), 10**9),
    span=st.integers(0, 10**6),
    num_pages=st.integers(1, 64),
    probe=st.integers(-(2 * 10**9), 2 * 10**9),
)
@settings(max_examples=300, deadline=None)
def test_numeric_ranges_disjoint_and_complete(lo, span, num_pages, probe):
    hi = lo + span
    preds = numeric_range_predicates("k", lo, hi, num_pages)

    def matches(pred: str, v: int) -> bool:
        if pred == "1=1":
            return True
        clauses = pred.split(" AND ")
        ok = True
        for c in clauses:
            m = re.match(r"k (<|>=) (-?\d+)", c)
            op, bound = m.group(1), int(m.group(2))
            ok &= v < bound if op == "<" else v >= bound
        return ok

    hits = sum(matches(p, probe) for p in preds)
    # completeness even OUTSIDE [lo, hi] (concurrent inserts) and
    # disjointness everywhere
    assert hits == 1, (preds, probe, hits)


@given(
    total=st.integers(0, 10**9),
    page_size=st.integers(1, 10**6),
)
@settings(max_examples=200, deadline=None)
def test_page_count_covers_all_rows(total, page_size):
    n = page_count(total, page_size)
    assert n >= 1
    assert n * page_size >= total
    # never more than one empty trailing page
    assert (n - 1) * page_size < max(total, 1)


# ---------------------------------------------------------------------------
# exclusion patterns: reference semantics (`*` wildcard, ANY-match drops)
# ---------------------------------------------------------------------------

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=127),
    min_size=0,
    max_size=12,
)


@given(name=_name, prefix=_name)
@settings(max_examples=200, deadline=None)
def test_star_pattern_matches_prefix(name, prefix):
    assert matches_exclusion(prefix + name, [prefix + "*"])


@given(name=_name)
@settings(max_examples=100, deadline=None)
def test_exact_pattern_matches_only_itself(name):
    assert matches_exclusion(name, [name])
    assert not matches_exclusion(name + "x", [name])


@given(pattern=_name)
@settings(max_examples=100, deadline=None)
def test_like_translation_star_only(pattern):
    """`*` → `%` and nothing else changes (reference strings.ReplaceAll,
    `test_data/stringTest.go` semantics)."""
    like = to_like_pattern(pattern + "*" + pattern)
    assert like == pattern + "%" + pattern


# ---------------------------------------------------------------------------
# typemap: totality + invariants of the tablemeta.go:96-133 switch
# ---------------------------------------------------------------------------

_KNOWN = [
    "int", "mediumint", "tinyint", "varchar", "char", "text", "tinytext",
    "mediumtext", "longtext", "datetime", "timestamp", "decimal", "double",
    "float", "tinyblob", "blob", "mediumblob", "longblob",
]


_type_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=127),
    min_size=1,
    max_size=12,
)


@given(
    t=st.one_of(st.sampled_from(_KNOWN), _type_name),
    n=st.one_of(st.none(), st.integers(1, 65535)),
    precision=st.one_of(st.none(), st.integers(1, 65)),
    scale=st.one_of(st.none(), st.integers(0, 30)),
)
@settings(max_examples=300, deadline=None)
def test_map_type_total_and_consistent(t, n, precision, scale):
    """map_type never raises, always returns (SparkType, non-empty DDL);
    unknown types pass through verbatim (the default branch)."""
    col = ColumnMeta(
        name="c",
        data_type=t,
        char_max_len=n,
        numeric_precision=precision,
        numeric_scale=scale,
    )
    spark_t, ddl = map_type(col)
    assert spark_t is not None
    assert isinstance(ddl, str) and ddl
    if t not in _KNOWN:
        # pass-through branch emits the original type name
        assert ddl == t


@given(n=st.integers(1, 65535))
@settings(max_examples=50, deadline=None)
def test_varchar_flag_variants(n):
    col = ColumnMeta(name="c", data_type="varchar", char_max_len=n)
    _, plain = map_type(col)
    _, char_len = map_type(col, char_in_length=True)
    _, nvar = map_type(col, use_nvarchar2=True)
    assert plain == f"varchar({n})"
    assert char_len == f"varchar({n} char)"
    assert nvar == f"nvarchar2({n})"


# ---------------------------------------------------------------------------
# round-7 family invariants
# ---------------------------------------------------------------------------


def test_zorder_interleave_bijective_and_nested():
    """Exhaustive check of the ACTUAL SQL interleave expression (the
    DuckDB dialect; the Spark one differs only in the div token): over
    the full 256×256 grid the z-value is a bijection onto [0, 65536),
    and sibling points inside one z>>(2k) block agree on the top
    (8−k) bits of BOTH dimensions — the nesting property file
    skipping relies on."""
    import duckdb

    from gomysql2pg_spark.operators.layout import Z_BITS, _interleave_expr

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH g AS (
          SELECT bx, by FROM range(0, {1 << Z_BITS}) t1(bx),
                             range(0, {1 << Z_BITS}) t2(by)
        )
        SELECT COUNT(*) AS n, COUNT(DISTINCT {_interleave_expr('bx','by','//')}) AS nz,
               MIN({_interleave_expr('bx','by','//')}) AS zmin,
               MAX({_interleave_expr('bx','by','//')}) AS zmax
        FROM g
        """
    ).fetchone()
    assert rows == (65536, 65536, 0, 65535), rows
    # nesting: everything in z-block (z >> 8) shares bx>>4 and by>>4
    bad = con.execute(
        f"""
        WITH g AS (
          SELECT bx, by, {_interleave_expr('bx','by','//')} AS z
          FROM range(0, 256) t1(bx), range(0, 256) t2(by)
        )
        SELECT COUNT(*) FROM (
          SELECT z // 256 AS blk,
                 COUNT(DISTINCT bx // 16) AS dx,
                 COUNT(DISTINCT by // 16) AS dy
          FROM g GROUP BY 1
        ) WHERE dx > 1 OR dy > 1
        """
    ).fetchone()[0]
    assert bad == 0


@given(
    data=st.lists(st.integers(0, 30), min_size=1, max_size=400),
    cuts=st.lists(st.integers(1, 399), max_size=6),
    k=st.integers(2, 32),
)
@settings(max_examples=200, deadline=None)
def test_sketch_containment_theorem(data, cuts, k):
    """The q_freq_sketch_check rule, as a pure spec: split the stream
    at arbitrary points; candidates = union over batches of values
    with batch count > len(batch)/k; every value with GLOBAL count >
    n/k must be a candidate — for EVERY partitioning."""
    from collections import Counter

    bounds = sorted({c for c in cuts if c < len(data)})
    batches, prev = [], 0
    for b in bounds + [len(data)]:
        if b > prev:
            batches.append(data[prev:b])
            prev = b
    candidates = set()
    for batch in batches:
        m = len(batch)
        for v, c in Counter(batch).items():
            if c > m / k:
                candidates.add(v)
    n = len(data)
    for v, c in Counter(data).items():
        if c > n / k:
            assert v in candidates, (v, c, n, k)


@given(
    weights=st.lists(st.integers(1, 10_000), min_size=1, max_size=300),
    n_picks=st.integers(1, 50),
)
@settings(max_examples=200, deadline=None)
def test_systematic_sampling_tick_accounting(weights, n_picks):
    """The q_weighted_systematic_sample rule, as a pure spec: with
    step = total // n_picks (when positive), the tick multiples of
    step partition onto doc slots — each selected doc owns ≥1 tick,
    ticks are exhausted exactly, and a doc's selection implies its
    weight spans a tick (inclusion ∝ weight)."""
    total = sum(weights)
    step = total // n_picks
    if step == 0:
        return
    selected, ticks_owned = [], 0
    cum = 0
    for i, w in enumerate(weights):
        cum += w
        owned = cum // step - (cum - w) // step
        if owned > 0:
            selected.append(i)
            ticks_owned += owned
    assert ticks_owned == total // step
    assert 1 <= len(selected) <= total // step
    # heaviest doc is selected whenever it alone covers a full step
    hv, hi = max((w, i) for i, w in enumerate(weights))
    if hv > step:
        assert hi in selected


# ---------------------------------------------------------------------------
# COPY-text escape grammar: encode must round-trip through a
# spec-faithful decoder for ANY cell content (fuzzed)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.lists(
            st.one_of(
                st.none(),
                st.text(max_size=40),
                st.integers(),
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1)
)
@settings(max_examples=200, deadline=None)
def test_copy_text_roundtrip_fuzz(rows):
    """encode_copy_text vs the strict decoder from the Derby dialect
    matrix, over arbitrary unicode (tabs/newlines/CRs/backslashes/
    literal '\\N') plus NULLs and ints: nothing may be lost, and NULL
    must stay distinguishable from every string."""
    from gomysql2pg_spark.sinks.jdbc import encode_copy_text
    from tests.test_jdbc_roundtrip import _decode_copy_text

    wire = encode_copy_text(rows)
    decoded = _decode_copy_text(wire)
    expected = [
        tuple(None if v is None else str(v) for v in row) for row in rows
    ]
    assert decoded == expected
