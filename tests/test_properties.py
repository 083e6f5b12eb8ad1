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
