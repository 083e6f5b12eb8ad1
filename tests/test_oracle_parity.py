"""End-to-end parity: every queries() entry vs its DuckDB oracle.

This is the local mirror of the driver's CORRECTNESS gate."""

import pytest

from tests.oracle_utils import compare_query


def _pairs():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    return [(name, qs[name], os_.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(name, fn, sql, spark, sf_dir, duck):
    df = fn(spark, sf_dir)
    if sql is None:
        # rows-only check (non-SQL-expressible operator)
        assert df.count() >= 0
        return
    report = compare_query(df, sql, duck)
    assert report["count_match"], report
    assert report["schema_match"], report
    assert report["dtype_match"], report["dtype_mismatches"]
    assert report["value_match"], report


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_registry_invariants_no_oracle_entries_have_gated_twins():
    """Registry meta-gate, mechanizing two process lessons:

    - every rows-only entry (no SQL oracle by design — sketches, LSH
      neighbor sets) must have a deterministic `<name>_check` /
      `<name>_verified` twin that IS oracle-gated, so the driver record
      never depends on an unverifiable row;
    - the driver evaluates the FIRST 50 queries() entries, so the
      priority window must contain only oracle-gated entries — r9
      burned 3 of its 50 slots on no-oracle entries that can never
      produce a hash row."""
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    for name in qs:
        if name in os_:
            continue
        # EXPLICIT variant allowlist: each key is a rows-only variant
        # of the oracle-gated base it maps to (same operator, a
        # different — engine-specific — candidate generator); the base
        # oracle gates the semantics, invariant pytests gate the
        # variant wiring. Deliberately not a name-prefix heuristic: a
        # future <entry>_<suffix> must be added here CONSCIOUSLY or
        # carry its own twin.
        variants = {"dedup_survivors_lsh": "dedup_survivors"}
        if name in variants:
            assert variants[name] in os_, (
                f"{name}'s base {variants[name]} lost its oracle"
            )
            continue
        twin = f"{name}_check" if f"{name}_check" in qs else f"{name}_verified"
        assert twin in qs, f"rows-only entry {name} has no twin"
        assert twin in os_, f"{name}'s twin {twin} is not oracle-gated"
    window = list(qs)[:50]
    ungated = [n for n in window if n not in os_]
    assert not ungated, f"driver window wastes slots on: {ungated}"
