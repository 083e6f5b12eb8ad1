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
