"""Deterministic numeric helpers for cross-engine-exact aggregation.

Money/quantity columns in the fixtures are doubles carrying exact
2-decimal values. Summing doubles is order-dependent, so a Spark sum and
a DuckDB (oracle) sum can differ in the last bits and fail a value-hash
compare. We therefore aggregate in EXACT integer space:

    cents(x)   = CAST(ROUND(x * 100) AS BIGINT)
    whole(x)   = CAST(ROUND(x) AS BIGINT)

`x * 100` is the same IEEE double in every engine, and rounding the same
double yields the same integer (half-up vs half-away differs only for
negative exact-.5 doubles, absent here). Integer sums are exact and
associative, so any aggregation order gives the identical result. The
final division back to currency (`/ 100.0`) is a single correctly
rounded IEEE op — also identical everywhere.

This is also the right 100 TB design: bigint aggregation is cheaper than
decimal and immune to float non-determinism across partitionings/AQE
re-plans (a correctness property: re-running with different partition
counts yields bit-identical results).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(c: Column | str) -> Column:
    """Exact integer cents of a 2-decimal double column.

    try_cast, not cast: a NaN/±Inf measurement (upstream sensor junk,
    a bad join product) becomes NULL — missing money, skipped by
    aggregation — instead of an ANSI CAST_OVERFLOW that kills the
    whole job (r12 poisoned-numerics audit: one NaN in a money column
    took down 11 operators). For every FINITE value try_cast ≡ cast,
    so the exact-integer discipline and all oracle hashes are
    unchanged."""
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c * F.lit(100)).try_cast("long")


def whole(c: Column | str) -> Column:
    """Exact integer value of a whole-number double column (same
    NaN→NULL try_cast contract as `cents`)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c).try_cast("long")


# SQL-side equivalents (DuckDB oracle snippets), kept adjacent so the two
# definitions can't drift:
SQL_CENTS = "TRY_CAST(ROUND(({x}) * 100) AS BIGINT)"
SQL_WHOLE = "TRY_CAST(ROUND({x}) AS BIGINT)"


def sql_cents(x: str) -> str:
    return SQL_CENTS.format(x=x)


def sql_whole(x: str) -> str:
    return SQL_WHOLE.format(x=x)


# DuckDB's SUM over ANY integer type returns HUGEINT (int128), which the
# driver's pandas-based canonicalizer widens to float64 — while Spark's
# sum(long) stays int64. Same values, different value-hash (round-1
# lesson: 12/50 driver failures from exactly this). Every integer SUM in
# an oracle's OUTPUT must therefore carry an outer CAST back to BIGINT.
# Verified empirically: SUM(BIGINT)->float64, CAST(SUM(..) AS BIGINT)->
# int64, CAST(SUM(..) FILTER (..) AS BIGINT)->int64, SUM OVER ->float64.
SQL_SUM = "CAST(SUM({x}) AS BIGINT)"


def sql_sum(x: str) -> str:
    """Integer-exact SUM for oracle output columns (int64, not HUGEINT)."""
    return SQL_SUM.format(x=x)


def sql_sum_filter(x: str, cond: str) -> str:
    """SUM(..) FILTER (WHERE ..) with the same outer BIGINT cast."""
    return f"CAST(SUM({x}) FILTER (WHERE {cond}) AS BIGINT)"


def sql_sum_over(x: str, window: str) -> str:
    """Window SUM with the outer BIGINT cast (SUM OVER is HUGEINT too)."""
    return f"CAST(SUM({x}) OVER {window} AS BIGINT)"
