"""Exclusion-pattern compiler (`/root/reference/cmd/root.go:227-247`,
scratch harness `test_data/stringTest.go:13-37`).

Reference semantics: each `exclude:` entry uses `*` as wildcard; each
becomes `table_name NOT LIKE '<p with * → %>'`; entries are AND-chained
(a table survives only if it matches NO pattern). Entries without `*`
are exact (`NOT LIKE 'x'` ≡ `<> 'x'`).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_like_pattern(pattern: str) -> str:
    """`*` → `%` (the only wildcard the reference supports)."""
    return pattern.replace("*", "%")


def exclusion_predicate(col: Column | str, patterns: list[str]) -> Column:
    """AND-chain of NOT LIKE — True ⇔ the value is kept."""
    c = F.col(col) if isinstance(col, str) else col
    if not patterns:
        return F.lit(True)
    return reduce(
        lambda a, b: a & b,
        [~c.like(to_like_pattern(p)) for p in patterns],
    )


def matches_exclusion(name: str, patterns: list[str]) -> bool:
    """Driver-side evaluation of the same semantics (used where the list
    of names is already local, e.g. the table list from a catalog)."""
    import re

    for p in patterns:
        rx = "^" + re.escape(p).replace(r"\*", ".*") + "$"
        if re.match(rx, name):
            return True
    return False


def excluded_tables(names: list[str], patterns: list[str]) -> list[str]:
    """Keep only names matching NO exclusion pattern (`root.go:227-247`)."""
    return [n for n in names if not matches_exclusion(n, patterns)]


def exclusion_sql(column: str, patterns: list[str]) -> str:
    """The SQL text the reference builds (`root.go:237-243`) — kept for
    DDL-level parity tests."""
    return " ".join(
        f"and {column} not like '{to_like_pattern(p)}'" for p in patterns
    )
