"""Local replica of the driver's correctness compare (SURVEY.md §5).

Mirrors the described driver semantics: run the Spark query and the
DuckDB oracle on the same parquet tables, then compare row count, schema
(column names), and an order-insensitive multiset of row values with
columns sorted by name. Values are normalized to plain Python objects;
floats are compared exactly (our queries are engineered to be
bit-deterministic — see gomysql2pg_spark.functions.numeric)."""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}


def _dtype_mismatches(spark_df, oracle_sql: str, duck_con) -> list:
    """Driver-parity dtype check (round-1 lesson, VERDICT.md 'What's wrong').

    The driver canonicalizes via pandas, where DuckDB HUGEINT (the result
    type of SUM over any integer, plain or windowed) lands as float64
    while Spark's long arrives as int64 — same values, different hash.
    ``fetchall()`` (used for the value compare below) converts HUGEINT to
    Python int and hides this, so we additionally inspect the oracle
    relation's DuckDB-level result types. A *nullable* BIGINT is fine —
    pandas floats it on BOTH sides identically — so we compare engine
    types, not pandas dtypes. Also flags array/map/struct-typed output
    columns, which crash the driver's canonicalizer ("unhashable type:
    'list'")."""
    rel = duck_con.sql(oracle_sql)
    o_types = {
        c.lower(): str(t).upper() for c, t in zip(rel.columns, rel.types)
    }
    bad = []
    for f in spark_df.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith(("array", "map", "struct")):
            bad.append((f.name, s, "unhashable-in-driver"))
            continue
        o = o_types.get(f.name.lower())
        if o is None:
            continue
        # HUGEINT and DECIMAL both pandas-ize to float64 → both flagged.
        if s in _SPARK_INT and o not in _DUCK_INT:
            bad.append((f.name, s, f"oracle {o}"))
        elif s in _SPARK_FLOAT and o not in _DUCK_FLOAT:
            bad.append((f.name, s, f"oracle {o}"))
    return bad


def compare_query(spark_df, oracle_sql: str, duck_con) -> dict:
    s_rows = spark_df.collect()
    s_cols = [c.lower() for c in spark_df.columns]
    rel = duck_con.execute(oracle_sql)
    o_cols = [d[0].lower() for d in rel.description]
    o_rows = rel.fetchall()

    report = {
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
        "count_match": len(s_rows) == len(o_rows),
        "schema_match": sorted(s_cols) == sorted(o_cols),
        "dtype_mismatches": _dtype_mismatches(spark_df, oracle_sql, duck_con),
        "value_match": False,
        "sample_diff": None,
    }
    report["dtype_match"] = not report["dtype_mismatches"]
    if not (report["count_match"] and report["schema_match"]):
        return report
    sm = _multiset([tuple(r) for r in s_rows], s_cols)
    om = _multiset(o_rows, o_cols)
    report["value_match"] = sm == om
    if not report["value_match"]:
        only_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
        only_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
        report["sample_diff"] = {"spark_only": only_s, "oracle_only": only_o}
    return report
