"""MySQL → (Spark in-flight type, PostgreSQL DDL type) mapping.

Faithful rebuild of the reference's type switch
(`/root/reference/cmd/tablemeta.go:96-133`) plus the nullability /
default rendering (`tablemeta.go:76-94`), as data + pure functions —
unit-tested branch-by-branch (SURVEY.md §1.2).

The Spark side of each branch is the type a DataFrame column carries
in-flight between a JDBC source and sink; the PG side is the DDL our
generator emits. Config flags mirror `example.yml:15-16`:
`char_in_length` ⇒ `varchar(N char)`, `use_nvarchar2` ⇒ `nvarchar2(N)`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class ColumnMeta:
    """One row of information_schema.COLUMNS, as the reference consumes
    it (`tablemeta.go:62`)."""

    name: str
    data_type: str  # lowercase MySQL data_type, e.g. "varchar"
    char_max_len: int | None = None
    is_nullable: str = "YES"  # 'YES' | 'NO'
    default: str | None = None
    numeric_precision: int | None = None
    numeric_scale: int | None = None  # None models the 'null' scale case
    ordinal_position: int = 0
    comment: str = ""
    column_type: str = ""  # full COLUMN_TYPE, e.g. "bigint(20) unsigned"


@dataclass(frozen=True)
class MappedColumn:
    name: str
    spark_type: T.DataType
    pg_type: str
    nullable: bool
    default_sql: str  # rendered DDL fragment ('' if none)


#: MySQL types whose DEFAULT values get single-quoted. The reference
#: quotes ONLY varchar and char (`tablemeta.go:84-91`); everything else
#: is emitted verbatim — critically, a timestamp column's DEFAULT
#: CURRENT_TIMESTAMP must NOT become the invalid literal
#: 'CURRENT_TIMESTAMP' in the generated CREATE TABLE.
_QUOTED_DEFAULT_TYPES = {
    "char",
    "varchar",
}


def map_type(
    col: ColumnMeta,
    char_in_length: bool = False,
    use_nvarchar2: bool = False,
) -> tuple[T.DataType, str]:
    """The `tablemeta.go:96-133` switch, branch for branch.

    DOCUMENTED DIVERGENCE from the reference: `tablemeta.go:96-133`
    keys on DATA_TYPE only, silently dropping the `unsigned` attribute
    — a `bigint unsigned` value above 2^63-1 would overflow the signed
    target and corrupt data. Here the full COLUMN_TYPE is consulted
    when provided and unsigned integers are widened to the narrowest
    lossless type: u-tinyint/u-smallint/u-mediumint fit int;
    u-int → bigint; u-bigint → decimal(20,0). Zerofill is display-only
    padding and is intentionally ignored, like the reference."""
    t = col.data_type.lower()
    n = col.char_max_len
    unsigned = "unsigned" in col.column_type.lower()

    if unsigned and t in ("tinyint", "smallint", "mediumint", "int", "bigint"):
        if t in ("tinyint", "smallint", "mediumint"):  # max 2^24 < 2^31
            return T.IntegerType(), "int"
        if t == "int":  # max 2^32-1 > 2^31-1
            return T.LongType(), "bigint"
        return T.DecimalType(20, 0), "decimal(20)"  # u-bigint max 2^64-1

    if t in ("int", "mediumint", "tinyint"):  # tablemeta.go:97-98
        return T.IntegerType(), "int"
    if t == "varchar":  # tablemeta.go:99-107
        if use_nvarchar2:
            return T.StringType(), f"nvarchar2({n})"
        if char_in_length:
            return T.StringType(), f"varchar({n} char)"
        return T.StringType(), f"varchar({n})"
    if t == "char":  # tablemeta.go:108-113
        if char_in_length:
            return T.StringType(), f"char({n} char)"
        return T.StringType(), f"char({n})"
    if t in ("text", "tinytext", "mediumtext", "longtext"):  # :114-115
        return T.StringType(), "text"
    if t == "datetime":  # tablemeta.go:116-117; zone-less → NTZ in-flight
        return T.TimestampNTZType(), "timestamp"
    if t == "timestamp":
        return T.TimestampType(), "timestamp"
    if t == "decimal":  # tablemeta.go:118-123
        p = col.numeric_precision or 10
        if col.numeric_scale is None:  # the numericScale == "null" case
            return T.DecimalType(p, 0), f"decimal({p})"
        return (
            T.DecimalType(p, col.numeric_scale),
            f"decimal({p},{col.numeric_scale})",
        )
    if t in ("double", "float"):  # tablemeta.go:124-127 (widened, v0.2.5)
        return T.DoubleType(), "double precision"
    if t in ("tinyblob", "blob", "mediumblob", "longblob"):  # :128-129
        return T.BinaryType(), "bytea"

    # default branch (tablemeta.go:131-132): DDL type passed through
    # verbatim; pick the natural Spark in-flight type per JDBC mapping
    spark_by_passthrough = {
        "bigint": T.LongType(),
        "smallint": T.IntegerType(),
        "date": T.DateType(),
        "time": T.StringType(),
        "year": T.IntegerType(),
        "enum": T.StringType(),
        "set": T.StringType(),
        "json": T.StringType(),
        "bit": T.BinaryType(),
        "geometry": T.BinaryType(),
    }
    return spark_by_passthrough.get(t, T.StringType()), t


def render_default(col: ColumnMeta) -> str:
    """Default-value DDL fragment (`tablemeta.go:76-94`): string-typed
    defaults single-quoted, others verbatim, absent → ''."""
    if col.default is None:
        return ""
    if col.data_type.lower() in _QUOTED_DEFAULT_TYPES:
        return f" default '{col.default}'"
    return f" default {col.default}"


def map_column(
    col: ColumnMeta,
    char_in_length: bool = False,
    use_nvarchar2: bool = False,
) -> MappedColumn:
    spark_type, pg_type = map_type(col, char_in_length, use_nvarchar2)
    return MappedColumn(
        name=col.name.lower(),  # lowercased everywhere (root.go:327-329)
        spark_type=spark_type,
        pg_type=pg_type,
        nullable=col.is_nullable.upper() != "NO",
        default_sql=render_default(col),
    )


def to_struct_type(
    cols: list[ColumnMeta],
    char_in_length: bool = False,
    use_nvarchar2: bool = False,
) -> T.StructType:
    """Ordered Spark schema from information_schema metadata (order =
    ORDINAL_POSITION, `tablemeta.go:62`)."""
    mapped = [
        map_column(c, char_in_length, use_nvarchar2)
        for c in sorted(cols, key=lambda c: c.ordinal_position)
    ]
    return T.StructType(
        [T.StructField(m.name, m.spark_type, m.nullable) for m in mapped]
    )
