"""Branch-by-branch tests of the MySQL→(Spark, PG) type map
(reference `cmd/tablemeta.go:96-133`, FIXTURES.md typemap_matrix)."""

import pytest
from pyspark.sql import types as T

from gomysql2pg_spark.functions.typemap import (
    ColumnMeta,
    map_column,
    map_type,
    render_default,
    to_struct_type,
)


CASES = [
    # (mysql type, kwargs, expected spark type, expected pg ddl)
    ("int", {}, T.IntegerType(), "int"),
    ("mediumint", {}, T.IntegerType(), "int"),
    ("tinyint", {}, T.IntegerType(), "int"),
    ("varchar", {"char_max_len": 50}, T.StringType(), "varchar(50)"),
    ("char", {"char_max_len": 8}, T.StringType(), "char(8)"),
    ("text", {}, T.StringType(), "text"),
    ("tinytext", {}, T.StringType(), "text"),
    ("mediumtext", {}, T.StringType(), "text"),
    ("longtext", {}, T.StringType(), "text"),
    ("datetime", {}, T.TimestampNTZType(), "timestamp"),
    ("timestamp", {}, T.TimestampType(), "timestamp"),
    (
        "decimal",
        {"numeric_precision": 12, "numeric_scale": 2},
        T.DecimalType(12, 2),
        "decimal(12,2)",
    ),
    (
        "decimal",
        {"numeric_precision": 10, "numeric_scale": None},
        T.DecimalType(10, 0),
        "decimal(10)",
    ),
    ("double", {}, T.DoubleType(), "double precision"),
    ("float", {}, T.DoubleType(), "double precision"),
    ("tinyblob", {}, T.BinaryType(), "bytea"),
    ("blob", {}, T.BinaryType(), "bytea"),
    ("mediumblob", {}, T.BinaryType(), "bytea"),
    ("longblob", {}, T.BinaryType(), "bytea"),
    # pass-through branch (tablemeta.go:131-132)
    ("bigint", {}, T.LongType(), "bigint"),
    ("date", {}, T.DateType(), "date"),
    ("json", {}, T.StringType(), "json"),
    ("bit", {}, T.BinaryType(), "bit"),
    ("geometry", {}, T.BinaryType(), "geometry"),
]


@pytest.mark.parametrize("mysql,kw,spark_t,pg", CASES)
def test_map_type_branches(mysql, kw, spark_t, pg):
    col = ColumnMeta(name="c", data_type=mysql, **kw)
    st, pt = map_type(col)
    assert st == spark_t
    assert pt == pg


UNSIGNED_CASES = [
    # documented divergence from tablemeta.go:96-133 (which drops
    # `unsigned`): widen to the narrowest lossless type
    ("tinyint", "tinyint(3) unsigned", T.IntegerType(), "int"),
    ("smallint", "smallint(5) unsigned", T.IntegerType(), "int"),
    ("mediumint", "mediumint(8) unsigned", T.IntegerType(), "int"),
    ("int", "int(10) unsigned", T.LongType(), "bigint"),
    ("int", "int(10) unsigned zerofill", T.LongType(), "bigint"),
    ("bigint", "bigint(20) unsigned", T.DecimalType(20, 0), "decimal(20)"),
]


@pytest.mark.parametrize("mysql,coltype,spark_t,pg", UNSIGNED_CASES)
def test_unsigned_integers_widened(mysql, coltype, spark_t, pg):
    col = ColumnMeta(name="c", data_type=mysql, column_type=coltype)
    st, pt = map_type(col)
    assert st == spark_t
    assert pt == pg


def test_signed_column_type_unchanged():
    # a populated COLUMN_TYPE without `unsigned` must not alter mapping
    col = ColumnMeta(name="c", data_type="bigint", column_type="bigint(20)")
    assert map_type(col) == (T.LongType(), "bigint")
    col = ColumnMeta(name="c", data_type="int", column_type="int(11)")
    assert map_type(col) == (T.IntegerType(), "int")


def test_varchar_flag_variants():
    col = ColumnMeta(name="c", data_type="varchar", char_max_len=50)
    assert map_type(col, char_in_length=True)[1] == "varchar(50 char)"
    assert map_type(col, use_nvarchar2=True)[1] == "nvarchar2(50)"
    col = ColumnMeta(name="c", data_type="char", char_max_len=8)
    assert map_type(col, char_in_length=True)[1] == "char(8 char)"


def test_nullability_and_defaults():
    # tablemeta.go:76-94: NOT NULL + quoted string defaults
    c = ColumnMeta(
        name="C_Nullable_Default",
        data_type="varchar",
        char_max_len=20,
        is_nullable="YES",
        default="x",
    )
    m = map_column(c)
    assert m.name == "c_nullable_default"  # lowercased
    assert m.nullable
    assert m.default_sql == " default 'x'"

    n = ColumnMeta(
        name="n", data_type="int", is_nullable="NO", default="42"
    )
    mn = map_column(n)
    assert not mn.nullable
    assert mn.default_sql == " default 42"  # numeric: unquoted
    assert render_default(ColumnMeta(name="x", data_type="int")) == ""

    # tablemeta.go:84-91 quotes ONLY varchar/char — a timestamp default
    # like CURRENT_TIMESTAMP must stay an expression, not a literal
    ts = ColumnMeta(
        name="ts",
        data_type="timestamp",
        is_nullable="YES",
        default="CURRENT_TIMESTAMP",
    )
    assert map_column(ts).default_sql == " default CURRENT_TIMESTAMP"
    ch = ColumnMeta(
        name="c", data_type="char", char_max_len=1, is_nullable="YES",
        default="y",
    )
    assert map_column(ch).default_sql == " default 'y'"


def test_struct_type_ordering():
    cols = [
        ColumnMeta(name="b", data_type="int", ordinal_position=2),
        ColumnMeta(name="a", data_type="bigint", ordinal_position=1),
    ]
    st = to_struct_type(cols)
    assert [f.name for f in st.fields] == ["a", "b"]
    assert st.fields[0].dataType == T.LongType()
