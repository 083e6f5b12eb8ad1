"""Exclusion-pattern compiler tests (reference `cmd/root.go:227-247`,
`test_data/stringTest.go:13-37`)."""

from pyspark.sql import Row

from gomysql2pg_spark.functions.patterns import (
    excluded_tables,
    exclusion_predicate,
    exclusion_sql,
    matches_exclusion,
    to_like_pattern,
)


def test_like_pattern_translation():
    assert to_like_pattern("tmp_*") == "tmp_%"
    assert to_like_pattern("*_bak") == "%_bak"
    assert to_like_pattern("exact") == "exact"


def test_exclusion_sql_matches_reference_shape():
    # the string the reference builds (stringTest.go output shape)
    sql = exclusion_sql("table_name", ["tmp_*", "log"])
    assert sql == (
        "and table_name not like 'tmp_%' and table_name not like 'log'"
    )


def test_driver_side_semantics():
    names = ["orders", "tmp_a", "tmp_b", "log", "lineitem"]
    assert excluded_tables(names, ["tmp_*", "log"]) == ["orders", "lineitem"]
    assert matches_exclusion("tmp_x", ["tmp_*"])
    assert not matches_exclusion("orders", ["tmp_*"])
    assert excluded_tables(names, []) == names


def test_predicate_on_dataframe(spark):
    df = spark.createDataFrame(
        [Row(t="orders"), Row(t="tmp_a"), Row(t="log")]
    )
    kept = [
        r["t"]
        for r in df.filter(
            exclusion_predicate("t", ["tmp_*", "log"])
        ).collect()
    ]
    assert kept == ["orders"]
