"""JDBC source/sink option construction + COPY text encoding (no live
database in this environment — execution paths are gated; the plan and
wire-format logic is what's tested)."""

from gomysql2pg_spark.plans.pagination import plan_pages
from gomysql2pg_spark.sinks.jdbc import (
    JdbcSinkConfig,
    encode_copy_text,
    writer_options,
)
from gomysql2pg_spark.sources.jdbc import (
    JdbcSourceConfig,
    catalog_query,
    partitioned_reader_options,
    reader_options,
)


def test_reader_options_basic():
    cfg = JdbcSourceConfig(
        url="jdbc:mysql://h:3306/db", user="u", password="p"
    )
    opts = reader_options(cfg, dbtable="orders")
    assert opts["dbtable"] == "orders"
    assert opts["fetchsize"] == "10000"
    assert opts["useCursorFetch"] == "true"


def test_reader_query_mode_is_schema_probe():
    # query= replaces the reference's `where 1=0` probe (root.go:306)
    cfg = JdbcSourceConfig(url="jdbc:mysql://h/db")
    opts = reader_options(cfg, query="select a, b from t where x > 0")
    assert "dbtable" not in opts
    assert opts["query"].startswith("select a, b")


def test_partitioned_reader_caps_parallelism():
    cfg = JdbcSourceConfig(url="jdbc:mysql://h/db", max_parallel=8)
    opts = partitioned_reader_options(
        cfg, "orders", "o_orderkey", 1, 1_000_000, num_partitions=64
    )
    assert opts["numPartitions"] == "8"  # capped like the ref semaphore
    assert opts["partitionColumn"] == "o_orderkey"


def test_catalog_query_shape():
    q = catalog_query("and table_name not like 'tmp_%'")
    assert "information_schema.tables" in q
    assert q.endswith("not like 'tmp_%'")


def test_writer_options_truncate_mode():
    cfg = JdbcSinkConfig(url="jdbc:postgresql://h/db", truncate=True)
    opts = writer_options(cfg, "orders")
    assert opts["truncate"] == "true"
    assert opts["reWriteBatchedInserts"] == "true"


def test_encode_copy_text_wire_format():
    rows = [
        (1, "plain", None),
        (2, "tab\there", "nl\nthere"),
        (3, "back\\slash", "cr\rhere"),
    ]
    out = encode_copy_text(rows)
    lines = out.split("\n")
    assert lines[0] == "1\tplain\t\\N"
    assert lines[1] == "2\ttab\\there\tnl\\nthere"
    assert lines[2] == "3\tback\\\\slash\tcr\\rhere"
    assert out.endswith("\n")


def test_hashmod_predicates_are_portable_sql(spark, sf_dir):
    """The composite-PK predicates must be executable BOTH by Spark and
    by the MySQL source — crc32/concat_ws exist in both dialects."""
    from gomysql2pg_spark.catalog import load_table
    from pyspark.sql import functions as F

    plan = plan_pages(
        "lineitem", 1000, 300, ["l_orderkey", "l_linenumber"], False
    )
    li = load_table(spark, sf_dir, "lineitem")
    n = sum(li.filter(F.expr(p)).count() for p in plan.predicates)
    assert n == li.count()
