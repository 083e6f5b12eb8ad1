"""Validation tests (reference A16 + content-hash upgrade): the
planted-fault fixtures from FIXTURES.md — a removed row is caught by the
count compare (reference parity), a mutated value at EQUAL row count is
caught only by the content hash (exceeds the reference)."""

from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.validate import (
    compare_report,
    compare_tables,
    content_hash,
)


def test_identical_tables_ok(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    r = compare_tables(nation, load_table(spark, sf_dir, "nation"), "nation")
    assert r.count_ok and r.content_ok


def test_removed_row_caught_by_count(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    broken = nation.filter(F.col("n_nationkey") != 7)
    r = compare_tables(nation, broken, "nation")
    assert not r.count_ok and not r.content_ok


def test_mutated_value_caught_only_by_hash(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    mutated = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 7, F.lit("XXXX")).otherwise(
            F.col("n_name")
        ),
    )
    r = compare_tables(nation, mutated, "nation")
    assert r.count_ok  # the reference's check passes → silent corruption
    assert not r.content_ok  # ours catches it


def test_content_hash_partitioning_invariant(spark, sf_dir):
    """The checksum must be identical under any partitioning (integer
    sum is commutative) — the property that makes it safe under AQE."""
    orders = load_table(spark, sf_dir, "orders")
    h1 = content_hash(orders)
    h2 = content_hash(orders.repartition(13))
    h3 = content_hash(orders.coalesce(1))
    assert h1 == h2 == h3


def test_compare_report_shape(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    results = [
        compare_tables(nation, nation, "nation"),
        compare_tables(region, region.limit(3), "region"),
    ]
    rep = compare_report(results)
    assert rep["failed"] == ["region"]
    assert not rep["ok"]


def test_migration_e2e_checksum_detects_wire_corruption(spark, sf_dir, tmp_path):
    """Negative proof for the end-to-end migration gate: flip ONE cell
    value inside the staged COPY wire tree and the canonical checksum
    must change while the row count stays equal — exactly the silent-
    corruption class the reference's count-only compareDb passes."""
    import os

    from pyspark.sql import functions as F

    from gomysql2pg_spark.operators.validation import _canon_checksum
    from gomysql2pg_spark.sinks.jdbc import copy_dump_sink
    from gomysql2pg_spark.sources.copytext import register_copytext

    out_dir = str(tmp_path / "stage")
    nation = load_table(spark, sf_dir, "nation")
    copy_dump_sink(out_dir)(nation.select("n_nationkey", "n_name", "n_regionkey"), "nation")
    register_copytext(spark)
    ddl = "n_nationkey int, n_name string, n_regionkey int"
    canon = ["n_nationkey", "n_name", "n_regionkey"]

    def checksum():
        back = (
            spark.read.format("copytext")
            .schema(ddl)
            .load(os.path.join(out_dir, "nation"))
        )
        row = _canon_checksum(back, "nation", canon).collect()[0]
        return row["n_rows"], row["checksum"]

    n0, h0 = checksum()
    # corrupt one byte of one data file: swap the first region digit
    # on some row (keeps cell count and row count intact)
    tree = os.path.join(out_dir, "nation")
    victim = next(
        os.path.join(tree, f)
        for f in sorted(os.listdir(tree))
        if not f.startswith(("_", ".")) and os.path.getsize(os.path.join(tree, f))
    )
    raw = open(victim, "rb").read()
    lines = raw.split(b"\n")
    cells = lines[0].split(b"\t")
    cells[2] = b"9" if cells[2] != b"9" else b"8"
    lines[0] = b"\t".join(cells)
    open(victim, "wb").write(b"\n".join(lines))
    n1, h1 = checksum()
    assert n1 == n0  # the reference's verdict: unchanged → "ok"
    assert h1 != h0  # the content gate: corruption detected
