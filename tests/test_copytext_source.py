"""The COPY-text data source (sources/copytext.py) + the distributed
Column-expression encoder (sinks.jdbc.copy_text_line): hostile-value
round-trips, encoder parity with the Python encoder, fail-loudly
corrupt-file contracts, and file-granular scan partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.sinks.jdbc import copy_text_line, encode_copy_text
from gomysql2pg_spark.sources.copytext import register_copytext

HOSTILE = [
    (1, "plain", "tab\there"),
    (2, "new\nline", "cr\rhere"),
    (3, "back\\slash", "\\N"),  # literal backslash-N, NOT null
    (4, "", None),  # empty string ≠ NULL
    (5, "trailing\\", "\t\n\r"),
    (6, "αβγ unicode", "mixed\\t literal"),
]
SCHEMA = "id bigint, a string, b string"


def _write_wire(spark, tmp_path, rows, n_parts=1):
    df = spark.createDataFrame(rows, SCHEMA).repartition(n_parts)
    out = str(tmp_path / "wire")
    (
        df.select(
            copy_text_line([F.col("id"), F.col("a"), F.col("b")]).alias(
                "value"
            )
        )
        .write.mode("overwrite")
        .text(out)
    )
    return out


def test_hostile_roundtrip_and_encoder_parity(spark, tmp_path):
    out = _write_wire(spark, tmp_path, HOSTILE)
    register_copytext(spark)
    got = (
        spark.read.format("copytext").schema(SCHEMA).load(out).collect()
    )
    assert sorted(tuple(r) for r in got) == sorted(HOSTILE)
    # the JVM encoder's wire lines equal the Python encoder's, line for
    # line (same grammar, same formatting for long/string cells)
    wire_lines = set()
    for f in os.listdir(out):
        if f.startswith(("_", ".")):
            continue
        with open(os.path.join(out, f), encoding="utf-8") as fh:
            wire_lines.update(ln[:-1] for ln in fh if ln.endswith("\n"))
    py_lines = set(encode_copy_text(HOSTILE).split("\n")[:-1])
    assert wire_lines == py_lines


def test_scan_parallelism_is_file_granular(spark, tmp_path):
    out = _write_wire(spark, tmp_path, HOSTILE, n_parts=3)
    n_files = sum(
        1 for f in os.listdir(out) if not f.startswith(("_", "."))
    )
    assert n_files == 3
    register_copytext(spark)
    df = spark.read.format("copytext").schema(SCHEMA).load(out)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == len(HOSTILE)


@pytest.mark.parametrize(
    "wire,msg",
    [
        ("1\ta\t\\x\n", "unknown escape"),
        ("1\ta\tb\\\n", "dangling backslash"),
        ("1\tonly-two-cells\n", "cells"),
    ],
)
def test_corrupt_wire_fails_loudly(spark, tmp_path, wire, msg):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "part-000.txt").write_text(wire, encoding="utf-8")
    register_copytext(spark)
    df = spark.read.format("copytext").schema(SCHEMA).load(str(d))
    with pytest.raises(Exception, match=msg):
        df.collect()


def test_schema_is_mandatory(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    register_copytext(spark)
    with pytest.raises(Exception, match="supply"):
        spark.read.format("copytext").load(str(d)).collect()


def test_typed_casting_date_double_bool(spark, tmp_path):
    d = tmp_path / "typed"
    d.mkdir()
    (d / "part-000.txt").write_text(
        "1\t1.5\t2020-02-29\tt\n2\t\\N\t\\N\tfalse\n", encoding="utf-8"
    )
    register_copytext(spark)
    rows = sorted(
        tuple(r)
        for r in spark.read.format("copytext")
        .schema("k bigint, x double, d date, b boolean")
        .load(str(d))
        .collect()
    )
    import datetime

    assert rows == [
        (1, 1.5, datetime.date(2020, 2, 29), True),
        (2, None, None, False),
    ]


def test_fuzz_parity_jvm_vs_python_encoder(spark, tmp_path):
    """Seeded fuzz: 200 rows of adversarial random strings (control
    chars, backslash runs, tabs/newlines/CR, unicode, the NULL marker
    as data, NULLs) must produce byte-identical wire from the JVM
    Column encoder and the Python encoder, and round-trip through the
    copytext source unchanged."""
    import random

    rng = random.Random(0xC0DE)
    alphabet = "ab\\\t\n\rαβ\x00NX "

    def rand_cell():
        if rng.random() < 0.1:
            return None
        if rng.random() < 0.1:
            return "\\N"
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 12))
        )

    rows = [(i, rand_cell(), rand_cell()) for i in range(200)]
    # NUL bytes are not valid in PG text values; the engine's NUL
    # sanitizer (functions/transforms) runs upstream — strip here the
    # same way to keep the fuzz in-domain
    rows = [
        (
            i,
            a.replace("\x00", "") if a is not None else None,
            b.replace("\x00", "") if b is not None else None,
        )
        for i, a, b in rows
    ]
    out = _write_wire(spark, tmp_path, rows)
    wire_lines = set()
    for f in os.listdir(out):
        if f.startswith(("_", ".")):
            continue
        with open(os.path.join(out, f), encoding="utf-8") as fh:
            wire_lines.update(ln[:-1] for ln in fh if ln.endswith("\n"))
    py_lines = set(encode_copy_text(rows).split("\n")[:-1])
    assert wire_lines == py_lines
    register_copytext(spark)
    got = {
        tuple(r)
        for r in spark.read.format("copytext")
        .schema(SCHEMA)
        .load(out)
        .collect()
    }
    assert got == set(rows)
