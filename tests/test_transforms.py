"""Cell-transform golden tests (reference `cmd/root.go:430-471`)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from gomysql2pg_spark.functions.transforms import (
    apply_cell_transforms,
    bit_hex,
    geometry_hex,
    has_nul,
    invalid_rows,
    lowercase_columns,
    str_val,
    strip_nul,
)


def test_geometry_hex_drops_srid(spark):
    # 4-byte SRID header (LE 4326) + payload bytes, as MySQL returns;
    # lowercase = Go hex.EncodeToString parity (readme.md v0.2.0)
    geom = bytes([0xE6, 0x10, 0x00, 0x00, 0x01, 0x02, 0xAB])
    df = spark.createDataFrame([Row(g=geom)])
    out = df.select(geometry_hex("g").alias("h")).collect()[0]["h"]
    assert out == "0102ab"  # hex minus first 8 chars (root.go:437-438)


def test_bit_hex_drops_first_nibble(spark):
    df = spark.createDataFrame([Row(b=bytes([0x01])), Row(b=bytes([0x00]))])
    vals = [r["h"] for r in df.select(bit_hex("b").alias("h")).collect()]
    assert vals == ["1", "0"]  # root.go:439-440: bit(1) → '0'/'1'


def test_bit_hex_wide_values(spark):
    """The reference's [1:] slice is byte-layout-dependent: bit(8) is
    one byte → one nibble survives; bit(64) is eight bytes → 15 hex
    chars survive (`root.go:439-440` applies the same slice at every
    width). Golden values match Go hex.EncodeToString(x)[1:]."""
    rows = [
        Row(b=bytes([0xAB])),  # bit(8): "ab"[1:] == "b"
        Row(b=bytes([0x80, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x01])),
        Row(b=bytes([0xFF] * 8)),  # bit(64) all-ones
        Row(b=None),  # NULL passes through as NULL
    ]
    df = spark.createDataFrame(rows, "b binary")
    vals = [r["h"] for r in df.select(bit_hex("b").alias("h")).collect()]
    assert vals == ["b", "000000000000001", "fffffffffffffff", None]


def test_geometry_hex_degenerate_values(spark):
    """Empty / header-only / sub-header geometries: Go's [8:] would
    panic below 8 hex chars — the engine clamps to '' instead (the
    documented divergence for malformed input); exactly-header yields
    '' in both. NULL stays NULL."""
    rows = [
        Row(g=b""),  # empty → '' (Go: panic)
        Row(g=bytes([0xE6, 0x10])),  # sub-header → '' (Go: panic)
        Row(g=bytes([0xE6, 0x10, 0x00, 0x00])),  # exactly header → ''
        Row(g=None),
    ]
    df = spark.createDataFrame(rows, "g binary")
    vals = [
        r["h"] for r in df.select(geometry_hex("g").alias("h")).collect()
    ]
    assert vals == ["", "", "", None]


def test_strip_nul_and_side_channel(spark):
    df = spark.createDataFrame(
        [Row(t="ab\x00cd"), Row(t="clean")], "t string"
    )
    out = [r["s"] for r in df.select(strip_nul("t").alias("s")).collect()]
    assert out == ["abcd", "clean"]
    flagged = df.filter(has_nul("t")).collect()
    assert [r["t"] for r in flagged] == ["ab\x00cd"]


def test_apply_cell_transforms_dispatch(spark):
    df = spark.createDataFrame(
        [
            Row(
                ID=1,
                Name="a\x00b",
                Geo=bytes([0, 0, 0, 0, 0x99]),
                Bit=bytes([0x01]),
                Payload=bytes([0xFF]),
            )
        ]
    )
    types = {
        "ID": "int",
        "Name": "varchar",
        "Geo": "geometry",
        "Bit": "bit",
        "Payload": "blob",
    }
    out = apply_cell_transforms(df, types)
    assert out.columns == ["id", "name", "geo", "bit", "payload"]
    row = out.collect()[0]
    assert row["name"] == "ab"
    assert row["geo"] == "99"
    assert row["bit"] == "1"
    assert bytes(row["payload"]) == bytes([0xFF])  # blob passthrough

    bad = invalid_rows(df, types).collect()
    assert len(bad) == 1  # the NUL-bearing row is side-channeled


def test_lowercase_and_strval(spark):
    df = spark.createDataFrame([Row(A=1, B=2.5)])
    low = lowercase_columns(df)
    assert low.columns == ["a", "b"]
    s = low.select(str_val("a").alias("s")).collect()[0]["s"]
    assert s == "1"
