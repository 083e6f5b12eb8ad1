"""File-format sources & sinks: CSV / JSON(L) / ORC / Parquet.

The reference reads only MySQL and writes only PostgreSQL (SURVEY.md
§2.C: "File formats: none"); a Spark-native engine gets the file
surface for free and a 100 TB pipeline lives on it. This module pins
the conventions that make the formats interchangeable here:

- schemas are explicit on read (schema-on-read drift is the classic
  CSV/JSON silent-corruption source; inference is allowed only when
  the caller passes schema=None deliberately),
- column names are lowercased like every other source (reference
  `cmd/root.go:327-329`),
- timestamps are written/parsed as microsecond ISO-8601 UTC so a
  parquet→csv→parquet round trip is lossless at the engine's
  timestamp precision,
- CSV uses explicit quote/escape/null conventions (empty string vs
  NULL is representable: NULL renders as the empty *unquoted* field,
  empty string as "").

Scale notes: all four formats split by file; CSV/JSON additionally
split by byte range only when uncompressed — the writers here emit
uncompressed parts so downstream scans parallelize. Writers partition
by the DataFrame's partitioning (call `repartition(n)` upstream to
control file count / size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..functions.transforms import lowercase_columns

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_CSV_COMMON = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "timestampFormat": TS_FMT,
}
# NULL renders as the MySQL-dump sentinel \N (the reference's source
# world), '' as quoted "" — distinct on disk AND on read-back (with
# nullValue="" the reader folds quoted-empty into NULL too; a sentinel
# is the only lossless convention). Caveat: a *data* string equal to
# literal \N would read back as NULL — unrepresentable, like every
# sentinel scheme.
_CSV_WRITE_OPTS = {
    **_CSV_COMMON,
    "nullValue": "\\N",
    "emptyValue": '""',
    # preserve significant whitespace (the writer trims by default)
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}
_CSV_READ_OPTS = {
    **_CSV_COMMON,
    "nullValue": "\\N",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    # quoted fields may span lines; costs byte-range splittability on
    # read of files that actually need it — our writers quote newlines,
    # so correctness wins
    "multiLine": "true",
}


def read_csv(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read.options(**_CSV_READ_OPTS)
    reader = reader.schema(schema) if schema is not None else reader.option(
        "inferSchema", "true"
    )
    return lowercase_columns(reader.csv(path))


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.options(**_CSV_WRITE_OPTS).mode(mode).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read.option("timestampFormat", TS_FMT)
    if schema is not None:
        reader = reader.schema(schema)
    return lowercase_columns(reader.json(path))


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.option("timestampFormat", TS_FMT).mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return lowercase_columns(spark.read.orc(path))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return lowercase_columns(spark.read.parquet(path))


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


FORMATS = {
    "csv": (read_csv, write_csv),
    "json": (read_json, write_json),
    "orc": (read_orc, write_orc),
    "parquet": (read_parquet, write_parquet),
}
