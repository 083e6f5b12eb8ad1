"""Multimodal-column operators (SURVEY.md §2.D C5).

Pattern: media payloads are opaque `binary` columns with typed metadata
alongside; decode / feature-extraction runs as Arrow-batched Pandas UDFs
over `mapInPandas`. The image/audio codecs are not in this container, so
the decode step is a clearly-marked deterministic STUB — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and is
what the 100 TB design needs to get right:

- payloads stay in `binary` columns (or pointer structs path/offset/len
  for blob stores) — never stringly-typed,
- decode runs `mapInPandas` so one Python worker processes a whole Arrow
  batch (vectorized I/O amortization), with `maxRecordsPerBatch` tuned
  so a batch of decoded frames fits executor memory,
- metadata extraction that needs no codec (sizes, headers, magic
  numbers) stays in JVM expressions.

The fixture has no real media, so the binary payload is the utf-8
encoding of `documents.text` — byte-level ops are real, codecs stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload column (fixture stand-in)."""
    return docs.withColumn("payload", F.col("text").cast("binary"))


def q_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side (no-codec) metadata over binary payloads: byte length,
    4-byte header as hex (magic-number sniffing), modality classification.
    Pure expressions — this is the fast path that runs BEFORE any decode
    fan-out at scale (cheap filter, prunes the expensive UDF stage)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    n_bytes = F.octet_length("payload")
    return docs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.hex(F.substring(F.col("text"), 1, 4).cast("binary")).alias("header_hex"),
        F.when(n_bytes % 3 == 0, "image")
        .when(n_bytes % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )


ORACLE_MM_METADATA = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  hex(encode(substring(text, 1, 4))) AS header_hex,
  CASE octet_length(encode(text)) % 3
    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
  END AS modality
FROM documents
"""


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("codec", StringType()),
    ]
)


def make_decoder(real_decoder=None):
    """Build the mapInPandas worker: one Arrow batch of (doc_id, payload)
    in, one batch of decoded metadata out. `real_decoder` is the seam
    where a codec (PIL/ffmpeg/...) plugs in; absent one, a deterministic
    fake derives dimensions from the byte content (STUB — clearly
    marked). Returned as a nested function so cloudpickle ships it BY
    VALUE — Python workers need no import path to this package."""

    def decode_batch(frames: Iterator) -> Iterator:
        import pandas as pd

        for pdf in frames:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            if real_decoder is not None:
                raise NotImplementedError(
                    "real media codecs are not available in this environment"
                )
            # deterministic fake-decode (STUB): dims from byte stats;
            # "first" = first character's codepoint (matches SQL unicode())
            first = payloads.map(
                lambda b: ord(b.decode("utf-8", "replace")[0]) if len(b) else 0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (16 + (n_bytes % 640)).astype("int32"),
                    "height": (16 + ((n_bytes * 7) % 480)).astype("int32"),
                    "n_frames": (1 + (first % 16)).astype("int32"),
                    "codec": "fake/v1",
                }
            )

    return decode_batch


def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake-decode over mapInPandas. The plumbing under
    test: binary column in, typed struct-ish schema out, per-batch
    vectorized processing. Deterministic (fake dims are pure functions
    of the bytes) → SQL oracle still possible."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "payload").mapInPandas(
        make_decoder(), schema=DECODE_SCHEMA
    )


ORACLE_MM_DECODE = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  CAST(16 + octet_length(encode(text)) % 640 AS INT) AS width,
  CAST(16 + (octet_length(encode(text)) * 7) % 480 AS INT) AS height,
  CAST(1 + CASE WHEN octet_length(encode(text)) = 0 THEN 0
                ELSE unicode(text[1]) END % 16 AS INT) AS n_frames,
  'fake/v1' AS codec
FROM documents
"""


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan: explode a deterministic frame index per
    payload (every k-th frame), producing (doc_id, frame_idx, frame_off)
    pointers — the pointers-not-pixels pattern that keeps 100 TB of video
    shuffle-free (frames are fetched by the NEXT stage's mapInPandas,
    local to each partition)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    n_frames = 1 + (
        F.when(F.octet_length("payload") == 0, 0).otherwise(
            F.ascii(F.col("text"))
        )
        % 16
    )
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(4))).alias(
            "frame_idx"
        ),
    ).withColumn("frame_off", F.col("frame_idx") * 1024)


ORACLE_MM_FRAME_SAMPLE = """
SELECT doc_id, unnest(range(0, 1 + CASE WHEN octet_length(encode(text)) = 0
                                        THEN 0
                                        ELSE unicode(text[1]) END % 16, 4))
         AS frame_idx,
       unnest(range(0, 1 + CASE WHEN octet_length(encode(text)) = 0
                                THEN 0
                                ELSE unicode(text[1]) END % 16, 4)) * 1024
         AS frame_off
FROM documents
"""


RESIZE_BOX = 224  # target box (the ViT-style square crop baseline)

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
    ]
)


def make_resizer(box: int = RESIZE_BOX):
    """mapInPandas worker for the resize stage: aspect-preserving fit
    into a `box`×`box` target (integer floor math — deterministic). The
    pixel work is the STUB seam (a real kernel resamples the decoded
    buffer); the batch shape (decode-metadata in, per-item output dims
    out) is exactly the production stage."""

    def resize_batch(frames: Iterator) -> Iterator:
        import pandas as pd

        for pdf in frames:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            # scale = box / max(w, h), applied in integer arithmetic
            m = w.where(w >= h, h)
            out_w = (w * box // m).astype("int32")
            out_h = (h * box // m).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return resize_batch


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize pipeline: the fake-decode dims flow into an
    aspect-preserving resize plan. Two chained mapInPandas stages with
    no shuffle between them (narrow dependency — at 100 TB the decoded
    buffers never leave the worker)."""
    decoded = q_mm_decode(spark, sf_dir).select("doc_id", "width", "height")
    return decoded.mapInPandas(make_resizer(), schema=RESIZE_SCHEMA)


ORACLE_MM_RESIZE = f"""
WITH d AS (
  SELECT doc_id,
    CAST(16 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
    CAST(16 + (octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height
  FROM documents
)
SELECT doc_id,
  CAST(width AS INT) AS width,
  CAST(height AS INT) AS height,
  CAST(width * {RESIZE_BOX} // GREATEST(width, height) AS INT) AS out_w,
  CAST(height * {RESIZE_BOX} // GREATEST(width, height) AS INT) AS out_h
FROM d
"""


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: per-payload scalar features (byte
    length, token count, exact mean codepoint) — the embedding-model
    stand-in. Computed with JVM expressions (the honest fast path when
    features don't need a codec); mean = integer codepoint sum / count,
    one double division — bit-identical cross-engine."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    chars = F.split(F.col("text"), "")
    cp_sum = F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, c: acc + F.ascii(c)
    )
    n_chars = F.length("text")
    return docs.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "n_tokens"
        ),
        (cp_sum.cast("double") / n_chars).alias("mean_codepoint"),
    )


ORACLE_MM_FEATURES = r"""
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
  CAST(list_sum(list_transform(string_split(text, ''),
                               c -> CAST(unicode(c) AS BIGINT))) AS DOUBLE)
    / LENGTH(text) AS mean_codepoint
FROM documents
"""


QUERIES = {
    "mm_metadata": q_mm_metadata,
    "mm_decode": q_mm_decode,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_resize": q_mm_resize,
    "mm_features": q_mm_features,
}

ORACLES = {
    "mm_metadata": ORACLE_MM_METADATA,
    "mm_decode": ORACLE_MM_DECODE,
    "mm_frame_sample": ORACLE_MM_FRAME_SAMPLE,
    "mm_resize": ORACLE_MM_RESIZE,
    "mm_features": ORACLE_MM_FEATURES,
}
