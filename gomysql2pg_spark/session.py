"""SparkSession factory tuned for this engine.

The reference (`/root/reference/cmd/app.go:36-81`) manages raw DB
connection pools; our equivalent of "connection management" is a
well-configured SparkSession. Defaults are chosen for local[N] testing
but every knob matters identically on a 1000-executor cluster:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast conversion — the 100 TB safety net.
- shuffle.partitions sized to cores locally; on a real cluster this (or
  AQE's coalesce) should target ~128MB per shuffle partition.
- Arrow enabled: every Pandas-UDF path in this repo is Arrow-batched.
- UTC session timezone: MySQL DATETIME is zone-less (SURVEY.md §1.2);
  pinning UTC makes timestamp arithmetic reproducible across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gomysql2pg-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
