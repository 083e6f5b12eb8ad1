"""AQE skew-join handling: the runtime safety net for the skew that
salting (operators.pipeline / operators.custom) handles by design.
Builds a join where one key owns ~90% of the fact side and verifies
AQE (a) detects and splits the skewed partition and (b) returns the
same result as the unskewed plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_aqe_splits_skewed_join_partition(spark):
    # fact: 200k rows, 90% on key 0; dim: 100 keys
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise((F.col("id") % 100).cast("long"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )

    confs = {
        # force a shuffle join and make the skew thresholds reachable
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the hot partition is ~180k sequential longs — highly
        # compressible, so the shuffle-byte thresholds must be small to
        # classify it as skewed at test scale
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # NOTE: a groupBy on the join key would reuse the join's hash
        # partitioning and make AQE skip the skew split (splitting would
        # force an extra shuffle) — a real plan-design lesson. A global
        # aggregate leaves AQE free to split.
        joined = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.sum("w").alias("sw")
        )
        n_total, sw_total = joined.collect()[0]
        plan = _plan(joined)
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)

    # AQE marked the join skewed (plan annotation `skew=true` on SMJ)
    assert "skew=true" in plan, plan
    # correctness unaffected by the split: keys are 0 (182k rows) and
    # 10..90 step 10 (2k rows each), w = k*10
    assert n_total == 200_000
    expected_sw = sum((k * 10) * 2_000 for k in range(10, 100, 10))
    assert sw_total == expected_sw
