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


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime filter injection: a selective dimension filter spawns a
    bloom filter that pre-prunes the fact scan before the shuffle join
    — at 100 TB this cuts the shuffled fact volume by the dimension's
    selectivity. Verified: the filter appears in the plan AND the
    result matches the unfiltered-plan join."""
    from gomysql2pg_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def run(bloom: bool):
        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": str(
                bloom
            ).lower(),
            # the fixture scan is far below the default 10GB probe-side
            # threshold — lower it so injection applies at test scale
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "1KB",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            j = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
                F.count("*").alias("n")
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain(mode="extended")
            return j.collect()[0]["n"], buf.getvalue()
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)

    n_bloom, plan_bloom = run(True)
    n_plain, plan_plain = run(False)
    assert "bloom_filter_agg" in plan_bloom, plan_bloom
    assert "bloom_filter_agg" not in plan_plain
    assert n_bloom == n_plain > 0


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


def test_salt_actually_splits_hot_key(spark, sf_dir):
    """The salting gate the plan string can't give: measure the real
    partition histogram. lineitem keyed by l_returnflag alone has 3
    values (one ~50%), so any hash partitioning strands half the table
    in one task; keyed by (l_returnflag, salt) — the exact salted key
    q_skew_salted_join builds — the hot key must spread across
    partitions with a bounded max-partition share."""
    from gomysql2pg_spark.catalog import load_table
    from gomysql2pg_spark.operators.pipeline import SALT_BUCKETS

    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        "l_returnflag",
        F.pmod(
            F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS)
        ).alias("salt"),
    )
    n_parts = 3 * SALT_BUCKETS

    def max_share(df) -> float:
        counts = [
            r["n"]
            for r in df.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        return max(counts) / sum(counts)

    unsalted = max_share(fact.repartition(n_parts, "l_returnflag"))
    salted = max_share(fact.repartition(n_parts, "l_returnflag", "salt"))
    # 3 raw keys → >=1/3 of all rows in one partition (R is ~50%)
    assert unsalted >= 0.30, unsalted
    # 48 salted key combos over 48 partitions: a few birthday
    # collisions are fine, a surviving hot partition is not
    assert salted <= 0.15, salted
    assert salted < unsalted / 2, (salted, unsalted)
