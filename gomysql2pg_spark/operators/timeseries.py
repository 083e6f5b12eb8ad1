"""Time-series resampling operators: fixed-grid gap fill with
forward-fill (the feature-store / metrics-rollup primitive Spark lacks
as a built-in — composed here from sequence+explode and a partitioned
window, per the custom-operator guidance).

Scale shape: the grid explode is per-user (narrow after one shuffle on
user_id); forward fill is `last(ignorenulls) over (user, unbounded
preceding)` — no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

GRID_US = 24 * 3600 * 1_000_000  # daily grid


def q_ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily grid over the user's active span: observed days
    carry that day's event count + last value; missing days are
    materialized and forward-filled from the previous observed day.
    Output: (user_id, day_us, n_events, filled_cents, is_gap)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    day = (F.floor(F.col("us") / GRID_US) * GRID_US).cast("long")
    # last event of the day wins (ts, event_id total order)
    daily = (
        ev.withColumn("day_us", day)
        .groupBy("user_id", "day_us")
        .agg(
            F.count("*").alias("n_events"),
            F.max_by("cents", F.struct("us", "event_id")).alias("day_cents"),
        )
    )
    span = daily.groupBy("user_id").agg(
        F.min("day_us").alias("lo"), F.max("day_us").alias("hi")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.lit(GRID_US).cast("long"))
        ).alias("day_us"),
    )
    joined = grid.join(daily, ["user_id", "day_us"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day_us",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.col("day_cents").isNull().alias("is_gap"),
    )


ORACLE_TS_GAPFILL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents, event_id
  FROM events
),
ranked AS (
  SELECT user_id,
         CAST(FLOOR(us / {GRID_US}.0) AS BIGINT) * {GRID_US} AS day_us,
         cents,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, CAST(FLOOR(us / {GRID_US}.0) AS BIGINT)
           ORDER BY us DESC, event_id DESC) AS rn,
         COUNT(*) OVER (
           PARTITION BY user_id, CAST(FLOOR(us / {GRID_US}.0) AS BIGINT)
         ) AS n_events
  FROM ev
),
daily AS (
  SELECT user_id, day_us, n_events, cents AS day_cents
  FROM ranked WHERE rn = 1
),
span AS (
  SELECT user_id, MIN(day_us) AS lo, MAX(day_us) AS hi
  FROM daily GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(range(lo, hi + 1, {GRID_US})) AS day_us
  FROM span
)
SELECT g.user_id, g.day_us,
       COALESCE(d.n_events, 0) AS n_events,
       LAST_VALUE(d.day_cents IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day_us
         ROWS UNBOUNDED PRECEDING) AS filled_cents,
       d.day_cents IS NULL AS is_gap
FROM grid g
LEFT JOIN daily d ON g.user_id = d.user_id AND g.day_us = d.day_us
"""


QUERIES = {"ts_gapfill_ffill": q_ts_gapfill_ffill}
ORACLES = {"ts_gapfill_ffill": ORACLE_TS_GAPFILL}
