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
from ..functions.numeric import cents

GRID_US = 24 * 3600 * 1_000_000  # daily grid


def q_ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily grid over the user's active span: observed days
    carry that day's event count + last value; missing days are
    materialized and forward-filled from the previous observed day.
    Output: (user_id, day_us, n_events, filled_cents, is_gap)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        cents("value").alias("cents"),
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
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS cents, event_id
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


OHLC_US = 3600 * 1_000_000  # hourly candles


def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the financial/metrics candle): per user and
    hourly bucket — open (first value), high, low, close (last value),
    plus volume (row count). One groupBy with min_by/max_by keyed on the
    (us, event_id) total order: a single shuffle with map-side partial
    first/last state, no window sort over the raw series. The oracle
    uses the ROW_NUMBER formulation (DuckDB arg_min/arg_max reject
    struct ordering keys — see memory of round 1)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        cents("value").alias("cents"),
        "event_id",
    )
    bucket = (F.floor(F.col("us") / OHLC_US) * OHLC_US).cast("long")
    order = F.struct("us", "event_id")
    return (
        ev.withColumn("bucket_us", bucket)
        .groupBy("user_id", "bucket_us")
        .agg(
            F.min_by("cents", order).alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", order).alias("close_cents"),
            F.count("*").alias("volume"),
        )
    )


ORACLE_TS_OHLC = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS cents, event_id,
         CAST(FLOOR(epoch_us(ts) / {OHLC_US}.0) AS BIGINT) * {OHLC_US}
           AS bucket_us
  FROM events
),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id, bucket_us
                       ORDER BY us, event_id) AS rn_open,
    ROW_NUMBER() OVER (PARTITION BY user_id, bucket_us
                       ORDER BY us DESC, event_id DESC) AS rn_close
  FROM ev
)
SELECT user_id, bucket_us,
  MIN(CASE WHEN rn_open = 1 THEN cents END) AS open_cents,
  MAX(cents) AS high_cents,
  MIN(cents) AS low_cents,
  MIN(CASE WHEN rn_close = 1 THEN cents END) AS close_cents,
  COUNT(*) AS volume
FROM ranked GROUP BY user_id, bucket_us
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: turn a change-event stream into
    validity intervals [valid_from, valid_to) per user with an
    is_current flag — the dimension-table pattern every warehouse
    migration needs. lead() over the per-user change order supplies the
    closing timestamp; the final interval stays open (NULL → sentinel
    max). One shuffle (user_id), window sort is per-user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        cents("value").alias("cents"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    nxt = F.lead("us").over(w)
    return ev.select(
        "user_id",
        F.col("cents").alias("attr_cents"),
        "event_type",
        F.col("us").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(2**62)).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


ORACLE_SCD2 = f"""
SELECT user_id,
  TRY_CAST(ROUND(value * 100) AS BIGINT) AS attr_cents,
  event_type,
  epoch_us(ts) AS valid_from_us,
  COALESCE(LEAD(epoch_us(ts)) OVER w, {2**62}) AS valid_to_us,
  LEAD(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


QUERIES = {
    "ts_gapfill_ffill": q_ts_gapfill_ffill,
    "ts_ohlc": q_ts_ohlc,
    "scd2_intervals": q_scd2_intervals,
}
ORACLES = {
    "ts_gapfill_ffill": ORACLE_TS_GAPFILL,
    "ts_ohlc": ORACLE_TS_OHLC,
    "scd2_intervals": ORACLE_SCD2,
}
