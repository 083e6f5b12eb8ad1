"""Custom compute operators: the UDF/UDAF/UDTF surface (absent in the
reference — SURVEY.md §2.C) done the fast way, plus skew discipline.

- grouped-agg Pandas UDAF (Arrow-batched, integer-exact accumulation),
- applyInPandas grouped-map (sequential EMA — genuinely inexpressible
  as a single built-in expression chain, the canonical Pandas-UDF use),
- salted two-phase aggregation: the 100 TB skew pattern, oracle-checked
  equal to the plain aggregation.

All Python workers are built by nested factories → cloudpickle ships
them by value (no import path needed on executors).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..functions.numeric import cents, sql_cents, sql_whole, whole


def q_pandas_udaf_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per order via a grouped-agg
    Pandas UDAF. Accumulation is integer (cents × qty) inside the UDF,
    division happens once per group → bit-exact vs the SQL oracle.
    Arrow moves whole column batches — no per-row Python overhead."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(  # pragma: no cover — runs on executors
        price_cents: pd.Series, qty: pd.Series
    ) -> float:
        num = int((price_cents * qty).sum())
        den = int(qty.sum())
        return float(num) / den if den else None

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            cents("l_extendedprice").alias("pc"),
            whole("l_quantity").alias("q"),
        )
        .groupBy("l_orderkey")
        .agg(wavg("pc", "q").alias("wavg_price_cents"))
    )


ORACLE_PANDAS_UDAF_WAVG = f"""
SELECT l_orderkey,
  CAST(SUM({sql_cents('l_extendedprice')} * {sql_whole('l_quantity')})
       AS DOUBLE) / SUM({sql_whole('l_quantity')}) AS wavg_price_cents
FROM lineitem
GROUP BY l_orderkey
"""


EMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ema_value", DoubleType()),
    ]
)


def make_ema_worker(alpha: float = 0.5):
    """applyInPandas worker: per-user exponential moving average over
    time-ordered event values — inherently sequential state, the honest
    Pandas-UDF case. The fold is written explicitly (acc = (1-a)*acc +
    a*x) so the float sequence is bit-identical to the oracle's
    list_reduce with the same expression."""

    def ema(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values(["us", "event_id"])
        acc = None
        for x in pdf["value"]:
            # missing measurements (NULL upstream -> NaN here) are
            # SKIPPED, not folded: one NaN would poison every later
            # step, and the oracle's list_filter does the same skip
            if x is None or (isinstance(x, float) and math.isnan(x)):
                continue
            acc = x if acc is None else (1.0 - alpha) * acc + alpha * x
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ema_value": [acc],
            }
        )

    return ema


def q_events_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EMA of `value` per user (time-ordered). Grouped-map
    applyInPandas: one Arrow batch per user group; shuffle on user_id
    only. State never leaves the group — scales with #users."""
    # non-finite values sanitize to NULL on BOTH sides before the
    # fold: pandas would carry NaN where DuckDB's list_reduce keeps
    # NaN but Arrow's return path may surface it as NULL — pinning
    # finite-or-NULL up front removes the ambiguity (r13 review
    # finding; NaN fails BETWEEN, so one predicate covers NaN and ±Inf)
    finite = F.col("value").between(-1.7976931348623157e308,
                                    1.7976931348623157e308)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.when(finite, F.col("value")).alias("value"),
    )
    return ev.groupBy("user_id").applyInPandas(
        make_ema_worker(), schema=EMA_SCHEMA
    )


ORACLE_EVENTS_EMA = """
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CASE WHEN len(list_filter(list(CASE WHEN isfinite(value) THEN value END
                                  ORDER BY epoch_us(ts), event_id),
                             x -> x IS NOT NULL)) = 0
       THEN NULL
       ELSE list_reduce(
         list_filter(list(CASE WHEN isfinite(value) THEN value END
                          ORDER BY epoch_us(ts), event_id),
                     x -> x IS NOT NULL),
         (acc, x) -> 0.5 * acc + 0.5 * x) END AS ema_value
FROM events
GROUP BY user_id
"""


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: lineitem has only 3
    l_returnflag values — a direct groupBy funnels 60k rows/key through
    3 reducers. Phase 1 salts the key (16 buckets from a hash of the
    row), aggregates partials in parallel; phase 2 merges 3×16 tiny
    partials. Integer sums ⇒ result is EXACTLY the unsalted aggregate
    (the oracle is the plain GROUP BY)."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.select(
        "l_returnflag",
        cents("l_extendedprice").alias("pc"),
        whole("l_quantity").alias("q"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)).alias(
            "_salt"
        ),
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum("pc").alias("pc_sum"),
        F.sum("q").alias("q_sum"),
        F.count("*").alias("cnt"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pc_sum").alias("price_cents"),
        F.sum("q_sum").alias("total_qty"),
        F.sum("cnt").alias("n_rows"),
    )


ORACLE_SKEW_SALTED_AGG = f"""
SELECT l_returnflag,
  CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS price_cents,
  CAST(SUM({sql_whole('l_quantity')}) AS BIGINT) AS total_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


QUERIES = {
    "pandas_udaf_wavg": q_pandas_udaf_wavg,
    "events_ema": q_events_ema,
    "skew_salted_agg": q_skew_salted_agg,
}

ORACLES = {
    "pandas_udaf_wavg": ORACLE_PANDAS_UDAF_WAVG,
    "events_ema": ORACLE_EVENTS_EMA,
    "skew_salted_agg": ORACLE_SKEW_SALTED_AGG,
}
