"""As-of (point-in-time) join — a custom operator Spark lacks natively
(SURVEY.md task brief: "when the reference has an operator Spark lacks
(e.g., as-of join) implement it as a composition of existing DataFrame
ops if semantics allow").

Semantics (backward as-of): for each left row, attach the payload of the
most recent right row with `right.ts <= left.ts` for the same key —
inclusive at equal timestamps. TIES ARE DETERMINISTIC (r12
duplicate-timestamp audit): when several right rows share the qualifying
timestamp, the one with the LARGEST tie id wins for backward joins
("latest among ties" — the id is the monotonic ingestion order) and the
SMALLEST for forward joins ("next among ties"). A tie-break is not
optional: DuckDB's native ASOF JOIN and an un-tiebroken window both
pick an ARBITRARY row among equal timestamps, which a value-hash
compare exposes the moment real data has duplicate event times. The
oracles are therefore written as LATERAL top-1 subqueries with a total
(ts, id) order, not ASOF JOIN.

Implementation: union the two sides tagged, one window per key ordered
by (ts, side, tie) with right rows sorting BEFORE left rows at equal ts,
and `last(payload, ignoreNulls)` over the unbounded-preceding frame. One
shuffle on the key, horizontally scalable — no range explosion, no
per-row subqueries. This is the standard large-scale formulation (the
union-window trick); a broadcast variant applies when the right side is
a small reference table.

The payload rides as ONE STRUCT, not per-column fills (r13 review
finding): per-column `last(ignorenulls)` silently skipped a matched
right row whose payload column was genuinely NULL (a NaN value →
try_cast NULL cents) in favor of an OLDER row — wrong AND internally
incoherent, since other payload columns could come from a different
row. A struct is non-NULL whenever a right row exists, so the fill is
atomic: the whole matched row or nothing, exactly the LATERAL top-1
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions.numeric import cents


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    suffix: str = "_asof",
    tie_col: str | None = None,
) -> DataFrame:
    """Generic backward as-of join. `payload_cols` are taken from
    `right` and appear as `<name><suffix>` on the output; left rows with
    no prior right row get NULLs (left-outer semantics). `tie_col`
    names a column of `right` whose ASCENDING order breaks equal-`ts`
    ties (the LAST one wins — pass the monotonic event/ingestion id);
    without it, ties fall back to the engine's arbitrary order."""
    p_type = T.StructType(
        [
            T.StructField(c, right.schema[c].dataType)
            for c in payload_cols
        ]
    )
    lt = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_p", F.lit(None).cast(p_type))
        .withColumn("_tie", F.lit(None).cast("long"))
    )
    rt = right.select(
        *on,
        ts_col,
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_p"),
        (
            F.col(tie_col).cast("long") if tie_col else F.lit(None).cast("long")
        ).alias("_tie"),
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.select(*lt.columns)

    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            F.col("_tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE atomic fill: the struct is non-NULL iff a right row exists,
    # so a NULL payload FIELD in the matched row is carried as-is
    filled = unioned.withColumn(
        "_p", F.last("_p", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_p.{c}"))
    return out.drop("_side", "_tie", "_p")


def q_events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the user's most recent purchase value at or before the
    event time (classic point-in-time feature join for training-data
    pipelines). Exact-cents payload; equal-timestamp purchases resolve
    to the largest purchase event_id on both engines."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "us",
            cents("value").alias("purch_cents"),
            F.col("event_id").alias("purch_event_id"),
        )
    )
    joined = asof_join_backward(
        ev.select("event_id", "user_id", "us", "event_type"),
        purchases,
        on=["user_id"],
        ts_col="us",
        payload_cols=["purch_cents", "purch_event_id"],
        tie_col="purch_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "us",
        "event_type",
        F.col("purch_cents_asof").alias("last_purchase_cents"),
        F.col("purch_event_id_asof").alias("last_purchase_event_id"),
    )


ORACLE_EVENTS_ASOF = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
purchases AS (
  SELECT user_id, us, cents AS purch_cents, event_id AS purch_event_id
  FROM ev WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.us, e.event_type,
       p.purch_cents AS last_purchase_cents,
       p.purch_event_id AS last_purchase_event_id
FROM ev e
LEFT JOIN LATERAL (
  SELECT purch_cents, purch_event_id FROM purchases p
  WHERE p.user_id = e.user_id AND p.us <= e.us
  ORDER BY p.us DESC, p.purch_event_id DESC LIMIT 1
) p ON TRUE
"""


def q_events_asof_next_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forward as-of: for each event, the user's NEXT purchase at or
    after the event time (label-attachment join for churn/propensity
    training sets). Same union-window trick mirrored: right rows sort
    AFTER left rows at equal ts, `first(payload) over (following)`
    frame; equal-timestamp purchases resolve to the SMALLEST purchase
    event_id ("next among ties") on both engines."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "us",
        cents("value").alias("next_cents"),
        F.col("event_id").alias("_tie"),
    )
    # same atomic-struct fill as the backward kernel: first(ignorenulls)
    # on the bare column would skip a NULL-cents purchase for a LATER one
    lt = ev.select("event_id", "user_id", "us", "event_type").withColumn(
        "_side", F.lit(0)
    ).withColumn(
        "_p", F.lit(None).cast(T.StructType([T.StructField("next_cents", T.LongType())]))
    ).withColumn("_tie", F.lit(None).cast("long"))
    rt = purchases.select(
        "user_id",
        "us",
        F.struct(F.col("next_cents").alias("next_cents")).alias("_p"),
        "_tie",
    ).withColumn("_side", F.lit(1)).withColumn(
        "event_id", F.lit(None).cast("long")
    ).withColumn("event_type", F.lit(None).cast("string"))
    unioned = lt.unionByName(rt.select(*lt.columns))
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("us").asc(),
            F.col("_side").asc(),
            F.col("_tie").asc_nulls_first(),
        )
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = unioned.withColumn(
        "_p", F.first("_p", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 0).select(
        "event_id",
        "user_id",
        "us",
        "event_type",
        F.col("_p.next_cents").alias("next_purchase_cents"),
    )


ORACLE_EVENTS_ASOF_NEXT = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
purchases AS (
  SELECT user_id, us, cents AS next_cents, event_id FROM ev
  WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.us, e.event_type,
       p.next_cents AS next_purchase_cents
FROM ev e
LEFT JOIN LATERAL (
  SELECT next_cents FROM purchases p
  WHERE p.user_id = e.user_id AND p.us >= e.us
  ORDER BY p.us ASC, p.event_id ASC LIMIT 1
) p ON TRUE
"""


TOLERANCE_US = 3600 * 1_000_000  # 1 hour


def q_events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded backward as-of: the most recent purchase at or
    before the event, but only if it is within 1 hour — otherwise NULL
    (feature-store staleness bound: a feature older than the tolerance
    is worse than no feature). Same union-window plan + one filter on
    the matched timestamp; ties resolve like `q_events_asof_purchase`."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "us",
        cents("value").alias("purch_cents"),
        F.col("us").alias("purch_us"),
        F.col("event_id").alias("purch_eid"),
    )
    joined = asof_join_backward(
        ev.select("event_id", "user_id", "us", "event_type"),
        purchases,
        on=["user_id"],
        ts_col="us",
        payload_cols=["purch_cents", "purch_us"],
        tie_col="purch_eid",
    )
    fresh = F.col("purch_us_asof") >= F.col("us") - F.lit(TOLERANCE_US)
    return joined.select(
        "event_id",
        "user_id",
        "us",
        F.when(fresh, F.col("purch_cents_asof")).alias("fresh_purchase_cents"),
        F.when(fresh, F.col("us") - F.col("purch_us_asof")).alias(
            "staleness_us"
        ),
    )


ORACLE_EVENTS_ASOF_TOLERANCE = f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
purchases AS (
  SELECT user_id, us AS purch_us, cents AS purch_cents,
         event_id AS purch_eid
  FROM ev WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.us,
  CASE WHEN p.purch_us >= e.us - {TOLERANCE_US}
       THEN p.purch_cents END AS fresh_purchase_cents,
  CASE WHEN p.purch_us >= e.us - {TOLERANCE_US}
       THEN e.us - p.purch_us END AS staleness_us
FROM ev e
LEFT JOIN LATERAL (
  SELECT purch_us, purch_cents FROM purchases p
  WHERE p.user_id = e.user_id AND p.purch_us <= e.us
  ORDER BY p.purch_us DESC, p.purch_eid DESC LIMIT 1
) p ON TRUE
"""


QUERIES = {
    "events_asof_purchase": q_events_asof_purchase,
    "events_asof_next_purchase": q_events_asof_next_purchase,
    "events_asof_tolerance": q_events_asof_tolerance,
}
ORACLES = {
    "events_asof_purchase": ORACLE_EVENTS_ASOF,
    "events_asof_next_purchase": ORACLE_EVENTS_ASOF_NEXT,
    "events_asof_tolerance": ORACLE_EVENTS_ASOF_TOLERANCE,
}
