"""Event-stream operators (SURVEY.md §2.D C6, batch semantics) on `events`.

These are the batch twins of the Structured Streaming jobs in
`gomysql2pg_spark.streaming` — same windowing/sessionization semantics,
expressed over the static table so they carry a full SQL oracle. The
streaming variants (watermarks, incremental state) are tested separately
(tests/test_streaming.py) since a streaming DataFrame can't be collected
by the driver harness.

Timestamps: `events.ts` is parquet TIMESTAMP(NANOS); the catalog loads
it as microsecond-truncated TIMESTAMP exactly like DuckDB does, and all
window math is integer epoch-microseconds — no tz or float involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import cents

WINDOW_US = 300 * 1_000_000  # 5-minute tumbling windows
SESSION_GAP_US = 1800 * 1_000_000  # 30-minute session gap


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation per event_type: 5-minute buckets,
    count + exact-cents value sum. Bucket = epoch_us div window — the
    same arithmetic Structured Streaming's window() performs; partial
    aggregation applies, shuffle carries (bucket × type) rows only."""
    ev = load_table(spark, sf_dir, "events")
    # floor-div so the bucket edge matches streaming window() semantics
    bucket = F.floor(F.unix_micros("ts") / F.lit(WINDOW_US)).cast("long")
    return (
        ev.groupBy(
            bucket.alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value")).alias(
                "value_cents"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ORACLE_EVENTS_WINDOW = f"""
SELECT CAST(FLOOR(epoch_us(ts) / {WINDOW_US}.0) AS BIGINT) AS bucket,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on >30-min gaps (lag +
    running sum of boundary flags — the standard batch formulation of
    session_window). Windows are PARTITIONED by user_id → scales
    horizontally; within-user order is (ts, event_id) for total order."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    w_order = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("us") - F.lag("us").over(w_order) > SESSION_GAP_US, 1
        )
        .otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


ORACLE_EVENTS_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, us,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(us) AS start_us, MAX(us) AS end_us,
       MAX(us) - MIN(us) AS duration_us
FROM sessions GROUP BY user_id, session_seq
"""


def q_events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/compaction semantics: latest event per user (the batch
    twin of streaming dedup-by-key). Partitioned window, no global
    sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            "event_type",
        )
    )


ORACLE_EVENTS_LATEST = """
SELECT user_id, event_id, epoch_us(ts) AS us, event_type
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the props column (array/map/json
    function category — absent in the reference, §2.C). get_json_object
    / json path both engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # try_cast: hostile $.k ("abc", 1.5) must degrade to NULL,
        # not raise ANSI CAST_INVALID_INPUT (r13 review finding)
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


ORACLE_EVENTS_JSON = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       json_extract_string(props, '$.missing') AS missing
FROM events
"""


FUNNEL = ["view", "click", "purchase"]


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how far does each user get through
    view → click → purchase IN ORDER? stages_completed = fold over the
    user's time-ordered events (state advances when the current event
    matches the next wanted stage) — one groupBy + one expression fold,
    no joins, no window; per-user arrays are bounded by user activity.
    Output: users per stages_completed (0..3)."""
    ev = load_table(spark, sf_dir, "events")
    ordered = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
    )
    stage = F.aggregate(
        F.col("seq"),
        F.lit(0),
        lambda acc, e: F.when(
            (acc == 0) & (e["et"] == FUNNEL[0]), F.lit(1)
        )
        .when((acc == 1) & (e["et"] == FUNNEL[1]), F.lit(2))
        .when((acc == 2) & (e["et"] == FUNNEL[2]), F.lit(3))
        .otherwise(acc),
    )
    return (
        ordered.select(stage.alias("stages_completed"))
        .groupBy("stages_completed")
        .agg(F.count("*").alias("n_users"))
    )


ORACLE_EVENTS_FUNNEL = """
WITH seqs AS (
  SELECT user_id,
         list(event_type ORDER BY epoch_us(ts), event_id) AS seq
  FROM events GROUP BY user_id
),
staged AS (
  -- events coded as negatives so the fold state (0..3) can share the
  -- INTEGER list (list_reduce has no separate init-value type)
  SELECT user_id,
    list_reduce(
      list_prepend(0, list_transform(seq, et -> CASE et
        WHEN 'view' THEN -1 WHEN 'click' THEN -2
        WHEN 'purchase' THEN -3 ELSE -9 END)),
      (acc, x) -> CASE
        WHEN acc = 0 AND x = -1 THEN 1
        WHEN acc = 1 AND x = -2 THEN 2
        WHEN acc = 2 AND x = -3 THEN 3
        ELSE acc END) AS stages_completed
  FROM seqs
)
SELECT stages_completed, COUNT(*) AS n_users
FROM staged GROUP BY stages_completed
"""


def q_events_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE / CDC-apply semantics: treat the first half of the
    event stream as the base state (latest value per user) and the
    second half as the change batch; the merge keeps the newest row per
    user across both with the change batch winning ties. One union +
    one partitioned window — the standard lake upsert without a table
    format, and exactly what MERGE INTO compiles to."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    # lazy midpoint: crossJoin the one-row broadcast aggregate instead
    # of .first() — the eager driver action ran a full scan at PLAN
    # time and then scanned events twice more (r13 review finding);
    # same double-divide-then-truncate arithmetic as before
    mid_df = ev.agg(
        ((F.min("us") + F.max("us")) / F.lit(2)).cast("long").alias("_mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid_df)).withColumn(
        "src", F.when(F.col("us") >= F.col("_mid"), 1).otherwise(0)
    )
    merged = tagged.drop("_mid")
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("src").desc(), F.col("event_id").desc()
    )
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "us",
            "event_type",
            cents("value").alias("cents"),
            F.col("src").alias("from_changes"),
        )
    )


ORACLE_EVENTS_CDC_MERGE = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
mid AS (
  -- floor division: Spark's double→long cast truncates, DuckDB's
  -- CAST rounds — // (positive operands) matches the truncation
  SELECT (MIN(us) + MAX(us)) // 2 AS m FROM ev
),
tagged AS (
  SELECT ev.*, CASE WHEN us >= m THEN 1 ELSE 0 END AS src
  FROM ev CROSS JOIN mid
)
SELECT user_id, event_id, us, event_type, cents, src AS from_changes
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us DESC, src DESC, event_id DESC) AS rn
  FROM tagged
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# rolling-window anomaly detection
# ---------------------------------------------------------------------------

ANOMALY_LOOKBACK = 10  # trailing events forming the per-user baseline
ANOMALY_MIN_PREV = 5  # minimum history before a verdict is issued
ANOMALY_FACTOR = 3  # spike = value > FACTOR × trailing mean


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling spike detection: an event is a spike when its
    value exceeds 3× the mean of the user's previous ≤10 events (with
    at least 5 of history) — the monitoring/outlier-gate shape of an
    event pipeline.

    Scale: ONE window partitioned by user_id (parallel across users, no
    global sort); the verdict is pure integer math in exact cents —
    `v·cnt > 3·sum` instead of `v > 3·sum/cnt` — so no float division
    or order-dependent double sum exists and the flag is bit-stable
    under any partitioning (same discipline as functions/numeric.py).
    Events with insufficient history get verdict 0, not dropped
    (degrade, not drop)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_LOOKBACK, -1)
    )
    vc = cents("value")
    prev_cnt = F.count("vc").over(w)
    prev_sum = F.sum("vc").over(w)
    return (
        ev.select("event_id", "user_id", "ts", vc.alias("vc"))
        .select(
            "event_id",
            "user_id",
            "vc",
            prev_cnt.alias("prev_cnt"),
            F.coalesce(prev_sum, F.lit(0)).cast("long").alias("prev_sum"),
            F.when(
                (prev_cnt >= ANOMALY_MIN_PREV)
                & (
                    F.col("vc") * prev_cnt
                    > F.lit(ANOMALY_FACTOR) * prev_sum
                ),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("is_spike"),
        )
    )


ORACLE_EVENTS_ANOMALY = f"""
WITH e AS (
  SELECT event_id, user_id, ts,
         TRY_CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, user_id, vc,
  CAST(COUNT(vc) OVER w AS BIGINT) AS prev_cnt,
  CAST(COALESCE(SUM(vc) OVER w, 0) AS BIGINT) AS prev_sum,
  CAST(CASE WHEN COUNT(vc) OVER w >= {ANOMALY_MIN_PREV}
             AND vc * COUNT(vc) OVER w
                 > {ANOMALY_FACTOR} * SUM(vc) OVER w
        THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING)
"""


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (from_type → to_type) pair of CONSECUTIVE
    events of the same user (ts order, event_id tiebreak), the
    transition count and row-normalized probability. The behavioral
    model behind next-action prediction and anomalous-session scoring.

    Scale shape: the lead() window partitions by user (parallel across
    users, state = one row); the matrix aggregate is |types|²-bounded
    with map-side partials; the probability denominator joins back as
    a broadcast of the |types|-row margins, and the single float
    division is micro-rounded for cross-engine stability."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), "to_type"
        )
        .agg(F.count("*").alias("n_trans"))
    )
    margins = trans.groupBy("from_type").agg(
        F.sum("n_trans").alias("n_from")
    )
    return (
        trans.join(F.broadcast(margins), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_trans",
            F.round(
                F.col("n_trans").cast("double")
                * F.lit(1e6)
                / F.col("n_from")
            )
            .cast("bigint")
            .alias("p_micro"),
        )
    )


ORACLE_EVENTS_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, COUNT(*) AS n_trans
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
),
margins AS (
  SELECT from_type, SUM(n_trans) AS n_from FROM trans GROUP BY 1
)
SELECT t.from_type, t.to_type, t.n_trans,
       CAST(ROUND(CAST(t.n_trans AS DOUBLE) * 1e6 / m.n_from) AS BIGINT)
         AS p_micro
FROM trans t JOIN margins m ON m.from_type = t.from_type
"""


TOP_PATHS = 20


def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, apriori-free: the TOP_PATHS most
    frequent 3-step event-type paths (consecutive per user). Two
    lead() hops in one per-user window pass produce the path key; the
    count aggregate is |types|³-bounded with map-side partials, so the
    final rank window runs over a domain-sized (≤125-row) frame —
    never the event stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        # ALL THREE steps non-null: concat_ws silently SKIPS a NULL
        # leading type (emitting a malformed 2-step path) where the
        # oracle's || nulls the whole path and drops the row (r13
        # review finding)
        .filter(
            F.col("event_type").isNotNull()
            & F.col("t2").isNotNull()
            & F.col("t3").isNotNull()
        )
        .select(
            F.concat_ws(
                ">", F.col("event_type"), F.col("t2"), F.col("t3")
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    return (
        paths.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_PATHS)
    )


ORACLE_EVENTS_TOP_PATHS = f"""
WITH seq AS (
  SELECT event_type || '>' ||
         LEAD(event_type, 1) OVER w || '>' ||
         LEAD(event_type, 2) OVER w AS path
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
  SELECT path, COUNT(*) AS n FROM seq
  WHERE path IS NOT NULL GROUP BY path
)
SELECT path, n, rank FROM (
  SELECT path, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rank
  FROM counts
) WHERE rank <= {TOP_PATHS}
"""


# ------------------------------------------------- temporal holdout report
#
# Time-based train/eval split with user-leakage accounting: the
# evaluation-hygiene twin of the hash split (`dataset_split`) and the
# cluster-atomic split (`split_by_cluster`). A temporal holdout (train
# on the first 80% of the time span, evaluate on the rest) is the
# standard protocol for forecasting/recommendation data — and its
# standard failure is USER leakage: users with events on both sides of
# the cutoff carry identity-level signal across the split. This report
# is the artifact a pipeline checks before trusting a temporal split.

HOLDOUT_NUM, HOLDOUT_DEN = 4, 5  # train fraction of the time span


def q_temporal_holdout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row temporal-split audit: cutoff = min_ts + 4/5 of the span
    (integer epoch-micros, identical truncation on both engines),
    event counts per side, distinct users per side, and the leaky-user
    count (users appearing on BOTH sides). Two combinable aggregates —
    a per-user conditional-count groupBy, then a 6-column global
    rollup — no window, no distinct-expansion; the cutoff is a 2-value
    driver aggregate (min/max), the same bounded-scalar shape as
    bm25's total_terms."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).first()
    if b["lo"] is None:
        cutoff = 0
    else:
        cutoff = b["lo"] + (b["hi"] - b["lo"]) * HOLDOUT_NUM // HOLDOUT_DEN
    us = F.unix_micros("ts")
    per_user = ev.groupBy("user_id").agg(
        F.sum((us < F.lit(cutoff)).cast("int")).alias("u_train"),
        F.sum((us >= F.lit(cutoff)).cast("int")).alias("u_test"),
    )
    zero = F.lit(0).cast("long")
    return per_user.agg(
        F.coalesce(F.sum("u_train"), zero).alias("n_train_events"),
        F.coalesce(F.sum("u_test"), zero).alias("n_test_events"),
        F.coalesce(
            F.sum((F.col("u_train") > 0).cast("int")), zero
        ).alias("n_train_users"),
        F.coalesce(
            F.sum((F.col("u_test") > 0).cast("int")), zero
        ).alias("n_test_users"),
        F.coalesce(
            F.sum(
                ((F.col("u_train") > 0) & (F.col("u_test") > 0))
                .cast("int")
            ),
            zero,
        ).alias("n_leaky_users"),
    ).select(
        F.lit(cutoff).alias("cutoff_micros"),
        "n_train_events",
        "n_test_events",
        "n_train_users",
        "n_test_users",
        "n_leaky_users",
    )


# k-anonymity bands: [k_lo, k_hi] class-size ranges reported as rows.
# A class of size 1 is a uniquely re-identifiable subject — the number
# a release review reads first.
K_ANON_BANDS = ((1, 1), (2, 4), (5, 9), (10, 49), (50, None))
K_ANON_DAY_US = 86_400_000_000
K_ANON_VALUE_CENTS = 5_000  # 50-currency-unit value buckets


def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the event log under the quasi-identifier
    (event_type, day, value-bucket) — the governance gate a training
    pipeline runs before releasing interaction data (Sweeney, IJUFKS
    2002): a subject (user) whose QI combination is shared by fewer
    than k subjects is re-identifiable by linkage. Reports the
    class-size distribution as fixed k-bands: (k_lo, k_hi, n_classes,
    n_subjects, subjects_milli) where n_subjects counts distinct
    (QI, user) memberships in classes of that size and subjects_milli
    is the exact share of all memberships (truncating div).

    Integer-exact end to end: day = epoch-micros div 86_400e6, value
    bucket = cents div 5000 (both pure integer arithmetic — no float
    boundary can disagree across engines), class sizes and band sums
    are bigint counts.

    Scale shape (100 TB): two hash aggregates with map-side partials —
    (QI, user) distinct → (QI) class sizes → (band) rollup; state
    shrinks at every step (memberships → classes → ≤5 bands); the
    share denominator is a window sum over the ≤5-row band frame, so
    no scalar broadcast join touches the corpus. No windows over the
    corpus, no collects."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {K_ANON_DAY_US}").alias("day_idx")
    vb = F.expr(
        f"{sql_cents_spark('value')} div {K_ANON_VALUE_CENTS}"
    ).alias("value_bucket")
    members = (
        ev.select("event_type", day, vb, "user_id").distinct()
    )
    classes = members.groupBy(
        "event_type", "day_idx", "value_bucket"
    ).agg(F.count("*").alias("k"))
    # ONE band-CASE builder shared with the oracle (`_k_anon_band_sql`
    # below) — the plain-SQL text is valid in both engines, so the
    # band boundaries cannot drift between them (r16 review; the
    # `_KN_LOGP_SQL` discipline)
    lo_sql, hi_sql = _k_anon_band_sql("k")
    band_lo = F.expr(lo_sql)
    band_hi = F.expr(hi_sql)
    bands = (
        classes.groupBy(band_lo.alias("k_lo"), band_hi.alias("k_hi"))
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("k").alias("n_subjects"),
        )
    )
    w = Window.partitionBy()  # ≤5 rows — a driver-trivial window
    return bands.select(
        "k_lo",
        "k_hi",
        "n_classes",
        "n_subjects",
        F.expr(
            "n_subjects * 1000"
        ).cast("long").alias("_num"),
        F.sum("n_subjects").over(w).alias("_den"),
    ).select(
        "k_lo",
        "k_hi",
        "n_classes",
        "n_subjects",
        F.expr("_num div _den").alias("subjects_milli"),
    )


def sql_cents_spark(x: str) -> str:
    """Spark-side SQL string for exact integer cents (mirrors
    functions.numeric.cents — round then try_cast; kept as a SQL
    string because the QI bucket composes with integer div inside
    one F.expr)."""
    return f"try_cast(round(({x}) * 100) as long)"


def _k_anon_band_sql(col: str) -> tuple[str, str]:
    lo_case, hi_case = "CASE ", "CASE "
    for lo, hi in K_ANON_BANDS:
        cond = f"{col} >= {lo}" + (
            f" AND {col} <= {hi}" if hi is not None else ""
        )
        lo_case += f"WHEN {cond} THEN CAST({lo} AS BIGINT) "
        hi_case += (
            f"WHEN {cond} THEN CAST({hi} AS BIGINT) "
            if hi is not None
            else f"WHEN {cond} THEN CAST(NULL AS BIGINT) "
        )
    return lo_case + "END", hi_case + "END"


_KA_LO, _KA_HI = _k_anon_band_sql("k")

def q_l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., TKDD 2007 — the
    k-anonymity successor): a k-anonymous class is still disclosive
    if its SENSITIVE attribute is homogeneous (everyone in the class
    did the same thing). Over the (day, value-bucket) quasi-identifier
    — `event_type` is the sensitive attribute here, so it moves OUT
    of the QI `q_k_anonymity_report` uses — report the distribution
    of distinct-sensitive-value counts l: (l, n_classes, n_records,
    records_milli). Classes at l = 1 are the disclosure set a release
    review reads first; the same integer day/bucket arithmetic as the
    k-anonymity audit, so the two reports share a QI algebra.

    Scale shape: two shrinking hash aggregates ((QI, sensitive)
    distinct-collapse with the record count carried → per-QI l and
    sizes → ≤|event types| l-bands) and a tiny window for the share —
    the k-anonymity plan with one more sensitive-collapse step."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {K_ANON_DAY_US}").alias("day_idx")
    vb = F.expr(
        f"{sql_cents_spark('value')} div {K_ANON_VALUE_CENTS}"
    ).alias("value_bucket")
    cells = ev.select(day, vb, "event_type").groupBy(
        "day_idx", "value_bucket", "event_type"
    ).agg(F.count("*").alias("n"))
    classes = cells.groupBy("day_idx", "value_bucket").agg(
        F.count("*").alias("l"), F.sum("n").alias("n_records")
    )
    bands = classes.groupBy("l").agg(
        F.count("*").alias("n_classes"),
        F.sum("n_records").alias("n_records"),
    )
    w = Window.partitionBy()  # ≤|event types| rows
    return bands.select(
        "l",
        "n_classes",
        "n_records",
        F.sum("n_records").over(w).alias("_tot"),
    ).select(
        "l",
        "n_classes",
        "n_records",
        F.expr("(n_records * 1000) div _tot").alias("records_milli"),
    )


ORACLE_L_DIVERSITY = f"""
WITH cells AS (
  SELECT epoch_us(ts) // {K_ANON_DAY_US} AS day_idx,
         TRY_CAST(ROUND(value * 100) AS BIGINT)
           // {K_ANON_VALUE_CENTS} AS value_bucket,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
classes AS (
  SELECT day_idx, value_bucket,
         CAST(COUNT(*) AS BIGINT) AS l,
         CAST(SUM(n) AS BIGINT) AS n_records
  FROM cells GROUP BY 1, 2
),
bands AS (
  SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(n_records) AS BIGINT) AS n_records
  FROM classes GROUP BY l
)
SELECT l, n_classes, n_records,
       CAST((n_records * 1000) // SUM(n_records) OVER () AS BIGINT)
         AS records_milli
FROM bands
"""


# t-closeness bands: [t_lo, t_hi] milli-TVD ranges reported as rows.
# t = 0 means the class's sensitive distribution equals the global one
# (no disclosure beyond the prior); t near 1000 means the class is
# concentrated on sensitive values the population rarely takes.
T_CLOSE_BANDS = ((0, 99), (100, 249), (250, 499), (500, 749), (750, 1000))


def _t_close_band_sql(col: str) -> tuple[str, str]:
    lo_case, hi_case = "CASE ", "CASE "
    for lo, hi in T_CLOSE_BANDS:
        cond = f"{col} >= {lo} AND {col} <= {hi}"
        lo_case += f"WHEN {cond} THEN CAST({lo} AS BIGINT) "
        hi_case += f"WHEN {cond} THEN CAST({hi} AS BIGINT) "
    return lo_case + "END", hi_case + "END"


def q_t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 —
    the third member of the release-audit trio with
    `q_k_anonymity_report` and `q_l_diversity_report`): an l-diverse
    class still leaks when its SENSITIVE distribution differs sharply
    from the global one (skewness/similarity attacks). Over the same
    (day, value-bucket) quasi-identifier with `event_type` sensitive,
    each class's distance to the global sensitive distribution is the
    total variation distance (the ICDE paper's "equal distance" EMD
    for categorical attributes): t = ½ Σᵢ |pᵢ − qᵢ|. Report the class
    distribution over fixed t-bands: (t_lo, t_hi, n_classes,
    n_records, records_milli).

    Integer-exact end to end via cross-multiplied fractions (the
    `length_drift_ks` ECDF trick): with class size n_c, global size N,
    class counts n_ci and global counts gᵢ,
    t_milli = 1000 · Σᵢ |n_ci·N − gᵢ·n_c| // (2·n_c·N), where sensitive
    values ABSENT from the class contribute gᵢ·n_c — folded in as
    n_c · (N − Σ_present gᵢ) so the explicit sum never leaves the
    class's own rows. Products are bounded by N²: exact in bigint
    through N ≈ 3·10⁹; past that the same plan runs with the two
    products as DECIMAL(38,0).

    Scale shape (100 TB): the l-diversity plan plus one broadcast —
    cells ((QI, sensitive) counts) → per-QI class totals (hash agg) →
    cells ⨝ classes on the QI (both already shrunk to distinct-cell
    cardinality) ⨝ broadcast global sensitive counts → per-class sum
    → ≤5 band rows; the N scalar rides a one-row broadcast cross
    join. No corpus windows, no collects."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {K_ANON_DAY_US}").alias("day_idx")
    vb = F.expr(
        f"{sql_cents_spark('value')} div {K_ANON_VALUE_CENTS}"
    ).alias("value_bucket")
    cells = ev.select(day, vb, "event_type").groupBy(
        "day_idx", "value_bucket", "event_type"
    ).agg(F.count("*").cast("long").alias("n"))
    classes = cells.groupBy("day_idx", "value_bucket").agg(
        F.sum("n").alias("n_c")
    )
    glob = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("g")
    )
    # `n_tot`, not `N`: Spark resolves column names case-insensitively,
    # so `N` would be ambiguous against the per-cell `n`
    total = ev.agg(F.count("*").cast("long").alias("n_tot"))
    scored = (
        cells.join(classes, ["day_idx", "value_bucket"])
        .join(F.broadcast(glob), "event_type")
        .crossJoin(F.broadcast(total))
        .groupBy("day_idx", "value_bucket")
        .agg(
            F.first("n_c").alias("n_c"),
            F.first("n_tot").alias("n_tot"),
            F.sum(
                F.abs(F.col("n") * F.col("n_tot") - F.col("g") * F.col("n_c"))
            ).alias("present_diff"),
            F.sum("g").alias("present_g"),
        )
        .select(
            "n_c",
            F.expr(
                "(1000 * (present_diff + n_c * (n_tot - present_g)))"
                " div (2 * n_c * n_tot)"
            ).alias("t_milli"),
        )
    )
    lo_sql, hi_sql = _t_close_band_sql("t_milli")
    bands = scored.groupBy(
        F.expr(lo_sql).alias("t_lo"), F.expr(hi_sql).alias("t_hi")
    ).agg(
        F.count("*").alias("n_classes"),
        F.sum("n_c").alias("n_records"),
    )
    w = Window.partitionBy()  # ≤5 band rows — a driver-trivial window
    return bands.select(
        "t_lo",
        "t_hi",
        "n_classes",
        "n_records",
        F.sum("n_records").over(w).alias("_tot"),
    ).select(
        "t_lo",
        "t_hi",
        "n_classes",
        "n_records",
        F.expr("(n_records * 1000) div _tot").alias("records_milli"),
    )


_TC_LO, _TC_HI = _t_close_band_sql("t_milli")

ORACLE_T_CLOSENESS = f"""
WITH cells AS (
  SELECT epoch_us(ts) // {K_ANON_DAY_US} AS day_idx,
         TRY_CAST(ROUND(value * 100) AS BIGINT)
           // {K_ANON_VALUE_CENTS} AS value_bucket,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
classes AS (
  SELECT day_idx, value_bucket, CAST(SUM(n) AS BIGINT) AS n_c
  FROM cells GROUP BY 1, 2
),
gl AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS g FROM events GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM events),
scored AS (
  SELECT c.day_idx, c.value_bucket, cl.n_c,
         (1000 * (SUM(ABS(c.n * t.n_tot - g.g * cl.n_c))
                  + cl.n_c * (ANY_VALUE(t.n_tot) - SUM(g.g))))
           // (2 * cl.n_c * ANY_VALUE(t.n_tot)) AS t_milli
  FROM cells c
  JOIN classes cl USING (day_idx, value_bucket)
  JOIN gl g USING (event_type)
  CROSS JOIN tot t
  GROUP BY c.day_idx, c.value_bucket, cl.n_c
),
bands AS (
  SELECT {_TC_LO} AS t_lo, {_TC_HI} AS t_hi,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(n_c) AS BIGINT) AS n_records
  FROM scored GROUP BY 1, 2
)
SELECT t_lo, t_hi, n_classes, n_records,
       CAST((n_records * 1000) // SUM(n_records) OVER () AS BIGINT)
         AS records_milli
FROM bands
"""


ORACLE_K_ANONYMITY = f"""
WITH members AS (
  SELECT DISTINCT event_type,
         epoch_us(ts) // {K_ANON_DAY_US} AS day_idx,
         TRY_CAST(ROUND(value * 100) AS BIGINT)
           // {K_ANON_VALUE_CENTS} AS value_bucket,
         user_id
  FROM events
),
classes AS (
  SELECT event_type, day_idx, value_bucket, COUNT(*) AS k
  FROM members GROUP BY 1, 2, 3
),
bands AS (
  SELECT {_KA_LO} AS k_lo, {_KA_HI} AS k_hi,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(k) AS BIGINT) AS n_subjects
  FROM classes GROUP BY 1, 2
)
SELECT k_lo, k_hi, n_classes, n_subjects,
       CAST((n_subjects * 1000) // SUM(n_subjects) OVER () AS BIGINT)
         AS subjects_milli
FROM bands
"""


ORACLE_TEMPORAL_HOLDOUT = f"""
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
c AS (
  SELECT CASE WHEN lo IS NULL THEN 0
         ELSE lo + (hi - lo) * {HOLDOUT_NUM} // {HOLDOUT_DEN} END AS cutoff
  FROM b
),
pu AS (
  SELECT user_id,
         SUM(CAST(epoch_us(ts) < cutoff AS INT)) AS u_train,
         SUM(CAST(epoch_us(ts) >= cutoff AS INT)) AS u_test
  FROM events CROSS JOIN c
  GROUP BY user_id
)
SELECT (SELECT cutoff FROM c) AS cutoff_micros,
       CAST(COALESCE(SUM(u_train), 0) AS BIGINT) AS n_train_events,
       CAST(COALESCE(SUM(u_test), 0) AS BIGINT) AS n_test_events,
       CAST(COALESCE(SUM(CAST(u_train > 0 AS INT)), 0) AS BIGINT)
         AS n_train_users,
       CAST(COALESCE(SUM(CAST(u_test > 0 AS INT)), 0) AS BIGINT)
         AS n_test_users,
       CAST(COALESCE(SUM(CAST(u_train > 0 AND u_test > 0 AS INT)), 0)
         AS BIGINT) AS n_leaky_users
FROM pu
"""


# DP contribution bounding: per-(user, key) cap and per-user key cap.
# Both bind on the fixture (per-(user,key) counts reach ~8; users touch
# ~50-100 (type, day) keys), so the report is non-trivial at every SF.
DP_MAX_PER_KEY = 3
DP_MAX_KEYS_PER_USER = 25


def q_dp_contribution_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user contribution bounding + realized-sensitivity report —
    the DETERMINISTIC half of a differentially-private release (Wilson
    et al., "Differentially Private SQL with Bounded User
    Contribution", PoPETS 2020 §4; the noise addition itself is
    random, so what an engine tests is everything before it): before
    noising per-(event_type, day) counts, each user's contribution is
    capped at C={DP_MAX_PER_KEY} events per key AND L=
    {DP_MAX_KEYS_PER_USER} keys overall (their top-L keys by
    contribution, ties broken deterministically), which bounds the L1
    sensitivity of the released histogram by C·L regardless of any
    one user's activity. Reports per event_type: (event_type, n_keys,
    raw_events, bounded_events, dropped_milli, max_user_bound) where
    max_user_bound is the realized max per-user bounded contribution
    within the type — the number the DP accountant actually uses when
    it is smaller than the worst-case C·L.

    Deterministic end to end: the top-L key selection orders by
    (contribution DESC, event_type, day_idx) over the unique
    (user, key) frame, so no tie can resolve differently across
    engines; day = epoch-micros div 86_400e6 as in the k-anonymity QI.

    Scale shape (100 TB): ONE shrinking hash aggregate (events →
    (user, type, day) counts — map-side partials do the heavy lift),
    ONE window partitioned by user over that user's KEY rows (key
    cardinality per user, never event cardinality — bounded by
    |types|·|days| regardless of how active the user is), then
    per-type hash rollups of raw and bounded sides joined on the
    ≤|types|-row frame. No corpus windows, no collects."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {K_ANON_DAY_US}").alias("day_idx")
    uk = (
        ev.select("user_id", "event_type", day)
        .groupBy("user_id", "event_type", "day_idx")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n"), "event_type", "day_idx"
    )
    kept = (
        uk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= DP_MAX_KEYS_PER_USER)
        .withColumn(
            "n_b", F.least(F.col("n"), F.lit(DP_MAX_PER_KEY))
        )
    )
    raw = uk.groupBy("event_type").agg(
        F.countDistinct("day_idx").alias("n_keys"),
        F.sum("n").alias("raw_events"),
    )
    per_user_type = kept.groupBy("event_type", "user_id").agg(
        F.sum("n_b").alias("u_b")
    )
    bounded = per_user_type.groupBy("event_type").agg(
        F.sum("u_b").alias("bounded_events"),
        F.max("u_b").alias("max_user_bound"),
    )
    return (
        raw.join(bounded, "event_type", "left")
        .select(
            "event_type",
            "n_keys",
            "raw_events",
            F.coalesce("bounded_events", F.lit(0)).alias("bounded_events"),
            F.expr(
                "((raw_events - coalesce(bounded_events, 0)) * 1000)"
                " div raw_events"
            ).alias("dropped_milli"),
            F.coalesce("max_user_bound", F.lit(0)).alias("max_user_bound"),
        )
    )


if q_dp_contribution_bound.__doc__:  # interpolate the cap constants
    q_dp_contribution_bound.__doc__ = q_dp_contribution_bound.__doc__.replace(
        "{DP_MAX_PER_KEY}", str(DP_MAX_PER_KEY)
    ).replace("{DP_MAX_KEYS_PER_USER}", str(DP_MAX_KEYS_PER_USER))


ORACLE_DP_CONTRIBUTION = f"""
WITH uk AS (
  SELECT user_id, event_type,
         epoch_us(ts) // {K_ANON_DAY_US} AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
kept AS (
  SELECT *, LEAST(n, {DP_MAX_PER_KEY}) AS n_b
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id
      ORDER BY n DESC, event_type, day_idx) AS rn
    FROM uk)
  WHERE rn <= {DP_MAX_KEYS_PER_USER}
),
raw AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT day_idx) AS BIGINT) AS n_keys,
         CAST(SUM(n) AS BIGINT) AS raw_events
  FROM uk GROUP BY 1
),
put AS (
  SELECT event_type, user_id, CAST(SUM(n_b) AS BIGINT) AS u_b
  FROM kept GROUP BY 1, 2
),
bounded AS (
  SELECT event_type,
         CAST(SUM(u_b) AS BIGINT) AS bounded_events,
         CAST(MAX(u_b) AS BIGINT) AS max_user_bound
  FROM put GROUP BY 1
)
SELECT r.event_type, r.n_keys, r.raw_events,
       CAST(COALESCE(b.bounded_events, 0) AS BIGINT) AS bounded_events,
       CAST(((r.raw_events - COALESCE(b.bounded_events, 0)) * 1000)
            // r.raw_events AS BIGINT) AS dropped_milli,
       CAST(COALESCE(b.max_user_bound, 0) AS BIGINT) AS max_user_bound
FROM raw r LEFT JOIN bounded b USING (event_type)
"""


# Incremental-rollup split point: base = first 2/3 of the time range,
# delta = the rest (the temporal_holdout cutoff recipe, so the split
# usually lands MID-day — the interesting case where base and delta
# both hold partials for the same (type, day) and the merge must
# combine them rather than concatenate).
ROLLUP_SPLIT_NUM = 2
ROLLUP_SPLIT_DEN = 3


def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance — the algebraic
    partial-aggregate merge every continuously-maintained aggregate at
    100 TB rides (Gray et al., Data Cube, ICDE 1996 §4's distributive
    functions; the same property Spark's own partial aggregation
    exploits per-partition): the per-(event_type, day) rollup
    (n_events, sum_cents, min_cents, max_cents, avg_cents) is computed
    as BASE partials (events before the 2/3-range cutoff) merged with
    DELTA partials (events after) — count/sum merge by +, min/max by
    min/max, avg derived from merged sums LAST (avg is not
    distributive; merging avgs would be wrong, which is exactly what
    the oracle would catch). The cutoff deliberately lands mid-day —
    at the sf0.01 gate scale and above the same (type, day) group then
    holds partials on BOTH sides and the merge genuinely combines
    rather than concatenates (pinned in pytest; at sf0.001 the cutoff
    can fall in an empty intra-day gap, exercising only the disjoint
    — still correct — merge).

    The oracle computes the rollup in ONE pass — hash-equality IS the
    algebraic-merge proof. Production shape: the base partials are a
    stored table and only the delta is scanned per refresh (here both
    sides re-scan the fixture because the demo owns no state — the
    merge plan is what carries to 100 TB: rollup-sized frames, one
    union + one shrinking hash aggregate, no corpus re-aggregation).

    Integer-exact: cents via the shared try_cast(round(...)) recipe,
    avg a truncating div of merged sums."""
    ev = load_table(spark, sf_dir, "events")
    lohi = ev.agg(
        F.min(F.expr("unix_micros(ts)")).alias("lo"),
        F.max(F.expr("unix_micros(ts)")).alias("hi"),
    )
    cutoff = lohi.select(
        F.expr(
            "CASE WHEN lo IS NULL THEN 0 ELSE "
            f"lo + (hi - lo) * {ROLLUP_SPLIT_NUM} div {ROLLUP_SPLIT_DEN} "
            "END"
        ).alias("cutoff")
    )
    base_row = ev.crossJoin(F.broadcast(cutoff)).select(
        "event_type",
        F.expr(f"unix_micros(ts) div {K_ANON_DAY_US}").alias("day_idx"),
        F.expr(sql_cents_spark("value")).alias("c"),
        F.expr("unix_micros(ts) < cutoff").alias("is_base"),
    )

    def _partials(side):
        return side.groupBy("event_type", "day_idx").agg(
            F.count("*").alias("n_events"),
            F.sum("c").alias("sum_cents"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )

    base = _partials(base_row.filter("is_base"))
    delta = _partials(base_row.filter("NOT is_base"))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day_idx")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    return merged.select(
        "event_type",
        "day_idx",
        "n_events",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr("sum_cents div n_events").alias("avg_cents"),
    )


ORACLE_ROLLUP_INCREMENTAL = f"""
SELECT event_type,
       epoch_us(ts) // {K_ANON_DAY_US} AS day_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(MIN(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(TRY_CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS max_cents,
       CAST(SUM(TRY_CAST(ROUND(value * 100) AS BIGINT))
            // COUNT(*) AS BIGINT) AS avg_cents
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "events_window": q_events_window,
    "events_transition_matrix": q_events_transition_matrix,
    "events_top_paths": q_events_top_paths,
    "events_anomaly": q_events_anomaly,
    "events_funnel": q_events_funnel,
    "events_cdc_merge": q_events_cdc_merge,
    "events_sessionize": q_events_sessionize,
    "events_latest_per_user": q_events_latest_per_user,
    "events_json_props": q_events_json_props,
    "temporal_holdout_report": q_temporal_holdout_report,
    "k_anonymity_report": q_k_anonymity_report,
    "l_diversity_report": q_l_diversity_report,
    "t_closeness_report": q_t_closeness_report,
    "dp_contribution_bound": q_dp_contribution_bound,
    "rollup_incremental": q_rollup_incremental,
}

ORACLES = {
    "k_anonymity_report": ORACLE_K_ANONYMITY,
    "l_diversity_report": ORACLE_L_DIVERSITY,
    "t_closeness_report": ORACLE_T_CLOSENESS,
    "dp_contribution_bound": ORACLE_DP_CONTRIBUTION,
    "rollup_incremental": ORACLE_ROLLUP_INCREMENTAL,
    "events_window": ORACLE_EVENTS_WINDOW,
    "events_transition_matrix": ORACLE_EVENTS_TRANSITIONS,
    "events_top_paths": ORACLE_EVENTS_TOP_PATHS,
    "events_anomaly": ORACLE_EVENTS_ANOMALY,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
    "events_cdc_merge": ORACLE_EVENTS_CDC_MERGE,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_latest_per_user": ORACLE_EVENTS_LATEST,
    "events_json_props": ORACLE_EVENTS_JSON,
    "temporal_holdout_report": ORACLE_TEMPORAL_HOLDOUT,
}
