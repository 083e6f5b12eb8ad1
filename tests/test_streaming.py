"""Structured Streaming vs batch-twin equivalence (SURVEY.md §2.D C6).

The oracle-gated streaming entries are covered by test_oracle_parity
(they are registered in __spark_entry__); here we test the shapes that
have no SQL-expressible oracle (sliding windows, raw dedup stream) and
the micro-batching behavior that the single-batch AvailableNow entries
don't exercise (stateful operator across MULTIPLE micro-batches).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gomysql2pg_spark.catalog import load_table
from gomysql2pg_spark.streaming import stream as S


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_sliding_windows_match_batch(spark, sf_dir):
    ev = S.read_events_stream(spark, sf_dir)
    name = S.run_to_memory(
        S.sliding_window_counts(ev), output_mode="complete"
    )
    got = spark.table(name)

    batch = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    win_us, slide_us = 600 * 1_000_000, 300 * 1_000_000
    # each event falls into ceil(window/slide)=2 panes: the pane starting
    # at floor(us/slide)*slide and the one before it
    panes = batch.select(
        "event_type",
        F.explode(
            F.array(
                (F.floor(F.col("us") / slide_us) * slide_us).cast("long"),
                (F.floor(F.col("us") / slide_us) * slide_us - slide_us).cast(
                    "long"
                ),
            )
        ).alias("win_start_us"),
        "us",
    ).filter(
        (F.col("us") >= F.col("win_start_us"))
        & (F.col("us") < F.col("win_start_us") + win_us)
    )
    expected = panes.groupBy("win_start_us", "event_type").agg(
        F.count("*").alias("n_events")
    )
    cols = ["win_start_us", "event_type", "n_events"]
    assert _rows(got, cols) == _rows(expected, cols)


def test_dedup_stream_keeps_every_unique_event(spark, sf_dir):
    ev = S.read_events_stream(spark, sf_dir)
    name = S.run_to_memory(S.deduped_stream(ev), output_mode="append")
    got = spark.table(name)
    batch = load_table(spark, sf_dir, "events")
    assert got.count() == batch.select("event_id").distinct().count()
    assert _rows(got, ["event_id"]) == _rows(batch, ["event_id"])


def test_stream_anomaly_state_continues_across_batches(
    spark, sf_dir, tmp_path
):
    """The per-user trailing-history deque must CONTINUE across
    micro-batches: split the fixture at the time median into two files
    processed oldest-first (one per trigger) — verdicts for
    second-half events depend on first-half history held in state, and
    the drained result must equal the batch window over the full
    table bit-for-bit."""
    ev_batch = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    stats = ev_batch.select(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    ).first()
    cut = stats["lo"] + (stats["hi"] - stats["lo"]) // 2
    src = str(tmp_path / "events_halves")
    os.makedirs(src)
    ev_batch.filter(us < cut).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    ev_batch.filter(us >= cut).coalesce(1).write.parquet(
        os.path.join(src, "b")
    )
    # file source picks oldest-mtime first: pin the half order
    for i, d in enumerate(["a", "b"]):
        for f in glob.glob(os.path.join(src, d, "*.parquet")):
            os.utime(f, (1_000_000_000 + i, 1_000_000_000 + i))
    stream = (
        spark.readStream.schema(ev_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    name = S.run_to_memory(S.stateful_anomaly(stream), output_mode="update")
    got = spark.table(name)
    from gomysql2pg_spark.operators.events import q_events_anomaly

    expected = q_events_anomaly(spark, sf_dir)
    cols = ["event_id", "user_id", "vc", "prev_cnt", "prev_sum", "is_spike"]
    assert _rows(got, cols) == _rows(expected, cols)


def test_stateful_totals_across_micro_batches(spark, sf_dir, tmp_path):
    """Split the fixture into several files and force one file per
    micro-batch: the stateful operator must carry state across batches
    and its LAST emission per user must equal the batch aggregate."""
    ev_batch = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_parts")
    ev_batch.repartition(4).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) >= 2

    stream = (
        spark.readStream.schema(ev_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = S.run_to_memory(
        S.stateful_user_totals(stream), output_mode="update"
    )
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_cents", "n_events").alias("value_cents"),
        )
    )
    expected = ev_batch.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "value_cents"
        ),
    )
    cols = ["user_id", "n_events", "value_cents"]
    assert _rows(got, cols) == _rows(expected, cols)
    # multiple emissions per user prove state crossed micro-batches
    n_emissions = spark.table(name).count()
    assert n_emissions > expected.count()


def test_checkpoint_resume_processes_only_new_files(spark, sf_dir, tmp_path):
    """Exactly-once ingest across restarts: drain run 1 with a
    checkpoint, add new source files, re-run with the SAME checkpoint —
    the resumed query must process only the new files (no reprocessing,
    no duplicates in the foreachBatch parquet sink)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    us = F.unix_micros("ts")
    stats = ev.select(F.min(us).alias("lo"), F.max(us).alias("hi")).first()
    cut = stats["lo"] + (stats["hi"] - stats["lo"]) // 2
    first_half = ev.filter(us < cut)
    second_half = ev.filter(us >= cut)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first_half.coalesce(1).write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, batch_id: batch_df.write.mode(
                    "append"
                ).parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first_half.count()

    second_half.coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # no duplicates, nothing missed
    assert got.select("event_id").distinct().count() == ev.count()


def test_windowed_counts_append_emits_only_sealed_windows(spark, sf_dir, tmp_path):
    """Watermark emission contract (append mode): a window row is
    emitted exactly when the watermark (max observed event time minus
    the delay) has passed its end. Split the fixture into two
    micro-batches; the final emitted set must equal the batch
    aggregation restricted to windows sealed by the final watermark —
    windows newer than (max ts - delay) are withheld."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    us = F.unix_micros("ts")
    stats = ev.select(F.min(us).alias("lo"), F.max(us).alias("hi")).first()
    cut = stats["lo"] + (stats["hi"] - stats["lo"]) // 2

    src = str(tmp_path / "two_parts")
    ev.filter(us >= cut).coalesce(1).write.parquet(src)
    files = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    assert len(files) == 1
    ev.filter(us < cut).coalesce(1).write.mode("append").parquet(src)
    now = os.path.getmtime(files[0])
    os.utime(files[0], (now - 3600, now - 3600))
    for f in glob.glob(os.path.join(src, "part-*.parquet")):
        if f not in files:
            os.utime(f, (now + 3600, now + 3600))

    delay_us = 6 * 3600 * 1_000_000
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = S.run_to_memory(
        S.windowed_counts(stream, watermark="6 hours"),
        output_mode="append",
    )
    got = spark.table(name)

    win_us = 300 * 1_000_000
    watermark_us = stats["hi"] - delay_us
    expected = (
        ev.groupBy(
            (F.floor(us / win_us) * win_us).cast("long").alias("win_start_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .filter(F.col("win_start_us") + win_us <= watermark_us)
    )
    cols = ["win_start_us", "event_type", "n_events", "value_cents"]
    assert _rows(got, cols) == _rows(expected, cols)
    # sanity: something was withheld (the tail 6 hours of windows)
    assert got.count() < ev.select((F.floor(us / win_us)), "event_type").distinct().count()


def test_anomaly_bucket_worker_matches_per_user_reference():
    """The bucketed state worker's vectorized fold must equal a plain
    per-user reference loop event-for-event, across TWO invocations
    sharing state: users interleaved in one bucket, prior tails spliced
    ahead of new values, untouched users' state preserved and the
    user index kept sorted."""
    import numpy as np
    import pandas as pd

    lookback, min_prev, factor = 10, 5, 3

    class FakeState:
        def __init__(self):
            self.exists, self._v = False, None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    rng = np.random.default_rng(7)

    def mkbatch(users, n_each):
        rows = []
        for u in users:
            for i in range(n_each):
                rows.append(
                    (
                        int(rng.integers(0, 10**6)),
                        u,
                        int(rng.integers(0, 10**9)),
                        int(rng.integers(0, 500)),
                    )
                )
        rng.shuffle(rows)
        return pd.DataFrame(
            rows, columns=["event_id", "user_id", "us", "vc"]
        )

    # reference: per-user deque fold over both batches in order
    def reference(batches):
        hist: dict[int, list[int]] = {}
        out = {}
        for pdf in batches:
            pdf = pdf.sort_values(["user_id", "us", "event_id"])
            for _, r in pdf.iterrows():
                h = hist.setdefault(int(r.user_id), [])
                window = h[-lookback:]
                cnt, s = len(window), sum(window)
                spike = int(cnt >= min_prev and r.vc * cnt > factor * s)
                out[(int(r.event_id), int(r.user_id))] = (
                    cnt,
                    s,
                    spike,
                )
                h.append(int(r.vc))
        return out

    b1 = mkbatch([3, 7, 11, 500], 8)
    b2 = mkbatch([7, 11, 999], 9)  # 3 and 500 untouched in batch 2
    expected = reference([b1, b2])

    worker = S.make_anomaly_worker(lookback, min_prev, factor)
    st = FakeState()
    got = {}
    for pdf in (b1, b2):
        for out in worker((0,), iter([pdf]), st):
            for _, r in out.iterrows():
                got[(int(r.event_id), int(r.user_id))] = (
                    int(r.prev_cnt),
                    int(r.prev_sum),
                    int(r.is_spike),
                )
    assert got == expected
    users, lens, vals = st.get
    assert users == sorted(users)  # searchsorted precondition
    assert len(vals) == sum(lens)
    assert set(users) == {3, 7, 11, 500, 999}
    assert all(ln <= lookback for ln in lens)  # bounded state


def test_totals_bucket_worker_merges_state_across_batches():
    """The bucketed totals worker: per-user running (count, cents)
    across two invocations sharing one bucket's state — batch users
    aggregated vectorized, untouched users' totals preserved, user
    index kept sorted, and each batch emits exactly the batch's users
    with their RUNNING totals."""
    import numpy as np
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists, self._v = False, None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    def mk(rows):
        return pd.DataFrame(rows, columns=["user_id", "cents"])

    b1 = mk([(7, 100), (3, 5), (7, 50), (500, 1)])
    b2 = mk([(3, 10), (999, 7), (3, 20)])

    worker = S.make_user_totals_worker()
    st = FakeState()
    out1 = pd.concat(worker((0,), iter([b1]), st))
    got1 = {
        int(r.user_id): (int(r.n_events), int(r.value_cents))
        for _, r in out1.iterrows()
    }
    assert got1 == {3: (1, 5), 7: (2, 150), 500: (1, 1)}
    out2 = pd.concat(worker((0,), iter([b2]), st))
    got2 = {
        int(r.user_id): (int(r.n_events), int(r.value_cents))
        for _, r in out2.iterrows()
    }
    assert got2 == {3: (3, 35), 999: (1, 7)}  # running, not per-batch
    users, ns, cents, valids = st.get
    assert users == [3, 7, 500, 999]  # sorted; 7/500 preserved
    assert ns == [3, 2, 1, 1]
    assert cents == [35, 150, 1, 7]
    assert valids == ns  # every measurement in this fixture is finite


def test_stateful_totals_survive_refunds_across_batches(spark, tmp_path):
    """The max/max decoupling regression (r13 review finding): a
    negative event value (refund) in a LATER micro-batch makes the
    running cents total DECREASE between emissions; two independent
    max()es would pair batch-2's event count with batch-1's higher
    cents. max_by keeps the pair from the final emission."""
    import datetime as dt

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "refund_events")
    spark.createDataFrame(
        [(1, t0, 7, "purchase", 5.00, "{}")], schema
    ).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2, t0 + dt.timedelta(minutes=1), 7, "refund", -2.00, "{}")],
        schema,
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = S.run_to_memory(
        S.stateful_user_totals(stream), output_mode="update"
    )
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_cents", "n_events").alias("value_cents"),
        )
        .collect()
    )
    assert len(got) == 1
    r = got[0]
    assert (r["user_id"], r["n_events"], r["value_cents"]) == (7, 2, 300)
