"""Event-time streaming: watermarked windows + stateful sessionizer."""

import os

from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.streaming.event_time import (
    stateful_sessions,
    windowed_counts,
)


def _land_chunks(spark, sf_dir, out_dir, n_chunks=3):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(F.col("event_id") < 1200)
    bounds = [(i * 600, (i + 1) * 600) for i in range(n_chunks)]
    for lo, hi in bounds:
        (
            ev.where((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .coalesce(1).write.mode("append").parquet(out_dir)
        )
    return ev


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    """availableNow streaming windows (append mode, watermark) must equal
    the batch computation of the same closed windows."""
    events_dir = str(tmp_path / "ev")
    ev = _land_chunks(spark, sf_dir, events_dir, n_chunks=2)

    stream = spark.readStream.schema(ev.schema).parquet(events_dir)
    q = (
        windowed_counts(stream, window="10 minutes", watermark="5 minutes")
        .writeStream.format("memory").queryName("wincounts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    got = {
        (r.window_start_s, r.event_type): (r.n, r.sum_value)
        for r in spark.table("wincounts").collect()
    }
    batch = {
        (r.window_start_s, r.event_type): (r.n, r.sum_value)
        for r in windowed_counts(ev, window="10 minutes", watermark="5 minutes").collect()
    }
    assert got, "stream emitted no finalized windows"
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch[k])


def test_stateful_sessions_stream(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionizer: per-user session aggregates over
    the drained stream must match a pandas oracle (closed + open union)."""
    events_dir = str(tmp_path / "ev")
    ev = _land_chunks(spark, sf_dir, events_dir, n_chunks=2)

    stream = spark.readStream.schema(ev.schema).parquet(events_dir)
    q = (
        stateful_sessions(stream, gap_seconds=600)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    rows = spark.table("sessions").collect()
    assert rows

    # oracle: single-threaded pandas sessionization
    pdf = (
        ev.select(
            "user_id",
            F.unix_timestamp(F.col("ts").cast("timestamp")).alias("secs"),
            "value",
        )
        .toPandas()
        .sort_values(["user_id", "secs"])
    )
    oracle = {}
    for uid, g in pdf.groupby("user_id"):
        sessions = []
        start = last = None
        n, s = 0, 0.0
        for secs, val in zip(g["secs"], g["value"]):
            if last is not None and secs - last > 600:
                sessions.append((start, last, n, round(s, 6)))
                start, n, s = None, 0, 0.0
            if start is None:
                start = secs
            last = secs
            n += 1
            s += val
        sessions.append((start, last, n, round(s, 6)))
        oracle[uid] = sessions

    # streamed sessions: take the LAST emission per (user, session_start)
    got: dict = {}
    for r in rows:
        got[(r.user_id, r.session_start_s)] = (
            r.session_start_s, r.session_end_s, r.n_events, round(r.sum_value, 6)
        )
    for uid, sessions in oracle.items():
        for sess in sessions:
            key = (uid, sess[0])
            assert key in got, f"missing session {key}"
            assert got[key] == sess, (got[key], sess)


def test_stateful_sessions_group_spanning_arrow_chunks(spark, tmp_path):
    """A group larger than one Arrow batch arrives as multiple chunks with
    no cross-chunk order guarantee. The sessionizer must sort globally per
    group (ADVICE r1: per-chunk sorting corrupted session splits)."""
    import random

    events_dir = str(tmp_path / "ev1")
    # one user, 600 events, timestamps shuffled in file order so chunk
    # boundaries interleave early and late rows
    random.seed(42)
    secs_list = [1_700_000_000 + i * 60 + (i // 50) * 5000 for i in range(600)]
    random.shuffle(secs_list)
    rows = [(7, s, float(s % 97)) for s in secs_list]
    df = spark.createDataFrame(rows, "user_id long, secs long, value double").select(
        "user_id", F.to_timestamp(F.from_unixtime("secs")).alias("ts"), "value"
    )
    df.coalesce(1).write.parquet(events_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        stream = spark.readStream.schema(df.schema).parquet(events_dir)
        q = (
            stateful_sessions(stream, gap_seconds=600)
            .writeStream.format("memory").queryName("chunked_sessions")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(240)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {
        (r.user_id, r.session_start_s): (r.session_end_s, r.n_events, round(r.sum_value, 6))
        for r in spark.table("chunked_sessions").collect()
    }
    # oracle: sorted single pass
    ordered = sorted(secs_list)
    sessions, start, last, n, s = [], None, None, 0, 0.0
    for sec in ordered:
        if last is not None and sec - last > 600:
            sessions.append((start, last, n, round(s, 6)))
            start, n, s = None, 0, 0.0
        if start is None:
            start = sec
        last = sec
        n += 1
        s += float(sec % 97)
    sessions.append((start, last, n, round(s, 6)))
    assert len(sessions) > 1, "fixture must produce multiple sessions"
    for start, end, n, s in sessions:
        assert (7, start) in got, f"missing session start={start}"
        assert got[(7, start)] == (end, n, s)


def test_stateful_sessions_replay_speed_invariant(spark, tmp_path):
    """Event-time timeout (default): a historical stream replayed slowly —
    chunked across separate query runs with a wall-clock pause beyond the
    session gap — must close the SAME sessions as a single fast drain.
    Under the old ProcessingTimeTimeout the pause spuriously closed every
    open session; the event-time timer only fires when the WATERMARK
    passes last_event + gap."""
    import time

    base = 1_700_000_000
    # one user, 20 events spaced 60 s apart — ONE session under gap=300
    rows = [(1, base + i * 60, 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, secs long, value double").select(
        "user_id", F.to_timestamp(F.from_unixtime("secs")).alias("ts"), "value"
    )

    def run(events_dir, cp_dir, out_dir):
        # memory sink can't recover a checkpoint — foreachBatch → parquet
        def sink(batch_df, batch_id):
            batch_df.withColumn("_bid", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out_dir)

        stream = spark.readStream.schema(df.schema).parquet(events_dir)
        q = (
            stateful_sessions(stream, gap_seconds=300)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp_dir)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(240)

    def final_sessions(out_dir):
        out = {}
        rows = sorted(
            spark.read.parquet(out_dir).collect(), key=lambda r: r["_bid"]
        )
        for r in rows:  # last emission per session wins
            out[(r.user_id, r.session_start_s)] = (
                r.session_end_s, r.n_events, r.sum_value, r.closed,
            )
        return out

    # fast replay: everything in one drain
    fast_dir, fast_cp = str(tmp_path / "fast_ev"), str(tmp_path / "fast_cp")
    fast_out = str(tmp_path / "fast_out")
    df.coalesce(1).write.parquet(fast_dir)
    run(fast_dir, fast_cp, fast_out)

    # slow replay: first half, wall-clock pause, query RESTART from the
    # same checkpoint with the second half
    slow_dir, slow_cp = str(tmp_path / "slow_ev"), str(tmp_path / "slow_cp")
    slow_out = str(tmp_path / "slow_out")
    half1, half2 = df.where(F.col("secs") < base + 600), df.where(
        F.col("secs") >= base + 600
    )
    half1.coalesce(1).write.parquet(slow_dir)
    run(slow_dir, slow_cp, slow_out)
    time.sleep(2)  # wall time passes; event time does not
    half2.coalesce(1).write.mode("append").parquet(slow_dir)
    run(slow_dir, slow_cp, slow_out)

    fast = final_sessions(fast_out)
    slow = final_sessions(slow_out)
    assert set(fast) == set(slow) == {(1, base)}, (fast, slow)
    # the continuing session was NOT closed by the pause: both replays end
    # with the same open session covering all 20 events
    assert fast[(1, base)] == slow[(1, base)]
    assert slow[(1, base)][1] == 20 and slow[(1, base)][3] is False


def test_sliding_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    from techtalk_data_pipeline_snowpark_spark.streaming.event_time import sliding_counts

    events_dir = str(tmp_path / "ev_slide")
    ev = _land_chunks(spark, sf_dir, events_dir, n_chunks=2)
    stream = spark.readStream.schema(ev.schema).parquet(events_dir)
    q = (
        sliding_counts(stream, window="20 minutes", slide="10 minutes", watermark="5 minutes")
        .writeStream.format("memory").queryName("slidecounts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    got = {
        (r.window_start_s, r.event_type): r.n
        for r in spark.table("slidecounts").collect()
    }
    batch = {
        (r.window_start_s, r.event_type): r.n
        for r in sliding_counts(ev, window="20 minutes", slide="10 minutes").collect()
    }
    assert got
    for k, v in got.items():
        assert batch[k] == v
    # overlap sanity: an event contributes to 2 windows → sum over sliding
    # windows is ~2× the row count (edges aside)
    assert sum(got.values()) > len(got)


def test_stream_dedup_within_watermark(spark, tmp_path):
    from techtalk_data_pipeline_snowpark_spark.streaming.event_time import stream_dedup

    events_dir = str(tmp_path / "ev_dup")
    rows = []
    base = 1_700_000_000
    for i in range(300):
        rows.append((i % 50, base + i * 10, float(i)))          # original
        if i % 3 == 0:
            rows.append((i % 50, base + i * 10, float(i)))      # duplicate delivery
    df = spark.createDataFrame(rows, "user_id long, secs long, value double").select(
        "user_id", F.to_timestamp(F.from_unixtime("secs")).alias("ts"), "value"
    )
    df.coalesce(1).write.parquet(events_dir)
    stream = spark.readStream.schema(df.schema).parquet(events_dir)
    q = (
        stream_dedup(stream, ["user_id", "ts"], watermark="1 hour")
        .writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    out = spark.table("dedup_stream")
    assert out.count() == 300  # duplicates dropped
    assert out.select("user_id", "ts").distinct().count() == 300
