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
