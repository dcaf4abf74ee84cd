"""Event-time streaming operators: watermarked windowed aggregation and a
custom stateful sessionizer.

The reference's streams are transactional CDC queues with no event-time
semantics (SURVEY.md §2.11); these extend the engine to the event-time
side of Structured Streaming for the training-data pipeline cases
(arrival-rate features, session construction from interaction logs):

- ``windowed_counts``: tumbling event-time windows with a watermark —
  late rows beyond the watermark are dropped by the runtime, state is
  bounded, output is append-mode final windows.
- ``stateful_sessions``: gap-based sessions via
  ``applyInPandasWithState`` — per-user state carries (start, last, count,
  sum); a processing-time timeout flushes idle sessions. State values stay
  in one scalar tuple per key; per-batch work is vectorized pandas.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_s", T.LongType()),
        T.StructField("session_end_s", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_s", T.LongType()),
        T.StructField("last_s", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window counts with bounded state.

    On a stream, emit with ``outputMode("append")`` — windows finalize
    when the watermark passes; state for closed windows is dropped (the
    100 TB property: state size is O(open windows), not O(stream))."""
    # watermarks require TIMESTAMP (ltz); parquet fixtures carry NTZ
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            F.unix_timestamp("w.end").alias("window_end_s"),
            "event_type", "n", "sum_value",
        )
    )


def _session_fn(gap_seconds: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, start, last, n, s, True]],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
            return
        start, last, n, s = state.get if state.exists else (None, None, 0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("secs")
            for secs, val in zip(pdf["secs"].to_numpy(), pdf["value"].to_numpy()):
                secs = int(secs)
                if last is not None and secs - last > gap_seconds:
                    out.append([user_id, start, last, n, s, True])
                    start, last, n, s = None, None, 0, 0.0
                if start is None:
                    start = secs
                last = secs
                n += 1
                s += float(val)
        if last is not None:
            state.update((start, last, n, s))
            state.setTimeoutDuration(gap_seconds * 1000)
            out.append([user_id, start, last, n, s, False])  # open-session progress
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])

    return fn


def stateful_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessions per user.

    Emits a row per (user, batch) with the running open session
    (closed=False) and a final row when a gap/timeout closes it
    (closed=True). Use on ``readStream`` input with
    ``outputMode("update")``."""
    prepped = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("secs"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
