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


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding event-time windows (overlapping): each event lands in
    window/slide windows; same bounded-state/append-mode semantics as the
    tumbling variant."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            F.unix_timestamp("w.end").alias("window_end_s"),
            "event_type", "n",
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """In-stream duplicate-delivery defense: drop repeated keys within the
    watermark horizon (``dropDuplicatesWithinWatermark``) — state holds one
    entry per key only until the watermark passes its event time, so state
    is bounded by the horizon, not the stream (the property a plain
    ``dropDuplicates`` on a stream lacks). Complements the engine's
    manifest idempotence: this trims duplicates BEFORE they reach an epoch,
    the manifest makes re-applied epochs no-ops after."""
    prepped = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return prepped.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def _session_fn(gap_seconds: int, event_time: bool):
    cols = [f.name for f in SESSION_SCHEMA.fields]

    def arm(state: GroupState, last_s: int) -> None:
        """Re-arm the idle-session timer. Event-time mode: fire when the
        WATERMARK passes last+gap — replay-speed invariant (a historical
        stream replayed 100× faster closes the same sessions at the same
        event times). Processing-time mode: wall-clock idle timer."""
        if event_time:
            target = (last_s + gap_seconds) * 1000
            # Spark rejects timeout timestamps at/below the current
            # watermark — the session is already expired; the next batch's
            # hasTimedOut pass collects it after this clamped arm.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(target, wm + 1))
        else:
            state.setTimeoutDuration(gap_seconds * 1000)

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame([[user_id, start, last, n, s, True]], columns=cols)
            return
        start0, last0, n0, s0 = state.get if state.exists else (None, None, 0, 0.0)
        # applyInPandasWithState delivers a group's rows as MULTIPLE Arrow
        # chunks with no cross-chunk ordering guarantee — materialize the
        # whole group and sort once (per-chunk sorting corrupts sessions for
        # groups larger than one Arrow batch).
        chunks = list(pdfs)
        if not chunks:  # zero-chunk delivery: keep state, re-arm the timer
            if last0 is not None:
                arm(state, last0)
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        if len(pdf) == 0:
            if last0 is not None:
                arm(state, last0)  # keep the timer armed
            return
        import numpy as np

        secs = pdf["secs"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        order = np.argsort(secs, kind="stable")
        secs, vals = secs[order], vals[order]
        # Vectorized gap detection: a session boundary wherever the time
        # delta exceeds the gap. The only Python loop below is over
        # SESSIONS (few), never over events (many).
        new_seg = np.empty(secs.shape, dtype=bool)
        new_seg[0] = True
        np.greater(np.diff(secs), gap_seconds, out=new_seg[1:])
        seg_id = np.cumsum(new_seg) - 1
        counts = np.bincount(seg_id)
        sums = np.bincount(seg_id, weights=vals)
        first_idx = np.flatnonzero(new_seg)
        last_idx = np.append(first_idx[1:] - 1, secs.size - 1)
        seg_start = secs[first_idx].astype(np.int64)
        seg_end = secs[last_idx]
        out = []
        if last0 is not None:
            if int(secs[0]) - last0 > gap_seconds:
                out.append([user_id, start0, last0, n0, s0, True])
            else:  # carried open session continues into segment 0
                seg_start[0] = start0
                counts[0] += n0
                sums[0] += s0
        k = counts.size
        for i in range(k - 1):  # all but the final segment closed by a gap
            out.append(
                [user_id, int(seg_start[i]), int(seg_end[i]), int(counts[i]), float(sums[i]), True]
            )
        state.update(
            (int(seg_start[k - 1]), int(seg_end[k - 1]), int(counts[k - 1]), float(sums[k - 1]))
        )
        arm(state, int(seg_end[k - 1]))
        out.append(
            [user_id, int(seg_start[k - 1]), int(seg_end[k - 1]), int(counts[k - 1]),
             float(sums[k - 1]), False]  # open-session progress
        )
        yield pd.DataFrame(out, columns=cols)

    return fn


def stateful_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    timeout: str = "event",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessions per user.

    Emits a row per (user, batch) with the running open session
    (closed=False) and a final row when a gap/timeout closes it
    (closed=True). Use on ``readStream`` input with
    ``outputMode("update")``.

    ``timeout="event"`` (default): idle sessions close when the WATERMARK
    passes last_event + gap — replay-speed invariant, the correct semantics
    for replayed historical streams (a backfill at 100× speed closes the
    same sessions as live ingestion; wall-clock pauses between micro-
    batches never close a session spuriously). ``timeout="processing"``
    keeps the wall-clock idle timer for genuinely live feeds where the
    source stops producing watermark updates when idle."""
    event_mode = timeout == "event"
    prepped = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("_et"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias("secs"),
        F.col(value_col).cast("double").alias("value"),
    )
    if event_mode:
        prepped = prepped.withWatermark("_et", watermark)
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds, event_mode),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if event_mode
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
