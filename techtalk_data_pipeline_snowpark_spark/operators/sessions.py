"""Gap-based sessionization over an event stream.

Beyond-reference training-data op: segment each user's events into
sessions separated by > ``gap_seconds`` of inactivity, then aggregate per
session. Classic two-window construction (lag → new-session flag →
running sum = session index) — all JVM-side.

Scale posture: both windows partition by the user key only — one shuffle,
partial ordering within partitions; no global sort. Skewed users are
bounded by per-user event counts (sessionization is inherently per-key
sequential; for pathological single-key streams, pre-split by day first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-user session index to every event.

    Ordering ties on the timestamp are broken by ``id_col`` so the
    segmentation is deterministic. Timestamps are compared at whole-second
    resolution (cross-engine exactness).
    """
    secs = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(secs, F.col(id_col))
    new_session = F.when(
        F.lag(secs).over(w).isNull() | ((secs - F.lag(secs).over(w)) > gap_seconds), 1
    ).otherwise(0)
    wsum = Window.partitionBy(user_col).orderBy(secs, F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("_new", new_session).withColumn(
        "session_idx", F.sum("_new").over(wsum).cast("long")
    ).drop("_new")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: event count, span, exact value sum."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    secs = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(secs).alias("start_s"),
        F.max(secs).alias("end_s"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


def session_window_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Native gap sessions via the built-in ``F.session_window`` — the
    Spark-first scale path: the same expression works on batch AND
    Structured Streaming (add a watermark), and Catalyst plans a dedicated
    session-window aggregation (merging partial sessions map-side) instead
    of the two-window shuffle+sort of ``sessionize``.

    Boundary convention differs from ``sessionize`` by design: the builtin
    window spans [event, event+gap), so a new session starts when the
    inter-event gap is **>= gap** (``sessionize`` splits on > gap). At
    whole-second resolution ``session_window_stats(g)`` ≡
    ``session_stats(gap_seconds=g-1)`` — asserted in tests."""
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        ev.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("start_s"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("end_s"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(user_col, "start_s", "end_s", "n_events", "sum_value")
    )
