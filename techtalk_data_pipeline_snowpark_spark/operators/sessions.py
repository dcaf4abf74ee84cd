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
