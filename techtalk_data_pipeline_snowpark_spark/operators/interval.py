"""Distributed range (interval) join: match point rows to the interval
rows that contain them, without a cartesian/nested-loop plan.

Beyond-reference operator (no range join in the reference; Spark compiles
``l.key = r.key AND r.lo <= l.ts AND l.ts <= r.hi`` to a shuffled
equi-join ONLY on the key — every hot key degenerates to a per-key
nested loop). The standard scale fix is grid bucketing:

1. Explode each interval into the coarse time cells it covers
   (``sequence(floor(lo/g), floor(hi/g))``) — one row per (key, cell).
2. Map each point to its single cell (``floor(ts/g)``).
3. Equi-join on (key, cell) — a plain shuffled hash join — then filter
   the exact containment predicate.

Each point joins an interval through exactly one cell (the point's own),
so containment needs no post-dedup. The granularity ``g`` bounds the
explosion: cells-per-interval ≈ span/g + 1, so pick g on the order of
the typical interval span. Cost is O(intervals × span/g + points) shuffle
rows — tunable, skew-safe (a hot key's intervals spread across cells).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str = "ts_s",
    start_col: str = "start_s",
    end_col: str = "end_s",
    granularity: int = 3600,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row with the
    same key whose ``[start_col, end_col]`` (inclusive both ends)
    contains ``point_ts``. All three time columns must be integral
    (e.g. epoch seconds). Unmatched points drop (inner semantics).

    Non-key interval columns ride through under their own names; callers
    rename collisions beforehand.
    """
    keys = [on] if isinstance(on, str) else list(on)
    g = int(granularity)
    if g <= 0:
        raise ValueError("granularity must be positive")

    cells = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / g).cast("long"),
                F.floor(F.col(end_col) / g).cast("long"),
            )
        ),
    )
    pts = points.withColumn("__cell", F.floor(F.col(point_ts) / g).cast("long"))
    cond = [pts[k] == cells[k] for k in keys]
    cond.append(pts["__cell"] == cells["__cell"])
    contained = (F.col(start_col) <= pts[point_ts]) & (
        pts[point_ts] <= F.col(end_col)
    )
    return (
        pts.join(cells, cond, "inner")
        .where(contained)
        .select(
            *[pts[c] for c in points.columns],
            *[cells[c] for c in intervals.columns if c not in keys],
        )
    )
