"""Distributed as-of (temporal) join: for every left row, the most recent
right row with the same key at or before the left row's timestamp.

Beyond-reference operator (the reference compiles everything to Snowflake
SQL and has no temporal join; Spark itself lacks ASOF JOIN as of 4.x).
The naive formulation — a range join ``l.key = r.key AND r.ts <= l.ts``
plus a per-left-row argmax — explodes into an O(|matches|) intermediate
per left row and skews on hot keys. This implementation is the
union-marker construction instead:

1. Tag right rows 0 and left rows 1, union them on (key, ts, marker)
   with the right payload packed into ONE struct column (null on left
   rows).
2. One window per key ordered by (ts, marker, tiebreakers):
   ``last(right_struct, ignorenulls=True)`` over unbounded-preceding →
   each left row picks up exactly the latest right row at-or-before its
   timestamp (marker 0 < 1 makes the boundary inclusive at equal ts).
3. Keep left rows, unpack the struct, optionally null out matches older
   than ``tolerance_seconds``.

Scale posture: ONE shuffle on the join key (the window's partition), no
range-join explosion, memory bounded by the window's incremental frame
(running ``last`` — Spark evaluates unbounded-preceding frames in one
forward pass, O(1) state per partition). A hot key costs a per-key sort,
the same bound as any per-key sequential operator; for pathological
single-key streams, ``hot_key_bucket_seconds`` switches to the two-pass
coarse-time-cell construction: rows partition by (key, cell) — a single
hot key spreads across as many tasks as it spans cells — and each cell
is seeded with a synthetic marker row carrying the latest right tail of
all PRECEDING cells (computed by a per-(key, cell) aggregation plus one
tiny per-key window over the cell list, O(#cells) rows, never row-grain).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str = "ts",
    right_time: str = "ts",
    tolerance_seconds: int | None = None,
    right_prefix: str = "right_",
    hot_key_bucket_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the most recent
    ``right`` row per key with ``right_time <= left_time`` (backward
    inclusive), or nulls when no right row precedes it (or the match is
    older than ``tolerance_seconds``).

    Right payload columns (everything except key + time) come back
    prefixed with ``right_prefix``; the matched right timestamp comes
    back as ``<right_prefix><right_time>``. Rows that tie on
    (key, time) within the RIGHT side are deduplicated deterministically
    (max struct by payload order) so the result never depends on
    partition order.

    ``hot_key_bucket_seconds`` (opt-in) defuses hot-key degeneracy: the
    default path sorts each key in ONE task, so a pathological single-key
    stream serializes. With a bucket width g, rows instead partition by
    (key, floor(ts/g)) and every cell is seeded with a synthetic row
    carrying the latest right tail of all preceding cells — identical
    results (property-tested against the default path), parallelism =
    number of populated cells. Pick g so a cell holds ~10⁵-10⁶ rows.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rpayload = [c for c in right.columns if c not in set(keys) | {right_time}]
    struct_cols = [F.col(right_time).alias("__t"), *[F.col(c) for c in rpayload]]

    # Deterministic right side: one row per (key, ts) — max struct wins.
    r = (
        right.groupBy(*keys, right_time)
        .agg(F.max(F.struct(*struct_cols)).alias("__r"))
        .select(
            *keys,
            F.col(right_time).cast("timestamp").alias("__ts"),
            F.lit(0).alias("__m"),
            "__r",
        )
    )
    lcols = left.columns
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__m"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    r_aligned = r.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in set(keys)
            else F.col(c)
            for c in lcols
        ],
        "__ts",
        "__m",
        "__r",
    )
    u = l.unionByName(r_aligned)

    if hot_key_bucket_seconds is not None:
        g = int(hot_key_bucket_seconds)
        if g <= 0:
            raise ValueError("hot_key_bucket_seconds must be positive")
        # coarse time cell: floor(epoch_seconds / g). Every row of a cell
        # needs at most (a) the right rows of its own cell and (b) the
        # latest right row of ALL preceding cells — so a synthetic __m=-1
        # seed row per cell (sorts before any real row: real rows have
        # __ts >= cell start and __m >= 0) carries (b) in, and the match
        # window can partition by (key, cell) instead of key alone.
        u = u.withColumn(
            "__cell",
            F.floor(F.col("__ts").cast("double") / F.lit(g)).cast("long"),
        )
        tails = (
            u.where(F.col("__m") == 0)
            .groupBy(*keys, "__cell")
            .agg(
                F.max(
                    F.struct(F.col("__ts").alias("__ts"), F.col("__r").alias("__r"))
                ).alias("__tail")
            )
        )
        # per-key running tail over the CELL LIST (O(#cells) rows — never
        # row-grain, so the sequential per-key pass is metadata-sized)
        wc = (
            Window.partitionBy(*keys)
            .orderBy("__cell")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        keyset = set(keys)
        seeds = (
            u.select(*keys, "__cell")
            .distinct()
            .join(tails, on=[*keys, "__cell"], how="left")
            .withColumn("__carry", F.last("__tail", ignorenulls=True).over(wc))
            .where(F.col("__carry").isNotNull())
            .select(
                *[
                    (
                        F.col(c)
                        if c in keyset
                        else F.lit(None).cast(left.schema[c].dataType)
                    ).alias(c)
                    for c in lcols
                ],
                (F.col("__cell") * g).cast("timestamp").alias("__ts"),
                F.lit(-1).alias("__m"),
                F.col("__carry.__r").alias("__r"),
                F.col("__cell"),
            )
        )
        u = u.unionByName(seeds.select(*u.columns))
        w = (
            Window.partitionBy(*keys, "__cell")
            .orderBy("__ts", "__m")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__m")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = F.last("__r", ignorenulls=True).over(w)
    out = u.withColumn("__match", matched).where(F.col("__m") == 1)

    if tolerance_seconds is not None:
        age = F.col("__ts").cast("long") - F.col("__match.__t").cast("long")
        out = out.withColumn(
            "__match",
            F.when(age <= F.lit(int(tolerance_seconds)), F.col("__match")),
        )

    proj = [F.col(c) for c in lcols]
    proj.append(F.col("__match.__t").alias(f"{right_prefix}{right_time}"))
    proj.extend(F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in rpayload)
    return out.select(*proj)
