"""Exact distributed heavy hitters — frequent values without shuffling
the long tail.

Vocabulary / boilerplate analysis over a training corpus asks "which
values occur in more than a fraction ``f`` of rows?". The naive
``groupBy(value).count()`` is one shuffle whose volume is the number of
DISTINCT values per map task — at 10^9-distinct-token scale the long tail
dominates the exchange even with partial aggregation.

This operator uses the classic two-phase exact scheme (the pigeonhole
behind Misra–Gries/SpaceSaving, e.g. Cormode & Hadjieleftheriou, VLDB
2008 survey):

1. **Candidates, map-only.** If ``count(x) > f·n`` globally, then in at
   least one partition ``count_p(x) > f·n_p`` (pigeonhole over the
   partition sizes). Each partition therefore emits its LOCAL
   over-threshold values — exact within the partition via one vectorized
   ``value_counts`` (Arrow-batched pandas, no per-row Python) — at most
   ``1/f`` values per partition, regardless of tail size.
2. **Exact counts, candidate-only shuffle.** The candidate set (≤
   partitions/f values, collected with per-partition row-count markers so
   ``n`` rides the same pass) broadcasts into a semi-join filter; only
   rows carrying a candidate value cross the exchange for the exact
   global count, and the final ``count > f·n`` test uses exact counts.

No approximation anywhere: phase 1 is a complete cover (no false
negatives by the pigeonhole), phase 2 removes false positives with exact
counts. TWO passes over the data total; shuffle volume is O(candidate
occurrences), not O(distinct values). Null values are ignored (SQL GROUP
BY semantics would keep them; frequency analysis over tokens does not
want a null bucket — and the oracle filters identically). Float NaN is
excluded the same way, EXPLICITLY: Spark itself would group NaN as a
value, but the Arrow hop in phase 1 collapses pandas NaN to null, so
rather than let a NaN heavy hitter silently vanish there, NaN rows are
filtered up front and ``n`` counts only non-null, non-NaN values (the
same "NaN poisons ordering, drop it loudly" convention as
`lake/stats.py`).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["frequent_values"]


def frequent_values(
    df: DataFrame,
    value_col: str,
    min_frac: float,
    count_col: str = "cnt",
) -> DataFrame:
    """Exact set of values with ``count > floor(min_frac * n)`` plus their
    exact counts. ``n`` counts non-null values.

    Returns a DataFrame ``(value_col, count_col)``. ``min_frac`` must be
    in (0, 1]; smaller fractions admit more candidates (phase-1 emits at
    most ``1/min_frac`` values per partition).
    """
    if not (0.0 < min_frac <= 1.0):
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")

    vals = df.select(F.col(value_col).alias("__v")).where(F.col("__v").isNotNull())
    if isinstance(vals.schema["__v"].dataType, (T.FloatType, T.DoubleType)):
        vals = vals.where(~F.isnan("__v"))
    out_schema = T.StructType(
        [
            T.StructField("__v", vals.schema["__v"].dataType),
            T.StructField("__n_p", T.LongType()),
            T.StructField("__marker", T.BooleanType()),
        ]
    )

    def local_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            c = pdf["__v"].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
        if counts is None or n_p == 0:
            return
        local = counts[counts > min_frac * n_p]
        # one marker row carries the partition's row count, so n = Σ n_p
        # rides the same pass (no separate count() scan); the explicit
        # flag — not a null sentinel — keeps float-NaN candidates
        # distinguishable from the marker
        yield pd.DataFrame(
            {
                "__v": list(local.index) + [None],
                "__n_p": [0] * len(local) + [n_p],
                "__marker": [False] * len(local) + [True],
            }
        )

    # bounded collect: ≤ 1/min_frac candidates per partition + 1 marker per
    # partition — the same volume the broadcast join ships anyway
    rows = vals.mapInPandas(local_candidates, out_schema).collect()
    n = sum(r["__n_p"] for r in rows if r["__marker"])
    cand_vals = list({r["__v"] for r in rows if not r["__marker"]})
    if n == 0 or not cand_vals:
        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(value_col, vals.schema["__v"].dataType),
                    T.StructField(count_col, T.LongType()),
                ]
            ),
        )
    cand = df.sparkSession.createDataFrame(
        [(v,) for v in cand_vals],
        T.StructType([T.StructField("__v", vals.schema["__v"].dataType)]),
    )
    exact = (
        vals.join(F.broadcast(cand), "__v", "left_semi")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias(count_col))
        # float threshold compare: for integer counts, `cnt > f*n` is
        # exactly `cnt > floor(f*n)` — same predicate the SQL oracle runs
        .where(F.col(count_col) > F.lit(min_frac * n))
    )
    return exact.withColumnRenamed("__v", value_col)
