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
   partitions/f values) broadcasts into a semi-join filter; only rows
   carrying a candidate value cross the exchange for the exact global
   count, and the final ``count > f·n`` test uses exact integers.

No approximation anywhere: phase 1 is a complete cover (no false
negatives by the pigeonhole), phase 2 removes false positives with exact
counts. Shuffle volume is O(candidate occurrences), not O(distinct
values). Null values are ignored (SQL GROUP BY semantics would keep
them; frequency analysis over tokens does not want a null bucket — and
the oracle filters identically).
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
    out_schema = T.StructType(
        [
            T.StructField("__v", vals.schema["__v"].dataType),
            T.StructField("__n_p", T.LongType()),
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
        yield pd.DataFrame({"__v": local.index, "__n_p": n_p})

    cand = vals.mapInPandas(local_candidates, out_schema).select("__v").distinct()

    n = vals.count()
    exact = (
        vals.join(F.broadcast(cand), "__v", "left_semi")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias(count_col))
        # float threshold compare: for integer counts, `cnt > f*n` is
        # exactly `cnt > floor(f*n)` — same predicate the SQL oracle runs
        .where(F.col(count_col) > F.lit(min_frac * n))
    )
    return exact.withColumnRenamed("__v", value_col)
